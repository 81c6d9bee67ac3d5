"""SuperPoint keypoint detector + descriptor, TPU-native
(reference `gluefactory/models/extractors/superpoint_open.py:80-235` and
`gluefactory_nonfree/superpoint.py:155-385`).

Design notes (TPU-first, not a port):
  - NHWC layout, bf16-friendly convs sized for the MXU.
  - The whole detect -> NMS -> top-K -> describe chain is fixed-shape: exactly
    `max_num_keypoints` outputs with a validity mask, so extraction jits into
    one XLA program (the reference's `force_num_keypoints` padding is our
    *only* mode, SURVEY.md §7.1-1).
  - BatchNorm from pretrained torch checkpoints is folded into the convs at
    conversion time (`utils/torch_weights.py`), keeping the module stateless;
    from-scratch training uses GroupNorm (no cross-device stat sync needed).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.keypoints import (
    remove_borders,
    sample_descriptors,
    simple_nms,
    soft_argmax_refinement,
    top_k_keypoints,
)
from ..base_model import BaseModel

__main_class__ = "SuperPoint"


class VGGBlock(nn.Module):
    """conv3x3 + norm + ReLU (reference `superpoint_open.py:61-77`).

    Norm modes:
      - "none": plain conv+relu (MagicLeap official checkpoints, BN-free).
      - "group": GroupNorm before relu (from-scratch training; no cross-device
        stat sync needed).
      - "affine": per-channel scale+bias AFTER relu. The rpautrat "open"
        SuperPoint's VGGBlock is conv -> relu -> BatchNorm
        (`superpoint_open.py:61-77`): the BN sits after the nonlinearity, so
        it cannot be folded into the conv exactly (padding zeros at image
        borders are not BN-shifted). An eval-mode BN is exactly a per-channel
        affine, which XLA fuses into the conv epilogue for free.
    """

    out_ch: int
    norm: str = "none"
    kernel: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel), padding="SAME",
            dtype=dt, name="conv",
        )(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=min(32, self.out_ch), dtype=dt, name="norm")(x)
        x = nn.relu(x)
        if self.norm == "affine":
            s = self.param("post_scale", nn.initializers.ones, (self.out_ch,))
            b = self.param("post_bias", nn.initializers.zeros, (self.out_ch,))
            x = x * s.astype(x.dtype) + b.astype(x.dtype)
        return x


class SuperPoint(BaseModel):
    default_conf = {
        "descriptor_dim": 256,
        "nms_radius": 4,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "channels": [64, 64, 128, 128, 256],
        "norm": "none",  # "none" (folded-BN checkpoints) | "group" (scratch)
        "refinement_radius": 0,  # soft-argmax sub-pixel refinement
        "dense_outputs": False,
        "dtype": "float32",  # "bfloat16": backbone convs on the MXU in bf16
        "weights": None,  # path to a converted checkpoint
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        chs = list(c.channels)
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        backbone = []
        # two convs per scale, maxpool between scales (VGG-style)
        for i, ch in enumerate(chs[:-1]):
            backbone.append(
                (
                    VGGBlock(ch, c.norm, c.get("kernel", 3), c.dtype, name=f"b{i}_0"),
                    VGGBlock(ch, c.norm, c.get("kernel", 3), c.dtype, name=f"b{i}_1"),
                )
            )
        self.backbone = backbone
        mid = chs[-1]
        self.det_head0 = VGGBlock(mid, c.norm, 3, c.dtype, name="det0")
        self.det_head1 = nn.Conv(65, (1, 1), dtype=dt, name="det1")
        self.desc_head0 = VGGBlock(mid, c.norm, 3, c.dtype, name="desc0")
        self.desc_head1 = nn.Conv(c.descriptor_dim, (1, 1), dtype=dt, name="desc1")

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]  # (B, H, W, C)
        if image.shape[-1] == 3:
            # RGB -> grayscale (ITU-R BT.601, like the reference's preprocessing)
            scale = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        B, H, W, _ = image.shape

        x = image
        for i, (blk0, blk1) in enumerate(self.backbone):
            x = blk0(x)
            x = blk1(x)
            if i < len(self.backbone) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # x: (B, H/8, W/8, C)

        # detector head: 65 = 8x8 cells + dustbin; pixel-shuffle to full res
        det = self.det_head1(self.det_head0(x))  # (B, H/8, W/8, 65)
        # scores/softmax in f32 regardless of compute dtype
        scores = nn.softmax(det.astype(jnp.float32), axis=-1)[..., :-1]
        Hc, Wc = scores.shape[1:3]
        scores = scores.reshape(B, Hc, Wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        desc = self.desc_head1(self.desc_head0(x)).astype(jnp.float32)
        # L2-normalize the dense map BEFORE bilinear sampling (reference
        # `superpoint_open.py:133-135` normalizes dense, samples, then
        # normalizes again) — interpolating unnormalized descriptors would
        # weight the 4 corner cells by their norms.
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )

        nms = simple_nms(scores, self.conf.nms_radius)
        nms = remove_borders(nms, self.conf.remove_borders)
        kpts, kp_scores, valid = top_k_keypoints(
            nms, self.conf.max_num_keypoints, self.conf.detection_threshold,
            nms_radius=self.conf.nms_radius,
        )
        if self.conf.refinement_radius > 0:
            kpts = soft_argmax_refinement(kpts, scores, self.conf.refinement_radius)

        # with square-padded batches, drop keypoints in the padding region
        if "image_size" in data:
            size = data["image_size"]  # (B, 2) true (w, h)
            inside = jnp.all(kpts < size[:, None, :], axis=-1) & jnp.all(
                kpts >= 0, axis=-1
            )
            valid = valid & inside
            kp_scores = jnp.where(valid, kp_scores, 0.0)
        # endoscope specular-highlight filtering (fork `superpoint_open.py:177-187`)
        if "specular_mask" in data:
            from .utils import filter_keypoints_by_specular_mask

            valid = filter_keypoints_by_specular_mask(
                kpts, valid, data["specular_mask"]
            )
            kp_scores = jnp.where(valid, kp_scores, 0.0)

        # descriptors are (B, Hc, Wc, D) -> channel-first for sampling
        desc_cf = jnp.moveaxis(desc, -1, 1)  # (B, D, Hc, Wc)
        d = sample_descriptors(kpts, desc_cf, 8)  # (B, K, D)
        d = jnp.where(valid[..., None], d, jnp.zeros_like(d))

        pred = {
            "keypoints": kpts,
            "keypoint_scores": kp_scores,
            "descriptors": d,
            "keypoint_valid": valid,
        }
        if self.conf.dense_outputs:
            pred["dense_scores"] = scores
            pred["dense_descriptors"] = desc
        return pred

    def loss(self, pred, data):
        raise NotImplementedError("SuperPoint is used frozen or self-supervised")
