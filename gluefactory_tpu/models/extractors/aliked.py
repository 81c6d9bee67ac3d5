"""ALIKED-style extractor, TPU-native
(reference `gluefactory/models/extractors/aliked.py:75-824`).

Architecture following the ALIKED paper (Zhao et al., 2023): conv backbone
with deformable conv blocks, differentiable keypoint detection (DKD: NMS +
local soft-argmax), and a deformable descriptor head (SDDH) that samples M
learned offsets per keypoint.

TPU-first notes:
  - torchvision's CUDA `deform_conv2d` becomes an explicit bilinear-gather
    formulation (`deformable_sample`): offsets -> gather -> weighted sum, all
    jittable; XLA maps the gathers onto the VPU and the pointwise matmuls
    onto the MXU.
  - detection is fixed-K masked (same contract as SuperPoint).
  - weight conversion from official ALIKED checkpoints is not implemented
    yet; the module trains from scratch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.keypoints import simple_nms, soft_argmax_refinement, top_k_keypoints
from ..base_model import BaseModel

__main_class__ = "ALIKED"


def bilinear_gather(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample fmap (B, H, W, C) at coords (B, N, 2) (x, y) -> (B, N, C)."""
    B, H, W, C = fmap.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    flat = fmap.reshape(B, H * W, C)

    def g(yy, xx):
        return jnp.take_along_axis(flat, (yy * W + xx)[..., None], axis=1)

    out = (
        g(y0i, x0i) * ((1 - wx) * (1 - wy))[..., None]
        + g(y0i, x1i) * (wx * (1 - wy))[..., None]
        + g(y1i, x0i) * ((1 - wx) * wy)[..., None]
        + g(y1i, x1i) * (wx * wy)[..., None]
    )
    return out


class DeformableConv(nn.Module):
    """3x3 deformable conv as offset-predicting conv + bilinear gathers."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        offsets = nn.Conv(
            18, (3, 3), padding="SAME", kernel_init=nn.initializers.zeros,
            name="offset_conv",
        )(x)  # (B, H, W, 9*2)
        ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        base = jnp.stack([xs, ys], -1).astype(x.dtype)  # (H, W, 2)
        d = jnp.arange(-1, 2, dtype=x.dtype)
        dy, dx = jnp.meshgrid(d, d, indexing="ij")
        taps = jnp.stack([dx.ravel(), dy.ravel()], -1)  # (9, 2)
        # sample positions: base + tap + learned offset
        pos = (
            base[None, :, :, None, :]
            + taps[None, None, None, :, :]
            + offsets.reshape(B, H, W, 9, 2)
        )  # (B, H, W, 9, 2)
        samples = bilinear_gather(
            x, pos.reshape(B, H * W * 9, 2)
        ).reshape(B, H, W, 9 * C)
        return nn.Dense(self.out_ch, name="weight")(samples)


class ConvBlock(nn.Module):
    out_ch: int
    deformable: bool = False

    @nn.compact
    def __call__(self, x):
        if self.deformable:
            y = DeformableConv(self.out_ch, name="dconv")(x)
        else:
            y = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv")(x)
        y = nn.GroupNorm(num_groups=min(8, self.out_ch), name="norm")(y)
        return nn.selu(y)


class ALIKED(BaseModel):
    default_conf = {
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0002,
        "nms_radius": 2,
        "channels": [16, 32, 64, 128],
        "descriptor_dim": 128,
        "num_sddh_offsets": 9,
        "refinement_radius": 2,
        "weights": None,
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        chs = list(c.channels)
        self.block1 = ConvBlock(chs[0], name="b1")
        self.block2 = ConvBlock(chs[1], name="b2")
        self.block3 = ConvBlock(chs[2], deformable=True, name="b3")
        self.block4 = ConvBlock(chs[3], deformable=True, name="b4")
        self.score_head = nn.Conv(1, (1, 1), name="score_head")
        self.desc_proj = nn.Dense(c.descriptor_dim, name="desc_proj")
        self.sddh_offsets = self.param(
            "sddh_offsets",
            nn.initializers.normal(2.0),
            (c.num_sddh_offsets, 2),
        )
        self.sddh_weights = nn.Dense(c.num_sddh_offsets, name="sddh_weights")

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, axis=-1)
        B, H, W, _ = image.shape
        x1 = self.block1(image)  # full res
        x2 = self.block2(nn.max_pool(x1, (2, 2), strides=(2, 2)))
        x3 = self.block3(nn.max_pool(x2, (2, 2), strides=(2, 2)))
        x4 = self.block4(nn.max_pool(x3, (2, 2), strides=(2, 2)))

        # multi-scale feature aggregation at full resolution
        def up(x, k):
            return jax.image.resize(x, (B, H, W, x.shape[-1]), "bilinear")

        feats = jnp.concatenate([x1, up(x2, 2), up(x3, 4), up(x4, 8)], axis=-1)
        scores = jax.nn.sigmoid(self.score_head(feats))[..., 0]  # (B, H, W)

        nms = simple_nms(scores, self.conf.nms_radius)
        kpts, kp_scores, valid = top_k_keypoints(
            nms, self.conf.max_num_keypoints, self.conf.detection_threshold,
            nms_radius=self.conf.nms_radius,
        )
        if self.conf.refinement_radius > 0:
            kpts = soft_argmax_refinement(kpts, scores, self.conf.refinement_radius)

        # SDDH: deformable descriptor sampling around each keypoint
        desc_map = self.desc_proj(feats)  # (B, H, W, D)
        offs = self.sddh_offsets  # (M, 2)
        pos = kpts[:, :, None, :] + offs[None, None]  # (B, K, M, 2)
        K = kpts.shape[1]
        M = offs.shape[0]
        samples = bilinear_gather(
            desc_map, pos.reshape(B, K * M, 2)
        ).reshape(B, K, M, -1)
        center = bilinear_gather(desc_map, kpts)  # (B, K, D)
        w = jax.nn.softmax(self.sddh_weights(center), axis=-1)  # (B, K, M)
        d = jnp.einsum("bkmd,bkm->bkd", samples, w) + center
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        d = jnp.where(valid[..., None], d, 0.0)

        if "image_size" in data:
            inside = jnp.all(kpts < data["image_size"][:, None, :], axis=-1)
            valid = valid & inside
            kp_scores = jnp.where(valid, kp_scores, 0.0)

        return {
            "keypoints": kpts,
            "keypoint_scores": kp_scores,
            "descriptors": d,
            "keypoint_valid": valid,
        }

    def loss(self, pred, data):
        raise NotImplementedError
