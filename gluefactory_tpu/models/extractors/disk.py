"""DISK-style extractor, TPU-native
(reference `gluefactory/models/extractors/disk_kornia.py:10-140`).

The reference wraps kornia's DISK (Tyszkiewicz et al., NeurIPS 2020); this
is a from-scratch U-Net implementation of the same design: a dense heatmap
+ dense descriptors, window-NMS detection, fixed-K masked output. Trains
from scratch (no kornia checkpoint conversion in this environment).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.keypoints import simple_nms, top_k_keypoints
from ..base_model import BaseModel

__main_class__ = "DISK"


class UNetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="c0")(x)
        x = nn.GroupNorm(num_groups=min(8, self.out_ch), name="n0")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="c1")(x)
        x = nn.GroupNorm(num_groups=min(8, self.out_ch), name="n1")(x)
        return nn.gelu(x)


class DISK(BaseModel):
    default_conf = {
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0,
        "nms_window_size": 5,
        "descriptor_dim": 128,
        "channels": [32, 64, 128],
        "weights": None,
        "dense_outputs": False,
    }
    required_data_keys = ("image",)

    def setup(self):
        chs = list(self.conf.channels)
        self.down = [UNetBlock(c, name=f"down{i}") for i, c in enumerate(chs)]
        self.up = [
            UNetBlock(c, name=f"up{i}") for i, c in enumerate(reversed(chs[:-1]))
        ]
        self.head = nn.Conv(self.conf.descriptor_dim + 1, (1, 1), name="head")

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, axis=-1)
        B, H, W, _ = image.shape

        skips = []
        x = image
        for i, blk in enumerate(self.down):
            x = blk(x)
            if i < len(self.down) - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for blk, skip in zip(self.up, reversed(skips)):
            x = jax.image.resize(
                x, (B, skip.shape[1], skip.shape[2], x.shape[-1]), "bilinear"
            )
            x = blk(jnp.concatenate([x, skip], axis=-1))

        out = self.head(x)  # (B, H, W, D+1)
        heat = out[..., 0]
        desc = out[..., 1:]
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)

        radius = self.conf.nms_window_size // 2
        nms = simple_nms(heat, radius)
        kpts, kp_scores, valid = top_k_keypoints(
            nms, self.conf.max_num_keypoints, self.conf.detection_threshold,
            nms_radius=radius,
        )
        from .aliked import bilinear_gather

        d = bilinear_gather(desc, kpts)
        d = jnp.where(valid[..., None], d, 0.0)
        if "image_size" in data:
            inside = jnp.all(kpts < data["image_size"][:, None, :], axis=-1)
            valid = valid & inside
            kp_scores = jnp.where(valid, kp_scores, 0.0)
        pred = {
            "keypoints": kpts,
            "keypoint_scores": kp_scores,
            "descriptors": d,
            "keypoint_valid": valid,
        }
        if self.conf.dense_outputs:
            pred["dense_descriptors"] = desc
            pred["dense_scores"] = heat
        return pred

    def loss(self, pred, data):
        raise NotImplementedError
