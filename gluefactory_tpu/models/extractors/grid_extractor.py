"""Dense grid "keypoints" for dense matchers
(reference `gluefactory/models/extractors/grid_extractor.py:20-64`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base_model import BaseModel

__main_class__ = "GridExtractor"


class GridExtractor(BaseModel):
    default_conf = {"cell_size": 14}
    required_data_keys = ("image",)

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        img = data["image"]  # (B, H, W, C)
        B, H, W, _ = img.shape
        cs = self.conf.cell_size
        ys = jnp.arange(cs / 2, H, cs, dtype=jnp.float32)
        xs = jnp.arange(cs / 2, W, cs, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        kpts = jnp.stack([gx.ravel(), gy.ravel()], -1)
        kpts = jnp.broadcast_to(kpts[None], (B,) + kpts.shape)
        K = kpts.shape[1]
        valid = jnp.ones((B, K), bool)
        if "image_size" in data:
            valid = valid & jnp.all(kpts < data["image_size"][:, None, :], axis=-1)
        return {
            "keypoints": kpts,
            "keypoint_scores": jnp.ones((B, K), jnp.float32),
            "keypoint_valid": valid,
        }

    def loss(self, pred, data):
        raise NotImplementedError
