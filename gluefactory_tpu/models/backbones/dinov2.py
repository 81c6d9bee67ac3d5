"""DINOv2 global-descriptor backbone
(reference `gluefactory/models/backbones/dinov2.py:7-30`).

The reference pulls torch.hub DINOv2; here we use the transformers-port when
its weights are available locally (air-gapped pods mount them), exposing the
same outputs: dense patch features + CLS global descriptor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel

__main_class__ = "DinoV2"


class DinoV2(BaseModel):
    default_conf = {
        "weights": "facebook/dinov2-base",  # local path or HF id (needs cache)
    }
    required_data_keys = ("image",)

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        try:
            from transformers import FlaxDinov2Model  # noqa: F401

            have_flax = True
        except ImportError:
            have_flax = False
        if not have_flax:
            raise ImportError(
                "DINOv2 backbone needs transformers' Dinov2 weights available "
                "locally (no-egress pods must mount the HF cache)"
            )
        from transformers import FlaxDinov2Model

        model = FlaxDinov2Model.from_pretrained(self.conf.weights)
        img = np.asarray(data["image"]).transpose(0, 3, 1, 2)
        out = model(pixel_values=img)
        hidden = jnp.asarray(out.last_hidden_state)
        return {
            "global_descriptor": hidden[:, 0],
            "features": hidden[:, 1:],
        }

    def loss(self, pred, data):
        raise NotImplementedError
