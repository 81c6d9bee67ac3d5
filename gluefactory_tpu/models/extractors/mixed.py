"""Mixed extractor: separate detector + descriptor models
(reference `gluefactory/models/extractors/mixed.py:10-76`).

The detector provides keypoints; the descriptor model must output dense
descriptors which are sampled at the detected locations.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.keypoints import sample_descriptors
from .. import get_model
from ..base_model import BaseModel

__main_class__ = "MixedExtractor"


class MixedExtractor(BaseModel):
    default_conf = {
        "detector": {"name": None},
        "descriptor": {"name": None},
        "interpolate_descriptors_from": "dense_descriptors",
        "descriptor_stride": 8,
    }
    open_conf_keys = ("detector", "descriptor")
    required_data_keys = ("image",)

    def setup(self):
        self.detector = get_model(self.conf.detector["name"]).from_conf(
            self.conf.detector
        )
        self.descriptor = get_model(self.conf.descriptor["name"]).from_conf(
            self.conf.descriptor
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        pred = self.detector(data, train=train)
        dpred = self.descriptor(data, train=train)
        key = self.conf.interpolate_descriptors_from
        if "descriptors" not in pred and key in dpred:
            dense = dpred[key]  # (B, Hc, Wc, C)
            dense_cf = jnp.moveaxis(dense, -1, 1)
            pred["descriptors"] = sample_descriptors(
                pred["keypoints"], dense_cf, self.conf.descriptor_stride
            )
        for k, v in dpred.items():
            pred.setdefault(k, v)
        return pred

    def loss(self, pred, data):
        raise NotImplementedError
