"""RoMa pseudo-GT matcher (reference `gluefactory/models/matchers/roma_gt_matcher.py:302`).

Consumes *cached* dense warps/certainty from a RoMa-style dense matcher (the
fork caches them offline, `tools/preprocess_endomapper_romaGT.py`) and turns
them into match supervision — no runtime dependency on the romatch package.
Expects data keys `roma_warp_0to1` (B, H, W, 2), `roma_certainty_0to1`
(B, H, W), optional `roma_warp_1to0` for cycle filtering.
"""

from __future__ import annotations

from ...geometry.gt_generation import gt_matches_from_roma_warp
from ..base_model import BaseModel

__main_class__ = "RomaGTMatcher"


class RomaGTMatcher(BaseModel):
    default_conf = {
        "th_positive": 3.0,
        "th_negative": 6.0,
        "certainty_th": 0.5,
        "cycle_th": 4.0,
    }
    required_data_keys = ("keypoints0", "keypoints1", "roma_warp_0to1", "roma_certainty_0to1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        return gt_matches_from_roma_warp(
            data["keypoints0"],
            data["keypoints1"],
            data["roma_warp_0to1"],
            data["roma_certainty_0to1"],
            valid0=data.get("keypoint_valid0"),
            valid1=data.get("keypoint_valid1"),
            pos_th=self.conf.th_positive,
            neg_th=self.conf.th_negative,
            certainty_th=self.conf.certainty_th,
            warp_1to0=data.get("roma_warp_1to0"),
            cycle_th=self.conf.cycle_th,
        )

    def loss(self, pred, data):
        raise NotImplementedError
