"""GT-as-model: pose+depth match supervision
(reference `gluefactory/models/matchers/depth_matcher.py:17-95`).
"""

from __future__ import annotations

from ...geometry.gt_generation import gt_matches_from_pose_depth
from ..base_model import BaseModel

__main_class__ = "DepthMatcher"


class DepthMatcher(BaseModel):
    default_conf = {
        "use_points": True,
        "th_positive": 3.0,
        "th_negative": 5.0,
        "th_epi": None,  # enable epipolar-certain negatives
        "th_consistency": 0.05,  # depth cycle-consistency (relative)
    }
    required_data_keys = ("view0", "view1", "T_0to1", "keypoints0", "keypoints1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        view0, view1 = data["view0"], data["view1"]
        out = gt_matches_from_pose_depth(
            data["keypoints0"],
            data["keypoints1"],
            view0["depth"],
            view1["depth"],
            view0["camera"],
            view1["camera"],
            data["T_0to1"],
            valid0=data.get("keypoint_valid0"),
            valid1=data.get("keypoint_valid1"),
            pos_th=self.conf.th_positive,
            neg_th=self.conf.th_negative,
            epi_th=self.conf.th_epi,
            cc_th=self.conf.th_consistency,
            kp0_depth=data.get("keypoint_depths0"),
            kp1_depth=data.get("keypoint_depths1"),
        )
        return out

    def loss(self, pred, data):
        raise NotImplementedError
