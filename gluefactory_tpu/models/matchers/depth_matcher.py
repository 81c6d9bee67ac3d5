"""GT-as-model: pose+depth match supervision
(reference `gluefactory/models/matchers/depth_matcher.py:17-95`).
"""

from __future__ import annotations

from ...geometry.gt_generation import (
    gt_line_matches_from_pose_depth,
    gt_matches_from_pose_depth,
)
from ..base_model import BaseModel

__main_class__ = "DepthMatcher"


class DepthMatcher(BaseModel):
    default_conf = {
        "use_points": True,
        "use_lines": False,
        "th_positive": 3.0,
        "th_negative": 5.0,
        "th_epi": None,  # enable epipolar-certain negatives
        "th_consistency": 0.05,  # depth cycle-consistency (relative)
        "n_line_samples": 21,
        "line_dist_th": 5.0,
        "line_overlap_th": 0.2,
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
        if self.conf.use_lines and "lines0" in data:
            out.update(
                gt_line_matches_from_pose_depth(
                    data["lines0"],
                    data["lines1"],
                    view0["depth"],
                    view1["depth"],
                    view0["camera"],
                    view1["camera"],
                    data["T_0to1"],
                    valid0=data.get("line_valid0"),
                    valid1=data.get("line_valid1"),
                    n_samples=self.conf.n_line_samples,
                    dist_th=self.conf.line_dist_th,
                    overlap_th=self.conf.line_overlap_th,
                )
            )
        return out

    def loss(self, pred, data):
        raise NotImplementedError
