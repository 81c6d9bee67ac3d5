"""GT-as-model: homography match supervision
(reference `gluefactory/models/matchers/homography_matcher.py:8-74`).

Wraps `gt_matches_from_homography` as a BaseModel so pipelines can plug it in
as `ground_truth`.
"""

from __future__ import annotations

from ...geometry.gt_generation import (
    gt_line_matches_from_homography,
    gt_matches_from_homography,
)
from ..base_model import BaseModel

__main_class__ = "HomographyMatcher"


class HomographyMatcher(BaseModel):
    default_conf = {
        "use_points": True,
        "use_lines": False,
        "th_positive": 3.0,
        "th_negative": 6.0,
        "n_line_samples": 21,
        "line_dist_th": 5.0,
        "line_overlap_th": 0.2,
    }
    required_data_keys = ("H_0to1", "keypoints0", "keypoints1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        out = {}
        if self.conf.use_points:
            out.update(
                gt_matches_from_homography(
                    data["keypoints0"],
                    data["keypoints1"],
                    data["H_0to1"],
                    valid0=data.get("keypoint_valid0"),
                    valid1=data.get("keypoint_valid1"),
                    pos_th=self.conf.th_positive,
                    neg_th=self.conf.th_negative,
                )
            )
        if self.conf.use_lines and "lines0" in data:
            out.update(
                gt_line_matches_from_homography(
                    data["lines0"],
                    data["lines1"],
                    data["H_0to1"],
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
