"""GT-as-model: sparse SfM-map supervision
(reference `gluefactory/models/matchers/sparse_depth_matcher.py:58-141` and
`sparse_dense_depth_matcher.py:89-168`).

SparseDepthMatcher uses track IDs + sparse keypoint depths only;
SparseDenseDepthMatcher refines labels with dense depth where available.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...geometry.gt_generation import (
    IGNORE_FEATURE,
    gt_matches_from_pose_depth,
    gt_matches_from_sparse_map,
)
from ..base_model import BaseModel

__main_class__ = "SparseDepthMatcher"


class SparseDepthMatcher(BaseModel):
    default_conf = {
        "th_positive": 3.0,
        "th_negative": 5.0,
    }
    required_data_keys = ("T_0to1", "keypoints0", "keypoints1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        return gt_matches_from_sparse_map(
            data["keypoints0"],
            data["keypoints1"],
            data["keypoint_p3d_ids0"],
            data["keypoint_p3d_ids1"],
            data["keypoint_depths0"],
            data["keypoint_depths1"],
            data["view0"]["camera"],
            data["view1"]["camera"],
            data["T_0to1"],
            valid0=data.get("keypoint_valid0"),
            valid1=data.get("keypoint_valid1"),
            pos_th=self.conf.th_positive,
            neg_th=self.conf.th_negative,
        )

    def loss(self, pred, data):
        raise NotImplementedError


class SparseDenseDepthMatcher(BaseModel):
    """Combine sparse-track positives with dense-depth labels: dense labels
    where depth exists, sparse-track positives override IGNOREs."""

    default_conf = {
        "th_positive": 3.0,
        "th_negative": 5.0,
        "th_consistency": 0.05,
    }
    required_data_keys = ("T_0to1", "keypoints0", "keypoints1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        dense = gt_matches_from_pose_depth(
            data["keypoints0"],
            data["keypoints1"],
            data["view0"]["depth"],
            data["view1"]["depth"],
            data["view0"]["camera"],
            data["view1"]["camera"],
            data["T_0to1"],
            valid0=data.get("keypoint_valid0"),
            valid1=data.get("keypoint_valid1"),
            pos_th=self.conf.th_positive,
            neg_th=self.conf.th_negative,
            cc_th=self.conf.th_consistency,
        )
        sparse = gt_matches_from_sparse_map(
            data["keypoints0"],
            data["keypoints1"],
            data["keypoint_p3d_ids0"],
            data["keypoint_p3d_ids1"],
            data["keypoint_depths0"],
            data["keypoint_depths1"],
            data["view0"]["camera"],
            data["view1"]["camera"],
            data["T_0to1"],
            valid0=data.get("keypoint_valid0"),
            valid1=data.get("keypoint_valid1"),
            pos_th=self.conf.th_positive,
            neg_th=self.conf.th_negative,
        )
        m0 = jnp.where(
            dense["gt_matches0"] == IGNORE_FEATURE,
            sparse["gt_matches0"],
            dense["gt_matches0"],
        )
        m1 = jnp.where(
            dense["gt_matches1"] == IGNORE_FEATURE,
            sparse["gt_matches1"],
            dense["gt_matches1"],
        )
        return {
            "gt_matches0": m0,
            "gt_matches1": m1,
            "gt_assignment": dense["gt_assignment"] | sparse["gt_assignment"],
            "gt_kp0_1": dense["gt_kp0_1"],
            "gt_kp1_0": dense["gt_kp1_0"],
        }

    def loss(self, pred, data):
        raise NotImplementedError
