"""OpenCV essential-matrix RANSAC baseline
(reference `robust_estimators/relative_pose/opencv.py:10-66`). Host-side.
"""

from __future__ import annotations

import cv2
import numpy as np

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator

__main_class__ = "OpenCVRelativePoseEstimator"


class OpenCVRelativePoseEstimator(BaseEstimator):
    default_conf = {
        "name": "opencv",
        "ransac_th": 0.5,
        "confidence": 0.99999,
    }
    required_data_keys = ("m_kpts0", "m_kpts1", "camera0", "camera1")

    def _forward(self, data):
        cam0, cam1 = data["camera0"], data["camera1"]
        p0 = np.asarray(data["m_kpts0"], np.float64)
        p1 = np.asarray(data["m_kpts1"], np.float64)
        valid = data.get("match_valid")
        if valid is not None:
            v = np.asarray(valid)
            p0, p1 = p0[v], p1[v]
        result = {
            "success": False,
            "M_0to1": Pose.from_Rt(np.eye(3), np.zeros(3)),
            "inliers": np.zeros(len(p0), bool),
        }
        if len(p0) < 5:
            return result
        import jax.numpy as jnp

        r0 = np.asarray(cam0.image2world(jnp.asarray(p0, jnp.float32)[None])[0])[0]
        r1 = np.asarray(cam1.image2world(jnp.asarray(p1, jnp.float32)[None])[0])[0]
        f_mean = 0.5 * float(np.mean(np.asarray(cam0.f)) + np.mean(np.asarray(cam1.f)))
        norm_th = float(data.get("ransac_th", self.conf.ransac_th)) / f_mean

        E, mask = cv2.findEssentialMat(
            r0[:, :2],
            r1[:, :2],
            np.eye(3),
            threshold=norm_th,
            prob=self.conf.confidence,
            method=cv2.RANSAC,
        )
        if E is None:
            return result
        best_n = 0
        for E_ in np.split(E, len(E) / 3):
            n, R, t, mask_ = cv2.recoverPose(
                E_, r0[:, :2], r1[:, :2], np.eye(3), 1e9, mask=mask.copy()
            )
            if n > best_n:
                best_n = n
                result = {
                    "success": True,
                    "M_0to1": Pose.from_Rt(R, t.ravel()),
                    "inliers": mask_.ravel().astype(bool),
                }
        return result
