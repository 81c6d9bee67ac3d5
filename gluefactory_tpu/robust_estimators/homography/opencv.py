"""OpenCV homography RANSAC baseline
(reference `robust_estimators/homography/opencv.py`). Host-side, used for
parity-checking the device estimator and matching the reference's "opencv"
eval columns.
"""

from __future__ import annotations

import cv2
import numpy as np

from ..base_estimator import BaseEstimator

__main_class__ = "OpenCVHomographyEstimator"


class OpenCVHomographyEstimator(BaseEstimator):
    default_conf = {
        "name": "opencv",
        "ransac_th": 3.0,
        "method": "ransac",
        "max_iters": 10000,
        "confidence": 0.995,
    }
    required_data_keys = ("m_kpts0", "m_kpts1")

    def _init(self, conf):
        self.method = {
            "ransac": cv2.RANSAC,
            "lmeds": cv2.LMEDS,
            "rho": cv2.RHO,
            "usac": cv2.USAC_DEFAULT,
            "usac_fast": cv2.USAC_FAST,
            "usac_accurate": cv2.USAC_ACCURATE,
            "usac_prosac": cv2.USAC_PROSAC,
            "usac_magsac": cv2.USAC_MAGSAC,
        }[conf.method]

    def _forward(self, data):
        p0 = np.asarray(data["m_kpts0"], np.float64)
        p1 = np.asarray(data["m_kpts1"], np.float64)
        valid = data.get("match_valid")
        if valid is not None:
            v = np.asarray(valid)
            p0, p1 = p0[v], p1[v]
        if len(p0) < 4:
            return {
                "success": False,
                "M_0to1": np.eye(3, dtype=np.float32),
                "inliers": np.zeros(len(p0), bool),
            }
        M, mask = cv2.findHomography(
            p0,
            p1,
            self.method,
            ransacReprojThreshold=float(data.get("ransac_th", self.conf.ransac_th)),
            maxIters=self.conf.max_iters,
            confidence=self.conf.confidence,
        )
        success = M is not None
        if not success:
            M = np.eye(3)
            mask = np.zeros(len(p0), bool)
        return {
            "success": success,
            "M_0to1": M.astype(np.float32),
            "inliers": mask.ravel().astype(bool),
        }
