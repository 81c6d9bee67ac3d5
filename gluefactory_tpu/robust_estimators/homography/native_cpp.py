"""Native C++ LO-RANSAC homography estimator (the in-repo PoseLib analog,
reference `robust_estimators/homography/poselib.py:8-40`)."""

from __future__ import annotations

import numpy as np

from ..base_estimator import BaseEstimator
from ..native import native_ransac_homography

__main_class__ = "NativeHomographyEstimator"


class NativeHomographyEstimator(BaseEstimator):
    default_conf = {
        "name": "native_cpp",
        "ransac_th": 3.0,
        "max_iters": 2000,
        "lo_iters": 4,
        "seed": 0,
    }
    required_data_keys = ("m_kpts0", "m_kpts1")

    def _forward(self, data):
        p0 = np.asarray(data["m_kpts0"], np.float32)
        p1 = np.asarray(data["m_kpts1"], np.float32)
        valid = data.get("match_valid")
        valid = None if valid is None else np.asarray(valid)
        ok, H, inliers, n = native_ransac_homography(
            p0,
            p1,
            valid,
            th=float(data.get("ransac_th", self.conf.ransac_th)),
            max_iters=self.conf.max_iters,
            lo_iters=self.conf.lo_iters,
            seed=self.conf.seed,
        )
        return {"success": ok, "M_0to1": H, "inliers": inliers}
