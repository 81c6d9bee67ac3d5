"""Native C++ LO-RANSAC relative-pose estimator (PoseLib analog,
reference `robust_estimators/relative_pose/poselib.py:9-45`)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator
from ..native import native_ransac_essential

__main_class__ = "NativeRelativePoseEstimator"


class NativeRelativePoseEstimator(BaseEstimator):
    default_conf = {
        "name": "native_cpp",
        "ransac_th": 2.0,  # pixels
        "max_iters": 4000,
        "lo_iters": 4,
        "seed": 0,
        "solver": "5pt",  # Nister minimal solver; "8pt" for the linear one
    }
    required_data_keys = ("m_kpts0", "m_kpts1", "camera0", "camera1")

    def _forward(self, data):
        cam0, cam1 = data["camera0"], data["camera1"]
        p0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        p1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("match_valid")
        r0, v0 = cam0.image2world(p0[None] if cam0.shape == () else p0)
        r1, v1 = cam1.image2world(p1[None] if cam1.shape == () else p1)
        r0 = np.asarray(r0).reshape(-1, 3)[:, :2]
        r1 = np.asarray(r1).reshape(-1, 3)[:, :2]
        v = np.asarray(v0).reshape(-1) & np.asarray(v1).reshape(-1)
        if valid is not None:
            v = v & np.asarray(valid)
        f_mean = 0.5 * float(np.mean(np.asarray(cam0.f)) + np.mean(np.asarray(cam1.f)))
        th = float(data.get("ransac_th", self.conf.ransac_th)) / f_mean
        ok, E, R, t, inliers, n = native_ransac_essential(
            r0, r1, v, th=th, max_iters=self.conf.max_iters,
            lo_iters=self.conf.lo_iters, seed=self.conf.seed,
            solver=self.conf.solver,
        )
        return {
            "success": ok,
            "M_0to1": Pose.from_Rt(R, t),
            "inliers": inliers,
            "E": E,
        }
