"""On-device relative-pose LO-RANSAC (PoseLib `estimate_relative_pose`
replacement, reference `robust_estimators/relative_pose/poselib.py:9-45`).

Normalizes matched keypoints with the cameras, runs the batched essential
LO-RANSAC, recovers (R, t) by cheirality. Pixel threshold is converted to
normalized units via the mean focal length, like the reference estimators.

Data dict: m_kpts0, m_kpts1 (N, 2) pixels, camera0, camera1 (Camera),
optional match_valid. Returns {success, M_0to1 (Pose), inliers}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geometry.wrappers import Pose
from ...ops.ransac import ransac_essential
from ..base_estimator import BaseEstimator

__main_class__ = "DeviceRelativePoseEstimator"


class DeviceRelativePoseEstimator(BaseEstimator):
    default_conf = {
        "name": "device_lo_ransac",
        "ransac_th": 2.0,  # pixels
        "num_hypotheses": 1024,
        "lo_iters": 3,
        "seed": 0,
        # "5pt" = Nister minimal solver (PoseLib parity, robust on planar /
        # low-parallax scenes); "8pt" = cheaper linear solver
        "solver": "5pt",
        # "msac" or "magsac" (sigma-consensus over n_sigmas scales)
        "scoring": "msac",
        "n_sigmas": 8,
    }
    required_data_keys = ("m_kpts0", "m_kpts1", "camera0", "camera1")

    def _forward(self, data):
        cam0, cam1 = data["camera0"], data["camera1"]
        p0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        p1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("match_valid")
        if valid is None:
            valid = jnp.ones(p0.shape[:-1], bool)

        r0, v0 = cam0.image2world(p0[None] if cam0.shape == () else p0)
        r1, v1 = cam1.image2world(p1[None] if cam1.shape == () else p1)
        r0 = r0.reshape(-1, 3)[:, :2]
        r1 = r1.reshape(-1, 3)[:, :2]
        valid = valid & v0.reshape(-1) & v1.reshape(-1)

        f_mean = 0.5 * (jnp.mean(cam0.f) + jnp.mean(cam1.f))
        th_px = float(data.get("ransac_th", self.conf.ransac_th))
        th = th_px / f_mean

        key = jax.random.PRNGKey(self.conf.seed)
        res, R, t = ransac_essential(
            key,
            r0,
            r1,
            valid,
            th=th,
            num_hyps=self.conf.num_hypotheses,
            lo_iters=self.conf.lo_iters,
            solver=self.conf.solver,
            scoring=self.conf.scoring,
            n_sigmas=self.conf.n_sigmas,
        )
        return {
            "success": res.success,
            "M_0to1": Pose.from_Rt(R, t),
            "inliers": res.inliers,
            "E": res.M,
        }
