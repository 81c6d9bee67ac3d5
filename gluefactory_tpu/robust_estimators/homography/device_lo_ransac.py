"""On-device homography LO-RANSAC estimator (the PoseLib replacement,
reference `robust_estimators/homography/poselib.py:8-40`; SURVEY.md §7.1-5).

Input data dict: m_kpts0, m_kpts1 (N, 2) matched keypoints (padded),
optional match_valid (N,). Returns {success, M_0to1 (3, 3), inliers (N,)}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.ransac import ransac_homography, ransac_homography_adaptive
from ..base_estimator import BaseEstimator

__main_class__ = "DeviceHomographyEstimator"


class DeviceHomographyEstimator(BaseEstimator):
    default_conf = {
        "name": "device_lo_ransac",
        "ransac_th": 3.0,
        "num_hypotheses": 512,
        "lo_iters": 3,
        "seed": 0,
        # "msac" = fixed-threshold truncated quadratic; "magsac" =
        # sigma-consensus marginalized over n_sigmas noise scales
        # (threshold-robust, see ops/ransac._magsac_score)
        "scoring": "msac",
        "n_sigmas": 8,
        # PoseLib-parity adaptive termination (early-exit while_loop over
        # hypothesis chunks, ops/ransac.ransac_homography_adaptive); the
        # fixed batch stays the default (vmaps better over pair sweeps)
        "adaptive": False,
        "chunk": 128,
        "confidence": 0.99,
    }
    required_data_keys = ("m_kpts0", "m_kpts1")

    def _init(self, conf):
        if conf.get("adaptive", False):
            self._fn = jax.jit(
                lambda key, p0, p1, v, th: ransac_homography_adaptive(
                    key, p0, p1, v,
                    th=th,
                    max_hyps=conf.num_hypotheses,
                    chunk=conf.chunk,
                    confidence=conf.confidence,
                    lo_iters=conf.lo_iters,
                    scoring=conf.scoring,
                    n_sigmas=conf.n_sigmas,
                )[0],
                static_argnames=(),
            )
        else:
            self._fn = jax.jit(
                lambda key, p0, p1, v, th: ransac_homography(
                    key, p0, p1, v,
                    th=th,
                    num_hyps=conf.num_hypotheses,
                    lo_iters=conf.lo_iters,
                    scoring=conf.scoring,
                    n_sigmas=conf.n_sigmas,
                ),
                static_argnames=(),
            )

    def _forward(self, data):
        p0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        p1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("match_valid")
        if valid is None:
            valid = jnp.ones(p0.shape[:-1], bool)
        key = jax.random.PRNGKey(self.conf.seed)
        th = float(data.get("ransac_th", self.conf.ransac_th))
        res = self._fn(key, p0, p1, jnp.asarray(valid), th)
        return {
            "success": res.success,
            "M_0to1": res.M,
            "inliers": res.inliers,
        }
