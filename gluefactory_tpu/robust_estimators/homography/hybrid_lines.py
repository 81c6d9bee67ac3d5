"""Point+line hybrid homography estimator
(reference `robust_estimators/homography/homography_est.py` — the
homography_est C++ binding used by the GlueStick eval).

Data dict: m_kpts0/1, optional match_valid, m_lines0/1 (L, 2, 2) matched
segments, optional line_match_valid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.ransac import ransac_homography_points_lines
from ..base_estimator import BaseEstimator

__main_class__ = "HybridHomographyEstimator"


class HybridHomographyEstimator(BaseEstimator):
    default_conf = {
        "name": "hybrid_lines",
        "ransac_th": 3.0,
        "line_ransac_th": None,
        "num_hypotheses": 512,
        "lo_iters": 3,
        "seed": 0,
    }
    required_data_keys = ("m_kpts0", "m_kpts1", "m_lines0", "m_lines1")

    def _forward(self, data):
        p0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        p1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        pv = data.get("match_valid")
        pv = jnp.ones(p0.shape[:-1], bool) if pv is None else jnp.asarray(pv)
        l0 = jnp.asarray(data["m_lines0"], jnp.float32)
        l1 = jnp.asarray(data["m_lines1"], jnp.float32)
        lv = data.get("line_match_valid")
        lv = jnp.ones(l0.shape[0], bool) if lv is None else jnp.asarray(lv)
        res = ransac_homography_points_lines(
            jax.random.PRNGKey(self.conf.seed),
            p0,
            p1,
            pv,
            l0,
            l1,
            lv,
            th=float(data.get("ransac_th", self.conf.ransac_th)),
            line_th=self.conf.line_ransac_th,
            num_hyps=self.conf.num_hypotheses,
            lo_iters=self.conf.lo_iters,
        )
        return {"success": res.success, "M_0to1": res.M, "inliers": res.inliers}
