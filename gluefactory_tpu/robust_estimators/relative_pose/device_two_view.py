"""On-device two-view geometry estimation with model selection.

The pycolmap `two_view_geometry_estimation` replacement (reference
`robust_estimators/relative_pose/pycolmap.py:9-50`): estimate BOTH an
essential matrix and a homography on the matched keypoints, classify the
configuration (CALIBRATED / PLANAR / PANORAMIC) by comparing inlier support
(COLMAP's H/E inlier-ratio rule), and recover the relative pose from the
winning model — cheirality-disambiguated essential decomposition for general
scenes, calibrated-homography decomposition (`geometry/homography.py:
decompose_homography`) for planar scenes, identity translation for pure
rotations. Unlike pycolmap's sequential host loops, both RANSACs run as one
fixed-shape XLA program on device and the classification is a jnp.where
select, so the estimator is jit/vmap-friendly end to end.

Data dict: m_kpts0, m_kpts1 (N, 2) pixels, camera0, camera1 (Camera),
optional match_valid. Returns {success, M_0to1 (Pose), inliers, type}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geometry.homography import decompose_homography
from ...geometry.wrappers import Pose
from ...ops.ransac import (
    _triangulate_midpoint,
    ransac_essential,
    ransac_homography,
)
from ..base_estimator import BaseEstimator

__main_class__ = "DeviceTwoViewEstimator"

# COLMAP TwoViewGeometry configuration codes (two_view_geometry.h)
CONFIG_DEGENERATE = 1
CONFIG_CALIBRATED = 2
CONFIG_PLANAR = 4
CONFIG_PANORAMIC = 5
CONFIG_NAMES = {
    CONFIG_DEGENERATE: "DEGENERATE",
    CONFIG_CALIBRATED: "CALIBRATED",
    CONFIG_PLANAR: "PLANAR",
    CONFIG_PANORAMIC: "PANORAMIC",
}


def pose_from_homography(H, p0, p1, weights):
    """Pick the physical (R, t, n) among the four decompositions of H.

    Two-stage disambiguation, as in COLMAP's PoseFromHomographyMatrix:
    the plane must be in front of camera 0 (n^T x0h > 0 on inliers), and
    the triangulated inlier points must have positive depth in both views.
    Returns (R, t_unit, t_norm): t_norm = |t|/d measures parallax — ~0
    means a pure-rotation (panoramic) configuration.
    """
    Rs, ts, ns = decompose_homography(H)
    x0h = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], -1)  # (N, 3)
    # plane visibility: fraction of weighted inliers with n^T x0h > 0
    front = jnp.einsum("kj,nj->kn", ns, x0h) > 0  # (4, N)
    vis = jnp.sum(front * weights[None], axis=-1)  # (4,)
    t_norms = jnp.linalg.norm(ts, axis=-1)  # (4,)
    t_unit = ts / jnp.maximum(t_norms, 1e-12)[:, None]

    def cheir(R, t):
        z0, z1 = _triangulate_midpoint(R, t, p0, p1)
        return jnp.sum(((z0 > 0) & (z1 > 0)) * weights)

    cheis = jax.vmap(cheir)(Rs, t_unit)  # (4,)
    # pure rotation: triangulation is ill-posed, fall back to visibility only
    degenerate_t = t_norms < 1e-6
    score = jnp.where(degenerate_t, vis, cheis + 1e-3 * vis)
    best = jnp.argmax(score)
    return Rs[best], t_unit[best], t_norms[best]


class DeviceTwoViewEstimator(BaseEstimator):
    default_conf = {
        "name": "device_two_view",
        "ransac_th": 4.0,  # pixels (COLMAP default max_error)
        "num_hypotheses": 1024,
        "lo_iters": 3,
        "seed": 0,
        "solver": "5pt",  # essential minimal solver
        "scoring": "msac",  # or "magsac" (sigma-consensus)
        "n_sigmas": 8,
        # H is selected when its inlier count exceeds this fraction of E's
        # (COLMAP TwoViewGeometryOptions.max_H_inlier_ratio analog)
        "max_h_e_inlier_ratio": 0.8,
        # |t|/d below this fraction of the scene scale = pure rotation
        "panoramic_t_thresh": 0.02,
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

        key_e, key_h = jax.random.split(jax.random.PRNGKey(self.conf.seed))
        res_e, R_e, t_e = ransac_essential(
            key_e,
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
        res_h = ransac_homography(
            key_h,
            r0,
            r1,
            valid,
            th=th,
            num_hyps=self.conf.num_hypotheses,
            lo_iters=self.conf.lo_iters,
            scoring=self.conf.scoring,
            n_sigmas=self.conf.n_sigmas,
        )

        n_e = jnp.sum(res_e.inliers)
        n_h = jnp.sum(res_h.inliers)
        planar = n_h > self.conf.max_h_e_inlier_ratio * jnp.maximum(n_e, 1)

        # homography pose: fix the projective sign so x1h^T H x0h > 0 on
        # inliers, then decompose and disambiguate
        H = res_h.M
        x0h = jnp.concatenate([r0, jnp.ones_like(r0[..., :1])], -1)
        x1h = jnp.concatenate([r1, jnp.ones_like(r1[..., :1])], -1)
        w_h = res_h.inliers.astype(jnp.float32)
        sign = jnp.sign(jnp.sum(jnp.sum(x1h * (x0h @ H.T), -1) * w_h) + 1e-12)
        R_h, t_h, t_norm = pose_from_homography(sign * H, r0, r1, w_h)
        # parallax relative to the (unit-ish) normalized-coordinate scene
        panoramic = planar & (t_norm < self.conf.panoramic_t_thresh)
        t_h = jnp.where(panoramic, jnp.zeros_like(t_h), t_h)

        R = jnp.where(planar, R_h, R_e)
        t = jnp.where(planar, t_h, t_e)
        inliers = jnp.where(planar, res_h.inliers, res_e.inliers)
        success = jnp.where(planar, res_h.success, res_e.success)
        config = jnp.where(
            ~success,
            CONFIG_DEGENERATE,
            jnp.where(
                planar,
                jnp.where(panoramic, CONFIG_PANORAMIC, CONFIG_PLANAR),
                CONFIG_CALIBRATED,
            ),
        )
        return {
            "success": success,
            "M_0to1": Pose.from_Rt(R, t),
            "inliers": inliers,
            "E": res_e.M,
            "H": res_h.M,
            "configuration": config,
            "type": CONFIG_NAMES[int(config)],
        }
