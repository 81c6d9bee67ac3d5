"""Two-view geometry model selection + MAGSAC scoring.

Covers the pycolmap `two_view_geometry_estimation` analog (reference
`robust_estimators/relative_pose/pycolmap.py`): H/E estimation, configuration
classification, pose from homography decomposition — and the sigma-consensus
(MAGSAC-style) scoring option of the device LO-RANSAC.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.epipolar import relative_pose_error
from gluefactory_tpu.geometry.homography import decompose_homography, warp_points
from gluefactory_tpu.geometry.utils import so3exp_map
from gluefactory_tpu.geometry.wrappers import Camera, Pose
from gluefactory_tpu.ops.ransac import _magsac_score, _msac_score, ransac_homography
from gluefactory_tpu.robust_estimators.relative_pose.device_two_view import (
    DeviceTwoViewEstimator,
)

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]], np.float32)


def _project(p3d, K):
    uv = p3d[:, :2] / p3d[:, 2:]
    return uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def _scene(kind, seed=0, N=400, noise_px=0.5):
    """Synthetic two-view scene -> (kpts0, kpts1, T_gt) in pixels."""
    rng = np.random.RandomState(seed)
    R_gt = np.asarray(so3exp_map(jnp.asarray([0.06, -0.12, 0.04], jnp.float32)))
    if kind == "general":
        t_gt = np.array([0.4, 0.1, 0.15], np.float32)
        p3d = rng.rand(N, 3) * [2.0, 1.6, 3.0] + [-1.0, -0.8, 2.0]
    elif kind == "planar":
        t_gt = np.array([0.4, 0.1, 0.15], np.float32)
        xy = rng.rand(N, 2) * [2.0, 1.6] + [-1.0, -0.8]
        z = 2.5 + 0.3 * xy[:, 0] + 0.15 * xy[:, 1]  # tilted plane
        p3d = np.concatenate([xy * z[:, None] / 2.5, z[:, None]], -1)
    elif kind == "rotation":
        t_gt = np.zeros(3, np.float32)
        p3d = rng.rand(N, 3) * [2.0, 1.6, 3.0] + [-1.0, -0.8, 2.0]
    else:  # pragma: no cover
        raise ValueError(kind)
    p3d = p3d.astype(np.float32)
    p3d_1 = p3d @ R_gt.T + t_gt
    k0 = _project(p3d, K) + rng.randn(N, 2) * noise_px
    k1 = _project(p3d_1, K) + rng.randn(N, 2) * noise_px
    T = Pose.from_Rt(jnp.asarray(R_gt), jnp.asarray(t_gt))
    return k0.astype(np.float32), k1.astype(np.float32), T


def _add_outliers(k1, frac, rng):
    n_out = int(frac * len(k1))
    k1 = k1.copy()
    k1[:n_out] = rng.rand(n_out, 2) * [640, 480]
    return k1, n_out


def test_decompose_homography_planar():
    R_gt = np.asarray(so3exp_map(jnp.asarray([0.1, -0.2, 0.05], jnp.float32)))
    t_gt = np.array([0.3, -0.1, 0.15])
    n_gt = np.array([0.1, 0.2, 1.0])
    n_gt /= np.linalg.norm(n_gt)
    d = 2.0
    H = R_gt + np.outer(t_gt, n_gt) / d
    Rs, ts, ns = map(np.asarray, decompose_homography(jnp.asarray(H, jnp.float32)))
    # one candidate must match (R, t/d, n) exactly
    r_errs = [np.abs(Rs[i] - R_gt).max() for i in range(4)]
    best = int(np.argmin(r_errs))
    assert r_errs[best] < 1e-4
    # among the two candidates sharing that R, one has the right t sign
    t_errs = [
        np.linalg.norm(ts[i] - t_gt / d)
        for i in range(4)
        if np.abs(Rs[i] - R_gt).max() < 1e-4
    ]
    assert min(t_errs) < 1e-4
    n_errs = [
        np.linalg.norm(ns[i] - n_gt)
        for i in range(4)
        if np.abs(Rs[i] - R_gt).max() < 1e-4
    ]
    assert min(n_errs) < 1e-4


def test_decompose_homography_pure_rotation():
    R_gt = np.asarray(so3exp_map(jnp.asarray([0.1, -0.2, 0.05], jnp.float32)))
    Rs, ts, _ = map(np.asarray, decompose_homography(jnp.asarray(R_gt, jnp.float32)))
    assert np.linalg.norm(ts, axis=-1).max() < 1e-5
    for i in range(4):
        assert np.abs(Rs[i] - R_gt).max() < 1e-5


def _run_estimator(kind, seed=0, outlier_frac=0.2, **conf):
    rng = np.random.RandomState(100 + seed)
    k0, k1, T = _scene(kind, seed=seed)
    k1, n_out = _add_outliers(k1, outlier_frac, rng)
    cam = Camera.from_calibration_matrix(jnp.asarray(K), size=jnp.asarray([640, 480]))
    est = DeviceTwoViewEstimator({"num_hypotheses": 512, **conf})
    out = est(
        {
            "m_kpts0": jnp.asarray(k0),
            "m_kpts1": jnp.asarray(k1),
            "camera0": cam,
            "camera1": cam,
        }
    )
    return out, T, n_out


def test_two_view_general_scene_calibrated():
    out, T, n_out = _run_estimator("general")
    assert bool(out["success"])
    assert out["type"] == "CALIBRATED"
    M = out["M_0to1"]
    r_err, t_err = relative_pose_error(T, M.R, M.t)
    assert float(r_err) < 1.0, float(r_err)
    assert float(t_err) < 3.0, float(t_err)
    inl = np.asarray(out["inliers"])
    assert inl[n_out:].mean() > 0.8


def test_two_view_planar_scene():
    out, T, _ = _run_estimator("planar")
    assert bool(out["success"])
    assert out["type"] == "PLANAR"
    M = out["M_0to1"]
    r_err, t_err = relative_pose_error(T, M.R, M.t)
    assert float(r_err) < 1.5, float(r_err)
    assert float(t_err) < 5.0, float(t_err)


def test_two_view_pure_rotation_panoramic():
    out, T, _ = _run_estimator("rotation")
    assert bool(out["success"])
    assert out["type"] == "PANORAMIC"
    M = out["M_0to1"]
    # rotation recovered, translation reported as exactly zero
    from gluefactory_tpu.geometry.epipolar import angle_error_mat

    assert float(angle_error_mat(M.R, T.R)) < 1.0
    assert float(jnp.linalg.norm(M.t)) < 1e-6


# ---------------------------------------------------------------------------
# MAGSAC-style sigma-consensus scoring
# ---------------------------------------------------------------------------


def test_magsac_one_scale_equals_msac():
    rng = np.random.RandomState(0)
    err2 = jnp.asarray(rng.rand(4, 32) * 20, jnp.float32)
    valid = jnp.ones(32)
    s1, w1 = _msac_score(err2, 9.0, valid)
    s2, w2 = _magsac_score(err2, 9.0, valid, n_sigmas=1)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=0, atol=0)


def test_magsac_robust_to_loose_threshold():
    """Structured (second-plane) outliers + a threshold 15x the noise:
    sigma-consensus marginalization must beat hard MSAC truncation."""
    H_gt = jnp.asarray(
        [[1.05, 0.02, 15.0], [-0.01, 0.98, -8.0], [1e-5, 2e-5, 1.0]], jnp.float32
    )
    H_2 = jnp.asarray(
        [[0.9, -0.05, 40.0], [0.03, 1.1, -25.0], [-2e-5, 1e-5, 1.0]], jnp.float32
    )

    def trial(seed, scoring):
        rng = np.random.RandomState(seed)
        N = 256
        pts0 = jnp.asarray(rng.rand(N, 2) * 400 + 50, jnp.float32)
        n2 = int(0.45 * N)
        p1_in = warp_points(pts0, H_gt, inverse=False)
        p1_2 = warp_points(pts0, H_2, inverse=False)
        pts1 = p1_in.at[:n2].set(p1_2[:n2])
        pts1 = pts1 + jnp.asarray(rng.randn(N, 2) * 2.0, jnp.float32)
        res = ransac_homography(
            jax.random.PRNGKey(seed),
            pts0,
            pts1,
            jnp.ones(N, bool),
            th=30.0,
            num_hyps=256,
            scoring=scoring,
        )
        err = np.asarray(
            jnp.linalg.norm(
                warp_points(pts0[n2:], res.M, inverse=False)
                - warp_points(pts0[n2:], H_gt, inverse=False),
                axis=-1,
            )
        )
        return float(np.median(err))

    msac = np.mean([trial(s, "msac") for s in range(4)])
    magsac = np.mean([trial(s, "magsac") for s in range(4)])
    assert magsac < 0.7 * msac, (magsac, msac)
    assert magsac < 1.5, magsac


def test_adaptive_ransac_parity_and_early_exit():
    """Adaptive-termination LO-RANSAC (ops/ransac.ransac_homography_adaptive)
    matches fixed-batch quality on analytic fixtures and provably exits
    early at high inlier ratios (VERDICT r2 item 9; reference PoseLib
    `max_iterations`/`success_prob` semantics)."""
    from gluefactory_tpu.ops.ransac import ransac_homography_adaptive

    H_gt = jnp.asarray(
        [[1.05, 0.02, 15.0], [-0.01, 0.98, -8.0], [1e-5, 2e-5, 1.0]], jnp.float32
    )

    def make_pair(seed, inlier_ratio):
        rng = np.random.RandomState(seed)
        N = 256
        pts0 = jnp.asarray(rng.rand(N, 2) * 400 + 50, jnp.float32)
        p1 = warp_points(pts0, H_gt, inverse=False)
        n_out = int((1 - inlier_ratio) * N)
        outliers = jnp.asarray(rng.rand(n_out, 2) * 400 + 50, jnp.float32)
        p1 = p1.at[:n_out].set(outliers)
        p1 = p1 + jnp.asarray(rng.randn(N, 2) * 0.5, jnp.float32)
        return pts0, p1, n_out

    def h_err(res, pts0, n_out):
        return float(
            np.median(
                np.asarray(
                    jnp.linalg.norm(
                        warp_points(pts0[n_out:], res.M, inverse=False)
                        - warp_points(pts0[n_out:], H_gt, inverse=False),
                        axis=-1,
                    )
                )
            )
        )

    for ratio in (0.9, 0.3):
        errs_fixed, errs_adapt, used = [], [], []
        for seed in range(3):
            pts0, pts1, n_out = make_pair(seed, ratio)
            valid = jnp.ones(len(pts0), bool)
            key = jax.random.PRNGKey(seed)
            res_f = ransac_homography(
                key, pts0, pts1, valid, th=3.0, num_hyps=2048
            )
            res_a, hyps = ransac_homography_adaptive(
                key, pts0, pts1, valid, th=3.0, max_hyps=2048, chunk=128
            )
            errs_fixed.append(h_err(res_f, pts0, n_out))
            errs_adapt.append(h_err(res_a, pts0, n_out))
            used.append(int(hyps))
        # quality parity: adaptive within 0.5 px of fixed on the median
        assert np.mean(errs_adapt) <= np.mean(errs_fixed) + 0.5, (
            ratio, errs_adapt, errs_fixed,
        )
        assert np.mean(errs_adapt) < 2.0, (ratio, errs_adapt)
        if ratio == 0.9:
            # eps^4 = 0.65 -> ~5 samples needed: must stop after one chunk
            assert max(used) <= 256, used
        else:
            # eps^4 = 0.008 -> needs ~570 hypotheses: several chunks, but
            # still fewer than the fixed 2048 budget
            assert max(used) < 2048, used
