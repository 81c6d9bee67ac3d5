"""Native C++ LO-RANSAC vs GT and vs the device estimator."""

import numpy as np
import pytest

from gluefactory_tpu.robust_estimators.native import (
    native_ransac_essential,
    native_ransac_homography,
)


def test_native_homography():
    rng = np.random.RandomState(0)
    H_gt = np.array([[1.05, 0.02, 15.0], [-0.01, 0.98, -8.0], [1e-5, 2e-5, 1.0]])
    N = 300
    p0 = rng.rand(N, 2) * 400 + 50
    p0h = np.c_[p0, np.ones(N)]
    p1 = p0h @ H_gt.T
    p1 = p1[:, :2] / p1[:, 2:]
    n_out = 120  # 40% outliers
    p1[:n_out] = rng.rand(n_out, 2) * 400
    ok, H, inl, n = native_ransac_homography(p0, p1, th=3.0, seed=1)
    assert ok
    assert inl[n_out:].mean() > 0.95
    assert inl[:n_out].mean() < 0.05
    # corner error vs GT
    corners = np.array([[0, 0, 1], [400, 0, 1], [400, 400, 1], [0, 400, 1]], float)
    w_est = corners @ H.astype(float).T
    w_gt = corners @ H_gt.T
    err = np.linalg.norm(
        w_est[:, :2] / w_est[:, 2:] - w_gt[:, :2] / w_gt[:, 2:], axis=-1
    )
    assert err.max() < 2.0, err


def test_native_essential():
    import cv2

    rng = np.random.RandomState(1)
    R_gt, _ = cv2.Rodrigues(np.array([0.05, -0.1, 0.03]))
    t_gt = np.array([0.5, 0.1, 0.2])
    N = 400
    p3d = rng.rand(N, 3) * [2, 2, 4] + [-1, -1, 2]
    p0 = (p3d[:, :2] / p3d[:, 2:]).astype(np.float32)
    p3d_1 = p3d @ R_gt.T + t_gt
    p1 = (p3d_1[:, :2] / p3d_1[:, 2:]).astype(np.float32)
    n_out = 100
    p1[:n_out] = rng.randn(n_out, 2) * 0.5
    ok, E, R, t, inl, n = native_ransac_essential(p0, p1, th=2e-3, seed=1)
    assert ok
    cos = (np.trace(R.astype(float).T @ R_gt) - 1) / 2
    r_err = np.rad2deg(np.arccos(np.clip(cos, -1, 1)))
    t_dir = t / np.linalg.norm(t)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    t_err = np.rad2deg(np.arccos(np.clip(abs(t_dir @ t_gt_dir), -1, 1)))
    assert r_err < 1.0, r_err
    assert t_err < 2.0, t_err
    assert inl[n_out:].mean() > 0.9


def test_native_estimator_registry():
    from gluefactory_tpu.robust_estimators import load_estimator

    cls = load_estimator("homography", "native_cpp")
    est = cls({"ransac_th": 3.0})
    rng = np.random.RandomState(0)
    p0 = rng.rand(100, 2).astype(np.float32) * 300
    p1 = p0 + np.array([10, -5], np.float32)
    out = est({"m_kpts0": p0, "m_kpts1": p1})
    assert out["success"]
    np.testing.assert_allclose(out["M_0to1"][0, 2], 10.0, atol=0.5)


def test_native_essential_5pt_planar():
    """5-pt Nister handles the planar scene where 8-pt is rank-deficient
    (PoseLib parity, reference `relative_pose/poselib.py:9-45`)."""
    from gluefactory_tpu.robust_estimators.native import native_ransac_essential

    from test_essential_5pt import _planar_scene, _pose_err_deg

    for seed in (2, 3):
        rng = np.random.RandomState(seed)
        p0, p1, R, t = _planar_scene(rng)
        ok, E, R5, t5, inl, n = native_ransac_essential(
            p0, p1, th=2e-3, solver="5pt", seed=seed
        )
        assert ok
        r_err, t_err = _pose_err_deg(R5, t5, R, t)
        assert r_err < 1.0 and t_err < 2.0, (seed, r_err, t_err)
        _, _, R8, t8, _, _ = native_ransac_essential(
            p0, p1, th=2e-3, solver="8pt", seed=seed
        )
        _, t_err8 = _pose_err_deg(R8, t8, R, t)
        assert t_err8 > 10.0, t_err8  # the linear solver stays degenerate
