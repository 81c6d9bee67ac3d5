import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.epipolar import (
    T_to_E,
    decompose_essential_matrix,
    relative_pose_error,
    sym_epipolar_distance_all,
)
from gluefactory_tpu.geometry.homography import (
    compute_homography_dlt,
    compute_homography_np,
    sample_homography_corners,
    sym_homography_error,
    warp_points,
    warp_points_np,
)
from gluefactory_tpu.geometry.utils import (
    distort_points_kb4,
    so3exp_map,
    undistort_points_kb4,
)
from gluefactory_tpu.geometry.wrappers import Camera, Pose


def random_pose(rng, scale=1.0):
    aa = rng.randn(3) * 0.3
    t = rng.randn(3) * scale
    return Pose.from_aa(jnp.asarray(aa, jnp.float32), jnp.asarray(t, jnp.float32))


def test_pose_compose_inverse(rng):
    T1 = random_pose(rng)
    T2 = random_pose(rng)
    T = T2 @ T1
    I = (T.inv() @ T).matrix()
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)
    p = jnp.asarray(rng.randn(10, 3), jnp.float32)
    p2 = T2.transform(T1.transform(p))
    np.testing.assert_allclose(np.asarray(T.transform(p)), np.asarray(p2), atol=1e-5)


def test_pose_magnitude(rng):
    angle = 0.5  # rad
    aa = np.array([0.0, 0.0, angle])
    T = Pose.from_aa(jnp.asarray(aa, jnp.float32), jnp.zeros(3, jnp.float32))
    dr, dt = T.magnitude()
    assert abs(float(dr) - np.rad2deg(angle)) < 1e-4
    assert float(dt) < 1e-6


def test_so3exp_small_angle():
    R = so3exp_map(jnp.asarray([1e-9, 0, 0], jnp.float32))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_camera_project_unproject_pinhole(rng):
    cam = Camera.from_data(jnp.asarray([640, 480, 500.0, 500.0, 320.0, 240.0]))
    p3d = jnp.asarray(rng.rand(50, 3) * [2, 2, 4] + [-1, -1, 1], jnp.float32)
    p2d, valid = cam.world2image(p3d)
    rays, _ = cam.image2world(p2d)
    p3d_rec = rays * p3d[:, 2:3]
    np.testing.assert_allclose(np.asarray(p3d_rec), np.asarray(p3d), rtol=1e-4, atol=1e-4)
    assert bool(jnp.all(valid))


def test_camera_kb4_roundtrip(rng):
    pts = jnp.asarray(rng.randn(100, 2) * 0.4, jnp.float32)
    dist = jnp.asarray([0.05, -0.01, 0.003, -0.001], jnp.float32)
    d, _ = distort_points_kb4(pts, dist)
    u, valid = undistort_points_kb4(d, dist)
    np.testing.assert_allclose(np.asarray(u), np.asarray(pts), atol=1e-4)
    assert bool(jnp.all(valid))


def test_camera_kb4_full_chain(rng):
    cam = Camera(
        size=jnp.asarray([640.0, 480.0]),
        f=jnp.asarray([400.0, 400.0]),
        c=jnp.asarray([320.0, 240.0]),
        dist=jnp.asarray([0.1, -0.02, 0.003, -0.0005]),
        model="kb4",
    )
    p3d = jnp.asarray(rng.rand(30, 3) * [1, 1, 3] + [-0.5, -0.5, 1], jnp.float32)
    p2d, valid = cam.world2image(p3d)
    rays, _ = cam.image2world(p2d)
    rec = rays * p3d[:, 2:3]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(p3d), rtol=1e-3, atol=1e-3)


def test_camera_jacobian_matches_autodiff(rng):
    cam = Camera(
        size=jnp.asarray([640.0, 480.0]),
        f=jnp.asarray([400.0, 380.0]),
        c=jnp.asarray([320.0, 240.0]),
        dist=jnp.asarray([0.05, -0.01, 0.002, -0.0004]),
        model="kb4",
    )
    p3d = jnp.asarray([[0.3, -0.2, 2.0]], jnp.float32)
    J, valid = cam.J_world2image(p3d)

    def f(p):
        return cam.world2image(p[None])[0][0]

    J_auto = jax.jacobian(f)(p3d[0])
    np.testing.assert_allclose(np.asarray(J[0]), np.asarray(J_auto), atol=1e-3)


def test_camera_scale_crop():
    cam = Camera.from_data(jnp.asarray([640, 480, 500.0, 500.0, 320.0, 240.0]))
    cam2 = cam.scale(0.5)
    np.testing.assert_allclose(np.asarray(cam2.size), [320, 240])
    np.testing.assert_allclose(np.asarray(cam2.f), [250, 250])
    cam3 = cam.crop(jnp.asarray([100.0, 50.0]), jnp.asarray([400.0, 300.0]))
    np.testing.assert_allclose(np.asarray(cam3.c), [220, 190])


def test_homography_dlt_exact(rng):
    H_gt = jnp.asarray(
        [[1.1, 0.05, 10.0], [-0.03, 0.95, -5.0], [1e-4, -2e-4, 1.0]], jnp.float32
    )
    pts0 = jnp.asarray(rng.rand(1, 20, 2) * 400 + 50, jnp.float32)
    pts1 = warp_points(pts0, H_gt[None], inverse=False)
    H_est = compute_homography_dlt(pts0, pts1)
    err = sym_homography_error(pts0, pts1, H_est)
    assert float(jnp.max(err)) < 0.1


def test_homography_dlt_weighted_outliers(rng):
    H_gt = jnp.asarray(
        [[1.0, 0.0, 20.0], [0.0, 1.0, -10.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    pts0 = jnp.asarray(rng.rand(1, 30, 2) * 400, jnp.float32)
    pts1 = warp_points(pts0, H_gt[None], inverse=False)
    pts1 = pts1.at[:, :10].add(50.0)  # corrupt 10 points
    w = jnp.ones((1, 30)).at[:, :10].set(0.0)
    H_est = compute_homography_dlt(pts0, pts1, w)
    err = sym_homography_error(pts0[:, 10:], pts1[:, 10:], H_est)
    assert float(jnp.max(err)) < 0.1


def test_sample_homography_matches_np_warp(rng):
    from numpy.random import RandomState

    H, pts1, pts2, _ = sample_homography_corners(
        (640, 480), (640, 480), difficulty=0.5, rng=RandomState(0)
    )
    # H maps normalized coords of shape; check warp consistency jnp vs np
    pts = rng.rand(15, 2).astype(np.float32)
    w_np = warp_points_np(pts, H, inverse=False)
    w_j = warp_points(jnp.asarray(pts), jnp.asarray(H), inverse=False)
    np.testing.assert_allclose(np.asarray(w_j), w_np, atol=1e-4)


def test_epipolar_distance_zero_for_true_matches(rng):
    T = random_pose(rng)
    p3d = rng.rand(40, 3) * [2, 2, 3] + [-1, -1, 2]
    p0 = p3d[:, :2] / p3d[:, 2:]
    p3d_1 = np.asarray(T.transform(jnp.asarray(p3d, jnp.float32)))
    p1 = p3d_1[:, :2] / p3d_1[:, 2:]
    E = T_to_E(T)
    d = sym_epipolar_distance_all(jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32), E)
    diag = jnp.diagonal(d)
    assert float(jnp.max(diag)) < 1e-3


def test_decompose_essential_recovers_pose(rng):
    T = random_pose(rng)
    E = T_to_E(T)
    R1, R2, t = decompose_essential_matrix(E)
    r_errs = []
    for R in (R1, R2):
        for tt in (t, -t):
            r, te = relative_pose_error(T, R, tt)
            r_errs.append((float(r), float(te)))
    best = min(r_errs, key=lambda x: x[0] + x[1])
    assert best[0] < 0.1 and best[1] < 0.1
