import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.gt_generation import (
    IGNORE_FEATURE,
    UNMATCHED_FEATURE,
    gt_matches_from_homography,
    gt_matches_from_pose_depth,
)
from gluefactory_tpu.geometry.homography import warp_points
from gluefactory_tpu.geometry.wrappers import Camera, Pose


def test_gt_homography_identity(rng):
    N = 32
    kp = jnp.asarray(rng.rand(1, N, 2) * 400, jnp.float32)
    H = jnp.eye(3)[None]
    out = gt_matches_from_homography(kp, kp, H)
    np.testing.assert_array_equal(np.asarray(out["gt_matches0"][0]), np.arange(N))
    np.testing.assert_array_equal(np.asarray(out["gt_matches1"][0]), np.arange(N))
    assert int(out["gt_assignment"].sum()) == N


def test_gt_homography_with_outliers_and_padding(rng):
    N = 16
    kp0 = jnp.asarray(rng.rand(1, N, 2) * 300 + 50, jnp.float32)
    H = jnp.asarray(
        [[[1.0, 0.02, 5.0], [-0.01, 1.0, -3.0], [0.0, 0.0, 1.0]]], jnp.float32
    )
    kp1 = warp_points(kp0, H, inverse=False)
    # shift last 4 keypoints far away -> unmatched
    kp1 = kp1.at[:, -4:].add(100.0)
    valid0 = jnp.ones((1, N), bool).at[:, :2].set(False)  # first two are padding
    out = gt_matches_from_homography(kp0, kp1, H, valid0=valid0, pos_th=3, neg_th=6)
    m0 = np.asarray(out["gt_matches0"][0])
    assert (m0[:2] == IGNORE_FEATURE).all()  # padded -> ignore
    assert (m0[2 : N - 4] == np.arange(2, N - 4)).all()  # clean matches
    assert (m0[-4:] == UNMATCHED_FEATURE).all()  # far away -> negative


def test_gt_homography_ignore_band(rng):
    # displacement between pos_th and neg_th must be IGNORE
    N = 8
    kp0 = jnp.asarray(rng.rand(1, N, 2) * 200 + 100, jnp.float32)
    kp1 = kp0 + 4.0  # between pos_th=3 and neg_th=6
    H = jnp.eye(3)[None]
    out = gt_matches_from_homography(kp0, kp1, H, pos_th=3, neg_th=6)
    assert (np.asarray(out["gt_matches0"][0]) == IGNORE_FEATURE).all()


def _make_two_view(rng, N=64, noise=0.0):
    cam = Camera.from_data(jnp.asarray([640, 480, 400.0, 400.0, 320.0, 240.0]))
    T = Pose.from_aa(
        jnp.asarray([0.02, -0.03, 0.01], jnp.float32),
        jnp.asarray([0.1, 0.02, 0.05], jnp.float32),
    )
    # random 3D points in front of both cameras at depth 2-6
    p3d = rng.rand(N, 3) * [3, 2, 4] + [-1.5, -1, 2]
    p3d = jnp.asarray(p3d, jnp.float32)
    kp0, v0 = cam.world2image(p3d)
    p3d_1 = T.transform(p3d)
    kp1, v1 = cam.world2image(p3d_1)
    # dense depth: constant-depth planes won't match the points; instead build
    # depth maps by splatting point depths (nearest pixel)
    depth0 = np.zeros((480, 640), np.float32)
    depth1 = np.zeros((480, 640), np.float32)
    for i in range(N):
        x0, y0 = np.asarray(jnp.round(kp0[i])).astype(int)
        x1, y1 = np.asarray(jnp.round(kp1[i])).astype(int)
        if 0 <= x0 < 640 and 0 <= y0 < 480:
            depth0[max(y0 - 2, 0) : y0 + 3, max(x0 - 2, 0) : x0 + 3] = float(p3d[i, 2])
        if 0 <= x1 < 640 and 0 <= y1 < 480:
            depth1[max(y1 - 2, 0) : y1 + 3, max(x1 - 2, 0) : x1 + 3] = float(
                p3d_1[i, 2]
            )
    return cam, T, kp0[None], kp1[None], jnp.asarray(depth0)[None], jnp.asarray(depth1)[None], v0 & v1


def test_gt_pose_depth_matches(rng):
    cam, T, kp0, kp1, depth0, depth1, vis = _make_two_view(rng)
    out = gt_matches_from_pose_depth(
        kp0, kp1, depth0, depth1, cam, cam, T, pos_th=3, neg_th=5, cc_th=0.1
    )
    m0 = np.asarray(out["gt_matches0"][0])
    visible = np.asarray(vis)
    # most visible points should be matched to their own index
    good = (m0 == np.arange(len(m0))) & visible
    assert good.sum() > 0.8 * visible.sum()


def test_gt_pose_depth_epipolar_negatives(rng):
    cam, T, kp0, kp1, depth0, depth1, _ = _make_two_view(rng, N=32)
    # zero out depth -> nothing projects; without epi_th everything is IGNORE
    zdepth0 = jnp.zeros_like(depth0)
    zdepth1 = jnp.zeros_like(depth1)
    out = gt_matches_from_pose_depth(
        kp0, kp1, zdepth0, zdepth1, cam, cam, T, pos_th=3, neg_th=5
    )
    assert (np.asarray(out["gt_matches0"][0]) == IGNORE_FEATURE).all()
    # keypoints far from all epipolar lines become certain negatives
    kp1_far = kp1 + jnp.asarray([0.0, 150.0])
    out2 = gt_matches_from_pose_depth(
        kp0, kp1_far, zdepth0, zdepth1, cam, cam, T, pos_th=3, neg_th=5, epi_th=0.05
    )
    m1 = np.asarray(out2["gt_matches1"][0])
    assert (m1 == UNMATCHED_FEATURE).sum() > 0


def test_gt_roma_warp(rng):
    from gluefactory_tpu.geometry.gt_generation import gt_matches_from_roma_warp

    H_img, W_img = 60, 80
    # warp = identity + (5, 3) shift
    ys, xs = np.meshgrid(np.arange(H_img), np.arange(W_img), indexing="ij")
    warp = np.stack([xs + 5.0, ys + 3.0], -1).astype(np.float32)[None]
    cert = np.full((1, H_img, W_img), 0.9, np.float32)
    cert[:, :, :20] = 0.1  # left stripe uncertain
    kp0 = jnp.asarray(rng.rand(1, 20, 2) * [60, 50] + [5, 5], jnp.float32)
    kp1 = kp0 + jnp.asarray([5.0, 3.0])
    out = gt_matches_from_roma_warp(
        kp0, kp1, jnp.asarray(warp), jnp.asarray(cert), pos_th=2.0
    )
    m0 = np.asarray(out["gt_matches0"][0])
    x0 = np.asarray(kp0[0, :, 0])
    confident = x0 >= 23  # clear of the bilinear boundary band
    uncertain = x0 <= 18
    # confident keypoints match their shifted selves; uncertain -> ignore
    assert (m0[confident] == np.arange(20)[confident]).all(), m0
    assert (m0[uncertain] == IGNORE_FEATURE).all(), m0
