import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.homography import warp_points
from gluefactory_tpu.ops.assignment import filter_matches, log_sinkhorn, sigmoid_log_double_softmax
from gluefactory_tpu.ops.keypoints import sample_descriptors, simple_nms, top_k_keypoints
from gluefactory_tpu.ops.ransac import ransac_essential, ransac_homography
from gluefactory_tpu.geometry.wrappers import Pose


def test_simple_nms_keeps_isolated_maxima():
    s = jnp.zeros((1, 32, 32))
    s = s.at[0, 5, 5].set(1.0).at[0, 20, 20].set(0.8).at[0, 5, 7].set(0.5)
    out = simple_nms(s, radius=2)
    assert abs(float(out[0, 5, 5]) - 1.0) < 1e-6
    assert abs(float(out[0, 20, 20]) - 0.8) < 1e-6
    assert float(out[0, 5, 7]) == 0.0  # suppressed by (5,5)


def test_top_k_fixed_shape():
    s = jnp.zeros((2, 16, 16))
    s = s.at[0, 3, 4].set(0.9).at[0, 10, 2].set(0.7)
    kpts, vals, valid = top_k_keypoints(s, k=8, threshold=0.1)
    assert kpts.shape == (2, 8, 2)
    assert int(valid[0].sum()) == 2
    assert int(valid[1].sum()) == 0
    np.testing.assert_allclose(np.asarray(kpts[0, 0]), [4, 3])  # (x, y)


def test_sample_descriptors_normalized():
    rng = np.random.RandomState(0)
    desc = jnp.asarray(rng.randn(1, 32, 8, 8), jnp.float32)  # (B, C, Hc, Wc)
    kpts = jnp.asarray([[[8.0, 8.0], [32.0, 24.0]]])
    d = sample_descriptors(kpts, desc, s=8)
    assert d.shape == (1, 2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_filter_matches_mutual():
    scores = jnp.log(
        jnp.asarray(
            [[[0.8, 0.1, 0.05], [0.05, 0.7, 0.1], [0.1, 0.1, 0.2]]], jnp.float32
        )
    )
    m0, m1, s0, s1 = filter_matches(scores, threshold=0.3)
    np.testing.assert_array_equal(np.asarray(m0[0]), [0, 1, -1])
    np.testing.assert_array_equal(np.asarray(m1[0]), [0, 1, -1])


def test_sinkhorn_marginals():
    rng = np.random.RandomState(0)
    B, N, M = 1, 6, 5
    scores = jnp.asarray(rng.randn(B, N, M), jnp.float32)
    Z = log_sinkhorn(scores, jnp.asarray(1.0), iters=50)
    P = np.exp(np.asarray(Z))  # (B, N+1, M+1), already scaled by (N+M)
    rows = P[0, :N, :].sum(axis=-1)
    np.testing.assert_allclose(rows, 1.0, atol=1e-2)


def test_sinkhorn_masked():
    rng = np.random.RandomState(0)
    B, N, M = 1, 6, 5
    scores = jnp.asarray(rng.randn(B, N, M), jnp.float32)
    mask0 = jnp.asarray([[1, 1, 1, 1, 0, 0]], bool)
    mask1 = jnp.asarray([[1, 1, 1, 0, 0]], bool)
    Z = log_sinkhorn(scores, jnp.asarray(1.0), iters=50, mask0=mask0, mask1=mask1)
    P = np.exp(np.asarray(Z))
    # masked rows contribute ~nothing
    assert P[0, 4, :].sum() < 1e-6
    rows = P[0, :4, :].sum(axis=-1)
    np.testing.assert_allclose(rows, 1.0, atol=1e-2)


def test_double_softmax_masked():
    rng = np.random.RandomState(0)
    sim = jnp.asarray(rng.randn(1, 4, 4), jnp.float32)
    z = jnp.zeros((1, 4))
    mask0 = jnp.asarray([[1, 1, 1, 0]], bool)
    scores = sigmoid_log_double_softmax(sim, z, z, mask0, None)
    assert np.asarray(scores)[0, 3].max() <= -1e8


def test_ransac_homography_recovers_gt():
    rng = np.random.RandomState(0)
    H_gt = jnp.asarray(
        [[1.05, 0.02, 15.0], [-0.01, 0.98, -8.0], [1e-5, 2e-5, 1.0]], jnp.float32
    )
    N = 256
    pts0 = jnp.asarray(rng.rand(N, 2) * 400 + 50, jnp.float32)
    pts1 = warp_points(pts0, H_gt, inverse=False)
    # 30% outliers
    n_out = int(0.3 * N)
    noise = jnp.asarray(rng.rand(n_out, 2) * 400, jnp.float32)
    pts1 = pts1.at[:n_out].set(noise)
    valid = jnp.ones(N, bool)
    key = jax.random.PRNGKey(0)
    res = ransac_homography(key, pts0, pts1, valid, th=3.0, num_hyps=256)
    assert bool(res.success)
    # inliers should exclude the corrupted ones
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.95
    assert inl[:n_out].mean() < 0.1
    # warp check
    err = np.asarray(
        jnp.linalg.norm(warp_points(pts0[n_out:], res.M, inverse=False) - pts1[n_out:], axis=-1)
    )
    assert np.median(err) < 1.0


def test_ransac_essential_recovers_pose():
    rng = np.random.RandomState(1)
    aa = np.array([0.05, -0.1, 0.03])
    t = np.array([0.5, 0.1, 0.2])
    T = Pose.from_aa(jnp.asarray(aa, jnp.float32), jnp.asarray(t, jnp.float32))
    N = 512
    p3d = rng.rand(N, 3) * [2, 2, 4] + [-1, -1, 2]
    p0 = (p3d[:, :2] / p3d[:, 2:]).astype(np.float32)
    p3d_1 = np.asarray(T.transform(jnp.asarray(p3d, jnp.float32)))
    p1 = (p3d_1[:, :2] / p3d_1[:, 2:]).astype(np.float32)
    # 25% outliers
    n_out = N // 4
    p1[:n_out] = rng.randn(n_out, 2) * 0.5
    key = jax.random.PRNGKey(0)
    res, R, t_est = ransac_essential(
        key, jnp.asarray(p0), jnp.asarray(p1), jnp.ones(N, bool), th=2e-3, num_hyps=512
    )
    from gluefactory_tpu.geometry.epipolar import relative_pose_error

    r_err, t_err = relative_pose_error(T, R, t_est)
    assert float(r_err) < 1.0, float(r_err)
    assert float(t_err) < 2.0, float(t_err)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9


def test_block_topk_exact_after_nms():
    rng = np.random.RandomState(2)
    s = jnp.asarray(rng.rand(2, 64, 96), jnp.float32)
    nms = simple_nms(s, radius=4)
    k = 50
    kp_full, v_full, val_full = top_k_keypoints(nms, k, 0.1, nms_radius=0)
    kp_blk, v_blk, val_blk = top_k_keypoints(nms, k, 0.1, nms_radius=4)
    # same scores selected (coords may tie-order differently at equal scores)
    np.testing.assert_allclose(np.asarray(v_blk), np.asarray(v_full), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(val_blk), np.asarray(val_full))
    # all selected positions carry the same score in the original map
    for b in range(2):
        sel = np.asarray(val_blk[b])
        xy = np.asarray(kp_blk[b][sel]).astype(int)
        got = np.asarray(nms[b])[xy[:, 1], xy[:, 0]]
        np.testing.assert_allclose(got, np.asarray(v_blk[b][sel]), atol=1e-6)


def test_hybrid_point_line_homography():
    from gluefactory_tpu.ops.ransac import ransac_homography_points_lines

    rng = np.random.RandomState(3)
    H_gt = jnp.asarray(
        [[1.02, 0.03, 8.0], [-0.02, 0.97, -5.0], [1e-5, -1e-5, 1.0]], jnp.float32
    )
    N, L = 60, 20
    pts0 = jnp.asarray(rng.rand(N, 2) * 400 + 40, jnp.float32)
    pts1 = warp_points(pts0, H_gt, inverse=False)
    pts1 = pts1.at[:20].set(jnp.asarray(rng.rand(20, 2) * 400, jnp.float32))
    # lines: endpoints warped exactly
    l0a = rng.rand(L, 2) * 350 + 50
    l0b = l0a + rng.randn(L, 2) * 60
    lines0 = jnp.asarray(np.stack([l0a, l0b], 1), jnp.float32)
    lines1 = jnp.stack(
        [
            warp_points(lines0[:, 0], H_gt, inverse=False),
            warp_points(lines0[:, 1], H_gt, inverse=False),
        ],
        axis=1,
    )
    res = ransac_homography_points_lines(
        jax.random.PRNGKey(0),
        pts0, pts1, jnp.ones(N, bool),
        lines0, lines1, jnp.ones(L, bool),
        th=3.0, num_hyps=256,
    )
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    assert inl[20:].mean() > 0.9
    from gluefactory_tpu.geometry.homography import homography_corner_error

    err = float(homography_corner_error(res.M, H_gt, jnp.asarray([400.0, 400.0])))
    assert err < 2.0, err
