"""SfM back-end: triangulation, Schur BA, pose graph (BASELINE.json north
star — no reference counterpart, built from scratch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.sfm import (
    bundle_adjust,
    optimize_pose_graph,
    reprojection_residuals,
    triangulate_nview,
    triangulate_two_view,
)
from gluefactory_tpu.sfm.lie import se3_exp, se3_log, so3_exp


def _scene(rng, C=6, P=120, noise=0.0):
    """C cameras on an arc looking at a point cloud around the origin."""
    Rs, ts = [], []
    for i in range(C):
        ang = 0.25 * (i - C / 2) / C
        R = so3_exp(jnp.asarray([0.05 * rng.randn(), ang, 0.02 * rng.randn()]))
        center = np.array([2.0 * np.sin(ang * 4), 0.3 * rng.randn(), -6.0 + 0.2 * i])
        t = -np.asarray(R) @ center
        Rs.append(np.asarray(R))
        ts.append(t)
    Rs, ts = np.stack(Rs), np.stack(ts)
    pts = rng.randn(P, 3) * np.array([2.0, 1.5, 1.0])

    V = C
    cam_idx = np.broadcast_to(np.arange(C), (P, V)).copy()
    q = np.einsum("vij,pj->pvi", Rs, pts) + ts[None]
    uv = q[..., :2] / q[..., 2:3]
    valid = q[..., 2] > 0.1
    # drop some observations to make tracks ragged
    valid &= rng.rand(P, V) > 0.2
    keep = valid.sum(1) >= 3
    pts, cam_idx, uv, valid = pts[keep], cam_idx[keep], uv[keep], valid[keep]
    uv = uv + noise * rng.randn(*uv.shape) * valid[..., None]
    return (
        jnp.asarray(Rs, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
        jnp.asarray(ts, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(cam_idx, jnp.int32),
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(valid),
    )


def test_triangulate_two_view():
    rng = np.random.RandomState(0)
    R = np.asarray(so3_exp(jnp.asarray([0.02, -0.1, 0.03])))
    t = np.array([0.5, 0.05, 0.1])
    X = rng.randn(50, 3) * 1.5 + np.array([0, 0, 5.0])
    p0 = X[:, :2] / X[:, 2:]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:]
    Xt, ok = jax.jit(triangulate_two_view)(
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32),
        jnp.asarray(p0, jnp.float32),
        jnp.asarray(p1, jnp.float32),
    )
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(Xt), X, atol=1e-3)


def test_triangulate_nview():
    rng = np.random.RandomState(1)
    Rs, ts, pts, cam_idx, uv, valid = _scene(rng)
    est, ok = jax.jit(triangulate_nview)(Rs, ts, uv, valid)
    assert float(jnp.mean(ok)) > 0.95
    err = np.linalg.norm(np.asarray(est) - np.asarray(pts), axis=1)
    assert np.median(err[np.asarray(ok)]) < 1e-2


def test_bundle_adjust_converges_to_gt():
    rng = np.random.RandomState(2)
    Rs, ts, pts, cam_idx, uv, valid = _scene(rng)
    C = Rs.shape[0]
    # perturb all but the two gauge cameras + all points
    dR = so3_exp(jnp.asarray(rng.randn(C, 3) * 0.02, jnp.float32))
    Rs0 = jnp.where(jnp.arange(C)[:, None, None] < 2, Rs, dR @ Rs)
    ts0 = jnp.where(
        jnp.arange(C)[:, None] < 2,
        ts,
        ts + jnp.asarray(rng.randn(C, 3) * 0.05, jnp.float32),
    )
    pts0 = pts + jnp.asarray(rng.randn(*pts.shape) * 0.05, jnp.float32)

    fixed = jnp.arange(C) < 2
    r0, _ = reprojection_residuals(Rs0, ts0, pts0, cam_idx, uv, valid)
    Rn, tn, pn, info = jax.jit(
        lambda *a: bundle_adjust(*a, fixed_cameras=fixed, iters=30)
    )(Rs0, ts0, pts0, cam_idx, uv, valid)
    assert float(info["cost"]) < 1e-7 * float(info["cost0"]) + 1e-10

    rot_err = jnp.linalg.norm(se3_log(Rn @ jnp.swapaxes(Rs, -1, -2),
                                      tn - jnp.einsum("cij,ckj,ck->ci", Rn, Rs, ts)),
                              axis=-1)
    assert float(jnp.max(rot_err)) < 1e-3
    pt_err = np.linalg.norm(np.asarray(pn) - np.asarray(pts), axis=1)
    assert np.median(pt_err) < 1e-3


def test_bundle_adjust_sharded_matches_dense():
    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.sfm.ba import bundle_adjust_sharded

    rng = np.random.RandomState(3)
    Rs, ts, pts, cam_idx, uv, valid = _scene(rng, P=140)
    # pad landmarks to a multiple of 8 (invalid observations contribute zero)
    P = pts.shape[0]
    pad = (-P) % 8
    pts_p = jnp.concatenate([pts, jnp.ones((pad, 3))], 0)
    cam_p = jnp.concatenate([cam_idx, jnp.zeros((pad,) + cam_idx.shape[1:], jnp.int32)], 0)
    uv_p = jnp.concatenate([uv, jnp.zeros((pad,) + uv.shape[1:])], 0)
    val_p = jnp.concatenate([valid, jnp.zeros((pad,) + valid.shape[1:], bool)], 0)

    C = Rs.shape[0]
    fixed = jnp.arange(C) < 2
    dR = so3_exp(jnp.asarray(rng.randn(C, 3) * 0.02, jnp.float32))
    Rs0 = jnp.where(jnp.arange(C)[:, None, None] < 2, Rs, dR @ Rs)
    ts0 = ts + jnp.where(jnp.arange(C)[:, None] < 2, 0.0, 0.05)
    pts0 = pts_p + 0.03

    mesh = make_mesh(data=8, model=1)
    Rd, td, pd, info_d = bundle_adjust(
        Rs0, ts0, pts0, cam_p, uv_p, val_p, fixed_cameras=fixed, iters=15
    )
    Rsh, tsh, psh, info_s = bundle_adjust_sharded(
        mesh, Rs0, ts0, pts0, cam_p, uv_p, val_p, fixed_cameras=fixed, iters=15
    )
    np.testing.assert_allclose(np.asarray(Rsh), np.asarray(Rd), atol=5e-5)
    np.testing.assert_allclose(np.asarray(tsh), np.asarray(td), atol=5e-5)
    assert float(info_s["cost"]) < 1e-6 * max(float(info_s["cost0"]), 1e-12) + 1e-9


def test_pose_graph_closes_loop():
    rng = np.random.RandomState(4)
    K = 10
    # ground-truth poses around a loop
    Rs_gt, ts_gt = [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        R = np.asarray(so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        c = np.array([np.cos(ang), 0.0, np.sin(ang)]) * 3.0
        Rs_gt.append(R)
        ts_gt.append(-R @ c)
    Rs_gt, ts_gt = jnp.asarray(np.stack(Rs_gt), jnp.float32), jnp.asarray(
        np.stack(ts_gt), jnp.float32
    )

    # odometry edges k -> k+1 plus the loop-closure edge, exact measurements
    ea = np.array([k for k in range(K)], np.int32)
    eb = np.array([(k + 1) % K for k in range(K)], np.int32)
    from gluefactory_tpu.sfm.lie import se3_compose, se3_inverse

    Rbi, tbi = se3_inverse(Rs_gt[eb], ts_gt[eb])
    Rm, tm = se3_compose(Rs_gt[ea], ts_gt[ea], Rbi, tbi)

    # drifted initialization
    noise = jnp.asarray(rng.randn(K, 6) * 0.05, jnp.float32)
    noise = noise.at[0].set(0.0)
    dR, dt = se3_exp(noise)
    Rs0, ts0 = se3_compose(dR, dt, Rs_gt, ts_gt)

    Rn, tn, info = jax.jit(lambda *a: optimize_pose_graph(*a, iters=15))(
        Rs0, ts0, jnp.asarray(ea), jnp.asarray(eb), Rm, tm
    )
    assert float(info["cost"]) < 1e-10
    # recovered poses match GT (gauge fixed at node 0)
    err = se3_log(
        Rn @ jnp.swapaxes(Rs_gt, -1, -2),
        tn - jnp.einsum("kij,klj,kl->ki", Rn, Rs_gt, ts_gt),
    )
    assert float(jnp.max(jnp.linalg.norm(err, axis=-1))) < 1e-4


def test_odometry_trajectory_ate():
    """Sequence of noisy matched pairs -> 5pt relative poses -> chained
    trajectory -> pose-graph refinement with a loop closure -> ATE within
    bound (the north-star trajectory pipeline end to end)."""
    from gluefactory_tpu.sfm.lie import se3_compose, se3_inverse
    from gluefactory_tpu.sfm.odometry import (
        chain_poses,
        refine_trajectory,
        relative_poses_from_matches,
        trajectory_ate,
    )

    rng = np.random.RandomState(5)
    K = 6
    # GT trajectory: arc with small rotations
    Rs_gt, ts_gt = [], []
    for k in range(K):
        w = np.array([0.02 * k, 0.12 * k, -0.01 * k])
        R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        c = np.array([0.4 * k, 0.05 * np.sin(k), 0.1 * k])
        Rs_gt.append(R)
        ts_gt.append(-R @ c)
    Rs_gt = jnp.asarray(np.stack(Rs_gt), jnp.float32)
    ts_gt = jnp.asarray(np.stack(ts_gt), jnp.float32)

    # matched normalized points for consecutive pairs + one loop closure
    pts_w = rng.randn(400, 3) * np.array([3.0, 2.0, 1.5]) + np.array([1.0, 0, 8.0])
    edges = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
    P0, P1, V = [], [], []
    N = 256
    for a, b in edges:
        pa = pts_w @ np.asarray(Rs_gt[a]).T + np.asarray(ts_gt[a])
        pb = pts_w @ np.asarray(Rs_gt[b]).T + np.asarray(ts_gt[b])
        ok = (pa[:, 2] > 0.5) & (pb[:, 2] > 0.5)
        ia = np.where(ok)[0][:N]
        p0 = pa[ia, :2] / pa[ia, 2:]
        p1 = pb[ia, :2] / pb[ia, 2:]
        p0 += rng.randn(*p0.shape) * 5e-4
        p1 += rng.randn(*p1.shape) * 5e-4
        pad = N - len(p0)
        P0.append(np.pad(p0, ((0, pad), (0, 0))))
        P1.append(np.pad(p1, ((0, pad), (0, 0))))
        V.append(np.pad(np.ones(len(p0), bool), (0, pad)))
    P0, P1, V = map(np.stack, (P0, P1, V))

    R_rel, t_rel, success, _ = relative_poses_from_matches(
        jax.random.PRNGKey(0),
        jnp.asarray(P0, jnp.float32),
        jnp.asarray(P1, jnp.float32),
        jnp.asarray(V),
    )
    assert bool(jnp.all(success))

    # fix per-edge monocular scale from GT edge lengths (odometry-eval
    # convention), chain the K-1 odometry edges
    scales = []
    for a, b in edges[: K - 1]:
        R_ab = np.asarray(Rs_gt[b] @ Rs_gt[a].T)
        scales.append(np.linalg.norm(np.asarray(ts_gt[b]) - R_ab @ np.asarray(ts_gt[a])))
    Rs0, ts0 = chain_poses(R_rel[: K - 1], t_rel[: K - 1], jnp.asarray(scales, jnp.float32))

    ate0, _ = trajectory_ate(Rs0, ts0, Rs_gt, ts_gt)

    # pose-graph refinement with all edges incl. the loop closure
    ea = jnp.asarray([a for a, _ in edges], jnp.int32)
    eb = jnp.asarray([b for _, b in edges], jnp.int32)
    scl = jnp.asarray(
        scales + [float(np.linalg.norm(np.asarray(
            ts_gt[K - 1] - (Rs_gt[K - 1] @ Rs_gt[0].T) @ ts_gt[0]
        )))],
        jnp.float32,
    )
    # measured T_ab with x_a = T_ab x_b convention: T_ab = T_a T_b^{-1};
    # ransac gives T_{b<-a}; invert
    Rm, tm = se3_inverse(R_rel, t_rel * scl[:, None])
    Rn, tn, info = refine_trajectory(Rs0, ts0, ea, eb, Rm, tm)
    ate1, _ = trajectory_ate(Rn, tn, Rs_gt, ts_gt)

    # chained odometry is decent, refined trajectory is tight
    assert ate0 < 0.1, ate0
    assert ate1 <= ate0 + 1e-6
    assert ate1 < 0.02, (ate0, ate1)


def test_bundle_adjust_scales_to_larger_scene():
    """Map-scale sanity: 32 cameras x ~1500 landmarks, noisy init, converges
    (the north-star direction: distributed BA over camera/landmark blocks)."""
    rng = np.random.RandomState(7)
    Rs, ts, pts, cam_idx, uv, valid = _scene(rng, C=32, P=1600)
    C = Rs.shape[0]
    # gauge: fix the two most-separated cameras (adjacent arc cameras are
    # nearly coincident at C=32, which would leave global scale ill-fixed)
    is_fixed = (jnp.arange(C) == 0) | (jnp.arange(C) == C - 1)
    dR = so3_exp(jnp.asarray(rng.randn(C, 3) * 0.01, jnp.float32))
    Rs0 = jnp.where(is_fixed[:, None, None], Rs, dR @ Rs)
    ts0 = ts + jnp.where(is_fixed[:, None], 0.0, 0.02)
    pts0 = pts + jnp.asarray(rng.randn(*pts.shape) * 0.02, jnp.float32)
    fixed = is_fixed
    Rn, tn, pn, info = jax.jit(
        lambda *a: bundle_adjust(*a, fixed_cameras=fixed, iters=30)
    )(Rs0, ts0, pts0, cam_idx, uv, valid)
    assert float(info["cost"]) < 1e-8 * float(info["cost0"]) + 1e-12
    # cameras recover to GT; point depths on the narrowest-baseline tracks
    # are conditioning-limited in f32 (residuals ~1e-5 px), so assert on the
    # well-conditioned quantities
    rot_err = np.linalg.norm(
        np.asarray(se3_log(Rn @ jnp.swapaxes(Rs, -1, -2),
                           tn - jnp.einsum("cij,ckj,ck->ci", Rn, Rs, ts))),
        axis=-1,
    )
    assert float(np.max(rot_err)) < 5e-3
    pt_err = np.linalg.norm(np.asarray(pn) - np.asarray(pts), axis=1)
    assert np.median(pt_err) < 5e-2


def test_pose_graph_scales_to_long_trajectory():
    """Map-scale pose graph: 200 nodes, odometry chain + 30 loop closures,
    noisy edge measurements, drifted init. The dense (6K, 6K) solve and the
    vmapped per-edge Jacobians must stay numerically healthy at this size,
    and the loop closures must pull accumulated drift back to GT."""
    rng = np.random.RandomState(11)
    K = 200
    from gluefactory_tpu.sfm.lie import se3_compose, se3_inverse

    # GT: a gently curving corridor trajectory
    Rs_gt, ts_gt = [], []
    R = np.eye(3, dtype=np.float32)
    c = np.zeros(3, dtype=np.float32)
    for k in range(K):
        Rs_gt.append(R)
        ts_gt.append(-R @ c)
        dR = np.asarray(so3_exp(jnp.asarray([0.0, 0.03, 0.005], jnp.float32)))
        R = np.asarray(dR @ R, np.float32)
        c = c + np.asarray([0.2, 0.01 * np.sin(k / 7.0), 0.2]) @ R
    Rs_gt = jnp.asarray(np.stack(Rs_gt), jnp.float32)
    ts_gt = jnp.asarray(np.stack(ts_gt), jnp.float32)

    # edges: odometry chain + random long-range loop closures
    ea = list(range(K - 1))
    eb = list(range(1, K))
    for _ in range(30):
        a = int(rng.randint(0, K - 20))
        b = int(rng.randint(a + 10, K))
        ea.append(a)
        eb.append(b)
    ea.append(0)  # explicit start-to-end closure
    eb.append(K - 1)
    ea = jnp.asarray(np.asarray(ea, np.int32))
    eb = jnp.asarray(np.asarray(eb, np.int32))
    Rbi, tbi = se3_inverse(Rs_gt[eb], ts_gt[eb])
    Rm, tm = se3_compose(Rs_gt[ea], ts_gt[ea], Rbi, tbi)
    # odometry edges are noisy; loop closures are an order more precise
    # (and weighted accordingly), the standard SLAM information pattern
    E = int(ea.shape[0])
    sig = np.full((E, 1), 1e-4, np.float32)
    sig[: K - 1] = 4e-3
    nR, nt = se3_exp(jnp.asarray(rng.randn(E, 6) * sig, jnp.float32))
    Rm, tm = se3_compose(nR, nt, Rm, tm)
    weights = jnp.asarray(1.0 / sig[:, 0] ** 2)

    # init: integrate the noisy odometry edges only (drift accumulates)
    Rs0, ts0 = [np.asarray(Rs_gt[0])], [np.asarray(ts_gt[0])]
    for k in range(K - 1):
        # T_{k+1} = T_meas(k->k+1)^{-1} T_k
        Ri, ti = se3_inverse(Rm[k], tm[k])
        Rn_, tn_ = se3_compose(Ri, ti, jnp.asarray(Rs0[-1]), jnp.asarray(ts0[-1]))
        Rs0.append(np.asarray(Rn_))
        ts0.append(np.asarray(tn_))
    Rs0 = jnp.asarray(np.stack(Rs0), jnp.float32)
    ts0 = jnp.asarray(np.stack(ts0), jnp.float32)

    def center_err(Rs, ts):
        c_est = -jnp.einsum("kji,kj->ki", Rs, ts)
        c_gt = -jnp.einsum("kji,kj->ki", Rs_gt, ts_gt)
        return np.asarray(jnp.linalg.norm(c_est - c_gt, axis=-1))

    drift0 = center_err(Rs0, ts0)
    Rn, tn, info = jax.jit(lambda *a: optimize_pose_graph(*a, weights=weights, iters=12))(
        Rs0, ts0, ea, eb, Rm, tm
    )
    drift1 = center_err(Rn, tn)
    # odometry-only drift is visible; the optimized graph is an order tighter
    assert float(drift0.max()) > 0.05, drift0.max()
    assert float(drift1.max()) < 0.3 * float(drift0.max()), (
        drift0.max(),
        drift1.max(),
    )
    # cost decreased monotonically-ish and is finite at scale
    assert np.isfinite(float(info["cost"]))
    assert float(info["cost"]) < float(info["history"][0])


def _windowed_scene(rng, C, P, V=6):
    """Trajectory-style map: cameras along an arc, each landmark observed by
    a V-camera window around its anchor — the realistic visibility pattern
    for map-scale BA (contrast `_scene`'s all-cameras-see-all V=C)."""
    cs = np.arange(C)
    centers = np.stack([0.4 * cs, 0.05 * np.sin(cs * 0.1), 0.02 * cs], -1)
    Rs = np.stack([
        np.asarray(so3_exp(jnp.asarray(
            [0.01 * rng.randn(), 0.002 * c, 0.01 * rng.randn()], jnp.float32)))
        for c in cs
    ])
    ts = -np.einsum("cij,cj->ci", Rs, centers)
    anchor = (np.arange(P) * max(C - V, 1) // P).astype(np.int64)
    pts = centers[anchor] + np.stack([
        rng.randn(P) * 1.5 + 0.2 * V,
        rng.randn(P) * 1.0,
        rng.randn(P) * 0.5 + 6.0,
    ], -1)
    cam_idx = np.clip(anchor[:, None] + np.arange(V)[None], 0, C - 1)
    q = np.einsum("pvij,pj->pvi", Rs[cam_idx], pts) + ts[cam_idx]
    z = q[..., 2]
    uv = q[..., :2] / np.maximum(z[..., None], 1e-6)
    valid = (z > 0.5) & (np.abs(uv) < 1.5).all(-1)
    keep = valid.sum(1) >= 3
    # fixed-shape pad back to P so tests keep static shapes
    pad = P - int(keep.sum())
    f = jnp.asarray
    pts, cam_idx, uv, valid = pts[keep], cam_idx[keep], uv[keep], valid[keep]
    if pad:
        pts = np.concatenate([pts, np.ones((pad, 3)) * [0, 0, 6.0]], 0)
        cam_idx = np.concatenate([cam_idx, np.zeros((pad, V), np.int64)], 0)
        uv = np.concatenate([uv, np.zeros((pad, V, 2))], 0)
        valid = np.concatenate([valid, np.zeros((pad, V), bool)], 0)
    return (f(Rs, jnp.float32), f(ts, jnp.float32), f(pts, jnp.float32),
            f(cam_idx, jnp.int32), f(uv, jnp.float32), f(valid))


def _perturbed(rng, Rs, ts, pts, is_fixed, rot=0.005, tr=0.01, pt=0.01):
    C = Rs.shape[0]
    dR = so3_exp(jnp.asarray(rng.randn(C, 3) * rot, jnp.float32))
    Rs0 = jnp.where(is_fixed[:, None, None], Rs, dR @ Rs)
    ts0 = ts + jnp.where(
        is_fixed[:, None], 0.0, jnp.asarray(rng.randn(C, 3) * tr, jnp.float32))
    pts0 = pts + jnp.asarray(rng.randn(*pts.shape) * pt, jnp.float32)
    return Rs0, ts0, pts0


def test_pcg_matches_dense_solver():
    """The matrix-free PCG Schur path reaches the same optimum as the exact
    dense solve on a problem small enough to run both."""
    rng = np.random.RandomState(11)
    Rs, ts, pts, cam_idx, uv, valid = _windowed_scene(rng, C=24, P=600)
    C = Rs.shape[0]
    is_fixed = (jnp.arange(C) == 0) | (jnp.arange(C) == C - 1)
    Rs0, ts0, pts0 = _perturbed(rng, Rs, ts, pts, is_fixed)

    # both solvers drive the cost to the noise floor and recover the GT
    # poses (the optimum is unique with a two-camera gauge; comparing the
    # iterates to EACH OTHER is too strict — f32 LM paths differ along
    # ill-conditioned directions at equal cost)
    for solver in ("dense", "pcg"):
        # 150 CG iters: the 24-camera chain graph needs ~O(C) sweeps
        # for block-Jacobi CG to move along its flattest directions
        Rn, tn, pn, info = jax.jit(
            lambda *a, s=solver: bundle_adjust(
                *a, fixed_cameras=is_fixed, iters=15, solver=s, cg_iters=150)
        )(Rs0, ts0, pts0, cam_idx, uv, valid)
        assert float(info["cost"]) < 1e-6 * float(info["cost0"]) + 1e-12, solver
        rot_err = np.linalg.norm(
            np.asarray(se3_log(
                Rn @ jnp.swapaxes(Rs, -1, -2),
                tn - jnp.einsum("cij,ckj,ck->ci", Rn, Rs, ts))),
            axis=-1,
        )
        assert float(np.max(rot_err)) < 2e-3, solver


def test_bundle_adjust_map_scale_pcg():
    """Map scale (VERDICT r4 item 4): 256 cameras x 100k landmarks x ~600k
    observations. The dense path would need a (P, V, V, 6, 6) cross-term
    tensor and a 1536^2 solve; the PCG path runs it in seconds."""
    rng = np.random.RandomState(0)
    C, P = 256, 100_000
    Rs, ts, pts, cam_idx, uv, valid = _windowed_scene(rng, C=C, P=P)
    assert int(valid.sum()) > 500_000
    is_fixed = (jnp.arange(C) == 0) | (jnp.arange(C) == C - 1)
    Rs0, ts0, pts0 = _perturbed(rng, Rs, ts, pts, is_fixed)

    Rn, tn, pn, info = jax.jit(
        lambda *a: bundle_adjust(
            *a, fixed_cameras=is_fixed, iters=10, solver="pcg", cg_iters=40)
    )(Rs0, ts0, pts0, cam_idx, uv, valid)
    assert float(info["cost"]) < 1e-6 * float(info["cost0"])
    # scale-aware recovery: rotation angle, and camera centers relative to
    # the ~100-unit trajectory extent (the se3_log twist norm is
    # meaningless here — a 1e-3 rotation composed with |t| ~ 100 dominates)
    Rn_, Rs_ = np.asarray(Rn), np.asarray(Rs)
    ang = np.arccos(np.clip(
        (np.einsum("cii->c", Rn_ @ Rs_.transpose(0, 2, 1)) - 1) / 2, -1, 1))
    cn = -np.einsum("cji,cj->ci", Rn_, np.asarray(tn))
    cg = -np.einsum("cji,cj->ci", Rs_, np.asarray(ts))
    extent = np.abs(cg).max()
    assert float(ang.max()) < 1e-2
    assert float(np.linalg.norm(cn - cg, axis=-1).max()) < 5e-3 * extent


def test_bundle_adjust_sharded_pcg_matches():
    """Sharded PCG (per-CG-iteration (C, 6) psum) == single-device PCG."""
    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.sfm.ba import bundle_adjust_sharded

    rng = np.random.RandomState(5)
    Rs, ts, pts, cam_idx, uv, valid = _windowed_scene(rng, C=48, P=4000)
    C = Rs.shape[0]
    is_fixed = (jnp.arange(C) == 0) | (jnp.arange(C) == C - 1)
    Rs0, ts0, pts0 = _perturbed(rng, Rs, ts, pts, is_fixed)

    mesh = make_mesh(data=8, model=1)
    kw = dict(fixed_cameras=is_fixed, iters=10, solver="pcg", cg_iters=40)
    Rd, td, pd, info_d = bundle_adjust(
        Rs0, ts0, pts0, cam_idx, uv, valid, **kw)
    Rsh, tsh, psh, info_s = bundle_adjust_sharded(
        mesh, Rs0, ts0, pts0, cam_idx, uv, valid, **kw)
    # f32 psum reduction order shifts the CG trajectory slightly
    np.testing.assert_allclose(np.asarray(Rsh), np.asarray(Rd), atol=2e-4)
    np.testing.assert_allclose(np.asarray(tsh), np.asarray(td), atol=2e-4)
    assert float(info_s["cost"]) < 1e-6 * float(info_s["cost0"]) + 1e-12


def test_bundle_adjust_robust_resists_outliers():
    """5% of observations corrupted by gross noise: robust IRLS BA beats
    plain L2 (Huber, convex) and recovers GT cleanly with the redescending
    Cauchy kernel (Ceres HuberLoss/CauchyLoss analogs)."""
    rng = np.random.RandomState(21)
    Rs, ts, pts, cam_idx, uv, valid = _windowed_scene(rng, C=24, P=800)
    C = Rs.shape[0]
    # corrupt 5% of valid observations with large offsets
    v = np.asarray(valid)
    corrupt = (rng.rand(*v.shape) < 0.05) & v
    uv_bad = np.asarray(uv) + corrupt[..., None] * rng.uniform(
        0.2, 0.5, uv.shape) * rng.choice([-1, 1], uv.shape)
    uv_bad = jnp.asarray(uv_bad, jnp.float32)

    is_fixed = (jnp.arange(C) == 0) | (jnp.arange(C) == C - 1)
    Rs0, ts0, pts0 = _perturbed(rng, Rs, ts, pts, is_fixed)

    def rot_err(Rn, tn):
        Rn_, Rs_ = np.asarray(Rn), np.asarray(Rs)
        ang = np.arccos(np.clip(
            (np.einsum("cii->c", Rn_ @ Rs_.transpose(0, 2, 1)) - 1) / 2,
            -1, 1))
        return float(ang.max())

    Rh, th, ph, info_h = jax.jit(
        lambda *a: bundle_adjust(
            *a, fixed_cameras=is_fixed, iters=20, solver="pcg",
            cg_iters=150, huber_delta=0.01)
    )(Rs0, ts0, pts0, cam_idx, uv_bad, valid)
    Rcau, tcau, _, _ = jax.jit(
        lambda *a: bundle_adjust(
            *a, fixed_cameras=is_fixed, iters=20, solver="pcg",
            cg_iters=150, huber_delta=0.01, robust="cauchy")
    )(Rs0, ts0, pts0, cam_idx, uv_bad, valid)
    Rl, tl, pl, info_l = jax.jit(
        lambda *a: bundle_adjust(
            *a, fixed_cameras=is_fixed, iters=20, solver="pcg",
            cg_iters=150)
    )(Rs0, ts0, pts0, cam_idx, uv_bad, valid)

    e_h, e_l = rot_err(Rh, th), rot_err(Rl, tl)
    e_c = rot_err(Rcau, tcau)
    # Huber's linear tail still admits gross-outlier influence; Cauchy's
    # redescending weights drive it to zero
    assert e_h < 0.5 * e_l, (e_h, e_l)
    assert e_c < 0.5 * e_h, (e_c, e_h, e_l)
    assert e_c < 5e-3, (e_c, e_h, e_l)
    # clean-data sanity: huber == L2 solution when no residual exceeds delta
    Rc, tc, pc, _ = jax.jit(
        lambda *a: bundle_adjust(
            *a, fixed_cameras=is_fixed, iters=15, solver="dense",
            huber_delta=10.0)
    )(Rs0, ts0, pts0, cam_idx, uv, valid)
    assert rot_err(Rc, tc) < 2e-3
