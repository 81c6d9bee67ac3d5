"""Two-view odometry -> trajectory: the glue between the matching stack and
the multi-view back-end (BASELINE.json north star: "match the reference's
trajectories within its ATE bound").

Pipeline: per-pair relative poses from the batched 5-point essential
LO-RANSAC (`ops/ransac.py`), chained into an absolute trajectory
(per-edge scale fixed externally — monocular odometry is scale-blind per
edge), then globally refined by pose-graph optimization over odometry +
loop-closure edges (`sfm/pose_graph.py`). ATE via Umeyama alignment of
camera centers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ransac import ransac_essential
from .lie import se3_compose, se3_inverse
from .pose_graph import optimize_pose_graph


def relative_poses_from_matches(
    key,
    pts0,
    pts1,
    valid,
    th: float = 2e-3,
    num_hyps: int = 512,
    solver: str = "5pt",
):
    """Batched relative poses for E edges of matched normalized coords.

    pts0/pts1: (E, N, 2); valid: (E, N). Returns (R (E, 3, 3), t (E, 3)
    unit-norm, success (E,), inliers (E, N)).
    """
    E = pts0.shape[0]
    keys = jax.random.split(key, E)

    def one(k, p0, p1, v):
        res, R, t = ransac_essential(
            k, p0, p1, v, th=th, num_hyps=num_hyps, solver=solver
        )
        return R, t, res.success, res.inliers

    return jax.vmap(one)(keys, pts0, pts1, valid)


def chain_poses(R_rel, t_rel, scales=None):
    """Chain K-1 relative poses (i -> i+1) into K absolute world->cam poses
    with identity at the first frame. scales: per-edge metric scale for the
    unit translations (monocular scale must come from elsewhere)."""
    K = R_rel.shape[0] + 1
    if scales is not None:
        t_rel = t_rel * scales[:, None]
    Rs = [jnp.eye(3)]
    ts = [jnp.zeros(3)]
    for e in range(K - 1):
        R, t = se3_compose(R_rel[e], t_rel[e], Rs[-1], ts[-1])
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


def refine_trajectory(Rs, ts, edges_a, edges_b, R_meas, t_meas, weights=None, iters=15):
    """Pose-graph refinement over odometry + loop-closure edges."""
    return optimize_pose_graph(
        Rs, ts, edges_a, edges_b, R_meas, t_meas, weights=weights, iters=iters
    )


def camera_centers(Rs, ts):
    """world->cam (R, t) -> camera centers -R^T t."""
    return -jnp.einsum("kji,kj->ki", Rs, ts)


def trajectory_ate(Rs_est, ts_est, Rs_gt, ts_gt, with_scale=True):
    """Absolute trajectory error after Umeyama similarity alignment of the
    camera centers. Returns (ate_rmse, aligned_centers)."""
    X = np.asarray(camera_centers(Rs_est, ts_est))  # (K, 3)
    Y = np.asarray(camera_centers(Rs_gt, ts_gt))
    mx, my = X.mean(0), Y.mean(0)
    Xc, Yc = X - mx, Y - my
    cov = Yc.T @ Xc / len(X)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (Xc**2).sum() / len(X)
        s = float(np.trace(np.diag(D) @ S) / max(var, 1e-12))
    else:
        s = 1.0
    t = my - s * R @ mx
    Xa = (s * (R @ X.T)).T + t
    ate = float(np.sqrt(np.mean(np.sum((Xa - Y) ** 2, axis=1))))
    return ate, Xa
