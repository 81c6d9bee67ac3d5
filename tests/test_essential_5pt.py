"""5-point essential solver: GT recovery on minimal problems, and the
planar-scene RANSAC behavior that motivates it (reference parity target:
PoseLib's Nister solver, `/root/reference/gluefactory/robust_estimators/
relative_pose/poselib.py:9-45` — the 8-point algorithm is rank-deficient on
planar scenes, the 5-point solver is not)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.ops.essential_5pt import essential_5pt
from gluefactory_tpu.ops.ransac import ransac_essential


def _rand_rot(rng):
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def _make_minimal_problems(rng, trials):
    P0, P1, EG = [], [], []
    for _ in range(trials):
        R = _rand_rot(rng)
        t = rng.randn(3)
        t /= np.linalg.norm(t)
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        E_gt = tx @ R
        X = rng.randn(5, 3) * 2 + np.array([0, 0, 6])
        p0 = X[:, :2] / X[:, 2:3]
        X1 = X @ R.T + t
        p1 = X1[:, :2] / X1[:, 2:3]
        P0.append(p0)
        P1.append(p1)
        EG.append(E_gt / np.linalg.norm(E_gt) * np.sqrt(2))
    return np.stack(P0), np.stack(P1), np.stack(EG)


def test_essential_5pt_recovers_gt():
    rng = np.random.RandomState(0)
    trials = 40
    P0, P1, EG = _make_minimal_problems(rng, trials)
    E, valid = jax.jit(essential_5pt)(
        jnp.asarray(P0, jnp.float32), jnp.asarray(P1, jnp.float32)
    )
    E, valid = np.asarray(E), np.asarray(valid)
    errs = []
    for i in range(trials):
        best = np.inf
        for k in range(E.shape[1]):
            if not valid[i, k]:
                continue
            best = min(
                best,
                min(np.abs(E[i, k] - EG[i]).max(), np.abs(E[i, k] + EG[i]).max()),
            )
        errs.append(best)
    errs = np.asarray(errs)
    # float32 path: nearly all minimal problems recover GT to high precision
    assert np.median(errs) < 1e-4, errs
    assert np.mean(errs < 1e-3) >= 0.85, errs


def _planar_scene(rng, n=200, noise=5e-4):
    """Matched normalized coords from a single plane — the 8-point
    degenerate configuration (constraint matrix rank drops to 6)."""
    R = _rand_rot(rng) @ np.eye(3)  # small-ish rotation below
    w = rng.randn(3) * 0.1
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(w).as_matrix()
    t = np.array([0.3, 0.05, 0.1])
    t /= np.linalg.norm(t)
    # plane z = 4 + 0.3x + 0.2y in cam0
    xy = rng.uniform(-1.5, 1.5, (n, 2))
    z = 4.0 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
    X = np.concatenate([xy * z[:, None], z[:, None]], axis=1)
    p0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:3]
    p0 = p0 + rng.randn(*p0.shape) * noise
    p1 = p1 + rng.randn(*p1.shape) * noise
    return p0, p1, R, t


def _pose_err_deg(R_est, t_est, R, t):
    cos_r = (np.trace(R_est.T @ R) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cos_r, -1, 1)))
    cos_t = abs(np.dot(t_est / np.linalg.norm(t_est), t))
    t_err = np.degrees(np.arccos(np.clip(cos_t, -1, 1)))
    return r_err, t_err


@pytest.mark.parametrize("seed", [1, 3])
def test_ransac_planar_5pt_beats_8pt(seed):
    """On a planar scene the 8-point nullspace is 3-dimensional, so its
    minimal model lands in a wrong basin that even the pose-manifold LO
    cannot escape (measured t-errors 62-76 deg on these seeds); the 5-point
    solver enforces the essential constraints inside the nullspace and
    recovers the pose."""
    pytest.importorskip("scipy")
    rng = np.random.RandomState(seed)
    p0, p1, R, t = _planar_scene(rng)
    valid = jnp.ones(p0.shape[0], bool)
    key = jax.random.PRNGKey(seed)

    errs = {}
    for solver in ("5pt", "8pt"):
        res, R_est, t_est = ransac_essential(
            key,
            jnp.asarray(p0, jnp.float32),
            jnp.asarray(p1, jnp.float32),
            valid,
            th=2e-3,
            num_hyps=512,
            solver=solver,
        )
        assert bool(res.success)
        errs[solver] = _pose_err_deg(np.asarray(R_est), np.asarray(t_est), R, t)

    r5, t5 = errs["5pt"]
    r8, t8 = errs["8pt"]
    # the Nister solver recovers the pose on the planar scene
    assert r5 < 1.0 and t5 < 2.0, errs
    # while the structurally degenerate 8-point does not
    assert t8 > 10.0, errs


def test_ransac_essential_nonplanar_both_solvers():
    """Sanity: on a general scene both solvers recover the pose."""
    rng = np.random.RandomState(3)
    R = _rand_rot(rng)
    w = np.array([0.05, -0.1, 0.02])
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(w).as_matrix()
    t = np.array([0.4, -0.1, 0.2])
    t /= np.linalg.norm(t)
    X = rng.randn(150, 3) * np.array([2.0, 2.0, 1.0]) + np.array([0, 0, 6])
    p0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:3]
    noise = 5e-4
    p0 = p0 + rng.randn(*p0.shape) * noise
    p1 = p1 + rng.randn(*p1.shape) * noise
    valid = jnp.ones(p0.shape[0], bool)
    for solver in ("5pt", "8pt"):
        _, R_est, t_est = ransac_essential(
            jax.random.PRNGKey(0),
            jnp.asarray(p0, jnp.float32),
            jnp.asarray(p1, jnp.float32),
            valid,
            th=2e-3,
            num_hyps=512,
            solver=solver,
        )
        r_err, t_err = _pose_err_deg(np.asarray(R_est), np.asarray(t_est), R, t)
        assert r_err < 1.0 and t_err < 3.0, (solver, r_err, t_err)
