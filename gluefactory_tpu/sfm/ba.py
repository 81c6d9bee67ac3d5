"""Schur-complement bundle adjustment as a batched JAX kernel.

Design (TPU-first, BASELINE.json north star — the reference repo stops at
two-view estimation):
  - Track-major fixed-shape observations: every landmark carries up to V
    observations `(cam_idx, uv, valid)`, so Jacobians, the point blocks
    V_j, the coupling blocks W_ij, and the Schur cross terms are single
    einsums over (P, V) — no per-track loops, everything lands on the MXU.
  - The reduced camera system S (C·6 x C·6) is assembled by scatter-adds of
    (P, V, V, 6, 6) outer products and solved densely (cameras are few;
    landmarks are many — the classic Schur trick).
  - Levenberg-Marquardt runs as a `lax.scan` with accept/reject carried in
    the loop state: fixed iteration count, no host round-trips.
  - Distributed BA: the landmark axis shards over a mesh axis; camera-system
    accumulators and the cost are `psum`med over ICI (`axis_name`), the
    dense Schur solve is replicated, and the landmark back-substitution
    stays shard-local. `bundle_adjust_sharded` wraps this in `shard_map`.

Poses are world->camera (x_cam = R x_world + t); observations are
normalized image coordinates. Updates are left-multiplicative SE(3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lie import hat, se3_compose, se3_exp


def reprojection_residuals(Rs, ts, pts, cam_idx, uv, valid, eps=1e-6):
    """Masked reprojection residuals.

    Rs: (C, 3, 3), ts: (C, 3), pts: (P, 3), cam_idx: (P, V), uv: (P, V, 2),
    valid: (P, V). Returns (r (P, V, 2), q (P, V, 3)) with invalid rows zero.
    """
    Rc = Rs[cam_idx]  # (P, V, 3, 3)
    tc = ts[cam_idx]  # (P, V, 3)
    q = jnp.einsum("pvij,pj->pvi", Rc, pts) + tc
    z = jnp.maximum(q[..., 2], eps)
    proj = q[..., :2] / z[..., None]
    r = jnp.where(valid[..., None], proj - uv, 0.0)
    return r, q


def _cost(r, axis_name=None, huber_delta=None, robust="huber"):
    if huber_delta is None:
        c = 0.5 * jnp.sum(r * r)
    elif robust == "cauchy":
        n2 = jnp.sum(r * r, axis=-1)
        c = jnp.sum(0.5 * huber_delta**2 * jnp.log1p(n2 / huber_delta**2))
    else:
        n = jnp.linalg.norm(r, axis=-1)  # (P, V)
        quad = 0.5 * n * n
        lin = huber_delta * (n - 0.5 * huber_delta)
        c = jnp.sum(jnp.where(n <= huber_delta, quad, lin))
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    return c


def _robust_weights(r, delta, kind):
    """IRLS weights per observation (|r| = 2D reprojection norm). Scaling r
    and J by sqrt(w) makes the LM normal equations those of the
    robustified problem.

    huber:  w = min(1, delta/|r|)      (convex, linear tail — Ceres
            HuberLoss; gross outliers retain linear influence)
    cauchy: w = 1 / (1 + (|r|/delta)^2) (redescending — outliers' influence
            goes to zero; non-convex, needs a reasonable init)
    """
    n = jnp.linalg.norm(r, axis=-1)  # (P, V)
    if kind == "huber":
        return jnp.minimum(1.0, delta / jnp.maximum(n, 1e-12))
    assert kind == "cauchy", kind
    return 1.0 / (1.0 + (n / delta) ** 2)


def _build_normal_blocks(
    Rs, ts, pts, cam_idx, uv, valid, eps=1e-6, huber_delta=None,
    robust="huber",
):
    """Jacobian blocks for every observation.

    Returns r (P,V,2), Jc (P,V,2,6) [v,w] left-SE(3), Jp (P,V,2,3); with
    huber_delta set, all three are sqrt(w)-scaled (IRLS robustification).
    """
    r, q = reprojection_residuals(Rs, ts, pts, cam_idx, uv, valid, eps)
    z = jnp.maximum(q[..., 2], eps)
    iz = 1.0 / z
    # d proj / d q : (P, V, 2, 3)
    zero = jnp.zeros_like(iz)
    dpq = jnp.stack(
        [
            jnp.stack([iz, zero, -q[..., 0] * iz * iz], -1),
            jnp.stack([zero, iz, -q[..., 1] * iz * iz], -1),
        ],
        -2,
    )
    m = valid[..., None, None]
    dpq = jnp.where(m, dpq, 0.0)
    # camera: q' = q + dv + dw x q  ->  dq/ddv = I, dq/ddw = -hat(q)
    Jc = jnp.concatenate([dpq, -jnp.einsum("pvij,pvjk->pvik", dpq, hat(q))], -1)
    Jp = jnp.einsum("pvij,pvjk->pvik", dpq, Rs[cam_idx])
    if huber_delta is not None:
        sw = jnp.sqrt(_robust_weights(r, huber_delta, robust))[..., None]
        r = r * sw
        Jc = Jc * sw[..., None]
        Jp = Jp * sw[..., None]
    return r, Jc, Jp


def _schur_matvec(x, U, W, Vinv, cam_idx, free, axis_name):
    """S @ x without materializing S (Ceres ITERATIVE_SCHUR analog).

    S = U - sum_p W_p Vinv_p W_p^T scattered over camera pairs; per track:
    gather x at observing cameras, contract through the 3x3 point inverse,
    scatter back. One psum of the (C, 6) result per call when sharded.
    x: (C, 6). U: (C, 6, 6) damped. W: (P, V, 6, 3). Vinv: (P, 3, 3).
    """
    C = x.shape[0]
    xf = x * free[:, None]
    x_obs = xf[cam_idx]  # (P, V, 6)
    a = jnp.einsum("pvij,pvi->pj", W, x_obs)  # (P, 3)
    b = jnp.einsum("pij,pj->pi", Vinv, a)
    y = jnp.einsum("pvij,pj->pvi", W, b)  # (P, V, 6)
    red = jnp.zeros((C, 6)).at[cam_idx.reshape(-1)].add(y.reshape(-1, 6))
    if axis_name is not None:
        red = jax.lax.psum(red, axis_name)
    out = jnp.einsum("cij,cj->ci", U, xf) - red
    # gauge: identity on fixed cameras
    return out * free[:, None] + x * (1.0 - free)[:, None]


def _schur_diag_blocks(U, W, Vinv, cam_idx, axis_name):
    """Block-Jacobi preconditioner blocks: diag_c(S) ~= U_cc - sum over
    observations of W Vinv W^T (the v==w terms; tracks observe a camera at
    most once, so this IS the exact diagonal for well-formed problems)."""
    C = U.shape[0]
    D = jnp.einsum("pvij,pjk,pvlk->pvil", W, Vinv, W)  # (P, V, 6, 6)
    red = jnp.zeros((C, 6, 6)).at[cam_idx.reshape(-1)].add(
        D.reshape(-1, 6, 6))
    if axis_name is not None:
        red = jax.lax.psum(red, axis_name)
    return U - red


def _pcg_solve(matvec, b, Minv_blocks, iters, tol=1e-8):
    """Preconditioned CG on the (C, 6) camera update; fixed trip count with
    masked (converged => frozen) updates — jit/scan friendly, no host sync."""
    prec = lambda v: jnp.einsum("cij,cj->ci", Minv_blocks, v)
    dot = lambda u, v: jnp.sum(u * v)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = prec(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    bnorm = jnp.maximum(jnp.sqrt(dot(b, b)), 1e-30)

    def step(carry, _):
        x, r, p, rz = carry
        live = jnp.sqrt(dot(r, r)) / bnorm > tol
        Ap = matvec(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x1 = x + alpha * p
        r1 = r - alpha * Ap
        z1 = prec(r1)
        rz1 = dot(r1, z1)
        beta = rz1 / jnp.maximum(rz, 1e-30)
        p1 = z1 + beta * p
        keep = lambda new, old: jnp.where(live, new, old)
        return (keep(x1, x), keep(r1, r), keep(p1, p), keep(rz1, rz)), None

    (x, r, _, _), _ = jax.lax.scan(step, (x0, r0, p0, rz0), None, length=iters)
    return x


def _lm_step_pcg(
    Rs, ts, pts, cam_idx, uv, valid, lam, fixed_cameras, axis_name, cg_iters,
    huber_delta=None, robust="huber",
):
    """LM step with a matrix-free PCG Schur solve — map-scale BA.

    Never materializes the (C, C, 6, 6) reduced system nor the
    (P, V, V, 6, 6) cross terms of `_lm_step`; peak per-track state is the
    (P, V, 6, 3) coupling blocks. Each CG iteration is one gather + three
    einsums + one scatter over observations (MXU-friendly batched 6x3
    contractions) and, sharded, a single (C, 6) psum over ICI.
    """
    C = Rs.shape[0]
    r, Jc, Jp = _build_normal_blocks(
        Rs, ts, pts, cam_idx, uv, valid, huber_delta=huber_delta,
        robust=robust)

    Vb = jnp.einsum("pvki,pvkj->pij", Jp, Jp)
    Vb = Vb + lam * jnp.eye(3) * jnp.maximum(
        jnp.einsum("pii->p", Vb)[:, None, None] / 3.0, 1e-8
    )
    gp = jnp.einsum("pvki,pvk->pi", Jp, r)
    Vinv = jnp.linalg.inv(Vb)

    Ublk = jnp.einsum("pvki,pvkj->pvij", Jc, Jc)
    U = jnp.zeros((C, 6, 6)).at[cam_idx.reshape(-1)].add(
        Ublk.reshape(-1, 6, 6)
    )
    gc = jnp.zeros((C, 6)).at[cam_idx.reshape(-1)].add(
        jnp.einsum("pvki,pvk->pvi", Jc, r).reshape(-1, 6)
    )
    W = jnp.einsum("pvki,pvkj->pvij", Jc, Jp)  # (P, V, 6, 3)
    g_schur = gc - jnp.zeros((C, 6)).at[cam_idx.reshape(-1)].add(
        jnp.einsum("pvij,pjk,pk->pvi", W, Vinv, gp).reshape(-1, 6)
    )
    if axis_name is not None:
        U = jax.lax.psum(U, axis_name)
        g_schur = jax.lax.psum(g_schur, axis_name)

    U = U + lam * jnp.eye(6) * jnp.maximum(
        jnp.einsum("cii->c", U)[:, None, None] / 6.0, 1e-8
    )

    free = (~fixed_cameras).astype(Rs.dtype)
    b = -g_schur * free[:, None]

    Dblocks = _schur_diag_blocks(U, W, Vinv, cam_idx, axis_name)
    # fixed cameras: identity preconditioner rows
    eye6 = jnp.eye(6)
    Dblocks = jnp.where(free[:, None, None] > 0, Dblocks, eye6)
    Minv = jnp.linalg.inv(Dblocks)

    matvec = partial(
        _schur_matvec, U=U, W=W, Vinv=Vinv, cam_idx=cam_idx, free=free,
        axis_name=axis_name,
    )
    dc = _pcg_solve(matvec, b, Minv, cg_iters)
    dc = dc * free[:, None]

    dc_obs = dc[cam_idx]
    rhs = gp + jnp.einsum("pvij,pvi->pj", W, dc_obs)
    dp = -jnp.einsum("pij,pj->pi", Vinv, rhs)

    Rd, td = se3_exp(dc)
    Rs_new, ts_new = se3_compose(Rd, td, Rs, ts)
    pts_new = pts + dp
    return Rs_new, ts_new, pts_new


def _lm_step(
    Rs, ts, pts, cam_idx, uv, valid, lam, fixed_cameras, axis_name,
    huber_delta=None, robust="huber",
):
    C = Rs.shape[0]
    r, Jc, Jp = _build_normal_blocks(
        Rs, ts, pts, cam_idx, uv, valid, huber_delta=huber_delta,
        robust=robust)

    # point blocks (shard-local)
    Vb = jnp.einsum("pvki,pvkj->pij", Jp, Jp)  # (P, 3, 3)
    Vb = Vb + lam * jnp.eye(3) * jnp.maximum(
        jnp.einsum("pii->p", Vb)[:, None, None] / 3.0, 1e-8
    )
    gp = jnp.einsum("pvki,pvk->pi", Jp, r)  # (P, 3)
    Vinv = jnp.linalg.inv(Vb)

    # camera blocks (psum-reduced)
    Ublk = jnp.einsum("pvki,pvkj->pvij", Jc, Jc)  # (P, V, 6, 6)
    U = jnp.zeros((C, 6, 6)).at[cam_idx.reshape(-1)].add(
        Ublk.reshape(-1, 6, 6)
    )
    gc = jnp.zeros((C, 6)).at[cam_idx.reshape(-1)].add(
        jnp.einsum("pvki,pvk->pvi", Jc, r).reshape(-1, 6)
    )

    # coupling and Schur cross terms
    W = jnp.einsum("pvki,pvkj->pvij", Jc, Jp)  # (P, V, 6, 3)
    Y = jnp.einsum("pvij,pjk->pvik", W, Vinv)  # (P, V, 6, 3)
    cross = jnp.einsum("pvij,pwkj->pvwik", Y, W)  # (P, V, V, 6, 6)
    P_, Vn = cam_idx.shape
    ii = jnp.broadcast_to(cam_idx[:, :, None], (P_, Vn, Vn)).reshape(-1)
    jj = jnp.broadcast_to(cam_idx[:, None, :], (P_, Vn, Vn)).reshape(-1)
    S = jnp.zeros((C, C, 6, 6)).at[ii, jj].add(-cross.reshape(-1, 6, 6))
    g_schur = gc - jnp.zeros((C, 6)).at[cam_idx.reshape(-1)].add(
        jnp.einsum("pvij,pj->pvi", Y, gp).reshape(-1, 6)
    )

    if axis_name is not None:
        U = jax.lax.psum(U, axis_name)
        S = jax.lax.psum(S, axis_name)
        g_schur = jax.lax.psum(g_schur, axis_name)

    U = U + lam * jnp.eye(6) * jnp.maximum(
        jnp.einsum("cii->c", U)[:, None, None] / 6.0, 1e-8
    )
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U)

    # gauge fixing: identity rows/cols for fixed cameras
    free = (~fixed_cameras).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        jnp.eye(6) * fixed_cameras[:, None, None].astype(S.dtype)
    )
    g_schur = g_schur * free[:, None]

    Sd = jnp.transpose(S, (0, 2, 1, 3)).reshape(C * 6, C * 6)
    dc = -jnp.linalg.solve(Sd, g_schur.reshape(-1)).reshape(C, 6)
    dc = dc * free[:, None]

    # landmark back-substitution (shard-local)
    dc_obs = dc[cam_idx]  # (P, V, 6)
    rhs = gp + jnp.einsum("pvij,pvi->pj", W, dc_obs)
    dp = -jnp.einsum("pij,pj->pi", Vinv, rhs)

    # candidate update
    Rd, td = se3_exp(dc)
    Rs_new, ts_new = se3_compose(Rd, td, Rs, ts)
    pts_new = pts + dp
    return Rs_new, ts_new, pts_new


def _ba_loop(
    Rs, ts, pts, cam_idx, uv, valid, fixed_cameras, iters, lam0, axis_name,
    solver="dense", cg_iters=50, huber_delta=None, robust="huber",
):
    r0, _ = reprojection_residuals(Rs, ts, pts, cam_idx, uv, valid)
    cost0 = _cost(r0, axis_name, huber_delta, robust)

    def step(carry, _):
        Rs, ts, pts, lam, cost = carry
        if solver == "pcg":
            Rn, tn, pn = _lm_step_pcg(
                Rs, ts, pts, cam_idx, uv, valid, lam, fixed_cameras,
                axis_name, cg_iters, huber_delta=huber_delta,
                robust=robust,
            )
        else:
            Rn, tn, pn = _lm_step(
                Rs, ts, pts, cam_idx, uv, valid, lam, fixed_cameras,
                axis_name, huber_delta=huber_delta, robust=robust,
            )
        rn, _ = reprojection_residuals(Rn, tn, pn, cam_idx, uv, valid)
        cn = _cost(rn, axis_name, huber_delta, robust)
        accept = cn < cost
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), lam * 5.0)
        pick = lambda a, b: jnp.where(accept, a, b)
        Rs = pick(Rn, Rs)
        ts = pick(tn, ts)
        pts = pick(pn, pts)
        cost = jnp.where(accept, cn, cost)
        return (Rs, ts, pts, lam, cost), cost

    (Rs, ts, pts, _, cost), hist = jax.lax.scan(
        step, (Rs, ts, pts, jnp.asarray(lam0, Rs.dtype), cost0), None, length=iters
    )
    return Rs, ts, pts, {"cost": cost, "cost0": cost0, "history": hist}


def bundle_adjust(
    Rs,
    ts,
    pts,
    cam_idx,
    uv,
    valid,
    fixed_cameras=None,
    iters: int = 25,
    lam0: float = 1e-3,
    solver: str = "auto",
    cg_iters: int = 50,
    huber_delta: float | None = None,
    robust: str = "huber",
):
    """Single-device LM bundle adjustment. See module docstring for layout.

    fixed_cameras: (C,) bool gauge mask (default: camera 0 fixed). Fix >= 2
    cameras (or one camera plus scale by other means) to pin the full gauge.
    solver: "dense" (explicit (6C)^2 Schur system, exact solve — small maps),
    "pcg" (matrix-free block-Jacobi-preconditioned CG — map scale), or
    "auto" (dense up to 64 cameras). huber_delta: Huber kernel width in
    normalized-coordinate units (IRLS robustification; None = pure L2 —
    Ceres `HuberLoss` analog for outlier-contaminated tracks).
    Returns (Rs, ts, pts, info dict).
    """
    if fixed_cameras is None:
        fixed_cameras = jnp.arange(Rs.shape[0]) == 0
    if solver == "auto":
        solver = "dense" if Rs.shape[0] <= 64 else "pcg"
    return _ba_loop(
        Rs, ts, pts, cam_idx, uv, valid, fixed_cameras, iters, lam0, None,
        solver=solver, cg_iters=cg_iters, huber_delta=huber_delta,
        robust=robust,
    )


def bundle_adjust_sharded(
    mesh,
    Rs,
    ts,
    pts,
    cam_idx,
    uv,
    valid,
    fixed_cameras=None,
    iters: int = 25,
    lam0: float = 1e-3,
    axis: str = "data",
    solver: str = "auto",
    cg_iters: int = 50,
    huber_delta: float | None = None,
    robust: str = "huber",
):
    """Distributed BA: landmarks sharded over `axis`, camera system reduced
    with psum over ICI, back-substitution local. With solver="dense" the
    Schur solve is replicated; with "pcg" each CG iteration exchanges one
    (C, 6) psum (the matvec's scatter reduction) over ICI.

    pts/cam_idx/uv/valid must have their leading (landmark) axis divisible
    by the mesh axis size. Returns the same as `bundle_adjust` (history is
    the replicated cost curve).
    """
    from jax.sharding import PartitionSpec as P

    if fixed_cameras is None:
        fixed_cameras = jnp.arange(Rs.shape[0]) == 0
    if solver == "auto":
        solver = "dense" if Rs.shape[0] <= 64 else "pcg"

    shard = P(axis)
    rep = P()

    fn = jax.shard_map(
        partial(
            _ba_loop, iters=iters, lam0=lam0, axis_name=axis,
            solver=solver, cg_iters=cg_iters, huber_delta=huber_delta,
            robust=robust,
        ),
        mesh=mesh,
        in_specs=(rep, rep, shard, shard, shard, shard, rep),
        out_specs=(rep, rep, shard, rep),
    )
    return fn(Rs, ts, pts, cam_idx, uv, valid, fixed_cameras)
