"""Pose-graph optimization (Gauss-Newton over SE(3)) as a batched kernel.

Nodes are absolute world->camera poses T_k; edges carry measured relative
poses T_ab ~ T_a T_b^{-1} (so x_a = T_ab x_b) with scalar weights. The
residual is the SE(3) log of the discrepancy, Jacobians come from forward-mode
autodiff of the per-edge residual w.r.t. the two endpoint increments (6+6
inputs, 6 outputs — tiny and batched over all edges with vmap), and the
normal system is assembled by scatter-add into (K, K, 6, 6) blocks and
solved densely: pose graphs have few nodes, the batched work is in the
edges. Fixed iteration count under `lax.scan` — no host control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lie import se3_compose, se3_exp, se3_inverse, se3_log


def _edge_residual(xi_a, xi_b, Ra, ta, Rb, tb, Rm, tm):
    """Residual of one edge after left-increments xi on both endpoints."""
    dRa, dta = se3_exp(xi_a)
    dRb, dtb = se3_exp(xi_b)
    Ra_, ta_ = se3_compose(dRa, dta, Ra, ta)
    Rb_, tb_ = se3_compose(dRb, dtb, Rb, tb)
    # T_ab_est = T_a T_b^{-1}
    Rbi, tbi = se3_inverse(Rb_, tb_)
    Rab, tab = se3_compose(Ra_, ta_, Rbi, tbi)
    # error = T_m^{-1} T_ab
    Rmi, tmi = se3_inverse(Rm, tm)
    Re, te = se3_compose(Rmi, tmi, Rab, tab)
    return se3_log(Re, te)


def optimize_pose_graph(
    Rs,
    ts,
    edges_a,
    edges_b,
    R_meas,
    t_meas,
    weights=None,
    fixed=None,
    iters: int = 20,
    lam: float = 1e-6,
):
    """Batched pose-graph GN.

    Rs: (K, 3, 3), ts: (K, 3); edges_a/b: (E,) int32 endpoint indices;
    R_meas: (E, 3, 3), t_meas: (E, 3) measured T_ab (x_a = T_ab x_b);
    weights: (E,) information scalars; fixed: (K,) bool gauge mask (default
    node 0). Returns (Rs, ts, info).
    """
    K = Rs.shape[0]
    E = edges_a.shape[0]
    if weights is None:
        weights = jnp.ones((E,), Rs.dtype)
    if fixed is None:
        fixed = jnp.arange(K) == 0

    zero6 = jnp.zeros((6,), Rs.dtype)

    def residuals_and_jacs(Rs, ts):
        Ra, ta = Rs[edges_a], ts[edges_a]
        Rb, tb = Rs[edges_b], ts[edges_b]

        def f(xi_a, xi_b, Ra, ta, Rb, tb, Rm, tm):
            return _edge_residual(xi_a, xi_b, Ra, ta, Rb, tb, Rm, tm)

        r = jax.vmap(f, in_axes=(None, None, 0, 0, 0, 0, 0, 0))(
            zero6, zero6, Ra, ta, Rb, tb, R_meas, t_meas
        )
        Ja = jax.vmap(
            jax.jacfwd(f, argnums=0), in_axes=(None, None, 0, 0, 0, 0, 0, 0)
        )(zero6, zero6, Ra, ta, Rb, tb, R_meas, t_meas)
        Jb = jax.vmap(
            jax.jacfwd(f, argnums=1), in_axes=(None, None, 0, 0, 0, 0, 0, 0)
        )(zero6, zero6, Ra, ta, Rb, tb, R_meas, t_meas)
        return r, Ja, Jb  # (E, 6), (E, 6, 6), (E, 6, 6)

    def step(carry, _):
        Rs, ts = carry
        r, Ja, Jb = residuals_and_jacs(Rs, ts)
        w = weights[:, None, None]
        H = jnp.zeros((K, K, 6, 6))
        H = H.at[edges_a, edges_a].add(w * jnp.einsum("eki,ekj->eij", Ja, Ja))
        H = H.at[edges_b, edges_b].add(w * jnp.einsum("eki,ekj->eij", Jb, Jb))
        H = H.at[edges_a, edges_b].add(w * jnp.einsum("eki,ekj->eij", Ja, Jb))
        H = H.at[edges_b, edges_a].add(w * jnp.einsum("eki,ekj->eij", Jb, Ja))
        g = jnp.zeros((K, 6))
        g = g.at[edges_a].add(weights[:, None] * jnp.einsum("eki,ek->ei", Ja, r))
        g = g.at[edges_b].add(weights[:, None] * jnp.einsum("eki,ek->ei", Jb, r))

        free = (~fixed).astype(H.dtype)
        H = H * free[:, None, None, None] * free[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(6) * (fixed.astype(H.dtype)[:, None, None] + lam)
        )
        g = g * free[:, None]

        Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(K * 6, K * 6)
        dx = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, 6)
        dx = dx * free[:, None]
        dR, dt = se3_exp(dx)
        Rs, ts = se3_compose(dR, dt, Rs, ts)
        cost = 0.5 * jnp.sum(weights * jnp.sum(r * r, -1))
        return (Rs, ts), cost

    (Rs, ts), hist = jax.lax.scan(step, (Rs, ts), None, length=iters)
    r, _, _ = residuals_and_jacs(Rs, ts)
    cost = 0.5 * jnp.sum(weights * jnp.sum(r * r, -1))
    return Rs, ts, {"cost": cost, "history": hist}
