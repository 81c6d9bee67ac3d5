"""Batched multi-view triangulation (DLT) on device.

Fixed-shape, masked design: a landmark is observed by up to V views with a
validity mask, so the whole map triangulates as ONE batched einsum+eigh —
no per-track Python loops (compare COLMAP's per-track C++ triangulation;
the reference repo has no triangulation at all).

Conventions: poses are world->camera, x_cam = R x_world + t. Observations
are normalized image coordinates (calibrated rays, z=1 plane).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_two_view(R: jnp.ndarray, t: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray):
    """Midpoint-free DLT triangulation for a calibrated two-view pair.

    R: (3, 3), t: (3,) pose of cam1 w.r.t. cam0 (x1 = R x0 + t).
    p0, p1: (..., 2) normalized coords. Returns (..., 3) points in cam0 and
    (...,) depths-positive mask (cheirality in both views).
    """
    # DLT rows from x x (P X) = 0 for P0 = [I|0], P1 = [R|t]
    ones = jnp.ones_like(p0[..., :1])
    # camera 0: X/Z = p0 -> [1 0 -x; 0 1 -y] @ X = 0
    a0 = jnp.concatenate([ones, jnp.zeros_like(ones), -p0[..., :1]], -1)
    a1 = jnp.concatenate([jnp.zeros_like(ones), ones, -p0[..., 1:2]], -1)
    # camera 1: rows of [R|t] combined
    r0 = R[0] - p1[..., :1] * R[2]
    r1 = R[1] - p1[..., 1:2] * R[2]
    b0 = t[0] - p1[..., 0] * t[2]
    b1 = t[1] - p1[..., 1] * t[2]
    # A X = b with A (…, 4, 3), b (…, 4)
    A = jnp.stack([a0, a1, r0, r1], axis=-2)
    b = jnp.stack(
        [jnp.zeros_like(b0), jnp.zeros_like(b0), -b0, -b1], axis=-1
    )
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    Atb = jnp.einsum("...ij,...i->...j", A, b)
    X = jnp.linalg.solve(AtA + 1e-9 * jnp.eye(3), Atb[..., None])[..., 0]
    z0 = X[..., 2]
    z1 = jnp.einsum("j,...j->...", R[2], X) + t[2]
    return X, (z0 > 0) & (z1 > 0)


def triangulate_nview(
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    obs: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Batched N-view DLT triangulation.

    Rs: (V, 3, 3), ts: (V, 3) world->camera poses.
    obs: (P, V, 2) normalized observations of P landmarks in V views.
    valid: (P, V) observation mask (>=2 views required per landmark).

    Returns (points (P, 3) in world frame, ok (P,) mask).

    Each observation contributes two homogeneous rows
    [R0 - x R2 | t0 - x t2], [R1 - y R2 | t1 - y t2]; the stacked (2V, 4)
    system is solved by the smallest eigenvector of the masked normal matrix
    A^T A (4x4 eigh batches perfectly on the MXU; SVD of tall A would not).
    """
    x = obs[..., 0][..., None]  # (P, V, 1)
    y = obs[..., 1][..., None]
    # rows over the 4 homogeneous coords: (V, 3, 4) projective matrices
    Pmat = jnp.concatenate([Rs, ts[:, :, None]], axis=-1)  # (V, 3, 4)
    r0 = Pmat[None, :, 0, :] - x * Pmat[None, :, 2, :]  # (P, V, 4)
    r1 = Pmat[None, :, 1, :] - y * Pmat[None, :, 2, :]
    rows = jnp.concatenate([r0, r1], axis=1)  # (P, 2V, 4)
    w = jnp.concatenate([valid, valid], axis=1).astype(rows.dtype)[..., None]
    rows = rows * w
    AtA = jnp.einsum("pvi,pvj->pij", rows, rows)  # (P, 4, 4)
    # smallest eigenvector of the symmetric 4x4
    _, vecs = jnp.linalg.eigh(AtA)
    Xh = vecs[..., 0]  # (P, 4)
    denom = Xh[..., 3:4]
    pts = Xh[..., :3] / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)

    # cheirality: positive depth in every observing view
    z = jnp.einsum("vj,pj->pv", Rs[:, 2, :], pts) + ts[None, :, 2]
    ok = jnp.sum(valid, axis=1) >= 2
    ok = ok & jnp.all((z > 0) | ~valid, axis=1)
    return pts, ok


def triangulate_tracks(
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    cam_idx: jnp.ndarray,
    obs: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Track-major N-view DLT: like `triangulate_nview` but observation slot
    (p, v) refers to camera `cam_idx[p, v]` (the `sfm/tracks.py` /
    `sfm/ba.py` layout) instead of column v == camera v.

    Rs: (C, 3, 3), ts: (C, 3); cam_idx: (P, V); obs: (P, V, 2) normalized;
    valid: (P, V). Returns (points (P, 3) world, ok (P,)).
    """
    Pmat = jnp.concatenate([Rs, ts[:, :, None]], axis=-1)[cam_idx]  # (P,V,3,4)
    x = obs[..., 0][..., None]
    y = obs[..., 1][..., None]
    r0 = Pmat[:, :, 0, :] - x * Pmat[:, :, 2, :]  # (P, V, 4)
    r1 = Pmat[:, :, 1, :] - y * Pmat[:, :, 2, :]
    rows = jnp.concatenate([r0, r1], axis=1)
    w = jnp.concatenate([valid, valid], axis=1).astype(rows.dtype)[..., None]
    rows = rows * w
    AtA = jnp.einsum("pvi,pvj->pij", rows, rows)
    _, vecs = jnp.linalg.eigh(AtA)
    Xh = vecs[..., 0]
    denom = Xh[..., 3:4]
    pts = Xh[..., :3] / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    z = jnp.einsum("pvj,pj->pv", Pmat[:, :, 2, :3], pts) + Pmat[:, :, 2, 3]
    ok = jnp.sum(valid, axis=1) >= 2
    ok = ok & jnp.all((z > 0) | ~valid, axis=1)
    return pts, ok
