"""Epipolar geometry (reference `gluefactory/geometry/epipolar.py:7-155`).

All jnp, batched, jittable. E/F conventions follow the reference: for a
relative pose T_0to1 = (R, t), E = [t]_x R and x1^T F x0 = 0 with
F = K1^-T E K0^-1.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import skew_symmetric, to_homogeneous
from .wrappers import Camera, Pose


def T_to_E(T: Pose) -> jnp.ndarray:
    """Essential matrix from relative pose (reference `epipolar.py:7`)."""
    return skew_symmetric(T.t) @ T.R


def T_to_F(cam0: Camera, cam1: Camera, T_0to1: Pose) -> jnp.ndarray:
    """Fundamental matrix from relative pose and intrinsics."""
    E = T_to_E(T_0to1)
    K0inv = jnp.linalg.inv(cam0.calibration_matrix())
    K1inv = jnp.linalg.inv(cam1.calibration_matrix())
    return jnp.swapaxes(K1inv, -1, -2) @ E @ K0inv


def sym_epipolar_distance(p0, p1, E, squared=True):
    """Symmetric epipolar distance of matched points (..., N, 2)."""
    p0h = to_homogeneous(p0)
    p1h = to_homogeneous(p1)
    Ep0 = jnp.einsum("...ij,...nj->...ni", E, p0h)  # (..., N, 3)
    Etp1 = jnp.einsum("...ji,...nj->...ni", E, p1h)
    p1Ep0 = jnp.sum(p1h * Ep0, axis=-1)
    denom = (
        Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    )
    d_sq = p1Ep0**2 * (
        1.0 / jnp.maximum(Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2, 1e-15)
        + 1.0 / jnp.maximum(Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2, 1e-15)
    )
    del denom
    return d_sq if squared else jnp.sqrt(jnp.maximum(d_sq, 0.0))


def sym_epipolar_distance_all(p0, p1, E, eps=1e-15):
    """All-pairs symmetric epipolar distance (reference `epipolar.py:59`).

    p0: (..., N, 2), p1: (..., M, 2) -> (..., N, M), non-squared.
    """
    p0h = to_homogeneous(p0)
    p1h = to_homogeneous(p1)
    Ep0 = jnp.einsum("...ij,...nj->...ni", E, p0h)  # (..., N, 3)
    Etp1 = jnp.einsum("...ji,...mj->...mi", E, p1h)  # (..., M, 3)
    p1Ep0 = jnp.einsum("...mi,...ni->...nm", p1h, Ep0)  # (..., N, M)
    inv_n0 = 1.0 / jnp.maximum(
        Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2, eps
    )  # (..., N)
    inv_n1 = 1.0 / jnp.maximum(Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2, eps)  # (..., M)
    return jnp.abs(p1Ep0) * (
        jnp.sqrt(inv_n0[..., :, None]) + jnp.sqrt(inv_n1[..., None, :])
    ) / 2.0


def decompose_essential_matrix(E: jnp.ndarray):
    """E -> (R1, R2, t) candidate decomposition (reference `epipolar.py:97`)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce right-handedness
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ jnp.swapaxes(W, -1, -2) @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def angle_error_mat(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    cos = (jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1) - 1) / 2
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def angle_error_vec(v1: jnp.ndarray, v2: jnp.ndarray, eps=1e-10) -> jnp.ndarray:
    n = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    cos = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(n, eps)
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def relative_pose_error(T_0to1: Pose, R_est: jnp.ndarray, t_est: jnp.ndarray, ignore_gt_t_thr=0.0):
    """Angular rotation/translation errors in degrees (reference `epipolar.py:139`).

    Translation error is direction-only (scale is unobservable); symmetric in
    sign ambiguity. If the GT translation is tiny (< ignore_gt_t_thr), the
    translation error is zeroed.
    """
    t_gt = T_0to1.t
    t_err = angle_error_vec(t_est, t_gt)
    t_err = jnp.minimum(t_err, 180.0 - t_err)  # sign ambiguity of E
    if ignore_gt_t_thr > 0:
        t_err = jnp.where(jnp.linalg.norm(t_gt, axis=-1) < ignore_gt_t_thr, 0.0, t_err)
    r_err = angle_error_mat(R_est, T_0to1.R)
    return r_err, t_err
