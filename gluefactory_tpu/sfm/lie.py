"""SO(3)/SE(3) exponential and logarithm maps, batched and jit-safe.

Small-angle branches use the double-`where` trick (substitute a safe value
into the not-taken branch BEFORE dividing) so both values and forward-mode
tangents are finite everywhere — `jnp.where` alone does not stop NaN
gradients from the unselected branch.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def _abc(theta2):
    """A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3, NaN-safe.

    B uses the half-angle identity 1-cos t = 2 sin^2(t/2), which never
    cancels (the naive form underflows to 0 in f32 for t < ~3e-4 while
    theta2 stays representable — a divide-by-zero trap for any threshold).
    C switches to its Taylor series below t=0.1 where (t - sin t) cancels.
    """
    tiny = theta2 < 1e-12
    t2s = jnp.where(tiny, 1.0, theta2)  # safe denominator
    t = jnp.sqrt(t2s)
    A = jnp.where(tiny, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    half = 0.5 * t
    B = jnp.where(
        tiny, 0.5 - theta2 / 24.0, 0.5 * (jnp.sin(half) / half) ** 2
    )
    small_c = theta2 < 0.01
    C = jnp.where(
        small_c,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (t - jnp.sin(t)) / (t2s * t),
    )
    return tiny, t2s, A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, -1)
    _, _, A, B, _ = _abc(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3). Valid for theta < pi (pose-graph increments)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0)
    # NB: the threshold must be representable in f32 (1 - 1e-8 rounds to 1.0)
    small = cos > 1.0 - 1e-6
    cos_safe = jnp.where(small, 0.0, cos)
    theta = jnp.where(small, 0.0, jnp.arccos(cos_safe))
    sin_safe = jnp.where(small, 1.0, jnp.sin(jnp.where(small, 1.0, theta)))
    w_vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    scale = jnp.where(small, 0.5 + (1.0 - cos) / 6.0, theta / (2.0 * sin_safe))
    return scale[..., None] * w_vee


def se3_exp(xi: jnp.ndarray):
    """(..., 6) [v, w] -> (R (..., 3, 3), t (..., 3)) with the SE(3) V-matrix."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, -1)
    _, _, _, B, C = _abc(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + B[..., None, None] * W + C[..., None, None] * (W @ W)
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of se3_exp: (R, t) -> (..., 6) [v, w]."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, -1)
    _, t2s, A, B, _ = _abc(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    # V^{-1} = I - W/2 + coef W^2,  coef = (1 - A/(2B)) / theta^2.
    # 1 - A/(2B) ~ theta^2/12 cancels catastrophically in f32 below
    # theta ~ 0.03, so the Taylor branch extends to theta2 < 1e-3.
    small = theta2 < 1e-3
    B_safe = jnp.where(B > 1e-6, B, 1.0)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B_safe)) / t2s,
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], -1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)
