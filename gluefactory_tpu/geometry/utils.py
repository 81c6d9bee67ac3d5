"""Low-level geometry ops (reference `gluefactory/geometry/utils.py:1-288`).

All functions are pure jnp, batched over leading dims, and jit/vmap-safe.
Distortion models:
  - "pinhole": no distortion
  - "radial": polynomial radial distortion 1 + k1 r^2 + k2 r^4 (+ ...)
  - "kb4": Kannala-Brandt 4-coefficient fisheye (theta-based), used by
    Endomapper endoscopes (reference `geometry/kb4_fisheye.py`,
    `geometry/utils.py:132-251`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last dim: (..., D) -> (..., D+1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Divide by the homogeneous coordinate: (..., D+1) -> (..., D)."""
    return points[..., :-1] / (points[..., -1:] + eps)


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric [v]_x matrix of (..., 3) vectors -> (..., 3, 3)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            z, -v[..., 2], v[..., 1],
            v[..., 2], z, -v[..., 0],
            -v[..., 1], v[..., 0], z,
        ],
        axis=-1,
    ).reshape(v.shape[:-1] + (3, 3))


def so3exp_map(w: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rodrigues exponential map of axis-angle (..., 3) -> rotation (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta < eps
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    w_unit = w / safe_theta
    W = skew_symmetric(w_unit)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    R = eye + s * W + (1.0 - c) * (W @ W)
    # first-order fallback near zero: I + [w]_x
    R0 = eye + skew_symmetric(w)
    return jnp.where(small[..., None], R0, R)


# ---------------------------------------------------------------------------
# Radial (polynomial) distortion
# ---------------------------------------------------------------------------


def distort_points_radial(pts: jnp.ndarray, dist: jnp.ndarray):
    """Apply radial distortion to normalized image coords.

    pts: (..., N, 2); dist: (..., K) polynomial coefficients k1..kK.
    Returns (distorted (..., N, 2), valid (..., N)).
    """
    r2 = jnp.sum(pts**2, axis=-1)  # (..., N)
    radial = jnp.zeros_like(r2)
    rpow = r2
    K = dist.shape[-1]
    for i in range(K):
        radial = radial + dist[..., None, i] * rpow
        rpow = rpow * r2
    factor = 1.0 + radial
    valid = factor > 0
    return pts * factor[..., None], valid


def J_distort_points_radial(pts: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of radial distortion wrt pts: (..., N, 2, 2)."""
    r2 = jnp.sum(pts**2, axis=-1)
    radial = jnp.zeros_like(r2)
    dradial_dr2 = jnp.zeros_like(r2)
    rpow = jnp.ones_like(r2)
    K = dist.shape[-1]
    for i in range(K):
        k = dist[..., None, i]
        radial = radial + k * rpow * r2
        dradial_dr2 = dradial_dr2 + k * (i + 1) * rpow
        rpow = rpow * r2
    factor = 1.0 + radial  # (..., N)
    eye = jnp.eye(2, dtype=pts.dtype)
    outer = pts[..., :, None] * pts[..., None, :]  # (..., N, 2, 2)
    return factor[..., None, None] * eye + 2.0 * dradial_dr2[..., None, None] * outer


def undistort_points_radial(pts: jnp.ndarray, dist: jnp.ndarray, iters: int = 8):
    """Invert radial distortion via fixed-point iteration (jittable)."""

    def body(_, undist):
        r2 = jnp.sum(undist**2, axis=-1)
        radial = jnp.zeros_like(r2)
        rpow = r2
        for i in range(dist.shape[-1]):
            radial = radial + dist[..., None, i] * rpow
            rpow = rpow * r2
        return pts / (1.0 + radial)[..., None]

    out = jax.lax.fori_loop(0, iters, body, pts)
    return out, jnp.ones(out.shape[:-1], bool)


# ---------------------------------------------------------------------------
# KB4 fisheye (Kannala-Brandt), reference `geometry/kb4_fisheye.py:48-181`
# ---------------------------------------------------------------------------


def _kb4_theta_d(theta: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """theta_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)."""
    t2 = theta * theta
    k1, k2, k3, k4 = (dist[..., None, i] for i in range(4))
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def _kb4_dtheta_d(theta: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    t2 = theta * theta
    k1, k2, k3, k4 = (dist[..., None, i] for i in range(4))
    return 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))


def distort_points_kb4(pts: jnp.ndarray, dist: jnp.ndarray):
    """KB4 'distortion' acting on normalized pinhole coords.

    pts are normalized image-plane coords (x/z, y/z); r = |pts|,
    theta = atan(r), output = pts * theta_d / r.
    Returns (distorted (..., N, 2), valid (..., N)).
    """
    r = jnp.linalg.norm(pts, axis=-1)
    safe_r = jnp.maximum(r, EPS)
    theta = jnp.arctan(r)
    theta_d = _kb4_theta_d(theta, dist)
    scale = jnp.where(r > EPS, theta_d / safe_r, _kb4_dtheta_d(theta, dist) * 0 + 1.0)
    valid = jnp.ones_like(r, bool)
    return pts * scale[..., None], valid


def J_distort_points_kb4(pts: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of KB4 distortion wrt normalized coords: (..., N, 2, 2)."""
    r2 = jnp.sum(pts**2, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, EPS * EPS))
    theta = jnp.arctan(r)
    theta_d = _kb4_theta_d(theta, dist)
    dtheta_d = _kb4_dtheta_d(theta, dist)  # d theta_d / d theta
    dtheta_dr = 1.0 / (1.0 + r2)
    s = theta_d / r  # scale
    ds_dr = (dtheta_d * dtheta_dr - s) / r
    eye = jnp.eye(2, dtype=pts.dtype)
    outer = pts[..., :, None] * pts[..., None, :] / r[..., None, None]
    J = s[..., None, None] * eye + ds_dr[..., None, None] * outer
    # near the center the map is identity to first order
    J0 = jnp.broadcast_to(eye, J.shape)
    return jnp.where((r2 < 1e-12)[..., None, None], J0, J)


def undistort_points_kb4(pts: jnp.ndarray, dist: jnp.ndarray, iters: int = 10):
    """Invert KB4 via Newton iteration on theta (reference `kb4_fisheye.py:70`)."""
    theta_d = jnp.linalg.norm(pts, axis=-1)

    def body(_, theta):
        f = _kb4_theta_d(theta, dist) - theta_d
        fp = _kb4_dtheta_d(theta, dist)
        return theta - f / jnp.maximum(fp, EPS)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    r = jnp.tan(theta)
    scale = jnp.where(theta_d > EPS, r / jnp.maximum(theta_d, EPS), jnp.ones_like(r))
    valid = jnp.abs(_kb4_theta_d(theta, dist) - theta_d) < 1e-5
    return pts * scale[..., None], valid
