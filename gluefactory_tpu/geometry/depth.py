"""Depth-based reprojection (reference `gluefactory/geometry/depth.py:20-116`).

Depth maps are (..., H, W) with 0 = invalid. Keypoints are pixel coords
(x, y). All jittable/batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from .wrappers import Camera, Pose


def sample_depth_bilinear(depth: jnp.ndarray, pts: jnp.ndarray):
    """Bilinear depth sampling with validity (reference `depth.py:20`).

    depth: (..., H, W); pts: (..., N, 2) pixel coords (x, y).
    A sample is valid iff all 4 neighbors are inside the image and have
    depth > 0 (matching grid_sample+mask semantics).
    Returns (depth (..., N), valid (..., N)).
    """
    H, W = depth.shape[-2], depth.shape[-1]
    x, y = pts[..., 0], pts[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    inb = (x0 >= 0) & (y0 >= 0) & (x1 <= W - 1) & (y1 <= H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    def gather(yy, xx):
        return jnp.take_along_axis(
            depth.reshape(depth.shape[:-2] + (H * W,)), yy * W + xx, axis=-1
        )

    d00 = gather(y0c, x0c)
    d01 = gather(y0c, x1c)
    d10 = gather(y1c, x0c)
    d11 = gather(y1c, x1c)
    wx = x - x0
    wy = y - y0
    d = (
        d00 * (1 - wx) * (1 - wy)
        + d01 * wx * (1 - wy)
        + d10 * (1 - wx) * wy
        + d11 * wx * wy
    )
    valid = inb & (d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0)
    return jnp.where(valid, d, jnp.zeros_like(d)), valid


def project(
    kpi: jnp.ndarray,
    di: jnp.ndarray,
    depthj: jnp.ndarray | None,
    camera_i: Camera,
    camera_j: Camera,
    T_itoj: Pose,
    validi: jnp.ndarray,
    ccth: float | None = None,
):
    """Reproject keypoints of view i into view j using depth
    (reference `depth.py:37`).

    kpi: (..., N, 2); di: (..., N) depths; depthj: (..., H, W) or None for
    cycle-consistency; validi: (..., N).
    Returns (kpi_j (..., N, 2), validj (..., N)).
    """
    rays_i, v_unproj = camera_i.image2world(kpi)
    p3d_i = rays_i * di[..., None]
    p3d_j = T_itoj.transform(p3d_i)
    kpi_j, v_proj = camera_j.world2image(p3d_j)
    inside = camera_j.in_image(kpi_j)
    valid = validi & v_unproj & v_proj & inside
    if ccth is not None and depthj is not None:
        # cycle consistency: depth at the projected location must agree
        dj, v_dj = sample_depth_bilinear(depthj, kpi_j)
        z_j = p3d_j[..., 2]
        consistent = jnp.abs(dj - z_j) < ccth * jnp.maximum(jnp.abs(z_j), 1e-8)
        valid = valid & v_dj & consistent
    return kpi_j, valid


def dense_warp_consistency(
    depthi: jnp.ndarray,
    depthj: jnp.ndarray,
    T_itoj: Pose,
    camerai: Camera,
    cameraj: Camera,
):
    """Dense warp of every pixel of view i into view j (reference `depth.py:71`).

    Returns (warped pixel grid (..., H, W, 2), valid (..., H, W)).
    """
    H, W = depthi.shape[-2:]
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    grid = jnp.stack([xs, ys], -1).astype(depthi.dtype) + 0.5
    grid = jnp.broadcast_to(grid, depthi.shape[:-2] + (H, W, 2))
    kpi = grid.reshape(depthi.shape[:-2] + (H * W, 2))
    di = depthi.reshape(depthi.shape[:-2] + (H * W,))
    validi = di > 0
    kpj, valid = project(kpi, di, depthj, camerai, cameraj, T_itoj, validi, ccth=0.05)
    return (
        kpj.reshape(depthi.shape[:-2] + (H, W, 2)),
        valid.reshape(depthi.shape[:-2] + (H, W)),
    )


def symmetric_reprojection_error(
    kp0, kp1, cam0: Camera, cam1: Camera, T_0to1: Pose, depth0, depth1
):
    """Mean of forward/backward reprojection distances for matched keypoint
    pairs (reference `depth.py:91`). Invalid samples get error inf.

    kp0, kp1: (..., N, 2) matched pairs.
    """
    d0, v0 = sample_depth_bilinear(depth0, kp0)
    d1, v1 = sample_depth_bilinear(depth1, kp1)
    kp0_1, va = project(kp0, d0, None, cam0, cam1, T_0to1, v0)
    kp1_0, vb = project(kp1, d1, None, cam1, cam0, T_0to1.inv(), v1)
    e0 = jnp.linalg.norm(kp0_1 - kp1, axis=-1)
    e1 = jnp.linalg.norm(kp1_0 - kp0, axis=-1)
    err = 0.5 * (e0 + e1)
    valid = va & vb
    return jnp.where(valid, err, jnp.inf), valid
