"""Homography sampling, estimation, and warping
(reference `gluefactory/geometry/homography.py:40-342`).

Host-side sampling uses numpy RNG (it runs in dataloader workers); all
warping/error functions are pure jnp and jittable. DLT is batched and feeds
both GT generation and the on-device RANSAC (`ops/ransac.py`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .utils import from_homogeneous, to_homogeneous

# ---------------------------------------------------------------------------
# Host-side random sampling (numpy; runs in dataset workers)
# ---------------------------------------------------------------------------


def flat2mat(H8):
    return np.reshape(np.concatenate([H8, np.ones_like(H8[..., :1])], axis=-1), [3, 3])


def create_center_patch(shape, patch_shape=None):
    if patch_shape is None:
        patch_shape = shape
    width, height = shape
    pwidth, pheight = patch_shape
    left = int((width - pwidth) / 2)
    bottom = int((height - pheight) / 2)
    right = int((width + pwidth) / 2)
    top = int((height + pheight) / 2)
    return np.array([[left, bottom], [left, top], [right, top], [right, bottom]])


def check_convex(patch, min_convexity=0.05):
    """All consecutive corner cross-products must exceed min_convexity."""
    for i in range(patch.shape[0]):
        x1, y1 = patch[(i - 1) % patch.shape[0]]
        x2, y2 = patch[i]
        x3, y3 = patch[(i + 1) % patch.shape[0]]
        if (x2 - x1) * (y3 - y2) - (x3 - x2) * (y2 - y1) > -min_convexity:
            return False
    return True


def sample_homography_corners(
    shape,
    patch_shape,
    difficulty=1.0,
    translation=0.4,
    n_angles=10,
    max_angle=90,
    min_convexity=0.05,
    rng=np.random,
):
    """Random convex 4-corner homography (reference `homography.py:40-107`).

    Returns (H 3x3 float32, src corners, dst corners, scale, coords).
    """
    max_angle = max_angle / 180.0 * math.pi
    width, height = shape
    pwidth, pheight = width * (1 - difficulty), height * (1 - difficulty)
    min_pts1 = create_center_patch(shape, (pwidth, pheight))
    full = create_center_patch(shape)
    pts2 = create_center_patch(patch_shape)
    scale = min_pts1.astype(np.float32) - full.astype(np.float32)
    found_valid = False
    cnt = -1
    while not found_valid:
        offsets = rng.uniform(0.0, 1.0, size=(4, 2)) * scale
        pts1 = full + offsets
        found_valid = check_convex(pts1 / np.array(shape), min_convexity)
        cnt += 1
        if cnt > 100:
            pts1 = min_pts1.astype(np.float32)
            break

    # random rotation
    if n_angles > 0 and difficulty > 0:
        angles = np.linspace(-max_angle * difficulty, max_angle * difficulty, n_angles)
        rng.shuffle(angles)
        angles = np.concatenate([[0.0], angles], axis=0)
        center = np.mean(pts1, axis=0, keepdims=True)
        rot_mat = np.reshape(
            np.stack(
                [np.cos(angles), -np.sin(angles), np.sin(angles), np.cos(angles)],
                axis=1,
            ),
            [-1, 2, 2],
        )
        rotated = (
            np.matmul((pts1 - center)[np.newaxis], rot_mat) + center
        )  # (n_angles+1, 4, 2)
        for idx in range(1, rotated.shape[0]):
            warped = rotated[idx] / np.array(shape)
            if check_convex(warped, min_convexity):
                pts1 = rotated[idx]
                break

    # random translation
    if translation > 0:
        min_trans = -np.min(pts1, axis=0)
        max_trans = shape - np.max(pts1, axis=0)
        trans = rng.uniform(min_trans, max_trans)[np.newaxis]
        pts1 += trans * translation

    H = compute_homography_np(pts1, pts2, [1.0, 1.0])
    warped = warp_points_np(full.astype(np.float32), H, inverse=False)
    return H.astype(np.float32), full, warped, patch_shape


def compute_homography_np(pts1_, pts2_, shape):
    """4-point DLT on the host (reference `homography.py:110-133`)."""
    shape = np.array(shape, np.float32)
    pts1 = np.asarray(pts1_, np.float32) / shape[None]
    pts2 = np.asarray(pts2_, np.float32) / shape[None]

    def ax(p, q):
        return [p[0], p[1], 1, 0, 0, 0, -p[0] * q[0], -p[1] * q[0]]

    def ay(p, q):
        return [0, 0, 0, p[0], p[1], 1, -p[0] * q[1], -p[1] * q[1]]

    a_mat = np.stack([f(pts1[i], pts2[i]) for i in range(4) for f in (ax, ay)])
    p_mat = np.array([[pts2[i][j] for i in range(4) for j in range(2)]]).T
    homography, _, _, _ = np.linalg.lstsq(a_mat, p_mat, rcond=None)
    return flat2mat(homography[:, 0])


# ---------------------------------------------------------------------------
# Device-side (jnp) — batched DLT and warping
# ---------------------------------------------------------------------------


def compute_homography_dlt(pts0: jnp.ndarray, pts1: jnp.ndarray, weights=None):
    """Batched normalized DLT from >=4 correspondences.

    pts0, pts1: (..., N, 2); weights: optional (..., N) soft inlier weights.
    Returns H (..., 3, 3) mapping pts0 -> pts1 (jittable; used by GT gen,
    on-device RANSAC, and the DLT eval metric, reference `eval/utils.py:276`).
    """
    dtype = jnp.promote_types(pts0.dtype, jnp.float32)
    pts0 = pts0.astype(dtype)
    pts1 = pts1.astype(dtype)
    if weights is None:
        weights = jnp.ones(pts0.shape[:-1], dtype)
    w = weights[..., None].astype(dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-8)

    def normalize(p):
        mean = jnp.sum(p * w, axis=-2, keepdims=True) / wsum
        d = jnp.linalg.norm(p - mean, axis=-1, keepdims=True)
        s = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sum(d * w, axis=-2, keepdims=True) / wsum, 1e-8
        )
        T = jnp.zeros(p.shape[:-2] + (3, 3), dtype)
        T = T.at[..., 0, 0].set(s[..., 0, 0])
        T = T.at[..., 1, 1].set(s[..., 0, 0])
        T = T.at[..., 0, 2].set(-s[..., 0, 0] * mean[..., 0, 0])
        T = T.at[..., 1, 2].set(-s[..., 0, 0] * mean[..., 0, 1])
        T = T.at[..., 2, 2].set(1.0)
        return (p - mean) * s, T

    p0n, T0 = normalize(pts0)
    p1n, T1 = normalize(pts1)

    x, y = p0n[..., 0], p0n[..., 1]
    u, v = p1n[..., 0], p1n[..., 1]
    o = jnp.zeros_like(x)
    l = jnp.ones_like(x)
    rows_x = jnp.stack([x, y, l, o, o, o, -u * x, -u * y, -u], axis=-1)
    rows_y = jnp.stack([o, o, o, x, y, l, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([rows_x, rows_y], axis=-2)  # (..., 2N, 9)
    ws = jnp.sqrt(jnp.concatenate([weights, weights], axis=-1))[..., None]
    A = A * ws.astype(dtype)
    # nullspace via eigh of A^T A (more stable on TPU than full SVD)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]  # eigenvector of smallest eigenvalue
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / jnp.maximum(jnp.abs(H[..., 2:3, 2:3]), 1e-8) * jnp.sign(
        H[..., 2:3, 2:3] + 1e-12
    )


def warp_points(points: jnp.ndarray, H: jnp.ndarray, inverse: bool = True):
    """Warp 2D points (..., N, 2) with homographies H (..., 3, 3)."""
    H = jnp.linalg.inv(H) if inverse else H
    proj = to_homogeneous(points) @ jnp.swapaxes(H, -1, -2)
    return from_homogeneous(proj)


def warp_points_np(points, homography, inverse=True):
    H = np.linalg.inv(homography) if inverse else homography
    pts = np.concatenate([points, np.ones_like(points[..., :1])], axis=-1)
    proj = pts @ H.T
    return proj[..., :-1] / np.maximum(np.abs(proj[..., -1:]), 1e-8) * np.sign(
        proj[..., -1:] + 1e-12
    )


def warp_lines(lines: jnp.ndarray, H: jnp.ndarray, inverse: bool = True):
    """Warp line segments (..., L, 2, 2) endpoint-wise."""
    shape = lines.shape
    pts = lines.reshape(shape[:-3] + (-1, 2))
    warped = warp_points(pts, H, inverse=inverse)
    return warped.reshape(shape)


def sym_homography_error(kpts0: jnp.ndarray, kpts1: jnp.ndarray, H: jnp.ndarray):
    """Symmetric transfer error per correspondence (reference `homography.py:314`)."""
    kp0_1 = warp_points(kpts0, H, inverse=False)
    kp1_0 = warp_points(kpts1, H, inverse=True)
    d0 = jnp.linalg.norm(kp0_1 - kpts1, axis=-1)
    d1 = jnp.linalg.norm(kp1_0 - kpts0, axis=-1)
    return (d0 + d1) / 2.0


def sym_homography_error_all(kpts0: jnp.ndarray, kpts1: jnp.ndarray, H: jnp.ndarray):
    """All-pairs symmetric error: (..., N, 2) x (..., M, 2) -> (..., N, M)."""
    kp0_1 = warp_points(kpts0, H, inverse=False)  # (..., N, 2)
    kp1_0 = warp_points(kpts1, H, inverse=True)  # (..., M, 2)
    d0 = jnp.linalg.norm(kp0_1[..., :, None, :] - kpts1[..., None, :, :], axis=-1)
    d1 = jnp.linalg.norm(kpts0[..., :, None, :] - kp1_0[..., None, :, :], axis=-1)
    return (d0 + d1) / 2.0


def homography_corner_error(T: jnp.ndarray, T_gt: jnp.ndarray, image_size):
    """Mean corner displacement of T vs T_gt (reference `homography.py:336`).

    image_size: (..., 2) as (w, h).
    """
    size = jnp.asarray(image_size)
    w, h = size[..., 0], size[..., 1]
    zeros = jnp.zeros_like(w)
    corners = jnp.stack(
        [
            jnp.stack([zeros, zeros], -1),
            jnp.stack([w, zeros], -1),
            jnp.stack([w, h], -1),
            jnp.stack([zeros, h], -1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    corners_t = warp_points(corners, T, inverse=False)
    corners_gt = warp_points(corners, T_gt, inverse=False)
    d = jnp.linalg.norm(corners_t - corners_gt, axis=-1)
    return jnp.mean(d, axis=-1)
