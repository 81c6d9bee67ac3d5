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


def _box_corners(width, height, inset_x=0.0, inset_y=0.0):
    """Corners of the axis-aligned box of size (width, height), optionally
    shrunk symmetrically by (inset_x, inset_y) on each side.

    Corner order is (left,top) -> (left,bottom) -> (right,bottom) ->
    (right,top) in image coordinates, i.e. a consistent winding so that the
    convexity test below has one expected sign.
    """
    x0, x1 = inset_x, width - inset_x
    y0, y1 = inset_y, height - inset_y
    return np.array([[x0, y0], [x0, y1], [x1, y1], [x1, y0]], np.float32)


def _convexity_margins(quads, norm):
    """Signed z-components of consecutive edge cross-products.

    quads: (..., 4, 2) corner sets; norm: (2,) divisor (image size) so the
    margin is resolution-independent. Returns (..., 4). A quad is strictly
    convex with margin m iff all four values share a sign and exceed m in
    magnitude.
    """
    q = np.asarray(quads, np.float32) / np.asarray(norm, np.float32)
    edges = np.roll(q, -1, axis=-2) - q  # edge i: corner i -> i+1
    prev = np.roll(edges, 1, axis=-2)  # edge into corner i
    return prev[..., 0] * edges[..., 1] - prev[..., 1] * edges[..., 0]


def _is_convex(quads, norm, min_convexity):
    c = _convexity_margins(quads, norm)
    pos = np.all(c > min_convexity, axis=-1)
    neg = np.all(c < -min_convexity, axis=-1)
    return pos | neg


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
    """Random convex 4-corner homography (behavior of reference
    `homography.py:40-107`, re-designed as vectorized candidate sampling).

    Draws a random convex quadrilateral inside the source image — each
    corner jittered inward by up to ``difficulty`` of the half-extent —
    then applies an optional random rotation and translation, and returns
    the homography that maps the quad onto the full ``patch_shape`` patch.

    Returns (H 3x3 float32 mapping src pixels -> patch pixels,
    full-image corners, their warp under H, patch_shape).
    """
    width, height = shape
    full = _box_corners(width, height)
    patch = _box_corners(*patch_shape)

    # --- corner jitter: draw all candidates at once, keep the first convex
    # one. Each corner moves from the image corner toward the center by a
    # uniform fraction of the difficulty-scaled margin.
    margin = np.array([width, height], np.float32) * 0.5 * difficulty
    inward = np.sign(np.mean(full, axis=0, keepdims=True) - full)  # (4, 2)
    n_cand = 64
    jitter = rng.uniform(0.0, 1.0, size=(n_cand, 4, 2)).astype(np.float32)
    candidates = full[None] + jitter * margin[None, None] * inward[None]
    ok = _is_convex(candidates, shape, min_convexity)
    if ok.any():
        quad = candidates[int(np.argmax(ok))]
    else:
        # fully shrunk box is always convex
        quad = _box_corners(width, height, margin[0], margin[1])

    # --- rotation: candidate angles evaluated in one shot; first convex
    # rotated quad wins, otherwise the quad stays unrotated.
    if n_angles > 0 and difficulty > 0:
        lim = math.radians(max_angle) * difficulty
        angles = rng.permutation(np.linspace(-lim, lim, n_angles)).astype(np.float32)
        c, s = np.cos(angles), np.sin(angles)
        R = np.moveaxis(np.array([[c, -s], [s, c]]), -1, 0)  # (n_angles, 2, 2)
        centroid = quad.mean(axis=0)
        rotated = (quad - centroid) @ np.swapaxes(R, -1, -2) + centroid
        ok = _is_convex(rotated, shape, min_convexity)
        if ok.any():
            quad = rotated[int(np.argmax(ok))]

    # --- translation: slide the quad uniformly within the image bounds,
    # scaled by the translation factor.
    if translation > 0:
        lo = -quad.min(axis=0)
        hi = np.array(shape, np.float32) - quad.max(axis=0)
        quad = quad + translation * rng.uniform(lo, hi).astype(np.float32)

    H = compute_homography_np(quad, patch)
    return H.astype(np.float32), full, warp_points_np(full, H, inverse=False), patch_shape


def compute_homography_np(pts_src, pts_dst, shape=None):
    """Host-side 4-point DLT: H with pts_dst ~ H @ pts_src (homogeneous).

    Fresh SVD null-space formulation (not the reference's lstsq form): each
    correspondence contributes two rows of the 8x9 system A h = 0; h is the
    right singular vector of the smallest singular value.
    """
    src = np.asarray(pts_src, np.float64)
    dst = np.asarray(pts_dst, np.float64)
    if shape is not None:
        src = src / np.asarray(shape, np.float64)
        dst = dst / np.asarray(shape, np.float64)
    # Hartley normalization for conditioning.
    def _norm_T(p):
        mean = p.mean(axis=0)
        scale = math.sqrt(2.0) / max(np.linalg.norm(p - mean, axis=1).mean(), 1e-12)
        T = np.diag([scale, scale, 1.0])
        T[:2, 2] = -scale * mean
        return T

    Ts, Td = _norm_T(src), _norm_T(dst)
    sh = np.concatenate([src, np.ones((len(src), 1))], axis=1) @ Ts.T
    dh = np.concatenate([dst, np.ones((len(dst), 1))], axis=1) @ Td.T
    zeros = np.zeros_like(sh)
    rows_u = np.concatenate([sh, zeros, -dh[:, :1] * sh], axis=1)
    rows_v = np.concatenate([zeros, sh, -dh[:, 1:2] * sh], axis=1)
    A = np.concatenate([rows_u, rows_v], axis=0)
    _, _, Vt = np.linalg.svd(A)
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


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


def decompose_homography(H: jnp.ndarray):
    """Decompose a calibrated (Euclidean) homography into motion candidates.

    H: (3, 3) homography in *normalized* camera coordinates (K1^-1 H_pix K0),
    sign-corrected so that x1h^T H x0h > 0 for true correspondences.
    Returns (Rs, ts, ns): (4, 3, 3), (4, 3), (4, 3) — the four physically
    distinct solutions of H ~ R + t n^T, with t scaled by the inverse plane
    distance 1/d and n the unit plane normal in camera-0 coordinates.

    Analytic construction from the eigen-structure of H^T H (the SVD-based
    four-solution theorem for planar scenes); the TPU-native replacement for
    pycolmap's HomographyMatrix decomposition inside
    two_view_geometry_estimation (reference
    `robust_estimators/relative_pose/pycolmap.py:26-33`). Pure-rotation
    homographies (H^T H ~ I) degrade gracefully: the sqrt arguments clamp at
    zero, giving t ~ 0 and R ~ the normalized H.
    """
    dtype = jnp.promote_types(H.dtype, jnp.float32)
    H = H.astype(dtype)
    # scale so the middle singular value is 1 (sigma2(H') = 1)
    s = jnp.linalg.svd(H, compute_uv=False)
    Hn = H / jnp.maximum(s[1], 1e-12)

    M = Hn.T @ Hn  # symmetric, eigenvalues sigma3^2 <= 1 <= sigma1^2
    evals, V = jnp.linalg.eigh(M)  # ascending
    s32, s12 = evals[0], evals[2]
    v1, v2, v3 = V[:, 2], V[:, 1], V[:, 0]
    # keep the eigenbasis right-handed so cross products stay consistent
    v3 = v3 * jnp.sign(jnp.dot(jnp.cross(v1, v2), v3) + 1e-30)

    z1 = jnp.sqrt(jnp.maximum(s12 - 1.0, 0.0))
    z3 = jnp.sqrt(jnp.maximum(1.0 - s32, 0.0))
    den = jnp.sqrt(jnp.maximum(s12 - s32, 1e-12))
    u1 = (z3 * v1 + z1 * v3) / den
    u2 = (z3 * v1 - z1 * v3) / den
    # re-normalize: |u| = 1 holds analytically, but in the pure-rotation
    # limit (s12 ~ s32 ~ 1) the clamped denominator leaves u tiny or huge
    # while its direction is numerical noise; a unit u keeps U/W orthonormal
    # so R -> Hn and t -> 0 exactly as the theory prescribes.
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-12)
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2), 1e-12)

    def motion_from(u):
        # orthonormal frames before/after the map: U = [v2, u, v2 x u],
        # W = [Hn v2, Hn u, (Hn v2) x (Hn u)]; R maps U onto W.
        U = jnp.stack([v2, u, jnp.cross(v2, u)], axis=-1)
        Hv2, Hu = Hn @ v2, Hn @ u
        W = jnp.stack([Hv2, Hu, jnp.cross(Hv2, Hu)], axis=-1)
        R = W @ U.T
        n = jnp.cross(v2, u)
        t = (Hn - R) @ n
        return R, t, n

    R1, t1, n1 = motion_from(u1)
    R2, t2, n2 = motion_from(u2)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])
    return Rs, ts, ns
