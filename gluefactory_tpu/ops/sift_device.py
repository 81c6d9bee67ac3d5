"""Fully on-device DoG SIFT: pyramid, extrema, orientation, descriptors
(the reference's CudaSift/pycolmap fast path, SURVEY.md §2.9 — here as one
jittable XLA program instead of a CUDA kernel suite).

TPU-first design:
  - separable Gaussian pyramid as depthwise 1D convs (static shapes per
    octave; the octave loop unrolls at trace time);
  - 3x3x3 DoG extrema via stacked max/min pooling comparisons, contrast +
    edge (Hessian-ratio) filters, fixed-K top-k per octave merged into a
    global fixed-K set with a validity mask (framework contract);
  - orientation from a 36-bin gradient histogram around each keypoint,
    built as one one-hot matmul over gathered patches (MXU-friendly);
  - descriptors from a fixed 16x16 rotated sample grid: bilinear gradient
    gathers + soft spatial/orientation binning into 4x4x8, all expressed
    as batched einsums. Matches the SIFT construction (Lowe 2004), not
    bit-exact to cv2 (neither is CudaSift).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable blur. img: (B, H, W)."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = gaussian_kernel1d(sigma, radius)
    img4 = img[..., None]  # (B, H, W, 1)
    kh = k.reshape(-1, 1, 1, 1)
    kw = k.reshape(1, -1, 1, 1)
    out = jax.lax.conv_general_dilated(
        img4, kh, (1, 1), [(radius, radius), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (radius, radius)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0]


def _bilinear_lvl(vol: jnp.ndarray, lvl: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Per-keypoint-level bilinear sampling without materializing per-kp maps.

    vol: (B, L, H, W); lvl: (B, K) level index; x/y: (B, K, P) coordinates.
    Returns (B, K, P). Edge-clamped; indexes the flattened (L*H*W) volume
    with a per-keypoint level offset — O(B*K*P) gathers, not O(B*K*H*W).
    """
    B, L, H, W = vol.shape
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    flat = vol.reshape(B, L * H * W)
    base = (lvl * (H * W))[:, :, None]  # (B, K, 1)

    def g(yy, xx):
        idx = base + (yy * W + xx).astype(jnp.int32)
        K, P = idx.shape[1], idx.shape[2]
        out = jnp.take_along_axis(flat, idx.reshape(B, K * P), axis=1)
        return out.reshape(B, K, P)

    return (
        g(y0, x0) * (1 - wx) * (1 - wy)
        + g(y0, x1) * wx * (1 - wy)
        + g(y1, x0) * (1 - wx) * wy
        + g(y1, x1) * wx * wy
    )


def build_pyramid(img, num_octaves=4, num_scales=3, sigma0=1.6, init_sigma=0.5):
    """Returns per-octave lists of gaussian stacks (B, S+3, H, W)."""
    B, H, W = img.shape
    # initial blur to sigma0 assuming the input has init_sigma
    ds = math.sqrt(max(sigma0**2 - init_sigma**2, 0.01))
    base = gaussian_blur(img, ds)
    k = 2.0 ** (1.0 / num_scales)
    octaves = []
    cur = base
    for o in range(num_octaves):
        levels = [cur]
        sig_prev = sigma0
        for s in range(1, num_scales + 3):
            sig_total = sigma0 * (k**s)
            sig_extra = math.sqrt(max(sig_total**2 - sig_prev**2, 1e-6))
            levels.append(gaussian_blur(levels[-1], sig_extra))
            sig_prev = sig_total
        octaves.append(jnp.stack(levels, axis=1))  # (B, S+3, H, W)
        # next octave: downsample the level with sigma = 2*sigma0
        cur = levels[num_scales][:, ::2, ::2]
    return octaves


def _extrema_mask(dog: jnp.ndarray, contrast_th: float, edge_th: float):
    """dog: (B, D, H, W). True where a 3x3x3 extremum passes both filters."""
    B, D, H, W = dog.shape
    a = jnp.abs(dog)
    # 3x3 spatial max of |dog| per level then 3-level max
    def pool(x, op, init):
        return jax.lax.reduce_window(
            x, init, op, (1, 3, 3, 3), (1, 1, 1, 1), "SAME"
        )

    mx = pool(dog, jax.lax.max, -jnp.inf)
    mn = pool(dog, jax.lax.min, jnp.inf)
    is_ext = ((dog >= mx) & (dog > 0)) | ((dog <= mn) & (dog < 0))
    # exclude the outer DoG levels and borders
    lvl = jnp.zeros((D,), bool).at[1:-1].set(True)
    is_ext &= lvl[None, :, None, None]
    border = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    is_ext &= border[None, None]
    is_ext &= a > contrast_th

    # edge response: ratio of principal curvatures of the spatial Hessian
    dxx = jnp.roll(dog, -1, 3) + jnp.roll(dog, 1, 3) - 2 * dog
    dyy = jnp.roll(dog, -1, 2) + jnp.roll(dog, 1, 2) - 2 * dog
    dxy = 0.25 * (
        jnp.roll(jnp.roll(dog, -1, 2), -1, 3)
        + jnp.roll(jnp.roll(dog, 1, 2), 1, 3)
        - jnp.roll(jnp.roll(dog, -1, 2), 1, 3)
        - jnp.roll(jnp.roll(dog, 1, 2), -1, 3)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_th
    is_ext &= (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
    return is_ext


def _subpixel_offsets(dog):
    """2D quadratic refinement offsets (B, D, H, W, 2) as (dx, dy)."""
    dx = 0.5 * (jnp.roll(dog, -1, 3) - jnp.roll(dog, 1, 3))
    dy = 0.5 * (jnp.roll(dog, -1, 2) - jnp.roll(dog, 1, 2))
    dxx = jnp.roll(dog, -1, 3) + jnp.roll(dog, 1, 3) - 2 * dog
    dyy = jnp.roll(dog, -1, 2) + jnp.roll(dog, 1, 2) - 2 * dog
    ox = jnp.where(jnp.abs(dxx) > 1e-6, -dx / dxx, 0.0)
    oy = jnp.where(jnp.abs(dyy) > 1e-6, -dy / dyy, 0.0)
    return jnp.clip(jnp.stack([ox, oy], -1), -0.5, 0.5)


def detect_sift_device(
    img: jnp.ndarray,
    max_num_keypoints: int = 1024,
    num_octaves: int = 4,
    num_scales: int = 3,
    sigma0: float = 1.6,
    contrast_th: float = 0.015,
    edge_th: float = 10.0,
    first_octave: int = -1,
):
    """img: (B, H, W) grayscale in [0, 1]. Returns dict with fixed-K
    keypoints (image pixels), scores, scales (blob sigma in image pixels),
    oris, descriptors (128, RootSIFT) and validity.

    first_octave=-1 starts from a 2x-upsampled image (cv2/CudaSift
    convention) — doubles small-scale keypoint recall."""
    B = img.shape[0]
    K = max_num_keypoints
    init_sigma = 0.5
    if first_octave == -1:
        H0, W0 = img.shape[1:]
        img = jax.image.resize(img, (B, H0 * 2, W0 * 2), "bilinear")
        init_sigma = 1.0
    octaves = build_pyramid(
        img, num_octaves, num_scales, sigma0, init_sigma=init_sigma
    )
    k_step = 2.0 ** (1.0 / num_scales)

    per_oct = []
    K_oct = max(K // num_octaves, 64)
    for o, gauss in enumerate(octaves):
        dog = gauss[:, 1:] - gauss[:, :-1]  # (B, S+2, h, w)
        mask = _extrema_mask(dog, contrast_th, edge_th)
        offs = _subpixel_offsets(dog)
        resp = jnp.where(mask, jnp.abs(dog), 0.0)
        Bq, D, h, w = resp.shape
        flat = resp.reshape(B, -1)
        scores, idx = jax.lax.top_k(flat, K_oct)
        valid = scores > 0
        lvl = idx // (h * w)
        rem = idx % (h * w)
        yy = rem // w
        xx = rem % w
        off = jnp.take_along_axis(
            offs.reshape(B, -1, 2), idx[..., None], axis=1
        )
        fx = xx.astype(jnp.float32) + off[..., 0]
        fy = yy.astype(jnp.float32) + off[..., 1]
        scale_img = sigma0 * (k_step ** lvl.astype(jnp.float32)) * (2.0 ** (o + first_octave))

        # orientation + descriptor from the gaussian level of each keypoint
        gx = 0.5 * (jnp.roll(gauss, -1, 3) - jnp.roll(gauss, 1, 3))
        gy = 0.5 * (jnp.roll(gauss, -1, 2) - jnp.roll(gauss, 1, 2))
        mag = jnp.sqrt(gx * gx + gy * gy)
        ang = jnp.arctan2(gy, gx)

        # ---- orientation: 36-bin histogram over a fixed 9x9 grid scaled
        # by 1.5*sigma around the keypoint
        R_ORI = 4
        grid = jnp.stack(
            jnp.meshgrid(
                jnp.arange(-R_ORI, R_ORI + 1, dtype=jnp.float32),
                jnp.arange(-R_ORI, R_ORI + 1, dtype=jnp.float32),
                indexing="xy",
            ),
            -1,
        ).reshape(-1, 2)  # (P, 2)
        gw = jnp.exp(-jnp.sum(grid**2, -1) / (2 * 1.5**2))  # (P,)
        sig_oct = sigma0 * (k_step ** lvl.astype(jnp.float32))  # octave pixels
        step = 1.5 * sig_oct / R_ORI  # grid spacing
        px = fx[..., None] + grid[None, None, :, 0] * step[..., None]
        py = fy[..., None] + grid[None, None, :, 1] * step[..., None]

        m_p = _bilinear_lvl(mag, lvl, px, py)
        a_p = _bilinear_lvl(ang, lvl, px, py)
        bins = jnp.floor((a_p + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        onehot = jax.nn.one_hot(bins, 36)  # (B, K_oct, P, 36)
        hist = jnp.einsum("bkp,p,bkpo->bko", m_p, gw, onehot)
        # circular smoothing x2
        for _ in range(2):
            hist = (
                jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)
            ) / 3.0
        ori_bin = jnp.argmax(hist, -1)
        ori = (ori_bin.astype(jnp.float32) + 0.5) / 36 * 2 * jnp.pi - jnp.pi

        # ---- descriptor: 16x16 samples over a 4x4x8 grid, rotated
        DW = 4  # cells
        SPC = 16  # samples per side
        u = (jnp.arange(SPC, dtype=jnp.float32) + 0.5) / SPC * DW - DW / 2
        su, sv = jnp.meshgrid(u, u, indexing="xy")
        samp = jnp.stack([su, sv], -1).reshape(-1, 2)  # (S2, 2) in cell units
        S2 = samp.shape[0]
        # spatial soft-binning weights (S2, 16): bilinear into 4x4 cells
        cell_centers = jnp.arange(DW, dtype=jnp.float32) - (DW - 1) / 2
        du = jnp.maximum(0, 1 - jnp.abs(samp[:, 0:1] - cell_centers[None]))
        dv = jnp.maximum(0, 1 - jnp.abs(samp[:, 1:2] - cell_centers[None]))
        w_spatial = (du[:, :, None] * dv[:, None, :]).reshape(S2, DW * DW)
        gauss_w = jnp.exp(-jnp.sum(samp**2, -1) / (2 * (DW / 2) ** 2))

        cos_o, sin_o = jnp.cos(ori), jnp.sin(ori)
        hw = 3.0 * sig_oct  # cell width in octave pixels
        rx = (samp[None, None, :, 0] * cos_o[..., None] - samp[None, None, :, 1] * sin_o[..., None])
        ry = (samp[None, None, :, 0] * sin_o[..., None] + samp[None, None, :, 1] * cos_o[..., None])
        dpx = fx[..., None] + rx * hw[..., None]
        dpy = fy[..., None] + ry * hw[..., None]

        dm = _bilinear_lvl(mag, lvl, dpx, dpy)
        da = _bilinear_lvl(ang, lvl, dpx, dpy) - ori[..., None]
        # 8 orientation bins, soft assignment
        t = (da + 3 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi) * 8
        b0 = jnp.floor(t).astype(jnp.int32) % 8
        frac = t - jnp.floor(t)
        ob = (
            jax.nn.one_hot(b0, 8) * (1 - frac[..., None])
            + jax.nn.one_hot((b0 + 1) % 8, 8) * frac[..., None]
        )  # (B, K_oct, S2, 8)
        desc = jnp.einsum("bks,s,sc,bkso->bkco", dm, gauss_w, w_spatial, ob)
        desc = desc.reshape(B, K_oct, DW * DW * 8)
        # SIFT normalize: L2, clip 0.2, renorm; RootSIFT applied by caller
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        desc = jnp.minimum(desc, 0.2)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)

        per_oct.append(
            {
                "keypoints": jnp.stack([fx, fy], -1) * (2.0 ** (o + first_octave)),
                "scores": scores,
                "scales": scale_img,
                "oris": ori,
                "descriptors": desc,
                "valid": valid,
            }
        )

    # merge octaves -> global top-K by score
    cat = {
        k: jnp.concatenate([p[k] for p in per_oct], axis=1) for k in per_oct[0]
    }
    scores_all = jnp.where(cat["valid"], cat["scores"], -1.0)
    top_scores, top_idx = jax.lax.top_k(scores_all, K)
    take = lambda a: jnp.take_along_axis(
        a, top_idx.reshape(B, K, *([1] * (a.ndim - 2))), axis=1
    )
    return {
        "keypoints": take(cat["keypoints"]),
        "keypoint_scores": jnp.maximum(top_scores, 0.0),
        "scales": take(cat["scales"][..., None])[..., 0],
        "oris": take(cat["oris"][..., None])[..., 0],
        "descriptors": take(cat["descriptors"]),
        "keypoint_valid": top_scores > 0,
    }
