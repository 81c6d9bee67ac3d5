"""ALIKED extractor, TPU-native and official-weight compatible
(reference `gluefactory/models/extractors/aliked.py:75-824`; checkpoints
`aliked-n16` etc. from Zhao et al. 2023).

The math path matches the reference exactly so converted official
checkpoints reproduce its outputs (`utils/torch_weights.py:convert_aliked`):
  - ConvBlock / ResBlock encoder with eval-mode BatchNorm folded into
    per-channel affine (scale, bias) params, SELU gates, avg-pools 2/4/4.
  - torchvision `deform_conv2d` semantics re-derived as vectorized bilinear
    gathers with zero padding: offsets are (dy, dx) pairs per kernel tap,
    clamped to +-max(h, w)/4 (reference `aliked.py:309-331`). The gathers
    vectorize over all taps; the tap-weighted reduction is one matmul on
    the MXU.
  - Multi-scale aggregation with align-corners bilinear upsampling
    (`jax.image.resize` is half-pixel, so the align-corners grid is built
    explicitly).
  - DKD (`aliked.py:108-244`): NMS, border removal, fixed-K top-k (the
    reference's force_num_keypoints mode — our framework contract), 5x5
    score-patch softargmax at temperature 0.1 with detached max, score
    re-sampling and dispersity.
  - SDDH (`aliked.py:460-592`): 3x3 integer-corner patches, offset head,
    grid_sample(align_corners=True) feature sampling, sf_conv, per-offset
    (M, C, C) aggregation einsum, L2 normalization — batched over all
    keypoints at once instead of the reference's per-image Python loop.

TPU-first differences (shapes only, not numerics): everything is fixed-K
masked and jittable end-to-end; no per-image loops, no dynamic keypoint
counts.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.keypoints import remove_borders, simple_nms, top_k_keypoints
from ..base_model import BaseModel

__main_class__ = "ALIKED"

CFGS = {
    "aliked-t16": {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64, "K": 3, "M": 16},
    "aliked-n16": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 16},
    "aliked-n16rot": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 16},
    "aliked-n32": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 32},
}


def bilinear_zero(fmap: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding (torch grid_sample 'zeros').

    fmap: (B, H, W, C); px/py: (B, N) pixel coords. Returns (B, N, C).
    """
    B, H, W, C = fmap.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    flat = fmap.reshape(B, H * W, C)

    def corner(yi, xi, w):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return v * (w * inb)[..., None]

    return (
        corner(y0, x0, (1 - wx) * (1 - wy))
        + corner(y0, x0 + 1, wx * (1 - wy))
        + corner(y0 + 1, x0, (1 - wx) * wy)
        + corner(y0 + 1, x0 + 1, wx * wy)
    )


def bilinear_gather(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Edge-clamped bilinear sampling (used by DISK's descriptor lookup).

    fmap: (B, H, W, C); coords: (B, N, 2) as (x, y). Returns (B, N, C).
    """
    B, H, W, C = fmap.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    # Each corner clips independently from the UNCLIPPED base index: a tap
    # hanging off the top/left border pins both corners to index 0 (true
    # edge-clamp, = torch grid_sample border padding and LoFTR's
    # _gather_windows) instead of blending rows/cols 0 and 1.
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
    flat = fmap.reshape(B, H * W, C)

    def g(yy, xx):
        return jnp.take_along_axis(flat, (yy * W + xx)[..., None], axis=1)

    return (
        g(y0i, x0i) * ((1 - wx) * (1 - wy))[..., None]
        + g(y0i, x1i) * (wx * (1 - wy))[..., None]
        + g(y1i, x0i) * ((1 - wx) * wy)[..., None]
        + g(y1i, x1i) * (wx * wy)[..., None]
    )


def upsample_align_corners(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Bilinear upsample (B, h, w, C) -> (B, H, W, C) with align_corners=True
    (torch nn.Upsample semantics; jax.image.resize is half-pixel)."""
    B, h, w, C = x.shape
    ys = jnp.linspace(0.0, h - 1.0, H)
    xs = jnp.linspace(0.0, w - 1.0, W)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    y0, y1 = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0, x1 = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class AffineNorm(nn.Module):
    """Eval-mode BatchNorm: per-channel scale + bias (folded at conversion
    from gamma/beta/running stats; reference uses nn.BatchNorm2d)."""

    ch: int

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, (self.ch,))
        b = self.param("bias", nn.initializers.zeros, (self.ch,))
        return x * s + b


class DeformConv(nn.Module):
    """torchvision deform_conv2d with a learned offset conv
    (reference `DeformableConv2d`, aliked.py:272-331). stride 1, SAME pad."""

    out_ch: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        K = self.ksize
        pad = K // 2
        off = nn.Conv(2 * K * K, (K, K), padding=pad, use_bias=True, name="offset_conv")(x)
        max_off = max(H, W) / 4.0
        off = jnp.clip(off, -max_off, max_off)
        off = off.reshape(B, H, W, K * K, 2)  # (dy, dx) per tap, tap-major

        d = jnp.arange(K, dtype=x.dtype) - pad
        ty, tx = jnp.meshgrid(d, d, indexing="ij")  # row-major taps
        taps = jnp.stack([ty.ravel(), tx.ravel()], -1)  # (K*K, 2) as (y, x)

        ys, xs = jnp.meshgrid(
            jnp.arange(H, dtype=x.dtype), jnp.arange(W, dtype=x.dtype), indexing="ij"
        )
        py = ys[None, :, :, None] + taps[None, None, None, :, 0] + off[..., 0]
        px = xs[None, :, :, None] + taps[None, None, None, :, 1] + off[..., 1]
        samples = bilinear_zero(
            x, px.reshape(B, -1), py.reshape(B, -1)
        ).reshape(B, H, W, K * K * C)
        # regular conv weights applied to the deformed samples: (K*K*Cin, Cout)
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (K * K * C, self.out_ch),
        )
        return samples @ w


def conv3x3(ch, name, bias=False):
    return nn.Conv(ch, (3, 3), padding=1, use_bias=bias, name=name)


def conv1x1(ch, name, bias=False):
    return nn.Conv(ch, (1, 1), use_bias=bias, name=name)


class ConvBlock(nn.Module):
    """conv-bn-selu x2 (reference ConvBlock, aliked.py:367-398)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.selu(AffineNorm(self.out_ch, name="bn1")(conv3x3(self.out_ch, "conv1")(x)))
        x = nn.selu(AffineNorm(self.out_ch, name="bn2")(conv3x3(self.out_ch, "conv2")(x)))
        return x


class ResBlock(nn.Module):
    """Residual block with optional deformable convs
    (reference ResBlock, aliked.py:400-457)."""

    out_ch: int
    dcn: bool = False

    @nn.compact
    def __call__(self, x):
        mk = (lambda name: DeformConv(self.out_ch, name=name)) if self.dcn else (
            lambda name: conv3x3(self.out_ch, name)
        )
        out = mk("conv1")(x)
        out = nn.selu(AffineNorm(self.out_ch, name="bn1")(out))
        out = mk("conv2")(out)
        out = AffineNorm(self.out_ch, name="bn2")(out)
        identity = conv1x1(self.out_ch, "downsample", bias=True)(x)
        return nn.selu(out + identity)


class SDDH(nn.Module):
    """Deformable descriptor head (reference SDDH, aliked.py:460-592),
    batched over all fixed-K keypoints."""

    dim: int
    ksize: int = 3
    n_pos: int = 16

    @nn.compact
    def __call__(self, fmap, kpts, valid):
        # fmap: (B, H, W, C); kpts: (B, K, 2) pixel (x, y); valid: (B, K)
        B, H, W, C = fmap.shape
        Kk = kpts.shape[1]
        ps = self.ksize
        max_off = max(H, W) / 4.0

        # integer 3x3 patches, corner-clamped (reference get_patches,
        # aliked.py:29-47: corner = (kpt - ps/2 + 1).long(), clamped)
        kxi = kpts[..., 0].astype(jnp.int32)
        kyi = kpts[..., 1].astype(jnp.int32)
        cx = jnp.clip(kxi - (ps - 1) // 2, 0, W - 1 - ps)
        cy = jnp.clip(kyi - (ps - 1) // 2, 0, H - 1 - ps)
        oy, ox = jnp.meshgrid(jnp.arange(ps), jnp.arange(ps), indexing="ij")
        yy = cy[..., None] + oy.ravel()[None, None]  # (B, K, ps*ps)
        xx = cx[..., None] + ox.ravel()[None, None]
        flat = fmap.reshape(B, H * W, C)
        patch = jnp.take_along_axis(
            flat, (yy * W + xx).reshape(B, -1)[..., None], axis=1
        ).reshape(B, Kk, ps, ps, C)

        # offset head: valid 3x3 conv (patch -> 1x1) then 1x1 conv
        w0 = self.param(
            "offset_conv0", nn.initializers.lecun_normal(), (ps * ps * C, 2 * self.n_pos)
        )
        b0 = self.param("offset_bias0", nn.initializers.zeros, (2 * self.n_pos,))
        h0 = nn.selu(patch.reshape(B, Kk, -1) @ w0 + b0)
        w1 = self.param(
            "offset_conv1", nn.initializers.lecun_normal(), (2 * self.n_pos, 2 * self.n_pos)
        )
        b1 = self.param("offset_bias1", nn.initializers.zeros, (2 * self.n_pos,))
        off = jnp.clip(h0 @ w1 + b1, -max_off, max_off)  # (B, K, 2*M)
        # reference layout: view(N, 2, M) -> (x offsets, y offsets)
        off = off.reshape(B, Kk, 2, self.n_pos)

        # sample positions; the reference works from the integer keypoint
        # (kptsi_wh.long() feeds get_patches but pos uses float kptsi_wh)
        pos_x = kpts[..., 0:1] + off[:, :, 0, :]  # (B, K, M)
        pos_y = kpts[..., 1:2] + off[:, :, 1, :]
        feats = bilinear_zero(
            fmap, pos_x.reshape(B, -1), pos_y.reshape(B, -1)
        ).reshape(B, Kk, self.n_pos, C)

        sf = self.param("sf_conv", nn.initializers.lecun_normal(), (C, C))
        feats = nn.selu(feats @ sf)  # (B, K, M, C)
        agg = self.param(
            "agg_weights", nn.initializers.normal(0.1), (self.n_pos, C, C)
        )
        desc = jnp.einsum("bkpc,pcd->bkd", feats, agg)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return jnp.where(valid[..., None], desc, 0.0)


class ALIKED(BaseModel):
    default_conf = {
        "model_name": "aliked-n16",
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0002,
        "nms_radius": 2,
        "weights": None,  # path to a converted official checkpoint
    }
    required_data_keys = ("image",)

    def setup(self):
        cfg = CFGS[self.conf.model_name]
        c1, c2, c3, c4 = cfg["c1"], cfg["c2"], cfg["c3"], cfg["c4"]
        dim = cfg["dim"]
        self.dim = dim
        self.block1 = ConvBlock(c1, name="block1")
        self.block2 = ResBlock(c2, name="block2")
        self.block3 = ResBlock(c3, dcn=True, name="block3")
        self.block4 = ResBlock(c4, dcn=True, name="block4")
        self.conv1 = conv1x1(dim // 4, "conv1")
        self.conv2 = conv1x1(dim // 4, "conv2")
        self.conv3 = conv1x1(dim // 4, "conv3")
        self.conv4 = conv1x1(dim // 4, "conv4")
        self.score0 = conv1x1(8, "score0")
        self.score1 = conv3x3(4, "score1")
        self.score2 = conv3x3(4, "score2")
        self.score3 = conv3x3(1, "score3")
        self.desc_head = SDDH(dim, cfg["K"], cfg["M"], name="desc_head")

    def extract_dense_map(self, image):
        """Backbone + aggregation (reference `extract_dense_map`,
        aliked.py:737-768). Inputs must be 32-divisible (fixed shapes)."""
        x1 = self.block1(image)
        x2 = self.block2(nn.avg_pool(x1, (2, 2), strides=(2, 2)))
        x3 = self.block3(nn.avg_pool(x2, (4, 4), strides=(4, 4)))
        x4 = self.block4(nn.avg_pool(x3, (4, 4), strides=(4, 4)))
        B, H, W, _ = x1.shape
        x1 = nn.selu(self.conv1(x1))
        x2 = nn.selu(self.conv2(x2))
        x3 = nn.selu(self.conv3(x3))
        x4 = nn.selu(self.conv4(x4))
        x1234 = jnp.concatenate(
            [
                x1,
                upsample_align_corners(x2, H, W),
                upsample_align_corners(x3, H, W),
                upsample_align_corners(x4, H, W),
            ],
            axis=-1,
        )
        s = nn.selu(self.score0(x1234))
        s = nn.selu(self.score1(s))
        s = nn.selu(self.score2(s))
        score_map = jax.nn.sigmoid(self.score3(s))[..., 0]  # (B, H, W)
        feature_map = x1234 / jnp.maximum(
            jnp.linalg.norm(x1234, axis=-1, keepdims=True), 1e-12
        )
        return feature_map, score_map

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, axis=-1)
        B, H, W, _ = image.shape
        feature_map, score_map = self.extract_dense_map(image)

        # --- DKD, fixed-K (reference aliked.py:108-244) ---
        r = self.conf.nms_radius
        nms = simple_nms(score_map, r)
        nms = remove_borders(nms, r)
        if "image_size" in data:
            size = data["image_size"]  # (B, 2) true (w, h)
            ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
            inside = (xs[None] < size[:, 0, None, None] - r) & (
                ys[None] < size[:, 1, None, None] - r
            )
            nms = jnp.where(inside, nms, 0.0)
        kpts, _, valid = top_k_keypoints(
            nms, self.conf.max_num_keypoints, self.conf.detection_threshold,
            nms_radius=r,
        )

        # sub-pixel softargmax on (2r+1)^2 score patches, T=0.1
        ksz = 2 * r + 1
        oy, ox = jnp.meshgrid(
            jnp.arange(-r, r + 1, dtype=jnp.float32),
            jnp.arange(-r, r + 1, dtype=jnp.float32),
            indexing="ij",
        )
        kxi = kpts[..., 0].astype(jnp.int32)
        kyi = kpts[..., 1].astype(jnp.int32)
        yy = jnp.clip(kyi[..., None] + oy.ravel().astype(jnp.int32)[None, None], 0, H - 1)
        xx = jnp.clip(kxi[..., None] + ox.ravel().astype(jnp.int32)[None, None], 0, W - 1)
        flat_s = score_map.reshape(B, H * W)
        patch = jnp.take_along_axis(
            flat_s, (yy * W + xx).reshape(B, -1), axis=1
        ).reshape(B, -1, ksz * ksz)
        mx = jax.lax.stop_gradient(jnp.max(patch, axis=-1, keepdims=True))
        xexp = jnp.exp((patch - mx) / 0.1)
        denom = jnp.sum(xexp, axis=-1, keepdims=True)
        grid = jnp.stack([ox.ravel(), oy.ravel()], -1)  # (k2, 2) as (x, y)
        resid = (xexp @ grid) / denom  # (B, K, 2)
        dist2 = jnp.sum(
            ((grid[None, None] - resid[:, :, None, :]) / r) ** 2, axis=-1
        )
        dispersity = jnp.sum(xexp * dist2, axis=-1) / denom[..., 0]
        kpts_xy = kpts + resid
        kp_scores = bilinear_zero(
            score_map[..., None], kpts_xy[..., 0], kpts_xy[..., 1]
        )[..., 0]
        kp_scores = jnp.where(valid, kp_scores, 0.0)

        if "image_size" in data:
            inside = jnp.all(kpts_xy < data["image_size"][:, None, :], axis=-1)
            inside &= jnp.all(kpts_xy >= 0, axis=-1)
            valid = valid & inside
            kp_scores = jnp.where(valid, kp_scores, 0.0)
        if "specular_mask" in data:
            from .utils import filter_keypoints_by_specular_mask

            valid = filter_keypoints_by_specular_mask(
                kpts_xy, valid, data["specular_mask"]
            )
            kp_scores = jnp.where(valid, kp_scores, 0.0)

        desc = self.desc_head(feature_map, kpts_xy, valid)
        return {
            "keypoints": kpts_xy,
            "keypoint_scores": kp_scores,
            "descriptors": desc,
            "keypoint_valid": valid,
            "score_dispersity": jnp.where(valid, dispersity, 0.0),
        }

    def loss(self, pred, data):
        raise NotImplementedError("ALIKED is used frozen (official weights)")
