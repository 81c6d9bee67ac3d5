"""Detector-free dense matcher of the LoFTR family, TPU-native.

Reference surface: `gluefactory/models/matchers/kornia_loftr.py:7-60` — the
reference wraps kornia's pretrained LoFTR (Sun et al., CVPR 2021) and exposes
`view0/view1 -> aligned keypoints0/keypoints1/matching_scores0`. kornia does
not exist in this environment, so this is a from-scratch implementation of
the same design, built for TPU:

  - ResNet-FPN backbone producing 1/8 coarse and 1/2 fine feature grids —
    large batched convs, bf16-friendly, all MXU work.
  - Alternating self/cross *linear* attention (elu(x)+1 kernel) over the
    flattened coarse grids: O(N D^2) instead of O(N^2 D), which turns the
    4800-token coarse stage into a handful of dense matmuls. Layers are
    nn.scan-stacked like our LightGlue (one compile for L layers).
  - Dual-softmax coarse matching with mutual-nearest selection, then a
    fixed-K top-confidence subset (static shapes end-to-end; no boolean
    indexing, jit/pjit-safe).
  - Fine refinement by correlation-expectation: a fine window around each
    coarse match in view1 is scored against the center descriptor of view0
    and the softargmax of the heatmap gives the subpixel offset
    (LoFTR's "expectation" variant).

Unlike the reference wrapper (inference-only), this module is trainable:
`loss()` supervises the coarse dual-softmax matrix with focal NLL against
GT built by warping coarse grid centers (homography `H_0to1`, or
depth+pose when available), plus an L2 fine-offset term — so the dense
matcher trains from scratch in this framework (no kornia weights exist
here; see COVERAGE.md).

Output contract matches the reference wrapper: aligned keypoint lists with
`matches0 = arange` plus our fixed-K `valid` masks.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geometry.homography import warp_points
from ..base_model import BaseModel

__main_class__ = "LoFTR"


# ---------------------------------------------------------------- backbone


def _n_groups(ch: int) -> int:
    g = min(8, ch)
    while ch % g:
        g -= 1
    return g


def _dt(dtype: str):
    return jnp.bfloat16 if dtype == "bfloat16" else jnp.float32


class ResBlock(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = _dt(self.dtype)
        y = nn.Conv(self.out_ch, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=dt, name="c0")(x)
        y = nn.GroupNorm(num_groups=_n_groups(self.out_ch), dtype=dt,
                         name="n0")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False,
                    dtype=dt, name="c1")(y)
        y = nn.GroupNorm(num_groups=_n_groups(self.out_ch), dtype=dt,
                         name="n1")(y)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=dt, name="proj")(x)
            x = nn.GroupNorm(num_groups=_n_groups(self.out_ch), dtype=dt,
                             name="nproj")(x)
        return nn.relu(x + y)


class ResNetFPN(nn.Module):
    """Strides 2/4/8 encoder + top-down FPN; returns (coarse 1/8, fine 1/2)."""

    dims: tuple = (64, 96, 128)  # at strides 2, 4, 8
    coarse_dim: int = 256
    fine_dim: int = 128
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        d1, d2, d3 = self.dims
        dt = _dt(self.dtype)
        x = x.astype(dt)
        # stem: stride 2
        x = nn.Conv(d1, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=dt, name="stem")(x)
        x = nn.GroupNorm(num_groups=_n_groups(d1), dtype=dt, name="stem_n")(x)
        x = nn.relu(x)
        blk = lambda ch, st, nm: ResBlock(ch, st, self.dtype, name=nm)
        f2 = blk(d1, 1, "l1b")(blk(d1, 1, "l1a")(x))      # 1/2
        f4 = blk(d2, 1, "l2b")(blk(d2, 2, "l2a")(f2))     # 1/4
        f8 = blk(d3, 1, "l3b")(blk(d3, 2, "l3a")(f4))     # 1/8

        coarse = nn.Conv(self.coarse_dim, (1, 1), dtype=dt, name="out8")(f8)
        # top-down: 1/8 -> 1/4 -> 1/2 with lateral fusion
        up4 = jax.image.resize(
            coarse, (*f4.shape[:3], self.coarse_dim), "bilinear")
        lat4 = nn.Conv(self.coarse_dim, (1, 1), dtype=dt, name="lat4")(f4)
        m4 = nn.Conv(self.fine_dim, (3, 3), padding="SAME", dtype=dt,
                     name="m4")(nn.relu(up4 + lat4))
        up2 = jax.image.resize(m4, (*f2.shape[:3], self.fine_dim), "bilinear")
        lat2 = nn.Conv(self.fine_dim, (1, 1), dtype=dt, name="lat2")(f2)
        fine = nn.Conv(self.fine_dim, (3, 3), padding="SAME", dtype=dt,
                       name="m2")(nn.relu(up2 + lat2))
        return coarse, fine


# ----------------------------------------------------- linear attention core


def _elu_feature(x):
    return nn.elu(x) + 1.0


def linear_attention(q, k, v, kv_valid):
    """Kernelized attention: softmax -> elu(.)+1 feature map.

    q/k/v: (B, N, H, D); kv_valid: (B, M) mask of valid source tokens.
    Cost O(N H D^2): two einsums that are pure MXU work at any N.
    Sums over the (long) token axis accumulate in f32 regardless of the
    compute dtype (bf16 running sums over 4800 tokens drift).
    """
    dt = q.dtype
    q = _elu_feature(q)
    k = _elu_feature(k)
    k = k * kv_valid[:, :, None, None].astype(k.dtype)
    v = v * kv_valid[:, :, None, None].astype(v.dtype)
    # explicit f32 operands instead of mixed bf16->f32 dots: XLA:CPU cannot
    # execute a BF16xBF16=F32 DotThunk (hit under matmul precision=highest),
    # and these contractions are tiny (D=32) next to the projections
    kv = jnp.einsum(
        "bmhd,bmhe->bhde",
        k.astype(jnp.float32), v.astype(jnp.float32))
    ksum = jnp.sum(k.astype(jnp.float32), axis=1)  # (B,H,D)
    z = 1.0 / jnp.maximum(
        jnp.einsum("bnhd,bhd->bnh", q.astype(jnp.float32), ksum), 1e-6)
    out = jnp.einsum("bnhd,bhde->bnhe", q.astype(jnp.float32), kv)
    return (out * z[..., None]).astype(dt)


class _KParams(nn.Module):
    """Bias-free Dense kernel at the same param path as
    `nn.Dense(use_bias=False, name=...)` — lets the fused-QKV path share
    checkpoints with the unfused one (params/<name>/kernel)."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (self.din, self.dout))


class LoFTRLayer(nn.Module):
    """One encoder layer: attention (self or cross per call) + MLP merge."""

    dim: int
    heads: int
    dtype: str = "float32"
    # One concatenated projection matmul instead of three skinny ones (q/k/v
    # share the source when self-attending; k/v always share it). Bit-exact:
    # concatenating kernel COLUMNS changes neither any dot product nor its
    # reduction order. Param tree unchanged (see _KParams).
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, source, src_valid):
        B, N, C = x.shape
        dt = _dt(self.dtype)
        h, dh = self.heads, self.dim // self.heads
        is_self = x is source
        x = x.astype(dt)
        source = x if is_self else source.astype(dt)
        M = source.shape[1]
        if self.fused_qkv:
            Wq = _KParams(C, self.dim, name="q")().astype(dt)
            Wk = _KParams(C, self.dim, name="k")().astype(dt)
            Wv = _KParams(C, self.dim, name="v")().astype(dt)
            if is_self:
                qkv = x @ jnp.concatenate([Wq, Wk, Wv], axis=1)
                q = qkv[..., : self.dim].reshape(B, N, h, dh)
                k = qkv[..., self.dim: 2 * self.dim].reshape(B, M, h, dh)
                v = qkv[..., 2 * self.dim:].reshape(B, M, h, dh)
            else:
                q = (x @ Wq).reshape(B, N, h, dh)
                kv = source @ jnp.concatenate([Wk, Wv], axis=1)
                k = kv[..., : self.dim].reshape(B, M, h, dh)
                v = kv[..., self.dim:].reshape(B, M, h, dh)
        else:
            q = nn.Dense(self.dim, use_bias=False, dtype=dt, name="q")(
                x).reshape(B, N, h, dh)
            k = nn.Dense(self.dim, use_bias=False, dtype=dt, name="k")(
                source).reshape(B, M, h, dh)
            v = nn.Dense(self.dim, use_bias=False, dtype=dt, name="v")(
                source).reshape(B, M, h, dh)
        msg = linear_attention(q, k, v, src_valid).reshape(B, N, C)
        msg = nn.Dense(self.dim, use_bias=False, dtype=dt, name="merge")(msg)
        msg = nn.LayerNorm(dtype=dt, name="ln0")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(self.dim * 2, use_bias=False, dtype=dt, name="mlp0")(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim, use_bias=False, dtype=dt, name="mlp1")(y)
        y = nn.LayerNorm(dtype=dt, name="ln1")(y)
        return x + y


class CoarseBlock(nn.Module):
    """Self + cross attention for both views; scan-stacked over depth."""

    dim: int
    heads: int
    dtype: str = "float32"
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x0, x1, v0, v1 = carry
        self_att = LoFTRLayer(
            self.dim, self.heads, self.dtype, self.fused_qkv, name="self")
        cross_att = LoFTRLayer(
            self.dim, self.heads, self.dtype, self.fused_qkv, name="cross")
        # same-parameter layer applied to both views (official LoFTR shares)
        x0 = self_att(x0, x0, v0)
        x1 = self_att(x1, x1, v1)
        y0 = cross_att(x0, x1, v1)
        y1 = cross_att(x1, x0, v0)
        return (y0, y1, v0, v1), None


class StackedCoarseBlock(nn.Module):
    """CoarseBlock on both views stacked along batch: z = [x0; x1] (2B, N, C).

    Exact: every op in LoFTRLayer/linear_attention is independent per batch
    element, so self-attention batches trivially and cross-attention's source
    is `roll(z, B)` = [x1; x0]. Halves the dispatch count and doubles the
    MXU tile occupancy of every projection at small B. Same param tree as
    CoarseBlock (children "self"/"cross"), so the flag is runtime-switchable
    on one checkpoint (tested: tests/test_loftr.py)."""

    dim: int
    heads: int
    dtype: str = "float32"
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, carry, _):
        z, v = carry
        B2 = z.shape[0]
        self_att = LoFTRLayer(
            self.dim, self.heads, self.dtype, self.fused_qkv, name="self")
        cross_att = LoFTRLayer(
            self.dim, self.heads, self.dtype, self.fused_qkv, name="cross")
        z = self_att(z, z, v)
        zs = jnp.roll(z, B2 // 2, axis=0)
        vs = jnp.roll(v, B2 // 2, axis=0)
        z = cross_att(z, zs, vs)
        return (z, v), None


def sine_pos_encoding(h, w, dim):
    """2D sinusoidal encoding, (h*w, dim); LoFTR-style channel split."""
    d4 = dim // 4
    ys, xs = jnp.mgrid[:h, :w].astype(jnp.float32)
    freqs = jnp.exp(
        jnp.arange(d4, dtype=jnp.float32) * (-jnp.log(10000.0) / max(d4 - 1, 1))
    )
    xe = xs[..., None] * freqs
    ye = ys[..., None] * freqs
    enc = jnp.concatenate(
        [jnp.sin(xe), jnp.cos(xe), jnp.sin(ye), jnp.cos(ye)], axis=-1)
    return enc.reshape(h * w, enc.shape[-1])


def coarse_select(sim):
    """Mutual-NN selection of the dual-softmax with fewer full-matrix passes.

    log P[n, m] = 2 sim[n, m] - lse1[m] - lse2[n] (lse = logsumexp over
    axis 1 / 2), and exp is monotone, so every argmax/max of P is an
    argmax/max of fused reductions directly over `sim`. The old path
    (P = softmax1 * softmax2, then argmax/max/argmax over the full
    (B, N, M) f32 matrix) cost ~7 HBM passes of N*M*4 bytes — 54 of the
    115 ms LoFTR batch at B=8 (scripts/bench_loftr_stages.py). The `A`
    temporaries below are still (B, N, M) unless XLA fuses them into the
    reductions; the guaranteed win is fewer HBM passes, not zero
    materialization. Returns
    (j_best (B,N), i_best (B,M), conf (B,N) = row max of P); exactness vs
    the P path: tests/test_loftr.py::test_log_space_selection.
    """
    lse1 = jax.scipy.special.logsumexp(sim, axis=1)  # (B, M)
    lse2 = jax.scipy.special.logsumexp(sim, axis=2)  # (B, N)
    A = 2.0 * sim - lse1[:, None, :]
    j_best = jnp.argmax(A, axis=2)                   # (B, N)
    conf = jnp.exp(jnp.max(A, axis=2) - lse2)        # (B, N)
    i_best = jnp.argmax(2.0 * sim - lse2[:, :, None], axis=1)  # (B, M)
    return j_best, i_best, conf


# ------------------------------------------------------------------- model


class LoFTR(BaseModel):
    default_conf = {
        "coarse_dim": 256,
        "fine_dim": 128,
        "backbone_dims": [64, 96, 128],
        # All three stacking/fusion switches are EXACT rearrangements, kept
        # as tested options but OFF: two independent on-chip A/B processes
        # (scripts/bench_ab_loftr.py, v5e 640x480 B=2) measured f32 all-off
        # fastest — stacked backbone -3..-5%, fused_qkv -3%, stack_coarse
        # ~neutral, bf16 -11% (like s2d/w2d for SuperPoint, isolated-op
        # reasoning does not transfer; XLA fuses the direct forms better).
        "dtype": "float32",       # compute dtype; params stay f32
        "stack_backbone": False,  # one 2B-batch backbone pass (exact)
        "stack_coarse": False,    # both views stacked through the coarse
                                  # transformer (exact; StackedCoarseBlock)
        "fused_qkv": False,       # one concatenated q/k/v projection matmul
        "n_layers": 4,           # coarse self+cross blocks
        "heads": 8,
        "temperature": 0.1,      # dual-softmax temperature
        "fine_window": 5,        # fine correlation window (odd)
        "max_num_matches": 1024,  # fixed-K output (static shapes)
        "conf_threshold": 0.2,   # coarse confidence filter
        "log_space_select": True,  # fused-reduction mutual-NN selection
                                   # (False = materialize P, the pre-r4
                                   # path, kept for the perf A/B; exact
                                   # equivalence: test_log_space_selection)
        "loss": {
            "focal_gamma": 2.0,
            "fine_weight": 1.0,
            "coarse_px_thresh": 8.0,  # GT cell association radius (px)
        },
    }
    required_data_keys = ("view0", "view1")

    def setup(self):
        c = self.conf
        self.backbone = ResNetFPN(
            tuple(c.backbone_dims), c.coarse_dim, c.fine_dim, c.dtype,
            name="backbone")
        Block = nn.scan(
            StackedCoarseBlock if c.stack_coarse else CoarseBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.n_layers,
        )
        self.coarse = Block(
            c.coarse_dim, c.heads, c.dtype, c.fused_qkv, name="coarse")
        self.fine_proj = nn.Dense(
            c.fine_dim, use_bias=False, dtype=_dt(c.dtype), name="fine_proj")

    # -- helpers -----------------------------------------------------------

    def _coarse_features(self, data):
        """Run backbone+transformer on both views; returns feats and grids."""
        im0 = data["view0"]["image"]
        im1 = data["view1"]["image"]
        if im0.shape[-1] == 1:
            im0 = jnp.repeat(im0, 3, axis=-1)
            im1 = jnp.repeat(im1, 3, axis=-1)
        if im0.shape == im1.shape and self.conf.stack_backbone:
            # one 2B-batch backbone pass (identical math; the B=2 bench
            # batches underfill the MXU per-view)
            cs, fs = self.backbone(jnp.concatenate([im0, im1], axis=0))
            B = im0.shape[0]
            c0, c1 = cs[:B], cs[B:]
            f0, f1 = fs[:B], fs[B:]
        else:
            c0, f0 = self.backbone(im0)
            c1, f1 = self.backbone(im1)
        B, Hc, Wc, C = c0.shape
        pe = sine_pos_encoding(Hc, Wc, C).astype(c0.dtype)
        x0 = c0.reshape(B, Hc * Wc, C) + pe[None]
        Hc1, Wc1 = c1.shape[1:3]
        pe1 = sine_pos_encoding(Hc1, Wc1, C).astype(c1.dtype)
        x1 = c1.reshape(B, Hc1 * Wc1, C) + pe1[None]
        v0 = jnp.ones(x0.shape[:2], bool)
        v1 = jnp.ones(x1.shape[:2], bool)
        if self.conf.stack_coarse:
            # unequal grids: pad the token axes to a common length. Exact —
            # linear_attention zeroes padded KEYS via the valid mask, and
            # padded QUERY rows are sliced off below before any use.
            N0, N1 = x0.shape[1], x1.shape[1]
            Nm = max(N0, N1)
            x0p = jnp.pad(x0, ((0, 0), (0, Nm - N0), (0, 0)))
            x1p = jnp.pad(x1, ((0, 0), (0, Nm - N1), (0, 0)))
            v0p = jnp.pad(v0, ((0, 0), (0, Nm - N0)))
            v1p = jnp.pad(v1, ((0, 0), (0, Nm - N1)))
            z = jnp.concatenate([x0p, x1p], axis=0)
            v = jnp.concatenate([v0p, v1p], axis=0)
            (z, _), _ = self.coarse((z, v), None)
            x0, x1 = z[:B, :N0], z[B:, :N1]
        else:
            (x0, x1, _, _), _ = self.coarse((x0, x1, v0, v1), None)
        return x0, x1, f0, f1, (Hc, Wc), (Hc1, Wc1)

    def _similarity(self, x0, x1):
        c = self.conf
        x0, x1 = x0.astype(jnp.float32), x1.astype(jnp.float32)
        x0 = x0 / jnp.maximum(jnp.linalg.norm(x0, axis=-1, keepdims=True), 1e-6)
        x1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True), 1e-6)
        return jnp.einsum(
            "bnc,bmc->bnm", x0, x1,
            preferred_element_type=jnp.float32) / c.temperature

    def _dual_softmax(self, x0, x1):
        sim = self._similarity(x0, x1)
        return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)

    def _gather_windows(self, fmap, centers, w):
        """All w*w bilinear taps at integer offsets around `centers` from ONE
        (w+1)x(w+1) integer-patch gather: every tap shares the centers'
        fractional part, so the 4 bilinear corners of tap (dy, dx) are patch
        entries (dy..dy+1, dx..dx+1). (w+1)^2 gathers instead of 4*w*w —
        2.8x fewer at w=5 (the gather-bound half of the fine stage). Values
        identical to per-tap `bilinear_gather` for every window that is
        fully inside the map; taps hanging off the TOP/LEFT border use true
        edge-clamp (both corners pinned to index 0) where bilinear_gather
        blends rows/cols 0 and 1 — the standard clamp semantics
        (tests/test_loftr.py::test_fine_window_gather_exact).

        fmap: (B, H, W, C); centers: (B, K, 2) xy. Returns (B, K, w*w, C).
        """
        B, H, W, C = fmap.shape
        K = centers.shape[1]
        r = w // 2
        x, y = centers[..., 0], centers[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(fmap.dtype)[..., None]  # (B, K, 1)
        wy = (y - y0).astype(fmap.dtype)[..., None]
        # integer patch coords, clipped per tap (edge-clamp semantics)
        d = jnp.arange(-r, r + 2)  # w+1 values
        xi = jnp.clip(x0.astype(jnp.int32)[..., None] + d, 0, W - 1)  # (B,K,w+1)
        yi = jnp.clip(y0.astype(jnp.int32)[..., None] + d, 0, H - 1)
        idx = (yi[:, :, :, None] * W + xi[:, :, None, :]).reshape(
            B, K * (w + 1) * (w + 1))
        patch = jnp.take_along_axis(
            fmap.reshape(B, H * W, C), idx[..., None], axis=1
        ).reshape(B, K, w + 1, w + 1, C)
        out = (
            patch[:, :, :w, :w] * ((1 - wx) * (1 - wy))[..., None, :, None]
            + patch[:, :, :w, 1:] * (wx * (1 - wy))[..., None, :, None]
            + patch[:, :, 1:, :w] * ((1 - wx) * wy)[..., None, :, None]
            + patch[:, :, 1:, 1:] * (wx * wy)[..., None, :, None]
        )
        return out.reshape(B, K, w * w, C)

    def _fine_refine(self, f0, f1, pts0, pts1, stride_f=2):
        """Correlation-expectation refinement of pts1. pts*: (B, K, 2) px."""
        from ..extractors.aliked import bilinear_gather

        c = self.conf
        w = c.fine_window
        r = w // 2
        # image pixel-index coords -> fine-map index coords (keypoints.py:177)
        g0 = (pts0 + 0.5) / stride_f - 0.5
        g1 = (pts1 + 0.5) / stride_f - 0.5
        d0 = self.fine_proj(bilinear_gather(f0, g0))  # (B,K,D)
        # fine window around pts1: offsets in fine-grid units
        dy, dx = jnp.mgrid[-r:r + 1, -r:r + 1].astype(f1.dtype)
        offs = jnp.stack([dx, dy], -1).reshape(-1, 2)  # (w*w, 2), xy
        B, K = pts1.shape[:2]
        d1 = self.fine_proj(self._gather_windows(f1, g1, w))  # (B,K,w2,D)
        d0, d1 = d0.astype(jnp.float32), d1.astype(jnp.float32)
        d0 = d0 / jnp.maximum(jnp.linalg.norm(d0, axis=-1, keepdims=True), 1e-6)
        d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-6)
        heat = jax.nn.softmax(
            jnp.einsum("bkd,bkwd->bkw", d0, d1) * (d0.shape[-1] ** 0.5),
            axis=-1)
        delta = jnp.einsum("bkw,wt->bkt", heat, offs) * stride_f  # px
        return pts1 + delta, heat

    # -- forward -----------------------------------------------------------

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        x0, x1, f0, f1, (Hc, Wc), (Hc1, Wc1) = self._coarse_features(data)
        sim = self._similarity(x0, x1)  # (B, N, M)
        B, N, M = sim.shape

        # mutual-nearest + threshold via fused log-space reductions (or the
        # pre-r4 explicit-P path when log_space_select is off)
        if c.log_space_select:
            j_best, i_best, conf = coarse_select(sim)
        else:
            P = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
            j_best = jnp.argmax(P, axis=2)
            conf = jnp.max(P, axis=2)
            i_best = jnp.argmax(P, axis=1)
        mutual = jnp.take_along_axis(i_best, j_best, axis=1) == jnp.arange(N)[None]
        ok = mutual & (conf > c.conf_threshold)
        score = jnp.where(ok, conf, 0.0)

        # fixed-K top matches by confidence (static shapes)
        K = min(c.max_num_matches, N)
        top_score, top_i = jax.lax.top_k(score, K)            # (B, K)
        top_j = jnp.take_along_axis(j_best, top_i, axis=1)
        valid = top_score > 0.0

        # coarse cell centers in pixel-index coords: (i + 0.5) * s - 0.5
        stride = 8  # coarse grid stride in input pixels
        pts0 = jnp.stack(
            [(top_i % Wc) + 0.5, (top_i // Wc) + 0.5], -1) * stride - 0.5
        pts1 = jnp.stack(
            [(top_j % Wc1) + 0.5, (top_j // Wc1) + 0.5], -1) * stride - 0.5
        pts1_ref, _ = self._fine_refine(f0, f1, pts0, pts1)
        pts1_ref = jnp.where(valid[..., None], pts1_ref, 0.0)
        pts0 = jnp.where(valid[..., None], pts0, 0.0)

        arange = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
        m = jnp.where(valid, arange, -1)
        pred = {
            "keypoints0": pts0,
            "keypoints1": pts1_ref,
            "keypoint_scores0": top_score,
            "keypoint_scores1": top_score,
            "keypoint_valid0": valid,
            "keypoint_valid1": valid,
            "matches0": m,
            "matches1": m,
            "matching_scores0": top_score,
            "matching_scores1": top_score,
        }
        if train:
            # the full probability matrix is only ever needed by the loss
            pred["coarse_matrix"] = jax.nn.softmax(
                sim, axis=1) * jax.nn.softmax(sim, axis=2)
            # GT runs in-forward (the framework's run_gt_in_forward pattern)
            # so the fine stage can be TEACHER-FORCED on GT coarse matches:
            # model-selected matches are never cell-correct at random init,
            # which would starve the fine branch of gradients from scratch
            # (official LoFTR supervises fine on GT coarse matches too).
            j_gt, warped, matched = self._gt_coarse(data, Hc, Wc, Hc1, Wc1)
            tf_flag, tf_i = jax.lax.top_k(matched.astype(jnp.float32), K)
            tf_valid = tf_flag > 0
            tf_pts0 = jnp.stack(
                [(tf_i % Wc) + 0.5, (tf_i // Wc) + 0.5], -1) * stride - 0.5
            tf_gt = jnp.take_along_axis(
                warped, tf_i[..., None].repeat(2, -1), axis=1)
            tf_cell = ((tf_gt + 0.5) / stride - 0.5).round()
            tf_cell = jnp.clip(tf_cell, 0, jnp.asarray(
                [Wc1 - 1, Hc1 - 1], tf_cell.dtype))
            tf_pts1 = (tf_cell + 0.5) * stride - 0.5
            tf_ref, _ = self._fine_refine(f0, f1, tf_pts0, tf_pts1)
            pred["gt_cell1"] = j_gt
            pred["gt_matched"] = matched
            pred["fine_tf_pts1"] = tf_ref
            pred["fine_tf_gt"] = tf_gt
            pred["fine_tf_valid"] = tf_valid
        return pred

    # -- training ----------------------------------------------------------

    def _gt_coarse(self, data, Hc, Wc, Hc1, Wc1):
        """GT assignment by warping coarse cell centers.

        Uses `H_0to1` when present (homography pipelines); otherwise
        depth+pose via `geometry.depth.project`. Returns (j (B, N) int32
        target cell per view-0 cell with M = unmatched sentinel,
        warped (B, N, 2) px, matched (B, N) bool).
        """
        stride = 8
        xs = (jnp.arange(Wc) + 0.5) * stride - 0.5
        ys = (jnp.arange(Hc) + 0.5) * stride - 0.5
        gx, gy = jnp.meshgrid(xs, ys)
        pts = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (N, 2)
        B = data["view0"]["image"].shape[0]
        pts_b = jnp.broadcast_to(pts[None], (B, *pts.shape))

        if "H_0to1" in data:
            warped = warp_points(pts_b, data["H_0to1"], inverse=False)
            vis = jnp.ones(warped.shape[:2], bool)
        else:
            from ...geometry.depth import project, sample_depth_bilinear

            depth0 = data["view0"]["depth"]
            d0, dvalid = sample_depth_bilinear(depth0, pts_b)
            warped, vis = project(
                pts_b, d0, None, data["view0"]["camera"],
                data["view1"]["camera"], data["T_0to1"], dvalid)

        H1px, W1px = Hc1 * stride, Wc1 * stride
        inside = (
            (warped[..., 0] >= 0) & (warped[..., 0] < W1px)
            & (warped[..., 1] >= 0) & (warped[..., 1] < H1px))
        vis = vis & inside
        cell = ((warped + 0.5) / stride - 0.5).round().astype(jnp.int32)
        cx = jnp.clip(cell[..., 0], 0, Wc1 - 1)
        cy = jnp.clip(cell[..., 1], 0, Hc1 - 1)
        j = cy * Wc1 + cx  # (B, N)
        # reprojection distance to the snapped cell center, for the radius
        center = (
            jnp.stack([cx, cy], -1).astype(warped.dtype) + 0.5) * stride - 0.5
        dist = jnp.linalg.norm(warped - center, axis=-1)
        thr = self.conf.loss.coarse_px_thresh
        matched = vis & (dist < thr)
        j = jnp.where(matched, j, Hc1 * Wc1)  # unmatched -> sentinel M
        return j, warped, matched

    def loss(self, pred, data):
        c = self.conf.loss
        P = pred["coarse_matrix"].astype(jnp.float32)  # (B, N, M)
        j_gt = pred["gt_cell1"]                        # (B, N), M = unmatched
        matched = pred["gt_matched"]                   # (B, N)

        # focal NLL on positive cells of the dual-softmax matrix (the GT
        # target probability gathered by index; sentinel hits a zero pad)
        P_pad = jnp.pad(P, ((0, 0), (0, 0), (0, 1)))
        p_pos = jnp.take_along_axis(P_pad, j_gt[..., None], axis=-1)[..., 0]
        p_pos = jnp.clip(p_pos, 1e-6, 1.0 - 1e-6)
        w_pos = (1.0 - p_pos) ** c.focal_gamma
        n_pos = jnp.maximum(matched.sum(-1), 1)
        coarse = (
            jnp.where(matched, -w_pos * jnp.log(p_pos), 0.0).sum(-1) / n_pos)

        # fine loss: L2 between the teacher-forced refinement (GT coarse
        # matches, computed in-forward) and the exact GT warp
        err = jnp.linalg.norm(
            pred["fine_tf_pts1"] - pred["fine_tf_gt"], axis=-1)
        tf_valid = pred["fine_tf_valid"]
        fine = (
            jnp.where(tf_valid, err, 0.0).sum(-1)
            / jnp.maximum(tf_valid.sum(-1), 1))

        total = coarse + c.fine_weight * fine
        metrics = {
            "n_gt_matched": matched.sum(-1).astype(jnp.float32),
            "n_selected": (pred["matches0"] >= 0).sum(-1).astype(jnp.float32),
            "fine_px": fine,
        }
        return {"total": total, "coarse": coarse, "fine": fine}, metrics
