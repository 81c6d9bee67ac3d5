"""Fully-fused LightGlue layer kernels: one Pallas/VMEM pass per block.

The reference evaluates each LightGlue layer as ~10 separate torch ops
(QKV proj, rotary, SDPA, out_proj, concat, FFN, LayerNorm, GELU — hot loop
`gluefactory/models/matchers/lightglue.py:132-215,483-494`). Under XLA the
same chain becomes several fusions with (2B, N, 3D)-sized HBM round trips
between them; at B=8/N=1024 that is ~150 MB of traffic per layer against
~0.35 ms of MXU-bound compute — the measured ~32% MXU utilization
(VERDICT r2 "what's weak" #1) is bandwidth, not FLOPs.

These kernels evaluate one ENTIRE block per grid step with every
intermediate resident in VMEM:

  self block : x -> QKV -> rotary -> masked attention (per head) ->
               folded out_proj+ffn0 -> LayerNorm -> GELU -> ffn1 -> +x
  cross block: (x0, x1) -> QK/V -> ONE shared similarity, both softmax
               directions -> folded FFN tails for both views

HBM traffic per self step: read x (0.5 MB) + weights, write y (0.5 MB) —
~10x less than the XLA chain.

Layout rules (each learned the hard way, see ops/pallas_assignment.py and
ops/pallas_conv.py docstrings):
  - Per-head weight slabs are prepared at trace time as 128-lane-padded
    (H, D, 128) stacks; heads are STATIC leading-dim indices (python loop)
    so no 64-offset lane slicing ever happens inside the kernel.
  - Rotary is algebra, not shuffling: rot(x) = x*cos + (x @ P)*sin with P a
    constant (128, 128) half-split permutation/negation matrix — an MXU
    matmul instead of a forbidden lane gather.
  - All masks are ADDITIVE f32 terms (0 / NEG_INF); masked entries underflow
    to exactly 0 in exp (no broadcast boolean selects, fewer live buffers).
  - Everything stays 2D; reductions keepdims; matmul accumulation f32.

Inference-only: the training path keeps the XLA formulation (gradients via
the per-layer deep supervision). Numerics: matmuls accumulate f32 and cast
to the compute dtype exactly like the XLA path; the FFN tail runs f32 inside
the kernel (vs bf16 ops in the XLA path), so bf16 parity is
rounding-level, f32 parity is ~1e-5 (tests/test_pallas_lg_layer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_axis(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _rot_matrix(head_dim: int, dtype, pair: bool = False) -> jnp.ndarray:
    """(LANE, LANE) matrix P with (x @ P) = [-x2, x1, 0...] for the
    half-split rotary pair layout (`ops/attention.py:apply_cached_rotary_emb`):
    out lane i < F gets -x[F+i]; out lane F+i gets x[i]; padded lanes 0.
    With `pair` (two heads per slab) the same structure repeats at lane
    offset head_dim for the second head."""
    if head_dim > LANE:
        raise ValueError(
            f"fused LightGlue layer kernels require head_dim <= {LANE} "
            f"(got {head_dim}): per-head slabs are {LANE}-lane padded"
        )
    F = head_dim // 2
    P = np.zeros((LANE, LANE), np.float32)
    for sub in range(2 if pair else 1):
        o = sub * head_dim
        for i in range(F):
            P[o + F + i, o + i] = -1.0
            P[o + i, o + F + i] = 1.0
    return jnp.asarray(P, dtype)


def _pack_rotary(enc: jnp.ndarray, head_dim: int, dtype,
                 pair: bool = False) -> jnp.ndarray:
    """enc (B, N, 2, F) with F = head_dim/2 -> (B, N, 2*LANE) bf16/f32:
    [cos|cos|0pad | sin|sin|0pad] duplicated over both rotation halves
    (and over both heads of a slab in `pair` mode — heads share enc)."""
    cos, sin = enc[..., 0, :], enc[..., 1, :]  # (B, N, F)
    rep = 4 if pair else 2
    cosf = _pad_axis(jnp.concatenate([cos] * rep, -1), LANE, -1)
    sinf = _pad_axis(jnp.concatenate([sin] * rep, -1), LANE, -1)
    return jnp.concatenate([cosf, sinf], -1).astype(dtype)


def _pair_slabs(w, b, groups: int):
    """(G*H, D, Dh) per-head slabs -> (G*H/2, D, 2Dh) pair slabs: heads
    (2g, 2g+1) occupy lanes [0, Dh) and [Dh, 2Dh) of slab g, per group
    (q/k/v or qk/v). No padding waste: for Dh=64 the pair fills all 128
    lanes, halving the projection matmuls."""
    GH, D, Dh = w.shape
    H = GH // groups
    w = w.reshape(groups, H // 2, 2, D, Dh).transpose(0, 1, 3, 2, 4)
    w = w.reshape(groups * (H // 2), D, 2 * Dh)
    b = b.reshape(groups, H // 2, 2, 1, Dh).transpose(0, 1, 3, 2, 4)
    b = b.reshape(groups * (H // 2), 1, 2 * Dh)
    return w, b


def _lane_masks(head_dim: int, dtype):
    """Two (1, LANE) masks selecting each head of a pair slab."""
    m = np.zeros((2, 1, LANE), np.float32)
    m[0, 0, :head_dim] = 1.0
    m[1, 0, head_dim : 2 * head_dim] = 1.0
    return jnp.asarray(m, dtype)


def _place_pair_rows(wf, head_dim: int):
    """(H, LANE, 2D) folded-FFN slabs with rows [0, Dh) live -> odd heads
    moved to rows [Dh, 2Dh) so `o_pair @ wf[h]` zeroes the other head's
    lanes of the pair attention output."""
    H = wf.shape[0]
    out = jnp.zeros_like(wf)
    live = wf[:, :head_dim]
    for h in range(H):
        o = (h % 2) * head_dim
        out = out.at[h, o : o + head_dim].set(live[h])
    return out


def _per_head_qkv(kernel, bias, num_heads: int, qkv_layout: str):
    """nn.Dense(3D) params -> per-head 128-padded slabs.

    Returns w (3H, D, LANE) ordered [q_0..q_{H-1}, k_*, v_*] and
    b (3H, 1, LANE). Handles both checkpoint column orders
    (`models/matchers/lightglue.py:SelfBlock.qkv_layout`)."""
    D = kernel.shape[0]
    H = num_heads
    Dh = D // H
    if qkv_layout == "3hd":
        w = kernel.reshape(D, 3, H, Dh).transpose(1, 2, 0, 3)
        b = bias.reshape(3, H, Dh)
    else:  # "dh3": innermost (Dh, 3)
        w = kernel.reshape(D, H, Dh, 3).transpose(3, 1, 0, 2)
        b = bias.reshape(H, Dh, 3).transpose(2, 0, 1)
    return w.reshape(3 * H, D, Dh), b.reshape(3 * H, 1, Dh)


def _per_head_proj(kernel, bias, num_heads: int):
    """nn.Dense(D) params -> (H, D, Dh) / (H, 1, Dh) head slabs, UNPADDED
    (column order h*Dh + d, the reshape(B, N, H, Dh) convention)."""
    D = kernel.shape[0]
    H = num_heads
    Dh = D // H
    w = kernel.reshape(D, H, Dh).transpose(1, 0, 2)
    b = bias.reshape(H, 1, Dh)
    return w, b


def _fold_ffn0(op_k, op_b, f0_k, f0_b, num_heads: int):
    """out_proj folded into ffn0 (`_merged_message_ffn0` algebra), split into
    per-head LANE-padded row slabs: message term sum_h o_h @ wf[h].

    Returns w0x (D, 2D), wf (H, LANE, 2D), bf (1, 2D) f32."""
    D = op_k.shape[0]
    H = num_heads
    Dh = D // H
    w0x = f0_k[:D]
    w0m = f0_k[D:].astype(jnp.float32)
    wf = (op_k.astype(jnp.float32) @ w0m)  # (D, 2D)
    bf = (op_b.astype(jnp.float32) @ w0m + f0_b.astype(jnp.float32))[None]
    wf = _pad_axis(wf.reshape(H, Dh, 2 * D), LANE, 1)  # (H, LANE, 2D)
    return w0x, wf, bf


def _erf(x):
    """erf for Mosaic: `lax.erf` has no Pallas TPU lowering (the gate failure
    behind BENCH_r03's fused_layer=false), so evaluate Abramowitz-Stegun
    7.1.26 (max abs err 1.5e-7) from supported ops (abs/exp/fma). 1.5e-7 is
    below the kernel's own f32 parity bar (~1e-5) and ~4 decades below bf16
    resolution, so the match-agreement gates are unaffected."""
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-z * z))


def _ffn_tail(y, lng, lnb, w1, b1, out_dtype, eps=1e-5):
    """LayerNorm -> erf GELU -> ffn1, all in f32 on a VMEM value."""
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    yn = d * jax.lax.rsqrt(var + eps) * lng + lnb
    g = 0.5 * yn * (1.0 + _erf(yn * (2.0 ** -0.5)))
    return jnp.dot(
        g.astype(out_dtype), w1, preferred_element_type=jnp.float32
    ) + b1


def _self_kernel(
    x_ref, enc_ref, negm_ref, rotp_ref, hmask_ref, wqkv_ref, bqkv_ref,
    w0x_ref, wf_ref, bf0_ref, lng_ref, lnb_ref, w1_ref, b1_ref, o_ref,
    *, num_heads: int, head_dim: int, pair: bool,
):
    x = x_ref[0]  # (N, D)
    dt = x.dtype
    cosf = enc_ref[0][:, :LANE]
    sinf = enc_ref[0][:, LANE:]
    negm = negm_ref[0]  # (1, N) f32 additive key mask
    P = rotp_ref[0]
    scale = head_dim ** -0.5
    H = num_heads

    def rot(z):
        return z * cosf + jnp.dot(
            z, P, preferred_element_type=jnp.float32
        ).astype(dt) * sinf

    def attend(q, k, v, h):
        """One head's attention + folded-FFN message accumulation; in pair
        mode q/k/v hold TWO heads, k is lane-masked to head h and wf_ref[h]
        has only head h's rows live, so cross-head terms are exactly 0."""
        s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        s = s + negm  # masked keys -> <= NEG_INF
        m = jnp.max(s, axis=-1, keepdims=True)
        m = jnp.where(m > NEG_INF / 2, m, 0.0)  # fully-masked rows
        p = jnp.exp(s - m)  # masked entries underflow to exactly 0
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32)
        o = o / jnp.maximum(l, 1e-30)
        return jnp.dot(
            o.astype(dt), wf_ref[h], preferred_element_type=jnp.float32
        )

    y = jnp.dot(x, w0x_ref[...], preferred_element_type=jnp.float32)
    y = y + bf0_ref[...]  # (N, 2D) f32
    if pair:
        G = H // 2
        for g in range(G):
            q2 = jnp.dot(x, wqkv_ref[g], preferred_element_type=jnp.float32)
            q2 = q2.astype(dt) + bqkv_ref[g]
            k2 = jnp.dot(
                x, wqkv_ref[G + g], preferred_element_type=jnp.float32
            ).astype(dt) + bqkv_ref[G + g]
            v2 = jnp.dot(
                x, wqkv_ref[2 * G + g], preferred_element_type=jnp.float32
            ).astype(dt) + bqkv_ref[2 * G + g]
            q2, k2 = rot(q2), rot(k2)
            for sub in (0, 1):
                y = y + attend(
                    q2, k2 * hmask_ref[sub], v2, 2 * g + sub
                )
    else:
        for h in range(H):
            q = jnp.dot(x, wqkv_ref[h], preferred_element_type=jnp.float32)
            q = q.astype(dt) + bqkv_ref[h]
            k = jnp.dot(
                x, wqkv_ref[H + h], preferred_element_type=jnp.float32
            ).astype(dt) + bqkv_ref[H + h]
            v = jnp.dot(
                x, wqkv_ref[2 * H + h], preferred_element_type=jnp.float32
            ).astype(dt) + bqkv_ref[2 * H + h]
            y = y + attend(rot(q), rot(k), v, h)
    out = _ffn_tail(
        y, lng_ref[...], lnb_ref[...], w1_ref[...], b1_ref[...], dt
    )
    o_ref[0] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


def fused_self_block(x, enc, mask, params, *, num_heads: int,
                     qkv_layout: str = "3hd"):
    """One-pass LightGlue self block (attention + folded FFN + residual).

    x: (B, N, D) compute-dtype; enc: (B, N, 2, D/H/2) rotary (cos, sin);
    mask: (B, N) key validity; params: the SelfBlock param tree
    {Wqkv, out_proj, ffn0, ffn_norm, ffn1}. Exactly
    `SelfBlock.__call__(..., fold=True)` (tests/test_pallas_lg_layer.py).
    """
    B, N, D = x.shape
    dt = x.dtype
    H = num_heads
    Dh = D // H
    pair = H % 2 == 0 and 2 * Dh <= LANE
    Np = _ceil_to(N, LANE)
    x_p = _pad_axis(x, Np, 1)
    enc_p = _pack_rotary(_pad_axis(enc, Np, 1), Dh, dt, pair=pair)
    if mask is None:
        mask = jnp.ones((B, N), bool)
    negm = jnp.where(_pad_axis(mask, Np, 1, value=False), 0.0, NEG_INF)
    negm = negm.astype(jnp.float32)[:, None, :]  # (B, 1, Np)

    w, b = _per_head_qkv(
        params["Wqkv"]["kernel"], params["Wqkv"]["bias"], H, qkv_layout
    )
    if pair:
        w, b = _pair_slabs(w, b, 3)
    w = _pad_axis(w, LANE, -1)
    b = _pad_axis(b, LANE, -1)
    n_slabs = 3 * (H // 2 if pair else H)
    w0x, wf, bf = _fold_ffn0(
        params["out_proj"]["kernel"], params["out_proj"]["bias"],
        params["ffn0"]["kernel"], params["ffn0"]["bias"], H,
    )
    if pair:
        wf = _place_pair_rows(wf, Dh)
    lng = params["ffn_norm"]["scale"].astype(jnp.float32)[None]
    lnb = params["ffn_norm"]["bias"].astype(jnp.float32)[None]
    w1 = params["ffn1"]["kernel"].astype(dt)
    b1 = params["ffn1"]["bias"].astype(jnp.float32)[None]
    rotp = _rot_matrix(Dh, dt, pair=pair)[None]
    hmask = _lane_masks(Dh, dt)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    kernel = functools.partial(
        _self_kernel, num_heads=H, head_dim=Dh, pair=pair
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, D), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Np, 2 * LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda i: (i, 0, 0)),
            const((1, LANE, LANE)),
            const((2, 1, LANE)),
            const((n_slabs, D, LANE)),
            const((n_slabs, 1, LANE)),
            const((D, 2 * D)),
            const((num_heads, LANE, 2 * D)),
            const((1, 2 * D)),
            const((1, 2 * D)),
            const((1, 2 * D)),
            const((2 * D, D)),
            const((1, D)),
        ],
        out_specs=pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0)),
    )(
        x_p, enc_p, negm, rotp, hmask, w.astype(dt), b.astype(dt),
        w0x.astype(dt), wf.astype(dt), bf, lng, lnb, w1, b1,
    )
    return out[:, :N]


def _cross_kernel(
    x0_ref, x1_ref, neg0_ref, neg1_ref, hmask_ref, wqv_ref, bqv_ref,
    w0x_ref, wf_ref, bf0_ref, lng_ref, lnb_ref, w1_ref, b1_ref,
    o0_ref, o1_ref, *, num_heads: int, head_dim: int, pair: bool,
):
    x0 = x0_ref[0]  # (N, D)
    x1 = x1_ref[0]  # (M, D)
    dt = x0.dtype
    neg0 = neg0_ref[0]  # (N, 1) f32 additive view-0 token mask
    neg1 = neg1_ref[0]  # (1, M) f32 additive view-1 token mask
    scale = head_dim ** -0.25
    H = num_heads

    y0 = jnp.dot(x0, w0x_ref[...], preferred_element_type=jnp.float32)
    y0 = y0 + bf0_ref[...]
    y1 = jnp.dot(x1, w0x_ref[...], preferred_element_type=jnp.float32)
    y1 = y1 + bf0_ref[...]

    def attend_both(qk0, qk1, v0, v1, h, y0, y1):
        """Shared-similarity bidirectional attention for head h; in pair
        mode qk1 arrives lane-masked to head h and wf_ref[h] keeps only
        head h's rows, so the other head's lanes contribute exactly 0."""
        s = jnp.dot(qk0, qk1.T, preferred_element_type=jnp.float32)  # (N, M)
        # 0 <- 1 (rows attend over columns), masked by view-1 validity
        s0 = s + neg1
        m0 = jnp.max(s0, axis=-1, keepdims=True)
        m0 = jnp.where(m0 > NEG_INF / 2, m0, 0.0)
        p0 = jnp.exp(s0 - m0)
        l0 = jnp.sum(p0, axis=-1, keepdims=True)
        o0 = jnp.dot(p0.astype(dt), v1, preferred_element_type=jnp.float32)
        o0 = o0 / jnp.maximum(l0, 1e-30)
        y0 = y0 + jnp.dot(
            o0.astype(dt), wf_ref[h], preferred_element_type=jnp.float32
        )
        # 1 <- 0 (columns attend over rows), masked by view-0 validity
        s1 = s + neg0
        m1 = jnp.max(s1, axis=0, keepdims=True)  # (1, M)
        m1 = jnp.where(m1 > NEG_INF / 2, m1, 0.0)
        p1 = jnp.exp(s1 - m1)
        l1 = jnp.sum(p1, axis=0, keepdims=True)
        o1 = jax.lax.dot_general(
            p1.astype(dt), v0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M, LANE)
        o1 = o1 / jnp.maximum(l1.T, 1e-30)
        y1 = y1 + jnp.dot(
            o1.astype(dt), wf_ref[h], preferred_element_type=jnp.float32
        )
        return y0, y1

    if pair:
        G = H // 2
        for g in range(G):
            qk0 = jnp.dot(x0, wqv_ref[g], preferred_element_type=jnp.float32)
            qk0 = (qk0.astype(dt) + bqv_ref[g]) * scale
            qk1 = jnp.dot(x1, wqv_ref[g], preferred_element_type=jnp.float32)
            qk1 = (qk1.astype(dt) + bqv_ref[g]) * scale
            v0 = jnp.dot(
                x0, wqv_ref[G + g], preferred_element_type=jnp.float32
            ).astype(dt) + bqv_ref[G + g]
            v1 = jnp.dot(
                x1, wqv_ref[G + g], preferred_element_type=jnp.float32
            ).astype(dt) + bqv_ref[G + g]
            for sub in (0, 1):
                y0, y1 = attend_both(
                    qk0, qk1 * hmask_ref[sub], v0, v1, 2 * g + sub, y0, y1
                )
    else:
        for h in range(H):
            qk0 = jnp.dot(x0, wqv_ref[h], preferred_element_type=jnp.float32)
            qk0 = (qk0.astype(dt) + bqv_ref[h]) * scale
            qk1 = jnp.dot(x1, wqv_ref[h], preferred_element_type=jnp.float32)
            qk1 = (qk1.astype(dt) + bqv_ref[h]) * scale
            v0 = jnp.dot(
                x0, wqv_ref[H + h], preferred_element_type=jnp.float32
            ).astype(dt) + bqv_ref[H + h]
            v1 = jnp.dot(
                x1, wqv_ref[H + h], preferred_element_type=jnp.float32
            ).astype(dt) + bqv_ref[H + h]
            y0, y1 = attend_both(qk0, qk1, v0, v1, h, y0, y1)
    lng, lnb = lng_ref[...], lnb_ref[...]
    w1, b1 = w1_ref[...], b1_ref[...]
    out0 = _ffn_tail(y0, lng, lnb, w1, b1, dt)
    o0_ref[0] = (x0.astype(jnp.float32) + out0).astype(o0_ref.dtype)
    out1 = _ffn_tail(y1, lng, lnb, w1, b1, dt)
    o1_ref[0] = (x1.astype(jnp.float32) + out1).astype(o1_ref.dtype)


def fused_cross_block(x0, x1, mask0, mask1, params, *, num_heads: int):
    """One-pass LightGlue cross block: shared-similarity bidirectional
    attention + both folded FFN tails.

    x0: (B, N, D); x1: (B, M, D); masks (B, N)/(B, M); params: the
    CrossBlock tree {to_qk, to_v, out_proj, ffn0, ffn_norm, ffn1}.
    Returns (y0, y1) == `CrossBlock.__call__(..., fold=True)` on the
    stacked tensor, split back per view.
    """
    B, N, D = x0.shape
    M = x1.shape[1]
    dt = x0.dtype
    H = num_heads
    Dh = D // H
    pair = H % 2 == 0 and 2 * Dh <= LANE
    Np, Mp = _ceil_to(N, LANE), _ceil_to(M, LANE)
    x0_p, x1_p = _pad_axis(x0, Np, 1), _pad_axis(x1, Mp, 1)
    if mask0 is None:
        mask0 = jnp.ones((B, N), bool)
    if mask1 is None:
        mask1 = jnp.ones((B, M), bool)
    neg0 = jnp.where(_pad_axis(mask0, Np, 1, value=False), 0.0, NEG_INF)
    neg0 = neg0.astype(jnp.float32)[:, :, None]  # (B, Np, 1)
    neg1 = jnp.where(_pad_axis(mask1, Mp, 1, value=False), 0.0, NEG_INF)
    neg1 = neg1.astype(jnp.float32)[:, None, :]  # (B, 1, Mp)

    wqk, bqk = _per_head_proj(
        params["to_qk"]["kernel"], params["to_qk"]["bias"], H
    )
    wv, bv = _per_head_proj(
        params["to_v"]["kernel"], params["to_v"]["bias"], H
    )
    if pair:
        wqk, bqk = _pair_slabs(wqk, bqk, 1)
        wv, bv = _pair_slabs(wv, bv, 1)
    wqv = _pad_axis(jnp.concatenate([wqk, wv], 0), LANE, -1)
    bqv = _pad_axis(jnp.concatenate([bqk, bv], 0), LANE, -1)
    n_slabs = 2 * (H // 2 if pair else H)
    w0x, wf, bf = _fold_ffn0(
        params["out_proj"]["kernel"], params["out_proj"]["bias"],
        params["ffn0"]["kernel"], params["ffn0"]["bias"], H,
    )
    if pair:
        wf = _place_pair_rows(wf, Dh)
    lng = params["ffn_norm"]["scale"].astype(jnp.float32)[None]
    lnb = params["ffn_norm"]["bias"].astype(jnp.float32)[None]
    w1 = params["ffn1"]["kernel"].astype(dt)
    b1 = params["ffn1"]["bias"].astype(jnp.float32)[None]
    hmask = _lane_masks(Dh, dt)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    kernel = functools.partial(
        _cross_kernel, num_heads=H, head_dim=Dh, pair=pair
    )
    o0, o1 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, D), dt),
            jax.ShapeDtypeStruct((B, Mp, D), dt),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Np, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Mp), lambda i: (i, 0, 0)),
            const((2, 1, LANE)),
            const((n_slabs, D, LANE)),
            const((n_slabs, 1, LANE)),
            const((D, 2 * D)),
            const((num_heads, LANE, 2 * D)),
            const((1, 2 * D)),
            const((1, 2 * D)),
            const((1, 2 * D)),
            const((2 * D, D)),
            const((1, D)),
        ],
        out_specs=(
            pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda i: (i, 0, 0)),
        ),
    )(
        x0_p, x1_p, neg0, neg1, hmask, wqv.astype(dt), bqv.astype(dt),
        w0x.astype(dt), wf.astype(dt), bf, lng, lnb, w1, b1,
    )
    return o0[:, :N], o1[:, :M]


def fits_fused_layer(n: int, m: int, head_dim: int = 64) -> bool:
    """VMEM gate: the (N, M) f32 similarity plus the resident operands of
    one block must fit ~16 MB. The cross kernel holds sim + exp + masked
    copy + softmax stats live, so the bound is n*m <= 1024*2048 (the f32
    sim alone is 16 MB at 2048x2048 — a guaranteed Mosaic OOM, advisor r3)."""
    return (
        n * m <= 1024 * 2048 and max(n, m) <= 2048 and head_dim <= LANE
    )
