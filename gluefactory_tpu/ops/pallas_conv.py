"""Fused VGG-stage Pallas kernels: conv3x3(+relu) chains + 2x2 max-pool.

SuperPoint's early scales (reference `superpoint_open.py:61-77,126-144`) are
the throughput wall on TPU: XLA evaluates each 3x3 conv separately, so the
full-resolution 64-channel activations (hundreds of MB at 640x480xB8) make
two HBM round-trips per scale. These kernels stream row blocks through VMEM:
inter-conv activations never leave the chip and only the (row-)pooled output
is written back.

Mosaic constraints shaped the design (each was hit in practice):
  - channel-concat of spatially shifted slices does not lower ("offset
    mismatch on non-concat dimension") -> convs are per-dy tap-folded
    matmuls `big_dy = x[dy:] @ [K(dy,0)|K(dy,1)|K(dy,2)]` + shifted adds;
  - matmul accumulators must be 32-bit -> f32 `big`;
  - an unrolled dy loop keeps all three f32 `big` buffers live (VMEM OOM at
    640px width) and `dynamic_slice` on VALUES does not lower -> the tile
    lives in a VMEM scratch ref and a `fori_loop` slices it with `pl.load`,
    so one `big` is live at a time;
  - manual HBM->VMEM DMA requires 128-aligned minor dims -> halo rows are a
    separate XLA-gathered input riding the normal BlockSpec pipeline;
  - lane-merging reshapes / strided sublane gathers do not lower -> the 2x2
    pool's row half runs in-kernel, the column half outside in XLA;
  - Cin=1 tensors are lane-hostile -> the image-input conv (conv1a) stays
    in XLA; fusion starts from the first 64-channel conv.

Inference-only fast path (SuperPoint freezes the backbone in the flagship
pipeline); training uses the standard XLA convs for gradients.

MEASURED RESULT (v5e, B=8, 640x480): compiles and runs correctly on-chip
(bf16-rounding parity with the XLA path), but the end-to-end pipeline is
~3x SLOWER with `fused_stages: 3` than with plain XLA convs — the 16 MB
VMEM budget forces 4-row blocks at 640 px width, and ~1000 grid steps of
per-step overhead swamp the saved HBM traffic. Kept as an off-by-default
option: on hardware with larger VMEM (or narrower inputs, where
`_pick_ht` chooses 8+ rows) the trade-off shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_ref(xt_ref, k_ref, bias, rows_out, W, ch):
    """3x3 SAME conv from a VMEM tile ref via per-dy tap-folded matmuls.

    xt_ref: (rows_out+2, W+2, cin) VMEM ref (1 halo row/col per side).
    k_ref: (3, cin, 3*ch) ref — row dy holds [K(dy,0) | K(dy,1) | K(dy,2)].
    Returns (rows_out, W, ch) f32, bias added, relu applied.
    """
    w_in = xt_ref.shape[1]
    cin = xt_ref.shape[2]

    def body(dy, acc):
        xs = xt_ref[pl.ds(dy, rows_out)]
        kd = k_ref[pl.ds(dy, 1)]
        big = jax.lax.dot_general(
            xs.reshape(rows_out * w_in, cin),
            kd.reshape(cin, 3 * ch),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rows_out, w_in, 3 * ch)
        for dx in range(3):
            acc += big[:, dx : dx + W, dx * ch : (dx + 1) * ch]
        return acc

    acc = jax.lax.fori_loop(
        0, 3, body, jnp.zeros((rows_out, W, ch), jnp.float32)
    )
    return jnp.maximum(acc + bias.astype(jnp.float32), 0.0)


def _row_pool(y, ht, W, ch, out_ref):
    # row half of the 2x2 max-pool (outer-dim reshape lowers fine); the
    # column half runs outside in XLA
    y = y.reshape(ht // 2, 2, W, ch)
    out_ref[:] = jnp.max(y, axis=1)[None].astype(out_ref.dtype)


def _kernel2(
    xb, hb, k1_ref, b1_ref, k2_ref, b2_ref, out_ref, xt_ref, a_ref, *, ht, H, W, ch
):
    h = pl.program_id(1)
    xt_ref[:2] = hb[0, 0, :2].astype(xt_ref.dtype)
    xt_ref[2 : ht + 2] = xb[0].astype(xt_ref.dtype)
    xt_ref[ht + 2 :] = hb[0, 0, 2:].astype(xt_ref.dtype)
    # conv1 (SAME): rows [r0-1, r0+ht], cols [-1, W]
    a = _conv3x3_ref(xt_ref, k1_ref, b1_ref[:], ht + 2, W + 2, ch)
    # conv2's SAME padding: halo rows/cols outside the image are ZERO (they
    # are conv1 *padding*, not conv1 evaluated beyond the border)
    ar = h * ht - 1 + jax.lax.broadcasted_iota(jnp.int32, (ht + 2, 1, 1), 0)
    ac = jax.lax.broadcasted_iota(jnp.int32, (1, W + 2, 1), 1) - 1
    a = jnp.where((ar >= 0) & (ar < H) & (ac >= 0) & (ac < W), a, 0.0)
    a_ref[:] = a.astype(a_ref.dtype)
    y = _conv3x3_ref(a_ref, k2_ref, b2_ref[:], ht, W, ch)
    _row_pool(y, ht, W, ch, out_ref)


def _kernel1(xb, hb, k_ref, b_ref, out_ref, xt_ref, *, ht, W, ch):
    xt_ref[:1] = hb[0, 0, :1].astype(xt_ref.dtype)
    xt_ref[1 : ht + 1] = xb[0].astype(xt_ref.dtype)
    xt_ref[ht + 1 :] = hb[0, 0, 1:].astype(xt_ref.dtype)
    y = _conv3x3_ref(xt_ref, k_ref, b_ref[:], ht, W, ch)
    _row_pool(y, ht, W, ch, out_ref)


def _fold_taps(k):
    """(3, 3, cin, ch) HWIO -> (3, cin, 3*ch): row dy = [K(dy,0)|K(dy,1)|K(dy,2)]."""
    return jnp.stack(
        [jnp.concatenate([k[dy, dx] for dx in range(3)], axis=-1) for dy in range(3)]
    )


def _halo_rows(xp, ht, s):
    """(B, H+2s, W+2s, cin) zero-padded input -> (B, n_h, 2s, W+2s, cin):
    the s rows above and below each ht-row block."""
    B, Hp, _, _ = xp.shape
    H = Hp - 2 * s
    n_h = H // ht
    base = jnp.arange(n_h) * ht
    offs = jnp.concatenate([jnp.arange(s), ht + s + jnp.arange(s)])
    return xp[:, base[:, None] + offs[None, :]]


def _col_pool(y):
    return jnp.maximum(y[:, :, 0::2], y[:, :, 1::2])


def _pick_ht(H, W, cap):
    """Largest row-block size whose VMEM footprint is known-good: the f32
    `big` buffer scales with ht*W, and ht*W <= 2560 (320x8) fits alongside
    the accumulator and staging buffers on a 16 MB VMEM core."""
    for ht in (cap, 8, 4, 2):
        if ht <= cap and ht % 2 == 0 and H % ht == 0 and ht * max(W, 320) <= 2560:
            return ht
    return 0


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_conv2_pool(x, k1, b1, k2, b2, block_rows: int = 8):
    """(B, H, W, Cin) -> (B, H//2, W//2, Cout): two 3x3 SAME convs with bias
    + relu each, then 2x2 max-pool — one HBM pass over the input. H must be
    divisible by `block_rows` (even), W even. Weights HWIO like `nn.Conv`.
    """
    B, H, W, cin = x.shape
    ch = k2.shape[-1]
    ht = _pick_ht(H, W, block_rows)
    assert ht > 0 and W % 2 == 0, (H, W, block_rows)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xin = xp[:, 2:-2]  # (B, H, W+4, cin): aligned ht-row blocks
    halo = _halo_rows(xp, ht, 2)
    k1f = _fold_taps(k1.astype(jnp.bfloat16))
    k2f = _fold_taps(k2.astype(jnp.bfloat16))
    kernel = functools.partial(_kernel2, ht=ht, H=H, W=W, ch=ch)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // ht),
        in_specs=[
            pl.BlockSpec((1, ht, W + 4, cin), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 4, W + 4, cin), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((3, cin, 3 * ch), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((ch,), lambda b, h: (0,)),
            pl.BlockSpec((3, ch, 3 * ch), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((ch,), lambda b, h: (0,)),
        ],
        out_specs=pl.BlockSpec((1, ht // 2, W, ch), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W, ch), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ht + 4, W + 4, cin), jnp.bfloat16),
            pltpu.VMEM((ht + 2, W + 2, ch), jnp.bfloat16),
        ],
    )(xin, halo, k1f, b1, k2f, b2)
    return _col_pool(y)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_conv1_pool(x, k, b, block_rows: int = 8):
    """(B, H, W, Cin) -> (B, H//2, W//2, Cout): one 3x3 SAME conv + bias +
    relu + 2x2 max-pool in a single HBM pass (used after an XLA conv when the
    preceding conv's input is lane-hostile, e.g. the 1-channel image)."""
    B, H, W, cin = x.shape
    ch = k.shape[-1]
    ht = _pick_ht(H, W, block_rows)
    assert ht > 0 and W % 2 == 0, (H, W, block_rows)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xin = xp[:, 1:-1]  # (B, H, W+2, cin)
    halo = _halo_rows(xp, ht, 1)
    kf = _fold_taps(k.astype(jnp.bfloat16))
    kernel = functools.partial(_kernel1, ht=ht, W=W, ch=ch)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // ht),
        in_specs=[
            pl.BlockSpec((1, ht, W + 2, cin), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 2, W + 2, cin), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((3, cin, 3 * ch), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((ch,), lambda b, h: (0,)),
        ],
        out_specs=pl.BlockSpec((1, ht // 2, W, ch), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W, ch), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ht + 2, W + 2, cin), jnp.bfloat16),
        ],
    )(xin, halo, kf, b)
    return _col_pool(y)


# ---------------------------------------------------------------- fused NMS


_NMS_ROWS = 48  # rows per grid step (multiple of 8)
_NMS_HALO = 24  # >= radius * 5 sequential pools, multiple of 8


def _nms_kernel(top_ref, mid_ref, bot_ref, o_ref, *, radius: int,
                iters: int, h: int, w: int):
    """Iterative max-pool NMS with every intermediate in VMEM.

    The XLA path (`ops/keypoints.simple_nms`) runs 5 separable max-pools as
    10 shifted-max passes over HBM; here a row block (+halo rows from the
    clamped-index neighbor blocks) sits in VMEM and the pools are
    lane/sublane `pltpu.roll`s with iota edge masks (strided lane slicing
    does not lower; rolls do). One HBM read + one write per pixel. A whole
    (480, 640) map per step blows the 16 MB scoped-VMEM budget (the
    compiler keeps ~15 pool intermediates alive), hence the row blocking.
    """
    R, K = _NMS_ROWS, _NMS_HALO
    i = pl.program_id(1)
    x = jnp.concatenate(
        [top_ref[0, R - K:], mid_ref[0], bot_ref[0, :K]], axis=0
    )  # (R + 2K, W)
    hb = R + 2 * K
    neg = jnp.float32(-1e30)
    col = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 1)
    row_local = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0)
    # global row of each halo'd-block row; clamped neighbor blocks (first /
    # last grid step) land outside [0, h) here and are masked to -inf
    row = row_local + i * R - K
    x = jnp.where((row >= 0) & (row < h), x, neg)

    def max_pool(x):
        # pltpu.roll needs non-negative shifts: (size - d) is the backward
        # roll. Row-direction wrap-around is masked by the halo (wrapped
        # values land > radius rows away from any row we keep).
        m = x
        for d in range(1, radius + 1):
            m = jnp.maximum(m, pltpu.roll(x, hb - d, 0))
            m = jnp.maximum(m, pltpu.roll(x, d, 0))
        x2 = m
        for d in range(1, radius + 1):
            lf = pltpu.roll(m, w - d, 1)   # value at col j+d
            rt = pltpu.roll(m, d, 1)       # value at col j-d
            x2 = jnp.maximum(x2, jnp.where(col < w - d, lf, neg))
            x2 = jnp.maximum(x2, jnp.where(col >= d, rt, neg))
        return x2

    zeros = jnp.zeros_like(x)
    scores = jnp.where((row >= 0) & (row < h), x, zeros)
    max_mask = x == max_pool(x)
    for _ in range(iters):
        supp_mask = max_pool(max_mask.astype(jnp.float32)) > 0
        supp_scores = jnp.where(supp_mask, zeros, x)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    o_ref[0] = jnp.where(max_mask, scores, zeros)[K:K + R]


def fused_nms(scores, radius: int = 4, iters: int = 2):
    """simple_nms as one Pallas pass: scores (..., H, W) -> NMS'd scores.

    Requires H divisible by the row block (48); callers fall back to the
    XLA path otherwise (`ops/keypoints.simple_nms`).
    """
    shape = scores.shape
    H, W = shape[-2], shape[-1]
    if H % _NMS_ROWS or radius * (1 + 2 * iters) > _NMS_HALO:
        raise ValueError(f"fused_nms needs H % {_NMS_ROWS} == 0 and "
                         f"radius*(1+2*iters) <= {_NMS_HALO}")
    x = scores.reshape(-1, H, W).astype(jnp.float32)
    B = x.shape[0]
    nb = H // _NMS_ROWS
    kernel = functools.partial(
        _nms_kernel, radius=radius, iters=iters, h=H, w=W)
    blk = (1, _NMS_ROWS, W)
    out = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec(blk, lambda b, i: (b, jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
    )(x, x, x)
    return out.reshape(shape).astype(scores.dtype)
