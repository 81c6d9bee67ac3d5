"""Fused width-pair-packed (w2d) VGG-stage Pallas kernels.

Why this exists — the r4 measurement story (CLAUDE.md, scripts/
bench_conv_packing.py): SuperPoint's 64-channel full-resolution stages are
the flagship's biggest perf line (reference `superpoint_open.py:61-77`;
stage-0 chain 4.70 ms/view at 20% MXU, B=8 @640x480). Width-pair packing
(`models/extractors/superpoint.py:_w2d_kernel`) fixes the MXU lane waste —
the packed conv measures 74% MXU vs 35% direct in ISOLATION — but the XLA
*chain* composition loses everything to relayouts around the tile-hostile
packed widths (direct chain 4.70 ms vs packed chain 6.54 ms). These kernels
do the chain composition in VMEM where the layout is ours: one HBM read of
the stage input, conv(+conv)+bias+relu+phantom-mask+folded-pool inside, one
HBM write of the (row-pooled) output.

Layout contract (matches superpoint.py exactly, tests/test_pallas_w2d.py):
  offset-packed  (B, H, W2+1, 2C): packed col j = original cols (2j-1, 2j),
                 phantom borders are zeros;
  aligned-packed (B, H, W2, 2C):   packed col j = original cols (2j, 2j+1).
  conv_A: offset in -> aligned out (width padding (0,0));
  conv_B: aligned in -> offset out (width padding (1,1), phantom slots
          zero-masked);
  folded pool: offset in -> phase-max + col-pair max + row-pair max,
          emitted as UNPAIRED z (B, H/2, W2+2, C) — the final lane-pair
          reshape to offset-packed (B, H/2, (W2+2)/2, 2C) is a lane-merging
          reshape Mosaic cannot lower, so the caller does it in XLA (on
          quarter-resolution data; `repack_pool_output`).

MEASURED RESULT (v5e, B=8, 640x480, scripts/bench_conv_packing.py --chain):
on-chip EXACT (checksum rel-delta 0 vs the XLA packed chain) but SLOW —
stage-0 tail 12.6 ms vs 4.66 direct-XLA / 6.79 packed-XLA; stage-1 full
kernel 6.68 ms vs 1.22 direct (block_rows=8; 12/16/24 fail Mosaic compile,
VMEM). Per-step time ~26 us against ~3.4 us of matmul work: the VMEM
staging stores, f32 accumulator adds, and the retiling around the
(rows*w, cin) matmul views dominate. This is the THIRD independent
negative result for Mosaic conv-style kernels at these shapes (after
`pallas_conv.py` fused stages and fused NMS) — the conv path stays on
XLA's direct lowering. Kept as tested documentation of the attempt; do
not re-attempt without a fundamentally different per-step cost model.

Mosaic constraints honored (each documented failure was hit in r2-r4, see
`pallas_conv.py` / `pallas_assignment.py`):
  - matmul accumulators f32 via preferred_element_type; one per-dy `big`
    live at a time (fori_loop over dy, tap-folded kernels);
  - no channel-concat of shifted slices -> per-dy folded kernels
    [K(dy,0)|K(dy,1)] and lane slices of `big` at 2C-offsets;
  - no boolean broadcast-select masks -> multiplicative iota masks;
  - no lane-merging reshapes -> the pool's pair-merge runs outside;
  - halo rows ride a separate XLA-gathered input (manual DMA needs
    128-aligned minors); row blocks aligned via BlockSpec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_w2d_taps(K2):
    """(3, 2, 2Ci, 2Co) packed kernel -> (3, 2Ci, 2*2Co):
    row dy = [K2(dy, t=0) | K2(dy, t=1)] along the output dim."""
    return jnp.stack(
        [jnp.concatenate([K2[dy, 0], K2[dy, 1]], axis=-1) for dy in range(3)]
    )


def _halo_rows(xp, ht, s):
    """(B, H+2s, W, C) zero-row-padded input -> (B, n_h, 2s, W, C): the s
    rows above and below each ht-row block."""
    B, Hp, _, _ = xp.shape
    H = Hp - 2 * s
    n_h = H // ht
    base = jnp.arange(n_h) * ht
    offs = jnp.concatenate([jnp.arange(s), ht + s + jnp.arange(s)])
    return xp[:, base[:, None] + offs[None, :]]


def _conv_w2(xt_ref, kf_ref, bias, rows_out, w_out, c2):
    """Packed-pair conv from a VMEM ref via per-dy tap-folded matmuls.

    xt_ref: (rows_out+2, w_out+1, 2Ci) VMEM ref; kf_ref: (3, 2Ci, 2*c2).
    out[r, w, :] = sum_dy sum_t xt[r+dy, w+t] @ K2[dy, t] — both parities
    reduce to this form: conv_A consumes the offset-packed input directly
    (width padding (0,0)); conv_B's (1,1) width padding is staged into
    xt_ref's zero border columns by the caller.
    Returns (rows_out, w_out, c2) f32 with bias+relu applied.
    """
    w_in = xt_ref.shape[1]
    cin = xt_ref.shape[2]

    def body(dy, acc):
        xs = xt_ref[pl.ds(dy, rows_out)]
        kd = kf_ref[pl.ds(dy, 1)]
        big = jax.lax.dot_general(
            xs.reshape(rows_out * w_in, cin),
            kd.reshape(cin, 2 * c2),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rows_out, w_in, 2 * c2)
        for t in range(2):
            acc += big[:, t : t + w_out, t * c2 : (t + 1) * c2]
        return acc

    acc = jax.lax.fori_loop(
        0, 3, body, jnp.zeros((rows_out, w_out, c2), jnp.float32)
    )
    return jnp.maximum(acc + bias.astype(jnp.float32), 0.0)


def _phantom_mask(y, w2p1, c):
    """Zero conv_B's phantom slots: col 0 phase0 (original col -1) and the
    last col's phase1 (original col W). Multiplicative f32 mask (broadcast
    boolean select does not lower)."""
    rows = y.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, w2p1, 2 * c), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w2p1, 2 * c), 2)
    is_p0 = (lane < c).astype(jnp.float32)
    kill = (col == 0).astype(jnp.float32) * is_p0 + (
        col == (w2p1 - 1)
    ).astype(jnp.float32) * (1.0 - is_p0)
    return y * (1.0 - kill)


def _fpool(y, z_ref, out_ref, ht, w2p1, c):
    """Folded pool of an offset-packed (ht, W2+1, 2C) f32 map: phase max ->
    z[j] = max(q1[j-1], q0[j]) over j in [0, W2+2) -> row-pair max ->
    out (1, ht/2, W2+2, C). The col-pair merge happens outside in XLA."""
    q0, q1 = y[:, :, :c], y[:, :, c:]
    z_ref[:, 0:1] = jnp.zeros((ht, 1, c), z_ref.dtype)
    z_ref[:, 1 : w2p1 + 1] = q1.astype(z_ref.dtype)
    z_ref[:, 0:w2p1] = jnp.maximum(
        z_ref[:, 0:w2p1], q0.astype(z_ref.dtype)
    )
    z = z_ref[...].reshape(ht // 2, 2, w2p1 + 1, c)
    out_ref[:] = jnp.max(z, axis=1)[None].astype(out_ref.dtype)


def _tail_kernel(xb, hb, kf_ref, b_ref, out_ref, xt_ref, z_ref, *, ht, w2, c):
    """conv_B (+bias+relu+phantom mask) + folded pool, aligned-packed in."""
    # stage the (1,1)-width-padded, row-haloed tile: cols 0 and W2+1 zero
    rows, ci2 = ht + 2, xt_ref.shape[2]
    xt_ref[:, 0:1] = jnp.zeros((rows, 1, ci2), xt_ref.dtype)
    xt_ref[:, w2 + 1 :] = jnp.zeros((rows, 1, ci2), xt_ref.dtype)
    xt_ref[0:1, 1 : w2 + 1] = hb[0, 0, 0:1].astype(xt_ref.dtype)
    xt_ref[1 : ht + 1, 1 : w2 + 1] = xb[0].astype(xt_ref.dtype)
    xt_ref[ht + 1 :, 1 : w2 + 1] = hb[0, 0, 1:].astype(xt_ref.dtype)
    y = _conv_w2(xt_ref, kf_ref, b_ref[:], ht, w2 + 1, c * 2)
    y = _phantom_mask(y, w2 + 1, c)
    _fpool(y, z_ref, out_ref, ht, w2 + 1, c)


def _stage_kernel(
    xb, hb, kfa_ref, ba_ref, kfb_ref, bb_ref, out_ref, xt_ref, a_ref, z_ref,
    *, ht, h, w2, c
):
    """conv_A + conv_B + folded pool, offset-packed in (full w2d stage)."""
    blk = pl.program_id(1)
    # xt: (ht+4, W2+1, 2Ci) — 2 halo rows per side, width arrives offset-
    # packed with its own zero phantoms (no width staging needed)
    xt_ref[0:2] = hb[0, 0, 0:2].astype(xt_ref.dtype)
    xt_ref[2 : ht + 2] = xb[0].astype(xt_ref.dtype)
    xt_ref[ht + 2 :] = hb[0, 0, 2:].astype(xt_ref.dtype)
    a = _conv_w2(xt_ref, kfa_ref, ba_ref[:], ht + 2, w2, c * 2)
    # conv_A outputs beyond the image rows are conv_B *padding*: zero them
    # (the width borders of `a` are real SAME-conv outputs, kept)
    ar = (
        blk * ht
        - 1
        + jax.lax.broadcasted_iota(jnp.int32, (ht + 2, w2, 2 * c), 0)
    )
    a = a * ((ar >= 0) & (ar < h)).astype(jnp.float32)
    # stage conv_B's (1,1)-width-padded input
    a_ref[:, 0:1] = jnp.zeros((ht + 2, 1, 2 * c), a_ref.dtype)
    a_ref[:, w2 + 1 :] = jnp.zeros((ht + 2, 1, 2 * c), a_ref.dtype)
    a_ref[:, 1 : w2 + 1] = a.astype(a_ref.dtype)
    y = _conv_w2(a_ref, kfb_ref, bb_ref[:], ht, w2 + 1, c * 2)
    y = _phantom_mask(y, w2 + 1, c)
    _fpool(y, z_ref, out_ref, ht, w2 + 1, c)


def repack_pool_output(z):
    """(B, H/2, W2+2, C) unpaired pool output -> offset-packed
    (B, H/2, (W2+2)/2, 2C) — the next stage's input (lane-pair merge, XLA)."""
    B, H2, wz, c = z.shape
    return z.reshape(B, H2, wz // 2, 2 * c)


def _pick_ht(H, candidates):
    for ht in candidates:
        if ht % 2 == 0 and H % ht == 0:
            return ht
    return 0


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_w2d_tail(x_al, K2, b2, block_rows: int = 8):
    """Aligned-packed (B, H, W2, 2C) -> offset-packed (B, H/2, (W2+2)/2, 2C):
    packed conv_B (bias+relu+phantom mask) + the folded 2x2 pool in one HBM
    pass. `K2` is the (3, 2, 2C, 2C) packed kernel (`_w2d_kernel`), `b2` the
    UNTILED (C_out,) bias. Pairs with an XLA parity-A conv producing x_al
    (e.g. SuperPoint's packed conv0_0)."""
    B, H, w2, c2 = x_al.shape
    c = K2.shape[-1] // 2
    assert c2 == K2.shape[-2], (x_al.shape, K2.shape)
    ht = _pick_ht(H, (block_rows, 16, 12, 8, 4))
    assert ht > 0, (H, block_rows)
    xp = jnp.pad(x_al, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = _halo_rows(xp, ht, 1)
    kf = _fold_w2d_taps(K2.astype(jnp.bfloat16))
    bias = jnp.tile(b2, 2)
    kernel = functools.partial(_tail_kernel, ht=ht, w2=w2, c=c)
    z = pl.pallas_call(
        kernel,
        grid=(B, H // ht),
        in_specs=[
            pl.BlockSpec((1, ht, w2, c2), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 2, w2, c2), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((3, c2, 4 * c), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((2 * c,), lambda b, h: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, ht // 2, w2 + 2, c), lambda b, h: (b, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, w2 + 2, c), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ht + 2, w2 + 2, c2), jnp.bfloat16),
            pltpu.VMEM((ht, w2 + 2, c), jnp.float32),
        ],
    )(x_al, halo, kf, bias)
    return repack_pool_output(z)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_w2d_stage(x_off, K2a, ba, K2b, bb, block_rows: int = 8):
    """Offset-packed (B, H, W2+1, 2Ci) -> offset-packed
    (B, H/2, (W2+2)/2, 2Co): a full w2d VGG stage (conv_A + conv_B with
    bias+relu each + folded 2x2 pool) in one HBM pass. Kernels are the
    packed (3, 2, 2Ci, 2Co) form; biases untiled (C_out,)."""
    B, H, w2p1, ci2 = x_off.shape
    w2 = w2p1 - 1
    c = K2b.shape[-1] // 2
    ht = _pick_ht(H, (block_rows, 16, 12, 8, 4))
    assert ht > 0, (H, block_rows)
    xp = jnp.pad(x_off, ((0, 0), (2, 2), (0, 0), (0, 0)))
    halo = _halo_rows(xp, ht, 2)
    kfa = _fold_w2d_taps(K2a.astype(jnp.bfloat16))
    kfb = _fold_w2d_taps(K2b.astype(jnp.bfloat16))
    kernel = functools.partial(_stage_kernel, ht=ht, h=H, w2=w2, c=c)
    z = pl.pallas_call(
        kernel,
        grid=(B, H // ht),
        in_specs=[
            pl.BlockSpec((1, ht, w2p1, ci2), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 4, w2p1, ci2), lambda b, h: (b, h, 0, 0, 0)),
            pl.BlockSpec((3, ci2, 4 * c), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((2 * c,), lambda b, h: (0,)),
            pl.BlockSpec((3, 2 * c, 4 * c), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((2 * c,), lambda b, h: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, ht // 2, w2 + 2, c), lambda b, h: (b, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, w2 + 2, c), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ht + 4, w2p1, ci2), jnp.bfloat16),
            pltpu.VMEM((ht + 2, w2 + 2, 2 * c), jnp.bfloat16),
            pltpu.VMEM((ht, w2 + 2, c), jnp.float32),
        ],
    )(x_off, halo, kfa, jnp.tile(ba, 2), kfb, jnp.tile(bb, 2))
    return repack_pool_output(z)
