"""On-chip A/B: width-pair packed convolution vs direct 3x3 for SuperPoint's
64-channel full/half-resolution stages (the largest line in the SP ledger).

Idea (w2d, "width-to-depth with shifted packing"): a 3x3 conv over
(H, W, 64) uses 64 of 128 MXU lanes on both contraction and output. Packing
adjacent WIDTH pairs into channels makes it a 3x2 conv over
(H, W/2+1, 128) -> (H, W/2, 128): all dims 128, at 1.33x the MACs — a net
win iff XLA's 64-lane conv efficiency is below 75%.

The shift trick makes kernel width 2 (not 3) suffice: pack the INPUT at
offset -1 (packed col w2 holds original cols 2*w2-1, 2*w2) while the OUTPUT
packs aligned (2*w2, 2*w2+1). Output phase p needs original cols
2w2+p-1..2w2+p+1, all inside packed cols {w2, w2+1}: kernel
K2[dh, t, q*C+ci, p*C+co] = K[dh, 2t+q-p, ci, co] (zero outside 0..2),
6 of 8 (t, q, p) slots live = 1.33x MACs.

Exactness is asserted on-device before timing (bf16-exact: same dot
order per output up to conv reassociation).

Usage: timeout 2400 python scripts/bench_conv_packing.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 8


def pack_offset(x):
    """(B, H, W, C) -> (B, H, W/2+1, 2C): packed col w2 = (x[2w2-1], x[2w2])."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # cols -1..W
    return xp.reshape(B, H, (W + 2) // 2, 2 * C)


def pack_kernel(K):
    """(3, 3, C, C) -> (3, 2, 2C, 2C) for offset-packed input."""
    import jax.numpy as jnp

    kh, kw, Ci, Co = K.shape
    K2 = np.zeros((kh, 2, 2 * Ci, 2 * Co), np.float32)
    Kn = np.asarray(K, np.float32)
    for t in range(2):
        for q in range(2):
            for p in range(2):
                dx = 2 * t + q - p
                if 0 <= dx <= 2:
                    K2[:, t, q * Ci : (q + 1) * Ci, p * Co : (p + 1) * Co] = Kn[:, dx]
    return jnp.asarray(K2)


def unpack(y, W):
    """(B, H, W/2, 2C) aligned-packed -> (B, H, W, C)."""
    B, H, W2, C2 = y.shape
    C = C2 // 2
    return y.reshape(B, H, W2, 2, C).reshape(B, H, W, C)


def conv_direct(x, K, b):
    import jax

    y = jax.lax.conv_general_dilated(
        x, K, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jax.nn.relu(y + b)


def conv_packed(xoff, K2, b2):
    """Offset-packed input -> aligned-packed output (+bias+relu)."""
    import jax

    y = jax.lax.conv_general_dilated(
        xoff, K2, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + b2)


def realign(y_aligned):
    """Aligned-packed (B,H,W/2,2C) -> offset-packed (B,H,W/2+1,2C):
    xoff[w2] = (phase1[w2-1], phase0[w2])."""
    import jax.numpy as jnp

    C = y_aligned.shape[-1] // 2
    ph0 = jnp.pad(y_aligned[..., :C], ((0, 0), (0, 0), (0, 1), (0, 0)))
    ph1 = jnp.pad(y_aligned[..., C:], ((0, 0), (0, 0), (1, 0), (0, 0)))
    return jnp.concatenate([ph1, ph0], axis=-1)


def timed(name, fn, base, iters, flops=0.0):
    """Scan-checksum timing with the per-iteration input DERIVED ON DEVICE
    from one base batch (base * (1 + 1e-6*i)): shipping (iters, B, H, W, C)
    from the host would be gigabytes through the tunnel RPC."""
    import jax
    import jax.numpy as jnp

    def run(base, seed):
        def body(c, i):
            x = base * jnp.asarray(1 + 1e-6 * (i + seed), base.dtype)
            return c + fn(x), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.float32)
        )
        return out

    jfn = jax.jit(run)
    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(jfn(base, jnp.float32(0))))
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors, times = [], []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(jfn(base, jnp.float32(i + 1))))
        times.append(time.perf_counter() - t0)
    dt = (float(np.min(times)) - floor) / iters
    util = flops / dt / 197e12 * 100 if flops else 0.0
    print(f"{name}: {dt * 1e3:.3f} ms/iter" + (f" ({util:.0f}% MXU)" if flops else ""),
          flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    for (H, W, C, iters) in ((480, 640, 64, 24), (240, 320, 64, 48)):
        K = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
        K2 = pack_kernel(K).astype(jnp.bfloat16)
        b2 = jnp.tile(b, 2)

        # exactness on one batch (on-device)
        x1 = jnp.asarray(rng.rand(2, H, W, C), jnp.bfloat16)
        ref = conv_direct(x1, K, b)
        got = unpack(conv_packed(pack_offset(x1), K2, b2), W)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"[{H}x{W}x{C}] packed-vs-direct max err: {err:.2e}", flush=True)
        assert err < 1e-2, err

        flops1 = BATCH * H * W * 9 * C * C * 2
        xn = rng.rand(BATCH, H, W, C).astype(np.float32)
        x = jnp.asarray(xn, jnp.bfloat16)
        # offset-pack on the host (numpy) — a remote-compile of the trivial
        # pad+reshape flaked the AOT helper once; no reason to compile it
        xon = np.pad(xn, ((0, 0), (0, 0), (1, 1), (0, 0)))
        xon = xon.reshape(BATCH, H, (W + 2) // 2, 2 * C)
        xo = jnp.asarray(xon, jnp.bfloat16)

        timed(f"direct   3x3 {C}->{C} @{W}x{H}", lambda v: jnp.sum(
            conv_direct(v, K, b).astype(jnp.float32)), x, iters, flops1)
        timed(f"packed   3x2 {2*C}->{2*C} @{W//2}x{H}", lambda v: jnp.sum(
            conv_packed(v, K2, b2).astype(jnp.float32)), xo, iters, flops1)
        # packed including the one-time input packing (for a lone conv)
        timed(f"packed+pack                 ", lambda v: jnp.sum(
            conv_packed(pack_offset(v), K2, b2).astype(jnp.float32)), x, iters, flops1)
        # two chained convs: direct vs packed with mid realign (the stage-1
        # shape: conv1a 64->64 then conv1b 64->64, pool folded separately)
        timed(f"direct x2                   ", lambda v: jnp.sum(
            conv_direct(conv_direct(v, K, b), K, b).astype(jnp.float32)),
            x, iters, 2 * flops1)
        timed(f"packed x2 (mid realign)     ", lambda v: jnp.sum(
            conv_packed(realign(conv_packed(v, K2, b2)), K2, b2).astype(jnp.float32)),
            xo, iters, 2 * flops1)
        # packed conv straight into the 2x2 pool: width max = phase max
        def packed_pool(v):
            y = conv_packed(v, K2, b2)
            Cc = C
            m = jnp.maximum(y[..., :Cc], y[..., Cc:])  # width pairs
            m = jax.lax.reduce_window(
                m, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
            )
            return jnp.sum(m.astype(jnp.float32))

        def direct_pool(v):
            y = conv_direct(v, K, b)
            m = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            return jnp.sum(m.astype(jnp.float32))

        timed(f"direct+pool                 ", direct_pool, x, iters, flops1)
        timed(f"packed+pool (phase max)     ", packed_pool, xo, iters, flops1)



def diag_stage0():
    """Why does w2d_levels=1 regress the pipeline? Time stage-0 pieces:
    the 1-channel packed conv0_0 is the suspect (contraction 12 at 128-out
    vs direct's im2col-friendly 1-channel form).

    Usage: timeout 1800 python scripts/bench_conv_packing.py --stage0
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    H, W, C = 480, 640, 64
    img = jnp.asarray(rng.rand(BATCH, H, W, 1), jnp.bfloat16)
    K0 = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.bfloat16)
    b0 = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    K0p = pack_kernel(K0).astype(jnp.bfloat16)  # (3, 2, 2, 2C)
    b0p = jnp.tile(b0, 2)
    flops0 = BATCH * H * W * 9 * 1 * C * 2

    timed("conv0_0 direct 1->64        ", lambda v: jnp.sum(
        conv_direct(v, K0, b0).astype(jnp.float32)), img, 24, flops0)
    imgp = jnp.asarray(
        np.pad(np.asarray(img, np.float32), ((0, 0), (0, 0), (1, 1), (0, 0)))
        .reshape(BATCH, H, (W + 2) // 2, 2), jnp.bfloat16)
    timed("conv0_0 packed (3,2,2,128)  ", lambda v: jnp.sum(
        conv_packed(v, K0p, b0p).astype(jnp.float32)), imgp, 24, flops0)
    # direct conv0_0 then pack its output (pack once per image instead)
    timed("conv0_0 direct + pack output", lambda v: jnp.sum(
        pack_offset(conv_direct(v, K0, b0)).astype(jnp.float32)), img, 24,
        flops0)
    # unpack cost at stage-1 input size
    yoff = jnp.asarray(rng.rand(BATCH, H // 2, W // 4 + 1, 2 * C), jnp.bfloat16)
    timed("unpack @240x(161)x128       ", lambda v: jnp.sum(
        unpack(v[:, :, :-1], W // 2).astype(jnp.float32)), yoff, 48)


def diag_stage_chain():
    """Time FULL production stage chains (conv+conv+pool composed exactly as
    superpoint.py does, incl. the parity-B phantom mask and the folded pool)
    to localize the w2d pipeline regression at stage granularity — the
    isolated-op numbers (diag_stage0, main) say packed should win, yet the
    full flagship measured 3.6 ms/batch SLOWER with w2d1.

    Usage: timeout 2400 python scripts/bench_conv_packing.py --chain
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models.extractors.superpoint import (
        _pack_offset, _unpack_offset, _w2d_kernel, _w2d_pool,
    )
    from flax import linen as nn

    rng = np.random.RandomState(0)

    def conv_A(x_off, K2, b):
        y = jax.lax.conv_general_dilated(
            x_off, K2, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + jnp.tile(b, 2))

    def conv_B(x_al, K2, b):
        y = jax.lax.conv_general_dilated(
            x_al, K2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.nn.relu(y + jnp.tile(b, 2))
        Co = y.shape[-1] // 2
        mask = np.ones((1, 1, y.shape[2], 2 * Co), np.float32)
        mask[:, :, 0, :Co] = 0.0
        mask[:, :, -1, Co:] = 0.0
        return y * jnp.asarray(mask, y.dtype)

    # ---- stage 0: 1 -> 64 -> 64 + pool @640x480 ----
    H, W, C = 480, 640, 64
    img = jnp.asarray(rng.rand(BATCH, H, W, 1), jnp.bfloat16)
    K0 = jnp.asarray(rng.randn(3, 3, 1, C) * 0.3, jnp.bfloat16)
    b0 = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    K1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    K0p = _w2d_kernel(K0).astype(jnp.bfloat16)
    K1p = _w2d_kernel(K1).astype(jnp.bfloat16)
    flops = BATCH * H * W * 9 * (1 + C) * C * 2

    def s0_direct(v):
        y = conv_direct(v, K0, b0)
        y = conv_direct(y, K1, b1)
        m = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(m.astype(jnp.float32))

    def s0_packed(v):
        y = conv_A(_pack_offset(v), K0p, b0)
        y = conv_B(y, K1p, b1)
        return jnp.sum(_w2d_pool(y).astype(jnp.float32))

    def s0_native_entry(v):
        y0 = conv_direct(v, K0, b0)
        B_, H_, W_, C_ = y0.shape
        y = y0.reshape(B_, H_, W_ // 2, 2 * C_)
        y = conv_B(y, K1p, b1)
        return jnp.sum(_w2d_pool(y).astype(jnp.float32))

    timed("s0 direct  (c+c+pool)       ", s0_direct, img, 24, flops)
    timed("s0 packed  (pack+A+B+fpool) ", s0_packed, img, 24, flops)
    timed("s0 native entry (c+B+fpool) ", s0_native_entry, img, 24, flops)

    # ---- stage 1: 64 -> 64 -> 64 + pool @320x240, packed input arrives
    # offset-packed from stage 0 (chain) vs direct ----
    H2, W2 = 240, 320
    x1 = jnp.asarray(rng.rand(BATCH, H2, W2, C), jnp.bfloat16)
    x1off = jnp.asarray(np.asarray(_pack_offset(x1), np.float32), jnp.bfloat16)
    flops2 = BATCH * H2 * W2 * 9 * 2 * C * C * 2

    def s1_direct(v):
        y = conv_direct(conv_direct(v, K1, b1), K1, b1)
        m = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(m.astype(jnp.float32))

    def s1_packed(v):
        y = conv_B(conv_A(v, K1p, b1), K1p, b1)
        return jnp.sum(_w2d_pool(y).astype(jnp.float32))

    def s1_packed_unpack(v):
        # chain exit cost: stage 1 packed, then unpack for a standard stage 2
        y = conv_B(conv_A(v, K1p, b1), K1p, b1)
        return jnp.sum(_unpack_offset(_w2d_pool(y)).astype(jnp.float32))

    timed("s1 direct  (c+c+pool)       ", s1_direct, x1, 48, flops2)
    timed("s1 packed  (A+B+fpool)      ", s1_packed, x1off, 48, flops2)
    timed("s1 packed + unpack exit     ", s1_packed_unpack, x1off, 48, flops2)

    # ---- layout-hypothesis variants: is the chain loss XLA relayouts
    # around the odd tile-hostile widths (321/322)? ----
    def s0_packed_pad384(v):
        # keep every packed intermediate at width 384 (3x128 tiles).
        # TIMING-ONLY: conv_A's extra col 320 (real col 640 + a zero) makes
        # conv_B's border col differ from production SAME semantics
        y = _pack_offset(v)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 384 - y.shape[2]), (0, 0)))
        y = conv_A(y, K0p, b0)  # (B, H, 383, 128) aligned(+pad)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 384 - y.shape[2]), (0, 0)))
        y = conv_B(y, K1p, b1)  # (B, H, 385, 128)
        return jnp.sum(_w2d_pool(y[:, :, :321]).astype(jnp.float32))

    def s0_packed_nomask(v):
        # drop the parity-B phantom zero-mask (inexact at the border pair;
        # timing-only variant to cost the extra full-res elementwise pass)
        y = conv_A(_pack_offset(v), K0p, b0)
        y2 = jax.lax.conv_general_dilated(
            y, K1p, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y2 = jax.nn.relu(y2 + jnp.tile(b1, 2))
        return jnp.sum(_w2d_pool(y2).astype(jnp.float32))

    timed("s0 packed pad384 widths     ", s0_packed_pad384, img, 24, flops)
    timed("s0 packed no phantom mask   ", s0_packed_nomask, img, 24, flops)

    # ---- fused Pallas w2d kernels (ops/pallas_w2d.py): the chain
    # composition in VMEM instead of XLA ----
    from gluefactory_tpu.ops import pallas_w2d as pw

    def s0_pallas(br):
        def fn(v):
            y = conv_A(_pack_offset(v), K0p, b0)  # XLA packed conv0_0
            return jnp.sum(
                pw.fused_w2d_tail(y, K1p, b1, block_rows=br)
                .astype(jnp.float32))
        return fn

    def s1_pallas(br):
        def fn(v):
            return jnp.sum(
                pw.fused_w2d_stage(v, K1p, b1, K1p, b1, block_rows=br)
                .astype(jnp.float32))
        return fn

    # on-chip exactness vs the XLA packed chain (interpret-mode tests do
    # not catch Mosaic lowering bugs — compare real-chip checksums)
    try:
        a_chk = float(jax.device_get(jax.jit(s0_packed)(img)))
        b_chk = float(jax.device_get(jax.jit(s0_pallas(8))(img)))
        print(f"s0 pallas on-chip rel-delta: "
              f"{abs(a_chk - b_chk) / max(abs(a_chk), 1.0):.2e}", flush=True)
        a_chk = float(jax.device_get(jax.jit(s1_packed)(x1off)))
        b_chk = float(jax.device_get(jax.jit(s1_pallas(8))(x1off)))
        print(f"s1 pallas on-chip rel-delta: "
              f"{abs(a_chk - b_chk) / max(abs(a_chk), 1.0):.2e}", flush=True)
    except Exception as e:
        print(f"pallas exactness check: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    for br in (8, 12, 16):
        try:
            timed(f"s0 pallas tail br={br:<2}       ", s0_pallas(br),
                  img, 24, flops)
        except Exception as e:
            print(f"s0 pallas br={br}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    for br in (8, 16, 24):
        try:
            timed(f"s1 pallas stage br={br:<2}      ", s1_pallas(br),
                  x1off, 48, flops2)
        except Exception as e:
            print(f"s1 pallas br={br}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    import sys as _sys

    if "--chain" in _sys.argv:
        diag_stage_chain()
    elif "--stage0" in _sys.argv:
        diag_stage0()
    else:
        main()
