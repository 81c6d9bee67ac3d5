"""Decompose the LightGlue layer body on-chip: which of the ~1.2 ms/layer
(at ~32% MXU) is attention, dense chain, FFN, rotary, heads.

Measurement: bench.py pattern — each variant runs REPS sequential
applications inside ONE jitted lax.scan with a carry checksum; RPC floor
subtracted; reports ms per single application (divide by REPS).
48+ reps so sub-ms ops clear the ~30 ms floor (CLAUDE.md r2 lesson).
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 8  # per view; stacked tensor is 2B
N = 1024
D = 256
H = 4
REPS = 64


def timed(fn, floor, *args):
    import jax

    float(jax.device_get(fn(*args)))  # compile
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args)))
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - floor, 1e-9) / REPS * 1000.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import flax.linen as nn
    import jax.numpy as jnp

    from gluefactory_tpu.models.matchers.lightglue import (
        CrossBlock,
        SelfBlock,
    )
    from gluefactory_tpu.ops.attention import (
        apply_cached_rotary_emb,
        bidirectional_cross_attention,
        masked_attention,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2 * B, N, D) * 0.1, jnp.bfloat16)
    enc = jnp.asarray(rng.randn(2 * B, N, 2, D // H // 2), jnp.float32)
    mask = jnp.ones((2 * B, N), bool)
    m0, m1 = mask[:B], mask[B:]
    q = jnp.asarray(rng.randn(2 * B, H, N, D // H) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(2 * B, H, N, D // H) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(2 * B, H, N, D // H) * 0.1, jnp.bfloat16)

    self_blk = SelfBlock(D, H, "bfloat16")
    cross_blk = CrossBlock(D, H, "bfloat16")
    vs = self_blk.init(jax.random.PRNGKey(0), x, enc, mask)
    vc = cross_blk.init(jax.random.PRNGKey(0), x, m0, m1)

    def scan_over(fn, val):
        def run(*args):
            def body(c, _):
                out = fn(c, *args)
                return out.astype(c.dtype), None

            o, _ = jax.lax.scan(body, val, None, length=REPS)
            return jnp.sum(o.astype(jnp.float32))

        return jax.jit(run)

    floor_jit = jax.jit(lambda t: t + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"rpc floor: {floor*1000:.1f} ms", file=sys.stderr)
    out = {}

    # (a) full self block
    out["self_block_ms"] = timed(
        scan_over(lambda c: self_blk.apply(vs, c, enc, mask), x), floor
    )
    # (b) full cross block
    out["cross_block_ms"] = timed(
        scan_over(lambda c: cross_blk.apply(vc, c, m0, m1), x), floor
    )

    # (c) self attention only (rotary + fused attention), carry via q
    def self_attn(qc):
        qr = apply_cached_rotary_emb(enc, qc)
        kr = apply_cached_rotary_emb(enc, k)
        return masked_attention(qr, kr, v, mask)

    out["self_attn_rotary_ms"] = timed(scan_over(lambda c: self_attn(c), q), floor)

    # (d) attention only, no rotary
    out["self_attn_ms"] = timed(
        scan_over(lambda c: masked_attention(c, k, v, mask), q), floor
    )

    # (e) bidirectional cross attention only
    def cross_attn(qc):
        a, b_ = bidirectional_cross_attention(
            qc[:B], qc[B:], v[:B], v[B:], m0, m1
        )
        return jnp.concatenate([a, b_], 0)

    out["cross_attn_ms"] = timed(scan_over(lambda c: cross_attn(c), q), floor)

    # (f) dense-chain only: qkv + out_proj + ffn (self block minus attention)
    class DenseOnly(nn.Module):
        @nn.compact
        def __call__(self, xx):
            dt = jnp.bfloat16
            qkv = nn.Dense(3 * D, dtype=dt, name="Wqkv")(xx)
            msg = qkv[..., :D]  # stand-in for the attention output
            msg = nn.Dense(D, dtype=dt, name="out_proj")(msg)
            y = jnp.concatenate([xx, msg], axis=-1)
            y = nn.Dense(2 * D, dtype=dt, name="ffn0")(y)
            y = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ffn_norm")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(D, dtype=dt, name="ffn1")(y)
            return xx + y

    dense = DenseOnly()
    vd = dense.init(jax.random.PRNGKey(0), x)
    out["dense_chain_ms"] = timed(scan_over(lambda c: dense.apply(vd, c), x), floor)

    # (g) ffn only
    class FFNOnly(nn.Module):
        @nn.compact
        def __call__(self, xx):
            dt = jnp.bfloat16
            y = jnp.concatenate([xx, xx], axis=-1)
            y = nn.Dense(2 * D, dtype=dt, name="ffn0")(y)
            y = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ffn_norm")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(D, dtype=dt, name="ffn1")(y)
            return xx + y

    ffn = FFNOnly()
    vf = ffn.init(jax.random.PRNGKey(0), x)
    out["ffn_ms"] = timed(scan_over(lambda c: ffn.apply(vf, c), x), floor)

    # (h/i) fully-fused one-kernel blocks (ops/pallas_lg_layer.py), vs (a/b)
    from gluefactory_tpu.ops.pallas_lg_layer import (
        fused_cross_block,
        fused_self_block,
    )

    try:
        out["fused_self_block_ms"] = timed(
            scan_over(
                lambda c: fused_self_block(
                    c, enc.astype(c.dtype), mask, vs["params"],
                    num_heads=H, qkv_layout="dh3",
                ),
                x,
            ),
            floor,
        )
        out["fused_cross_block_ms"] = timed(
            scan_over(
                lambda c: jnp.concatenate(
                    fused_cross_block(
                        c[:B], c[B:], m0, m1, vc["params"], num_heads=H
                    ),
                    axis=0,
                ),
                x,
            ),
            floor,
        )
    except Exception as e:  # Mosaic lowering failure: report, keep the rest
        out["fused_error"] = f"{type(e).__name__}"
        print(f"fused blocks failed: {e}", file=sys.stderr)

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
