"""On-chip A/B for the fused per-layer LightGlue kernels
(ops/pallas_lg_layer.py) vs the r3 combo_fold winner, ONE process
(cross-process tunnel variance ±20-30%, CLAUDE.md).

Also the on-chip EXACTNESS gate: before timing, the fused variant's matches
are compared against combo_fold's on one batch (agreement must be ~1.0) —
interpret mode cannot catch Mosaic lowering bugs, only this can.

Usage: timeout 1800 python scripts/bench_ab_fused.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_ab_r3 import BATCH, ITERS, build  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"floor {floor*1000:.1f} ms", file=sys.stderr)

    base = {
        "qkv_layout": "3hd",
        "merge_cross_proj": True,
        "scan_unroll": 9,
        "fold_out_proj": True,
    }
    variants = {
        "combo_fold": base,
        "fused": {**base, "fused_layer": True},
        "fused_u1": {**base, "fused_layer": True, "scan_unroll": 1},
        "fused_kexit": {**base, "fused_layer": True, "kernel_exit_head": True},
    }
    out = {}
    ref_matches = None
    for name, vc in variants.items():
        run_jit, args = build(vc)
        try:
            chk = float(jax.device_get(run_jit(*args)))  # compile + force
        except Exception as e:  # Mosaic lowering failures surface here
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            out[name] = None
            continue
        if name == "combo_fold":
            # the XLA ground truth: ONLY this variant may seed the gate —
            # a fused variant seeding it would make the gate self-referential
            ref_matches = chk
        elif ref_matches is None:
            print(
                f"{name}: exactness gate SKIPPED (combo_fold baseline did"
                " not run — timing only, no correctness claim)",
                file=sys.stderr,
            )
        else:
            # checksum = sum(matches0) + sum(matching_scores0) over all
            # ITERS batches: a few flipped matches move it by O(1000)
            rel = abs(chk - ref_matches) / max(abs(ref_matches), 1.0)
            print(f"{name}: checksum rel-delta {rel:.2e}", file=sys.stderr)
            if rel > 0.05:
                print(f"{name}: EXACTNESS GATE FAILED", file=sys.stderr)
                out[name] = f"inexact rel={rel:.3f}"
                continue
        times = []
        for i in range(5):
            v, a, b = args
            a = a.at[0, 0, 0, 0, 0].add(1e-4 * (i + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(v, a, b)))
            times.append(time.perf_counter() - t0)
        dt = max(float(np.median(times)) - floor, 1e-6)
        out[name] = round(BATCH * ITERS / dt, 2)
        print(f"{name}: {out[name]} pairs/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
