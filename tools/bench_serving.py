"""Latency/throughput benchmark for a serving bundle.

    python tools/bench_serving.py out/bundle [--reps 50] [--warmup 3]

Reports p50/p90/p99 end-to-end latency and pairs/s for the bundle's
recorded input spec (zero inputs; latency is shape-dependent, not
data-dependent, in this all-static-shape framework). On the axon tunnel
the RPC floor dominates single-request latency — the throughput number
uses the same request back-to-back, so compare numbers only within a run.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("bundle", type=Path)
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.utils.serving import load_bundle

    serving = load_bundle(args.bundle)
    spec = serving.meta["input_spec"]

    def build(node):
        if isinstance(node, dict) and "shape" in node and "dtype" in node:
            return jnp.zeros(tuple(node["shape"]), jnp.dtype(node["dtype"]))
        return {k: build(v) for k, v in node.items()}

    data = build(spec)
    batch = jax.tree.leaves(data)[0].shape[0]

    for _ in range(args.warmup):
        out = serving(data)
        jax.block_until_ready(out)
    lats = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        out = serving(data)
        # force a dependent scalar round-trip (block_until_ready does not
        # synchronize through the axon tunnel — CLAUDE.md)
        float(jax.device_get(jax.tree.leaves(out)[0].sum()))
        lats.append(time.perf_counter() - t0)
    lats = np.array(sorted(lats))
    p50, p90, p99 = (float(np.percentile(lats, q) * 1e3) for q in (50, 90, 99))
    print(json.dumps({
        "batch": int(batch),
        "p50_ms": round(p50, 2),
        "p90_ms": round(p90, 2),
        "p99_ms": round(p99, 2),
        "pairs_per_s": round(batch / (float(np.median(lats)) or 1e-9), 2),
        "reps": args.reps,
    }))


if __name__ == "__main__":
    main()
