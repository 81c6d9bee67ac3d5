"""On-chip batch-size sweep for the LoFTR bench configuration.

The flagship settled on B=8 (conv memory cliff above that); LoFTR's bench
batch (B=2) predates any measurement. Same scan-amortized protocol as
bench.py; pairs/s per variant, one process.

Usage: timeout 2400 python scripts/bench_loftr_batch.py [conf overrides JSON]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE = (640, 480)
REPS = 5


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    w, h = SIZE

    floor_jit = jax.jit(lambda t: t + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"floor {floor*1000:.1f} ms", file=sys.stderr)

    model = get_model("loftr").from_conf({"max_num_matches": 1024, **overrides})
    out = {}
    for B, iters in ((2, 8), (4, 4), (8, 2), (16, 1)):
        rng = np.random.RandomState(0)
        im0 = jnp.asarray(rng.rand(iters, B, h, w, 1), jnp.float32)
        im1 = jnp.asarray(rng.rand(iters, B, h, w, 1), jnp.float32)
        d0 = {"view0": {"image": im0[0]}, "view1": {"image": im1[0]}}

        def run_all(v, a, b):
            def body(c, xs):
                x, y = xs
                pred = model.apply(
                    v, {"view0": {"image": x}, "view1": {"image": y}},
                    train=False)
                return c + jnp.sum(pred["matching_scores0"]), None

            o, _ = jax.lax.scan(body, jnp.float32(0), (a, b))
            return o

        run_jit = jax.jit(run_all)
        try:
            variables = model.init(jax.random.PRNGKey(0), d0, train=False)
            float(jax.device_get(run_jit(variables, im0, im1)))
        except Exception as e:
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            out[f"B{B}"] = None
            continue
        times = []
        for r in range(REPS):
            a = im0.at[0, 0, 0, 0, 0].add(1e-4 * (r + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(variables, a, im1)))
            times.append(time.perf_counter() - t0)
        dt = max(float(np.min(times)) - floor, 1e-6)
        out[f"B{B}"] = round(B * iters / dt, 2)
        print(f"B={B}: {out[f'B{B}']} pairs/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
