"""Compare top-k strategies on TPU for the blocked keypoint selection:
exact lax.top_k vs approx_max_k (PartialReduce custom call) at several
recall targets, on the (B, 19200) -> 1024 shape the extractor uses."""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 8
ITERS = 12
N = 19200
K = 1024


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(ITERS, BATCH, N), jnp.float32)

    floor_jit = jax.jit(lambda v: v + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    def timeit(fn):
        def run(xs):
            def body(c, xi):
                v, i = fn(xi)
                return c + jnp.sum(v) + jnp.sum(i.astype(jnp.float32)), None

            o, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return o

        j = jax.jit(run)
        float(jax.device_get(j(x)))
        ts = []
        for i in range(4):
            # perturb so the tunnel cannot cache-serve a repeated request
            xi = x.at[0, 0, 0].add(1e-6 * (i + 1))
            t0 = time.perf_counter()
            float(jax.device_get(j(xi)))
            ts.append(time.perf_counter() - t0)
        return max(float(np.median(ts)) - floor, 1e-6) / ITERS * 1000.0

    out = {
        "exact_top_k_ms": timeit(lambda v: jax.lax.top_k(v, K)),
        "approx_r100_ms": timeit(
            lambda v: jax.lax.approx_max_k(v, K, recall_target=1.0)
        ),
        "approx_r95_ms": timeit(
            lambda v: jax.lax.approx_max_k(v, K, recall_target=0.95)
        ),
        "sort_take_ms": timeit(
            lambda v: (
                jax.lax.sort(v, dimension=-1)[..., -K:],
                jnp.argsort(v, axis=-1)[..., -K:],
            )
        ),
    }
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
