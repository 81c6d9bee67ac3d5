"""Micro-bench of the SuperPoint post-dense keypoint chain on TPU:
simple_nms vs top_k_keypoints vs sample_descriptors (bench.py pattern)."""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 8
ITERS = 12
H, W = 480, 640
K = 1024


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.ops.keypoints import (
        remove_borders,
        sample_descriptors,
        simple_nms,
        top_k_keypoints,
    )

    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.rand(ITERS, BATCH, H, W), jnp.float32) ** 4
    desc = jnp.asarray(rng.randn(ITERS, BATCH, 256, H // 8, W // 8), jnp.float32)

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    def timeit(fn, *args):
        j = jax.jit(fn)
        float(jax.device_get(j(*args)))
        ts = []
        for i in range(4):
            args_i = (args[0].at[0, 0, 0, 0].add(1e-6 * (i + 1)),) + args[1:]
            t0 = time.perf_counter()
            float(jax.device_get(j(*args_i)))
            ts.append(time.perf_counter() - t0)
        return max(float(np.median(ts)) - floor, 1e-6) / ITERS * 1000.0

    out = {}

    def run_nms(s):
        def body(c, x):
            n = simple_nms(x, 4)
            return c + jnp.sum(n), None

        o, _ = jax.lax.scan(body, jnp.float32(0), s)
        return o

    out["nms_ms"] = timeit(run_nms, scores)

    def run_nms_topk(s):
        def body(c, x):
            n = remove_borders(simple_nms(x, 4), 4)
            kpts, ks, v = top_k_keypoints(n, K, 0.0005, nms_radius=4)
            return c + jnp.sum(kpts) + jnp.sum(ks), None

        o, _ = jax.lax.scan(body, jnp.float32(0), s)
        return o

    out["nms_topk_ms"] = timeit(run_nms_topk, scores)

    def run_sample(s, d):
        def body(c, x):
            sc, dd = x
            n = remove_borders(simple_nms(sc, 4), 4)
            kpts, ks, v = top_k_keypoints(n, K, 0.0005, nms_radius=4)
            smp = sample_descriptors(kpts, dd, 8)
            return c + jnp.sum(smp), None

        o, _ = jax.lax.scan(body, jnp.float32(0), (s, d))
        return o

    out["nms_topk_sample_ms"] = timeit(run_sample, scores, desc)
    out["topk_only_ms"] = out["nms_topk_ms"] - out["nms_ms"]
    out["sample_only_ms"] = out["nms_topk_sample_ms"] - out["nms_topk_ms"]
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
