"""Micro-benchmark of a jitted callable (reference `gluefactory/utils/benchmark.py:7-33`).

`block_until_ready` plays the role of cuda.synchronize.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def benchmark(fn, *args, r: int = 100, warmup: int = 3) -> dict:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(r):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000)
    times = np.asarray(times)
    return {
        "mean_ms": float(times.mean()),
        "median_ms": float(np.median(times)),
        "std_ms": float(times.std()),
        "min_ms": float(times.min()),
    }
