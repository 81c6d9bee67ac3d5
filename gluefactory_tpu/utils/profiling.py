"""Profiling helpers (reference SURVEY.md §5.1: the TPU analog of
torch.profiler + the fork's per-stage CUDA timing).

- `profile_trace(logdir)`: context manager around `jax.profiler` — produces
  a TensorBoard-viewable trace of device execution.
- `time_pipeline_stages(...)`: per-stage wall times by running the
  extractor/matcher as separately-jitted programs with `block_until_ready`
  (the `_profile_call` analog, reference `two_view_pipeline.py:78-102`);
  results use the same key names the fork exports (`extractor_time_ms`, ...).
- `device_memory_stats()`: per-device allocation snapshot.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def profile_trace(logdir: str):
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out


def _timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def time_pipeline_stages(pipeline, variables, data, reps: int = 10) -> dict:
    """Per-stage timing of a TwoViewPipeline (extractor / matcher / full).

    Returns the fork's metric names: extractor_time_ms, matcher_time_ms,
    total_time_ms, + memory (device stats deltas are TPU-approximate).
    """
    results = {}

    ex = jax.jit(
        lambda v, d: pipeline.apply(v, d, method=lambda m, dd: m.extract_view(dd, "0"))
    )
    t_ex, pred0 = _timed(ex, variables, data, reps=reps)
    results["extractor_time_ms"] = t_ex

    full = jax.jit(lambda v, d: pipeline.apply(v, d))
    t_total, pred = _timed(full, variables, data, reps=reps)
    results["total_time_ms"] = t_total
    # matcher = total - 2x extraction (both views)
    results["matcher_time_ms"] = max(t_total - 2 * t_ex, 0.0)
    mem = device_memory_stats()
    first = next(iter(mem.values()))
    if first.get("peak_bytes_in_use"):
        results["forward_allocated_memory_mb"] = first["peak_bytes_in_use"] / 2**20
    img = data["view0"].get("image")
    if img is not None:
        results["pair_resolution"] = float(img.shape[1] * img.shape[2])
    return results
