"""On-chip A/B: SuperPoint w2d packed-conv scales in the full flagship
pipeline, ONE process (cross-process tunnel variance ±20-30%, CLAUDE.md).

Variants: r4 winner (fused_layer+kexit), + w2d_levels 1 / 2.
Exactness gate: every variant's checksum must match the baseline's
(w2d is algebraically exact; bf16 conv reassociation can flip borderline
keypoints, so a small tolerance is reported, not assumed).

Usage: timeout 2400 python scripts/bench_ab_w2d.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, ITERS, SIZE, NUM_KPTS = 8, 24, (640, 480), 1024


def build(extractor_extra, matcher_extra):
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    conf = {
        "name": "two_view_pipeline",
        "extractor": {
            "name": "superpoint",
            "max_num_keypoints": NUM_KPTS,
            "detection_threshold": 0.0005,
            "channels": [64, 64, 128, 128, 256],
            "dtype": "bfloat16",
            **extractor_extra,
        },
        "matcher": {
            "name": "lightglue",
            "n_layers": 9,
            "descriptor_dim": 256,
            "num_heads": 4,
            "dtype": "bfloat16",
            "qkv_layout": "3hd",
            "merge_cross_proj": True,
            "scan_unroll": 9,
            "fold_out_proj": True,
            **matcher_extra,
        },
    }
    model = get_model("two_view_pipeline").from_conf(conf)
    rng = np.random.RandomState(0)
    w, h = SIZE
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))
    i0 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    i1 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    data0 = {
        "view0": {"image": i0[0], "image_size": sz},
        "view1": {"image": i1[0], "image_size": sz},
    }
    variables = model.init(jax.random.PRNGKey(0), data0, train=False)

    def run_all(v, a, b):
        def body(c, xs):
            x, y = xs
            pred = model.apply(
                v,
                {
                    "view0": {"image": x, "image_size": sz},
                    "view1": {"image": y, "image_size": sz},
                },
                train=False,
            )
            return c + jnp.sum(pred["matches0"]) + jnp.sum(
                pred["matching_scores0"]
            ), None

        out, _ = jax.lax.scan(body, jnp.float32(0), (a, b))
        return out

    return jax.jit(run_all), (variables, i0, i1)


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

    fused = {"fused_layer": True, "kernel_exit_head": True}
    variants = {
        "r4_winner": ({}, fused),
        "w2d3": ({"w2d_levels": 3}, fused),
        "w2d2": ({"w2d_levels": 2}, fused),
        "w2d1": ({"w2d_levels": 1}, fused),
    }
    out = {}
    ref = None
    for name, (ee, me) in variants.items():
        run_jit, args = build(ee, me)
        try:
            chk = float(jax.device_get(run_jit(*args)))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            out[name] = None
            continue
        if name == "r4_winner":
            ref = chk
        elif ref is not None:
            rel = abs(chk - ref) / max(abs(ref), 1.0)
            print(f"{name}: checksum rel-delta {rel:.2e}", file=sys.stderr)
            if rel > 0.05:
                out[name] = f"inexact rel={rel:.3f}"
                continue
        times = []
        for i in range(5):
            v, a, b = args
            a = a.at[0, 0, 0, 0, 0].add(1e-4 * (i + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(v, a, b)))
            times.append(time.perf_counter() - t0)
        dt = max(float(np.min(times)) - floor, 1e-6)
        out[name] = round(BATCH * ITERS / dt, 2)
        print(f"{name}: {out[name]} pairs/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
