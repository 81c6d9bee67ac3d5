"""Benchmark: matched pairs/s of the flagship SuperPoint+LightGlue pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement design (robust to async/caching RPC runtimes like the axon
tunnel): all ITERS distinct batches are processed inside ONE jitted
`lax.scan` whose carry accumulates a checksum — every batch's compute is
forced by a data dependency and exactly one scalar round-trip happens. The
RPC floor is measured with an empty scan and subtracted.

Baseline: the reference stack (torch SP+LG with FlashAttention) at 1024
keypoints / 640x480 runs ~55 pairs/s on an RTX 3090 (derived from the
LightGlue paper's per-pair timings; the reference repo publishes no
throughput numbers, SURVEY.md §6). BASELINE.md's north star is >=5x/chip.
"""

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 55.0
BATCH = 8
# 24 iters x ~30 ms/batch ≈ 0.7 s of forced compute per timed call: the
# ~30 ms RPC floor (subtracted, but noisy at ±10 ms) drops to <2% of the
# signal. 12 iters left the floor variance at ~5-8% of the measurement.
ITERS = 24
SIZE = (640, 480)  # (w, h)
NUM_KPTS = 1024


def main():
    import jax

    # persistent compile cache: repeated driver runs skip the cold XLA compile
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
        },
        "matcher": {
            "name": "lightglue",
            "n_layers": 9,
            "descriptor_dim": 256,
            "num_heads": 4,
            "dtype": "bfloat16",
        },
    }
    model = get_model("two_view_pipeline").from_conf(conf)

    rng = np.random.RandomState(0)
    w, h = SIZE
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))
    # ITERS distinct stacked batches: (ITERS, B, h, w, 1)
    imgs0 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    imgs1 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)

    data0 = {
        "view0": {"image": imgs0[0], "image_size": sz},
        "view1": {"image": imgs1[0], "image_size": sz},
    }
    variables = model.init(jax.random.PRNGKey(0), data0, train=False)

    def run_all(v, i0, i1):
        def body(carry, xs):
            im0, im1 = xs
            pred = model.apply(
                v,
                {
                    "view0": {"image": im0, "image_size": sz},
                    "view1": {"image": im1, "image_size": sz},
                },
                train=False,
            )
            return carry + jnp.sum(pred["matches0"]) + jnp.sum(
                pred["matching_scores0"]
            ), None

        out, _ = jax.lax.scan(body, jnp.float32(0), (i0, i1))
        return out

    run_jit = jax.jit(run_all)
    # measure the RPC floor with a no-compute function
    floor_jit = jax.jit(lambda x: x + 1)

    # warmup / compile
    float(jax.device_get(run_jit(variables, imgs0, imgs1)))
    float(jax.device_get(floor_jit(jnp.float32(0))))

    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    times = []
    for i in range(5):
        # perturb one pixel so runs are distinct end-to-end
        i0 = imgs0.at[0, 0, 0, 0, 0].add(1e-4 * (i + 1))
        t0 = time.perf_counter()
        float(jax.device_get(run_jit(variables, i0, imgs1)))
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-6)

    pairs_per_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "matched_pairs_per_s_sp_lg_1024kpts_640x480",
                "value": round(pairs_per_s, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
