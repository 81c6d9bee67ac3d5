"""Benchmark: matched pairs/s of the flagship SuperPoint+LightGlue pipeline.

Runs on whatever accelerator JAX sees (the driver provides one real TPU chip).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference stack (torch SP+LG, FlashAttention) processes ~55
pairs/s on an RTX 3090 at 1024 keypoints / 640x480 (derived from the
LightGlue paper's ~18 ms/pair matcher+extractor timings; the reference repo
publishes no throughput numbers, SURVEY.md §6). BASELINE.md's north star is
>=5x that per chip.
"""

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 55.0
BATCH = 8
SIZE = (640, 480)  # (w, h)
NUM_KPTS = 1024
WARMUP = 2
ITERS = 10


def main():
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
        },
        "matcher": {
            "name": "lightglue",
            "n_layers": 9,
            "descriptor_dim": 256,
            "num_heads": 4,
        },
    }
    model = get_model("two_view_pipeline").from_conf(conf)

    rng = np.random.RandomState(0)
    w, h = SIZE
    img0 = jnp.asarray(rng.rand(BATCH, h, w, 1), jnp.bfloat16).astype(jnp.float32)
    img1 = jnp.asarray(rng.rand(BATCH, h, w, 1), jnp.float32)
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))
    data = {
        "view0": {"image": img0, "image_size": sz},
        "view1": {"image": img1, "image_size": sz},
    }
    variables = model.init(jax.random.PRNGKey(0), data, train=False)

    fwd = jax.jit(lambda v, d: model.apply(v, d, train=False))
    out = fwd(variables, data)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(fwd(variables, data))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(variables, data)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

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
