"""On-chip validation + timing of the fused Pallas exit head
(`ops/pallas_assignment.py`, gated by `matcher.kernel_exit_head`).

Runs the flagship SP+LG pipeline twice with identical params — XLA exit
head vs fused Pallas kernel — on the real TPU, checks the match outputs
agree, and times both with the bench.py protocol (lax.scan data dependency
+ RPC-floor subtraction). Prints one JSON line with the verdict.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 8
ITERS = 12
SIZE = (640, 480)
NUM_KPTS = 1024


def build(kernel: bool):
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
            "kernel_exit_head": kernel,
        },
    }
    return get_model("two_view_pipeline").from_conf(conf)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    rng = np.random.RandomState(0)
    w, h = SIZE
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))
    imgs = np.stack(
        [
            np.mean(
                np.stack(
                    [generate_synthetic_image(rng, w, h) for _ in range(BATCH)]
                ),
                -1,
                keepdims=True,
            )
            for _ in range(2 * ITERS)
        ]
    ).astype(np.float32)
    imgs0 = jnp.asarray(imgs[:ITERS])
    imgs1 = jnp.asarray(imgs[ITERS:])

    m_xla = build(False)
    m_ker = build(True)
    data0 = {
        "view0": {"image": imgs0[0], "image_size": sz},
        "view1": {"image": imgs1[0], "image_size": sz},
    }
    variables = m_xla.init(jax.random.PRNGKey(0), data0, train=False)

    # ---- correctness: same params, one batch, compare matches
    p_x = jax.jit(lambda v, d: m_xla.apply(v, d, train=False))(variables, data0)
    p_k = jax.jit(lambda v, d: m_ker.apply(v, d, train=False))(variables, data0)
    m0x = np.asarray(jax.device_get(p_x["matches0"]))
    m0k = np.asarray(jax.device_get(p_k["matches0"]))
    s0x = np.asarray(jax.device_get(p_x["matching_scores0"]))
    s0k = np.asarray(jax.device_get(p_k["matching_scores0"]))
    agree = float(np.mean(m0x == m0k))
    max_ds = float(np.max(np.abs(s0x - s0k)))

    # ---- timing: full pipeline, both variants, scan-checksum protocol
    def make_run(model):
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

        return jax.jit(run_all)

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    out = {}
    for name, model in (("xla", m_xla), ("kernel", m_ker)):
        run_jit = make_run(model)
        float(jax.device_get(run_jit(variables, imgs0, imgs1)))  # compile
        times = []
        for i in range(5):
            i0 = imgs0.at[0, 0, 0, 0, 0].add(1e-4 * (i + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(variables, i0, imgs1)))
            times.append(time.perf_counter() - t0)
        dt = max(float(np.median(times)) - floor, 1e-6)
        out[name] = round(BATCH * ITERS / dt, 2)

    print(
        json.dumps(
            {
                "match_agreement": round(agree, 5),
                "max_score_delta": round(max_ds, 5),
                "pairs_per_s": out,
                "verdict": (
                    "enable"
                    if agree > 0.999 and max_ds < 1e-2
                    and out["kernel"] > out["xla"]
                    else "keep-off"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
