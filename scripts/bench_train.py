"""Training-step throughput on the flagship config (frozen SuperPoint +
trainable LightGlue on synthetic homographies), bench.py measurement pattern:
all steps forced through one jitted lax.scan with a data dependency, RPC
floor subtracted. Prints ms/step and steps/s for B=32 @ 512 kpts."""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 32
ITERS = 6
SIZE = (320, 240)  # (w, h)
NUM_KPTS = 512


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.train.trainer import (
        TrainState,
        build_optimizer,
        default_train_conf,
        make_step_fns,
    )

    conf = Config(
        {
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": NUM_KPTS,
                    "detection_threshold": 0.0005,
                    "channels": [64, 64, 128, 128, 256],
                    "dtype": "bfloat16",
                    "trainable": False,
                },
                "ground_truth": {"name": "homography_matcher"},
                "matcher": {
                    "name": "lightglue",
                    "n_layers": 9,
                    "descriptor_dim": 256,
                    "dtype": "bfloat16",
                },
            },
            "train": {"lr": 1e-4},
        }
    )
    full_train = Config(dict(default_train_conf))
    full_train.merge_(conf.train)
    conf = Config({"model": conf.model, "train": full_train})
    rng = np.random.RandomState(0)
    w, h = SIZE
    imgs0 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    imgs1 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    H = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (ITERS, BATCH, 3, 3))

    model = get_model("two_view_pipeline").from_conf(conf.model)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])

    def batch(i0, i1, Hm):
        return {
            "view0": {"image": i0},
            "view1": {"image": i1},
            "H_0to1": Hm,
        }

    data0 = batch(imgs0[0], imgs1[0], H[0])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        data0,
        train=True,
    )
    tx = build_optimizer(conf.train, conf.model)
    state = TrainState(
        params, tx.init(params), jnp.int32(0), jax.random.PRNGKey(2)
    )
    train_step, _, _ = make_step_fns(model, tx, mesh)

    def run(state, i0s, i1s, Hs):
        def body(st, xs):
            st, losses, _, _ = train_step(st, batch(*xs))
            return st, losses["total"]

        st, tot = jax.lax.scan(body, state, (i0s, i1s, Hs))
        return jnp.sum(tot) + jnp.sum(st.step.astype(jnp.float32))

    run_jit = jax.jit(run)
    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(run_jit(state, imgs0, imgs1, H)))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    times = []
    for i in range(4):
        i0 = imgs0.at[0, 0, 0, 0, 0].add(1e-4 * (i + 1))
        t0 = time.perf_counter()
        float(jax.device_get(run_jit(state, i0, imgs1, H)))
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-6) / ITERS
    print(
        json.dumps(
            {
                "metric": "train_steps_per_s_sp_lg_b32_512kpts",
                "ms_per_step": round(dt * 1000.0, 2),
                "steps_per_s": round(1.0 / dt, 3),
                "pairs_per_s": round(BATCH / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
