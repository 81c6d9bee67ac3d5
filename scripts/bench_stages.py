"""Per-stage TPU timing for the flagship pipeline (bench.py measurement
pattern: all compute forced through one jitted lax.scan with a data-dependent
checksum; RPC floor subtracted). Prints ms per B=8 batch for each stage."""

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


def timed(run_jit, floor, args):
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        import jax

        float(jax.device_get(run_jit(*args)))
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - floor, 1e-6) / ITERS * 1000.0  # ms/batch


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    rng = np.random.RandomState(0)
    w, h = SIZE
    # realistic scene content (not noise): exercises true NMS/top-k load
    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    scenes = np.stack(
        [
            np.mean(generate_synthetic_image(rng, w, h), -1, keepdims=True)
            for _ in range(ITERS * BATCH)
        ]
    ).reshape(ITERS, BATCH, h, w, 1)
    imgs = jnp.asarray(scenes, jnp.float32)
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"rpc floor: {floor*1000:.1f} ms", file=sys.stderr)

    sp_conf = {
        "name": "superpoint",
        "max_num_keypoints": NUM_KPTS,
        "detection_threshold": 0.0005,
        "channels": [64, 64, 128, 128, 256],
        "dtype": "bfloat16",
        "dense_outputs": False,
    }
    sp = get_model("superpoint").from_conf(sp_conf)
    v_sp = sp.init(jax.random.PRNGKey(0), {"image": imgs[0]}, train=False)

    out = {}

    # (a) full superpoint
    def run_sp(v, ims):
        def body(c, im):
            p = sp.apply(v, {"image": im, "image_size": sz}, train=False)
            return c + jnp.sum(p["keypoints"]) + jnp.sum(p["descriptors"]), None

        o, _ = jax.lax.scan(body, jnp.float32(0), ims)
        return o

    j = jax.jit(run_sp)
    float(jax.device_get(j(v_sp, imgs)))
    out["superpoint_full_ms"] = timed(j, floor, (v_sp, imgs))

    # (b) backbone+heads only (dense maps, no NMS/topk/sampling)
    sp_dense = get_model("superpoint").from_conf(
        {**sp_conf, "max_num_keypoints": 1, "dense_outputs": True}
    )

    def run_dense(v, ims):
        def body(c, im):
            p = sp_dense.apply(v, {"image": im}, train=False)
            return c + jnp.sum(p["dense_scores"]) + jnp.sum(
                p["dense_descriptors"].astype(jnp.float32)
            ), None

        o, _ = jax.lax.scan(body, jnp.float32(0), ims)
        return o

    j = jax.jit(run_dense)
    float(jax.device_get(j(v_sp, imgs)))
    out["superpoint_dense_ms"] = timed(j, floor, (v_sp, imgs))

    # (c) lightglue only on random keypoint sets
    lg = get_model("lightglue").from_conf(
        {
            "name": "lightglue",
            "n_layers": 9,
            "descriptor_dim": 256,
            "num_heads": 4,
            "dtype": "bfloat16",
        }
    )
    kp = jnp.asarray(rng.rand(ITERS, BATCH, NUM_KPTS, 2) * 480, jnp.float32)
    ds = jnp.asarray(rng.randn(ITERS, BATCH, NUM_KPTS, 256), jnp.float32)
    d0 = {
        "keypoints0": kp[0],
        "keypoints1": kp[0],
        "descriptors0": ds[0],
        "descriptors1": ds[0],
    }
    v_lg = lg.init(jax.random.PRNGKey(0), d0, train=False)

    def run_lg(v, kps, dss):
        def body(c, x):
            k_, d_ = x
            p = lg.apply(
                v,
                {
                    "keypoints0": k_,
                    "keypoints1": k_,
                    "descriptors0": d_,
                    "descriptors1": d_,
                },
                train=False,
            )
            return c + jnp.sum(p["matching_scores0"]), None

        o, _ = jax.lax.scan(body, jnp.float32(0), (kps, dss))
        return o

    j = jax.jit(run_lg)
    float(jax.device_get(j(v_lg, kp, ds)))
    out["lightglue_ms"] = timed(j, floor, (v_lg, kp, ds))

    out["nms_topk_sample_ms"] = out["superpoint_full_ms"] - out["superpoint_dense_ms"]
    # pipeline estimate: 2 extractions + 1 match
    out["pipeline_est_ms"] = 2 * out["superpoint_full_ms"] + out["lightglue_ms"]
    out["pairs_per_s_est"] = BATCH / (out["pipeline_est_ms"] / 1000.0)
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
