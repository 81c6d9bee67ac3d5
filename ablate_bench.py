"""Stage ablation with the trusted scan-based harness (not committed to docs;
dev tool). Measures per-batch ms of SuperPoint-only, LightGlue-only, NMS-only,
topk-only, full pipeline."""

import time

import numpy as np

BATCH = 8
ITERS = 8
SIZE = (640, 480)
NUM_KPTS = 1024


def scan_time(jit_fn, xs_list, floor):
    import jax

    float(jax.device_get(jit_fn(*xs_list)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(jit_fn(*xs_list)))
        ts.append(time.perf_counter() - t0)
    return (np.median(ts) - floor) / ITERS * 1000  # ms per batch


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    w, h = SIZE
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    fs = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        fs.append(time.perf_counter() - t0)
    floor = float(np.median(fs))
    print("rpc floor ms:", floor * 1e3)

    sp = get_model("superpoint").from_conf(
        {"max_num_keypoints": NUM_KPTS, "detection_threshold": 0.0005,
         "channels": [64, 64, 128, 128, 256], "dtype": "bfloat16"}
    )
    spv = sp.init(jax.random.PRNGKey(0), {"image": imgs[0], "image_size": sz})

    def sp_scan(v, xs):
        def body(c, im):
            p = sp.apply(v, {"image": im, "image_size": sz})
            return c + jnp.sum(p["keypoint_scores"]), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    print("superpoint ms/batch:", scan_time(jax.jit(sp_scan), [spv, imgs], floor))

    # NMS + topk only over dense score maps
    scores = jnp.asarray(rng.rand(ITERS, BATCH, h, w), jnp.float32)
    from gluefactory_tpu.ops.keypoints import simple_nms, top_k_keypoints

    def nms_scan(xs):
        def body(c, s):
            return c + jnp.sum(simple_nms(s, 4)), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    print("nms ms/batch:", scan_time(jax.jit(nms_scan), [scores], floor))

    def topk_scan(xs):
        def body(c, s):
            k, v, val = top_k_keypoints(s, NUM_KPTS, 0.0005)
            return c + jnp.sum(v), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    print("topk ms/batch:", scan_time(jax.jit(topk_scan), [scores], floor))

    lg = get_model("lightglue").from_conf(
        {"n_layers": 9, "descriptor_dim": 256, "num_heads": 4, "dtype": "bfloat16"}
    )
    kps = jnp.asarray(rng.rand(ITERS, BATCH, NUM_KPTS, 2) * 500, jnp.float32)
    descs = jnp.asarray(rng.randn(ITERS, BATCH, NUM_KPTS, 256), jnp.float32)
    lgv = lg.init(
        jax.random.PRNGKey(0),
        {"keypoints0": kps[0], "keypoints1": kps[0],
         "descriptors0": descs[0], "descriptors1": descs[0]},
    )

    def lg_scan(v, kxs, dxs):
        def body(c, x):
            kp, d = x
            p = lg.apply(v, {"keypoints0": kp, "keypoints1": kp,
                             "descriptors0": d, "descriptors1": d})
            return c + jnp.sum(p["matching_scores0"]), None
        return jax.lax.scan(body, jnp.float32(0), (kxs, dxs))[0]

    print("lightglue ms/batch:", scan_time(jax.jit(lg_scan), [lgv, kps, descs], floor))


if __name__ == "__main__":
    main()
