"""Per-stage TPU timing for the SP+LG pipeline (scan-checksum pattern from
bench.py: every iteration forced by a data dependency inside one jit, one
scalar fetch, RPC floor subtracted).

Usage: python scripts/profile_stages.py [stage ...]
Stages: backbone sp lg conv1b conv1b_s2d pipeline detect
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 8
ITERS = 8
W, H = 640, 480
K = 1024


def timed(name, fn, *args):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(jfn(*args)))  # compile
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(jfn(*args)))
        times.append(time.perf_counter() - t0)
    dt = (float(np.median(times)) - floor) / ITERS
    print(f"{name}: {dt * 1e3:.2f} ms/iter (floor {floor * 1e3:.1f} ms)")
    return dt


def scan_wrap(step):
    import jax
    import jax.numpy as jnp

    def run(xs):
        def body(c, x):
            return c + step(x), None

        out, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return out

    return run


def main(stages):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    if {"backbone", "sp", "pipeline", "detect"} & stages:
        from gluefactory_tpu.models import get_model

        sp = get_model("superpoint").from_conf(
            {
                "max_num_keypoints": K,
                "detection_threshold": 0.0005,
                "dtype": "bfloat16",
            }
        )
        imgs = jnp.asarray(rng.rand(ITERS, BATCH, H, W, 1), jnp.float32)
        v_sp = sp.init(jax.random.PRNGKey(0), {"image": imgs[0]})

    if "sp" in stages:
        def sp_step(im):
            p = sp.apply(v_sp, {"image": im})
            return jnp.sum(p["keypoints"]) + jnp.sum(p["descriptors"])

        timed("superpoint_full(B8)", scan_wrap(sp_step), imgs)

    if "backbone" in stages:
        # convs only: bind the module and run the backbone + heads
        def bb_step(im):
            def run(mdl, image):
                x = image
                for i, (b0, b1) in enumerate(mdl.backbone):
                    x = b0(x)
                    x = b1(x)
                    if i < len(mdl.backbone) - 1:
                        import flax.linen as fnn

                        x = fnn.max_pool(x, (2, 2), strides=(2, 2))
                det = mdl.det_head1(mdl.det_head0(x))
                desc = mdl.desc_head1(mdl.desc_head0(x))
                return jnp.sum(det.astype(jnp.float32)) + jnp.sum(
                    desc.astype(jnp.float32)
                )

            return sp.apply(v_sp, {"image": im}, method=lambda m, d: run(m, d["image"]))

        timed("sp_backbone+heads(B8)", scan_wrap(bb_step), imgs)

    if "detect" in stages:
        from gluefactory_tpu.ops.keypoints import (
            remove_borders,
            sample_descriptors,
            simple_nms,
            top_k_keypoints,
        )

        smaps = jnp.asarray(rng.rand(ITERS, BATCH, H, W), jnp.float32)
        dmaps = jnp.asarray(
            rng.rand(ITERS, BATCH, 256, H // 8, W // 8), jnp.float32
        )

        def det_step(x):
            s, d = x
            nms = simple_nms(s, 4)
            nms = remove_borders(nms, 4)
            kpts, sc, valid = top_k_keypoints(nms, K, 0.0005, nms_radius=4)
            desc = sample_descriptors(kpts, d, 8)
            return jnp.sum(kpts) + jnp.sum(desc)

        timed("detect_chain(B8)", scan_wrap(det_step), (smaps, dmaps))

    if "lg" in stages:
        from gluefactory_tpu.models import get_model

        lg = get_model("lightglue").from_conf({"dtype": "bfloat16"})
        kpts = jnp.asarray(rng.rand(ITERS, 2, BATCH, K, 2) * 480, jnp.float32)
        descs = jnp.asarray(rng.rand(ITERS, 2, BATCH, K, 256), jnp.float32)
        sz = jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (BATCH, 2))
        d0 = {
            "keypoints0": kpts[0, 0],
            "keypoints1": kpts[0, 1],
            "descriptors0": descs[0, 0],
            "descriptors1": descs[0, 1],
            "view0": {"image_size": sz},
            "view1": {"image_size": sz},
        }
        v_lg = lg.init(jax.random.PRNGKey(0), d0)

        def lg_step(x):
            kp, dc = x
            p = lg.apply(
                v_lg,
                {
                    "keypoints0": kp[0],
                    "keypoints1": kp[1],
                    "descriptors0": dc[0],
                    "descriptors1": dc[1],
                    "view0": {"image_size": sz},
                    "view1": {"image_size": sz},
                },
            )
            return jnp.sum(p["matching_scores0"])

        timed("lightglue(B8,1024)", scan_wrap(lg_step), (kpts, descs))

    if "conv1b" in stages:
        k1 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.bfloat16)
        x1 = jnp.asarray(rng.rand(ITERS, BATCH, H, W, 64), jnp.bfloat16)

        def c1(x):
            y = jax.lax.conv_general_dilated(
                x, k1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32))

        timed("conv1b 640x480x64->64 bf16(B8)", scan_wrap(c1), x1)

    if "conv1b_s2d" in stages:
        # same useful FLOPs, s2d domain: 320x240, 256->256, 2x2 kernel
        k2 = jnp.asarray(rng.randn(2, 2, 256, 256) * 0.05, jnp.bfloat16)
        x2 = jnp.asarray(
            rng.rand(ITERS, BATCH, H // 2, W // 2, 256), jnp.bfloat16
        )

        def c2(x):
            y = jax.lax.conv_general_dilated(
                x, k2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32))

        timed("conv_s2d 320x240x256->256 2x2 bf16(B8)", scan_wrap(c2), x2)

    if "pipeline" in stages:
        from gluefactory_tpu.models import get_model

        pipe = get_model("two_view_pipeline").from_conf(
            {
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": K,
                    "detection_threshold": 0.0005,
                    "dtype": "bfloat16",
                },
                "matcher": {"name": "lightglue", "dtype": "bfloat16"},
            }
        )
        sz = jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (BATCH, 2))
        im0 = jnp.asarray(rng.rand(ITERS, BATCH, H, W, 1), jnp.float32)
        im1 = jnp.asarray(rng.rand(ITERS, BATCH, H, W, 1), jnp.float32)
        v_p = pipe.init(
            jax.random.PRNGKey(0),
            {
                "view0": {"image": im0[0], "image_size": sz},
                "view1": {"image": im1[0], "image_size": sz},
            },
            train=False,
        )

        def p_step(x):
            a, b = x
            p = pipe.apply(
                v_p,
                {
                    "view0": {"image": a, "image_size": sz},
                    "view1": {"image": b, "image_size": sz},
                },
                train=False,
            )
            return jnp.sum(p["matching_scores0"])

        timed("pipeline(B8)", scan_wrap(p_step), (im0, im1))


if __name__ == "__main__":
    args = set(sys.argv[1:]) or {
        "sp", "backbone", "detect", "lg", "conv1b", "conv1b_s2d"
    }
    main(args)
