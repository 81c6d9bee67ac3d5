"""Per-op ledger of the SuperPoint forward on the real chip.

Times every conv level and the post-detection chain individually (scan-
checksum pattern; 48+ iters per op so the ~30 ms RPC floor is <3% of the
signal, per the r2 measurement lesson in CLAUDE.md).

Usage: timeout 2400 python scripts/bench_sp_ledger.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 8
W, H = 640, 480


def timed(name, fn, base, iters, flops=0.0):
    """Scan-checksum timing; per-iteration input DERIVED ON DEVICE from one
    base batch (base * (1 + 1e-6*(i+seed))) — shipping (iters, ...) stacks
    from the host is gigabytes through the tunnel RPC at these shapes.
    `base` may be a pytree; every leaf is scaled the same way."""
    import jax
    import jax.numpy as jnp

    def run(base, seed):
        def body(c, i):
            x = jax.tree.map(lambda a: a * jnp.asarray(1 + 1e-6 * (i + seed), a.dtype), base)
            return c + fn(x), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.float32)
        )
        return out

    jfn = jax.jit(run)
    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(jfn(base, jnp.float32(0))))  # compile
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
        float(jax.device_get(jfn(base, jnp.float32(i + 1))))
        times.append(time.perf_counter() - t0)
    dt = (float(np.min(times)) - floor) / iters
    util = flops / dt / 197e12 * 100 if flops else 0.0  # v5e bf16 peak
    print(f"{name}: {dt * 1e3:.3f} ms/iter"
          + (f"  ({util:.0f}% MXU)" if flops else ""), flush=True)
    return dt


def conv_flops(h, w, kh, kw, ci, co):
    return BATCH * h * w * kh * kw * ci * co * 2


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def conv_bench(name, h, w, ci, co, iters, kernel=3):
        k = jnp.asarray(rng.randn(kernel, kernel, ci, co) * 0.05, jnp.bfloat16)
        b = jnp.zeros((co,), jnp.bfloat16)
        x = jnp.asarray(rng.rand(BATCH, h, w, ci), jnp.bfloat16)

        def f(x):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            y = jax.nn.relu(y + b)
            return jnp.sum(y.astype(jnp.float32))

        timed(name, f, x, iters, conv_flops(h, w, kernel, kernel, ci, co))

    # backbone ledger (channels [64, 64, 128, 128, 256])
    conv_bench("conv0_0 1->64 @640x480", H, W, 1, 64, 24)
    conv_bench("conv0_1 64->64 @640x480", H, W, 64, 64, 24)
    conv_bench("conv1_x 64->64 @320x240", H // 2, W // 2, 64, 64, 48)
    conv_bench("conv2_0 64->128 @160x120", H // 4, W // 4, 64, 128, 96)
    conv_bench("conv2_1 128->128 @160x120", H // 4, W // 4, 128, 128, 96)
    conv_bench("conv3_x 128->128 @80x60", H // 8, W // 8, 128, 128, 96)
    conv_bench("head0 128->256 @80x60", H // 8, W // 8, 128, 256, 96)
    conv_bench("head1 256->256 @80x60 1x1", H // 8, W // 8, 256, 256, 96, kernel=1)

    # pools
    x0 = jnp.asarray(rng.rand(BATCH, H, W, 64), jnp.bfloat16)

    def pool(x):
        import flax.linen as fnn

        return jnp.sum(fnn.max_pool(x, (2, 2), strides=(2, 2)).astype(jnp.float32))

    timed("pool @640x480x64", pool, x0, 24)

    # post-detection chain pieces
    det = jnp.asarray(rng.randn(BATCH, H // 8, W // 8, 65), jnp.float32)

    def softshuf(d):
        s = jax.nn.softmax(d, axis=-1)[..., :-1]
        Hc, Wc = s.shape[1:3]
        s = s.reshape(BATCH, Hc, Wc, 8, 8)
        s = s.transpose(0, 1, 3, 2, 4).reshape(BATCH, Hc * 8, Wc * 8)
        return jnp.sum(s)

    timed("softmax+pixelshuffle", softshuf, det, 48)

    smaps = jnp.asarray(rng.rand(BATCH, H, W), jnp.float32)
    from gluefactory_tpu.ops.keypoints import (
        remove_borders,
        sample_descriptors,
        simple_nms,
        top_k_keypoints,
    )

    def nms_only(s):
        return jnp.sum(simple_nms(s, 4))

    timed("simple_nms r4", nms_only, smaps, 48)

    def topk_only(s):
        nms = remove_borders(simple_nms(s, 4), 4)
        kpts, sc, valid = top_k_keypoints(nms, 1024, 0.0005, nms_radius=4)
        return jnp.sum(kpts) + jnp.sum(sc)

    timed("nms+borders+topk", topk_only, smaps, 48)

    dmaps = jnp.asarray(rng.rand(BATCH, 256, H // 8, W // 8), jnp.float32)
    kp = jnp.asarray(rng.rand(BATCH, 1024, 2) * 470, jnp.float32)

    def sample_only(x):
        d, k = x
        return jnp.sum(sample_descriptors(k, d, 8))

    timed("sample_descriptors", sample_only, (dmaps, kp), 48)

    # dense desc head normalize
    dd = jnp.asarray(rng.randn(BATCH, H // 8, W // 8, 256), jnp.float32)

    def l2norm(d):
        n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return jnp.sum(n)

    timed("desc l2norm", l2norm, dd, 96)


if __name__ == "__main__":
    main()
