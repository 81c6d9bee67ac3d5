"""On-chip A/B: LoFTR f32 vs bf16 compute dtype (plus the always-on stacked
backbone), one process. The committed-previous f32 number for context:
~71-72 pairs/s (BENCH_r03 extra / r4 confirmation run).

Usage: timeout 2400 python scripts/bench_ab_loftr.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, ITERS, REPS = 2, 8, 5
SIZE = (640, 480)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    w, h = SIZE
    rng = np.random.RandomState(0)
    im0 = jnp.asarray(rng.rand(ITERS, B, h, w, 1), jnp.float32)
    im1 = jnp.asarray(rng.rand(ITERS, B, h, w, 1), jnp.float32)

    floor_jit = jax.jit(lambda t: t + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"floor {floor*1000:.1f} ms", file=sys.stderr)

    out = {}
    ref_pts = None
    off = {"stack_backbone": False, "stack_coarse": False, "fused_qkv": False}
    variants = (
        # r4 late-session result (old code): f32 unstacked-backbone 111.05,
        # f32 stacked 106.35, bf16 101.31, bf16_unstacked 91.73 pairs/s.
        ("f32_unstacked", {"dtype": "float32", **off}),
        ("f32_fqkv", {"dtype": "float32", **off, "fused_qkv": True}),
        ("f32_fqkv_stackc", {"dtype": "float32", **off, "fused_qkv": True,
                             "stack_coarse": True}),
        ("f32_all", {"dtype": "float32"}),  # all three stacking/fusion flags
        ("bf16_fqkv_stackc", {"dtype": "bfloat16", **off, "fused_qkv": True,
                              "stack_coarse": True}),
    )
    for name, extra in variants:
        model = get_model("loftr").from_conf(
            {"max_num_matches": 1024, **extra})
        d0 = {"view0": {"image": im0[0]}, "view1": {"image": im1[0]}}
        variables = model.init(jax.random.PRNGKey(0), d0, train=False)
        one = jax.jit(lambda v, a, b: model.apply(
            v, {"view0": {"image": a}, "view1": {"image": b}}, train=False))

        def run_all(v, a, b):
            def body(c, xs):
                x, y = xs
                pred = model.apply(
                    v, {"view0": {"image": x}, "view1": {"image": y}},
                    train=False)
                return c + jnp.sum(pred["matching_scores0"]), None

            o, _ = jax.lax.scan(body, jnp.float32(0), (a, b))
            return o

        run_jit = jax.jit(run_all)
        try:
            pred = jax.device_get(one(variables, im0[0], im1[0]))
            float(jax.device_get(run_jit(variables, im0, im1)))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            out[name] = None
            continue
        if name == "f32_unstacked":
            ref_pts = pred
        elif ref_pts is not None:
            # top-64 coarse pair set overlap vs f32 (random-weight score
            # tails shuffle at bf16 noise; the selected pairs should agree)
            def pairs(p, n=64):
                o = np.argsort(-p["matching_scores0"][0])[:n]
                k0 = p["keypoints0"][0][o]
                c1 = np.round((p["keypoints1"][0][o] + 0.5) / 8.0 - 0.5)
                return {(*map(float, a), *map(float, c)) for a, c in
                        zip(k0, c1)}

            s_ref, s_new = pairs(ref_pts), pairs(pred)
            out[f"top64_overlap_{name}"] = round(len(s_ref & s_new) / 64, 3)
            print(f"top64 overlap vs f32 ({name}): "
                  f"{out[f'top64_overlap_{name}']}", file=sys.stderr)
        times = []
        for r in range(REPS):
            a = im0.at[0, 0, 0, 0, 0].add(1e-4 * (r + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(variables, a, im1)))
            times.append(time.perf_counter() - t0)
        dt = max(float(np.min(times)) - floor, 1e-6)
        out[name] = round(B * ITERS / dt, 2)
        print(f"{name}: {out[name]} pairs/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
