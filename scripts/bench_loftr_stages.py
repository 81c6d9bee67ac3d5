"""On-chip per-stage ledger for LoFTR (the flagship got one in r2; LoFTR
never did). Times nested prefixes of the forward under one jitted scan each:

  backbone      - ResNet-FPN on both views
  +coarse       - ... plus pos-enc + linear-attention transformer
  +match        - ... plus dual-softmax, mutual-NN, top-K selection
  full          - ... plus fine correlation refinement

Differences between consecutive rows are per-stage times. 24 scan iters per
measurement (stages are multi-ms; the ~30 ms RPC floor is subtracted).

Usage: timeout 2400 python scripts/bench_loftr_stages.py [B] [conf JSON]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS, REPS = 6, 5
SIZE = (640, 480)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    overrides = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
    w, h = SIZE
    rng = np.random.RandomState(0)
    im0 = jnp.asarray(rng.rand(ITERS, B, h, w, 1), jnp.float32)
    im1 = jnp.asarray(rng.rand(ITERS, B, h, w, 1), jnp.float32)

    model = get_model("loftr").from_conf({"max_num_matches": 1024, **overrides})
    d0 = {"view0": {"image": im0[0]}, "view1": {"image": im1[0]}}
    variables = model.init(jax.random.PRNGKey(0), d0, train=False)

    # stage closures: each returns a scalar checksum forcing that prefix
    def run_backbone(m, a, b):
        im0_, im1_ = a, b
        if im0_.shape[-1] == 1:
            im0_ = jnp.repeat(im0_, 3, axis=-1)
            im1_ = jnp.repeat(im1_, 3, axis=-1)
        c0, f0 = m.backbone(im0_)
        c1, f1 = m.backbone(im1_)
        return (jnp.sum(c0) + jnp.sum(c1) + jnp.sum(f0) + jnp.sum(f1)).astype(
            jnp.float32)

    def run_coarse(m, a, b):
        x0, x1, f0, f1, _, _ = m._coarse_features(
            {"view0": {"image": a}, "view1": {"image": b}})
        return (jnp.sum(x0) + jnp.sum(x1) + jnp.sum(f0[..., 0])).astype(
            jnp.float32)

    def run_match(m, a, b):
        from gluefactory_tpu.models.matchers.loftr import coarse_select

        x0, x1, f0, f1, (Hc, Wc), _ = m._coarse_features(
            {"view0": {"image": a}, "view1": {"image": b}})
        sim = m._similarity(x0, x1)
        j_best, i_best, conf = coarse_select(sim)
        mutual = jnp.take_along_axis(i_best, j_best, axis=1) == jnp.arange(
            sim.shape[1])[None]
        score = jnp.where(mutual & (conf > m.conf.conf_threshold), conf, 0.0)
        ts, ti = jax.lax.top_k(
            score, min(m.conf.max_num_matches, sim.shape[1]))
        return (jnp.sum(ts) + jnp.sum(ti) + jnp.sum(f0[..., 0])).astype(
            jnp.float32)

    def run_full(m, a, b):
        pred = m._forward(
            {"view0": {"image": a}, "view1": {"image": b}}, train=False)
        return jnp.sum(pred["matching_scores0"]) + jnp.sum(pred["keypoints1"])

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
    prev = None
    for name, fn in (("backbone", run_backbone), ("coarse", run_coarse),
                     ("match", run_match), ("full", run_full)):
        def run_all(v, a, b, fn=fn):
            def body(c, xs):
                x, y = xs
                return c + model.apply(v, x, y, method=fn), None

            o, _ = jax.lax.scan(body, jnp.float32(0), (a, b))
            return o

        run_jit = jax.jit(run_all)
        try:
            float(jax.device_get(run_jit(variables, im0, im1)))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            continue
        times = []
        for r in range(REPS):
            a = im0.at[0, 0, 0, 0, 0].add(1e-4 * (r + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(variables, a, im1)))
            times.append(time.perf_counter() - t0)
        ms = (max(float(np.min(times)) - floor, 1e-6)) / ITERS * 1000
        out[name] = round(ms, 2)
        delta = "" if prev is None else f" (+{ms - prev:.2f} ms)"
        print(f"{name}: {ms:.2f} ms/batch{delta}", file=sys.stderr)
        prev = ms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
