"""Adaptive-depth demonstration on STRUCTURED pairs with a trained matcher.

The flagship bench (bench.py) deliberately runs fixed depth on random-noise
images — adaptive depth (`matcher.depth_confidence`, the LightGlue paper's
headline inference feature, reference `lightglue.py:500-521`) only pays on
real, matchable image pairs where token confidence saturates early. This
script provides that missing evidence: it loads a trained experiment
(default: the air-gapped `lg_synth` from-scratch run), generates synthetic
homography pairs from the SAME distribution the model was trained on, and
A/Bs fixed depth vs `depth_confidence=0.95` in one process:

  - pairs/s both ways (scan-amortized, RPC-floor subtracted, min-of-reps),
  - mean exit layer (`stop_layers` from the adaptive forward),
  - match agreement between the two paths (adaptive exactness is bounded by
    the reference semantics: early exit IS an approximation, the agreement
    quantifies it).

Usage: timeout 2400 python scripts/bench_adaptive.py [exp_name]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = 16
REPS = 5


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu import load_experiment
    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.models import get_model

    exp = sys.argv[1] if len(sys.argv) > 1 else "lg_synth_r4"
    try:
        _, variables, conf = load_experiment(exp)
    except (FileNotFoundError, ValueError, IndexError):
        # no checkpoint_best yet (run interrupted before first validation)
        _, variables, conf = load_experiment(exp, get_last=True)

    # pairs from the training distribution (synthetic procedural images)
    dconf = conf["data"].to_dict()
    dconf["num_workers"] = 0
    dconf["batch_size"] = int(dconf.get("batch_size", 32))
    dataset = get_dataset(dconf["name"])(dconf)
    loader = dataset.get_data_loader("val")
    batches = []
    for i, b in enumerate(loader):
        if i >= ITERS:
            break
        batches.append(b)
    B = dconf["batch_size"]
    i0 = jnp.stack([jnp.asarray(b["view0"]["image"]) for b in batches])
    i1 = jnp.stack([jnp.asarray(b["view1"]["image"]) for b in batches])
    n_pairs = i0.shape[0] * i0.shape[1]

    def build(depth_conf):
        mconf = conf["model"].to_dict()  # deep copy
        mconf["matcher"]["depth_confidence"] = depth_conf
        m = get_model(mconf["name"]).from_conf(mconf)

        def run_all(v, a, b):
            def body(c, xs):
                x, y = xs
                pred = m.apply(
                    v, {"view0": {"image": x}, "view1": {"image": y}},
                    train=False,
                )
                return c + jnp.sum(pred["matching_scores0"]), None

            out, _ = jax.lax.scan(body, jnp.float32(0), (a, b))
            return out

        def one(v, x, y):
            return m.apply(
                v, {"view0": {"image": x}, "view1": {"image": y}},
                train=False,
            )

        return jax.jit(run_all), jax.jit(one)

    floor_jit = jax.jit(lambda t: t + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"floor {floor*1000:.1f} ms", file=sys.stderr)

    out = {"experiment": exp, "batch": B, "iters": ITERS}
    preds = {}
    for name, dc in (("fixed", -1.0), ("adaptive", 0.95)):
        run_jit, one_jit = build(dc)
        preds[name] = jax.device_get(one_jit(variables, i0[0], i1[0]))
        float(jax.device_get(run_jit(variables, i0, i1)))  # compile
        times = []
        for r in range(REPS):
            a = i0.at[0, 0, 0, 0, 0].add(1e-4 * (r + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(variables, a, i1)))
            times.append(time.perf_counter() - t0)
        dt = max(float(np.min(times)) - floor, 1e-6)
        out[f"{name}_pairs_per_s"] = round(n_pairs / dt, 2)
        print(f"{name}: {out[f'{name}_pairs_per_s']} pairs/s", file=sys.stderr)

    if "stop_layers" in preds["adaptive"]:
        out["mean_exit_layer"] = float(
            np.mean(preds["adaptive"]["stop_layers"])
        )
        out["n_layers"] = int(conf["model"]["matcher"]["n_layers"])
    mf, ma = preds["fixed"]["matches0"], preds["adaptive"]["matches0"]
    valid = mf >= 0
    out["match_agreement"] = round(
        float(np.mean((mf == ma)[valid])) if valid.any() else 1.0, 4
    )
    out["mean_matches_fixed"] = round(float(np.mean(np.sum(mf >= 0, -1))), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
