"""Reconcile the LoFTR driver number (VERDICT r4 weak #2): one-process
on-chip A/B of the log-space mutual-NN selection (`log_space_select`
True/False — the optimization the end-of-r4 commit landed between the 85.0
sweep and the 210.6 driver capture), PLUS a correctness anchor asserted in
the same process the perf numbers come from: a known-translation image pair
must yield matches following the translation (selection-path bugs — wrong
argmax axis, coordinate math — fail it even at random init, because an
equivariant backbone maps shifted inputs to shifted features).

Usage: timeout 2400 python scripts/bench_loftr_recon.py [B]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS, REPS = 6, 7
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

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    out = {"B": B, "floor_ms": round(floor * 1e3, 2), "device": str(jax.devices()[0])}

    variables = None
    for tag, lss in (("log_space (shipped)", True), ("explicit_P (pre-r4)", False)):
        model = get_model("loftr").from_conf(
            {"max_num_matches": 1024, "log_space_select": lss})
        if variables is None:
            d0 = {"view0": {"image": im0[0]}, "view1": {"image": im1[0]}}
            variables = model.init(jax.random.PRNGKey(0), d0, train=False)

        def run_all(v, i0, i1, m=model):
            def body(c, xs):
                a, b = xs
                pred = m.apply(
                    v, {"view0": {"image": a}, "view1": {"image": b}},
                    train=False)
                return c + jnp.sum(pred["matching_scores0"]), None
            o, _ = jax.lax.scan(body, jnp.float32(0), (i0, i1))
            return o

        run_jit = jax.jit(run_all)
        float(jax.device_get(run_jit(variables, im0, im1)))
        times = []
        for i in range(REPS):
            a = im0.at[0, 0, 0, 0, 0].add(1e-4 * (i + 1))
            t0 = time.perf_counter()
            float(jax.device_get(run_jit(variables, a, im1)))
            times.append(time.perf_counter() - t0)
        pps = B * ITERS / max(float(np.min(times)) - floor, 1e-6)
        out[tag] = round(pps, 2)
        print(f"{tag}: {pps:.1f} pairs/s", file=sys.stderr)

    # correctness anchor, same process: pure-translation pair (multiple of
    # the coarse stride so cells align), smooth structured image
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (np.sin(xx / 9.0) * np.cos(yy / 13.0)
            + 0.5 * np.sin(xx / 31.0 + yy / 17.0))
    rng2 = np.random.RandomState(1)
    base += 0.3 * rng2.rand(h, w).astype(np.float32)
    dx, dy = 16, 8
    shifted = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
    # conf_threshold 0: random-init dual-softmax confidences are ~1e-5 —
    # the anchor checks selection/coordinate correctness, not confidence
    model = get_model("loftr").from_conf(
        {"max_num_matches": 1024, "conf_threshold": 0.0})
    pred = jax.jit(
        lambda v, d: model.apply(v, d, train=False))(
        variables,
        {
            "view0": {"image": jnp.asarray(base)[None, :, :, None]},
            "view1": {"image": jnp.asarray(shifted)[None, :, :, None]},
        },
    )
    valid = np.asarray(pred["keypoint_valid0"][0])
    p0 = np.asarray(pred["keypoints0"][0])[valid]
    p1 = np.asarray(pred["keypoints1"][0])[valid]
    # ignore the wrap-around border band
    inner = (p0[:, 0] > 32) & (p0[:, 1] > 16)
    err = np.linalg.norm(p1 - p0 - np.array([dx, dy]), axis=-1)
    prec3 = float((err[inner] < 3.0).mean()) if inner.any() else 0.0
    out["anchor_matches"] = int(valid.sum())
    out["anchor_precision_at_3px"] = round(prec3, 4)
    assert valid.sum() >= 100, f"anchor produced too few matches: {valid.sum()}"
    assert prec3 > 0.8, f"translation anchor precision {prec3:.3f} <= 0.8"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
