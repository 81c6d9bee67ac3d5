"""Benchmark: matched pairs/s of the flagship SuperPoint+LightGlue pipeline,
plus GlueStick and LoFTR throughput (VERDICT r2 item 6: driver-visible perf
beyond the flagship).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"};
"extra" carries the secondary model metrics (same scan-amortized protocol).

Measurement design (robust to async/caching RPC runtimes like the axon
tunnel): all ITERS distinct batches are processed inside ONE jitted
`lax.scan` whose carry accumulates a checksum — every batch's compute is
forced by a data dependency and exactly one scalar round-trip happens. The
RPC floor is measured with an empty scan and subtracted.

Baseline: the reference stack (torch SP+LG with FlashAttention) at 1024
keypoints / 640x480 runs ~55 pairs/s on an RTX 3090 (derived from the
LightGlue paper's per-pair timings; the reference repo publishes no
throughput numbers, SURVEY.md §6). BASELINE.md's north star is >=5x/chip.
"""

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 55.0
BATCH = 8
# 24 iters x ~30 ms/batch ≈ 0.7 s of forced compute per timed call: the
# ~30 ms RPC floor (subtracted, but noisy at ±10 ms) drops to <2% of the
# signal. 12 iters left the floor variance at ~5-8% of the measurement.
ITERS = 24
SIZE = (640, 480)  # (w, h)
NUM_KPTS = 1024


def _measure(run_jit, floor, args, n_pairs, reps=7, perturb=None):
    """Best-observed wall time of the jitted scan minus the RPC floor ->
    pairs/s. Min-of-reps is the standard protocol for deterministic compute
    behind a noisy transport: device time is fixed, the tunnel adds
    one-sided stochastic latency, so the minimum is the least-biased
    estimate (the floor is still the MEDIAN of its reps — an optimistic
    floor would inflate the result)."""
    import jax

    float(jax.device_get(run_jit(*args)))  # warmup/compile
    times = []
    for i in range(reps):
        a = perturb(args, i) if perturb is not None else args
        t0 = time.perf_counter()
        float(jax.device_get(run_jit(*a)))
        times.append(time.perf_counter() - t0)
    dt = max(float(np.min(times)) - floor, 1e-6)
    return n_pairs / dt


def bench_gluestick(floor):
    """GlueStick matcher (points + lines) at 1024 kpts / 256 lines, B=8.

    Config per the r5 one-process A/B (scripts/bench_gluestick_ab.py,
    GS_AB_r05.json): bf16 unfused 816.5 / bf16 fused-QKV 793.1 / f32
    unfused 760.5 / f32 fused 747.4 pairs/s — bf16 without fused_qkv wins;
    fused projections lose ~3% (the same split-layout cost seen in the
    LoFTR fused_qkv A/B) and stay a tested off-by-default option."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    B, N, L, D = BATCH, NUM_KPTS, 256, 256
    iters = 12
    model = get_model("gluestick").from_conf(
        {"n_layers": 9, "descriptor_dim": D, "dtype": "bfloat16"}
    )
    rng = np.random.RandomState(0)
    kp = jnp.asarray(rng.rand(iters, B, N, 2) * 480, jnp.float32)
    ds = jnp.asarray(rng.randn(iters, B, N, D), jnp.float32)
    # line endpoints reference junction keypoints (wireframe convention)
    lj = jnp.asarray(rng.randint(0, N, (iters, B, L, 2)), jnp.int32)
    e0 = jnp.take_along_axis(kp, lj[..., 0:1], axis=2)  # (it, B, L, 2)
    e1 = jnp.take_along_axis(kp, lj[..., 1:2], axis=2)
    ln = jnp.stack([e0, e1], axis=3)  # (it, B, L, 2, 2)

    def run_all(v, kps, dss, ljs, lns):
        def body(c, xs):
            k_, d_, j_, l_ = xs
            pred = model.apply(
                v,
                {
                    "keypoints0": k_, "keypoints1": k_,
                    "descriptors0": d_, "descriptors1": d_,
                    "lines0": l_, "lines1": l_,
                    "lines_junc_idx0": j_, "lines_junc_idx1": j_,
                },
                train=False,
            )
            return c + jnp.sum(pred["matches0"]) + jnp.sum(
                pred["line_matches0"]
            ), None

        out, _ = jax.lax.scan(body, jnp.float32(0), (kps, dss, ljs, lns))
        return out

    d0 = {
        "keypoints0": kp[0], "keypoints1": kp[0],
        "descriptors0": ds[0], "descriptors1": ds[0],
        "lines0": ln[0], "lines1": ln[0],
        "lines_junc_idx0": lj[0], "lines_junc_idx1": lj[0],
    }
    variables = model.init(jax.random.PRNGKey(0), d0, train=False)
    run_jit = jax.jit(run_all)
    return _measure(run_jit, floor, (variables, kp, ds, lj, ln), B * iters)


def bench_loftr(floor):
    """LoFTR dense matcher on full 640x480 image pairs, B=8.

    B=8 per the on-chip sweep (scripts/bench_loftr_batch.py, one process,
    PRE-log-space-selection code: B=2 65.8, B=4 61.8, B=8 85.0, B=16 84.9
    pairs/s — same MXU-occupancy cliff shape as the flagship's conv
    stages). The end-of-r4 log-space mutual-NN selection then lifted B=8 to
    ~197-211: reconciled by the one-process A/B in
    scripts/bench_loftr_recon.py (log_space 196.9 vs explicit_P 88.8
    pairs/s, same process, translation-anchor precision 1.0) — the r4
    driver capture of 210.6 was real, not a tunnel artifact."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    B, iters = 8, 4
    w, h = SIZE
    model = get_model("loftr").from_conf({"max_num_matches": 1024})
    rng = np.random.RandomState(0)
    im0 = jnp.asarray(rng.rand(iters, B, h, w, 1), jnp.float32)
    im1 = jnp.asarray(rng.rand(iters, B, h, w, 1), jnp.float32)

    def run_all(v, i0, i1):
        def body(c, xs):
            a, b = xs
            pred = model.apply(
                v, {"view0": {"image": a}, "view1": {"image": b}}, train=False
            )
            return c + jnp.sum(pred["matching_scores0"]), None

        out, _ = jax.lax.scan(body, jnp.float32(0), (i0, i1))
        return out

    d0 = {"view0": {"image": im0[0]}, "view1": {"image": im1[0]}}
    variables = model.init(jax.random.PRNGKey(0), d0, train=False)
    run_jit = jax.jit(run_all)
    return _measure(run_jit, floor, (variables, im0, im1), B * iters)


def bench_ba(floor):
    """Map-scale bundle adjustment throughput (observations/s).

    256 cameras x 64k landmarks x ~6 observations each, matrix-free PCG
    Schur solver (sfm/ba.py `solver="pcg"`, VERDICT r4 item 4): 10 LM
    iterations x 40 CG iterations inside one jit. Metric = processed
    observations x LM iterations / second — each LM iteration touches every
    observation in the Jacobian build, the Schur RHS, the CG matvecs, and
    the back-substitution."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.sfm.ba import bundle_adjust
    from gluefactory_tpu.sfm.lie import so3_exp

    C, P, V, lm_iters = 256, 65536, 6, 10
    rng = np.random.RandomState(0)
    cs = np.arange(C)
    centers = np.stack([0.4 * cs, 0.05 * np.sin(cs * 0.1), 0.02 * cs], -1)
    Rs = np.stack([
        np.asarray(so3_exp(jnp.asarray(
            [0.01 * rng.randn(), 0.002 * c, 0.01 * rng.randn()],
            jnp.float32))) for c in cs
    ])
    ts = -np.einsum("cij,cj->ci", Rs, centers)
    anchor = (np.arange(P) * (C - V) // P).astype(np.int64)
    pts = centers[anchor] + np.stack([
        rng.randn(P) * 1.5 + 1.2, rng.randn(P), rng.randn(P) * 0.5 + 6.0
    ], -1)
    cam_idx = np.clip(anchor[:, None] + np.arange(V)[None], 0, C - 1)
    q = np.einsum("pvij,pj->pvi", Rs[cam_idx], pts) + ts[cam_idx]
    uv = q[..., :2] / np.maximum(q[..., 2:3], 1e-6)
    valid = (q[..., 2] > 0.5) & (np.abs(uv) < 1.5).all(-1)
    n_obs = int(valid.sum())

    is_fixed = (np.arange(C) == 0) | (np.arange(C) == C - 1)
    args = (
        jnp.asarray(Rs, jnp.float32),
        jnp.asarray(ts + 0.01 * rng.randn(C, 3), jnp.float32),
        jnp.asarray(pts + 0.01 * rng.randn(P, 3), jnp.float32),
        jnp.asarray(cam_idx, jnp.int32),
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(valid),
    )

    run_jit = jax.jit(
        lambda *a: bundle_adjust(
            *a, fixed_cameras=jnp.asarray(is_fixed), iters=lm_iters,
            solver="pcg", cg_iters=40,
        )[3]["cost"]
    )
    return _measure(
        run_jit, floor, args, n_obs * lm_iters,
        perturb=lambda a, i: (a[0], a[1], a[2].at[0, 0].add(1e-5 * (i + 1)),
                              a[3], a[4], a[5]),
    )


def _fused_layer_wins():
    """On-chip gate for `lightglue.fused_layer` + `kernel_exit_head`: the
    Pallas paths must COMPILE (Mosaic lowering can fail where interpret mode
    passes) and AGREE with the XLA path at the flagship token count before
    the flagship enables them. The probe runs in a SUBPROCESS with a hard
    timeout: a hung remote compile (tunnel outage mid-gate) or a Mosaic
    crash then costs 10 minutes, not the whole bench. Any failure falls
    back to the proven XLA config."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, __file__, "--gate-probe"],
            capture_output=True, text=True, timeout=600,
        )
        if "FUSED_GATE_OK" in r.stdout:
            return True
        print(
            f"fused_layer gate: no OK marker (rc={r.returncode}): "
            f"{(r.stderr or r.stdout)[-300:]}", file=sys.stderr,
        )
        return False
    except subprocess.TimeoutExpired:
        print("fused_layer gate: probe timed out after 600s, staying on "
              "the XLA path", file=sys.stderr)
        return False
    except Exception as e:  # pragma: no cover
        print(f"fused_layer gate: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr)
        return False


def _gate_probe():
    """Subprocess body of _fused_layer_wins: exits printing FUSED_GATE_OK
    iff the fused kernels compile on this backend and match the XLA path."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        from gluefactory_tpu.ops.attention import _use_pallas

        if not _use_pallas():
            return False
        rng = np.random.RandomState(7)
        b, n, d = 2, NUM_KPTS, 256
        k0 = rng.rand(b, n, 2).astype(np.float32) * 480
        d0 = rng.randn(b, n, d).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 = d0 + 0.05 * rng.randn(b, n, d).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        data = {
            "keypoints0": jnp.asarray(k0),
            "keypoints1": jnp.asarray(k0 + 1.0),
            "descriptors0": jnp.asarray(d0),
            "descriptors1": jnp.asarray(d1),
        }
        base = {
            "n_layers": 2,
            "dtype": "bfloat16",
            "fold_out_proj": True,
            "weights": None,
        }
        m_ref = get_model("lightglue").from_conf(base)
        vs = m_ref.init(jax.random.PRNGKey(0), data)
        ref = jax.jit(lambda v, dd: m_ref.apply(v, dd, train=False))(vs, data)
        m_fus = get_model("lightglue").from_conf(
            {**base, "fused_layer": True, "kernel_exit_head": True}
        )
        out = jax.jit(lambda v, dd: m_fus.apply(v, dd, train=False))(vs, data)
        agree = float(
            jnp.mean(
                (out["matches0"] == ref["matches0"]).astype(jnp.float32)
            )
        )
        # Bar: a real Mosaic lowering bug diverges wholesale (agreement
        # ~0.5 or worse); bf16 tie-flips on this deliberately ambiguous
        # near-duplicate descriptor set measure ~0.998 while the full
        # 9-layer pipeline checksum agrees EXACTLY (bench_ab_fused r4,
        # rel-delta 0). 0.99 separates the two regimes.
        if agree > 0.99:
            print("FUSED_GATE_OK")
        else:
            import sys

            print(f"fused_layer gate: agreement {agree:.4f} <= 0.99,"
                  " staying on the XLA path", file=sys.stderr)
    except Exception as e:  # pragma: no cover - chip-only path
        import sys

        print(f"fused_layer gate: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr)


def main():
    import jax

    # persistent compile cache: repeated driver runs skip the cold XLA compile
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    use_fused = _fused_layer_wins()
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
            # r3 A/B winners (scripts/bench_ab_r3.py, within-process):
            # 3hd QKV columns + merged cross proj + scan unroll = +7.2%,
            # out_proj->ffn0 fold = +0.9% on top; all f32-exactness-tested
            # against the baseline layout (tests/test_lg_fold.py)
            "qkv_layout": "3hd",
            "merge_cross_proj": True,
            "scan_unroll": 9,
            "fold_out_proj": True,
            # one-Pallas-kernel-per-block layers + fused exit-head kernel,
            # enabled only after the on-chip compile+exactness gate passes
            # (_fused_layer_wins). r4 A/B (scripts/bench_ab_fused.py, one
            # process, erf fix): combo_fold 262.8 -> fused 275.1 ->
            # fused+kexit 276.6 pairs/s, checksum delta 0.
            "fused_layer": use_fused,
            "kernel_exit_head": use_fused,
        },
    }
    model = get_model("two_view_pipeline").from_conf(conf)

    rng = np.random.RandomState(0)
    w, h = SIZE
    sz = jnp.broadcast_to(jnp.asarray([float(w), float(h)]), (BATCH, 2))
    # ITERS distinct stacked batches: (ITERS, B, h, w, 1)
    imgs0 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)
    imgs1 = jnp.asarray(rng.rand(ITERS, BATCH, h, w, 1), jnp.float32)

    data0 = {
        "view0": {"image": imgs0[0], "image_size": sz},
        "view1": {"image": imgs1[0], "image_size": sz},
    }
    variables = model.init(jax.random.PRNGKey(0), data0, train=False)

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

    run_jit = jax.jit(run_all)
    # measure the RPC floor with a no-compute function
    floor_jit = jax.jit(lambda x: x + 1)

    # warmup / compile; if the fused-layer flagship fails to compile despite
    # the probe (e.g. VMEM pressure differs at full batch), fall back
    try:
        float(jax.device_get(run_jit(variables, imgs0, imgs1)))
    except Exception:
        if not use_fused:
            raise
        use_fused = False
        conf["matcher"]["fused_layer"] = False
        conf["matcher"]["kernel_exit_head"] = False
        model = get_model("two_view_pipeline").from_conf(conf)
        run_jit = jax.jit(run_all)
        float(jax.device_get(run_jit(variables, imgs0, imgs1)))
    float(jax.device_get(floor_jit(jnp.float32(0))))

    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    pairs_per_s = _measure(
        run_jit,
        floor,
        (variables, imgs0, imgs1),
        BATCH * ITERS,
        # perturb one pixel so runs are distinct end-to-end
        perturb=lambda a, i: (
            a[0], a[1].at[0, 0, 0, 0, 0].add(1e-4 * (i + 1)), a[2]
        ),
    )

    extra = {"fused_layer": use_fused}
    for key, fn in (
        ("gluestick_pairs_per_s", bench_gluestick),
        ("loftr_pairs_per_s", bench_loftr),
        ("ba_obs_per_s", bench_ba),
    ):
        try:
            extra[key] = round(fn(floor), 2)
        except Exception as e:  # secondary metrics never kill the primary
            extra[key] = None
            extra[key.rsplit("_", 2)[0] + "_error"] = str(e)[:200]

    print(
        json.dumps(
            {
                "metric": "matched_pairs_per_s_sp_lg_1024kpts_640x480",
                "value": round(pairs_per_s, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--gate-probe" in sys.argv:
        _gate_probe()
    else:
        main()
