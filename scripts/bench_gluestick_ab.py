"""One-process on-chip A/B for GlueStick (VERDICT r4 item 8: the 852
pairs/s number never had an optimization round): dtype x fused-QKV grid at
the bench shapes (B=8, 1024 kpts, 256 lines), plus a GNN-only stage split
so the ledger separates the scan body from encoders + assignment heads.

Usage: timeout 2400 python scripts/bench_gluestick_ab.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, N, L, D = 8, 1024, 256, 256
ITERS, REPS = 12, 7


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    rng = np.random.RandomState(0)
    kp = jnp.asarray(rng.rand(ITERS, B, N, 2) * 480, jnp.float32)
    ds = jnp.asarray(rng.randn(ITERS, B, N, D), jnp.float32)
    lj = jnp.asarray(rng.randint(0, N, (ITERS, B, L, 2)), jnp.int32)
    e0 = jnp.take_along_axis(kp, lj[..., 0:1], axis=2)
    e1 = jnp.take_along_axis(kp, lj[..., 1:2], axis=2)
    ln = jnp.stack([e0, e1], axis=3)

    floor_jit = jax.jit(lambda x: x + 1)
    float(jax.device_get(floor_jit(jnp.float32(0))))
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(floor_jit(jnp.float32(i))))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    out = {"floor_ms": round(floor * 1e3, 2), "B": B, "N": N, "L": L}

    def data_at(i):
        return {
            "keypoints0": kp[i], "keypoints1": kp[i],
            "descriptors0": ds[i], "descriptors1": ds[i],
            "lines0": ln[i], "lines1": ln[i],
            "lines_junc_idx0": lj[i], "lines_junc_idx1": lj[i],
        }

    base_vars = None
    for dtype in ("bfloat16", "float32"):
        for fused in (False, True):
            conf = {"n_layers": 9, "descriptor_dim": D, "dtype": dtype,
                    "fused_qkv": fused}
            model = get_model("gluestick").from_conf(conf)
            if base_vars is None:
                base_vars = model.init(
                    jax.random.PRNGKey(0), data_at(0), train=False)
            if fused:
                from tests.test_gluestick_fused import _fuse_params

                # jnp-ify: _fuse_params returns a numpy tree, which would
                # re-upload all weights through the tunnel on every call
                variables = jax.tree.map(jnp.asarray, _fuse_params(base_vars))
            else:
                variables = base_vars

            def run_all(v, kps, dss, ljs, lns, m=model):
                def body(c, xs):
                    k_, d_, j_, l_ = xs
                    pred = m.apply(
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
                        pred["line_matches0"]), None

                o, _ = jax.lax.scan(body, jnp.float32(0), (kps, dss, ljs, lns))
                return o

            run_jit = jax.jit(run_all)
            chk = float(jax.device_get(run_jit(variables, kp, ds, lj, ln)))
            times = []
            for i in range(REPS):
                kp2 = kp.at[0, 0, 0, 0].add(1e-3 * (i + 1))
                t0 = time.perf_counter()
                float(jax.device_get(run_jit(variables, kp2, ds, lj, ln)))
                times.append(time.perf_counter() - t0)
            pps = B * ITERS / max(float(np.min(times)) - floor, 1e-6)
            tag = f"{dtype}_fused{int(fused)}"
            out[tag] = round(pps, 2)
            out[f"{tag}_checksum"] = chk
            print(f"{tag}: {pps:.1f} pairs/s (checksum {chk})",
                  file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
