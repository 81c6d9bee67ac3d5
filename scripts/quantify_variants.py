"""Accuracy deltas for the inference speed knobs (VERDICT r4 item 5).

int8 serving shipped with a size win but no measured accuracy cost, and
adaptive depth with a throughput win but only a match-agreement number.
This script closes both: it loads a TRAINED experiment, draws val pairs
(with GT homographies) from the experiment's own data distribution, and for
each variant —

  f32       the checkpoint as-is (baseline)
  int8      weights roundtripped through the serving quantizer
            (`utils/serving.quantize_variables` -> `dequantize_tree`:
            numerically exactly what the int8 bundle computes)
  adaptive  `matcher.depth_confidence = 0.95` early-exit

— reports matches/pair, match precision@1/3px under the GT homography,
RANSAC H-AUC@1/3/5px (device LO-RANSAC, the eval default), and agreement
of match indices with the f32 baseline. Precedent: the reference's
estimator tables pair every speed knob with accuracy
(`/root/reference/README.md:183-188`).

Usage: timeout 3600 python scripts/quantify_variants.py [exp] [n_batches]
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gluefactory_tpu import load_experiment
    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.eval.utils import (
        eval_homography_robust,
        eval_matches_homography,
    )
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.utils.serving import (
        dequantize_tree,
        quantize_variables,
    )
    from gluefactory_tpu.utils.tools import AUCMetric

    exp = sys.argv[1] if len(sys.argv) > 1 else "lg_synth_r5"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    try:
        _, variables, conf = load_experiment(exp)
    except (FileNotFoundError, ValueError, IndexError):
        _, variables, conf = load_experiment(exp, get_last=True)

    dconf = conf["data"].to_dict()
    dconf["num_workers"] = 0
    dataset = get_dataset(dconf["name"])(dconf)
    loader = dataset.get_data_loader("val")
    batches = []
    for i, b in enumerate(loader):
        if i >= n_batches:
            break
        batches.append(b)
    B = int(np.asarray(batches[0]["view0"]["image"]).shape[0])
    n_pairs = len(batches) * B

    def build(mconf_edit=None):
        mconf = conf["model"].to_dict()
        if mconf_edit:
            mconf_edit(mconf)
        m = get_model(mconf["name"]).from_conf(mconf)
        return jax.jit(lambda v, d: m.apply(v, d, train=False))

    variants = {
        "f32": (build(), variables),
        "int8": (build(), dequantize_tree(quantize_variables(variables))),
        "adaptive": (
            build(lambda mc: mc["matcher"].update({"depth_confidence": 0.95})),
            variables,
        ),
    }

    est_conf = Config({"estimator": "device_lo_ransac", "ransac_th": 3.0})
    out = {"experiment": exp, "n_pairs": n_pairs}
    base_matches = None
    for name, (fwd, vs) in variants.items():
        per_pair = []
        h_errs = []
        all_matches = []
        for b in batches:
            data = {
                "view0": {"image": jnp.asarray(b["view0"]["image"])},
                "view1": {"image": jnp.asarray(b["view1"]["image"])},
            }
            pred = jax.device_get(fwd(vs, data))
            all_matches.append(np.asarray(pred["matches0"]))
            H = np.asarray(b["H_0to1"])
            if "image_size" in b["view0"]:
                size = np.asarray(b["view0"]["image_size"])
            else:
                _, ih, iw = np.asarray(b["view0"]["image"]).shape[:3]
                size = np.broadcast_to(
                    np.asarray([iw, ih], np.float32), (B, 2))
            for i in range(B):
                data_i = {
                    "H_0to1": H[i],
                    "view0": {"image_size": size[i]},
                }
                pred_i = {k: v[i] for k, v in pred.items()
                          if hasattr(v, "ndim") and v.ndim > 0}
                r = eval_matches_homography(data_i, pred_i)
                r.update(eval_homography_robust(data_i, pred_i, est_conf))
                per_pair.append(r)
                h_errs.append(r["H_error_ransac"])
        m = np.concatenate([a.reshape(-1) for a in all_matches])
        if base_matches is None:
            base_matches = m
            agreement = 1.0
        else:
            mask = (base_matches >= 0) | (m >= 0)
            agreement = float((base_matches[mask] == m[mask]).mean())
        aucs = AUCMetric([1, 3, 5], np.asarray(h_errs, np.float64)).compute()
        out[name] = {
            "mnum_matches": round(float(np.mean(
                [p["num_matches"] for p in per_pair])), 1),
            "mprec@1px": round(float(np.nanmean(
                [p["prec@1px"] for p in per_pair])), 4),
            "mprec@3px": round(float(np.nanmean(
                [p["prec@3px"] for p in per_pair])), 4),
            "H_auc@1px": round(float(aucs[0]), 4),
            "H_auc@3px": round(float(aucs[1]), 4),
            "H_auc@5px": round(float(aucs[2]), 4),
            "match_agreement_vs_f32": round(agreement, 4),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
