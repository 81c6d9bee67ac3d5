"""One-command accuracy-parity proof against the reference
(VERDICT r2 item 2; reference `tests/test_integration.py:50-135` +
README.md:63-77 detailed HPatches block).

    python tools/prove_parity.py [--weights-dir DATA_PATH/weights]
                                 [--hpatches] [--max-kpts 1024]

Steps (each skipped with a loud message if its inputs are absent):
  1. Convert the official torch checkpoints (superpoint_v1.pth +
     superpoint_lightglue.pth) to a framework checkpoint under
     outputs/training/sp+lg-official.
  2. Golden boat-pair check: run the converted pipeline through the full
     match + device-RANSAC stack and compare against the reference's
     integration floors (num_matches > 1300, prec@3px > 0.8,
     H_error_ransac < 1.0).
  3. (--hpatches) Run the HPatches benchmark and diff the summary numbers
     against the BASELINE.md floors (SP+LG official, 1024 kpts).

Exit code 0 = all executed stages met their floors.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


# BASELINE.md detailed HPatches block (SP+LG official, 1024 kpts,
# reference README.md:63-77). Floors use a 5% relative tolerance: bf16
# matmuls + device RANSAC drift (SURVEY.md §7.3).
HPATCHES_FLOORS = {
    "H_error_dlt@1px": 0.3515,
    "H_error_dlt@3px": 0.6723,
    "H_error_dlt@5px": 0.7756,
    "H_error_ransac@1px": 0.3428,
    "H_error_ransac@3px": 0.5763,
    "H_error_ransac@5px": 0.6943,
    "H_error_ransac_mAA": 0.5378,
    "mprec@3px": 0.89,
}
REL_TOL = 0.05


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights-dir", type=Path, default=None)
    parser.add_argument("--hpatches", action="store_true")
    parser.add_argument("--max-kpts", type=int, default=1024)
    parser.add_argument("--estimator", type=str, default="device_lo_ransac")
    args = parser.parse_args()

    import gluefactory_tpu.eval.golden as golden
    from gluefactory_tpu.settings import TRAINING_PATH

    if args.weights_dir is not None:
        golden.OFFICIAL_WEIGHTS = {
            "superpoint": args.weights_dir / "superpoint_v1.pth",
            "lightglue": args.weights_dir / "superpoint_lightglue.pth",
        }
    if not golden.official_weights_available():
        print(
            "FAIL: official weights not found; mount them at:\n  "
            + "\n  ".join(str(p) for p in golden.OFFICIAL_WEIGHTS.values())
        )
        return 1

    # 1. convert -> framework checkpoint
    print("== converting official checkpoints ==")
    model, variables = golden.build_official_pipeline(
        max_num_keypoints=args.max_kpts
    )
    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.utils.experiments import save_experiment

    out = TRAINING_PATH / "sp+lg-official"
    out.mkdir(parents=True, exist_ok=True)
    save_experiment(
        out,
        {"params": variables, "step": np.asarray(0)},
        conf=Config({"model": {
            "name": "two_view_pipeline",
            "extractor": {
                "name": "superpoint",
                "channels": [64, 64, 128, 128, 256],
                "norm": "none",
                "max_num_keypoints": args.max_kpts,
                "detection_threshold": 0.0,
                "nms_radius": 3,
                "trainable": False,
            },
            "matcher": {
                "name": "lightglue",
                "filter_threshold": 0.1,
                "trainable": False,
            },
        }}),
        step=0,
        keep_last=0,
    )
    print(f"checkpoint written: {out}")

    ok = True

    # 2. golden boat pair
    print("== golden boat-pair check ==")
    results = golden.run_boat_golden(
        model=model, variables=variables, estimator=args.estimator
    )
    print(json.dumps(results, indent=2))
    checks = [
        ("num_matches", results["num_matches"], ">", golden.GOLDEN_FLOORS["num_matches"]),
        ("prec@3px", results["prec@3px"], ">", golden.GOLDEN_FLOORS["prec@3px"]),
        ("H_error_ransac", results["H_error_ransac"], "<", golden.GOLDEN_FLOORS["H_error_ransac"]),
    ]
    for name, val, op, floor in checks:
        passed = val > floor if op == ">" else val < floor
        ok &= passed
        print(f"  {'PASS' if passed else 'FAIL'}: {name}={val:.4f} {op} {floor}")

    # 3. HPatches diff vs BASELINE.md
    if args.hpatches:
        print("== HPatches benchmark vs BASELINE.md ==")
        from gluefactory_tpu.eval import run_benchmark
        from gluefactory_tpu.settings import EVAL_PATH

        bench_dir = EVAL_PATH / "hpatches" / "prove_parity"
        s, _, _ = run_benchmark(
            "hpatches",
            Config({
                "model": {"checkpoint": str(out)},
                "eval": {"estimator": args.estimator, "ransac_th": -1},
            }),
            bench_dir,
        )
        for key, ref in HPATCHES_FLOORS.items():
            got = s.get(key)
            if got is None:
                print(f"  MISSING: {key} (ref {ref})")
                ok = False
                continue
            passed = got >= ref * (1 - REL_TOL)
            ok &= passed
            print(
                f"  {'PASS' if passed else 'FAIL'}: {key}={got:.4f} "
                f"(reference {ref}, floor {ref * (1 - REL_TOL):.4f})"
            )

    print(f"\n{'PARITY PROVEN' if ok else 'PARITY NOT MET'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
