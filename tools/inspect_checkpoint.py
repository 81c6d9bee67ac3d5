"""Summarize a training experiment checkpoint: step, conf, parameter tree.

Reference analog: `tools/inspect_pth.py` (torch state-dict dump). Here the
checkpoints are Orbax trees (`utils/experiments.py`), so this prints the
flattened parameter paths with shapes/dtypes and per-submodel param counts.

Usage:
  python -m tools.inspect_checkpoint <experiment-or-checkpoint-dir> [--full]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def summarize(tree, full: bool):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    by_root = {}
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        n = int(np.size(leaf))
        total += n
        root = name.split("/")[1] if name.startswith("params/") else \
            name.split("/")[0]
        by_root[root] = by_root.get(root, 0) + n
        if full:
            print(f"  {name}: {tuple(np.shape(leaf))} "
                  f"{np.asarray(leaf).dtype} ({n:,})")
    for root, n in sorted(by_root.items(), key=lambda kv: -kv[1]):
        print(f"  [{root}] {n:,} params")
    print(f"  total: {total:,} params")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path", type=Path,
                    help="experiment dir (picks best/latest) or checkpoint dir")
    ap.add_argument("--full", action="store_true",
                    help="print every parameter leaf")
    args = ap.parse_args(argv)

    from gluefactory_tpu.utils.experiments import load_experiment

    path = args.path
    if (path / "config.yaml").exists() or not path.exists():
        # experiment dir (or name under TRAINING_PATH)
        model, variables, conf = load_experiment(str(path))
        print(f"experiment: {path}")
        model_conf = conf.get("model", conf)
        print(f"model: {model_conf.get('name')}")
        if path.exists():
            ckpts = sorted(d.name for d in path.glob("checkpoint_*"))
            if ckpts:
                print(f"checkpoints: {ckpts}")
        summarize(variables, args.full)
    else:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(path.resolve())
        step = restored.get("step")
        if step is not None:
            print(f"step: {int(np.asarray(step))}")
        summarize(restored.get("params", restored), args.full)
    return 0


if __name__ == "__main__":
    sys.exit(main())
