"""Compare a matching pipeline with and without keypoint-rotation
augmentation on one validation batch, side by side.

Reference analog: `gluefactory/scripts/visualize_endomapper_rotation.py`
(builds the model twice with rotation enabled/disabled and writes
rotation-compare figures). Here the fork's augmentation lives in
`TwoViewPipeline.kp_rotation`; this script runs the same batch through
both variants (identical params) and writes `<out>/<pair>_{plain,rot}.png`
plus a match-count table, making the augmentation's effect visible.

Usage:
  python -m gluefactory_tpu.scripts.visualize_kp_rotation --config
      superpoint+lightglue_homography --split val --n-pairs 2 --out rot_viz
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build(conf_model, p):
    from ..core.config import Config
    from ..models import get_model

    conf = Config.merge(
        Config(conf_model.to_dict()),
        {"kp_rotation": {"p": float(p), "max_angle": 180.0}},
    )
    return get_model(conf["name"]).from_conf(conf)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--split", type=str, default="val")
    ap.add_argument("--n-pairs", type=int, default=2)
    ap.add_argument("--out", type=Path, default=Path("rot_viz"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from ..core.config import Config
    from ..datasets import get_dataset
    from ..eval.io import parse_config_path
    from ..settings import root as repo_root
    from ..train.trainer import prepare_batch
    from ..parallel.mesh import make_mesh
    from ..visualization.visualize_batch import make_match_figures

    conf = Config.load(
        parse_config_path(args.config,
                          repo_root / "gluefactory_tpu" / "configs"))
    dataset = get_dataset(conf.data.name)(conf.data)
    loader = dataset.get_data_loader(args.split)
    data = next(iter(loader))
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    batch = prepare_batch(data, mesh)

    args.out.mkdir(parents=True, exist_ok=True)
    params = None
    for tag, p in (("plain", 0.0), ("rot", 1.0)):
        model = build(conf.model, p)
        if params is None:
            params = model.init(
                {"params": jax.random.PRNGKey(args.seed),
                 "aug": jax.random.PRNGKey(args.seed)},
                batch, train=True)
        pred = jax.device_get(
            jax.jit(
                lambda v, d: model.apply(
                    v, d, train=True,
                    rngs={"aug": jax.random.PRNGKey(args.seed + 1)})
            )(params, batch))
        n_match = int((np.asarray(pred["matches0"]) >= 0).sum())
        print(f"[{tag}] total matches in batch: {n_match}")
        for name, fig in make_match_figures(
                pred, data, n_pairs=args.n_pairs).items():
            fig.savefig(args.out / f"{name}_{tag}.png", dpi=120,
                        bbox_inches="tight")
    print(f"figures -> {args.out}")
    return 0


if __name__ == "__main__":
    main()
