"""Run a matching pipeline on one image pair and save a match figure + stats.

Reference analog: `tools/inspect_pair.py` (browse an eval pair through the
interactive viewer). This version is headless-friendly: give it two images
and either a `--conf` model config or a trained `--checkpoint`, it runs the
pipeline and writes `<out>.png` (side-by-side matches colored by score) and
prints match statistics.

Usage:
  python -m tools.inspect_pair img0.png img1.png --conf superpoint+lightglue-official \\
      --out pair.png [--resize 640]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def load_gray(path: Path, resize: int | None):
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    if resize:
        h, w = img.shape
        s = resize / max(h, w)
        # round to multiples of 8: every backbone in the zoo downsamples 3x
        nw, nh = max(8, int(w * s) // 8 * 8), max(8, int(h * s) // 8 * 8)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
    return img.astype(np.float32)[None, ..., None] / 255.0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("image0", type=Path)
    ap.add_argument("image1", type=Path)
    ap.add_argument("--conf", type=str, default=None,
                    help="model config name/path (model: block or full conf)")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="experiment name/dir (overrides --conf)")
    ap.add_argument("--out", type=Path, default=Path("pair_matches.png"))
    ap.add_argument("--resize", type=int, default=640)
    ap.add_argument("--min-score", type=float, default=0.0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.io import load_model, parse_config_path
    from gluefactory_tpu.settings import root as repo_root

    if args.checkpoint:
        model, variables = load_model(None, args.checkpoint)
    else:
        conf_path = parse_config_path(
            args.conf, repo_root / "gluefactory_tpu" / "configs")
        conf = Config.load(conf_path)
        model_conf = conf.get("model", conf)
        model, variables = load_model(model_conf, None)

    im0 = jnp.asarray(load_gray(args.image0, args.resize))
    im1 = jnp.asarray(load_gray(args.image1, args.resize))
    data = {
        "view0": {"image": im0,
                  "image_size": jnp.asarray([[im0.shape[2], im0.shape[1]]],
                                            jnp.float32)},
        "view1": {"image": im1,
                  "image_size": jnp.asarray([[im1.shape[2], im1.shape[1]]],
                                            jnp.float32)},
    }
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), data, train=False)
    pred = jax.device_get(
        jax.jit(lambda v, d: model.apply(v, d, train=False))(variables, data))

    k0 = np.asarray(pred["keypoints0"][0])
    k1 = np.asarray(pred["keypoints1"][0])
    m0 = np.asarray(pred["matches0"][0])
    sc = np.asarray(pred["matching_scores0"][0])
    v0 = np.asarray(pred.get("keypoint_valid0",
                             np.ones(len(k0), bool))).reshape(-1)
    sel = (m0 >= 0) & v0 & (sc > args.min_score)
    mk0, mk1, msc = k0[sel], k1[m0[sel]], sc[sel]
    print(f"keypoints: {int(v0.sum())} / "
          f"{int(np.asarray(pred.get('keypoint_valid1', v0)).sum())}")
    print(f"matches: {int(sel.sum())}  mean score {msc.mean() if len(msc) else 0:.3f}")

    import matplotlib

    matplotlib.use("Agg")
    from gluefactory_tpu.visualization.viz2d import (
        cm_RdGn, plot_images, plot_matches,
    )

    fig, axes = plot_images(
        [np.asarray(im0[0, ..., 0]), np.asarray(im1[0, ..., 0])],
        titles=[args.image0.name, args.image1.name])
    plot_matches(axes[0], axes[1], mk0, mk1, color=cm_RdGn(msc), lw=0.6)
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(f"figure -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
