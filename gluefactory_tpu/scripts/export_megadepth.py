"""MegaDepth feature-cache exporter
(reference `gluefactory/scripts/export_megadepth.py:16-137`).

Enumerates every unique image of the MegaDepth scene-info files, runs a
named extractor config, samples keypoint depths from the scene depth maps,
and writes one HDF5 cache keyed `scene/name` — the format
`data.load_features` training consumes.

Usage:
  python -m gluefactory_tpu.scripts.export_megadepth --method sp \
      [--scenes scene0 scene1] [--num-workers 2]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .. import logger
from ..settings import DATA_PATH
from .export_local_features import METHODS, run_image_export

RESIZE = 1024


def iter_megadepth_images(scenes=None, data_dir="megadepth"):
    root = DATA_PATH / data_dir
    info_dir = root / "scene_info"
    for info_path in sorted(info_dir.glob("*.npz")):
        scene = info_path.stem
        if scenes and scene not in scenes:
            continue
        info = np.load(str(info_path), allow_pickle=True)
        image_paths = info["image_paths"]
        depth_paths = info.get("depth_paths")
        for i, rel in enumerate(image_paths):
            if rel is None:
                continue
            img_path = root / str(rel)
            if not img_path.exists():
                continue
            depth_path = (
                root / str(depth_paths[i])
                if depth_paths is not None and depth_paths[i] is not None
                else None
            )
            yield f"{scene}/{Path(str(rel)).name}", img_path, depth_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="sp", choices=sorted(METHODS))
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--data-dir", default="megadepth")
    ap.add_argument("--output", default=None)
    ap.add_argument("--resize", type=int, default=RESIZE)
    args = ap.parse_args()

    out = Path(
        args.output
        or DATA_PATH / "exports" / "megadepth" / f"r{args.resize}_{args.method}.h5"
    )
    n = run_image_export(
        iter_megadepth_images(args.scenes, args.data_dir),
        METHODS[args.method],
        out,
        resize=args.resize,
        with_depth=True,
    )
    logger.info(f"exported {n} images to {out}")


if __name__ == "__main__":
    main()
