"""Endomapper-dense feature-cache exporter
(reference `gluefactory/scripts/export_endomapper_dense.py`).

Enumerates every frame of the Endomapper dense map npz caches (built by
`tools/preprocess_endomapper_dense.py`), extracts features with a named
config, samples keypoint depths from the masked dense-depth files, and
writes one HDF5 keyed `<map>/<name>`.

Usage:
  python -m gluefactory_tpu.scripts.export_endomapper_dense --method sp
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .. import logger
from ..settings import DATA_PATH
from .export_local_features import METHODS, run_image_export


def iter_endomapper_images(maps_dir="endomapper/maps", images_dir="endomapper"):
    mroot = DATA_PATH / maps_dir
    iroot = DATA_PATH / images_dir
    for map_path in sorted(mroot.glob("*.npz")):
        m = dict(np.load(str(map_path), allow_pickle=True))
        if "image_paths" not in m or m["image_paths"] is None:
            continue
        names = m["image_names"]
        depth_paths = m.get("depth_paths")
        for i, rel in enumerate(m["image_paths"]):
            img_path = iroot / str(rel)
            if not img_path.exists():
                continue
            dpath = (
                iroot / str(depth_paths[i])
                if depth_paths is not None and (iroot / str(depth_paths[i])).exists()
                else None
            )
            yield f"{map_path.stem}/{names[i]}", img_path, dpath


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="sp", choices=sorted(METHODS))
    ap.add_argument("--maps-dir", default="endomapper/maps")
    ap.add_argument("--images-dir", default="endomapper")
    ap.add_argument("--output", default=None)
    ap.add_argument("--resize", type=int, default=480)
    args = ap.parse_args()

    out = Path(
        args.output
        or DATA_PATH / "exports" / "endomapper" / f"r{args.resize}_{args.method}.h5"
    )
    n = run_image_export(
        iter_endomapper_images(args.maps_dir, args.images_dir),
        METHODS[args.method],
        out,
        resize=args.resize,
        with_depth=True,
    )
    logger.info(f"exported {n} frames to {out}")


if __name__ == "__main__":
    main()
