"""Summarize Endomapper npz map statistics (sizes, keypoints, overlap).

Reference analog: `tools/get_map_sizes.py` (map-size histogram over the
processed npz dir with train/val split attribution). Works on the npz
schema written by `tools/preprocess_endomapper.py`
(`datasets/endomapper_utils.colmap_map_to_npz`).

Usage:
  python -m tools.get_map_sizes <npz_dir> [--train-list t.txt --val-list v.txt]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

BINS = [0, 25, 50, 100, 200, 10**9]


def read_list(path: Path | None):
    if not path or not path.exists():
        return None
    return {ln.strip() for ln in path.read_text().splitlines() if ln.strip()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("npz_dir", type=Path)
    ap.add_argument("--train-list", type=Path, default=None)
    ap.add_argument("--val-list", type=Path, default=None)
    args = ap.parse_args(argv)

    train = read_list(args.train_list)
    val = read_list(args.val_list)
    hist = np.zeros(len(BINS) - 1, np.int64)
    sizes, rows = [], []
    split_imgs = {"train": 0, "val": 0, "?": 0}
    for p in sorted(args.npz_dir.glob("*.npz")):
        with np.load(p, allow_pickle=True) as m:
            n = len(m["image_names"])
            kpts = m["keypoints"]
            n_kpts = [len(k) for k in kpts]
            ov = np.asarray(m["overlap_matrix"], np.float32)
            pairable = int(((ov > 0.1) & ~np.eye(n, dtype=bool)).sum() // 2)
        split = ("train" if train and p.stem in train else
                 "val" if val and p.stem in val else "?")
        split_imgs[split] += n
        sizes.append(n)
        hist[np.searchsorted(BINS, n, side="right") - 1] += 1
        rows.append(
            f"{p.stem:40s} {split:5s} images={n:4d} "
            f"kpts/img={np.mean(n_kpts):7.1f} pairs(ov>0.1)={pairable}")
    for r in rows:
        print(r)
    print("-" * 60)
    labels = [f"[{BINS[i]},{BINS[i+1]})" for i in range(len(hist))]
    labels[-1] = f">={BINS[-2]}"
    print("map-size histogram:",
          ", ".join(f"{l}: {c}" for l, c in zip(labels, hist)))
    print(f"total maps {len(sizes)}, total images {sum(sizes)}, "
          f"split images {split_imgs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
