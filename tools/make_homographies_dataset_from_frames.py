"""Build a homographies-dataset image folder from extracted video frames.

Reference analog: `tools/make_homographies_dataset_from_frames.py`. Selects
a diverse, sharp subset of frames (greedy: keep a frame only if it is sharp
AND sufficiently different from the last kept frame by mean absolute
difference on a downscaled gray thumbnail), then writes them into a flat
directory + `image_list.txt` usable as `data.data_dir` / `data.image_list`
by `datasets/homographies.py`.

Usage:
  python -m tools.make_homographies_dataset_from_frames <frames_root> <out_dir>
      [--num 1000] [--min-sharpness 30] [--min-diff 8]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import cv2
import numpy as np

from .extract_frames import sharpness

EXTS = {".png", ".jpg", ".jpeg", ".ppm", ".bmp"}


def thumb(gray: np.ndarray, size=64) -> np.ndarray:
    return cv2.resize(gray, (size, size), interpolation=cv2.INTER_AREA).astype(
        np.float32)


def select_frames(paths, num, min_sharp, min_diff):
    kept, last = [], None
    for p in paths:
        gray = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        if gray is None:
            continue
        if min_sharp > 0 and sharpness(gray) < min_sharp:
            continue
        t = thumb(gray)
        if last is not None and float(np.abs(t - last).mean()) < min_diff:
            continue
        kept.append(p)
        last = t
        if num and len(kept) >= num:
            break
    return kept


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("frames_root", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--num", type=int, default=1000)
    ap.add_argument("--min-sharpness", type=float, default=30.0)
    ap.add_argument("--min-diff", type=float, default=8.0,
                    help="min mean |diff| on 64x64 thumbnails vs last kept")
    args = ap.parse_args(argv)

    paths = [p for p in sorted(args.frames_root.rglob("*"))
             if p.suffix.lower() in EXTS]
    kept = select_frames(paths, args.num, args.min_sharpness, args.min_diff)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    names = []
    for i, p in enumerate(kept):
        name = f"{i:06d}{p.suffix.lower()}"
        shutil.copyfile(p, args.out_dir / name)
        names.append(name)
    (args.out_dir / "image_list.txt").write_text("\n".join(names) + "\n")
    print(f"selected {len(kept)} / {len(paths)} frames -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
