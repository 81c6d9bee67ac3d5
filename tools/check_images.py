"""Dataset image-integrity scan: undecodable / truncated / fully-black files.

Covers the reference's corruption forensics tooling
(`tools/check_corrupted_images.py`, `tools/check_npz_images_endomapper.py`):
scan a directory of images, or every frame referenced by Endomapper npz
maps, and report files that fail to decode or are degenerate. Writes an
optional quarantine list consumable by the datasets' `exclude_list` confs.

Usage:
  python -m tools.check_images <image_dir> [--black-threshold 2]
  python -m tools.check_images <npz_dir> --npz --frames-root <frames_dir>
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

EXTS = {".png", ".jpg", ".jpeg", ".ppm", ".bmp", ".tif", ".tiff"}


def check_image(path: Path, black_threshold: int = 0):
    """Returns (ok, reason). A file is bad if missing, undecodable, zero-
    sized, or has no pixel above `black_threshold` (dead frame)."""
    if not path.exists():
        return False, "missing"
    if path.stat().st_size == 0:
        return False, "empty file"
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        return False, "undecodable"
    if img.size == 0:
        return False, "decoded to zero pixels"
    if int(img.max()) <= black_threshold:
        return False, f"fully black (max={int(img.max())})"
    return True, ""


def iter_image_paths(root: Path):
    for p in sorted(root.rglob("*")):
        if p.suffix.lower() in EXTS:
            yield p


def iter_npz_frames(npz_dir: Path, frames_root: Path):
    """Yield every frame path referenced by the npz maps
    (`datasets/endomapper_utils.colmap_map_to_npz` schema: image_names)."""
    for npz_path in sorted(npz_dir.glob("*.npz")):
        with np.load(npz_path, allow_pickle=True) as m:
            for name in m["image_names"]:
                yield npz_path.stem, frames_root / str(name)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("root", type=Path)
    ap.add_argument("--npz", action="store_true",
                    help="treat root as a dir of npz maps; check the frames "
                    "they reference under --frames-root")
    ap.add_argument("--frames-root", type=Path, default=None)
    ap.add_argument("--black-threshold", type=int, default=0)
    ap.add_argument("--quarantine", type=Path, default=None,
                    help="write bad paths, one per line")
    args = ap.parse_args(argv)

    bad = []
    n = 0
    if args.npz:
        frames_root = args.frames_root or args.root
        items = ((f"{m}:{p.name}", p) for m, p in
                 iter_npz_frames(args.root, frames_root))
    else:
        items = ((str(p.relative_to(args.root)), p) for p in
                 iter_image_paths(args.root))
    for label, path in items:
        n += 1
        ok, reason = check_image(path, args.black_threshold)
        if not ok:
            bad.append((label, reason))
            print(f"BAD {label}: {reason}")
    print(f"checked {n} images, {len(bad)} bad")
    if args.quarantine and bad:
        args.quarantine.write_text(
            "\n".join(label for label, _ in bad) + "\n")
        print(f"quarantine list -> {args.quarantine}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
