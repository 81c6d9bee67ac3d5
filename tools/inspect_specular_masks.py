"""Visualize/validate specular-highlight masks on endoscopy frames.

Reference analog: `tools/inspect_specular_masks.py`. Runs
`datasets/endomapper_utils.compute_specular_mask` over frames, reports the
masked-area fraction per image (flagging frames where the mask eats an
implausible share — usually a wrong brightness threshold), and optionally
writes overlay figures.

Usage:
  python -m tools.inspect_specular_masks <image_dir_or_file> [--th 0.85]
      [--dilate 5] [--save-overlays out_dir] [--max-frac 0.3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

from gluefactory_tpu.datasets.endomapper_utils import compute_specular_mask

EXTS = {".png", ".jpg", ".jpeg", ".ppm", ".bmp"}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("root", type=Path)
    ap.add_argument("--th", type=float, default=0.85)
    ap.add_argument("--dilate", type=int, default=5)
    ap.add_argument("--max-frac", type=float, default=0.3,
                    help="flag frames with a larger masked fraction")
    ap.add_argument("--save-overlays", type=Path, default=None)
    args = ap.parse_args(argv)

    paths = ([args.root] if args.root.is_file() else
             [p for p in sorted(args.root.rglob("*"))
              if p.suffix.lower() in EXTS])
    if args.save_overlays:
        args.save_overlays.mkdir(parents=True, exist_ok=True)
    flagged = 0
    fracs = []
    for p in paths:
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if img is None:
            print(f"{p}: undecodable")
            continue
        imgf = img[..., ::-1].astype(np.float32) / 255.0
        mask = compute_specular_mask(imgf, args.th, args.dilate)
        frac = float(mask.mean())
        fracs.append(frac)
        line = f"{p.name}: specular {frac * 100:.2f}%"
        if frac > args.max_frac:
            line += "  <-- FLAG"
            flagged += 1
        print(line)
        if args.save_overlays:
            overlay = img.copy()
            overlay[mask] = (0, 0, 255)
            out = cv2.addWeighted(img, 0.5, overlay, 0.5, 0)
            cv2.imwrite(str(args.save_overlays / p.name), out)
    if fracs:
        print(f"mean {np.mean(fracs) * 100:.2f}% | max "
              f"{np.max(fracs) * 100:.2f}% | flagged {flagged}/{len(fracs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
