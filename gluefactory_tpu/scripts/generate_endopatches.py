"""Generate a saved synthetic homography eval set (the endopatches1800
builder; reference homographies save/replay mode, `homographies.py:290` +
`tools/` homography dataset builder).

Renders deterministic (image, warped image, H) triplets from a source image
folder (or procedural textures) into the `image_pairs` format consumed by
`eval/endopatches1800.py`.

  python -m gluefactory_tpu.scripts.generate_endopatches \
      --output data/endopatches1800 --num 1800 [--source <image_dir>] \
      [--vignette]  # endoscope-style circular vignette
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from ..datasets.homographies import generate_synthetic_image
from ..geometry.homography import sample_homography_corners


def apply_vignette(img: np.ndarray) -> np.ndarray:
    """Endoscope-style circular crop (fork vignette handling)."""
    h, w = img.shape[:2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    r = np.sqrt((xs - w / 2) ** 2 + (ys - h / 2) ** 2)
    mask = (r < min(h, w) * 0.48).astype(np.float32)
    mask = cv2.GaussianBlur(mask, (31, 31), 10)
    return (img.astype(np.float32) * mask[..., None]).astype(img.dtype)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--num", type=int, default=1800)
    parser.add_argument("--source", type=Path, default=None)
    parser.add_argument("--size", type=int, nargs=2, default=[640, 480])
    parser.add_argument("--difficulty", type=float, default=0.6)
    parser.add_argument("--vignette", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    img_dir = args.output / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    w, h = args.size

    sources = []
    if args.source:
        sources = sorted(
            p for g in ("*.jpg", "*.png") for p in args.source.glob(g)
        )

    pairs = []
    for i in range(args.num):
        if sources:
            img = cv2.imread(str(sources[i % len(sources)]))
            img = cv2.resize(img, (w, h))
        else:
            img = (generate_synthetic_image(rng, w, h) * 255).astype(np.uint8)
        # difficulty schedule over the set (fork's deterministic test
        # schedules, reference `homographies.py:290`)
        difficulty = args.difficulty * (0.5 + 0.5 * (i % 5) / 4)
        H, _, _, _ = sample_homography_corners(
            (w, h), (w, h), difficulty=difficulty, rng=rng
        )
        warped = cv2.warpPerspective(img, H, (w, h))
        if args.vignette:
            img = apply_vignette(img)
            warped = apply_vignette(warped)
        n0, n1 = f"{i:05d}_0.png", f"{i:05d}_1.png"
        cv2.imwrite(str(img_dir / n0), img)
        cv2.imwrite(str(img_dir / n1), warped)
        pairs.append(" ".join([n0, n1] + [f"{x:.8e}" for x in H.ravel()]))
    (args.output / "pairs.txt").write_text("\n".join(pairs))
    print(f"wrote {args.num} pairs to {args.output}")


if __name__ == "__main__":
    main()
