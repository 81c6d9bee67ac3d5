"""Extract frames from videos (sharpness-filtered, strided) into image dirs.

Reference analog: `tools/extract_frames_depths_matches_endomapper_seq.py` +
`tools/all_oneliner_extract_frames.sh` (ffmpeg one-liners). This version is
a single cv2-based tool: every N-th frame is decoded, optionally gated by a
variance-of-Laplacian sharpness threshold (endoscopy videos are full of
motion blur), and written as `<stem>/frame_%06d.png`.

Usage:
  python -m tools.extract_frames video.mp4 out_dir [--every 5]
      [--min-sharpness 40] [--max-frames 2000] [--resize 640]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np


def sharpness(gray: np.ndarray) -> float:
    """Variance of the Laplacian: standard blur metric."""
    return float(cv2.Laplacian(gray, cv2.CV_64F).var())


def extract(video: Path, out_dir: Path, every=5, min_sharp=0.0,
            max_frames=None, resize=None):
    cap = cv2.VideoCapture(str(video))
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {video}")
    out_dir.mkdir(parents=True, exist_ok=True)
    kept = idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % every == 0:
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            if min_sharp <= 0 or sharpness(gray) >= min_sharp:
                if resize:
                    h, w = frame.shape[:2]
                    s = resize / max(h, w)
                    frame = cv2.resize(
                        frame, (int(w * s), int(h * s)),
                        interpolation=cv2.INTER_AREA)
                cv2.imwrite(str(out_dir / f"frame_{idx:06d}.png"), frame)
                kept += 1
                if max_frames and kept >= max_frames:
                    break
        idx += 1
    cap.release()
    return kept, idx


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("videos", type=Path, nargs="+")
    ap.add_argument("out_root", type=Path)
    ap.add_argument("--every", type=int, default=5)
    ap.add_argument("--min-sharpness", type=float, default=0.0)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--resize", type=int, default=None)
    args = ap.parse_args(argv)
    for video in args.videos:
        kept, total = extract(
            video, args.out_root / video.stem, args.every,
            args.min_sharpness, args.max_frames, args.resize)
        print(f"{video.name}: kept {kept} of {total} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
