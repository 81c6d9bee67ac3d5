"""Image IO and preprocessing (reference `gluefactory/utils/image.py:15-270`).

Host-side (numpy/cv2): runs in dataloader workers. Produces NHWC float32
arrays in [0, 1] plus the scale/size bookkeeping the models and evals need.
Fixed target shapes keep downstream XLA programs static.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..core.config import Config


def read_image(path: Path, grayscale: bool = False) -> np.ndarray:
    """Read an image as float HxWx{1,3} RGB in [0,1]."""
    mode = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    image = cv2.imread(str(path), mode)
    if image is None:
        raise IOError(f"could not read image {path}")
    if not grayscale:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    else:
        image = image[..., None]
    return image.astype(np.float32) / 255.0


class ImagePreprocessor:
    """Resize + optional square pad with scale bookkeeping
    (reference `utils/image.py:15-110`).

    conf:
      resize: target size (int for max side, or [w, h]) or None
      side: which side "resize" refers to ("long" | "short" | "vert" | "horz")
      square_pad: pad to square (needed for fixed-shape TPU batches)
      interpolation: cv2 interpolation name
    """

    default_conf = {
        "resize": None,
        "side": "long",
        "interpolation": "linear",
        "align_corners": None,
        "antialias": True,
        "square_pad": False,
        "add_padding_mask": False,
    }

    def __init__(self, conf=None):
        self.conf = Config.merge(Config(self.default_conf), conf or {})

    def __call__(self, img: np.ndarray) -> dict:
        """img: (H, W, C) float. Returns dict with image/scales/image_size..."""
        H, W = img.shape[:2]
        size = np.array([W, H], np.float32)
        conf = self.conf
        interp = {
            "linear": cv2.INTER_LINEAR,
            "cubic": cv2.INTER_CUBIC,
            "nearest": cv2.INTER_NEAREST,
            "area": cv2.INTER_AREA,
        }[conf.interpolation]
        if conf.resize is not None:
            r = conf.resize
            if isinstance(r, int):
                side_len = {
                    "long": max(W, H),
                    "short": min(W, H),
                    "vert": H,
                    "horz": W,
                }[conf.side]
                scale = r / side_len
                new_w, new_h = int(round(W * scale)), int(round(H * scale))
            else:
                new_w, new_h = int(r[0]), int(r[1])
            img = cv2.resize(img, (new_w, new_h), interpolation=interp)
            if img.ndim == 2:
                img = img[..., None]
        new_size = np.array([img.shape[1], img.shape[0]], np.float32)
        scales = new_size / size  # (sx, sy): new = old * scale

        out = {
            "image": img.astype(np.float32),
            "scales": scales,
            "image_size": new_size.copy(),
            "original_image_size": size,
        }
        if conf.square_pad:
            s = max(img.shape[0], img.shape[1])
            padded = np.zeros((s, s, img.shape[2]), np.float32)
            padded[: img.shape[0], : img.shape[1]] = img
            out["image"] = padded
            if conf.add_padding_mask:
                mask = np.zeros((s, s), bool)
                mask[: img.shape[0], : img.shape[1]] = True
                out["padding_mask"] = mask
        return out


def numpy_image_to_model(img: np.ndarray) -> np.ndarray:
    """(H, W, C) -> model layout (H, W, C) — NHWC is native on TPU; identity
    kept for call-site clarity vs the reference's HWC->CHW."""
    return img


def grid_positions(h: int, w: int) -> np.ndarray:
    """Pixel-center coordinate grid (h*w, 2) as (x, y)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
