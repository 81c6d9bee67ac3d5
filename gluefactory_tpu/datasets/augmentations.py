"""Photometric augmentation pipelines
(reference `gluefactory/datasets/augmentations.py:19-253`).

The reference uses albumentations (unavailable here); these are equivalent
numpy/cv2 transforms, host-side, operating on float RGB/gray images in [0,1].
Each pipeline is a conf-selected list of probabilistic ops with an explicit
numpy RNG (per-worker seeding friendly).
"""

from __future__ import annotations

import cv2
import numpy as np

from ..core.config import Config


def _rand_apply(rng, p):
    return rng.rand() < p


def brightness_contrast(img, rng, brightness=0.2, contrast=0.2):
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    mean = img.mean()
    return np.clip((img - mean) * c + mean * b, 0, 1)


def gamma(img, rng, lo=0.5, hi=2.0):
    g = rng.uniform(lo, hi)
    return np.clip(img, 0, 1) ** g


def hue_saturation(img, rng, hue=0.02, sat=0.3):
    if img.shape[-1] != 3:
        return img
    hsv = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
        np.float32
    )
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue, hue) * 180) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] * (1 + rng.uniform(-sat, sat)), 0, 255)
    out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return out.astype(np.float32) / 255.0


def gaussian_blur(img, rng, max_sigma=2.0):
    sigma = rng.uniform(0.1, max_sigma)
    k = int(2 * round(3 * sigma) + 1)
    out = cv2.GaussianBlur(img, (k, k), sigma)
    return out if out.ndim == img.ndim else out[..., None]


def motion_blur(img, rng, max_ksize=7):
    k = rng.choice(np.arange(3, max_ksize + 1, 2))
    kernel = np.zeros((k, k), np.float32)
    angle = rng.rand() * np.pi
    c = (k - 1) / 2
    for i in range(k):
        x = int(round(c + (i - c) * np.cos(angle)))
        y = int(round(c + (i - c) * np.sin(angle)))
        kernel[np.clip(y, 0, k - 1), np.clip(x, 0, k - 1)] = 1
    kernel /= kernel.sum()
    out = cv2.filter2D(img, -1, kernel)
    return out if out.ndim == img.ndim else out[..., None]


def gauss_noise(img, rng, max_std=0.04):
    std = rng.uniform(0.0, max_std)
    return np.clip(img + rng.randn(*img.shape).astype(np.float32) * std, 0, 1)


def random_shade(img, rng, nb_ellipses=6, amp=(-0.5, 0.8), kernel_frac=0.15):
    """Additive smooth shade blobs (reference `RandomAdditiveShade`,
    `augmentations.py:19-96`)."""
    h, w = img.shape[:2]
    mask = np.zeros((h, w), np.float32)
    for _ in range(nb_ellipses):
        ax = int(max(rng.rand() * w / 5, w / 14))
        ay = int(max(rng.rand() * h / 5, h / 14))
        x = rng.randint(ax, w - ax)
        y = rng.randint(ay, h - ay)
        angle = rng.rand() * 90
        cv2.ellipse(mask, (x, y), (ax, ay), angle, 0, 360, 1.0, -1)
    transparency = rng.uniform(*amp)
    k = int(kernel_frac * min(h, w)) | 1
    mask = cv2.GaussianBlur(mask, (k, k), 0)
    shaded = img * (1 - transparency * mask[..., None])
    return np.clip(shaded, 0, 1)


class BaseAugmentation:
    """conf-driven pipeline (reference `augmentations.py:99-175`)."""

    base_default_conf = {
        "name": "???",
        "p": 0.95,
        "verbose": False,
        "dark_prob": 0.0,
    }
    default_conf = {}

    def __init__(self, conf=None):
        merged = Config(self.base_default_conf)
        merged.merge_(self.default_conf)
        if conf:
            merged.merge_(conf)
        self.conf = merged

    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        if rng is None:
            rng = np.random
        if not _rand_apply(rng, self.conf.p):
            return img
        return self.apply(img, rng)

    def apply(self, img, rng):
        return img


class IdentityAugmentation(BaseAugmentation):
    default_conf = {"name": "identity"}


class LGAugmentation(BaseAugmentation):
    """The LightGlue training pipeline (reference `augmentations.py:224-253`)."""

    default_conf = {"name": "lg"}

    def apply(self, img, rng):
        if _rand_apply(rng, 0.1):
            img = gaussian_blur(img, rng, 1.5)
        if _rand_apply(rng, 0.1):
            img = motion_blur(img, rng, 7)
        if _rand_apply(rng, 0.5):
            img = brightness_contrast(img, rng, 0.3, 0.3)
        if _rand_apply(rng, 0.5):
            img = gamma(img, rng, 0.6, 1.6)
        if _rand_apply(rng, 0.3):
            img = hue_saturation(img, rng)
        if _rand_apply(rng, 0.2):
            img = gauss_noise(img, rng, 0.03)
        if _rand_apply(rng, 0.2):
            img = random_shade(img, rng)
        return img


class DarkAugmentation(BaseAugmentation):
    """Low-light simulation (reference `augmentations.py:176-223`)."""

    default_conf = {"name": "dark"}

    def apply(self, img, rng):
        img = brightness_contrast(img, rng, 0.1, 0.1)
        g = rng.uniform(1.5, 3.0)  # darken
        img = np.clip(img, 0, 1) ** g
        if _rand_apply(rng, 0.5):
            img = gauss_noise(img, rng, 0.06)
        if _rand_apply(rng, 0.3):
            img = gaussian_blur(img, rng, 1.0)
        return img


augmentations = {
    "identity": IdentityAugmentation,
    "lg": LGAugmentation,
    "dark": DarkAugmentation,
}
