"""Patch extraction around keypoints (reference `gluefactory/utils/patches.py:4-50`)."""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(image: jnp.ndarray, kpts: jnp.ndarray, radius: int):
    """Fixed-size square patches around keypoints.

    image: (H, W, C); kpts: (K, 2) pixel coords -> (K, 2r+1, 2r+1, C).
    Nearest-pixel gather with border clamping (jittable).
    """
    H, W = image.shape[:2]
    d = jnp.arange(-radius, radius + 1)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    xs = jnp.clip(
        jnp.round(kpts[:, None, None, 0]).astype(jnp.int32) + dx[None], 0, W - 1
    )
    ys = jnp.clip(
        jnp.round(kpts[:, None, None, 1]).astype(jnp.int32) + dy[None], 0, H - 1
    )
    return image[ys, xs]


def batch_extract_patches(images: jnp.ndarray, kpts: jnp.ndarray, radius: int):
    """(B, H, W, C) x (B, K, 2) -> (B, K, 2r+1, 2r+1, C)."""
    import jax

    return jax.vmap(lambda im, kp: extract_patches(im, kp, radius))(images, kpts)
