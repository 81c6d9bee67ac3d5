"""Extractor helpers (reference `gluefactory/models/extractors/utils.py:4`)."""

from __future__ import annotations

import jax.numpy as jnp


def filter_keypoints_by_specular_mask(kpts, valid, mask):
    """Invalidate keypoints inside specular-highlight regions
    (reference fork `filter_keypoints_by_specular_mask`).

    kpts: (B, K, 2); valid: (B, K); mask: (B, H, W) True = specular.
    Nearest-pixel lookup (masks are dilated at creation, so nearest is safe).
    """
    H, W = mask.shape[-2:]
    x = jnp.clip(jnp.round(kpts[..., 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(kpts[..., 1]).astype(jnp.int32), 0, H - 1)
    flat = mask.reshape(mask.shape[0], H * W)
    hit = jnp.take_along_axis(flat, y * W + x, axis=-1)
    return valid & ~hit.astype(bool)
