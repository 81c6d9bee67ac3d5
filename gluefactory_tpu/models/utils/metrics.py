"""Matcher training metrics (reference `gluefactory/models/utils/metrics.py:5-60`).

All inputs are padded fixed-size label arrays in {-2, -1, j}; metrics are
(B,)-shaped and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp


def matcher_metrics(pred: dict, data: dict, prefix: str = "") -> dict:
    """match_recall / match_precision / accuracy vs GT labels."""
    gt0 = data[f"gt_{prefix}matches0"]
    m0 = pred[f"{prefix}matches0"]
    labeled = gt0 >= -1  # not ignore
    gt_pos = gt0 >= 0
    pred_pos = (m0 >= 0) & labeled
    correct_pos = (m0 == gt0) & gt_pos
    correct_all = (m0 == gt0) & labeled

    num_gt_pos = jnp.maximum(jnp.sum(gt_pos, -1), 1)
    num_pred_pos = jnp.maximum(jnp.sum(pred_pos, -1), 1)
    num_labeled = jnp.maximum(jnp.sum(labeled, -1), 1)
    recall = jnp.sum(correct_pos, -1) / num_gt_pos
    precision = jnp.sum(correct_pos & pred_pos, -1) / num_pred_pos
    accuracy = jnp.sum(correct_all, -1) / num_labeled
    return {
        f"{prefix}match_recall": recall,
        f"{prefix}match_precision": precision,
        f"{prefix}accuracy": accuracy,
        f"{prefix}num_matches": jnp.sum(pred_pos, -1).astype(jnp.float32),
    }
