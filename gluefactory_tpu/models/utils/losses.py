"""Matching losses (reference `gluefactory/models/utils/losses.py:6-76`).

`nll_loss` consumes a (B, N+1, M+1) log-assignment (last row/col = dustbin)
and GT labels in {-2 ignore, -1 unmatched, j}. Positive and negative terms
are balanced per batch item, exactly as the reference's two-sided NLL.
All masked + fixed-shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def nll_loss(log_assignment: jnp.ndarray, gt_matches0: jnp.ndarray, gt_matches1: jnp.ndarray):
    """Two-sided balanced NLL.

    log_assignment: (B, N+1, M+1); gt_matches0: (B, N); gt_matches1: (B, M).
    Returns dict with total/row/col components, each (B,).
    """
    B, Np1, Mp1 = log_assignment.shape
    N, M = Np1 - 1, Mp1 - 1
    m0 = gt_matches0
    m1 = gt_matches1

    pos0 = m0 >= 0
    neg0 = m0 == -1
    # row terms: positives index their column, negatives index the dustbin
    col_idx = jnp.where(pos0, m0, M).astype(jnp.int32)  # (B, N)
    row_ll = jnp.take_along_axis(
        log_assignment[:, :N, :], col_idx[..., None], axis=-1
    )[..., 0]  # (B, N)
    num_pos0 = jnp.maximum(jnp.sum(pos0, -1), 1)
    num_neg0 = jnp.maximum(jnp.sum(neg0, -1), 1)
    nll_pos0 = -jnp.sum(jnp.where(pos0, row_ll, 0.0), -1) / num_pos0
    nll_neg0 = -jnp.sum(jnp.where(neg0, row_ll, 0.0), -1) / num_neg0

    pos1 = m1 >= 0
    neg1 = m1 == -1
    row_idx = jnp.where(pos1, m1, N).astype(jnp.int32)  # (B, M)
    col_ll = jnp.take_along_axis(
        log_assignment[:, :, :M], row_idx[:, None, :], axis=1
    )[:, 0, :]  # (B, M)
    num_neg1 = jnp.maximum(jnp.sum(neg1, -1), 1)
    nll_neg1 = -jnp.sum(jnp.where(neg1, col_ll, 0.0), -1) / num_neg1
    # positives are symmetric (same entries) -> only count once like the
    # reference (`losses.py:44-57`): pos from rows, negs from both sides
    nll = 0.5 * (nll_pos0 + 0.5 * (nll_neg0 + nll_neg1)) * 2.0
    return {
        "assignment_nll": nll,
        "nll_pos": nll_pos0,
        "nll_neg": 0.5 * (nll_neg0 + nll_neg1),
        "num_matchable": num_pos0.astype(jnp.float32),
        "num_unmatchable": (0.5 * (num_neg0 + num_neg1)).astype(jnp.float32),
    }
