"""Matching losses (reference `gluefactory/models/utils/losses.py:6-76`).

`nll_loss` consumes a (B, N+1, M+1) log-assignment (last row/col = dustbin)
and GT labels in {-2 ignore, -1 unmatched, j}. Positive and negative terms
are balanced per batch item, exactly as the reference's two-sided NLL.
All masked + fixed-shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def nll_loss(
    log_assignment: jnp.ndarray,
    gt_matches0: jnp.ndarray,
    gt_matches1: jnp.ndarray,
    nll_balancing: float = 0.5,
):
    """Two-sided balanced NLL, numerics-exact vs the reference
    (`losses.py:6-25` weight_loss + `:43-60` NLLLoss.forward):
      nll = w * nll_pos + (1 - w) * nll_neg, where nll_pos averages over all
      positive pairs jointly and nll_neg jointly normalizes both dustbin
      sides by (num_neg0 + num_neg1).

    log_assignment: (B, N+1, M+1); gt_matches0: (B, N); gt_matches1: (B, M)
    with labels {-2 ignore, -1 unmatched, j}. Returns dict of (B,) terms.
    """
    B, Np1, Mp1 = log_assignment.shape
    N, M = Np1 - 1, Mp1 - 1
    m0 = gt_matches0
    m1 = gt_matches1

    pos0 = m0 >= 0
    neg0 = m0 == -1
    # positive pairs: row i -> column m0[i]; negatives index the dustbin col
    col_idx = jnp.where(pos0, m0, M).astype(jnp.int32)  # (B, N)
    row_ll = jnp.take_along_axis(
        log_assignment[:, :N, :], col_idx[..., None], axis=-1
    )[..., 0]  # (B, N)

    neg1 = m1 == -1
    col_bin_ll = log_assignment[:, N, :M]  # (B, M) dustbin row

    num_pos = jnp.maximum(jnp.sum(pos0, -1), 1)
    num_neg0 = jnp.maximum(jnp.sum(neg0, -1), 1.0)
    num_neg1 = jnp.maximum(jnp.sum(neg1, -1), 1.0)

    nll_pos = -jnp.sum(jnp.where(pos0, row_ll, 0.0), -1) / num_pos
    neg_sum = -jnp.sum(jnp.where(neg0, row_ll, 0.0), -1) - jnp.sum(
        jnp.where(neg1, col_bin_ll, 0.0), -1
    )
    nll_neg = neg_sum / (num_neg0 + num_neg1)

    nll = nll_balancing * nll_pos + (1.0 - nll_balancing) * nll_neg
    return {
        "assignment_nll": nll,
        "nll_pos": nll_pos,
        "nll_neg": nll_neg,
        "num_matchable": num_pos.astype(jnp.float32),
        "num_unmatchable": (0.5 * (num_neg0 + num_neg1)).astype(jnp.float32),
    }
