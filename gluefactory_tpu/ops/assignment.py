"""Match-assignment ops: double-softmax, Sinkhorn OT, mutual-max filtering.

TPU versions of the reference's assignment heads:
  - LightGlue sigmoid+double-softmax (`matchers/lightglue.py:257-293`)
  - SuperGlue log-Sinkhorn optimal transport (`gluefactory_nonfree/superglue.py:188-221`)
  - mutual-nearest filtering with thresholds (`lightglue.py:294-321`)
All masked for padded keypoints and fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASKED = -1e9


def masked_log_softmax(x, mask, axis):
    x = jnp.where(mask, x, MASKED)
    lse = jax.nn.logsumexp(x, axis=axis, keepdims=True)
    out = x - lse
    return jnp.where(mask, out, MASKED)


def sigmoid_log_double_softmax(
    sim: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """LightGlue assignment (reference `lightglue.py:257-271`).

    sim: (B, N, M) similarity; z0: (B, N), z1: (B, M) matchability logits.
    Returns log assignment scores (B, N, M).
    """
    B, N, M = sim.shape
    if mask0 is None:
        mask0 = jnp.ones((B, N), bool)
    if mask1 is None:
        mask1 = jnp.ones((B, M), bool)
    pair_mask = mask0[..., :, None] & mask1[..., None, :]
    certainties = jax.nn.log_sigmoid(z0)[..., :, None] + jax.nn.log_sigmoid(
        z1
    )[..., None, :]
    scores0 = masked_log_softmax(sim, pair_mask, axis=2)
    scores1 = masked_log_softmax(sim, pair_mask, axis=1)
    scores = scores0 + scores1 + certainties
    return jnp.where(pair_mask, scores, MASKED)


def with_dustbins(
    scores: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Extend an inner (B, N, M) log-assignment to the full (B, N+1, M+1)
    matrix of the matchability formulation (reference `lightglue.py:265-268`):
    dustbin row/col entries are log_sigmoid(-z), the corner stays 0.

    Padded rows/cols get MASKED dustbins so they contribute nothing to a
    masked NLL.
    """
    B, N, M = scores.shape
    bin0 = jax.nn.log_sigmoid(-z0)  # (B, N)
    bin1 = jax.nn.log_sigmoid(-z1)  # (B, M)
    if mask0 is not None:
        bin0 = jnp.where(mask0, bin0, MASKED)
    if mask1 is not None:
        bin1 = jnp.where(mask1, bin1, MASKED)
    la = jnp.zeros((B, N + 1, M + 1), scores.dtype)
    la = la.at[:, :N, :M].set(scores)
    la = la.at[:, :N, M].set(bin0)
    la = la.at[:, N, :M].set(bin1)
    return la


def log_double_softmax(
    scores: jnp.ndarray,
    bin_score: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Two-sided softmax with a learned scalar dustbin (GlueStick's point
    assignment, reference `gluestick.py:772-785`): each side's softmax runs
    over its row/col plus the dustbin; inner block is the average of the two
    sides, dustbin entries come from their own side.

    scores: (B, N, M); bin_score: learned scalar.
    Returns the (B, N+1, M+1) log-assignment (corner = 0, as the reference).
    """
    B, N, M = scores.shape
    if mask0 is not None and mask1 is not None:
        pair_mask = mask0[..., :, None] & mask1[..., None, :]
        scores = jnp.where(pair_mask, scores, MASKED)
    b = jnp.broadcast_to(bin_score, (B, 1, 1)).astype(scores.dtype)
    with_col_bin = jnp.concatenate(
        [scores, jnp.broadcast_to(b, (B, N, 1))], axis=2
    )  # (B, N, M+1)
    with_row_bin = jnp.concatenate(
        [scores, jnp.broadcast_to(b, (B, 1, M))], axis=1
    )  # (B, N+1, M)
    s0 = jax.nn.log_softmax(with_col_bin, axis=2)
    s1 = jax.nn.log_softmax(with_row_bin, axis=1)
    la = jnp.zeros((B, N + 1, M + 1), scores.dtype)
    la = la.at[:, :N, :M].set((s0[:, :, :M] + s1[:, :N, :]) / 2.0)
    bin0 = s0[:, :, M]
    bin1 = s1[:, N, :]
    if mask0 is not None:
        bin0 = jnp.where(mask0, bin0, MASKED)
    if mask1 is not None:
        bin1 = jnp.where(mask1, bin1, MASKED)
    la = la.at[:, :N, M].set(bin0)
    la = la.at[:, N, :M].set(bin1)
    return la


def log_sinkhorn(
    scores: jnp.ndarray,
    alpha: jnp.ndarray,
    iters: int,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Log-domain Sinkhorn with learned dustbin
    (reference `superglue.py:188-221`).

    scores: (B, N, M); alpha: scalar dustbin score. Returns the
    (B, N+1, M+1) log optimal transport plan, normalized like the reference
    (norm = -log(N + M), with masked rows/cols excluded from the marginals).
    """
    B, N, M = scores.shape
    if mask0 is None:
        mask0 = jnp.ones((B, N), bool)
    if mask1 is None:
        mask1 = jnp.ones((B, M), bool)
    n0 = jnp.sum(mask0, -1).astype(scores.dtype)  # (B,)
    n1 = jnp.sum(mask1, -1).astype(scores.dtype)

    pair_mask = mask0[..., :, None] & mask1[..., None, :]
    scores = jnp.where(pair_mask, scores, MASKED)
    bins0 = jnp.where(mask0, alpha, MASKED)[..., :, None]  # (B, N, 1)
    bins1 = jnp.where(mask1, alpha, MASKED)[..., None, :]  # (B, 1, M)
    corner = jnp.full((B, 1, 1), alpha, scores.dtype)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], -1),
            jnp.concatenate([bins1, corner], -1),
        ],
        axis=1,
    )  # (B, N+1, M+1)

    norm = -jnp.log(n0 + n1)  # (B,)
    log_mu = jnp.concatenate(
        [jnp.where(mask0, norm[..., None], MASKED), (jnp.log(n1) + norm)[..., None]],
        axis=-1,
    )  # (B, N+1)
    log_nu = jnp.concatenate(
        [jnp.where(mask1, norm[..., None], MASKED), (jnp.log(n0) + norm)[..., None]],
        axis=-1,
    )  # (B, M+1)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    Z = couplings + u[:, :, None] + v[:, None, :]
    return Z - norm[..., None, None]


def filter_matches(scores: jnp.ndarray, threshold: float):
    """Mutual-max match extraction (reference `lightglue.py:294-321`).

    scores: (B, N, M) log assignment (no dustbin row/col needed).
    Returns (matches0 (B, N), matches1 (B, M), mscores0 (B, N), mscores1 (B, M)):
    m0[i] = j or -1; exp(score) as confidence.
    """
    B, N, M = scores.shape
    max0 = jnp.max(scores, axis=2)
    m0 = jnp.argmax(scores, axis=2)
    max1 = jnp.max(scores, axis=1)
    m1 = jnp.argmax(scores, axis=1)
    idx0 = jnp.arange(N)[None]
    idx1 = jnp.arange(M)[None]
    mutual0 = idx0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = idx1 == jnp.take_along_axis(m0, m1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    matches0 = jnp.where(valid0, m0, -1)
    matches1 = jnp.where(valid1, m1, -1)
    return matches0.astype(jnp.int32), matches1.astype(jnp.int32), mscores0, mscores1
