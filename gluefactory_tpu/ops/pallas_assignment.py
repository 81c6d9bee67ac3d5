"""Fused LightGlue assignment kernel: similarity + two-sided softmax +
matchability in one VMEM pass.

The XLA path (`ops/assignment.py:sigmoid_log_double_softmax`) materializes
several (B, N, M) f32 intermediates in HBM (masked sim, row/col logsumexps,
their sum, the final where). For the inference exit head this kernel computes

    out = 2*sim - lse_row - lse_col + log_sigmoid(z0) + log_sigmoid(z1)

entirely in VMEM per batch element and writes the (N, M) log-assignment
once. Inference-only (the training deep-supervision path needs gradients and
stays on XLA); used by LightGlue's post-scan exit head when the (N, M) tile
fits VMEM.

Mosaic lowering rules this kernel had to follow (each one failed on-chip
while interpret mode accepted it):
  - no (1, K) blocks of (B, K) arrays — the last two block dims must be
    8/128-divisible or equal to the array dims, so vector operands ride as
    (B, N, 1) / (B, 1, M) with (1, N, 1) / (1, 1, M) blocks;
  - keep every value 2D inside the kernel: row vectors as (N, 1), column
    vectors as (1, M), reductions with keepdims=True; 1D intermediates
    (slices, compares, broadcasts-from-1D) die in the Mosaic vector layout;
  - masks as additive f32 terms (0 / NEG_INF) instead of boolean selects of
    broadcasted (N, 1) & (1, M) conditions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MASKED = -1e9
NEG_INF = -1e30


def _assign_kernel(m0_ref, m1_ref, z0_ref, z1_ref, n0_ref, n1_ref, o_ref):
    # VMEM discipline: only `s` (masked similarity) lives across the whole
    # kernel; exp buffers for the two logsumexps are consumed immediately.
    # Invalid entries carry <= NEG_INF in `s` via the additive masks, so exp
    # underflows to exactly 0 without extra (N, M) mask buffers.
    neg0 = n0_ref[0]  # (N, 1) f32: 0 valid / NEG_INF invalid
    neg1 = n1_ref[0]  # (1, M)
    s = jnp.dot(m0_ref[0], m1_ref[0].T, preferred_element_type=jnp.float32)
    s = s + neg0 + neg1
    mr = jnp.max(s, axis=1, keepdims=True)  # (N, 1)
    mr_s = jnp.where(mr > NEG_INF / 2, mr, 0.0)
    lse_r = mr_s + jnp.log(
        jnp.maximum(jnp.sum(jnp.exp(s - mr_s), axis=1, keepdims=True), 1e-30)
    )
    mc = jnp.max(s, axis=0, keepdims=True)  # (1, M)
    mc_s = jnp.where(mc > NEG_INF / 2, mc, 0.0)
    lse_c = mc_s + jnp.log(
        jnp.maximum(jnp.sum(jnp.exp(s - mc_s), axis=0, keepdims=True), 1e-30)
    )
    cert0 = jax.nn.log_sigmoid(z0_ref[0]) - lse_r  # (N, 1) row terms
    cert1 = jax.nn.log_sigmoid(z1_ref[0]) - lse_c  # (1, M) col terms
    out = 2.0 * s + cert0 + cert1
    # valid entries: s == sim; invalid rows/cols: overwrite with MASKED
    o_ref[0] = jnp.maximum(out, MASKED)


@jax.jit
def fused_assignment(mdesc0, mdesc1, z0, z1, mask0, mask1):
    """LightGlue log-assignment (reference `lightglue.py:257-271`), fused.

    mdesc0: (B, N, D) (already scaled by d**-0.25); mdesc1: (B, M, D);
    z0: (B, N); z1: (B, M); mask0/mask1: bool validity.
    Returns (B, N, M) f32 log-assignment, masked entries = -1e9.
    """
    B, N, D = mdesc0.shape
    M = mdesc1.shape[1]
    neg0 = jnp.where(mask0, 0.0, NEG_INF).astype(jnp.float32)
    neg1 = jnp.where(mask1, 0.0, NEG_INF).astype(jnp.float32)
    return pl.pallas_call(
        _assign_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, M), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, M), jnp.float32),
    )(
        mdesc0.astype(jnp.bfloat16),
        mdesc1.astype(jnp.bfloat16),
        z0.astype(jnp.float32)[:, :, None],
        z1.astype(jnp.float32)[:, None, :],
        neg0[:, :, None],
        neg1[:, None, :],
    )


def fits_fused_assignment(N: int, M: int) -> bool:
    """(N, M) f32 sim + exp + output tiles must fit VMEM alongside staging."""
    return N * M <= 1024 * 1024
