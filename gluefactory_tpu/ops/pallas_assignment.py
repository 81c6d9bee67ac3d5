"""Fused LightGlue assignment kernel: similarity + two-sided softmax +
matchability in one VMEM pass.

The XLA path (`ops/assignment.py:sigmoid_log_double_softmax`) materializes
several (B, N, M) f32 intermediates in HBM (masked sim, row/col logsumexps,
their sum, the final where). For the inference exit head this kernel computes

    out = 2*sim - lse_row[:, None] - lse_col[None, :]
          + log_sigmoid(z0)[:, None] + log_sigmoid(z1)[None, :]

entirely in VMEM per batch element and writes the (N, M) log-assignment
once. Inference-only (the training deep-supervision path needs gradients and
stays on XLA); used by LightGlue's post-scan exit head when the (N, M) tile
fits VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MASKED = -1e9
NEG_INF = -1e30


def _assign_kernel(m0_ref, m1_ref, z0_ref, z1_ref, v0_ref, v1_ref, o_ref):
    # VMEM discipline: only `s` (masked similarity) lives across the whole
    # kernel; exp buffers for the two logsumexps are consumed immediately.
    # Invalid entries carry NEG_INF in `s`, so exp underflows to exactly 0
    # without extra (N, M) mask buffers.
    valid0 = v0_ref[0] > 0  # (N,)
    valid1 = v1_ref[0] > 0  # (M,)
    s = jnp.dot(m0_ref[0], m1_ref[0].T, preferred_element_type=jnp.float32)
    s = jnp.where(valid0[:, None] & valid1[None, :], s, NEG_INF)
    mr = jnp.max(s, axis=1)  # (N,)
    mr_s = jnp.where(mr > NEG_INF / 2, mr, 0.0)
    lse_r = mr_s + jnp.log(
        jnp.maximum(jnp.sum(jnp.exp(s - mr_s[:, None]), axis=1), 1e-30)
    )
    mc = jnp.max(s, axis=0)  # (M,)
    mc_s = jnp.where(mc > NEG_INF / 2, mc, 0.0)
    lse_c = mc_s + jnp.log(
        jnp.maximum(jnp.sum(jnp.exp(s - mc_s[None, :]), axis=0), 1e-30)
    )
    cert0 = jax.nn.log_sigmoid(z0_ref[0]) - lse_r  # (N,) row terms
    cert1 = jax.nn.log_sigmoid(z1_ref[0]) - lse_c  # (M,) col terms
    out = 2.0 * s + cert0[:, None] + cert1[None, :]
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
    return pl.pallas_call(
        _assign_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N), lambda b: (b, 0)),
            pl.BlockSpec((1, M), lambda b: (b, 0)),
            pl.BlockSpec((1, N), lambda b: (b, 0)),
            pl.BlockSpec((1, M), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, M), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, M), jnp.float32),
    )(
        mdesc0.astype(jnp.bfloat16),
        mdesc1.astype(jnp.bfloat16),
        z0.astype(jnp.float32),
        z1.astype(jnp.float32),
        mask0.astype(jnp.int8),
        mask1.astype(jnp.int8),
    )


def fits_fused_assignment(N: int, M: int) -> bool:
    """(N, M) f32 sim + exp + output tiles must fit VMEM alongside staging."""
    return N * M <= 1024 * 1024
