"""Attention primitives for the matchers.

The reference relies on torch SDPA/FlashAttention (`matchers/lightglue.py:98-129`).
Here attention is expressed so XLA fuses it on the MXU; `jax.nn.dot_product_attention`
provides the fused path, with masking for padded keypoints. LightGlue's
bidirectional cross-attention shares the similarity matrix between directions
— computed once, softmaxed along both axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_FORCE_XLA = False


def force_xla_attention():
    """Context manager disabling the Pallas auto-path for the enclosed trace.

    Needed when tracing for platforms beyond the attached backend — e.g. a
    multi-platform serving export from a TPU-attached process: the `auto`
    impl would pick the Pallas kernels (backend is TPU) but Pallas has no
    CPU lowering, so `jax.export(platforms=["cpu", ...])` fails."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        global _FORCE_XLA
        prev = _FORCE_XLA
        _FORCE_XLA = True
        try:
            yield
        finally:
            _FORCE_XLA = prev

    return ctx()


def _use_pallas() -> bool:
    if _FORCE_XLA:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _fits_fused(q, k) -> bool:
    # single-shot fused kernel: the (N, M) tile must fit VMEM (~16 MB)
    return q.shape[-2] * k.shape[-2] <= 2048 * 2048


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention. q/k/v: (B, H, N, D); mask: (B, N_kv) key validity.

    Queries attend only to valid keys; fully-masked rows return 0.
    impl: "auto" (pallas flash kernel on TPU, fused XLA elsewhere) |
    "xla" | "pallas".
    """
    if impl == "pallas" or (impl == "auto" and _use_pallas()):
        from .pallas_attention import flash_attention, fused_attention

        if _fits_fused(q, k):
            return fused_attention(q, k, v, mask)
        return flash_attention(q, k, v, mask)
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, -1e9)
    attn = jax.nn.softmax(sim, axis=-1)
    if mask is not None:
        # rows with no valid key: softmax over -1e9s is uniform; zero them
        any_valid = jnp.any(mask, axis=-1)[:, None, None, None]
        attn = jnp.where(any_valid, attn, jnp.zeros_like(attn))
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def bidirectional_cross_attention(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
):
    """LightGlue cross-attention with shared QK (reference `lightglue.py:167-215`).

    qk0: (B, H, N, D) acts as queries for 0<-1 and keys for 1<-0.
    Returns (message to set 0, message to set 1): one similarity matrix,
    softmaxed along each axis.
    """
    if _use_pallas():
        if _fits_fused(qk0, qk1):
            # one shared similarity matmul + both softmaxes + both PV
            # products in a single VMEM pass (3 MXU matmuls instead of 4)
            from .pallas_attention import fused_bidirectional_attention

            return fused_bidirectional_attention(
                qk0, qk1, v0, v1, mask0, mask1
            )
        # big tiles: two streaming passes (the row/col softmaxes of the
        # shared sim, each recomputing its half)
        from .pallas_attention import flash_attention

        m0 = flash_attention(qk0, qk1, v1, mask1)
        m1 = flash_attention(qk1, qk0, v0, mask0)
        return m0, m1
    scale = qk0.shape[-1] ** -0.25
    sim = jnp.einsum("bhnd,bhmd->bhnm", qk0 * scale, qk1 * scale)
    if mask1 is not None:
        sim0 = jnp.where(mask1[:, None, None, :], sim, -1e9)
    else:
        sim0 = sim
    if mask0 is not None:
        sim1 = jnp.where(mask0[:, None, :, None], sim, -1e9)
    else:
        sim1 = sim
    attn01 = jax.nn.softmax(sim0, axis=-1)  # 0 attends over 1
    attn10 = jax.nn.softmax(sim1, axis=-2)  # 1 attends over 0
    if mask1 is not None:
        attn01 = jnp.where(
            jnp.any(mask1, -1)[:, None, None, None], attn01, jnp.zeros_like(attn01)
        )
    if mask0 is not None:
        attn10 = jnp.where(
            jnp.any(mask0, -1)[:, None, None, None], attn10, jnp.zeros_like(attn10)
        )
    m0 = jnp.einsum("bhnm,bhmd->bhnd", attn01, v1)
    m1 = jnp.einsum("bhnm,bhnd->bhmd", attn10, v0)
    return m0, m1


def rotary_emb_2d(kpts: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Learnable-Fourier rotary encoding from 2D coords
    (reference `lightglue.py:49-67`).

    kpts: (B, N, 2) normalized coords; freqs: (2, F) projection matrix with
    F = head_dim / 2 (one frequency per rotation pair, matching the official
    LightGlue `Wr: 2 -> head_dim/2`). Returns (B, N, 2, F) stacked (cos, sin).
    """
    proj = jnp.einsum("bnd,df->bnf", kpts, freqs)  # (B, N, F)
    return jnp.stack([jnp.cos(proj), jnp.sin(proj)], axis=-2)  # (B, N, 2, F)


def apply_cached_rotary_emb(freqs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding. freqs: (B, N, 2, D/2); x: (B, H, N, D).

    HALF-SPLIT pair layout: rotation pair i lives at head dims (i, D/2+i),
    not the reference's interleaved (2i, 2i+1) (`lightglue.py:43-47`).
    Contiguous-half slices + one concat are layout-friendly on the TPU's
    (8, 128) lane tiling, where the interleaved convention lowers to a
    stride-2 lane shuffle that cost ~0.17 ms/layer (≈ 65% of the fused
    attention kernel itself, scripts/bench_lg_layer.py r3). Exactness: the
    same head-dim permutation is applied to BOTH q and k at weight
    conversion (`torch_weights._permute_rotary_qk`), so the attention
    logits are bit-identical to the reference convention.
    """
    cos = freqs[:, None, :, 0, :]  # (B, 1, N, D/2)
    sin = freqs[:, None, :, 1, :]
    F = x.shape[-1] // 2
    x1, x2 = x[..., :F], x[..., F:]
    rx1 = x1 * cos - x2 * sin
    rx2 = x2 * cos + x1 * sin
    return jnp.concatenate([rx1, rx2], axis=-1)
