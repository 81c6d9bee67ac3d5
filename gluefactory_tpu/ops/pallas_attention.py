"""Pallas flash-attention kernel for the matcher transformers.

The reference leans on torch SDPA/FlashAttention (`matchers/lightglue.py:98-129`);
this is the TPU analog: a fused attention kernel that never materializes the
(N, M) similarity matrix in HBM. Keypoint counts are 512-4096, so one
(block_q x head_dim) query tile per grid step with a `lax.fori_loop` over KV
tiles and the standard online-softmax recurrence keeps everything in VMEM;
QK^T and PV ride the MXU.

Falls back to the XLA einsum path on CPU (tests run both and compare).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_kv: int, sm_scale: float):
    """One (block_q, head_dim) query tile against all KV tiles.

    q_ref: (block_q, D); k_ref/v_ref: (M, D); mask_ref: (1, M) key validity.
    """
    q = q_ref[:] * sm_scale
    M = k_ref.shape[0]
    D = q.shape[-1]
    block_q = q.shape[0]
    num_kv = M // block_kv

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_kv, block_kv), :]
        v = v_ref[pl.ds(i * block_kv, block_kv), :]
        mask = mask_ref[0, pl.ds(i * block_kv, block_kv)]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bkv)
        s = jnp.where(mask[None, :], s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        # avoid exp(-inf - (-inf)) = 1 when everything so far is masked
        alpha = jnp.where(m_prev > NEG_INF / 2, jnp.exp(m_prev - m_cur), 0.0)
        p = jnp.where(
            mask[None, :], jnp.exp(s - m_cur[:, None]), jnp.zeros_like(s)
        )
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    # fully-masked rows: l == 0 -> output 0
    safe_l = jnp.where(l > 0, l, 1.0)
    o_ref[:] = (acc / safe_l[:, None]).astype(o_ref.dtype)


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, mask=None, block_q: int = 256, block_kv: int = 256):
    """Streaming fused masked attention (for tiles beyond VMEM).

    q: (B, H, N, D); k/v: (B, H, M, D); mask: (B, M). Backward uses dense
    recompute (same caveat as fused_attention).
    """
    return _flash_attention_impl(q, k, v, mask, block_q, block_kv)


def _flash_fwd(q, k, v, mask, block_q, block_kv):
    return _flash_attention_impl(q, k, v, mask, block_q, block_kv), (q, k, v, mask)


def _flash_bwd(block_q, block_kv, res, g):
    return _fused_bwd(res, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv"))
def _flash_attention_impl(q, k, v, mask=None, block_q: int = 256, block_kv: int = 256):
    B, H, N, D = q.shape
    M = k.shape[2]
    if mask is None:
        mask = jnp.ones((B, M), bool)
    scale = D ** -0.5  # scale by the TRUE head dim, not the padded one

    Np = ((N + block_q - 1) // block_q) * block_q
    Mp = ((M + block_kv - 1) // block_kv) * block_kv
    # Mosaic lane tiling: last dim must be a multiple of 128; zero-pad the
    # head dim (zeros don't change QK^T or PV)
    Dp = ((D + 127) // 128) * 128
    q_p = _pad_to(_pad_to(q, Np, 2), Dp, 3)
    k_p = _pad_to(_pad_to(k, Mp, 2), Dp, 3)
    v_p = _pad_to(_pad_to(v, Mp, 2), Dp, 3)
    mask_p = _pad_to(mask, Mp, 1, value=False)
    D = Dp

    grid = (B, H, Np // block_q)
    kernel = functools.partial(
        _kernel_wrapper_squeeze, block_kv=block_kv, sm_scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Mp, D), lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Mp, D), lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Mp), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )(q_p, k_p, v_p, mask_p[:, None, :])
    return out[:, :, :N, : q.shape[-1]]


def _fused_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, sm_scale: float):
    """Single-shot fused attention for matcher-sized token counts.

    One grid step per (b, h): S = QK^T lives entirely in VMEM (N, M <= ~2048
    => <= 16 MB), masked softmax on the VPU, O = PV back through the MXU.
    No HBM materialization of S — the win over the XLA path, without the
    online-softmax bookkeeping of the streaming kernel.
    """
    q = q_ref[0, 0]  # (N, D)
    k = k_ref[0, 0]  # (M, D)
    v = v_ref[0, 0]
    mask = mask_ref[0]  # (1, M)
    s = jnp.dot(q * sm_scale, k.T, preferred_element_type=jnp.float32)
    s = jnp.where(mask, s, NEG_INF)  # (N, M) broadcast over rows
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(mask, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ) / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@jax.custom_vjp
def fused_attention(q, k, v, mask=None):
    """Fused masked attention, one (b, h) tile per grid step.

    q: (B, H, N, D); k/v: (B, H, M, D); mask: (B, M). Use for N*M tiles that
    fit VMEM (keypoint matchers: N, M <= 2048).

    Differentiable: the backward pass recomputes attention with dense XLA
    math (training materializes (N, M) anyway for the gradients).
    """
    return _fused_attention_impl(q, k, v, mask)


def _dense_reference(q, k, v, mask):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        any_valid = jnp.any(mask, axis=-1)[:, None, None, None]
        p = jnp.where(any_valid, p, jnp.zeros_like(p))
    return p


def _fused_fwd(q, k, v, mask):
    return _fused_attention_impl(q, k, v, mask), (q, k, v, mask)


def _fused_bwd(res, g):
    q, k, v, mask = res
    scale = q.shape[-1] ** -0.5
    p = _dense_reference(q, k, v, mask)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, g)
    dp = jnp.einsum("bhnd,bhmd->bhnm", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q) * scale
    return dq, dk, dv, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=())
def _fused_attention_impl(q, k, v, mask=None):
    B, H, N, D = q.shape
    M = k.shape[2]
    if mask is None:
        mask = jnp.ones((B, M), bool)
    scale = D ** -0.5
    Dp = ((D + 127) // 128) * 128
    Np = ((N + 7) // 8) * 8
    Mp = ((M + 127) // 128) * 128
    q_p = _pad_to(_pad_to(q, Np, 2), Dp, 3)
    k_p = _pad_to(_pad_to(k, Mp, 2), Dp, 3)
    v_p = _pad_to(_pad_to(v, Mp, 2), Dp, 3)
    mask_p = _pad_to(mask, Mp, 1, value=False)

    kernel = functools.partial(_fused_kernel, sm_scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Np, Dp), q.dtype),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Np, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Np, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
    )(q_p, k_p, v_p, mask_p[:, None, :])
    return out[:, :, :N, : q.shape[-1]]


def _kernel_wrapper_squeeze(q_ref, k_ref, v_ref, mask_ref, o_ref, **kw):
    # BlockSpecs with leading (1, 1, ...) give refs shaped (1, 1, bq, D);
    # squeeze views for the core kernel. mask_ref: (1, 1, Mp) -> (1, Mp).
    _flash_kernel(
        q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0], mask_ref.at[0],
        o_ref.at[0, 0], **kw
    )


def _bidir_kernel(
    q0_ref, q1_ref, v0_ref, v1_ref, neg0_ref, m1_ref, o0_ref, o1_ref,
    *, sm_scale: float
):
    """Bidirectional cross-attention: ONE similarity matmul, both softmaxes.

    LightGlue's cross-attention shares QK between directions
    (`ops/attention.py:bidirectional_cross_attention`); the unidirectional
    fused kernel computes the (N, M) similarity twice (once per direction).
    This kernel computes S = Q0 Q1^T once in VMEM, row-softmax @ V1 for the
    0<-1 message and column-softmax^T @ V0 for 1<-0 — 3 MXU matmuls instead
    of 4 and one HBM read of the operands.

    Mosaic layout rules (see ops/pallas_assignment.py): the row-side mask
    arrives as an additive f32 (N, 1) term (neg0_ref), the column-side as a
    boolean (1, M) (m1_ref); everything stays 2D.
    """
    q0 = q0_ref[0, 0]   # (Np, Dp)
    q1 = q1_ref[0, 0]   # (Mp, Dp)
    v0 = v0_ref[0, 0]
    v1 = v1_ref[0, 0]
    neg0 = neg0_ref[0]  # (Np, 1) f32: 0 valid / NEG_INF invalid rows
    mask1 = m1_ref[0]   # (1, Mp) bool
    s = jnp.dot(
        q0 * sm_scale, (q1 * sm_scale).T, preferred_element_type=jnp.float32
    )  # (Np, Mp)

    # 0 <- 1: softmax over columns (axis -1), masked by mask1
    s0 = jnp.where(mask1, s, NEG_INF)
    mx0 = jnp.max(s0, axis=-1, keepdims=True)
    p0 = jnp.where(mask1, jnp.exp(s0 - mx0), 0.0)
    l0 = jnp.sum(p0, axis=-1, keepdims=True)
    o0 = jnp.dot(
        p0.astype(v1.dtype), v1, preferred_element_type=jnp.float32
    ) / jnp.maximum(l0, 1e-30)
    o0_ref[0, 0] = o0.astype(o0_ref.dtype)

    # 1 <- 0: softmax over rows (axis 0), masked by the additive row term
    s1 = s + neg0  # invalid rows -> <= NEG_INF
    mx1 = jnp.max(s1, axis=0, keepdims=True)  # (1, Mp)
    mx1 = jnp.where(mx1 > NEG_INF / 2, mx1, 0.0)
    p1 = jnp.exp(s1 - mx1)  # masked rows underflow to exactly 0
    l1 = jnp.sum(p1, axis=0, keepdims=True)  # (1, Mp)
    o1 = jax.lax.dot_general(
        p1.astype(v0.dtype), v0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l1.T, 1e-30)  # (Mp, Dp)
    o1_ref[0, 0] = o1.astype(o1_ref.dtype)


@jax.custom_vjp
def fused_bidirectional_attention(qk0, qk1, v0, v1, mask0=None, mask1=None):
    """Shared-QK bidirectional cross-attention, one (b, h) tile per step.

    qk0: (B, H, N, D); qk1: (B, H, M, D); v0/v1 likewise; mask0: (B, N);
    mask1: (B, M). Returns (m0 (B, H, N, D), m1 (B, H, M, D)) — exactly
    `bidirectional_cross_attention`'s XLA math. Backward recomputes with
    dense XLA (training materializes (N, M) anyway).
    """
    return _bidir_impl(qk0, qk1, v0, v1, mask0, mask1)


def _bidir_impl(qk0, qk1, v0, v1, mask0, mask1):
    B, H, N, D = qk0.shape
    M = qk1.shape[2]
    if mask0 is None:
        mask0 = jnp.ones((B, N), bool)
    if mask1 is None:
        mask1 = jnp.ones((B, M), bool)
    scale = D ** -0.25  # applied to both operands: sim scales by D**-0.5
    Dp = ((D + 127) // 128) * 128
    Np = ((N + 127) // 128) * 128
    Mp = ((M + 127) // 128) * 128
    q0 = _pad_to(_pad_to(qk0, Np, 2), Dp, 3)
    q1 = _pad_to(_pad_to(qk1, Mp, 2), Dp, 3)
    v0p = _pad_to(_pad_to(v0, Np, 2), Dp, 3)
    v1p = _pad_to(_pad_to(v1, Mp, 2), Dp, 3)
    neg0 = jnp.where(
        _pad_to(mask0, Np, 1, value=False), 0.0, NEG_INF
    ).astype(jnp.float32)[:, :, None]  # (B, Np, 1)
    m1p = _pad_to(mask1, Mp, 1, value=False)[:, None, :]  # (B, 1, Mp)

    kernel = functools.partial(_bidir_kernel, sm_scale=scale)
    o0, o1 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Np, Dp), qk0.dtype),
            jax.ShapeDtypeStruct((B, H, Mp, Dp), qk0.dtype),
        ),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Np, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Np, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp, Dp), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ),
    )(q0, q1, v0p, v1p, neg0, m1p)
    return o0[:, :, :N, :D], o1[:, :, :M, :D]


def _bidir_dense(qk0, qk1, v0, v1, mask0, mask1):
    scale = qk0.shape[-1] ** -0.25
    sim = jnp.einsum("bhnd,bhmd->bhnm", qk0 * scale, qk1 * scale)
    sim0 = sim if mask1 is None else jnp.where(
        mask1[:, None, None, :], sim, NEG_INF)
    sim1 = sim if mask0 is None else jnp.where(
        mask0[:, None, :, None], sim, NEG_INF)
    a01 = jax.nn.softmax(sim0, axis=-1)
    a10 = jax.nn.softmax(sim1, axis=-2)
    if mask1 is not None:
        a01 = jnp.where(jnp.any(mask1, -1)[:, None, None, None], a01, 0.0)
    if mask0 is not None:
        a10 = jnp.where(jnp.any(mask0, -1)[:, None, None, None], a10, 0.0)
    return a01, a10


def _bidir_fwd(qk0, qk1, v0, v1, mask0, mask1):
    return _bidir_impl(qk0, qk1, v0, v1, mask0, mask1), (
        qk0, qk1, v0, v1, mask0, mask1)


def _bidir_bwd(res, g):
    qk0, qk1, v0, v1, mask0, mask1 = res
    g0, g1 = g
    scale = qk0.shape[-1] ** -0.25
    a01, a10 = _bidir_dense(qk0, qk1, v0, v1, mask0, mask1)
    dv1 = jnp.einsum("bhnm,bhnd->bhmd", a01, g0)
    dv0 = jnp.einsum("bhnm,bhmd->bhnd", a10, g1)
    dp0 = jnp.einsum("bhnd,bhmd->bhnm", g0, v1)
    dp1 = jnp.einsum("bhmd,bhnd->bhnm", g1, v0)
    ds0 = a01 * (dp0 - jnp.sum(dp0 * a01, axis=-1, keepdims=True))
    ds1 = a10 * (dp1 - jnp.sum(dp1 * a10, axis=-2, keepdims=True))
    ds = (ds0 + ds1) * scale * scale
    dq0 = jnp.einsum("bhnm,bhmd->bhnd", ds, qk1)
    dq1 = jnp.einsum("bhnm,bhnd->bhmd", ds, qk0)
    return dq0, dq1, dv0, dv1, None, None


fused_bidirectional_attention.defvjp(_bidir_fwd, _bidir_bwd)
