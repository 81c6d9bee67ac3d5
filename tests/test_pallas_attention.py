"""Flash-attention kernel vs dense reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gluefactory_tpu.ops.pallas_attention as pa
from gluefactory_tpu.ops.attention import masked_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pa.pl, "pallas_call", patched)


@pytest.mark.parametrize("N,M", [(256, 256), (300, 200), (64, 512)])
def test_flash_matches_dense(N, M):
    rng = np.random.RandomState(0)
    B, H, D = 2, 2, 64
    q = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, M, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, M, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, M) > 0.2)
    out = pa.flash_attention(q, k, v, mask)
    ref = masked_attention(q, k, v, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fully_masked_rows_zero():
    rng = np.random.RandomState(0)
    B, H, N, D = 1, 1, 64, 32
    q = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    mask = jnp.zeros((B, N), bool)
    out = pa.flash_attention(q, k, v, mask)
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_fused_attention_grad_matches_dense():
    rng = np.random.RandomState(0)
    B, H, N, D = 1, 2, 64, 32
    q = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, N) > 0.2)

    def loss_pallas(q, k, v):
        return jnp.sum(pa.fused_attention(q, k, v, mask) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(masked_attention(q, k, v, mask, impl="xla") ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.parametrize("N,M", [(64, 64), (48, 80)])
def test_bidirectional_fused_matches_dense(interpret_mode, N, M):
    """One-sim bidirectional kernel == the XLA shared-QK reference."""
    from gluefactory_tpu.ops.attention import bidirectional_cross_attention

    rng = np.random.RandomState(0)
    B, H, D = 2, 2, 32
    qk0 = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    qk1 = jnp.asarray(rng.randn(B, H, M, D), jnp.float32)
    v0 = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    v1 = jnp.asarray(rng.randn(B, H, M, D), jnp.float32)
    mask0 = jnp.asarray(rng.rand(B, N) > 0.2)
    mask1 = jnp.asarray(rng.rand(B, M) > 0.2)

    o0, o1 = pa.fused_bidirectional_attention(qk0, qk1, v0, v1, mask0, mask1)
    r0, r1 = bidirectional_cross_attention(
        qk0, qk1, v0, v1, mask0, mask1)  # CPU backend -> XLA path
    np.testing.assert_allclose(np.asarray(o0), np.asarray(r0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(r1), atol=2e-5)


def test_bidirectional_fused_fully_masked(interpret_mode):
    rng = np.random.RandomState(1)
    B, H, N, D = 1, 1, 32, 32
    qk0 = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    qk1 = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    v0 = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    v1 = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    none0 = jnp.zeros((B, N), bool)
    o0, o1 = pa.fused_bidirectional_attention(qk0, qk1, v0, v1, none0, None)
    # no valid rows in set 0: the 1<-0 message must be exactly zero
    np.testing.assert_array_equal(np.asarray(o1), 0.0)
    assert np.isfinite(np.asarray(o0)).all()


def test_bidirectional_fused_grad_matches_dense(interpret_mode):
    from gluefactory_tpu.ops.attention import bidirectional_cross_attention

    rng = np.random.RandomState(2)
    B, H, N, D = 1, 2, 48, 32
    args = [jnp.asarray(rng.randn(B, H, N, D), jnp.float32) for _ in range(4)]
    mask0 = jnp.asarray(rng.rand(B, N) > 0.2)
    mask1 = jnp.asarray(rng.rand(B, N) > 0.2)

    def loss_pallas(*a):
        o0, o1 = pa.fused_bidirectional_attention(*a, mask0, mask1)
        return jnp.sum(o0 ** 2) + jnp.sum(o1 ** 3)

    def loss_dense(*a):
        o0, o1 = bidirectional_cross_attention(*a, mask0, mask1)
        return jnp.sum(o0 ** 2) + jnp.sum(o1 ** 3)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
