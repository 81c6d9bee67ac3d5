"""Fused width-pair-packed stage kernels (ops/pallas_w2d.py): exactness vs
the production XLA w2d path (superpoint.py helpers), interpret mode on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gluefactory_tpu.ops.pallas_w2d as pw
from gluefactory_tpu.models.extractors.superpoint import (
    _w2d_kernel,
    _w2d_pool,
)


@pytest.fixture()
def interpret_pallas(monkeypatch):
    shim = type(pl)("plshim")
    shim.__dict__.update(pl.__dict__)
    shim.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    monkeypatch.setattr(pw, "pl", shim)


def _conv_packed(x, K2, b2, wpad, mask_phantom):
    """Production packed conv (superpoint.W2DVGGBlock inner math)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), K2.astype(jnp.bfloat16), (1, 1),
        ((1, 1), wpad), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.relu(y + jnp.tile(b2, 2).astype(y.dtype))
    if mask_phantom:
        Co = K2.shape[-1] // 2
        m = np.ones((1, 1, y.shape[2], 2 * Co), np.float32)
        m[:, :, 0, :Co] = 0.0
        m[:, :, -1, Co:] = 0.0
        y = y * jnp.asarray(m, y.dtype)
    return y


@pytest.mark.parametrize("B,H,W2,C,br", [(1, 16, 16, 8, 8), (2, 24, 20, 4, 8)])
def test_fused_w2d_tail_matches_xla(interpret_pallas, B, H, W2, C, br):
    rng = np.random.RandomState(0)
    x_al = jnp.asarray(rng.rand(B, H, W2, 2 * C), jnp.float32)
    K = jnp.asarray(rng.randn(3, 3, C, C) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    K2 = _w2d_kernel(K)

    ref = _w2d_pool(_conv_packed(x_al, K2, b, (1, 1), True))
    got = pw.fused_w2d_tail(
        x_al.astype(jnp.bfloat16), K2, b.astype(jnp.bfloat16), block_rows=br
    )
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < 3e-2, err


@pytest.mark.parametrize(
    "B,H,W2,Ci,Co,br", [(1, 16, 16, 8, 8, 8), (2, 24, 20, 4, 8, 8)]
)
def test_fused_w2d_stage_matches_xla(interpret_pallas, B, H, W2, Ci, Co, br):
    rng = np.random.RandomState(1)
    x_off = np.asarray(rng.rand(B, H, W2 + 1, 2 * Ci), np.float32)
    # offset-packed phantom borders are zeros (col 0 phase0, last col phase1)
    x_off[:, :, 0, :Ci] = 0.0
    x_off[:, :, -1, Ci:] = 0.0
    x_off = jnp.asarray(x_off)
    Ka = jnp.asarray(rng.randn(3, 3, Ci, Co) * 0.2, jnp.float32)
    ba = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32)
    Kb = jnp.asarray(rng.randn(3, 3, Co, Co) * 0.2, jnp.float32)
    bb = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32)
    K2a, K2b = _w2d_kernel(Ka), _w2d_kernel(Kb)

    a = _conv_packed(x_off, K2a, ba, (0, 0), False)
    ref = _w2d_pool(_conv_packed(a, K2b, bb, (1, 1), True))
    got = pw.fused_w2d_stage(
        x_off.astype(jnp.bfloat16), K2a, ba.astype(jnp.bfloat16),
        K2b, bb.astype(jnp.bfloat16), block_rows=br,
    )
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < 3e-2, err
