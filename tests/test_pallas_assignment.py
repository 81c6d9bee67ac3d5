"""Fused assignment kernel (ops/pallas_assignment.py) vs the XLA
sigmoid_log_double_softmax path, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gluefactory_tpu.ops.pallas_assignment as pa
from gluefactory_tpu.ops.assignment import sigmoid_log_double_softmax


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    # patches the shared module attribute: every pallas_call in the process
    # (assignment AND attention kernels) runs interpreted during the test
    monkeypatch.setattr(pa.pl, "pallas_call", patched)


def test_fused_assignment_matches_xla(interpret_pallas):
    rng = np.random.RandomState(0)
    B, N, M, D = 2, 48, 40, 64
    m0 = jnp.asarray(rng.randn(B, N, D), jnp.float32) / D**0.25
    m1 = jnp.asarray(rng.randn(B, M, D), jnp.float32) / D**0.25
    z0 = jnp.asarray(rng.randn(B, N), jnp.float32)
    z1 = jnp.asarray(rng.randn(B, M), jnp.float32)
    mask0 = jnp.asarray(rng.rand(B, N) > 0.2)
    mask1 = jnp.asarray(rng.rand(B, M) > 0.2)

    out = np.asarray(pa.fused_assignment(m0, m1, z0, z1, mask0, mask1))
    # reference path with the same bf16 similarity operands
    sim = jnp.einsum(
        "bnd,bmd->bnm",
        m0.astype(jnp.bfloat16),
        m1.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    ref = np.asarray(sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1))
    valid = np.asarray(mask0)[:, :, None] & np.asarray(mask1)[:, None, :]
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-3)
    assert np.all(out[~valid] == -1e9)


def test_exit_head_uses_kernel_and_matches(interpret_pallas, monkeypatch):
    """LightGlue's inference exit head routed through the fused kernel must
    produce the same matches as the XLA path."""
    import gluefactory_tpu.ops.attention as attn

    from gluefactory_tpu.models import get_model

    rng = np.random.RandomState(1)
    data = {
        "keypoints0": jnp.asarray(rng.rand(2, 32, 2) * 200, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(2, 32, 2) * 200, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(2, 32, 64), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(2, 32, 64), jnp.float32),
    }
    conf = {
        "n_layers": 2,
        "descriptor_dim": 64,
        "input_dim": 64,
        "num_heads": 4,
        "kernel_exit_head": True,
    }
    lg = get_model("lightglue").from_conf(conf)
    params = lg.init(jax.random.PRNGKey(0), data, train=True)
    p_xla = lg.apply(params, data, train=False)
    # force the "on TPU" branch so use_kernel engages (interpret mode)
    monkeypatch.setattr(attn, "_use_pallas", lambda: True)

    called = {"n": 0}
    orig = pa.fused_assignment

    def spy(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pa, "fused_assignment", spy)
    p_kern = lg.apply(params, data, train=False)
    assert called["n"] == 1
    # NOTE: the patched _use_pallas also flips the attention impl inside the
    # layers, so activations differ at kernel-rounding level between the two
    # runs; matches must agree, exact log-assignment parity is covered by
    # test_fused_assignment_matches_xla on identical inputs.
    np.testing.assert_array_equal(
        np.asarray(p_xla["matches0"]), np.asarray(p_kern["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(p_xla["matching_scores0"]),
        np.asarray(p_kern["matching_scores0"]),
        atol=5e-2,
    )
