"""GlueStick fused-QKV projection: exactness vs the unfused layout.

The fused kernels are column-concatenations of q|k|v (self) and k|v
(cross), so outputs must be bit-comparable in f32 up to matmul reassociation
(~1e-5). Mirrors the LightGlue fold-exactness tests (tests/test_lg_fold.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model


def _fuse_params(params):
    """Unfused gnn params -> fused layout (concatenate projection kernels)."""
    import copy

    out = copy.deepcopy(jax.tree.map(np.asarray, params))
    gnn = out["params"]["gnn"]
    s = gnn["self"]
    s["qkv"] = {
        "kernel": np.concatenate(
            [s["q"]["kernel"], s["k"]["kernel"], s["v"]["kernel"]], axis=-1),
        "bias": np.concatenate(
            [s["q"]["bias"], s["k"]["bias"], s["v"]["bias"]], axis=-1),
    }
    for k in ("q", "k", "v"):
        del s[k]
    c = gnn["cross"]
    c["kv"] = {
        "kernel": np.concatenate(
            [c["k"]["kernel"], c["v"]["kernel"]], axis=-1),
        "bias": np.concatenate([c["k"]["bias"], c["v"]["bias"]], axis=-1),
    }
    for k in ("k", "v"):
        del c[k]
    return out


def test_fused_qkv_exact():
    B, N, M, L, D = 2, 48, 40, 24, 64
    rng = np.random.RandomState(0)
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 200, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, M, 2) * 200, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, D), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, M, D), jnp.float32),
        "lines0": jnp.asarray(rng.rand(B, L, 2, 2) * 200, jnp.float32),
        "lines1": jnp.asarray(rng.rand(B, L, 2, 2) * 200, jnp.float32),
        "lines_junc_idx0": jnp.asarray(rng.randint(0, N, (B, L, 2)), jnp.int32),
        "lines_junc_idx1": jnp.asarray(rng.randint(0, M, (B, L, 2)), jnp.int32),
    }
    base = {
        "n_layers": 3, "descriptor_dim": D, "input_dim": D, "num_heads": 4}
    m_ref = get_model("gluestick").from_conf(base)
    vs = m_ref.init(jax.random.PRNGKey(0), data, train=False)
    ref = m_ref.apply(vs, data, train=False)

    m_fused = get_model("gluestick").from_conf({**base, "fused_qkv": True})
    vs_fused = _fuse_params(vs)
    # structure must match a fresh fused init
    init_f = m_fused.init(jax.random.PRNGKey(0), data, train=False)
    assert jax.tree.map(lambda a: a.shape, init_f) == jax.tree.map(
        lambda a: np.asarray(a).shape, vs_fused)
    out = m_fused.apply(vs_fused, data, train=False)

    np.testing.assert_allclose(
        np.asarray(out["log_assignment"]), np.asarray(ref["log_assignment"]),
        atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(ref["matches0"]))
    np.testing.assert_array_equal(
        np.asarray(out["line_matches0"]), np.asarray(ref["line_matches0"]))
