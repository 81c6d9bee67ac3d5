"""Multi-device tests on the virtual 8-CPU mesh (the distributed-test gap the
reference leaves open, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.ops.attention import masked_attention
from gluefactory_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from gluefactory_tpu.parallel.sharded_matching import (
    shard_tokens,
    sharded_assignment,
    sharded_self_attention,
)


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_sharded_attention_matches_dense():
    mesh = make_mesh(data=2, model=4)
    rng = np.random.RandomState(0)
    B, H, N, D = 2, 4, 64, 32
    q = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, N) > 0.2)

    dense = masked_attention(q, k, v, mask)
    fn = sharded_self_attention(mesh)
    qs = shard_tokens(q, mesh, token_axis=2)
    ks = shard_tokens(k, mesh, token_axis=2)
    vs = shard_tokens(v, mesh, token_axis=2)
    ms = shard_tokens(mask, mesh, token_axis=1)
    out = fn(qs, ks, vs, ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=2e-5)


def test_sharded_assignment_matches_dense():
    from gluefactory_tpu.ops.assignment import sigmoid_log_double_softmax

    mesh = make_mesh(data=2, model=4)
    rng = np.random.RandomState(1)
    B, N, M = 2, 32, 24
    sim = jnp.asarray(rng.randn(B, N, M), jnp.float32)
    z0 = jnp.asarray(rng.randn(B, N), jnp.float32)
    z1 = jnp.asarray(rng.randn(B, M), jnp.float32)
    mask0 = jnp.asarray(rng.rand(B, N) > 0.2)
    mask1 = jnp.asarray(rng.rand(B, M) > 0.2)

    dense = sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)
    fn = sharded_assignment(mesh)
    out = fn(
        shard_tokens(sim, mesh, 1),
        shard_tokens(z0, mesh, 1),
        jax.device_put(z1, batch_sharding(mesh)),
        shard_tokens(mask0, mesh, 1),
        jax.device_put(mask1, batch_sharding(mesh)),
    )
    got = np.asarray(out)
    want = np.asarray(dense)
    valid = np.asarray(mask0)[:, :, None] & np.asarray(mask1)[:, None, :]
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-5)


def test_lightglue_full_model_tensor_parallel():
    """The REAL LightGlue forward with `tp_axis="model"` on a dp x tp mesh
    matches the dense single-device forward (same params). This is the
    end-to-end tensor-parallel matcher: token axis sharded, XLA-inserted
    collectives, not a standalone attention demo."""
    from jax.sharding import NamedSharding, PartitionSpec as P, set_mesh

    from gluefactory_tpu.models import get_model

    conf = {
        "name": "lightglue",
        "n_layers": 3,
        "descriptor_dim": 64,
        "input_dim": 32,
        "num_heads": 4,
    }
    lg_dense = get_model("lightglue").from_conf(conf)
    lg_tp = get_model("lightglue").from_conf({**conf, "tp_axis": "model"})

    rng = np.random.RandomState(2)
    B, N, M = 4, 64, 64
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 100, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, M, 2) * 100, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, 32), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, M, 32), jnp.float32),
        "keypoint_valid0": jnp.asarray(rng.rand(B, N) > 0.2),
        "keypoint_valid1": jnp.asarray(rng.rand(B, M) > 0.2),
    }
    params = lg_dense.init(jax.random.PRNGKey(0), data, train=False)
    dense = jax.jit(lambda p, d: lg_dense.apply(p, d, train=False))(params, data)

    mesh = make_mesh(data=2, model=4)
    tok = NamedSharding(mesh, P("data", "model"))
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("data", "model", None)))
        if v.ndim == 3
        else jax.device_put(v, tok)
        for k, v in data.items()
    }
    with set_mesh(mesh):
        tp = jax.jit(lambda p, d: lg_tp.apply(p, d, train=False))(params, sharded)

    np.testing.assert_array_equal(
        np.asarray(tp["matches0"]), np.asarray(dense["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(tp["matching_scores0"]),
        np.asarray(dense["matching_scores0"]),
        atol=5e-4,
    )
    la_t, la_d = np.asarray(tp["log_assignment"]), np.asarray(dense["log_assignment"])
    valid = np.asarray(data["keypoint_valid0"])[:, :, None] & np.asarray(
        data["keypoint_valid1"]
    )[:, None, :]
    np.testing.assert_allclose(la_t[valid], la_d[valid], atol=5e-4)


def test_data_parallel_loss_consistency():
    """Same batch, 1 device vs 8-device data parallel -> same loss."""
    from gluefactory_tpu.models import get_model

    conf = {
        "name": "lightglue",
        "n_layers": 2,
        "descriptor_dim": 64,
        "input_dim": 32,
    }
    lg = get_model("lightglue").from_conf(conf)
    rng = np.random.RandomState(0)
    B, N = 8, 16
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 100, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, N, 2) * 100, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, 32), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, N, 32), jnp.float32),
    }
    params = lg.init(jax.random.PRNGKey(0), data, train=True)
    gt = {
        "gt_matches0": jnp.arange(N)[None].repeat(B, 0),
        "gt_matches1": jnp.arange(N)[None].repeat(B, 0),
    }

    def loss(p, d):
        pred = lg.apply(p, d, train=True)
        return jnp.mean(lg.loss(pred, gt)[0]["total"])

    l_single = float(jax.jit(loss)(params, data))
    mesh = make_mesh(data=8, model=1)
    sharded = shard_batch(data, mesh)
    l_dp = float(jax.jit(loss)(params, sharded))
    assert abs(l_single - l_dp) < 1e-4
