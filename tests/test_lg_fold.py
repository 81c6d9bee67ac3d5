"""out_proj->ffn0 fold (`lightglue.fold_out_proj`): inference-only algebraic
reparametrization, exact in f32, same params/checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model

CONF = {
    "n_layers": 3,
    "descriptor_dim": 64,
    "input_dim": 64,
    "num_heads": 2,
    "filter_threshold": 0.1,
}


def _data(rng, B=2, N=48, M=40, D=64):
    d0 = rng.randn(B, N, D).astype(np.float32)
    d1 = rng.randn(B, M, D).astype(np.float32)
    kp0 = rng.rand(B, N, 2).astype(np.float32) * 320
    kp1 = rng.rand(B, M, 2).astype(np.float32) * 320
    v0 = np.ones((B, N), bool)
    v0[:, -5:] = False
    return {
        "keypoints0": jnp.asarray(kp0),
        "keypoints1": jnp.asarray(kp1),
        "descriptors0": jnp.asarray(d0),
        "descriptors1": jnp.asarray(d1),
        "keypoint_valid0": jnp.asarray(v0),
    }


def test_fold_exact_f32():
    rng = np.random.RandomState(0)
    data = _data(rng)
    base = get_model("lightglue").from_conf(CONF)
    folded = get_model("lightglue").from_conf({**CONF, "fold_out_proj": True})
    variables = base.init(jax.random.PRNGKey(0), data, train=False)
    out0 = jax.jit(lambda v, d: base.apply(v, d, train=False))(variables, data)
    out1 = jax.jit(lambda v, d: folded.apply(v, d, train=False))(variables, data)
    np.testing.assert_allclose(
        np.asarray(out1["log_assignment"]),
        np.asarray(out0["log_assignment"]),
        atol=5e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out1["matches0"]), np.asarray(out0["matches0"])
    )


def test_fold_training_path_unchanged():
    """With train=True the fold is bypassed (gradients flow through the
    unfused parametrization) — outputs match the base model's exactly."""
    rng = np.random.RandomState(1)
    data = _data(rng, M=48)
    base = get_model("lightglue").from_conf(CONF)
    folded = get_model("lightglue").from_conf({**CONF, "fold_out_proj": True})
    variables = base.init(jax.random.PRNGKey(0), data, train=False)
    out0 = base.apply(variables, data, train=True)
    out1 = folded.apply(variables, data, train=True)
    np.testing.assert_allclose(
        np.asarray(out1["all_log_assignment"]),
        np.asarray(out0["all_log_assignment"]),
        atol=1e-6,
    )


def test_qkv_layout_3hd_exact():
    """qkv_layout="3hd" with column-permuted weights is output-identical to
    the official "dh3" layout."""
    import numpy as _np

    from gluefactory_tpu.utils.torch_weights import qkv_columns_3hd

    rng = np.random.RandomState(2)
    data = _data(rng)
    base = get_model("lightglue").from_conf(CONF)
    m3hd = get_model("lightglue").from_conf({**CONF, "qkv_layout": "3hd"})
    variables = base.init(jax.random.PRNGKey(0), data, train=False)
    # permute the stacked (L, D, 3D) Wqkv columns layer by layer
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    wqkv = params["layers"]["self_attn"]["Wqkv"]
    perm = [
        qkv_columns_3hd(
            {"kernel": _np.asarray(wqkv["kernel"][i]),
             "bias": _np.asarray(wqkv["bias"][i])},
            n_heads=CONF["num_heads"],
        )
        for i in range(CONF["n_layers"])
    ]
    params["layers"]["self_attn"]["Wqkv"] = {
        "kernel": jnp.stack([jnp.asarray(p["kernel"]) for p in perm]),
        "bias": jnp.stack([jnp.asarray(p["bias"]) for p in perm]),
    }
    out0 = base.apply(variables, data, train=False)
    out1 = m3hd.apply({"params": params}, data, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["log_assignment"]),
        np.asarray(out0["log_assignment"]),
        atol=5e-5,
    )


def test_merge_cross_proj_and_unroll_exact():
    rng = np.random.RandomState(3)
    data = _data(rng)
    base = get_model("lightglue").from_conf(CONF)
    merged = get_model("lightglue").from_conf(
        {**CONF, "merge_cross_proj": True, "scan_unroll": 3}
    )
    variables = base.init(jax.random.PRNGKey(0), data, train=False)
    out0 = base.apply(variables, data, train=False)
    out1 = merged.apply(variables, data, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["log_assignment"]),
        np.asarray(out0["log_assignment"]),
        atol=5e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out1["matches0"]), np.asarray(out0["matches0"])
    )
