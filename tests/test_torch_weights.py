"""Weight-conversion structure tests: build torch-layout state dicts with the
official models' shapes, convert, and check the flax params trees match the
modules' init structure exactly (SURVEY.md §7.3 conversion fidelity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.utils.torch_weights import (
    convert_lightglue,
    convert_superpoint,
)


def _trees_match(a, b, path=""):
    if isinstance(a, dict) != isinstance(b, dict):
        return [f"{path}: type mismatch"]
    if not isinstance(a, dict):
        sa, sb = np.shape(a), np.shape(b)
        return [] if sa == sb else [f"{path}: {sa} vs {sb}"]
    errs = []
    for k in set(a) | set(b):
        if k not in a:
            errs.append(f"{path}/{k}: missing in converted")
        elif k not in b:
            errs.append(f"{path}/{k}: extra in converted")
        else:
            errs += _trees_match(a[k], b[k], f"{path}/{k}")
    return errs


def fake_superpoint_sd():
    rng = np.random.RandomState(0)
    chans = [(1, 64), (64, 64), (64, 64), (64, 64), (64, 128), (128, 128), (128, 128), (128, 128)]
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a", "conv4b"]
    sd = {}
    for (ci, co), n in zip(chans, names):
        sd[f"{n}.weight"] = rng.randn(co, ci, 3, 3).astype(np.float32)
        sd[f"{n}.bias"] = rng.randn(co).astype(np.float32)
    sd["convPa.weight"] = rng.randn(256, 128, 3, 3).astype(np.float32)
    sd["convPa.bias"] = rng.randn(256).astype(np.float32)
    sd["convPb.weight"] = rng.randn(65, 256, 1, 1).astype(np.float32)
    sd["convPb.bias"] = rng.randn(65).astype(np.float32)
    sd["convDa.weight"] = rng.randn(256, 128, 3, 3).astype(np.float32)
    sd["convDa.bias"] = rng.randn(256).astype(np.float32)
    sd["convDb.weight"] = rng.randn(256, 256, 1, 1).astype(np.float32)
    sd["convDb.bias"] = rng.randn(256).astype(np.float32)
    return sd


def test_convert_superpoint_structure():
    sp = get_model("superpoint").from_conf(
        {"channels": [64, 64, 128, 128, 256], "norm": "none"}
    )
    img = jnp.zeros((1, 64, 64, 1))
    init = sp.init(jax.random.PRNGKey(0), {"image": img})
    converted = convert_superpoint(fake_superpoint_sd())
    errs = _trees_match(init["params"], converted["params"])
    assert not errs, errs
    # converted weights actually run
    pred = sp.apply(jax.tree.map(jnp.asarray, converted), {"image": img})
    assert np.isfinite(np.asarray(pred["keypoint_scores"])).all()


def fake_lightglue_sd(L=3, D=256):
    rng = np.random.RandomState(0)

    def lin(o, i):
        return rng.randn(o, i).astype(np.float32), rng.randn(o).astype(np.float32)

    sd = {}
    w, b = lin(D, D)
    sd["input_proj.weight"], sd["input_proj.bias"] = w, b
    head_dim = D // 4
    sd["posenc.Wr.weight"] = rng.randn(head_dim // 2, 2).astype(np.float32)
    for i in range(L):
        p = f"transformers.{i}"
        for name, (o, it) in {
            "self_attn.Wqkv": (3 * D, D),
            "self_attn.out_proj": (D, D),
            "self_attn.ffn.0": (2 * D, 2 * D),
            "self_attn.ffn.3": (D, 2 * D),
            "cross_attn.to_qk": (D, D),
            "cross_attn.to_v": (D, D),
            "cross_attn.out_proj": (D, D),
            "cross_attn.ffn.0": (2 * D, 2 * D),
            "cross_attn.ffn.3": (D, 2 * D),
        }.items():
            w, b = lin(o, it)
            sd[f"{p}.{name}.weight"], sd[f"{p}.{name}.bias"] = w, b
        for name in ("self_attn.ffn.1", "cross_attn.ffn.1"):
            sd[f"{p}.{name}.weight"] = rng.randn(2 * D).astype(np.float32)
            sd[f"{p}.{name}.bias"] = rng.randn(2 * D).astype(np.float32)
        w, b = lin(D, D)
        sd[f"log_assignment.{i}.final_proj.weight"] = w
        sd[f"log_assignment.{i}.final_proj.bias"] = b
        w, b = lin(1, D)
        sd[f"log_assignment.{i}.matchability.weight"] = w
        sd[f"log_assignment.{i}.matchability.bias"] = b
        if i < L - 1:
            w, b = lin(1, D)
            sd[f"token_confidence.{i}.token.0.weight"] = w
            sd[f"token_confidence.{i}.token.0.bias"] = b
    return sd


def test_convert_lightglue_structure():
    L, D = 3, 256
    lg = get_model("lightglue").from_conf(
        {"n_layers": L, "descriptor_dim": D, "input_dim": D}
    )
    rng = np.random.RandomState(0)
    data = {
        "keypoints0": jnp.asarray(rng.rand(1, 16, 2), jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(1, 16, 2), jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(1, 16, D), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(1, 16, D), jnp.float32),
    }
    init = lg.init(jax.random.PRNGKey(0), data)
    converted = convert_lightglue(fake_lightglue_sd(L, D), n_layers=L)
    errs = _trees_match(init["params"], converted["params"])
    assert not errs, errs
    pred = lg.apply(jax.tree.map(jnp.asarray, converted), data)
    assert np.isfinite(np.asarray(pred["log_assignment"])).all()
