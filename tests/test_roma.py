"""From-scratch RoMa dense matcher: forward/shape/jit behavior, sparse
keypoint matching through the dense warp (parity vs the reference torch
coordinate/sampling utilities `gluefactory/utils/image.py:164-270`), cycle
filtering, and a short overfit run proving trainability (the reference's
RoMa is an inference-only wrapper, `models/matchers/roma.py:195`)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.matchers.roma import (
    cycle_dist,
    denormalize_coords,
    grid_sample_nhwc,
    match_keypoints_dense,
    normalize_coords,
    pixel_grid_normalized,
)

REFSHIM = str(Path(__file__).parent / "refshim")
REFERENCE = "/root/reference"

TINY = {
    "backbone": {
        "name": "backbones.dinov2",
        "preset": "custom",
        "embed_dim": 32,
        "depth": 1,
        "num_heads": 2,
        "pos_grid_size": 56,
        "patch_size": 14,
    },
    "fine_dim": 8,
    "gp_embed_dim": 16,
    "decoder_hidden": 16,
    "refiner_hidden": 16,
    "refiner_window": 1,
    "refine_scales": [8, 4],
    "internal_hw": (56, 56),
}


def _ref_image_utils():
    if not Path(REFERENCE, "gluefactory").exists():
        pytest.skip("reference checkout not available")
    for p in (REFSHIM, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    from gluefactory.utils import image as ref_image

    return ref_image


def test_grid_sample_and_coords_parity_vs_reference():
    """Our grid sampling + COLMAP coordinate conventions match the reference
    torch implementations bit-for-bit (the sparse matching path depends on
    these semantics)."""
    import torch

    ref = _ref_image_utils()
    rng = np.random.RandomState(0)
    img = rng.randn(2, 9, 13, 4).astype(np.float32)
    coords = (rng.rand(2, 37, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    ours = grid_sample_nhwc(jnp.asarray(img), jnp.asarray(coords)[:, :, None])
    theirs = ref.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(coords[:, None]),
    )  # (B, C, 1, N)
    np.testing.assert_allclose(
        np.asarray(ours)[:, :, 0],
        theirs[:, :, 0].permute(0, 2, 1).numpy(),
        atol=1e-5,
    )
    kp = rng.rand(2, 11, 2).astype(np.float32) * np.asarray([13, 9])
    ours_n = normalize_coords(jnp.asarray(kp), (9, 13))
    theirs_n = ref.normalize_coords(torch.from_numpy(kp.copy()), (9, 13))
    np.testing.assert_allclose(np.asarray(ours_n), theirs_n.numpy(), atol=1e-6)
    back = denormalize_coords(ours_n, (9, 13))
    np.testing.assert_allclose(np.asarray(back), kp, atol=1e-4)


def test_cycle_dist_parity_vs_reference():
    import torch

    ref = _ref_image_utils()
    rng = np.random.RandomState(1)
    h, w = 6, 8
    w01 = np.clip(rng.randn(1, h, w, 2) * 0.3, -1, 1).astype(np.float32)
    w10 = np.clip(rng.randn(1, h, w, 2) * 0.3, -1, 1).astype(np.float32)
    ours = cycle_dist(jnp.asarray(w01), jnp.asarray(w10))
    theirs = ref.cycle_dist(torch.from_numpy(w01), torch.from_numpy(w10))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def _identity_pred(B, h, w):
    grid = np.asarray(pixel_grid_normalized(h, w))[None].repeat(B, 0)
    return {
        "warp0": jnp.asarray(grid),
        "warp1": jnp.asarray(grid),
        "certainty0": jnp.ones((B, h, w)),
        "certainty1": jnp.ones((B, h, w)),
    }


def test_match_keypoints_dense_identity_and_translation():
    h, w = 32, 40
    # keep x in [4, w-12] so the +6px translated copies stay in-bounds
    kpts = jnp.asarray(
        np.random.RandomState(0).rand(1, 25, 2) * np.asarray([w - 16, h - 8]) + 4,
        jnp.float32,
    )
    data = {
        "keypoints0": kpts,
        "keypoints1": kpts,
        "view0": {"image": jnp.zeros((1, h, w, 3))},
        "view1": {"image": jnp.zeros((1, h, w, 3))},
    }
    pred = _identity_pred(1, h, w)
    out = match_keypoints_dense(pred, data, 2.0, 0.5)
    np.testing.assert_array_equal(np.asarray(out["matches0"])[0], np.arange(25))
    assert np.all(np.asarray(out["matching_scores0"]) > 0.5)

    # pure translation: keypoints1 = keypoints0 + (tx, 0); warp encodes it
    tx = 6.0
    grid = pixel_grid_normalized(h, w)[None]
    shift = jnp.asarray([2 * tx / (w - 1), 0.0])
    data2 = dict(data, keypoints1=kpts + jnp.asarray([tx, 0.0]))
    pred2 = dict(pred, warp0=grid + shift, warp1=grid - shift)
    out2 = match_keypoints_dense(pred2, data2, 2.0, 0.5)
    np.testing.assert_array_equal(np.asarray(out2["matches0"])[0], np.arange(25))
    np.testing.assert_array_equal(np.asarray(out2["matches1"])[0], np.arange(25))

    # wrong warp direction -> nothing should pass the max_kp_error gate
    pred3 = dict(pred, warp0=grid - 4 * shift)
    out3 = match_keypoints_dense(pred3, data2, 2.0, 0.5)
    assert np.all(np.asarray(out3["matches0"]) == -1)


def test_cycle_error_filter_and_bidirectional():
    h, w = 24, 24
    kpts = jnp.asarray([[[6.0, 6.0], [12.0, 12.0], [18.0, 18.0]]])
    data = {
        "keypoints0": kpts,
        "keypoints1": kpts,
        "view0": {"image": jnp.zeros((1, h, w, 3))},
        "view1": {"image": jnp.zeros((1, h, w, 3))},
    }
    pred = _identity_pred(1, h, w)
    # corrupt the backward warp -> cycle error explodes everywhere
    pred_bad = dict(pred, warp1=pred["warp1"] + 0.5)
    pred_bad["cycle_error0"] = cycle_dist(pred_bad["warp0"], pred_bad["warp1"])
    pred_bad["cycle_error1"] = cycle_dist(pred_bad["warp1"], pred_bad["warp0"])
    out = match_keypoints_dense(pred, data, 2.0, 0.5, cycle_error_threshold=None)
    assert np.all(np.asarray(out["matches0"]) >= 0)
    out_f = match_keypoints_dense(
        pred_bad, data, 2.0, 0.5, cycle_error_threshold=1.0
    )
    assert np.all(np.asarray(out_f["matches0"]) == -1)
    # bidirectional check keeps identity matches
    out_b = match_keypoints_dense(
        pred, data, 2.0, 0.5, require_bidirectional_match=True
    )
    np.testing.assert_array_equal(np.asarray(out_b["matches0"])[0], [0, 1, 2])


@pytest.fixture(scope="module")
def tiny_model():
    model = get_model("roma").from_conf(TINY)
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    img1 = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    data = {"view0": {"image": img0}, "view1": {"image": img1}}
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    return model, variables, data


def test_forward_shapes_and_jit(tiny_model):
    model, variables, data = tiny_model
    out = jax.jit(lambda v, d: model.apply(v, d, train=False))(variables, data)
    h, w = 48, 64
    assert out["warp0"].shape == (1, h, w, 2)
    assert out["certainty0"].shape == (1, h, w)
    assert out["warp1"].shape == (1, h, w, 2)
    c = np.asarray(out["certainty0"])
    assert np.all((c >= 0) & (c <= 1)) and np.all(np.isfinite(np.asarray(out["warp0"])))


def test_keypoint_matching_end_to_end(tiny_model):
    model, variables, data = tiny_model
    kpts = jnp.asarray(np.random.RandomState(1).rand(1, 12, 2) * 40 + 4, jnp.float32)
    data2 = {**data, "keypoints0": kpts, "keypoints1": kpts}
    out = model.apply(variables, data2, train=False)
    assert out["matches0"].shape == (1, 12)
    assert out["matching_scores0"].shape == (1, 12)


def test_sample_matches(tiny_model):
    model, variables, data = tiny_model
    model2 = get_model("roma").from_conf({**TINY, "sample_num_matches": 50})
    out = model2.apply(variables, data, train=False)
    assert out["sampled_keypoints0"].shape == (1, 50, 2)
    assert out["sampled_keypoints1"].shape == (1, 50, 2)
    assert np.all(np.asarray(out["sampled_scores"]) >= 0)


def test_overfit_translation():
    """A few gradient steps on a constant translation warp cut the dense EPE
    loss — the from-scratch RoMa trains (the reference wrapper cannot)."""
    import optax

    model = get_model("roma").from_conf({**TINY, "symmetric": True})
    rng = np.random.RandomState(3)
    img0 = jnp.asarray(rng.rand(1, 56, 56, 3), jnp.float32)
    img1 = jnp.asarray(np.roll(np.asarray(img0), 8, axis=2))
    h, w = 56, 56
    grid = pixel_grid_normalized(h, w)[None]
    gt_warp0 = grid + jnp.asarray([2 * 8 / (w - 1), 0.0])
    data = {
        "view0": {"image": img0},
        "view1": {"image": img1},
        "gt_warp0": gt_warp0,
        "gt_valid0": jnp.ones((1, h, w), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), data, train=True)

    def loss_fn(params):
        pred = model.apply({"params": params}, data, train=True)
        losses, _ = model.loss(pred, data)
        return jnp.mean(losses["total"])

    tx = optax.adam(1e-3)
    params = variables["params"]
    state = tx.init(params)
    l0 = float(loss_fn(params))
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(8):
        l, g = grad_fn(params)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)
