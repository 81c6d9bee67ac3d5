import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model


def test_registry_resolves():
    assert get_model("extractors.superpoint").__name__ == "SuperPoint"
    assert get_model("superpoint").__name__ == "SuperPoint"
    assert get_model("matchers.lightglue").__name__ == "LightGlue"
    assert get_model("nearest_neighbor").__name__ == "NearestNeighborMatcher"
    assert get_model("two_view_pipeline").__name__ == "TwoViewPipeline"


def test_superpoint_forward_shapes():
    sp = get_model("superpoint").from_conf(
        {"max_num_keypoints": 64, "detection_threshold": 0.0, "channels": [8, 8, 16]}
    )
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1), jnp.float32)
    params = sp.init(jax.random.PRNGKey(0), {"image": img})
    pred = sp.apply(params, {"image": img})
    assert pred["keypoints"].shape == (2, 64, 2)
    assert pred["descriptors"].shape == (2, 64, 256)
    assert pred["keypoint_scores"].shape == (2, 64)
    assert pred["keypoint_valid"].shape == (2, 64)


def test_nn_matcher_identity():
    rng = np.random.RandomState(0)
    d = rng.randn(1, 32, 64).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nn_m = get_model("nearest_neighbor").from_conf({})
    data = {
        "descriptors0": jnp.asarray(d),
        "descriptors1": jnp.asarray(d),
    }
    params = nn_m.init(jax.random.PRNGKey(0), data)
    pred = nn_m.apply(params, data)
    np.testing.assert_array_equal(np.asarray(pred["matches0"][0]), np.arange(32))


def test_nn_matcher_respects_masks():
    rng = np.random.RandomState(0)
    d = rng.randn(1, 16, 32).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nn_m = get_model("nearest_neighbor").from_conf({})
    valid1 = jnp.ones((1, 16), bool).at[0, 5].set(False)
    data = {
        "descriptors0": jnp.asarray(d),
        "descriptors1": jnp.asarray(d),
        "keypoint_valid0": jnp.ones((1, 16), bool),
        "keypoint_valid1": valid1,
    }
    params = nn_m.init(jax.random.PRNGKey(0), data)
    pred = nn_m.apply(params, data)
    assert int(pred["matches0"][0, 5]) == -1  # its partner is masked


@pytest.fixture(scope="module")
def lg_setup():
    conf = {"n_layers": 3, "descriptor_dim": 64, "input_dim": 32, "num_heads": 4}
    lg = get_model("lightglue").from_conf(conf)
    rng = np.random.RandomState(0)
    B, N, M = 2, 24, 24
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 100, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, M, 2) * 100, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, 32), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, M, 32), jnp.float32),
        "keypoint_valid0": jnp.ones((B, N), bool).at[0, -4:].set(False),
        "keypoint_valid1": jnp.ones((B, M), bool),
    }
    params = lg.init(jax.random.PRNGKey(0), data, train=True)
    return lg, params, data


def test_lightglue_forward(lg_setup):
    lg, params, data = lg_setup
    pred = lg.apply(params, data)
    assert pred["matches0"].shape == (2, 24)
    assert pred["log_assignment"].shape == (2, 24, 24)
    # masked keypoints never match
    assert (np.asarray(pred["matches0"][0, -4:]) == -1).all()
    # log assignment scores are valid log-probs
    assert np.asarray(pred["log_assignment"]).max() <= 1e-3


def test_lightglue_train_loss(lg_setup):
    lg, params, data = lg_setup
    pred = lg.apply(params, data, train=True)
    assert pred["all_log_assignment"].shape[0] == 3  # L layers
    gt = {
        "gt_matches0": jnp.concatenate(
            [jnp.arange(12)[None].repeat(2, 0), jnp.full((2, 12), -1)], axis=-1
        ),
        "gt_matches1": jnp.concatenate(
            [jnp.arange(12)[None].repeat(2, 0), jnp.full((2, 12), -1)], axis=-1
        ),
    }
    losses, metrics = lg.loss(pred, gt)
    assert losses["total"].shape == (2,)
    assert np.isfinite(np.asarray(losses["total"])).all()
    assert "match_recall" in metrics


def test_lightglue_grad_flows(lg_setup):
    lg, params, data = lg_setup
    gt = {
        "gt_matches0": jnp.arange(24)[None].repeat(2, 0),
        "gt_matches1": jnp.arange(24)[None].repeat(2, 0),
    }

    def loss_fn(p):
        pred = lg.apply(p, data, train=True)
        losses, _ = lg.loss(pred, gt)
        return jnp.mean(losses["total"])

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    norms = [float(jnp.linalg.norm(x)) for x in flat]
    assert max(norms) > 0  # gradients actually flow


def test_two_view_pipeline_end_to_end():
    conf = {
        "extractor": {
            "name": "superpoint",
            "max_num_keypoints": 48,
            "detection_threshold": 0.0,
            "channels": [8, 8, 16],
        },
        "matcher": {"name": "nearest_neighbor"},
        "ground_truth": {"name": "homography_matcher"},
    }
    tvp = get_model("two_view_pipeline").from_conf(conf)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    data = {
        "view0": {"image": img, "image_size": jnp.asarray([[64.0, 64.0]])},
        "view1": {"image": img, "image_size": jnp.asarray([[64.0, 64.0]])},
        "H_0to1": jnp.eye(3)[None],
    }
    params = tvp.init(jax.random.PRNGKey(0), data, train=True)
    pred = tvp.apply(params, data, train=True)
    assert "matches0" in pred and "gt_matches0" in pred
    # identical images + identity homography: matched keypoints are correct
    m0 = np.asarray(pred["matches0"][0])
    gt0 = np.asarray(pred["gt_matches0"][0])
    valid = np.asarray(pred["keypoint_valid0"][0]) & (m0 >= 0)
    assert valid.sum() > 0
    assert (m0[valid] == gt0[valid]).mean() > 0.9
