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


def test_superpoint_s2d_matches_standard():
    """Space-to-depth early scales are an exact re-evaluation of the same
    parameters (S2DVGGBlock) — outputs must match the standard path."""
    base = {
        "max_num_keypoints": 48,
        "detection_threshold": 0.0005,
        "channels": [8, 8, 16, 16, 32],
    }
    sp0 = get_model("superpoint").from_conf({**base, "s2d_levels": 0})
    sp3 = get_model("superpoint").from_conf({**base, "s2d_levels": 3})
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 1), jnp.float32)
    params = sp0.init(jax.random.PRNGKey(0), {"image": img})
    # identical parameter structure: checkpoints are interchangeable
    assert jax.tree_util.tree_structure(
        params
    ) == jax.tree_util.tree_structure(sp3.init(jax.random.PRNGKey(0), {"image": img}))
    p0 = sp0.apply(params, {"image": img})
    p3 = sp3.apply(params, {"image": img})
    np.testing.assert_array_equal(np.asarray(p0["keypoints"]), np.asarray(p3["keypoints"]))
    np.testing.assert_allclose(
        np.asarray(p0["descriptors"]), np.asarray(p3["descriptors"]), atol=1e-5
    )
    # odd-sized images fall back to the standard evaluation, same params
    odd = jnp.asarray(np.random.RandomState(1).rand(1, 63, 97, 1), jnp.float32)
    assert sp3.apply(params, {"image": odd})["keypoints"].shape == (1, 48, 2)


def test_lightglue_inference_matches_train_path():
    """The inference forward (post-scan exit head, no stacked scores) must
    produce the same assignment as the training scan path."""
    conf = {"n_layers": 3, "descriptor_dim": 64, "input_dim": 32, "num_heads": 4}
    lg = get_model("lightglue").from_conf(conf)
    rng = np.random.RandomState(3)
    data = {
        "keypoints0": jnp.asarray(rng.rand(2, 24, 2) * 100, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(2, 24, 2) * 100, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(2, 24, 32), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(2, 24, 32), jnp.float32),
    }
    params = lg.init(jax.random.PRNGKey(0), data, train=True)
    pt = lg.apply(params, data, train=True)
    pi = lg.apply(params, data, train=False)
    np.testing.assert_allclose(
        np.asarray(pt["log_assignment"]), np.asarray(pi["log_assignment"]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(pt["matches0"]), np.asarray(pi["matches0"]))


def test_lightglue_in_scan_loss_matches_stacked():
    """`loss.in_scan` reduces each layer's deep-supervision NLL inside the
    scan (training memory O(1) in depth with remat) — loss values and
    gradients must match the stacked-scores formulation exactly."""
    rng = np.random.RandomState(0)
    B, N, M = 2, 32, 24
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 400, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, M, 2) * 400, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, 64), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, M, 64), jnp.float32),
        "gt_matches0": jnp.asarray(
            np.where(rng.rand(B, N) < 0.5, rng.randint(0, M, (B, N)), -1),
            jnp.int32,
        ),
        "gt_matches1": jnp.asarray(
            np.where(rng.rand(B, M) < 0.5, rng.randint(0, N, (B, M)), -1),
            jnp.int32,
        ),
        "keypoint_valid0": jnp.asarray(rng.rand(B, N) > 0.1),
        "keypoint_valid1": jnp.asarray(rng.rand(B, M) > 0.1),
    }
    conf = {"n_layers": 3, "descriptor_dim": 64, "input_dim": 64, "num_heads": 4}
    outs = {}
    for in_scan in (False, True):
        lg = get_model("lightglue").from_conf(
            {**conf, "loss": {"in_scan": in_scan}}
        )
        params = lg.init(jax.random.PRNGKey(0), data, train=True)
        loss_fn = lg.make_loss_fn()

        def total(p):
            pred = lg.apply(p, data, train=True)
            losses, _ = loss_fn(pred, data)
            return jnp.mean(losses["total"])

        val, grad = jax.value_and_grad(total)(params)
        outs[in_scan] = (float(val), grad)
    assert outs[False][0] == pytest.approx(outs[True][0], abs=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), outs[False][1], outs[True][1]
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_in_scan_loss_cuts_training_memory():
    """XLA's own memory analysis must show the in-scan + remat training step
    using a fraction of the stacked formulation's temp memory (measured
    6.7 GB -> 0.76 GB at B=8 @ 512 kpts, 9 layers)."""
    rng = np.random.RandomState(0)
    B, N = 4, 256
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 400, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, N, 2) * 400, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, 128), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, N, 128), jnp.float32),
        "gt_matches0": jnp.asarray(rng.randint(-1, N, (B, N)), jnp.int32),
        "gt_matches1": jnp.asarray(rng.randint(-1, N, (B, N)), jnp.int32),
    }
    temps = {}
    for in_scan in (False, True):
        lg = get_model("lightglue").from_conf(
            {
                "n_layers": 9,
                "descriptor_dim": 128,
                "input_dim": 128,
                "num_heads": 4,
                "loss": {"in_scan": in_scan},
                "remat": in_scan,
            }
        )
        params = lg.init(jax.random.PRNGKey(0), data, train=True)
        loss_fn = lg.make_loss_fn()

        def total(p):
            pred = lg.apply(p, data, train=True)
            losses, _ = loss_fn(pred, data)
            return jnp.mean(losses["total"])

        mem = jax.jit(jax.grad(total)).lower(params).compile().memory_analysis()
        if mem is None:  # backend without memory analysis
            pytest.skip("memory_analysis unavailable on this backend")
        temps[in_scan] = mem.temp_size_in_bytes
    assert temps[True] < temps[False] / 3, temps


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
