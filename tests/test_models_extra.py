import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model


def test_superglue_forward_and_loss():
    sg = get_model("superglue").from_conf(
        {"n_layers": 2, "descriptor_dim": 64, "input_dim": 32, "sinkhorn_iterations": 20}
    )
    rng = np.random.RandomState(0)
    B, N = 2, 16
    data = {
        "keypoints0": jnp.asarray(rng.rand(B, N, 2) * 100, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(B, N, 2) * 100, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(B, N, 32), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(B, N, 32), jnp.float32),
        "keypoint_valid0": jnp.ones((B, N), bool).at[0, -3:].set(False),
        "keypoint_valid1": jnp.ones((B, N), bool),
    }
    params = sg.init(jax.random.PRNGKey(0), data)
    pred = sg.apply(params, data)
    assert pred["log_assignment"].shape == (B, N + 1, N + 1)
    assert (np.asarray(pred["matches0"][0, -3:]) == -1).all()
    gt = {
        "gt_matches0": jnp.arange(N)[None].repeat(B, 0),
        "gt_matches1": jnp.arange(N)[None].repeat(B, 0),
    }
    losses, metrics = sg.loss(pred, gt)
    assert np.isfinite(np.asarray(losses["total"])).all()

    def loss_fn(p):
        pr = sg.apply(p, data)
        return jnp.mean(sg.loss(pr, gt)[0]["total"])

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_grid_extractor():
    ge = get_model("grid_extractor").from_conf({"cell_size": 16})
    img = jnp.zeros((1, 64, 64, 1))
    params = ge.init(jax.random.PRNGKey(0), {"image": img})
    pred = ge.apply(params, {"image": img})
    assert pred["keypoints"].shape == (1, 16, 2)
    assert bool(pred["keypoint_valid"].all())


def test_sift_opencv_callback():
    sift = get_model("sift").from_conf({"max_num_keypoints": 128})
    rng = np.random.RandomState(0)
    # a textured image so SIFT finds features
    img = np.zeros((96, 96), np.float32)
    for _ in range(30):
        y, x = rng.randint(6, 90, 2)
        img[y - 4 : y + 4, x - 4 : x + 4] = rng.rand()
    data = {"image": jnp.asarray(img)[None, ..., None]}
    params = sift.init(jax.random.PRNGKey(0), data)
    pred = jax.jit(lambda d: sift.apply(params, d))(data)
    assert pred["keypoints"].shape == (1, 128, 2)
    n = int(pred["keypoint_valid"].sum())
    assert n > 10
    # descriptors RootSIFT-normalized
    d = np.asarray(pred["descriptors"][0][: n])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_triplet_pipeline_stacked():
    conf = {
        "extractor": {
            "name": "superpoint",
            "max_num_keypoints": 32,
            "detection_threshold": 0.0,
            "channels": [8, 8, 16],
        },
        "matcher": {
            "name": "lightglue",
            "n_layers": 2,
            "descriptor_dim": 64,
            "input_dim": 256,
        },
        "ground_truth": {"name": "homography_matcher"},
    }
    tp = get_model("triplet_pipeline").from_conf(conf)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    sz = jnp.asarray([[64.0, 64.0]])
    data = {
        "view0": {"image": img, "image_size": sz},
        "view1": {"image": img, "image_size": sz},
        "view2": {"image": img, "image_size": sz},
        "H_0to1": jnp.eye(3)[None],
        "H_0to2": jnp.eye(3)[None],
        "H_1to2": jnp.eye(3)[None],
    }
    params = tp.init(jax.random.PRNGKey(0), data, train=True)
    pred = tp.apply(params, data, train=True)
    assert "matches0_0to1" in pred
    assert "matches0_1to2" in pred
    loss_fn = tp.make_loss_fn()
    losses, metrics = loss_fn(pred, data)
    assert losses["total"].shape == (1,)
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_aliked_forward():
    al = get_model("aliked").from_conf(
        {"model_name": "aliked-t16", "max_num_keypoints": 64,
         "detection_threshold": 0.0}
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    params = al.init(jax.random.PRNGKey(0), {"image": img})
    pred = jax.jit(lambda d: al.apply(params, d))({"image": img})
    assert pred["keypoints"].shape == (1, 64, 2)
    assert pred["descriptors"].shape == (1, 64, 64)  # aliked-t16 dim
    d = np.asarray(pred["descriptors"][0])
    valid = np.asarray(pred["keypoint_valid"][0])
    assert np.allclose(np.linalg.norm(d[valid], axis=-1), 1.0, atol=1e-4)


def test_disk_forward():
    dk = get_model("disk").from_conf(
        {"max_num_keypoints": 48, "channels": [8, 16, 16], "descriptor_dim": 24}
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    params = dk.init(jax.random.PRNGKey(0), {"image": img})
    pred = jax.jit(lambda d: dk.apply(params, d))({"image": img})
    assert pred["keypoints"].shape == (1, 48, 2)
    assert pred["descriptors"].shape == (1, 48, 24)


def test_lightglue_init_with_adaptive_depth():
    """Initializing a model whose conf already has depth_confidence > 0 must
    not crash (regression: the adaptive branch used to run during init and
    slice the not-yet-bound `self.layers.variables`)."""
    m = get_model("lightglue").from_conf(
        {"n_layers": 2, "depth_confidence": 0.95, "weights": None}
    )
    rng = np.random.RandomState(0)
    data = {
        "keypoints0": jnp.asarray(rng.rand(1, 32, 2) * 100, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(1, 32, 2) * 100, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(1, 32, 256), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(1, 32, 256), jnp.float32),
    }
    vs = m.init(jax.random.PRNGKey(0), data)  # must not raise
    pred = m.apply(vs, data)
    assert "stop_layers" in pred and pred["matches0"].shape == (1, 32)
