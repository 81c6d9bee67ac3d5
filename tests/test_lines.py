import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.gt_generation import (
    IGNORE_FEATURE,
    gt_line_matches_from_homography,
)
from gluefactory_tpu.models import get_model


def test_lsd_detects_lines():
    img = np.full((120, 160), 0.2, np.float32)
    img[30:90, 40:45] = 0.9  # vertical bar -> 2 long vertical edges
    img[60:65, 20:140] = 0.9  # horizontal bar
    lsd = get_model("lines.lsd").from_conf({"max_num_lines": 32, "min_length": 20})
    data = {"image": jnp.asarray(img)[None, ..., None]}
    params = lsd.init(jax.random.PRNGKey(0), data)
    pred = lsd.apply(params, data)
    n = int(pred["line_valid"].sum())
    assert n >= 2
    lines = np.asarray(pred["lines"][0][: n])
    lengths = np.linalg.norm(lines[:, 0] - lines[:, 1], axis=-1)
    assert (lengths >= 20).all()


def test_gt_line_matches_identity():
    lines = jnp.asarray(
        [[[[10.0, 10.0], [100.0, 10.0]], [[50.0, 20.0], [50.0, 90.0]]]]
    )  # (1, 2, 2, 2)
    out = gt_line_matches_from_homography(lines, lines, jnp.eye(3)[None])
    np.testing.assert_array_equal(np.asarray(out["gt_line_matches0"][0]), [0, 1])


def test_gt_line_matches_invalid_masked():
    lines = jnp.asarray(
        [[[[10.0, 10.0], [100.0, 10.0]], [[0.0, 0.0], [0.0, 0.0]]]]
    )
    valid = jnp.asarray([[True, False]])
    out = gt_line_matches_from_homography(
        lines, lines, jnp.eye(3)[None], valid0=valid, valid1=valid
    )
    m = np.asarray(out["gt_line_matches0"][0])
    assert m[0] == 0
    assert m[1] == IGNORE_FEATURE


def test_wireframe_and_gluestick_end_to_end():
    conf = {
        "extractor": {
            "name": "lines.wireframe",
            "point_extractor": {
                "name": "superpoint",
                "max_num_keypoints": 48,
                "detection_threshold": 0.0,
                "channels": [8, 8, 16],
            },
            "line_extractor": {"name": "lines.lsd", "max_num_lines": 16, "min_length": 10},
        },
        "matcher": {
            "name": "gluestick",
            "n_layers": 2,
            "descriptor_dim": 64,
            "input_dim": 256,
            "inter_supervision": [0],
        },
        "ground_truth": {"name": "homography_matcher", "use_lines": True},
    }
    tvp = get_model("two_view_pipeline").from_conf(conf)
    rng = np.random.RandomState(0)
    img = np.full((96, 96), 0.15, np.float32)
    img[20:70, 30:36] = 0.9
    img[50:56, 10:80] = 0.7
    for _ in range(10):
        y, x = rng.randint(5, 90, 2)
        img[y : y + 3, x : x + 3] = rng.rand()
    imgj = jnp.asarray(img)[None, ..., None]
    data = {
        "view0": {"image": imgj, "image_size": jnp.asarray([[96.0, 96.0]])},
        "view1": {"image": imgj, "image_size": jnp.asarray([[96.0, 96.0]])},
        "H_0to1": jnp.eye(3)[None],
    }
    params = tvp.init(jax.random.PRNGKey(0), data, train=True)
    pred = tvp.apply(params, data, train=True)
    assert "line_matches0" in pred
    assert "lines_junc_idx0" in pred
    assert "gt_line_matches0" in pred
    # junction indices point into the merged keypoint set
    K_total = pred["keypoints0"].shape[1]
    lj = np.asarray(pred["lines_junc_idx0"])
    assert lj.min() >= 0 and lj.max() < K_total
    # loss is finite and gradients flow
    loss_fn = tvp.make_loss_fn()
    losses, metrics = loss_fn(pred, {**data, **pred})
    assert np.isfinite(np.asarray(losses["total"])).all()
    assert "line_nll" in losses


def test_gt_line_matches_pose_depth():
    import jax.numpy as jnp
    from gluefactory_tpu.geometry.gt_generation import gt_line_matches_from_pose_depth
    from gluefactory_tpu.geometry.wrappers import Camera, Pose

    # fronto-parallel plane at depth 2, identity-ish pose with small shift
    cam = Camera.from_data(jnp.asarray([320, 240, 200.0, 200.0, 160.0, 120.0]))
    T = Pose.from_aa(jnp.zeros(3), jnp.asarray([0.1, 0.0, 0.0]))
    depth = jnp.full((1, 240, 320), 2.0)
    lines0 = jnp.asarray([[[[50.0, 60.0], [150.0, 60.0]], [[80.0, 100.0], [80.0, 200.0]]]])
    # shift in x by fx * tx / z = 200*0.1/2 = 10 px
    lines1 = lines0 + jnp.asarray([10.0, 0.0])
    out = gt_line_matches_from_pose_depth(
        lines0, lines1, depth, depth, cam, cam, T
    )
    np.testing.assert_array_equal(np.asarray(out["gt_line_matches0"][0]), [0, 1])
