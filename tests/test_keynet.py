"""KeyNet+AffNet+HardNet and SIFT-kornia extractors
(reference `models/extractors/keynet_affnet_hardnet.py:8-74`, `sift_kornia.py:7-52`).

Fixture pattern: synthetic image + known translation homography; the
untrained-but-deterministic patch descriptor must match translated
keypoints across the warp (conv shift-equivariance), proving the
detect -> orient -> describe -> match chain end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model


@pytest.fixture(scope="module")
def synth_image():
    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    rng = np.random.RandomState(7)
    img = generate_synthetic_image(rng, 160, 128)  # (H, W, 3)
    return np.mean(img, -1, keepdims=True).astype(np.float32)


def test_keynet_shapes_and_validity(synth_image):
    model = get_model("keynet_affnet_hardnet").from_conf(
        {"max_num_keypoints": 64, "num_filters": 4}
    )
    data = {"image": jnp.asarray(synth_image[None])}
    variables = model.init(jax.random.PRNGKey(0), data)
    pred = jax.jit(lambda v, d: model.apply(v, d))(variables, data)
    K = 64
    assert pred["keypoints"].shape == (1, K, 2)
    assert pred["descriptors"].shape == (1, K, 128)
    assert pred["scales"].shape == (1, K)
    assert pred["oris"].shape == (1, K)
    assert pred["affine_shapes"].shape == (1, K, 2, 2)
    assert np.asarray(pred["keypoint_valid"]).sum() > 10
    d = np.asarray(pred["descriptors"])
    valid = np.asarray(pred["keypoint_valid"])[0]
    norms = np.linalg.norm(d[0][valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)  # L2-normalized
    # affine shapes are unit-determinant
    dets = np.linalg.det(np.asarray(pred["affine_shapes"])[0][valid])
    np.testing.assert_allclose(np.abs(dets), 1.0, atol=1e-3)


def test_keynet_matches_across_translation(synth_image):
    """Keypoints detected in a translated copy match back under the known
    homography (shift-equivariance of the conv detector + descriptor)."""
    H, W = synth_image.shape[:2]
    tx, ty = 24, 16
    shifted = np.zeros_like(synth_image)
    shifted[: H - ty, : W - tx] = synth_image[ty:, tx:]

    model = get_model("keynet_affnet_hardnet").from_conf(
        {"max_num_keypoints": 48, "num_filters": 4, "upright": True,
         "estimate_affine_shape": False}
    )
    data0 = {"image": jnp.asarray(synth_image[None])}
    data1 = {"image": jnp.asarray(shifted[None])}
    variables = model.init(jax.random.PRNGKey(1), data0)
    fwd = jax.jit(lambda v, d: model.apply(v, d))
    p0, p1 = fwd(variables, data0), fwd(variables, data1)

    d0 = np.asarray(p0["descriptors"])[0]
    d1 = np.asarray(p1["descriptors"])[0]
    k0 = np.asarray(p0["keypoints"])[0]
    k1 = np.asarray(p1["keypoints"])[0]
    v0 = np.asarray(p0["keypoint_valid"])[0]
    v1 = np.asarray(p1["keypoint_valid"])[0]

    # mutual NN matching on descriptors
    sim = d0 @ d1.T
    sim[~v0] = -np.inf
    sim[:, ~v1] = -np.inf
    nn01 = sim.argmax(1)
    nn10 = sim.argmax(0)
    mutual = nn10[nn01] == np.arange(len(k0))
    matched = mutual & v0 & v1[nn01]
    # keep matches whose source keypoint is visible in the shifted image
    vis = (k0[:, 0] >= tx + 8) & (k0[:, 1] >= ty + 8) & \
          (k0[:, 0] < W - 8) & (k0[:, 1] < H - 8)
    matched &= vis
    assert matched.sum() >= 5, f"only {matched.sum()} mutual matches"
    err = np.linalg.norm(
        (k0[matched] - [tx, ty]) - k1[nn01[matched]], axis=-1
    )
    # at least 60% of mutual matches land within 2 px of the GT translation
    assert (err <= 2.0).mean() >= 0.6, err


def test_sift_kornia_wrapper(synth_image):
    model = get_model("sift_kornia").from_conf({"max_num_keypoints": 128})
    data = {"image": jnp.asarray(synth_image[None])}
    variables = model.init(jax.random.PRNGKey(0), data)
    pred = model.apply(variables, data)
    assert pred["keypoints"].shape == (1, 128, 2)
    assert pred["descriptors"].shape[-1] == 128
    valid = np.asarray(pred["keypoint_valid"])[0]
    assert valid.sum() > 5
    oris = np.asarray(pred["oris"])[0][valid]
    assert np.all(np.abs(oris) <= 2 * np.pi + 1e-3)  # radians, not degrees
    # RootSIFT descriptors are L1->sqrt normalized => unit L2
    d = np.asarray(pred["descriptors"])[0][valid]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)

    # detector-only mode
    model2 = get_model("sift_kornia").from_conf(
        {"max_num_keypoints": 64, "has_descriptor": False}
    )
    pred2 = model2.apply(model2.init(jax.random.PRNGKey(0), data), data)
    assert "descriptors" not in pred2
