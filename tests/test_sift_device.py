"""On-device DoG SIFT: detection on structured scenes, rotation-equivariant
descriptors, and homography-pair matching quality (the CudaSift-equivalent
fast path, `ops/sift_device.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _scene(rng, W=160, H=120):
    import cv2

    img = np.full((H, W), 0.35, np.float32)
    img += rng.rand(H, W).astype(np.float32) * 0.03
    for _ in range(25):
        x, y = rng.randint(10, W - 10), rng.randint(10, H - 10)
        s = rng.randint(3, 12)
        c = float(rng.uniform(0.0, 1.0))
        if rng.rand() < 0.5:
            cv2.rectangle(img, (x - s, y - s), (x + s, y + s), c, -1)
        else:
            cv2.circle(img, (x, y), s, c, -1)
    return cv2.GaussianBlur(img, (3, 3), 0.8)


def test_device_sift_detects_structure():
    rng = np.random.RandomState(0)
    img = _scene(rng)
    from gluefactory_tpu.ops.sift_device import detect_sift_device

    pred = jax.jit(
        lambda im: detect_sift_device(im, max_num_keypoints=256, contrast_th=0.006)
    )(jnp.asarray(img)[None])
    valid = np.asarray(pred["keypoint_valid"][0])
    assert valid.sum() > 50
    kp = np.asarray(pred["keypoints"][0])[valid]
    assert (kp[:, 0] < 160).all() and (kp[:, 1] < 120).all() and (kp >= 0).all()
    d = np.asarray(pred["descriptors"][0])[valid]
    norms = np.linalg.norm(d, axis=-1)
    assert np.all(norms > 0.5)  # normalized, non-degenerate
    # descriptors are not collapsed to a single point
    assert np.std(d, axis=0).mean() > 0.01


def test_device_sift_homography_matching():
    """Two homography-warped views: mutual-NN device-SIFT matches agree with
    the GT homography for a solid majority."""
    import cv2

    rng = np.random.RandomState(1)
    base = _scene(rng, 200, 150)
    theta = 0.15
    Hm = np.array(
        [
            [np.cos(theta), -np.sin(theta), 18.0],
            [np.sin(theta), np.cos(theta), -6.0],
            [1e-4, -5e-5, 1.0],
        ],
        np.float32,
    )
    warped = cv2.warpPerspective(base, Hm, (200, 150))
    from gluefactory_tpu.ops.sift_device import detect_sift_device

    fn = jax.jit(
        lambda im: detect_sift_device(im, max_num_keypoints=384, contrast_th=0.008)
    )
    p0 = fn(jnp.asarray(base)[None])
    p1 = fn(jnp.asarray(warped)[None])
    d0 = np.asarray(p0["descriptors"][0])
    d1 = np.asarray(p1["descriptors"][0])
    v0 = np.asarray(p0["keypoint_valid"][0])
    v1 = np.asarray(p1["keypoint_valid"][0])
    sim = d0 @ d1.T
    sim[~v0] = -1
    sim[:, ~v1] = -1
    nn01 = sim.argmax(1)
    nn10 = sim.argmax(0)
    mutual = np.where(nn10[nn01] == np.arange(len(nn01)))[0]
    mutual = mutual[v0[mutual]]
    assert len(mutual) >= 30

    k0 = np.asarray(p0["keypoints"][0])[mutual]
    k1 = np.asarray(p1["keypoints"][0])[nn01[mutual]]
    k0h = np.concatenate([k0, np.ones((len(k0), 1))], -1)
    proj = k0h @ Hm.T
    proj = proj[:, :2] / proj[:, 2:]
    err = np.linalg.norm(proj - k1, axis=-1)
    inlier_frac = float((err < 4.0).mean())
    assert inlier_frac > 0.6, (len(mutual), inlier_frac, np.median(err))


def test_sift_extractor_device_backend():
    from gluefactory_tpu.models import get_model

    rng = np.random.RandomState(2)
    img = _scene(rng, 128, 96)
    sift = get_model("sift").from_conf(
        {"backend": "device", "max_num_keypoints": 128}
    )
    params = sift.init(jax.random.PRNGKey(0), {"image": jnp.asarray(img)[None, ..., None]})
    pred = jax.jit(lambda d: sift.apply(params, d))(
        {
            "image": jnp.asarray(img)[None, ..., None],
            "image_size": jnp.asarray([[128.0, 96.0]]),
        }
    )
    assert pred["keypoints"].shape == (1, 128, 2)
    assert pred["descriptors"].shape == (1, 128, 128)
    valid = np.asarray(pred["keypoint_valid"][0])
    assert valid.any()
    d = np.asarray(pred["descriptors"][0])[valid]
    # RootSIFT output is L2-normalized
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
