"""Width-pair packed SuperPoint scales (w2d_levels): exact equivalence with
the standard path, shared checkpoints, odd-size fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model

BASE = {
    "max_num_keypoints": 32,
    "detection_threshold": 0.0,
    "channels": [8, 8, 16],
    "norm": "none",
}


def _img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return {"image": jnp.asarray(rng.rand(2, h, w, 1), jnp.float32)}


@pytest.mark.parametrize("levels", [1, 2])
def test_w2d_matches_standard(levels):
    data = _img(64, 96)
    m0 = get_model("superpoint").from_conf(BASE)
    v = m0.init(jax.random.PRNGKey(0), data, train=False)
    ref = m0.apply(v, data, train=False)
    m1 = get_model("superpoint").from_conf({**BASE, "w2d_levels": levels})
    out = m1.apply(v, data, train=False)  # same param tree by construction
    np.testing.assert_allclose(
        np.asarray(out["keypoints"]), np.asarray(ref["keypoints"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["keypoint_scores"]),
        np.asarray(ref["keypoint_scores"]), atol=2e-6,
    )


def test_w2d_affine_norm():
    data = _img(64, 96, seed=3)
    conf = {**BASE, "norm": "affine"}
    m0 = get_model("superpoint").from_conf(conf)
    v = m0.init(jax.random.PRNGKey(1), data, train=False)
    # give the affine params non-trivial values
    v = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.ndim == 1 else a, v,
    )
    ref = m0.apply(v, data, train=False)
    m1 = get_model("superpoint").from_conf({**conf, "w2d_levels": 2})
    out = m1.apply(v, data, train=False)
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]),
        atol=2e-5,
    )


def test_w2d_odd_width_fallback():
    """Odd feature-map widths evaluate the standard path with w2d params."""
    data = _img(60, 90)  # 90 -> 45 odd at level 1
    m0 = get_model("superpoint").from_conf(BASE)
    v = m0.init(jax.random.PRNGKey(0), data, train=False)
    ref = m0.apply(v, data, train=False)
    m1 = get_model("superpoint").from_conf({**BASE, "w2d_levels": 2})
    out = m1.apply(v, data, train=False)
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]),
        atol=2e-5,
    )


def test_w2d_s2d_exclusive():
    try:
        get_model("superpoint").from_conf(
            {**BASE, "w2d_levels": 1, "s2d_levels": 1}
        ).init(jax.random.PRNGKey(0), _img(64, 96), train=False)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_w2d_three_levels_deep_channels():
    """Flagship-shaped: 4 conv levels, w2d chain through all 3 pooled ones."""
    conf = {**BASE, "channels": [8, 8, 16, 16, 32]}
    data = _img(64, 96, seed=7)
    m0 = get_model("superpoint").from_conf(conf)
    v = m0.init(jax.random.PRNGKey(2), data, train=False)
    ref = m0.apply(v, data, train=False)
    m1 = get_model("superpoint").from_conf({**conf, "w2d_levels": 3})
    out = m1.apply(v, data, train=False)
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), np.asarray(ref["descriptors"]),
        atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out["keypoints"]), np.asarray(ref["keypoints"])
    )


def test_w2d_bf16_close():
    """bf16 packed path vs bf16 direct: same taps per output, only conv
    reassociation differs — descriptors should agree to bf16 rounding."""
    data = _img(64, 96, seed=9)
    conf = {**BASE, "dtype": "bfloat16"}
    m0 = get_model("superpoint").from_conf(conf)
    v = m0.init(jax.random.PRNGKey(0), data, train=False)
    ref = m0.apply(v, data, train=False)
    m1 = get_model("superpoint").from_conf({**conf, "w2d_levels": 2})
    out = m1.apply(v, data, train=False)
    # descriptors are L2-normalized f32 at the end; bf16 conv chains drift
    # by a few ulps -> compare loosely but meaningfully
    d_ref = np.asarray(ref["descriptors"], np.float32)
    d_out = np.asarray(out["descriptors"], np.float32)
    assert np.median(np.abs(d_ref - d_out)) < 2e-3
