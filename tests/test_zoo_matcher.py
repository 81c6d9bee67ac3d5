"""Zoo-matcher adapter (the IMCUI-wrapper equivalent,
`gluefactory_nonfree/imcui.py:25-126`): one `zoo_name` key selects an
end-to-end pipeline; outputs follow the IMCUI contract (aligned matched
keypoints, arange matches, confidence top-K)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.matchers.zoo import ZOO


def _pair(h=64, w=80):
    rng = np.random.RandomState(0)
    img = rng.rand(1, h, w, 1).astype(np.float32)
    return {
        "view0": {"image": jnp.asarray(img)},
        "view1": {"image": jnp.asarray(np.roll(img, 3, axis=2))},
    }


def test_unknown_zoo_name_raises():
    model = get_model("matchers.zoo").from_conf({"zoo_name": "nope"})
    with pytest.raises(ValueError, match="not in the zoo"):
        model.init(jax.random.PRNGKey(0), _pair(), train=False)


def test_sparse_zoo_entry_contract():
    model = get_model("matchers.zoo").from_conf(
        {
            "zoo_name": "superpoint+lightglue",
            "max_num_matches": 64,
            # shrink for the test
            "custom": {
                "extractor": {
                    "max_num_keypoints": 128,
                    "detection_threshold": 0.0,
                    "channels": [8, 8, 16, 16, 32],
                    "descriptor_dim": 32,
                },
                "matcher": {
                    "n_layers": 2,
                    "descriptor_dim": 32,
                    "input_dim": 32,
                    "num_heads": 2,
                    "filter_threshold": 0.0,
                },
            },
        }
    )
    data = _pair()
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = jax.jit(lambda v, d: model.apply(v, d, train=False))(variables, data)
    K = 64
    assert out["keypoints0"].shape == (1, K, 2)
    assert out["keypoints1"].shape == (1, K, 2)
    m = np.asarray(out["matches0"][0])
    v = np.asarray(out["keypoint_valid0"][0])
    # IMCUI contract: aligned pairs, matches are arange where valid, -1 pads
    np.testing.assert_array_equal(m[v], np.arange(K)[v])
    assert np.all(m[~v] == -1)
    s = np.asarray(out["matching_scores0"][0])
    assert np.all(s[~v] == 0)
    # confidence-sorted descending among valid entries
    if v.sum() > 1:
        sv = s[v]
        assert np.all(np.diff(sv) <= 1e-6)


def test_dense_zoo_entry_loftr():
    model = get_model("matchers.zoo").from_conf(
        {
            "zoo_name": "loftr",
            "max_num_matches": 32,
            "custom": {
                "coarse_dim": 32,
                "fine_dim": 16,
                "backbone_dims": [8, 12, 16],
                "n_layers": 1,
                "heads": 2,
                "max_num_matches": 64,
                "conf_threshold": 0.0,
            },
        }
    )
    data = _pair()
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(variables, data, train=False)
    assert out["keypoints0"].shape == (1, 32, 2)
    assert out["matches0"].shape == (1, 32)


def test_zoo_names_resolve():
    """Every zoo entry names a registered model."""
    for name, conf in ZOO.items():
        get_model(conf["name"])  # raises if unknown
