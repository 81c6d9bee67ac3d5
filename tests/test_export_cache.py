"""Feature-cache roundtrip: export_predictions -> CacheLoader -> pipeline
cache bypass (the reference's training-time caching path, SURVEY.md §3.5)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_export_then_cache_load(tmp_path, monkeypatch):
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.models.cache_loader import CacheLoader
    from gluefactory_tpu.utils.export_predictions import export_predictions
    import gluefactory_tpu.models.cache_loader as cl

    monkeypatch.setattr(cl, "DATA_PATH", tmp_path)

    sp = get_model("superpoint").from_conf(
        {"max_num_keypoints": 32, "detection_threshold": 0.0, "channels": [4, 8]}
    )
    rng = np.random.RandomState(0)
    img = rng.rand(2, 48, 64, 1).astype(np.float32)
    params = sp.init(jax.random.PRNGKey(0), {"image": jnp.asarray(img)})
    fwd = jax.jit(lambda d: sp.apply(params, d))

    # fake loader: one batch of two named items with scales bookkeeping
    batch = {
        "image": img,
        "name": ["a.png", "b.png"],
        "scales": np.full((2, 2), 2.0, np.float32),
    }

    def apply_fn(data):
        return fwd({"image": jnp.asarray(data["image"])})

    out_file = tmp_path / "exports" / "feats.h5"

    class OneBatchLoader(list):
        pass

    export_predictions(
        [batch],
        apply_fn,
        out_file,
        keys=["keypoints", "keypoint_scores", "descriptors"],
        optional_keys=["keypoint_valid"],
    )
    assert out_file.exists()

    loader = CacheLoader(
        {
            "path": "exports/feats.h5",
            "data_keys": ["keypoints", "keypoint_scores", "descriptors"],
            "padding_length": 32,
        }
    )
    # request with the same scales: keypoints come back in resized coords
    feats = loader({"name": "a.png", "scales": np.full(2, 2.0, np.float32)})
    assert feats["keypoints"].shape == (32, 2)
    assert feats["descriptors"].shape[0] == 32
    assert feats["keypoint_valid"].any()

    # roundtrip: export de-scaled by 2, loader re-scaled by 2 -> original
    direct = np.asarray(fwd({"image": jnp.asarray(img)})["keypoints"][0])
    order_scores = np.asarray(
        fwd({"image": jnp.asarray(img)})["keypoint_scores"][0]
    )
    got = feats["keypoints"][: len(direct)]
    # compare the top valid keypoints (cache is score-ordered like the pred)
    valid = order_scores > 0
    np.testing.assert_allclose(got[valid], direct[valid], atol=1e-3)
