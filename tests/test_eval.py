"""End-to-end eval pipeline test on a synthetic HPatches-format fixture
(the reference pattern: fake on-disk data, real pipeline — SURVEY.md §4).
"""

import os

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_hpatches(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    seq_dir = root / "hpatches-sequences-release"
    rng = np.random.RandomState(0)
    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    for s in ("v_fake1", "i_fake2"):
        d = seq_dir / s
        d.mkdir(parents=True)
        img = (generate_synthetic_image(rng, 320, 240) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "1.ppm"), img)
        for i in range(2, 7):
            # mild affine-ish homography
            H = np.array(
                [
                    [1.0 + 0.02 * i, 0.01 * i, 3.0 * i],
                    [-0.01 * i, 1.0 - 0.01 * i, -2.0 * i],
                    [1e-5 * i, -1e-5 * i, 1.0],
                ],
                np.float64,
            )
            warped = cv2.warpPerspective(img, H, (320, 240))
            cv2.imwrite(str(d / f"{i}.ppm"), warped)
            np.savetxt(str(d / f"H_1_{i}"), H)
    return root


def test_hpatches_eval_pipeline(fake_hpatches, tmp_path, monkeypatch):
    import gluefactory_tpu.settings as settings

    monkeypatch.setattr(settings, "DATA_PATH", fake_hpatches)
    # the dataset module imported DATA_PATH by value; patch there too
    import gluefactory_tpu.datasets.hpatches as hp_data

    monkeypatch.setattr(hp_data, "DATA_PATH", fake_hpatches)

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.hpatches import HPatchesPipeline

    conf = Config.merge(
        Config(HPatchesPipeline.default_conf),
        {
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "sift",
                    "max_num_keypoints": 256,
                },
                "matcher": {"name": "nearest_neighbor", "ratio_thresh": 0.95},
            },
            "data": {"preprocessing": {"resize": 240, "square_pad": True}},
            "eval": {"ransac_th": 2.0},
        },
    )
    pipeline = HPatchesPipeline(conf)
    out_dir = tmp_path / "hp_eval"
    s, f, r = pipeline.run(out_dir)
    assert "mprec@3px" in s
    assert "H_error_ransac@1px" in s
    assert (out_dir / "predictions.h5").exists()
    assert (out_dir / "summaries.json").exists()
    # SIFT + NN on synthetic warps of the same image: decent precision
    assert s["mnum_matches"] > 10
    assert s["mprec@3px"] > 0.5, s
    # RANSAC should solve most of these easy pairs
    assert s["H_error_ransac@5px"] > 0.3, s

    # second run without overwrite reuses the cache
    s2, _, _ = pipeline.run(out_dir)
    assert s2["mprec@3px"] == s["mprec@3px"]

    # fork parity: per-stage timing keys exported into the summaries
    # (reference `two_view_pipeline.py:360-404`, `eval/hpatches.py:30-43`)
    assert (out_dir / "timings.json").exists()
    for key in ("mextractor_time_ms", "mmatcher_time_ms", "mtotal_time_ms",
                "mpair_resolution"):
        assert key in s, sorted(s)
        assert np.isfinite(s[key]) and s[key] >= 0


def test_hpatches_eval_with_loftr(fake_hpatches, tmp_path, monkeypatch):
    """The dense LoFTR matcher flows through the same eval harness as the
    sparse pipelines (reference runs kornia_loftr through eval identically)."""
    import gluefactory_tpu.datasets.hpatches as hp_data
    import gluefactory_tpu.settings as settings

    monkeypatch.setattr(settings, "DATA_PATH", fake_hpatches)
    monkeypatch.setattr(hp_data, "DATA_PATH", fake_hpatches)

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.hpatches import HPatchesPipeline

    conf = Config.merge(
        Config(HPatchesPipeline.default_conf),
        {
            "model": {
                # extractor-less pipeline: the dense matcher consumes the
                # raw views (reference io.load_model always wraps the model
                # conf in two_view_pipeline, eval/io.py:88-92)
                "name": "two_view_pipeline",
                "matcher": {
                    "name": "matchers.loftr",
                    "backbone_dims": [8, 12, 16],
                    "coarse_dim": 32,
                    "fine_dim": 16,
                    "n_layers": 1,
                    "heads": 4,
                    "max_num_matches": 64,
                    "conf_threshold": 0.0,  # random init: keep mutual-NNs
                },
            },
            "data": {"preprocessing": {"resize": 240, "square_pad": True}},
            "eval": {"ransac_th": 2.0},
        },
    )
    s, f, r = HPatchesPipeline(conf).run(tmp_path / "hp_loftr")
    # random-init model: no quality floor, but the full pipeline (dense
    # matches -> export -> de-scale -> RANSAC -> summaries) must run
    assert "mprec@3px" in s and "H_error_ransac@1px" in s
    assert np.isfinite(s["mnum_matches"])


def test_load_model_from_checkpoint_with_placeholder_conf(tmp_path):
    """Eval default confs ship `model: {name: None, checkpoint: <exp>}`
    placeholders; loading a trained experiment through them must use the
    STORED model name and drop the routing keys (regression: the None name
    used to clobber the checkpoint's conf, r5)."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.io import load_model
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.utils.experiments import save_experiment

    conf = Config({
        "model": {
            "name": "nearest_neighbor",
            "ratio_thresh": 0.9,
            "mutual_check": True,
        }
    })
    model = get_model("nearest_neighbor").from_conf(conf["model"])
    rng = np.random.RandomState(0)
    data = {
        "descriptors0": jnp.asarray(rng.randn(1, 16, 8), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(1, 16, 8), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    exp_dir = tmp_path / "exp"
    save_experiment(
        exp_dir, {"params": jax.device_get(variables)}, conf=conf, step=1,
        cur_eval=1.0,
    )

    # (the real eval confs also carry ground_truth.name None, which only
    # applies to pipeline models — exercised by the CLI smoke runs)
    placeholder = Config(
        {"name": None, "checkpoint": str(exp_dir / "checkpoint_best")})
    loaded, lvars = load_model(
        placeholder, str(exp_dir / "checkpoint_best"))
    assert type(loaded).__name__ == "NearestNeighborMatcher"
    pred = loaded.apply(lvars, data, train=False)
    assert pred["matches0"].shape == (1, 16)
