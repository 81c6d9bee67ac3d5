"""ZEB native-layout dataset (per-pair txt files with inline calib + pose,
reference `gluefactory/datasets/zeb.py:24-162`) + the eval pipeline on a
synthetic fixture."""

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_zeb(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "zeb"
    rng = np.random.RandomState(0)
    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    K = np.array([[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32)
    Kf = " ".join(f"{v:.1f}" for v in K.reshape(-1))
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.1, 0.0, 0.02], np.float32)
    pose = " ".join(f"{v:.4f}" for v in R.reshape(-1)) + " " + " ".join(
        f"{v:.4f}" for v in t)
    for scene, ovs in (("mountain", (0.6, 0.5)), ("night", (0.15, 0.1))):
        d = root / scene
        d.mkdir(parents=True)
        img = (generate_synthetic_image(rng, 160, 120) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "seq1_a.png"), img)
        cv2.imwrite(str(d / "seq1_b.png"), np.roll(img, 4, axis=1))
        (d / "seq1_a-b.txt").write_text(
            f"a.png b.png {ovs[0]} {ovs[1]} {Kf} {Kf} {pose}\n")
    return root


def test_zeb_dataset_parses(fake_zeb):
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("zeb")(
        {"root": str(fake_zeb), "preprocessing": {"resize": 128}})
    data = ds.get_dataset("test")[0]
    assert data["name"].startswith("mountain/")
    assert data["view0"]["image"].shape[-1] in (3, 1)  # HWC float
    assert data["T_0to1"].matrix().shape == (4, 4)
    # translation survived the parse
    np.testing.assert_allclose(
        np.asarray(data["T_0to1"].t), [0.1, 0.0, 0.02], atol=1e-4)
    assert 0.49 < float(data["overlap_0to1"]) < 0.51
    # intrinsics are rescaled to the preprocessed resolution
    f = np.asarray(data["view0"]["camera"].f)
    assert 90.0 < f[0] < 120.0  # 160 -> 128 px: f scales by 0.8


def test_zeb_overlap_filter_and_caps(fake_zeb):
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("zeb")(
        {"root": str(fake_zeb), "min_overlap": 0.3,
         "preprocessing": {"resize": 128}})
    names = [p.parent.name for p in ds.items]
    assert names == ["mountain"]  # the 0.1-overlap night pair is dropped

    ds = get_dataset("zeb")(
        {"root": str(fake_zeb), "exclude_scenes": ["night"],
         "preprocessing": {"resize": 128}})
    assert [p.parent.name for p in ds.items] == ["mountain"]

    ds = get_dataset("zeb")(
        {"root": str(fake_zeb), "max_per_scene": 1,
         "preprocessing": {"resize": 128}})
    assert len(ds.items) == 2  # one per scene


def test_zeb_eval_pipeline(fake_zeb, tmp_path, monkeypatch):
    import gluefactory_tpu.datasets.zeb as zeb_data
    import gluefactory_tpu.settings as settings

    monkeypatch.setattr(settings, "DATA_PATH", fake_zeb.parent)
    monkeypatch.setattr(zeb_data, "DATA_PATH", fake_zeb.parent)

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.zeb import ZEBPipeline

    conf = Config.merge(
        Config(ZEBPipeline.default_conf),
        {
            "model": {
                "name": "two_view_pipeline",
                "extractor": {"name": "sift", "max_num_keypoints": 128},
                "matcher": {"name": "nearest_neighbor", "ratio_thresh": 0.95},
            },
            "data": {"preprocessing": {"resize": 128, "square_pad": True}},
            "eval": {"ransac_th": 2.0},
        },
    )
    s, f, r = ZEBPipeline(conf).run(tmp_path / "zeb_eval")
    # per-subset mAA breakdown over the two scenes + the pooled AUC
    assert "mAA_mountain" in s and "mAA_night" in s
    assert "mAA_mean_subsets" in s
    assert np.isfinite(s["mAA_mean_subsets"])
