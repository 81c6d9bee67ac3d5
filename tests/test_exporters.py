"""Feature-cache export + cached-feature training path: the image-list
export core writes depth-sampled caches, and HomographyDataset's
load_features mode warps cached keypoints through sampled homographies
(reference `scripts/export_megadepth.py`, `datasets/homographies.py:460-530`)."""

import h5py
import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("corpus")
    (root / "img").mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        cv2.rectangle(img, (30, 20), (90, 70), (255, 255, 255), 2)
        cv2.imwrite(str(root / "img" / f"im{i}.png"), img)
        np.savez(
            root / "img" / f"im{i}_depth.npz",
            depth=np.full((96, 128), 2.0, np.float32),
            mask=np.ones((96, 128), bool),
        )
    return root


def test_run_image_export_with_depth(corpus, tmp_path):
    from gluefactory_tpu.scripts.export_local_features import run_image_export

    items = [
        (f"scene/im{i}", corpus / "img" / f"im{i}.png", corpus / "img" / f"im{i}_depth.npz")
        for i in range(2)
    ]
    conf = {
        "name": "superpoint",
        "max_num_keypoints": 64,
        "detection_threshold": 0.0,
        "channels": [8, 8, 16],
    }
    out = tmp_path / "feats.h5"
    n = run_image_export(items, conf, out, resize=128, with_depth=True)
    assert n == 2
    with h5py.File(str(out), "r") as f:
        rec = f["scene/im0"]
        assert rec["keypoints"].shape[-1] == 2
        assert "depth_keypoints" in rec
        d = rec["depth_keypoints"].__array__()
        v = rec["valid_depth_keypoints"].__array__()
        kv = rec["keypoint_valid"].__array__()
        assert np.allclose(d[v & kv], 2.0)


def test_homography_cached_features(corpus, tmp_path, monkeypatch):
    import gluefactory_tpu.datasets.homographies as hmod

    # feature cache keyed by file name, with a grid of well-spread keypoints
    cache = tmp_path / "cache.h5"
    rng = np.random.RandomState(1)
    with h5py.File(str(cache), "w") as f:
        for i in range(2):
            xs, ys = np.meshgrid(np.arange(8, 128, 16), np.arange(8, 96, 16))
            kpts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
            g = f.create_group(f"im{i}.png")
            g.create_dataset("keypoints", data=kpts)
            g.create_dataset("keypoint_scores", data=rng.rand(len(kpts)).astype(np.float32))
            g.create_dataset("descriptors", data=rng.randn(len(kpts), 16).astype(np.float32))

    monkeypatch.setattr(hmod, "DATA_PATH", corpus)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("homographies")(
        {
            "data_dir": ".",
            "image_dir": "img",
            "train_size": 2,
            "val_size": 0,
            "homography": {"difficulty": 0.5, "patch_shape": [96, 72],
                           "translation": 1.0, "max_angle": 30},
            "photometric": {"name": "identity"},
            "load_features": {"do": True, "path": str(cache),
                              "max_num_keypoints": 32, "thresh": -1.0},
            "num_workers": 0,
            "batch_size": 1,
        }
    )
    sample = ds.get_dataset("train")[0]
    for v in ("view0", "view1"):
        c = sample[v]["cache"]
        assert c["keypoints"].shape == (32, 2)
        assert c["descriptors"].shape == (32, 16)
        valid = c["keypoint_valid"]
        assert valid.any()
        kp = c["keypoints"][valid]
        assert (kp[:, 0] <= 95).all() and (kp[:, 1] <= 71).all()
        assert (kp >= 0).all()
