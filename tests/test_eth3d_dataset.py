"""ETH3D COLMAP-layout reader on a synthetic mini scene (reference
`gluefactory/datasets/eth3d.py:64-255` layout: undistorted DSLR release)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def eth3d_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("eth3d") / "ETH3D_undistorted"
    scene = root / "courtyard"
    img_dir = scene / "images" / "dslr_images_undistorted"
    calib = scene / "dslr_calibration_undistorted"
    depth_dir = scene / "ground_truth_depth" / "undistorted_depth"
    for d in (img_dir, calib, depth_dir):
        d.mkdir(parents=True)

    W, H = 128, 96
    rng = np.random.RandomState(0)
    (calib / "cameras.txt").write_text(
        "# Camera list\n# fmt\n# n=1\n" f"1 PINHOLE {W} {H} 100 100 {W/2} {H/2}\n"
    )
    lines = ["# Image list", "# fmt", "# stats", "# more"]
    # 3 images; 0-1 share 60 points, 0-2 share only 5
    pts_a = range(100, 160)
    pts_b = range(200, 205)
    obs = {
        0: list(pts_a) + list(pts_b),
        1: list(pts_a),
        2: list(pts_b),
    }
    for i in range(3):
        name = f"DSC_{i:04d}.JPG"
        lines.append(f"{i+1} 1 0 0 0 {0.1*i} 0 0 1 images/{name}")
        lines.append(
            " ".join(f"{rng.rand()*W:.1f} {rng.rand()*H:.1f} {p}" for p in obs[i])
        )
        # the release stores images at the calibration resolution; the
        # dataset downsizes both image and intrinsics by downsize_factor
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / name), img)
        depth16 = (np.full((H // 8, W // 8), 3.0) * 256).astype(np.uint16)
        cv2.imwrite(str(depth_dir / f"DSC_{i:04d}.png"), depth16)
    (calib / "images.txt").write_text("\n".join(lines) + "\n")
    return root.parent


def test_eth3d_pairs_and_loading(eth3d_root, monkeypatch):
    import gluefactory_tpu.datasets.eth3d as mod

    monkeypatch.setattr(mod, "DATA_PATH", eth3d_root)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("eth3d")(
        {
            "min_covisibility": 50,
            "downsize_factor": 8,
            "batch_size": 1,
            "num_workers": 0,
        }
    )
    split = ds.get_dataset("test")
    # only the (0, 1) pair clears min_covisibility=50
    assert len(split) == 1
    sample = split[0]
    assert sample["n_covisible_points"] == 60
    img = sample["view0"]["image"]
    # 8x downsize of the calibration-resolution image (square padded)
    assert max(img.shape[:2]) == 128 // 8
    assert sample["view0"]["depth"].shape == img.shape[:2]
    d = sample["view0"]["depth"]
    assert np.allclose(d[d > 0], 3.0, atol=1e-2)
    # intrinsics scaled along with the image
    f = np.asarray(sample["view0"]["camera"].f)
    np.testing.assert_allclose(f, [12.5, 12.5], rtol=1e-5)
    assert np.isfinite(np.asarray(sample["T_0to1"].matrix())).all()


def test_eth3d_low_covis_threshold(eth3d_root, monkeypatch):
    import gluefactory_tpu.datasets.eth3d as mod

    monkeypatch.setattr(mod, "DATA_PATH", eth3d_root)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("eth3d")(
        {"min_covisibility": 3, "downsize_factor": 8, "num_workers": 0}
    )
    # (0,1) share 60 ids, (0,2) share 5, (1,2) share none
    assert len(ds.get_dataset("test")) == 2
