"""End-to-end Endomapper dense stack on a synthetic on-disk fixture:
COLMAP txt + images + masked depth npz -> preprocess_endomapper_dense ->
EndomapperDense loader (validity, depth scale, speculars, rotation aug) ->
preprocess_endomapper_romaGT -> EndomapperRoma warps
(reference `tools/preprocess_endomapper_dense.py`, `_romaGT.py`,
`datasets/endomapper_dense.py`)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

W, H = 64, 48
N = 5
F = 60.0


def _write_colmap_scene(root: Path, rng):
    seq = root / "Seq_001" / "0"
    seq.mkdir(parents=True)
    (root / "images" / "Seq_001" / "0").mkdir(parents=True)
    (root / "depth" / "Seq_001" / "0").mkdir(parents=True)

    # cameras.txt: PINHOLE fx fy cx cy
    (seq / "cameras.txt").write_text(
        f"# cameras\n1 PINHOLE {W} {H} {F} {F} {W/2} {H/2}\n"
    )

    # scene: plane of 3D points; dense depth = true scene scaled by 1/2
    # (the preprocessor must recover depth_scale ~= 2.0)
    pts = rng.rand(60, 3) * [1.2, 0.9, 0.4] + [-0.6, -0.45, 2.0]
    img_lines = []
    import cv2

    poses = []
    for i in range(N):
        t = np.array([0.05 * i, 0.0, 0.0])
        R = np.eye(3)
        poses.append((R, t))
        pc = pts @ R.T + t
        uv = pc[:, :2] / pc[:, 2:] * F + [W / 2, H / 2]
        inb = (
            (uv[:, 0] > 1) & (uv[:, 0] < W - 2) & (uv[:, 1] > 1) & (uv[:, 1] < H - 2)
        )
        obs = " ".join(
            f"{uv[j,0]:.2f} {uv[j,1]:.2f} {j}" for j in range(len(pts)) if inb[j]
        )
        img_lines.append(f"{i+1} 1 0 0 0 {t[0]} {t[1]} {t[2]} 1 frame_{i:03d}.png")
        img_lines.append(obs)

        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / "Seq_001" / "0" / f"frame_{i:03d}.png"), img)
        # dense depth: constant plane-ish field at HALF the true depth
        zmap = np.full((H, W), float(np.median(pc[:, 2])) / 2.0, np.float32)
        mask = np.ones((H, W), bool)
        mask[:4] = False  # some invalid rows
        np.savez(
            root / "depth" / "Seq_001" / "0" / f"frame_{i:03d}_ttr.npz",
            depth=zmap,
            mask=mask,
        )
    (seq / "images.txt").write_text("# images\n" + "\n".join(img_lines) + "\n")
    pts_lines = [
        f"{j} {pts[j,0]} {pts[j,1]} {pts[j,2]} 128 128 128 0.5 0 0"
        for j in range(len(pts))
    ]
    (seq / "points3D.txt").write_text("# points\n" + "\n".join(pts_lines) + "\n")


@pytest.fixture(scope="module")
def dense_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("endo_dense")
    rng = np.random.RandomState(0)
    _write_colmap_scene(root, rng)
    tool = Path(__file__).parent.parent / "tools" / "preprocess_endomapper_dense.py"
    res = subprocess.run(
        [
            sys.executable,
            str(tool),
            "--root",
            str(root),
            "--image-subpath",
            "images",
            "--depth-subpath",
            "depth",
            "--out",
            str(root / "maps"),
        ],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr + res.stdout
    return root


def test_preprocessor_output(dense_root):
    npz = dict(np.load(dense_root / "maps" / "Seq_001_0.npz", allow_pickle=True))
    assert len(npz["image_names"]) == N
    assert npz["poses"].shape == (N, 4, 4)
    ov = npz["overlap_matrix"]
    assert ov.shape == (N, N) and ov.max() <= 1.0 and (ov > 0.5).any()
    # dense depth was half the COLMAP depth -> scale ~2
    np.testing.assert_allclose(npz["depth_scale"], 2.0, rtol=0.15)


def test_endomapper_dense_loader(dense_root, monkeypatch):
    import gluefactory_tpu.datasets.endomapper as em
    import gluefactory_tpu.datasets.endomapper_dense as emd

    monkeypatch.setattr(em, "DATA_PATH", dense_root)
    monkeypatch.setattr(emd, "DATA_PATH", dense_root)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("endomapper_dense")(
        {
            "data_dir": "maps",
            "images_dir": ".",
            "num_per_map": 6,
            "min_overlap": 0.2,
            "batch_size": 2,
            "num_workers": 0,
            "min_images_per_map": 2,
            "preprocessing": {"resize": 48, "side": "long", "square_pad": True},
        }
    )
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    img = batch["view0"]["image"]
    assert img.shape[0] == 2 and img.shape[-1] == 3
    depth = batch["view0"]["depth"]
    assert depth.shape[1:] == img.shape[1:3]
    # applied depth_scale: loaded depth should be ~ true scene depth (~2.2)
    d = np.asarray(depth)
    assert 1.5 < np.median(d[d > 0]) < 3.0
    assert "specular_mask" in batch["view0"]
    assert np.isfinite(np.asarray(batch["T_0to1"].matrix())).all()


def test_endomapper_dense_rotation(dense_root, monkeypatch):
    import gluefactory_tpu.datasets.endomapper as em
    import gluefactory_tpu.datasets.endomapper_dense as emd

    monkeypatch.setattr(em, "DATA_PATH", dense_root)
    monkeypatch.setattr(emd, "DATA_PATH", dense_root)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("endomapper_dense")(
        {
            "data_dir": "maps",
            "images_dir": ".",
            "num_per_map": 4,
            "min_overlap": 0.2,
            "batch_size": 1,
            "num_workers": 0,
            "min_images_per_map": 2,
            "p_rotate": 1.0,
            "preprocessing": {"resize": 48, "side": "long", "square_pad": True},
        }
    )
    sample = ds.get_dataset("train")[0]
    # rotated images swap w/h before resize; pipeline must stay consistent
    assert sample["view0"]["image"].ndim == 3
    assert np.isfinite(np.asarray(sample["T_0to1"].matrix())).all()


def test_roma_warp_cache_and_loader(dense_root, monkeypatch):
    tool = Path(__file__).parent.parent / "tools" / "preprocess_endomapper_romaGT.py"
    res = subprocess.run(
        [
            sys.executable,
            str(tool),
            "--root",
            str(dense_root),
            "--maps-dir",
            "maps",
            "--images-dir",
            ".",
            "--warps-dir",
            "roma_warps",
            "--min-overlap",
            "0.2",
        ],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr + res.stdout

    caches = list((dense_root / "roma_warps" / "Seq_001_0").glob("*.npz"))
    assert caches
    c = np.load(caches[0])
    assert c["warp_0to1"].shape == (H, W, 2)
    assert c["certainty_0to1"].shape == (H, W)
    # identity-rotation translating camera: warp is a small x-shift where
    # certain
    cert = c["certainty_0to1"] > 0.5
    assert cert.mean() > 0.3
    dx = c["warp_0to1"][..., 0] - np.arange(W)[None, :]
    assert np.all(np.abs(dx[cert]) < W)

    import gluefactory_tpu.datasets.endomapper as em
    import gluefactory_tpu.datasets.endomapper_dense as emd
    import gluefactory_tpu.datasets.endomapper_roma as emr

    monkeypatch.setattr(em, "DATA_PATH", dense_root)
    monkeypatch.setattr(emd, "DATA_PATH", dense_root)
    monkeypatch.setattr(emr, "DATA_PATH", dense_root)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("endomapper_roma")(
        {
            "data_dir": "maps",
            "images_dir": ".",
            "warps_dir": "roma_warps",
            "num_per_map": 6,
            "min_overlap": 0.2,
            "batch_size": 1,
            "num_workers": 0,
            "min_images_per_map": 2,
            "preprocessing": {"resize": 48, "side": "long", "square_pad": True},
        }
    )
    sample = ds.get_dataset("train")[0]
    assert sample["roma_warp_0to1"].shape[-1] == 2
    assert "roma_certainty_0to1" in sample
