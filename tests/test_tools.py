"""Offline tool suite (tools/): corruption scan, h5/checkpoint inspectors,
frame extraction, homography-dataset builder, metrics-pair selection, map
stats, reprojection + specular inspectors.

Reference analogs: `tools/check_corrupted_images.py`, `inspect_h5.py`,
`inspect_pth.py`, `extract_frames_*.py`, `make_homographies_dataset_from_
frames.py`, `extract_val_pairs_from_metrics.py`, `get_map_sizes.py`,
`inspect_two_view_reprojection.py`, `inspect_specular_masks.py`.
"""

import cv2
import h5py
import numpy as np
import pytest

from tests.test_endomapper import _make_map


@pytest.fixture()
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(d / "good.png"), (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    cv2.imwrite(str(d / "black.png"), np.zeros((32, 32, 3), np.uint8))
    (d / "trunc.png").write_bytes(b"\x89PNG\r\n\x1a\n broken")
    return d


def test_check_images(image_dir, tmp_path, capsys):
    from tools.check_images import main

    q = tmp_path / "bad.txt"
    rc = main([str(image_dir), "--quarantine", str(q)])
    assert rc == 1
    out = capsys.readouterr().out
    assert "checked 3 images, 2 bad" in out
    bad = q.read_text().splitlines()
    assert set(bad) == {"black.png", "trunc.png"}


def test_check_images_npz_mode(tmp_path, capsys):
    from tools.check_images import main

    m = _make_map(np.random.RandomState(0))
    npz_dir = tmp_path / "maps"
    npz_dir.mkdir()
    np.savez(npz_dir / "seq0.npz", **m)
    frames = tmp_path / "frames"
    frames.mkdir()
    for name in m["image_names"]:
        cv2.imwrite(str(frames / str(name)),
                    np.full((24, 32, 3), 128, np.uint8))
    rc = main([str(npz_dir), "--npz", "--frames-root", str(frames)])
    assert rc == 0
    assert "6 images, 0 bad" in capsys.readouterr().out


def test_inspect_h5(tmp_path, capsys):
    from tools.inspect_h5 import main

    p = tmp_path / "f.h5"
    with h5py.File(p, "w") as f:
        g = f.create_group("pair0")
        g.create_dataset("keypoints0", data=np.random.rand(64, 2))
        g.create_dataset("scores", data=np.array([np.nan, 1.0]))
    assert main([str(p)]) == 0
    out = capsys.readouterr().out
    assert "keypoints0: shape=(64, 2)" in out
    assert "NONFINITE=1" in out


def test_inspect_checkpoint_summarize(capsys):
    from tools.inspect_checkpoint import summarize

    tree = {"params": {"extractor": {"w": np.zeros((4, 8))},
                       "matcher": {"b": np.zeros(16)}}}
    summarize(tree, full=True)
    out = capsys.readouterr().out
    assert "[extractor] 32 params" in out
    assert "total: 48 params" in out


def test_extract_frames_and_homography_builder(tmp_path, capsys):
    from tools.extract_frames import main as extract_main
    from tools.make_homographies_dataset_from_frames import main as make_main

    # synthetic video: moving textured pattern (sharp) + a few blurred frames
    video = tmp_path / "vid.avi"
    wr = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"MJPG"),
                         10, (64, 48))
    rng = np.random.RandomState(0)
    base = (rng.rand(48 * 2, 64 * 2, 3) * 255).astype(np.uint8)
    for i in range(20):
        frame = base[i:i + 48, i:i + 64]
        if i % 5 == 4:
            frame = cv2.GaussianBlur(frame, (15, 15), 8)
        wr.write(frame)
    wr.release()

    out_root = tmp_path / "frames"
    assert extract_main([str(video), str(out_root), "--every", "1",
                         "--min-sharpness", "50"]) == 0
    frames = sorted((out_root / "vid").glob("*.png"))
    assert 10 <= len(frames) <= 20  # blurred frames dropped

    ds_dir = tmp_path / "homog_ds"
    assert make_main([str(out_root), str(ds_dir), "--num", "8",
                      "--min-sharpness", "0", "--min-diff", "1"]) == 0
    names = (ds_dir / "image_list.txt").read_text().split()
    assert 1 < len(names) <= 8
    assert all((ds_dir / n).exists() for n in names)


def test_extract_val_pairs_from_metrics(tmp_path, capsys):
    from tools.extract_val_pairs_from_metrics import main

    tsv = tmp_path / "m.tsv"
    tsv.write_text(
        "step\tindex\tname\toverlap\tmatch_recall\n"
        "100\t0\tpair_a\t0.5\t0.90\n"
        "100\t1\tpair_b\t0.4\t0.10\n"
        "100\t2\tpair_c\t0.3\t0.50\n"
        "50\t0\tpair_old\t0.5\t0.01\n"
    )
    out = tmp_path / "pairs.txt"
    assert main([str(tsv), str(out), "--metric", "match_recall",
                 "--worst", "2"]) == 0
    assert out.read_text().split() == ["pair_b", "pair_c"]  # latest step only


def test_get_map_sizes(tmp_path, capsys):
    from tools.get_map_sizes import main

    npz_dir = tmp_path / "maps"
    npz_dir.mkdir()
    np.savez(npz_dir / "seq_a.npz", **_make_map(np.random.RandomState(0)))
    (tmp_path / "train.txt").write_text("seq_a\n")
    assert main([str(npz_dir), "--train-list", str(tmp_path / "train.txt")]) == 0
    out = capsys.readouterr().out
    assert "seq_a" in out and "images=   6" in out
    assert "total maps 1, total images 6" in out


def test_inspect_two_view_reprojection(tmp_path, capsys):
    from tools.inspect_two_view_reprojection import main

    p = tmp_path / "map.npz"
    np.savez(p, **_make_map(np.random.RandomState(0)))
    # consistent synthetic map: reprojection must be ~exact
    assert main([str(p), "--i", "0", "--j", "3"]) == 0
    out = capsys.readouterr().out
    assert "shared tracks" in out and "all pairs consistent" in out

    # corrupt the pose of image 3 -> the same pair must be flagged
    m = dict(np.load(p, allow_pickle=True))
    m["poses"] = m["poses"].copy()
    m["poses"][3][:3, 3] += 0.5
    np.savez(p, **m)
    assert main([str(p), "--i", "0", "--j", "3"]) == 1


def test_inspect_specular_masks(tmp_path, capsys):
    from tools.inspect_specular_masks import main

    d = tmp_path / "frames"
    d.mkdir()
    img = np.full((64, 64, 3), 60, np.uint8)
    img[10:20, 10:20] = 255  # specular blob
    cv2.imwrite(str(d / "spec.png"), img)
    overlays = tmp_path / "ov"
    assert main([str(d), "--save-overlays", str(overlays)]) == 0
    out = capsys.readouterr().out
    assert "spec.png: specular" in out
    assert (overlays / "spec.png").exists()


def test_inspect_pair(tmp_path, capsys):
    from tools.inspect_pair import main

    rng = np.random.RandomState(0)
    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    img = (generate_synthetic_image(rng, 96, 96) * 255).astype(np.uint8)
    p0, p1 = tmp_path / "a.png", tmp_path / "b.png"
    cv2.imwrite(str(p0), img)
    cv2.imwrite(str(p1), np.roll(img, 5, axis=1))
    conf = tmp_path / "model.yaml"
    conf.write_text(
        "model:\n"
        "  name: two_view_pipeline\n"
        "  extractor:\n"
        "    name: sift\n"
        "    max_num_keypoints: 64\n"
        "  matcher:\n"
        "    name: nearest_neighbor\n"
        "    ratio_thresh: 0.95\n"
    )
    out = tmp_path / "fig.png"
    assert main([str(p0), str(p1), "--conf", str(conf), "--out", str(out),
                 "--resize", "96"]) == 0
    assert out.exists()
    assert "matches:" in capsys.readouterr().out
