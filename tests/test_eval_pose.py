"""MegaDepth-1500-style pose eval on an analytic two-view fixture:
two views of a textured plane with exact GT pose + depth maps.
"""

import cv2
import numpy as np
import pytest


W, H = 320, 240
K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1]], np.float64)
D_PLANE = 2.0


D_FG = 1.3  # a second, closer plane breaks the 8-point planar degeneracy


def make_pose():
    angle = 0.05
    R, _ = cv2.Rodrigues(np.array([0.02, angle, 0.01]))
    t = np.array([0.15, 0.02, 0.05])
    return R, t


def plane_homography(R, t, d=D_PLANE):
    # for X1 = R X0 + t and plane n^T X0 = d: H = K (R + t n^T / d) K^-1
    n = np.array([0.0, 0.0, 1.0])
    Hm = K @ (R + np.outer(t, n) / d) @ np.linalg.inv(K)
    return Hm / Hm[2, 2]


def depth_map_view1(R, t, d=D_PLANE):
    n1 = R @ np.array([0.0, 0.0, 1.0])
    d1 = d + n1 @ t
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
    denom = rays @ n1
    return (d1 / np.maximum(denom, 1e-6)).astype(np.float32)


def fg_mask0():
    m = np.zeros((H, W), np.float32)
    m[50:170, 60:200] = 1.0
    return m


def render_two_plane_pair(img_bg, img_fg, R, t):
    """Composite scene: background plane at D_PLANE, foreground rectangle at
    D_FG — non-planar, so essential-matrix estimation is well-posed."""
    H_bg = plane_homography(R, t, D_PLANE)
    H_fg = plane_homography(R, t, D_FG)
    m0 = fg_mask0()
    img0 = np.where(m0[..., None] > 0.5, img_fg, img_bg)
    bg1 = cv2.warpPerspective(img_bg, H_bg, (W, H))
    fg1 = cv2.warpPerspective(img_fg, H_fg, (W, H))
    m1 = cv2.warpPerspective(m0, H_fg, (W, H))
    img1 = np.where(m1[..., None] > 0.5, fg1, bg1)
    depth0 = np.where(m0 > 0.5, D_FG, D_PLANE).astype(np.float32)
    d1_bg = depth_map_view1(R, t, D_PLANE)
    d1_fg = depth_map_view1(R, t, D_FG)
    depth1 = np.where(m1 > 0.5, d1_fg, d1_bg).astype(np.float32)
    return img0, img1, depth0, depth1


@pytest.fixture(scope="module")
def fake_posed(tmp_path_factory):
    import h5py

    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    root = tmp_path_factory.mktemp("data")
    d = root / "megadepth1500"
    (d / "images").mkdir(parents=True)
    (d / "depth").mkdir()
    rng = np.random.RandomState(1)
    R, t = make_pose()

    views_lines = []
    pairs_lines = []
    for p in range(3):
        img_bg = (generate_synthetic_image(rng, W, H) * 255).astype(np.uint8)
        img_fg = (generate_synthetic_image(rng, W, H) * 255).astype(np.uint8)
        img0, img1, depth0, depth1 = render_two_plane_pair(img_bg, img_fg, R, t)
        n0, n1 = f"p{p}_0.png", f"p{p}_1.png"
        cv2.imwrite(str(d / "images" / n0), img0)
        cv2.imwrite(str(d / "images" / n1), img1)
        with h5py.File(str(d / "depth" / f"p{p}_0.h5"), "w") as f:
            f.create_dataset("depth", data=depth0)
        with h5py.File(str(d / "depth" / f"p{p}_1.h5"), "w") as f:
            f.create_dataset("depth", data=depth1)
        # view0 at identity; view1 at (R, t) world->cam with world = cam0
        q0 = [1.0, 0, 0, 0]
        tv0 = [0.0, 0, 0]
        # R world->cam1 = R (since world=cam0); quaternion from R
        tr = np.trace(R)
        qw = np.sqrt(max(1 + tr, 1e-9)) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        views_lines.append(
            f"{n0} {W} {H} {fx} {fy} {cx} {cy} {q0[0]} {q0[1]} {q0[2]} {q0[3]} "
            f"{tv0[0]} {tv0[1]} {tv0[2]}"
        )
        views_lines.append(
            f"{n1} {W} {H} {fx} {fy} {cx} {cy} {qw} {qx} {qy} {qz} "
            f"{t[0]} {t[1]} {t[2]}"
        )
        pairs_lines.append(f"{n0} {n1}")
    (d / "views.txt").write_text("\n".join(views_lines))
    (d / "pairs.txt").write_text("\n".join(pairs_lines))
    return root


def test_megadepth1500_pipeline(fake_posed, tmp_path, monkeypatch):
    import gluefactory_tpu.datasets.posed_images as pi

    monkeypatch.setattr(pi, "DATA_PATH", fake_posed)

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.megadepth1500 import MegaDepth1500Pipeline

    conf = Config.merge(
        Config(MegaDepth1500Pipeline.default_conf),
        {
            "model": {
                "name": "two_view_pipeline",
                "extractor": {"name": "sift", "max_num_keypoints": 512},
                "matcher": {"name": "nearest_neighbor", "ratio_thresh": 0.95},
            },
            "data": {
                "preprocessing": {"resize": 240, "side": "long", "square_pad": True}
            },
            "eval": {"ransac_th": 2.0},
        },
    )
    pipeline = MegaDepth1500Pipeline(conf)
    out_dir = tmp_path / "md_eval"
    s, f, r = pipeline.run(out_dir)
    assert s["mnum_matches"] > 20, s
    assert s["mepi_prec@1e-3"] > 0.5, s
    # pose AUC@20° should be decent on these exact-geometry pairs
    assert s["rel_pose_error@20°"] > 0.3, s
    assert np.isfinite(s["rel_pose_error_mAA"]), s
