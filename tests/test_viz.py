"""Smoke tests for the visualization layer (Agg backend)."""

import numpy as np


def test_gt_figures_and_match_figures():
    rng = np.random.RandomState(0)
    B, N = 1, 24
    data = {
        "view0": {"image": rng.rand(B, 48, 64, 3).astype(np.float32)},
        "view1": {"image": rng.rand(B, 48, 64, 3).astype(np.float32)},
    }
    gt0 = np.concatenate([np.arange(12), np.full(8, -1), np.full(4, -2)])
    pred = {
        "keypoints0": rng.rand(B, N, 2) * [64, 48],
        "keypoints1": rng.rand(B, N, 2) * [64, 48],
        "matches0": np.where(rng.rand(B, N) > 0.5, np.arange(N)[None], -1),
        "gt_matches0": gt0[None],
        "gt_matches1": gt0[None],
        "gt_kp0_1": rng.rand(B, N, 2) * [64, 48],
        "keypoint_valid0": np.ones((B, N), bool),
    }
    from gluefactory_tpu.visualization.gt_visualize_matches import make_gt_figures
    from gluefactory_tpu.visualization.visualize_batch import make_match_figures

    figs = make_gt_figures(pred, data)
    assert "gt_labels_0" in figs and "gt_matches_0" in figs
    figs2 = make_match_figures(pred, data, n_pairs=1)
    assert "match_pair_0" in figs2
    import matplotlib.pyplot as plt

    plt.close("all")


def test_plot_cumulative_and_epipolar():
    import numpy as np

    from gluefactory_tpu.visualization.viz2d import (
        plot_cumulative,
        plot_epipolar_lines,
        plot_images,
    )

    fig = plot_cumulative({"run": np.random.rand(100) * 5}, [0, 5])
    rng = np.random.RandomState(0)
    fig2, axs = plot_images([rng.rand(32, 32), rng.rand(32, 32)])
    F = np.eye(3)
    plot_epipolar_lines(axs, F, rng.rand(5, 2) * 32, rng.rand(5, 2) * 32)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_plot_registry_and_compare_figures():
    rng = np.random.RandomState(1)
    B, N = 1, 30
    W, H = 64, 48
    data = {
        "view0": {"image": rng.rand(B, H, W, 3).astype(np.float32)},
        "view1": {"image": rng.rand(B, H, W, 3).astype(np.float32)},
        "H_0to1": np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)),
    }
    gt0 = np.concatenate([np.arange(15), np.full(10, -1), np.full(5, -2)])
    pred = {
        "keypoints0": rng.rand(B, N, 2) * [W, H],
        "keypoints1": rng.rand(B, N, 2) * [W, H],
        "keypoint_scores0": rng.rand(B, N),
        "keypoint_scores1": rng.rand(B, N),
        "matches0": np.where(rng.rand(B, N) > 0.4, np.arange(N)[None], -1),
        "matching_scores0": rng.rand(B, N),
        "gt_matches0": gt0[None],
        "keypoint_valid0": np.ones((B, N), bool),
        "keypoint_valid1": np.ones((B, N), bool),
    }
    from gluefactory_tpu.visualization.tools import __plot_dict__
    from gluefactory_tpu.visualization.viz2d import plot_images

    for name, cls in __plot_dict__.items():
        if name == "epipolar_matches":
            continue  # needs cameras/pose; covered by eval fixtures
        fig, axs = plot_images(
            [data["view0"]["image"][0], data["view1"]["image"][0]]
        )
        cls()(pred, data, 0, axs)
    import matplotlib.pyplot as plt

    plt.close("all")

    from gluefactory_tpu.visualization.visualize_compare_lgoob import (
        make_compare_figures,
    )

    pred_b = dict(pred, matches0=np.full((B, N), -1))
    figs = make_compare_figures(pred, pred_b, data, labels=("ours", "baseline"))
    assert "compare_0" in figs
    plt.close("all")


def test_viz2d_colormaps_and_grid():
    from gluefactory_tpu.visualization.viz2d import (
        cm_BlRdGn,
        cm_RdBl,
        cm_grad2d,
        cm_ranking,
        plot_image_grid,
    )

    rng = np.random.RandomState(2)
    assert cm_RdBl(np.linspace(0, 1, 5)).shape == (5, 3)
    assert cm_BlRdGn(np.linspace(-1, 1, 7)).shape == (7, 4)
    assert cm_grad2d(rng.rand(10, 2)).shape == (10, 3)
    assert len(cm_ranking(np.arange(2000))) == 2000
    axs = plot_image_grid([[rng.rand(24, 32)], [rng.rand(24, 32)]])
    assert axs.shape == (2, 1)
    fig, axs = plot_image_grid(
        [[rng.rand(24, 32, 3), rng.rand(24, 32, 3)]], return_fig=True
    )
    import matplotlib.pyplot as plt

    plt.close("all")


def test_visualize_kp_rotation_script(tmp_path, capsys):
    """Rotation-compare script (reference
    `scripts/visualize_endomapper_rotation.py` analog) runs end-to-end on
    the smoke config and writes plain/rot figure pairs."""
    from gluefactory_tpu.scripts.visualize_kp_rotation import main

    out = tmp_path / "rot"
    assert main(["--config", "smoke_homography", "--split", "val",
                 "--n-pairs", "1", "--out", str(out)]) == 0
    pngs = sorted(p.name for p in out.glob("*.png"))
    assert any(n.endswith("_plain.png") for n in pngs)
    assert any(n.endswith("_rot.png") for n in pngs)
    assert "total matches" in capsys.readouterr().out


def test_rotation_compare_figures():
    """`visualization/rotation_compare.py` (fork
    `visualization/rotation_compare.py:44-117` analog): two-row
    rotated-vs-original figure with GT-colored matches."""
    import numpy as np

    from gluefactory_tpu.visualization.rotation_compare import (
        make_rotation_compare_figures,
        rotate_image,
    )

    rng = np.random.RandomState(0)
    B, N = 2, 16
    data = {
        "view0": {"image": rng.rand(B, 24, 32, 1).astype(np.float32)},
        "view1": {"image": rng.rand(B, 24, 32, 1).astype(np.float32)},
    }

    def fake_pred(with_gt, with_angle):
        p = {
            "keypoints0": rng.rand(B, N, 2) * 24,
            "keypoints1": rng.rand(B, N, 2) * 24,
            "matches0": rng.randint(-1, N, (B, N)),
        }
        if with_gt:
            p["gt_matches0"] = rng.randint(-2, N, (B, N))
        if with_angle:
            p["kp_rotation_angle"] = rng.rand(B) * 3.14
        return p

    figs = make_rotation_compare_figures(
        fake_pred(True, True), fake_pred(False, False), data, n_pairs=2)
    assert len(figs) == 2
    # title carries the rotation angle and ok/bad counts
    t = figs[0].axes[0].get_title(loc="left")
    assert "rot" in t and "deg" in t

    # rotation by 0 is identity (up to border interpolation)
    img = rng.rand(24, 32).astype(np.float32)
    np.testing.assert_allclose(
        rotate_image(img, 0.0, (16, 12)), img, atol=1e-6)
    import matplotlib.pyplot as plt

    plt.close("all")
