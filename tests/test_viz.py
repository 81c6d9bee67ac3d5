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
