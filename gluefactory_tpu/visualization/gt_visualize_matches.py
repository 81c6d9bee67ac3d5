"""GT-label diagnostic figures
(reference `gluefactory/visualization/gt_visualize_matches.py`, 1549 LoC of
fork diagnostics — this is the compact TPU-build core set).

Given a batch's pred+data with GT labels, renders:
  - positive / unmatched / ignore keypoint masks per view
  - GT match lines (pos green) with reprojections overlaid
  - (sparse GT) track-id positives
  - (RoMa GT) certainty heatmap
Used by the trainer's figure hooks and offline inspection.
"""

from __future__ import annotations

import numpy as np

from .viz2d import add_text, plot_heatmaps, plot_images, plot_keypoints, plot_matches


def gt_label_figure(pred: dict, data: dict, idx: int = 0):
    """Color keypoints by GT label: green=matched, red=unmatched, gray=ignore."""
    img0 = np.asarray(data["view0"]["image"][idx])
    img1 = np.asarray(data["view1"]["image"][idx])
    kp0 = np.asarray(pred["keypoints0"][idx])
    kp1 = np.asarray(pred["keypoints1"][idx])
    gt0 = np.asarray(pred["gt_matches0"][idx])
    gt1 = np.asarray(pred["gt_matches1"][idx])

    def colors(gt):
        c = np.full((len(gt), 3), 0.6)
        c[gt >= 0] = (0.0, 1.0, 0.0)
        c[gt == -1] = (1.0, 0.0, 0.0)
        return c

    fig, axs = plot_images([img0, img1], titles=["view0 GT labels", "view1"])
    axs[0].scatter(kp0[:, 0], kp0[:, 1], c=colors(gt0), s=6, linewidths=0)
    axs[1].scatter(kp1[:, 0], kp1[:, 1], c=colors(gt1), s=6, linewidths=0)
    n_pos = int((gt0 >= 0).sum())
    n_neg = int((gt0 == -1).sum())
    n_ign = int((gt0 == -2).sum())
    add_text(axs[0], f"pos {n_pos} / neg {n_neg} / ignore {n_ign}")
    return fig


def gt_matches_figure(pred: dict, data: dict, idx: int = 0, max_lines: int = 150):
    """Draw GT positive correspondences + reprojection residuals."""
    img0 = np.asarray(data["view0"]["image"][idx])
    img1 = np.asarray(data["view1"]["image"][idx])
    kp0 = np.asarray(pred["keypoints0"][idx])
    kp1 = np.asarray(pred["keypoints1"][idx])
    gt0 = np.asarray(pred["gt_matches0"][idx])
    sel = np.where(gt0 >= 0)[0][:max_lines]
    fig, axs = plot_images([img0, img1], titles=["GT matches", ""])
    if len(sel):
        plot_matches(axs[0], axs[1], kp0[sel], kp1[gt0[sel]], lw=0.5, ps=2)
    if "gt_kp0_1" in pred:
        reproj = np.asarray(pred["gt_kp0_1"][idx])[sel]
        axs[1].scatter(reproj[:, 0], reproj[:, 1], c="yellow", s=4, marker="x")
    return fig


def roma_certainty_figure(pred: dict, data: dict, idx: int = 0):
    """Dense-warp certainty heatmap over view0 (RoMa pseudo-GT diagnostics)."""
    img0 = np.asarray(data["view0"]["image"][idx])
    cert = np.asarray(data["roma_certainty_0to1"][idx])
    fig, axs = plot_images([img0], titles=["RoMa certainty"])
    plot_heatmaps([axs[0]], [cert])
    return fig


def make_gt_figures(pred: dict, data: dict, n: int = 1) -> dict:
    figs = {}
    for i in range(min(n, len(np.asarray(pred["keypoints0"])))):
        figs[f"gt_labels_{i}"] = gt_label_figure(pred, data, i)
        figs[f"gt_matches_{i}"] = gt_matches_figure(pred, data, i)
        if "roma_certainty_0to1" in data:
            figs[f"roma_certainty_{i}"] = roma_certainty_figure(pred, data, i)
    return figs
