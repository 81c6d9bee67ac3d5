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


def gt_pos_neg_ign_figure(pred: dict, data: dict, idx: int = 0):
    """Per-label panel suite: positives / negatives / ignores as separate
    panels per view with counts (reference `make_gt_pos_neg_ign_figs`,
    `gt_visualize_matches.py` fork diagnostics)."""
    import matplotlib.pyplot as plt

    img0 = np.asarray(data["view0"]["image"][idx]).squeeze()
    img1 = np.asarray(data["view1"]["image"][idx]).squeeze()
    kps = [np.asarray(pred["keypoints0"][idx]), np.asarray(pred["keypoints1"][idx])]
    gts = [np.asarray(pred["gt_matches0"][idx]), np.asarray(pred["gt_matches1"][idx])]
    valids = [
        np.asarray(pred.get(f"keypoint_valid{v}", np.ones(len(kps[v]), bool)))
        for v in (0, 1)
    ]
    valids = [v[idx] if v.ndim > 1 else v for v in valids]

    labels = [("pos", lambda g: g >= 0, "lime"),
              ("neg", lambda g: g == -1, "red"),
              ("ignore", lambda g: g == -2, "orange")]
    fig, axs = plt.subplots(2, 3, figsize=(12, 6))
    for v, (img, kp, gt, val) in enumerate(zip([img0, img1], kps, gts, valids)):
        for j, (name, sel_fn, color) in enumerate(labels):
            ax = axs[v, j]
            ax.imshow(img, cmap="gray")
            sel = sel_fn(gt) & val
            ax.scatter(kp[sel, 0], kp[sel, 1], c=color, s=5, linewidths=0)
            ax.set_title(f"view{v} {name}: {int(sel.sum())}", fontsize=9)
            ax.set_axis_off()
    fig.tight_layout()
    return fig


def gt_sparse_map_figure(pred: dict, data: dict, idx: int = 0):
    """Sparse-SfM-map GT: positives colored by 3D track identity
    (reference `make_gt_pos_sparse_map_figs`). Uses per-view cached
    `point3D_ids` when the dataset supplies them; otherwise colors by
    match index so correspondence identity is still visually traceable."""
    import matplotlib.pyplot as plt

    img0 = np.asarray(data["view0"]["image"][idx]).squeeze()
    img1 = np.asarray(data["view1"]["image"][idx]).squeeze()
    kp0 = np.asarray(pred["keypoints0"][idx])
    kp1 = np.asarray(pred["keypoints1"][idx])
    gt0 = np.asarray(pred["gt_matches0"][idx])
    sel = np.where(gt0 >= 0)[0]
    ids = None
    cache0 = data.get("view0", {}).get("cache", {})
    if "point3D_ids" in cache0:
        ids = np.asarray(cache0["point3D_ids"][idx])[sel]
    hue = (ids if ids is not None else sel).astype(np.float64)
    hue = (hue % 997) / 997.0  # spread track ids over the colormap
    cmap = plt.get_cmap("hsv")
    fig, axs = plot_images(
        [img0, img1],
        titles=[f"sparse-map GT tracks ({len(sel)})", ""],
    )
    if len(sel):
        axs[0].scatter(kp0[sel, 0], kp0[sel, 1], c=cmap(hue), s=8, linewidths=0)
        axs[1].scatter(
            kp1[gt0[sel], 0], kp1[gt0[sel], 1], c=cmap(hue), s=8, linewidths=0
        )
    return fig


def make_gt_figures(pred: dict, data: dict, n: int = 1) -> dict:
    figs = {}
    for i in range(min(n, len(np.asarray(pred["keypoints0"])))):
        figs[f"gt_labels_{i}"] = gt_label_figure(pred, data, i)
        figs[f"gt_matches_{i}"] = gt_matches_figure(pred, data, i)
        if "roma_certainty_0to1" in data:
            figs[f"roma_certainty_{i}"] = roma_certainty_figure(pred, data, i)
    return figs


def make_gt_pos_figures(pred: dict, data: dict, n: int = 1) -> dict:
    """Positive-correspondence suite (reference `log_gt_pos_*` dumps)."""
    B = len(np.asarray(pred["keypoints0"]))
    return {
        f"gt_pos_{i}": gt_matches_figure(pred, data, i) for i in range(min(n, B))
    }


def make_gt_pos_neg_ign_figures(pred: dict, data: dict, n: int = 1) -> dict:
    B = len(np.asarray(pred["keypoints0"]))
    return {
        f"gt_pos_neg_ign_{i}": gt_pos_neg_ign_figure(pred, data, i)
        for i in range(min(n, B))
    }


def make_gt_sparse_map_figures(pred: dict, data: dict, n: int = 1) -> dict:
    B = len(np.asarray(pred["keypoints0"]))
    return {
        f"gt_sparse_map_{i}": gt_sparse_map_figure(pred, data, i)
        for i in range(min(n, B))
    }
