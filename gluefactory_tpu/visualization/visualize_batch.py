"""Training-figure hooks (reference `gluefactory/visualization/visualize_batch.py:14-197`).

`make_match_figures(pred, data, n_pairs)` draws predicted matches colored by
GT correctness (green=correct, red=wrong, blue=no GT) for TensorBoard.
"""

from __future__ import annotations

import numpy as np

from .viz2d import add_text, cm_RdGn, plot_images, plot_matches


def make_match_figures(pred: dict, data: dict, n_pairs: int = 2) -> dict:
    figs = {}
    images0 = np.asarray(data["view0"]["image"])
    images1 = np.asarray(data["view1"]["image"])
    n_pairs = min(n_pairs, images0.shape[0])
    for i in range(n_pairs):
        kp0 = np.asarray(pred["keypoints0"][i])
        kp1 = np.asarray(pred["keypoints1"][i])
        m0 = np.asarray(pred["matches0"][i])
        valid = m0 >= 0
        if "keypoint_valid0" in pred:
            valid &= np.asarray(pred["keypoint_valid0"][i])
        mk0 = kp0[valid]
        mk1 = kp1[m0[valid].clip(0, len(kp1) - 1)]
        if "gt_matches0" in pred:
            gt0 = np.asarray(pred["gt_matches0"][i])
            correct = (m0 == gt0)[valid]
            labeled = (gt0 >= -1)[valid]
            colors = [
                tuple(cm_RdGn([float(c)])[0]) if l else "blue"
                for c, l in zip(correct, labeled)
            ]
        else:
            colors = "lime"
        fig, axs = plot_images([images0[i], images1[i]])
        plot_matches(axs[0], axs[1], mk0, mk1, color=colors, lw=0.5, ps=2)
        if "gt_matches0" in pred:
            rec = correct[labeled].mean() if labeled.any() else float("nan")
            add_text(axs[0], f"{valid.sum()} matches, acc {rec:.2f}")
        figs[f"match_pair_{i}"] = fig
    return figs
