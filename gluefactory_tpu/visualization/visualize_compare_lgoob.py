"""Side-by-side comparison figures of two matchers on the same pairs
(reference `gluefactory/visualization/visualize_compare_lgoob.py:51-300` —
the fork's LG-epoch vs LG-OOB/official validation diagnostic).

`make_compare_figures(pred_a, pred_b, data, gt, ...)` renders, per pair, a
two-row image grid: row 0 = matcher A, row 1 = matcher B, matches colored by
GT correctness (green correct / red wrong), with per-row precision/recall
text. Works on any two prediction dicts sharing keypoints or carrying their
own `keypoints0/1`.
"""

from __future__ import annotations

import numpy as np

from .viz2d import add_text, cm_RdGn, plot_image_grid, plot_matches


def _matcher_stats(m0, gt0, valid):
    pred_pos = (m0 > -1) & valid
    gt_pos = (gt0 >= 0) & valid
    correct = pred_pos & (gt0 == m0)
    prec = correct.sum() / max(int(pred_pos.sum()), 1)
    rec = correct.sum() / max(int(gt_pos.sum()), 1)
    return float(prec), float(rec), int(pred_pos.sum())


def make_compare_figures(
    pred_a: dict,
    pred_b: dict,
    data: dict,
    gt: dict | None = None,
    labels=("A", "B"),
    n_pairs: int = 2,
    plot_ignored: bool = False,
):
    """Returns {name: figure} comparing two matchers' predictions."""
    gt = gt or pred_a
    gt0_all = np.asarray(gt["gt_matches0"])
    imgs0 = np.asarray(data["view0"]["image"])
    imgs1 = np.asarray(data["view1"]["image"])
    B = min(n_pairs, imgs0.shape[0])

    figs = {}
    for i in range(B):
        im0, im1 = imgs0[i], imgs1[i]
        fig, axarr = plot_image_grid(
            [[im0, im1], [im0, im1]], return_fig=True, set_lim=True, pad=0.1
        )
        gt0 = gt0_all[i]
        for row, (pred, label) in enumerate(zip((pred_a, pred_b), labels)):
            kp0 = np.asarray(pred["keypoints0"])[i]
            kp1 = np.asarray(pred["keypoints1"])[i]
            m0 = np.asarray(pred["matches0"])[i]
            vmask = np.asarray(
                pred.get("keypoint_valid0", np.ones(len(kp0), bool))
            )
            if vmask.ndim > 1:
                vmask = vmask[i]
            lo = -2 if plot_ignored else -1
            valid = (m0 > -1) & (gt0 >= lo) & vmask.astype(bool)
            correct = (gt0 == m0) & valid
            if valid.any():
                plot_matches(
                    axarr[row][0], axarr[row][1],
                    kp0[valid], kp1[m0[valid]],
                    color=cm_RdGn(correct[valid].astype(float)).tolist(),
                    lw=0.5, ps=2,
                )
            prec, rec, n = _matcher_stats(m0, gt0, vmask.astype(bool))
            add_text(
                axarr[row][0],
                f"{label}: {n} matches, P={prec:.2f} R={rec:.2f}",
                fs=8,
            )
        figs[f"compare_{i}"] = fig
    return figs
