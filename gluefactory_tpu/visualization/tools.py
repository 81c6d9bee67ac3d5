"""Plot registry for interactive two-view inspection
(reference `gluefactory/visualization/tools.py:140-600`).

Each plot is a callable `plot(pred, data, idx, axes)` drawing onto a pair of
image axes; `__plot_dict__` maps the name the inspector exposes (keyboard
toggles in the reference's matplotlib UI; list-selection in our
`eval/inspect.py`) to the implementation. All consume numpy/jax arrays on
host — no torch, no device work.
"""

from __future__ import annotations

import numpy as np

from ..geometry.epipolar import T_to_F
from .viz2d import (
    cm_ranking,
    cm_RdGn,
    plot_epipolar_lines,
    plot_heatmaps,
    plot_keypoints,
    plot_matches,
)


def _get(container, *keys, idx=None):
    for k in keys:
        if k in container:
            v = np.asarray(container[k])
            return v[idx] if idx is not None else v
    return None


def _valid_mask(pred, view, idx, n):
    v = _get(pred, f"keypoint_valid{view}", idx=idx)
    return v.astype(bool) if v is not None else np.ones(n, bool)


class KeypointPlot:
    """Keypoints on both views (reference `tools.py:140-149`)."""

    def __call__(self, pred, data, idx, axes):
        for view, ax in enumerate(axes):
            kp = _get(pred, f"keypoints{view}", idx=idx)
            if kp is None:
                continue
            valid = _valid_mask(pred, view, idx, len(kp))
            plot_keypoints([ax], [kp[valid]], colors="lime")


class KeypointRankingPlot:
    """Keypoints colored by score rank (reference `tools.py:160-173`)."""

    def __call__(self, pred, data, idx, axes):
        for view, ax in enumerate(axes):
            kp = _get(pred, f"keypoints{view}", idx=idx)
            sc = _get(pred, f"keypoint_scores{view}", idx=idx)
            if kp is None or sc is None:
                continue
            valid = _valid_mask(pred, view, idx, len(kp))
            order = np.argsort(-sc[valid])
            ax.scatter(
                kp[valid][order, 0], kp[valid][order, 1],
                c=cm_ranking(sc[valid][order]), s=6, linewidths=0,
            )


class KeypointScoresPlot:
    """Keypoints colored by raw score (reference `tools.py:175-187`)."""

    def __call__(self, pred, data, idx, axes):
        for view, ax in enumerate(axes):
            kp = _get(pred, f"keypoints{view}", idx=idx)
            sc = _get(pred, f"keypoint_scores{view}", idx=idx)
            if kp is None or sc is None:
                continue
            valid = _valid_mask(pred, view, idx, len(kp))
            s = sc[valid]
            s = s / max(float(s.max()), 1e-8)
            ax.scatter(kp[valid, 0], kp[valid, 1], c=cm_RdGn(s), s=6, linewidths=0)


class HeatmapPlot:
    """Dense score heatmaps when present (reference `tools.py:189-204`)."""

    def __call__(self, pred, data, idx, axes):
        for view, ax in enumerate(axes):
            hm = _get(pred, f"dense_scores{view}", f"score_map{view}", idx=idx)
            if hm is None and view == 0:
                hm = _get(pred, "dense_scores", "score_map", idx=idx)
            if hm is None:
                continue
            plot_heatmaps([ax], [hm])


class MatchesPlot:
    """Matches colored by score (reference `tools.py:214-243`)."""

    def __call__(self, pred, data, idx, axes):
        kp0 = _get(pred, "keypoints0", idx=idx)
        kp1 = _get(pred, "keypoints1", idx=idx)
        m0 = _get(pred, "matches0", idx=idx)
        ms = _get(pred, "matching_scores0", idx=idx)
        if kp0 is None or m0 is None:
            return
        valid = (m0 > -1) & _valid_mask(pred, 0, idx, len(kp0))
        colors = cm_RdGn(ms[valid]) if ms is not None else None
        plot_matches(
            axes[0], axes[1], kp0[valid], kp1[m0[valid]],
            color=None if colors is None else colors.tolist(), lw=0.5, ps=2,
        )


class GtMatchesPlot:
    """Matches colored by GT correctness (reference `tools.py:302-337`)."""

    def __call__(self, pred, data, idx, axes):
        kp0 = _get(pred, "keypoints0", idx=idx)
        kp1 = _get(pred, "keypoints1", idx=idx)
        m0 = _get(pred, "matches0", idx=idx)
        gt0 = _get(pred, "gt_matches0", idx=idx)
        if gt0 is None:
            gt0 = _get(data, "gt_matches0", idx=idx)
        if kp0 is None or m0 is None or gt0 is None:
            return
        valid = (m0 > -1) & (gt0 >= -1) & _valid_mask(pred, 0, idx, len(kp0))
        correct = (gt0 == m0) & valid
        plot_matches(
            axes[0], axes[1], kp0[valid], kp1[m0[valid]],
            color=cm_RdGn(correct[valid].astype(float)).tolist(), lw=0.5, ps=2,
        )


class HomographyMatchesPlot:
    """Matches colored by H-reprojection error (reference `tools.py:362-439`)."""

    def __init__(self, th: float = 3.0):
        self.th = th

    def __call__(self, pred, data, idx, axes):
        from ..geometry.homography import warp_points_np

        H = _get(data, "H_0to1", idx=idx)
        kp0 = _get(pred, "keypoints0", idx=idx)
        kp1 = _get(pred, "keypoints1", idx=idx)
        m0 = _get(pred, "matches0", idx=idx)
        if H is None or kp0 is None or m0 is None:
            return
        valid = (m0 > -1) & _valid_mask(pred, 0, idx, len(kp0))
        pts = kp0[valid]
        proj = warp_points_np(pts, np.asarray(H), inverse=False)
        err = np.linalg.norm(proj - kp1[m0[valid]], axis=-1)
        plot_matches(
            axes[0], axes[1], pts, kp1[m0[valid]],
            color=cm_RdGn((err < self.th).astype(float)).tolist(), lw=0.5, ps=2,
        )


class EpipolarMatchesPlot:
    """Matches + epipolar lines of the worst matches
    (reference `tools.py:468-580`)."""

    def __init__(self, n_lines: int = 5):
        self.n_lines = n_lines

    def __call__(self, pred, data, idx, axes):
        import jax.numpy as jnp

        T = data.get("T_0to1")
        cam0 = data.get("view0", {}).get("camera")
        cam1 = data.get("view1", {}).get("camera")
        kp0 = _get(pred, "keypoints0", idx=idx)
        kp1 = _get(pred, "keypoints1", idx=idx)
        m0 = _get(pred, "matches0", idx=idx)
        if T is None or cam0 is None or kp0 is None or m0 is None:
            return
        F = np.asarray(T_to_F(cam0, cam1, T))
        if F.ndim == 3:
            F = F[idx]
        valid = (m0 > -1) & _valid_mask(pred, 0, idx, len(kp0))
        pts0, pts1 = kp0[valid], kp1[m0[valid]]
        plot_matches(axes[0], axes[1], pts0, pts1, lw=0.3, ps=2)
        # epipolar lines for a few matches with the largest epipolar residual
        h1 = np.concatenate([pts0, np.ones((len(pts0), 1))], -1)
        lines1 = h1 @ F.T  # lines in view1
        d = np.abs(np.sum(np.concatenate([pts1, np.ones((len(pts1), 1))], -1) * lines1, -1))
        d = d / np.maximum(np.linalg.norm(lines1[:, :2], axis=-1), 1e-8)
        worst = np.argsort(-d)[: self.n_lines]
        plot_epipolar_lines(axes, F, pts0[worst], pts1[worst])


__plot_dict__ = {
    "keypoints": KeypointPlot,
    "keypoint_ranking": KeypointRankingPlot,
    "keypoint_scores": KeypointScoresPlot,
    "heatmaps": HeatmapPlot,
    "matches": MatchesPlot,
    "gt_matches": GtMatchesPlot,
    "homography_matches": HomographyMatchesPlot,
    "epipolar_matches": EpipolarMatchesPlot,
}
