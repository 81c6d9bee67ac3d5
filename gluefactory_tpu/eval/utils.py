"""Eval math (reference `gluefactory/eval/utils.py:45-379`).

Per-pair metric functions consumed by the benchmark pipelines. Device math
(jnp) for the geometry; thin host wrappers assemble results. Matches are the
padded `{-1} ∪ [0, M)` convention; all functions accept unbatched single-pair
data dicts like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.depth import sample_depth_bilinear, symmetric_reprojection_error
from ..geometry.epipolar import T_to_F, relative_pose_error, sym_epipolar_distance
from ..geometry.gt_generation import IGNORE_FEATURE, UNMATCHED_FEATURE
from ..geometry.homography import homography_corner_error, sym_homography_error, warp_points
from ..geometry.wrappers import Camera, Pose
from ..robust_estimators import load_estimator


# Estimator instances hold their jitted solver: constructing a fresh one per
# pair re-traces it every call, which through the remote-compile tunnel
# measured 30-75 s/pair on the endopatches eval loop (r5). Cache instances
# per (kind, name, conf) — estimators are stateless w.r.t. data.
_ESTIMATOR_CACHE: dict = {}


def _cached_estimator(kind, conf):
    key = (kind, conf["estimator"],
           tuple(sorted((k, str(v)) for k, v in conf.to_dict().items())))
    if key not in _ESTIMATOR_CACHE:
        _ESTIMATOR_CACHE[key] = load_estimator(kind, conf["estimator"])(conf)
    return _ESTIMATOR_CACHE[key]
from ..utils.tools import AUCMetric


def rescale_pred_to_views(pred: dict, data: dict) -> dict:
    """Re-scale cached original-coordinate predictions to the (resized) view
    coordinates of the eval loader — the Loop-2 half of the reference's
    cache round-trip (export de-scales `export_predictions.py:55-73`;
    CacheLoader re-scales `cache_loader.py:152-161`)."""
    out = dict(pred)
    for i in ("0", "1"):
        view = data.get(f"view{i}", {})
        scales = view.get("scales") if isinstance(view, dict) else None
        if scales is None:
            continue
        s = np.asarray(scales, np.float32)
        if f"keypoints{i}" in out:
            out[f"keypoints{i}"] = (np.asarray(out[f"keypoints{i}"]) + 0.5) * s - 0.5
        if f"lines{i}" in out:
            out[f"lines{i}"] = (np.asarray(out[f"lines{i}"]) + 0.5) * s[None] - 0.5
    return out


def get_matches_scores(kpts0, kpts1, matches0, mscores0):
    """Gather matched keypoint pairs (fixed shape, with validity).

    Returns (pts0 (N, 2), pts1 (N, 2), scores (N,), valid (N,)).
    """
    m0 = np.asarray(matches0)
    valid = m0 >= 0
    safe = np.where(valid, m0, 0)
    pts0 = np.asarray(kpts0)
    pts1 = np.asarray(kpts1)[safe]
    scores = np.asarray(mscores0)
    return pts0, pts1, scores, valid


def eval_per_batch_item(data, pred, eval_f, *args):
    results = [
        eval_f({k: v[i] for k, v in data.items()}, {k: v[i] for k, v in pred.items()}, *args)
        for i in range(len(next(iter(pred.values()))))
    ]
    return {k: [r[k] for r in results] for k in results[0].keys()}


def eval_matches_homography(data: dict, pred: dict) -> dict:
    """Precision vs GT homography (reference `eval/utils.py:141-186`)."""
    H_gt = jnp.asarray(data["H_0to1"])
    kp0, kp1 = pred["keypoints0"], pred["keypoints1"]
    p0, p1, scores, valid = get_matches_scores(
        kp0, kp1, pred["matches0"], pred["matching_scores0"]
    )
    err = np.asarray(
        sym_homography_error(jnp.asarray(p0), jnp.asarray(p1), H_gt)
    )
    err = np.where(valid, err, np.inf)
    nv = max(valid.sum(), 1)
    results = {
        "prec@1px": float(((err < 1) & valid).sum() / nv),
        "prec@3px": float(((err < 3) & valid).sum() / nv),
        "num_matches": int(valid.sum()),
        "num_keypoints": int(
            (np.asarray(pred.get("keypoint_valid0", np.ones(len(p0), bool))).sum()
             + np.asarray(pred.get("keypoint_valid1", np.ones(len(kp1), bool))).sum())
            / 2
        ),
    }
    return results


def eval_matches_epipolar(data: dict, pred: dict) -> dict:
    """Epipolar precision (reference `eval/utils.py:45-76`)."""
    cam0: Camera = data["view0"]["camera"]
    cam1: Camera = data["view1"]["camera"]
    T_0to1: Pose = data["T_0to1"]
    p0, p1, scores, valid = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"], pred["matches0"], pred["matching_scores0"]
    )
    # normalized-coordinate epipolar distance (the reference's convention:
    # thresholds 1e-4..1e-3 are in K^-1 units, `eval/utils.py:45-76`)
    r0, _ = cam0.image2world(jnp.asarray(p0))
    r1, _ = cam1.image2world(jnp.asarray(p1))
    from ..geometry.epipolar import T_to_E

    E = T_to_E(T_0to1)
    err = np.asarray(
        sym_epipolar_distance(r0[..., :2], r1[..., :2], E, squared=False)
    )
    err = np.where(valid, err, np.inf)
    nv = max(valid.sum(), 1)
    out = {
        "epi_prec@1e-4": float(((err < 1e-4) & valid).sum() / nv),
        "epi_prec@5e-4": float(((err < 5e-4) & valid).sum() / nv),
        "epi_prec@1e-3": float(((err < 1e-3) & valid).sum() / nv),
        "num_matches": int(valid.sum()),
    }
    # GT-based recall/precision when GT labels were exported
    if "gt_matches0" in pred:
        gt0 = np.asarray(pred["gt_matches0"])
        m0 = np.asarray(pred["matches0"])
        labeled = gt0 >= -1
        gt_pos = gt0 >= 0
        correct = (m0 == gt0) & gt_pos
        out["gt_match_recall"] = float(correct.sum() / max(gt_pos.sum(), 1))
        out["gt_match_precision"] = float(
            (correct & (m0 >= 0)).sum() / max(((m0 >= 0) & labeled).sum(), 1)
        )
    return out


def eval_matches_depth(data: dict, pred: dict) -> dict:
    """Depth-reprojection precision (reference `eval/utils.py:77-140`)."""
    cam0: Camera = data["view0"]["camera"]
    cam1: Camera = data["view1"]["camera"]
    T_0to1: Pose = data["T_0to1"]
    d0 = jnp.asarray(data["view0"]["depth"])
    d1 = jnp.asarray(data["view1"]["depth"])
    p0, p1, scores, valid = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"], pred["matches0"], pred["matching_scores0"]
    )
    err, err_valid = symmetric_reprojection_error(
        jnp.asarray(p0), jnp.asarray(p1), cam0, cam1, T_0to1, d0, d1
    )
    err = np.where(valid & np.asarray(err_valid), np.asarray(err), np.inf)
    considered = valid & np.asarray(err_valid)
    nv = max(considered.sum(), 1)
    return {
        "reproj_prec@1px": float(((err < 1) & considered).sum() / nv),
        "reproj_prec@3px": float(((err < 3) & considered).sum() / nv),
        "reproj_prec@5px": float(((err < 5) & considered).sum() / nv),
    }


def eval_homography_robust(data: dict, pred: dict, conf) -> dict:
    """RANSAC homography error (reference `eval/utils.py:225-275`)."""
    H_gt = jnp.asarray(data["H_0to1"])
    estimator = _cached_estimator("homography", conf)
    p0, p1, scores, valid = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"], pred["matches0"], pred["matching_scores0"]
    )
    est = estimator(
        {
            "m_kpts0": jnp.asarray(p0),
            "m_kpts1": jnp.asarray(p1),
            "match_valid": jnp.asarray(valid),
            "ransac_th": conf.get("ransac_th", 3.0),
        }
    )
    if not bool(np.asarray(est["success"])):
        return {"H_error_ransac": float("inf"), "ransac_inl": 0, "ransac_inl%": 0.0}
    M = jnp.asarray(est["M_0to1"])
    size = jnp.asarray(data["view0"]["image_size"])
    err = float(np.asarray(homography_corner_error(M, H_gt, size)))
    inl = np.asarray(est["inliers"])
    return {
        "H_error_ransac": err,
        "ransac_inl": int(inl.sum()),
        "ransac_inl%": float(inl.sum() / max(valid.sum(), 1)),
    }


def eval_homography_dlt(data: dict, pred: dict) -> dict:
    """Weighted-DLT homography error (reference `eval/utils.py:276-304`)."""
    from ..geometry.homography import compute_homography_dlt

    H_gt = jnp.asarray(data["H_0to1"])
    p0, p1, scores, valid = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"], pred["matches0"], pred["matching_scores0"]
    )
    w = jnp.asarray(scores * valid)
    try:
        H = compute_homography_dlt(jnp.asarray(p0), jnp.asarray(p1), w)
        size = jnp.asarray(data["view0"]["image_size"])
        err = float(np.asarray(homography_corner_error(H, H_gt, size)))
        if not np.isfinite(err):
            err = float("inf")
    except Exception:
        err = float("inf")
    return {"H_error_dlt": err}


def eval_relative_pose_robust(data: dict, pred: dict, conf) -> dict:
    """RANSAC relative pose error (reference `eval/utils.py:188-224`)."""
    cam0: Camera = data["view0"]["camera"]
    cam1: Camera = data["view1"]["camera"]
    T_0to1: Pose = data["T_0to1"]
    p0, p1, scores, valid = get_matches_scores(
        pred["keypoints0"], pred["keypoints1"], pred["matches0"], pred["matching_scores0"]
    )
    estimator = _cached_estimator("relative_pose", conf)
    est = estimator(
        {
            "m_kpts0": jnp.asarray(p0),
            "m_kpts1": jnp.asarray(p1),
            "camera0": cam0,
            "camera1": cam1,
            "match_valid": jnp.asarray(valid),
            "ransac_th": conf.get("ransac_th", 2.0),
        }
    )
    if not bool(np.asarray(est["success"])):
        return {"rel_pose_error": float("inf"), "ransac_inl": 0, "ransac_inl%": 0.0}
    M: Pose = est["M_0to1"]
    r_err, t_err = relative_pose_error(T_0to1, M.R, M.t)
    inl = np.asarray(est["inliers"])
    return {
        "rel_pose_error": float(max(np.asarray(r_err), np.asarray(t_err))),
        "ransac_inl": int(inl.sum()),
        "ransac_inl%": float(inl.sum() / max(valid.sum(), 1)),
    }


def eval_poses(pose_results: dict, auc_ths, key="rel_pose_error", unit="°") -> dict:
    """Pick the best RANSAC threshold by mAA (reference `eval/utils.py:305-333`).

    pose_results: {th: {key: [...], ...}}.
    """
    best_mAA = -1.0
    summaries = {}
    best_th = None
    for th, results in pose_results.items():
        errors = np.asarray(results[key], np.float64)
        aucs = AUCMetric(list(auc_ths), errors).compute()
        aucs = aucs if isinstance(aucs, list) else [aucs]
        mAA = float(np.mean(aucs))
        if mAA > best_mAA:
            best_mAA = mAA
            best_th = th
            summaries = {
                f"{key}@{t}{unit}": auc for t, auc in zip(auc_ths, aucs)
            }
            summaries[f"{key}_mAA"] = mAA
            for k, v in results.items():
                if k != key:
                    arr = np.asarray(v, np.float64)
                    summaries[f"m{k}"] = float(np.nanmean(arr[np.isfinite(arr)])) if np.isfinite(arr).any() else float("nan")
    summaries["best_ransac_th"] = best_th
    return summaries


def get_tp_fp_pts(pred_matches, gt_matches, pred_scores):
    """TP/FP curve points for AP (reference `eval/utils.py:334-353`)."""
    pred_matches = np.asarray(pred_matches)
    gt_matches = np.asarray(gt_matches)
    pred_scores = np.asarray(pred_scores)
    labeled = gt_matches != IGNORE_FEATURE
    pred_pos = (pred_matches >= 0) & labeled
    tp = (pred_matches == gt_matches) & pred_pos
    scores = pred_scores[pred_pos]
    tp = tp[pred_pos]
    order = np.argsort(-scores)
    tp = tp[order]
    n_gt = (gt_matches >= 0).sum()
    return tp, scores[order], n_gt


def AP(tp, n_gt):
    """Average precision from a ranked TP list (reference `eval/utils.py:354`)."""
    if len(tp) == 0 or n_gt == 0:
        return 0.0
    cum_tp = np.cumsum(tp)
    recall = cum_tp / n_gt
    precision = cum_tp / (np.arange(len(tp)) + 1)
    # standard VOC-style integration
    recall = np.r_[0.0, recall]
    precision = np.r_[1.0, precision]
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    return float(np.sum((recall[1:] - recall[:-1]) * precision[1:]))
