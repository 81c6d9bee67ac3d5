"""Rotation-augmentation diagnostic figures.

Counterpart of the fork's rotation tooling
(`gluefactory/visualization/rotation_compare.py:44-117` and
`gluefactory/scripts/visualize_endomapper_rotation.py`): a two-row figure
per pair — top row shows the ROTATED view with the rotation-run matches,
bottom row the original views with the plain-run matches — with matches
colored by GT correctness (green/red) when `gt_matches0` is present, and
match-count titles, so the effect of keypoint-rotation augmentation on a
matcher is inspectable side by side. Host-side viz (numpy + cv2 warp).
"""

from __future__ import annotations

import numpy as np

from .viz2d import cm_RdGn, plot_image_grid, plot_keypoints, plot_matches


def rotate_image(image: np.ndarray, angle_rad: float, center) -> np.ndarray:
    """Rotate (H, W[, C]) image by `angle_rad` around `center` (x, y), same
    convention as the fork's `_rotate_image_tensor` (inverse-warp bilinear,
    zero padding)."""
    import cv2

    img = np.asarray(image, np.float32)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    M = cv2.getRotationMatrix2D(
        (float(center[0]), float(center[1])), np.degrees(float(angle_rad)), 1.0
    )
    return cv2.warpAffine(
        img, M, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )


def _row(axes_row, pred, i, label):
    kp0 = np.asarray(pred["keypoints0"][i])
    kp1 = np.asarray(pred["keypoints1"][i])
    matches = np.asarray(pred["matches0"][i])
    gt = pred.get("gt_matches0")
    if gt is None:
        valid = matches > -1
        colors = "royalblue"
        title = f"{label} | matches {int(valid.sum())}"
    else:
        gt_i = np.asarray(gt[i])
        valid = (matches > -1) & (gt_i >= -1)
        correct = gt_i[valid] == matches[valid]
        colors = cm_RdGn(correct).tolist()
        ok = int(correct.sum())
        title = (
            f"{label} | ok/bad {ok}/{int(valid.sum()) - ok} | "
            f"used {int(valid.sum())}/{int((matches > -1).sum())}"
        )
    plot_keypoints(axes_row, [kp0, kp1], colors="royalblue", ps=2)
    plot_matches(
        axes_row[0], axes_row[1], kp0[valid], kp1[matches[valid]],
        color=colors, lw=1.0, ps=0, a=0.5,
    )
    axes_row[0].set_title(title, fontsize=8, loc="left")


def make_rotation_compare_figures(
    pred_rot: dict, pred_orig: dict, data: dict, n_pairs: int = 2,
    rot_view: int = 0,
):
    """Build one figure per pair: rotated-input row vs original row.

    pred_rot must carry `kp_rotation_angle` (the pipeline emits it,
    `models/two_view_pipeline.py`); the rotated view's image is re-warped
    for display so the drawn keypoints line up with what the rotated model
    saw. Returns a list of matplotlib figures.
    """
    view0, view1 = data["view0"], data["view1"]
    im0 = np.asarray(view0["image"])
    im1 = np.asarray(view1["image"])
    n_pairs = min(n_pairs, im0.shape[0])
    angles = pred_rot.get("kp_rotation_angle")
    figs = []
    for i in range(n_pairs):
        imgs_orig = [im0[i], im1[i]]
        imgs_rot = list(imgs_orig)
        label_rot = "rotated"
        if angles is not None:
            ang = float(np.asarray(angles[i]).reshape(-1)[0])
            src = imgs_rot[rot_view]
            h, w = src.shape[:2]
            cam = data.get(f"view{rot_view}", {}).get("camera")
            center = (
                np.asarray(cam.c[i]) if cam is not None
                else np.array([w / 2.0, h / 2.0])
            )
            imgs_rot[rot_view] = rotate_image(src, ang, center)
            label_rot = f"rotated | rot {np.degrees(ang):.1f}deg"
        fig, axes = plot_image_grid(
            [imgs_rot, imgs_orig], return_fig=True, set_lim=True, pad=0.9
        )
        _row(axes[0], pred_rot, i, label_rot)
        _row(axes[1], pred_orig, i, "original")
        figs.append(fig)
    return figs
