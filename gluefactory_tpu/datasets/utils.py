"""Dataset utilities (reference `gluefactory/datasets/utils.py:28-131`)."""

from __future__ import annotations

import numpy as np


def rotate_intrinsics(K: np.ndarray, image_size_wh, rot: int = 1) -> np.ndarray:
    """Adapt K to a k*90° CCW rotation of the image
    (reference `datasets/utils.py:28-48`).

    image_size_wh: (w, h) BEFORE rotation.
    """
    w, h = image_size_wh
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    # one 90° CCW: (x, y) -> (y, w-1-x); new size (h, w)
    out = np.array(
        [[fy, 0.0, cy], [0.0, fx, w - 1.0 - cx], [0.0, 0.0, 1.0]], K.dtype
    )
    return out


def rotate_pose_inplane(T_w2cam: np.ndarray, rot: int = 1) -> np.ndarray:
    """Compose an in-plane camera rotation into a world->cam 4x4 pose
    (reference `datasets/utils.py:49-64`)."""
    rot90 = np.array(
        [
            [0.0, 1.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        T_w2cam.dtype,
    )
    out = T_w2cam.copy()
    for _ in range(rot % 4):
        out = rot90 @ out
    return out


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    s = np.asarray(scales, K.dtype)
    T = np.diag([s[0], s[1], 1.0]).astype(K.dtype)
    return T @ K
