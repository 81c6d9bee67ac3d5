"""Padding/masking helpers (reference `gluefactory/models/utils/misc.py:19-136`).

In the TPU build every keypoint set is already fixed-size + masked at the
extractor, so these helpers mainly serve dataset-side feature caches and
lines.
"""

from __future__ import annotations

import numpy as np


def pad_features_np(kpts, scores, desc, k, pad_coord=0.0):
    """Pad/truncate host-side features to exactly k (numpy).

    kpts: (n, 2), scores: (n,), desc: (n, D). Returns padded arrays + valid.
    """
    n = kpts.shape[0]
    valid = np.zeros(k, bool)
    out_k = np.full((k, 2), pad_coord, np.float32)
    out_s = np.zeros(k, np.float32)
    out_d = np.zeros((k, desc.shape[-1] if desc is not None else 0), np.float32)
    m = min(n, k)
    if m > 0:
        order = np.argsort(-np.asarray(scores[:n]))[:m]
        out_k[:m] = kpts[order]
        out_s[:m] = scores[order]
        if desc is not None:
            out_d[:m] = desc[order]
        valid[:m] = True
    return out_k, out_s, out_d, valid


def pad_lines_np(lines, scores, k):
    """Pad/truncate line segments (n, 2, 2) to exactly k."""
    n = lines.shape[0]
    out_l = np.zeros((k, 2, 2), np.float32)
    out_s = np.zeros(k, np.float32)
    valid = np.zeros(k, bool)
    m = min(n, k)
    if m > 0:
        order = np.argsort(-np.asarray(scores[:n]))[:m]
        out_l[:m] = lines[order]
        out_s[:m] = scores[order]
        valid[:m] = True
    return out_l, out_s, valid
