"""Feature-track construction from pairwise matches (COLMAP-style).

Host-side data preparation for the device BA/triangulation kernels: a
union-find over (frame, keypoint) nodes links pairwise matches into
multi-view tracks, then emits the fixed-shape (P, V) observation tables
`sfm/ba.py` and `sfm/triangulation.py` consume (track-major layout, padded
with invalid slots — the TPU-first convention used across the framework).
The reference repo stops at two-view matching; COLMAP's track builder
(`colmap/src/controllers/incremental_mapper`) is the conceptual counterpart.
"""

from __future__ import annotations

import numpy as np


def build_tracks(pair_matches, max_obs: int = 8, min_obs: int = 2):
    """Link pairwise matches into tracks.

    pair_matches: iterable of (frame_i, frame_j, m) with m an (N,) int array,
    m[k] = matched keypoint index in frame_j for keypoint k of frame_i, or
    -1. Returns (frame_idx (P, V) int32, kpt_idx (P, V) int32,
    valid (P, V) bool) with V = max_obs; tracks observing the same frame
    twice (merge conflicts from inconsistent matches) are dropped, like
    COLMAP's correspondence-graph filter.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for fi, fj, m in pair_matches:
        for k, j in enumerate(np.asarray(m)):
            if j >= 0:
                union((int(fi), int(k)), (int(fj), int(j)))

    groups: dict = {}
    for node in list(parent) + [n for n in parent.values()]:
        groups.setdefault(find(node), set()).add(node)
    # singletons never enter `parent`; they cannot reach min_obs >= 2 anyway

    rows_f, rows_k, rows_v = [], [], []
    for g in groups.values():
        obs = sorted(g)
        frames = [f for f, _ in obs]
        if len(set(frames)) != len(frames):
            continue  # conflicting correspondences — drop the whole track
        if not (min_obs <= len(obs)):
            continue
        obs = obs[:max_obs]
        n = len(obs)
        rows_f.append([f for f, _ in obs] + [0] * (max_obs - n))
        rows_k.append([k for _, k in obs] + [0] * (max_obs - n))
        rows_v.append([True] * n + [False] * (max_obs - n))

    if not rows_f:
        z = np.zeros((0, max_obs))
        return z.astype(np.int32), z.astype(np.int32), z.astype(bool)
    return (
        np.asarray(rows_f, np.int32),
        np.asarray(rows_k, np.int32),
        np.asarray(rows_v, bool),
    )


def gather_observations(frame_idx, kpt_idx, valid, keypoints):
    """Index tracks into per-frame keypoint arrays.

    keypoints: (F, N, 2). Returns uv (P, V, 2) with invalid slots zeroed.
    """
    uv = keypoints[frame_idx, kpt_idx]
    return np.where(valid[..., None], uv, 0.0)
