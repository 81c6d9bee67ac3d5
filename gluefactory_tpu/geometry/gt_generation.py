"""Ground-truth correspondence generation
(reference `gluefactory/geometry/gt_generation.py`).

Converts two-view geometry (homography / pose+depth) into match supervision:
per-keypoint labels in {-2 (IGNORE), -1 (UNMATCHED)} ∪ [0, M) and a dense
assignment matrix for NLL losses.

TPU-first design: all inputs are fixed-size padded keypoint sets with
validity masks; labels are computed by masked distance-matrix math — no
data-dependent shapes, fully jittable and vmappable. Padded (invalid)
keypoints are always labeled IGNORE.
"""

from __future__ import annotations

import jax.numpy as jnp

from .depth import project, sample_depth_bilinear
from .epipolar import T_to_E, sym_epipolar_distance_all
from .homography import warp_points
from .wrappers import Camera, Pose

IGNORE_FEATURE = -2
UNMATCHED_FEATURE = -1

INF = 1e9


def _masked_dist(d, mask):
    return jnp.where(mask, d, jnp.full_like(d, INF))


def _assignment_from_dist(
    dist: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    pos_th: float,
    neg_th: float,
    certain0: jnp.ndarray | None = None,
    certain1: jnp.ndarray | None = None,
    can_neg0: jnp.ndarray | None = None,
    can_neg1: jnp.ndarray | None = None,
):
    """Mutual-min assignment with pos/neg thresholds
    (reference `gt_generation.py:669-712` core logic).

    dist: (..., N, M) with invalid entries >= INF.
    valid0/valid1: (..., N)/(..., M) keypoint validity.
    certain0/certain1: optional masks marking keypoints whose *negative* label
    is certain regardless of dist (e.g. epipolar-distance negatives).
    Returns (gt_assignment bool (..., N, M), gt_matches0 (..., N),
    gt_matches1 (..., M)).
    """
    N, M = dist.shape[-2], dist.shape[-1]
    min0 = jnp.min(dist, axis=-1)  # (..., N)
    min1 = jnp.min(dist, axis=-2)  # (..., M)
    arg0 = jnp.argmin(dist, axis=-1)  # (..., N)
    arg1 = jnp.argmin(dist, axis=-2)  # (..., M)

    # mutual nearest neighbors
    idx_n = jnp.arange(N)
    idx_m = jnp.arange(M)
    mutual0 = jnp.take_along_axis(arg1, arg0, axis=-1) == idx_n  # (..., N)
    mutual1 = jnp.take_along_axis(arg0, arg1, axis=-1) == idx_m  # (..., M)

    positive0 = mutual0 & (min0 < pos_th) & valid0
    positive1 = mutual1 & (min1 < pos_th) & valid1

    # a pair is positive only if both endpoints agree
    pos_pair0 = positive0 & jnp.take_along_axis(positive1, arg0, axis=-1)
    pos_pair1 = positive1 & jnp.take_along_axis(positive0, arg1, axis=-1)

    # scatter positives: row i -> col arg0[i]
    assignment = (idx_m[None, :] == arg0[..., :, None]) & pos_pair0[..., :, None]

    negative0 = (min0 > neg_th) & valid0
    negative1 = (min1 > neg_th) & valid1
    # a "far from everything" negative is only trustworthy if the keypoint's
    # own reprojection was valid (else the distances are meaningless INF)
    if can_neg0 is not None:
        negative0 = negative0 & can_neg0
    if can_neg1 is not None:
        negative1 = negative1 & can_neg1
    if certain0 is not None:
        negative0 = negative0 | (certain0 & valid0)
    if certain1 is not None:
        negative1 = negative1 | (certain1 & valid1)

    matches0 = jnp.where(
        pos_pair0,
        arg0,
        jnp.where(negative0 & ~pos_pair0, UNMATCHED_FEATURE, IGNORE_FEATURE),
    )
    matches1 = jnp.where(
        pos_pair1,
        arg1,
        jnp.where(negative1 & ~pos_pair1, UNMATCHED_FEATURE, IGNORE_FEATURE),
    )
    matches0 = jnp.where(valid0, matches0, IGNORE_FEATURE)
    matches1 = jnp.where(valid1, matches1, IGNORE_FEATURE)
    return assignment, matches0.astype(jnp.int32), matches1.astype(jnp.int32)


def gt_matches_from_homography(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    H: jnp.ndarray,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    pos_th: float = 3.0,
    neg_th: float = 6.0,
):
    """GT matches under a known homography (reference `gt_generation.py:731`).

    kp0: (..., N, 2), kp1: (..., M, 2), H: (..., 3, 3) mapping view0 -> view1.
    Returns dict with gt_assignment/gt_matches0/gt_matches1 and the warped
    keypoint reprojections.
    """
    if valid0 is None:
        valid0 = jnp.ones(kp0.shape[:-1], bool)
    if valid1 is None:
        valid1 = jnp.ones(kp1.shape[:-1], bool)
    kp0_1 = warp_points(kp0, H, inverse=False)
    kp1_0 = warp_points(kp1, H, inverse=True)
    d0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, axis=-1)
    d1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, axis=-1)
    dist = jnp.maximum(d0, d1)
    mask = valid0[..., :, None] & valid1[..., None, :]
    dist = _masked_dist(jnp.sqrt(jnp.maximum(dist, 0.0)), mask)
    assignment, m0, m1 = _assignment_from_dist(dist, valid0, valid1, pos_th, neg_th)
    return {
        "gt_assignment": assignment,
        "gt_matches0": m0,
        "gt_matches1": m1,
        "gt_kp0_1": kp0_1,
        "gt_kp1_0": kp1_0,
    }


def gt_matches_from_pose_depth(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    cam0: Camera,
    cam1: Camera,
    T_0to1: Pose,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    pos_th: float = 3.0,
    neg_th: float = 5.0,
    epi_th: float | None = None,
    cc_th: float | None = 0.05,
    kp0_depth: jnp.ndarray | None = None,
    kp1_depth: jnp.ndarray | None = None,
):
    """GT matches from relative pose + dense depth
    (reference `gt_generation.py:594-728`).

    Two-way reprojection with cycle consistency; mutual-min assignment;
    epipolar-distance extra negatives (keypoints far from all epipolar lines
    are certain negatives even where depth is missing,
    reference `gt_generation.py:706-712`).
    kp{0,1}_depth: optional precomputed keypoint depths (sparse-cache path).
    """
    if valid0 is None:
        valid0 = jnp.ones(kp0.shape[:-1], bool)
    if valid1 is None:
        valid1 = jnp.ones(kp1.shape[:-1], bool)

    if kp0_depth is None:
        d0, dv0 = sample_depth_bilinear(depth0, kp0)
    else:
        d0, dv0 = kp0_depth, kp0_depth > 0
    if kp1_depth is None:
        d1, dv1 = sample_depth_bilinear(depth1, kp1)
    else:
        d1, dv1 = kp1_depth, kp1_depth > 0

    kp0_1, pv0 = project(
        kp0, d0, depth1, cam0, cam1, T_0to1, valid0 & dv0, ccth=cc_th
    )
    kp1_0, pv1 = project(
        kp1, d1, depth0, cam1, cam0, T_0to1.inv(), valid1 & dv1, ccth=cc_th
    )

    dist0 = jnp.linalg.norm(kp0_1[..., :, None, :] - kp1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kp0[..., :, None, :] - kp1_0[..., None, :, :], axis=-1)
    # use max when both projections valid, else the valid one, else INF
    both = pv0[..., :, None] & pv1[..., None, :]
    one0 = pv0[..., :, None] & ~pv1[..., None, :]
    one1 = ~pv0[..., :, None] & pv1[..., None, :]
    dist = jnp.where(
        both,
        jnp.maximum(dist0, dist1),
        jnp.where(one0, dist0, jnp.where(one1, dist1, INF)),
    )
    mask = valid0[..., :, None] & valid1[..., None, :]
    dist = _masked_dist(dist, mask)

    certain0 = certain1 = None
    if epi_th is not None:
        # normalized-coordinate epipolar distances
        r0, _ = cam0.image2world(kp0)
        r1, _ = cam1.image2world(kp1)
        E = T_to_E(T_0to1)
        epi = sym_epipolar_distance_all(r0[..., :2], r1[..., :2], E)
        epi = _masked_dist(epi, mask)
        certain0 = jnp.min(epi, axis=-1) > epi_th
        certain1 = jnp.min(epi, axis=-2) > epi_th

    assignment, m0, m1 = _assignment_from_dist(
        dist, valid0, valid1, pos_th, neg_th, certain0, certain1,
        can_neg0=pv0, can_neg1=pv1,
    )
    return {
        "gt_assignment": assignment,
        "gt_matches0": m0,
        "gt_matches1": m1,
        "gt_kp0_1": kp0_1,
        "gt_kp1_0": kp1_0,
        "gt_proj_valid0": pv0,
        "gt_proj_valid1": pv1,
        "gt_depth_keypoints0": d0,
        "gt_depth_keypoints1": d1,
    }


# ---------------------------------------------------------------------------
# Line GT (reference `gt_generation.py:848-1198`)
# ---------------------------------------------------------------------------


def _line_point_samples(lines: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sample n points along each segment. lines: (..., L, 2, 2) -> (..., L, n, 2)."""
    t = jnp.linspace(0.0, 1.0, n)[:, None]
    return lines[..., 0:1, :] * (1 - t) + lines[..., 1:2, :] * t


def _line_overlap_fraction(pts, lines, dist_th):
    """Fraction of sampled points of each source line lying on each target
    segment (perpendicular distance < dist_th AND projection inside).

    pts: (..., L0, n, 2); lines: (..., L1, 2, 2) -> (..., L0, L1).
    """
    a = lines[..., 0, :]  # (..., L1, 2)
    b = lines[..., 1, :]
    ab = b - a
    len2 = jnp.maximum(jnp.sum(ab**2, -1), 1e-8)  # (..., L1)
    # (..., L0, n, L1, 2) diffs
    d = pts[..., :, :, None, :] - a[..., None, None, :, :]
    tproj = jnp.sum(d * ab[..., None, None, :, :], -1) / len2[..., None, None, :]
    proj = a[..., None, None, :, :] + tproj[..., None] * ab[..., None, None, :, :]
    perp = jnp.linalg.norm(pts[..., :, :, None, :] - proj, axis=-1)
    on = (perp < dist_th) & (tproj >= 0.0) & (tproj <= 1.0)
    return jnp.mean(on.astype(jnp.float32), axis=-2)  # mean over samples


def gt_line_matches_from_homography(
    lines0: jnp.ndarray,
    lines1: jnp.ndarray,
    H: jnp.ndarray,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    n_samples: int = 21,
    dist_th: float = 5.0,
    overlap_th: float = 0.2,
):
    """GT line matches under a homography
    (reference `gt_line_matches_from_homography:1050`).

    Both-direction segment overlap; mutual-max positives above overlap_th,
    negatives when a line overlaps nothing, invalid lines IGNORE.
    """
    from .homography import warp_points

    if valid0 is None:
        valid0 = jnp.ones(lines0.shape[:-2], bool)
    if valid1 is None:
        valid1 = jnp.ones(lines1.shape[:-2], bool)
    pts0 = _line_point_samples(lines0, n_samples)  # (..., L0, n, 2)
    shape0 = pts0.shape
    pts0_1 = warp_points(pts0.reshape(shape0[:-3] + (-1, 2)), H, inverse=False)
    pts0_1 = pts0_1.reshape(shape0)
    pts1 = _line_point_samples(lines1, n_samples)
    shape1 = pts1.shape
    pts1_0 = warp_points(pts1.reshape(shape1[:-3] + (-1, 2)), H, inverse=True)
    pts1_0 = pts1_0.reshape(shape1)

    ov01 = _line_overlap_fraction(pts0_1, lines1, dist_th)  # (..., L0, L1)
    ov10 = jnp.swapaxes(
        _line_overlap_fraction(pts1_0, lines0, dist_th), -1, -2
    )  # (..., L0, L1)
    overlap = jnp.minimum(ov01, ov10)
    mask = valid0[..., :, None] & valid1[..., None, :]
    overlap = jnp.where(mask, overlap, 0.0)

    # mutual-max assignment on overlap (higher = better)
    dist = _masked_dist(1.0 - overlap, mask)  # reuse min-based machinery
    assignment, m0, m1 = _assignment_from_dist(
        dist, valid0, valid1, pos_th=1.0 - overlap_th, neg_th=1.0 - 1e-6
    )
    return {
        "gt_line_assignment": assignment,
        "gt_line_matches0": m0,
        "gt_line_matches1": m1,
        "gt_line_overlap": overlap,
    }


def gt_matches_from_sparse_map(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    p3d_ids0: jnp.ndarray,
    p3d_ids1: jnp.ndarray,
    kp0_depth: jnp.ndarray,
    kp1_depth: jnp.ndarray,
    cam0: Camera,
    cam1: Camera,
    T_0to1: Pose,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    pos_th: float = 3.0,
    neg_th: float = 5.0,
):
    """GT matches from a sparse SfM map
    (reference `gt_matches_from_pose_sparse_map:442`).

    Positives come from shared 3D point IDs (exact track co-visibility);
    negatives from sparse-depth reprojection distances: a keypoint with valid
    depth whose reprojection is far from every other keypoint is UNMATCHED;
    keypoints without depth/track are IGNORE.
    """
    if valid0 is None:
        valid0 = jnp.ones(kp0.shape[:-1], bool)
    if valid1 is None:
        valid1 = jnp.ones(kp1.shape[:-1], bool)

    has_id0 = (p3d_ids0 >= 0) & valid0
    has_id1 = (p3d_ids1 >= 0) & valid1
    same_id = (
        (p3d_ids0[..., :, None] == p3d_ids1[..., None, :])
        & has_id0[..., :, None]
        & has_id1[..., None, :]
    )  # (..., N, M) exact positives

    # reprojection for negative labels
    kp0_1, pv0 = project(
        kp0, kp0_depth, None, cam0, cam1, T_0to1, valid0 & (kp0_depth > 0)
    )
    kp1_0, pv1 = project(
        kp1, kp1_depth, None, cam1, cam0, T_0to1.inv(), valid1 & (kp1_depth > 0)
    )
    dist0 = jnp.linalg.norm(kp0_1[..., :, None, :] - kp1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kp0[..., :, None, :] - kp1_0[..., None, :, :], axis=-1)
    mask = valid0[..., :, None] & valid1[..., None, :]
    d0m = _masked_dist(jnp.where(pv0[..., :, None], dist0, INF), mask)
    d1m = _masked_dist(jnp.where(pv1[..., None, :], dist1, INF), mask)

    N, M = same_id.shape[-2], same_id.shape[-1]
    m0_pos = jnp.argmax(same_id, axis=-1)
    any0 = jnp.any(same_id, axis=-1)
    m1_pos = jnp.argmax(same_id, axis=-2)
    any1 = jnp.any(same_id, axis=-2)

    negative0 = (jnp.min(d0m, axis=-1) > neg_th) & pv0 & valid0
    negative1 = (jnp.min(d1m, axis=-2) > neg_th) & pv1 & valid1

    matches0 = jnp.where(
        any0, m0_pos, jnp.where(negative0, UNMATCHED_FEATURE, IGNORE_FEATURE)
    )
    matches1 = jnp.where(
        any1, m1_pos, jnp.where(negative1, UNMATCHED_FEATURE, IGNORE_FEATURE)
    )
    matches0 = jnp.where(valid0, matches0, IGNORE_FEATURE)
    matches1 = jnp.where(valid1, matches1, IGNORE_FEATURE)
    return {
        "gt_assignment": same_id,
        "gt_matches0": matches0.astype(jnp.int32),
        "gt_matches1": matches1.astype(jnp.int32),
        "gt_kp0_1": kp0_1,
        "gt_kp1_0": kp1_0,
    }


def gt_matches_from_roma_warp(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    warp_0to1: jnp.ndarray,
    certainty: jnp.ndarray,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    pos_th: float = 3.0,
    neg_th: float = 6.0,
    certainty_th: float = 0.5,
    warp_1to0: jnp.ndarray | None = None,
    cycle_th: float | None = 4.0,
):
    """Pseudo-GT from a cached dense matcher warp
    (reference `gt_matches_from_roma:61` / `roma_gt_matcher.py:302`).

    warp_0to1: (..., H, W, 2) maps view0 pixels to view1 coords;
    certainty: (..., H, W) in [0, 1]. Keypoints in low-certainty regions are
    IGNORE; with warp_1to0 given, forward-backward cycle error above
    `cycle_th` also demotes to IGNORE.
    """
    if valid0 is None:
        valid0 = jnp.ones(kp0.shape[:-1], bool)
    if valid1 is None:
        valid1 = jnp.ones(kp1.shape[:-1], bool)

    def sample_field(field, pts):
        # bilinear sample of a (..., H, W, C) field at (..., N, 2) pixels
        C = field.shape[-1]
        outs = [
            sample_depth_bilinear(
                jnp.where(jnp.abs(field[..., c]) > 0, field[..., c], 1e-12), pts
            )[0]
            for c in range(C)
        ]
        return jnp.stack(outs, axis=-1)

    kp0_1 = sample_field(warp_0to1, kp0)  # (..., N, 2)
    cert0 = sample_depth_bilinear(jnp.maximum(certainty, 1e-12), kp0)[0]
    confident0 = (cert0 > certainty_th) & valid0

    if warp_1to0 is not None and cycle_th is not None:
        kp0_back = sample_field(warp_1to0, kp0_1)
        cyc = jnp.linalg.norm(kp0_back - kp0, axis=-1)
        confident0 = confident0 & (cyc < cycle_th)

    dist = jnp.linalg.norm(
        kp0_1[..., :, None, :] - kp1[..., None, :, :], axis=-1
    )
    mask = confident0[..., :, None] & valid1[..., None, :]
    dist = _masked_dist(dist, mask)
    assignment, m0, m1 = _assignment_from_dist(
        dist, valid0, valid1, pos_th, neg_th,
        can_neg0=confident0,
        can_neg1=jnp.ones_like(valid1),
    )
    return {
        "gt_assignment": assignment,
        "gt_matches0": m0,
        "gt_matches1": m1,
        "gt_kp0_1": kp0_1,
        "gt_certainty0": cert0,
    }


def gt_line_matches_from_pose_depth(
    lines0: jnp.ndarray,
    lines1: jnp.ndarray,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    cam0: Camera,
    cam1: Camera,
    T_0to1: Pose,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    n_samples: int = 21,
    dist_th: float = 5.0,
    overlap_th: float = 0.2,
):
    """GT line matches from pose + dense depth
    (reference `gt_line_matches_from_pose_depth:848`).

    Points sampled along each segment are reprojected through the depth maps;
    pairwise overlap = fraction of valid reprojected samples lying on the
    other segment (perpendicular distance + in-segment projection). Lines
    with too few valid depth samples are IGNORE.
    """
    if valid0 is None:
        valid0 = jnp.ones(lines0.shape[:-2], bool)
    if valid1 is None:
        valid1 = jnp.ones(lines1.shape[:-2], bool)

    def reproject_samples(lines, depth_src, cam_src, cam_dst, T, flat_batch):
        pts = _line_point_samples(lines, n_samples)  # (..., L, n, 2)
        shape = pts.shape
        flat = pts.reshape(shape[:-3] + (-1, 2))
        d, dv = sample_depth_bilinear(depth_src, flat)
        proj, pv = project(flat, d, None, cam_src, cam_dst, T, dv)
        return proj.reshape(shape), (pv & dv).reshape(shape[:-1])

    pts0_1, v0s = reproject_samples(lines0, depth0, cam0, cam1, T_0to1, None)
    pts1_0, v1s = reproject_samples(
        lines1, depth1, cam1, cam0, T_0to1.inv(), None
    )

    def overlap_valid(pts, sample_valid, target_lines):
        # fraction over VALID samples only
        a = target_lines[..., 0, :]
        b = target_lines[..., 1, :]
        ab = b - a
        len2 = jnp.maximum(jnp.sum(ab**2, -1), 1e-8)
        d = pts[..., :, :, None, :] - a[..., None, None, :, :]
        tproj = jnp.sum(d * ab[..., None, None, :, :], -1) / len2[..., None, None, :]
        proj = a[..., None, None, :, :] + tproj[..., None] * ab[..., None, None, :, :]
        perp = jnp.linalg.norm(pts[..., :, :, None, :] - proj, axis=-1)
        on = (perp < dist_th) & (tproj >= 0.0) & (tproj <= 1.0)
        on = on & sample_valid[..., :, :, None]
        n_valid = jnp.maximum(
            jnp.sum(sample_valid[..., :, :, None], axis=-2), 1
        )  # (..., L0, L1)
        frac = jnp.sum(on, axis=-2) / n_valid
        enough = jnp.sum(sample_valid, axis=-1, keepdims=True) >= max(
            2, n_samples // 4
        )
        return jnp.where(enough, frac, 0.0), enough[..., 0]

    ov01, enough0 = overlap_valid(pts0_1, v0s, lines1)
    ov10, enough1 = overlap_valid(pts1_0, v1s, lines0)
    overlap = jnp.minimum(ov01, jnp.swapaxes(ov10, -1, -2))
    mask = valid0[..., :, None] & valid1[..., None, :]
    overlap = jnp.where(mask, overlap, 0.0)

    dist = _masked_dist(1.0 - overlap, mask)
    assignment, m0, m1 = _assignment_from_dist(
        dist, valid0, valid1, pos_th=1.0 - overlap_th, neg_th=1.0 - 1e-6,
        can_neg0=enough0, can_neg1=enough1,
    )
    return {
        "gt_line_assignment": assignment,
        "gt_line_matches0": m0,
        "gt_line_matches1": m1,
        "gt_line_overlap": overlap,
    }
