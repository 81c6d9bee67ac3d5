"""Device-resident batched LO-RANSAC.

TPU-native replacement for the reference's external C++ estimators (PoseLib /
OpenCV / pycolmap, SURVEY.md §2.9): instead of a sequential host loop with
adaptive iteration counts, we evaluate a *fixed batch of S hypotheses in
parallel* — minimal-solver linear algebra as batched 9x9 eigendecompositions
(MXU-friendly), inlier scoring as one (S, N) matrix op, followed by a few
local-optimization (LO) refits on soft inlier weights. All shapes static, so
the whole sweep `for th in thresholds: for pair in pairs: ransac(...)`
(reference `eval/hpatches.py:144-150`) becomes a single vmapped XLA launch.

Scoring is MSAC-style truncated quadratic, which matches LO-RANSAC quality
significantly better than 0/1 inlier counting.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.epipolar import decompose_essential_matrix
from ..geometry.homography import compute_homography_dlt, sym_homography_error


class RansacResult(NamedTuple):
    M: jnp.ndarray  # model: H (3,3) or E (3,3)
    inliers: jnp.ndarray  # (N,) bool
    score: jnp.ndarray  # scalar MSAC score (higher = better)
    success: jnp.ndarray  # scalar bool


def _sample_minimal_sets(key, weights: jnp.ndarray, num_hyps: int, sample_size: int):
    """(num_hyps, sample_size) indices drawn w/o replacement ∝ weights.

    Gumbel-top-k trick: one (S, N) noise matrix, top-k per row. Invalid points
    (weight 0) get -inf logits and are never chosen (provided >= sample_size
    valid points exist; otherwise duplicates of valid points appear, which
    yields degenerate models that score poorly and are discarded).
    """
    logits = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-12)), -jnp.inf)
    g = jax.random.gumbel(key, (num_hyps,) + logits.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logits[None] + g, sample_size)
    return idx


def _msac_score(err2: jnp.ndarray, th2: float, valid: jnp.ndarray):
    """Truncated-quadratic score per hypothesis. err2: (S, N)."""
    w = jnp.maximum(0.0, 1.0 - err2 / th2) * valid[None]
    return jnp.sum(w, axis=-1), w


def _magsac_score(err2: jnp.ndarray, th2: float, valid: jnp.ndarray, n_sigmas: int = 8):
    """MAGSAC-style sigma-consensus score per hypothesis. err2: (S, N).

    Instead of committing to one inlier threshold, marginalize the truncated
    quadratic over a discretized set of noise scales tau_k = (k/K) * th,
    k = 1..K (MAGSAC's sigma-partitioning, Barath et al., vectorized as one
    broadcast instead of a per-scale host loop). Points with residuals far
    below every scale keep weight ~1; points near the maximum threshold only
    register at the widest scales, so a mis-set (too large) `th` degrades the
    model far less than hard MSAC truncation. With n_sigmas=1 this is exactly
    `_msac_score`. The same marginal weights drive the IRLS local
    optimization (sigma-consensus polishing).

    Replaces the reference's fixed-threshold PoseLib/OpenCV scoring
    (reference `robust_estimators/*/poselib.py`) with a threshold-robust
    variant; kept opt-in via the estimators' `scoring` conf.
    """
    k = jnp.arange(1, n_sigmas + 1, dtype=err2.dtype)  # (K,)
    tau2 = th2 * (k / n_sigmas) ** 2  # (K,)
    # (S, N, K) broadcast, mean over scales
    w = jnp.maximum(0.0, 1.0 - err2[..., None] / tau2)
    w = jnp.mean(w, axis=-1) * valid[None]
    return jnp.sum(w, axis=-1), w


def _make_score_fn(scoring: str, n_sigmas: int = 8):
    if scoring == "msac":
        return _msac_score
    if scoring == "magsac":
        return lambda err2, th2, valid: _magsac_score(err2, th2, valid, n_sigmas)
    raise ValueError(f"unknown scoring {scoring!r}")  # pragma: no cover


# ---------------------------------------------------------------------------
# Homography
# ---------------------------------------------------------------------------


def ransac_homography(
    key,
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    valid: jnp.ndarray,
    th: float = 3.0,
    num_hyps: int = 512,
    lo_iters: int = 3,
    min_matches: int = 4,
    scoring: str = "msac",
    n_sigmas: int = 8,
) -> RansacResult:
    """Single-pair homography LO-RANSAC. pts: (N, 2); valid: (N,) bool.

    Parity target: PoseLib `estimate_homography`
    (reference `robust_estimators/homography/poselib.py:8-40`).
    scoring="magsac" marginalizes over noise scales (see `_magsac_score`).
    """
    N = pts0.shape[0]
    score_fn = _make_score_fn(scoring, n_sigmas)
    validf = valid.astype(jnp.float32)
    idx = _sample_minimal_sets(key, validf, num_hyps, 4)  # (S, 4)
    p0 = pts0[idx]  # (S, 4, 2)
    p1 = pts1[idx]
    H = compute_homography_dlt(p0, p1)  # (S, 3, 3)
    err = sym_homography_error(pts0[None], pts1[None], H)  # (S, N)
    err2 = err**2
    th2 = th * th
    scores, w = score_fn(err2, th2, validf)
    best = jnp.argmax(scores)
    H_best = H[best]
    w_best = w[best]

    # local optimization: iteratively reweighted DLT on soft inliers
    def lo_step(carry, _):
        H_cur, w_cur, s_cur = carry
        H_new = compute_homography_dlt(pts0, pts1, w_cur)
        e2 = sym_homography_error(pts0, pts1, H_new) ** 2
        s_new, w_new = score_fn(e2[None], th2, validf)
        s_new = s_new[0]
        w_new = w_new[0]
        better = s_new > s_cur
        return (
            jnp.where(better, H_new, H_cur),
            jnp.where(better, w_new, w_cur),
            jnp.maximum(s_new, s_cur),
        ), None

    (H_final, w_final, score), _ = jax.lax.scan(
        lo_step, (H_best, w_best, scores[best]), None, length=lo_iters
    )
    err_final = sym_homography_error(pts0, pts1, H_final)
    inliers = (err_final < th) & valid
    success = jnp.sum(valid) >= min_matches
    H_final = jnp.where(success, H_final, jnp.eye(3, dtype=H_final.dtype))
    return RansacResult(H_final, inliers & success, score, success)


def ransac_homography_adaptive(
    key,
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    valid: jnp.ndarray,
    th: float = 3.0,
    max_hyps: int = 2048,
    chunk: int = 128,
    confidence: float = 0.99,
    lo_iters: int = 3,
    min_matches: int = 4,
    scoring: str = "msac",
    n_sigmas: int = 8,
):
    """Adaptive-iteration homography LO-RANSAC (PoseLib-parity early
    termination; reference `robust_estimators/homography/poselib.py:8-40`
    with `max_iterations`/`success_prob`).

    The classic sequential stopping rule k >= log(1-conf) / log(1-eps^4)
    (eps = best inlier ratio so far) mapped onto TPU control flow: an
    early-exit `lax.while_loop` over hypothesis CHUNKS — each iteration
    solves+scores `chunk` minimal samples as one batched op (MXU-sized), so
    the loop exits after ceil(k/chunk) iterations instead of always paying
    `max_hyps`. High-inlier pairs (the common eval case) stop after 1-2
    chunks; degenerate pairs fall back to the fixed budget. Returns
    (RansacResult, hyps_evaluated).
    """
    score_fn = _make_score_fn(scoring, n_sigmas)
    validf = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(validf), 1.0)
    th2 = th * th
    n_chunks = max(max_hyps // chunk, 1)
    log_fail = jnp.log(jnp.asarray(1.0 - confidence, jnp.float32))

    def sample_and_score(k):
        idx = _sample_minimal_sets(k, validf, chunk, 4)
        H = compute_homography_dlt(pts0[idx], pts1[idx])
        err2 = sym_homography_error(pts0[None], pts1[None], H) ** 2
        s, w = score_fn(err2, th2, validf)
        b = jnp.argmax(s)
        inl = jnp.sum((err2[b] < th2) * validf)
        return s[b], H[b], w[b], inl

    def cond_fn(state):
        i, _, _, _, needed, _ = state
        return (i < n_chunks) & (i * chunk < needed)

    def body_fn(state):
        i, best, key, _, needed, best_inl = state
        best_s, best_H, best_w = best
        key, k = jax.random.split(key)
        s, H, w, inl = sample_and_score(k)
        better = s > best_s
        best = (
            jnp.maximum(s, best_s),
            jnp.where(better, H, best_H),
            jnp.where(better, w, best_w),
        )
        best_inl = jnp.maximum(best_inl, inl)
        eps = jnp.clip(best_inl / n_valid, 1e-6, 1.0 - 1e-6)
        # samples needed for `confidence` odds of one all-inlier 4-set
        k_req = log_fail / jnp.log1p(-(eps**4) + 1e-12)
        needed = jnp.minimum(needed, jnp.ceil(k_req))
        return (i + 1, best, key, jnp.float32(0), needed, best_inl)

    init = (
        jnp.int32(0),
        (
            jnp.float32(-jnp.inf),
            jnp.eye(3, dtype=pts0.dtype),
            jnp.zeros(pts0.shape[0], jnp.float32),
        ),
        key,
        jnp.float32(0),
        jnp.float32(max_hyps),
        jnp.float32(0),
    )
    i, (score_b, H_best, w_best), *_ = jax.lax.while_loop(
        cond_fn, body_fn, init
    )

    # identical LO polish to the fixed-batch path
    def lo_step(carry, _):
        H_cur, w_cur, s_cur = carry
        H_new = compute_homography_dlt(pts0, pts1, w_cur)
        e2 = sym_homography_error(pts0, pts1, H_new) ** 2
        s_new, w_new = score_fn(e2[None], th2, validf)
        s_new, w_new = s_new[0], w_new[0]
        better = s_new > s_cur
        return (
            jnp.where(better, H_new, H_cur),
            jnp.where(better, w_new, w_cur),
            jnp.maximum(s_new, s_cur),
        ), None

    (H_final, _, score), _ = jax.lax.scan(
        lo_step, (H_best, w_best, score_b), None, length=lo_iters
    )
    err_final = sym_homography_error(pts0, pts1, H_final)
    inliers = (err_final < th) & valid
    success = jnp.sum(valid) >= min_matches
    H_final = jnp.where(success, H_final, jnp.eye(3, dtype=H_final.dtype))
    return RansacResult(H_final, inliers & success, score, success), i * chunk


# ---------------------------------------------------------------------------
# Essential matrix / relative pose
# ---------------------------------------------------------------------------


def _essential_8pt(p0: jnp.ndarray, p1: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Batched weighted 8-point algorithm in normalized coords.

    p0, p1: (..., N>=8, 2) normalized image coords. Returns E (..., 3, 3) with
    enforced (1, 1, 0) singular values.
    """
    dtype = jnp.promote_types(p0.dtype, jnp.float32)
    x0, y0 = p0[..., 0].astype(dtype), p0[..., 1].astype(dtype)
    x1, y1 = p1[..., 0].astype(dtype), p1[..., 1].astype(dtype)
    ones = jnp.ones_like(x0)
    # rows of the constraint x1^T E x0 = 0
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )  # (..., N, 9)
    if weights is not None:
        A = A * jnp.sqrt(jnp.maximum(weights, 0.0))[..., None].astype(dtype)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)
    e = V[..., :, 0]
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project onto the essential manifold: singular values -> (1, 1, 0)
    U, S, Vt = jnp.linalg.svd(E)
    S_clean = jnp.stack(
        [jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]), jnp.zeros_like(S[..., 0])],
        axis=-1,
    )
    return U @ (S_clean[..., :, None] * Vt)


def _triangulate_midpoint(R, t, p0, p1):
    """Depths of midpoint triangulation for cheirality checks.

    R, t: candidate pose; p0, p1: (N, 2) normalized coords.
    Returns (z0, z1) depths in both frames.
    """
    r0 = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], -1)  # (N, 3)
    r1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    r0_in_1 = r0 @ R.T  # rotate ray 0 into frame 1
    # solve [r0_in_1, -r1] [z0, z1]^T = -t  (least squares per point, 3x2)
    a = r0_in_1
    b = -r1
    taa = jnp.sum(a * a, -1)
    tbb = jnp.sum(b * b, -1)
    tab = jnp.sum(a * b, -1)
    ta = -jnp.sum(a * t, -1)
    tb = -jnp.sum(b * t, -1)
    det = taa * tbb - tab * tab
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (ta * tbb - tb * tab) / det
    z1 = (taa * tb - tab * ta) / det
    return z0, z1


def _sampson_error(E, p0, p1):
    """First-order (Sampson) epipolar error of matched pairs. E: (3, 3)."""
    ones = jnp.ones_like(p0[..., :1])
    p0h = jnp.concatenate([p0, ones], -1)
    p1h = jnp.concatenate([p1, ones], -1)
    Ep0 = p0h @ E.T  # (N, 3)
    Etp1 = p1h @ E
    num = jnp.sum(p1h * Ep0, axis=-1)
    den = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, 1e-15))


def refine_pose_gn(R0, t0, p0, p1, validf, th2, iters: int = 8, score_fn=_msac_score):
    """Local optimization on the pose manifold (PoseLib-parity LO).

    Gauss-Newton on the 5-DOF parametrization (so3 tangent of R, 2-dim
    tangent of the unit translation), minimizing MSAC-truncated Sampson
    error. This is the correct LO for essential matrices: a *linear* refit
    (weighted 8-point) is rank-deficient on planar scenes and can replace a
    good minimal-solver pose with a degenerate one, whereas the manifold
    parametrization cannot leave the space of valid poses.

    Returns (R, t, E) refined.
    """
    # tangent basis of the unit translation t0: two vectors orthogonal to t0
    a = jnp.where(jnp.abs(t0[0]) < 0.9, jnp.array([1.0, 0.0, 0.0], t0.dtype),
                  jnp.array([0.0, 1.0, 0.0], t0.dtype))
    b1 = jnp.cross(t0, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t0, b1)
    Bt = jnp.stack([b1, b2], axis=-1)  # (3, 2)

    from ..geometry.utils import so3exp_map, skew_symmetric

    def pose_of(params):
        R = R0 @ so3exp_map(params[:3])
        t = t0 + Bt @ params[3:]
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, t

    def resid(params):
        R, t = pose_of(params)
        E = skew_symmetric(t) @ R
        return _sampson_error(E, p0, p1)

    def step(params, _):
        r = resid(params)
        w = score_fn((r * r)[None], th2, validf)[1][0]  # robust IRLS weights
        J = jax.jacfwd(resid)(params)  # (N, 5)
        JtW = J.T * w[None]
        A = JtW @ J
        g = JtW @ r
        A = A + 1e-8 * jnp.trace(A) * jnp.eye(5, dtype=A.dtype)
        delta = jnp.linalg.solve(A, g)
        new = params - delta
        # keep the step only if the robust score improves
        def obj(p):
            rr = resid(p) ** 2
            return -score_fn(rr[None], th2, validf)[0][0]

        better = obj(new) < obj(params)
        return jnp.where(better, new, params), None

    params0 = jnp.zeros(5, p0.dtype)
    params, _ = jax.lax.scan(step, params0, None, length=iters)
    R, t = pose_of(params)
    E = skew_symmetric(t) @ R
    return R, t, E


def pose_from_essential(E, p0, p1, weights):
    """Choose (R, t) among the 4 decompositions of E by weighted cheirality."""
    R1, R2, t = decompose_essential_matrix(E)
    candidates = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = []
    for R, tt in candidates:
        z0, z1 = _triangulate_midpoint(R, tt, p0, p1)
        counts.append(jnp.sum(((z0 > 0) & (z1 > 0)) * weights))
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    return Rs[best], ts[best]


def ransac_essential(
    key,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    valid: jnp.ndarray,
    th: float = 1e-3,
    num_hyps: int = 1024,
    lo_iters: int = 3,
    min_matches: int = 8,
    solver: str = "5pt",
    scoring: str = "msac",
    n_sigmas: int = 8,
):
    """Single-pair essential-matrix LO-RANSAC in normalized coords.

    p0, p1: (N, 2) normalized (K^-1) coords; th in normalized units
    (pixel_th / mean focal). Returns (RansacResult with M=E, R, t).
    Parity target: PoseLib `estimate_relative_pose`
    (reference `robust_estimators/relative_pose/poselib.py:9-45`).

    solver: "5pt" (Nister minimal solver, `ops/essential_5pt.py` — the
    PoseLib-parity default; correct on planar/low-parallax scenes where 8-pt
    collapses) or "8pt". `num_hyps` counts *scored hypotheses*; the 5-pt
    path draws `num_hyps // 30` minimal samples, each yielding up to 30
    candidates (10 roots x 3 hidden-variable groupings). LO refits use the
    weighted 8-point solve on soft inliers in both modes — with enough
    soft inliers the 8-pt refit is well posed even when the scene is planar
    for the *minimal* sample.
    """
    score_fn = _make_score_fn(scoring, n_sigmas)
    validf = valid.astype(jnp.float32)
    if solver == "5pt":
        from .essential_5pt import essential_5pt

        n_samples = max(1, num_hyps // 30)
        idx = _sample_minimal_sets(key, validf, n_samples, 5)  # (S, 5)
        E, E_valid = essential_5pt(p0[idx], p1[idx])  # (S, 30, 3, 3)
        E = E.reshape(-1, 3, 3)
        E_valid = E_valid.reshape(-1)
    elif solver == "8pt":
        idx = _sample_minimal_sets(key, validf, num_hyps, 8)  # (S, 8)
        E = _essential_8pt(p0[idx], p1[idx])  # (S, 3, 3)
        E_valid = jnp.ones(E.shape[0], bool)
    else:  # pragma: no cover
        raise ValueError(f"unknown essential solver {solver!r}")
    err = _matched_epi_distance(E, p0, p1)  # (S, N)
    th2 = th * th
    scores, w = score_fn(err**2, th2, validf)
    scores = jnp.where(E_valid, scores, -jnp.inf)
    best = jnp.argmax(scores)
    E_best = E[best]
    w_best = w[best]
    score_best = scores[best]

    # local optimization on the pose manifold: decompose the best minimal
    # model by cheirality, then Gauss-Newton over (R, t). See refine_pose_gn
    # for why a linear (weighted 8-point) refit is NOT used here.
    R0, t0 = pose_from_essential(E_best, p0, p1, w_best)
    R_gn, t_gn, E_gn = refine_pose_gn(
        R0, t0, p0, p1, validf, th2, iters=4 * lo_iters, score_fn=score_fn
    )
    err_gn = _matched_epi_distance(E_gn[None], p0, p1)[0]
    score_gn, _ = score_fn(err_gn[None] ** 2, th2, validf)
    score_gn = score_gn[0]
    use_gn = score_gn >= score_best
    E_final = jnp.where(use_gn, E_gn, E_best)
    score = jnp.maximum(score_gn, score_best)

    err_final = _matched_epi_distance(E_final[None], p0, p1)[0]
    inliers = (err_final < th) & valid
    success = jnp.sum(valid) >= min_matches
    R_alt, t_alt = pose_from_essential(E_best, p0, p1, inliers.astype(jnp.float32))
    R = jnp.where(use_gn, R_gn, R_alt)
    t = jnp.where(use_gn, t_gn, t_alt)
    return RansacResult(E_final, inliers & success, score, success), R, t


def _matched_epi_distance(E: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray):
    """Symmetric epipolar distance of *matched* pairs under each hypothesis.

    E: (S, 3, 3); p0, p1: (N, 2) -> (S, N).
    """
    ones = jnp.ones_like(p0[..., :1])
    p0h = jnp.concatenate([p0, ones], -1)  # (N, 3)
    p1h = jnp.concatenate([p1, ones], -1)
    Ep0 = jnp.einsum("sij,nj->sni", E, p0h)  # (S, N, 3)
    Etp1 = jnp.einsum("sji,nj->sni", E, p1h)
    p1Ep0 = jnp.sum(p1h[None] * Ep0, axis=-1)  # (S, N)
    n0 = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2
    n1 = Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    d = jnp.abs(p1Ep0) * (
        1.0 / jnp.sqrt(jnp.maximum(n0, 1e-15)) + 1.0 / jnp.sqrt(jnp.maximum(n1, 1e-15))
    )
    return d / 2.0


# ---------------------------------------------------------------------------
# Point + line hybrid homography (homography_est replacement)
# ---------------------------------------------------------------------------


def _line_homography_residual(H: jnp.ndarray, lines0: jnp.ndarray, lines1: jnp.ndarray):
    """Perpendicular distance of warped line-0 endpoints to the infinite
    line of their matched segment in view 1.

    H: (S, 3, 3); lines0/lines1: (L, 2, 2) matched segments -> (S, L).
    """
    from ..geometry.homography import warp_points

    eps0 = lines0.reshape(-1, 2)  # (2L, 2)
    warped = warp_points(eps0[None], H, inverse=False)  # (S, 2L, 2)
    S = H.shape[0]
    L = lines0.shape[0]
    warped = warped.reshape(S, L, 2, 2)
    a = lines1[None, :, 0, :]  # (1, L, 2)
    b = lines1[None, :, 1, :]
    ab = b - a
    norm = jnp.maximum(jnp.linalg.norm(ab, axis=-1), 1e-8)  # (1, L)
    # signed perpendicular distance of each endpoint: cross(ab, p - a) / |ab|
    def perp(p):
        d = p - a
        return jnp.abs(ab[..., 0] * d[..., 1] - ab[..., 1] * d[..., 0]) / norm

    return 0.5 * (perp(warped[:, :, 0]) + perp(warped[:, :, 1]))  # (S, L)


def ransac_homography_points_lines(
    key,
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    pts_valid: jnp.ndarray,
    lines0: jnp.ndarray,
    lines1: jnp.ndarray,
    lines_valid: jnp.ndarray,
    th: float = 3.0,
    line_th: float | None = None,
    num_hyps: int = 512,
    lo_iters: int = 3,
) -> RansacResult:
    """Hybrid point+line homography LO-RANSAC (the `homography_est`
    replacement, reference `robust_estimators/homography/homography_est.py`).

    Hypotheses come from 4-point minimal sets; MSAC scoring sums point
    symmetric-transfer and line endpoint-perpendicular residuals; local
    optimization refits the DLT on point inliers plus line-endpoint
    pseudo-correspondences (endpoint -> its foot on the matched line).
    """
    if line_th is None:
        line_th = th
    validf = pts_valid.astype(jnp.float32)
    lvalidf = lines_valid.astype(jnp.float32)
    idx = _sample_minimal_sets(key, validf, num_hyps, 4)
    H = compute_homography_dlt(pts0[idx], pts1[idx])  # (S, 3, 3)

    th2 = th * th
    lth2 = line_th * line_th

    def score_all(Hs):
        pe = sym_homography_error(pts0[None], pts1[None], Hs) ** 2  # (S, N)
        le = _line_homography_residual(Hs, lines0, lines1) ** 2  # (S, L)
        ps, pw = _msac_score(pe, th2, validf)
        ls, lw = _msac_score(le, lth2, lvalidf)
        return ps + ls, pw, lw

    scores, pw, lw = score_all(H)
    best = jnp.argmax(scores)
    H_best = H[best]
    pw_best, lw_best = pw[best], lw[best]

    from ..geometry.homography import warp_points

    def lo_step(carry, _):
        H_cur, pw_cur, lw_cur, s_cur = carry
        # line endpoints -> foot point on the matched target line
        eps0 = lines0.reshape(-1, 2)
        warped = warp_points(eps0[None], H_cur[None], inverse=False)[0]
        L = lines0.shape[0]
        a = jnp.repeat(lines1[:, 0, :], 2, axis=0)  # (2L, 2)
        b = jnp.repeat(lines1[:, 1, :], 2, axis=0)
        ab = b - a
        len2 = jnp.maximum(jnp.sum(ab**2, -1), 1e-8)
        t = jnp.sum((warped - a) * ab, -1) / len2
        foot = a + t[:, None] * ab
        lw_ep = jnp.repeat(lw_cur, 2, axis=0)
        all_p0 = jnp.concatenate([pts0, eps0], axis=0)
        all_p1 = jnp.concatenate([pts1, foot], axis=0)
        all_w = jnp.concatenate([pw_cur, lw_ep], axis=0)
        H_new = compute_homography_dlt(all_p0, all_p1, all_w)
        s_new, pw_new, lw_new = score_all(H_new[None])
        s_new = s_new[0]
        better = s_new > s_cur
        return (
            jnp.where(better, H_new, H_cur),
            jnp.where(better, pw_new[0], pw_cur),
            jnp.where(better, lw_new[0], lw_cur),
            jnp.maximum(s_new, s_cur),
        ), None

    (H_final, _, _, score), _ = jax.lax.scan(
        lo_step, (H_best, pw_best, lw_best, scores[best]), None, length=lo_iters
    )
    err = sym_homography_error(pts0, pts1, H_final)
    inliers = (err < th) & pts_valid
    success = (jnp.sum(pts_valid) + 2 * jnp.sum(lines_valid)) >= 4
    return RansacResult(H_final, inliers & success, score, success)
