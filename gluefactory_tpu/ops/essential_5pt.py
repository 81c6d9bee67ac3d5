"""Batched 5-point essential-matrix minimal solver (Nister / hidden-variable
resultant), TPU-native.

Parity target: the reference delegates relative pose to PoseLib's 5-point
Nister solver (`/root/reference/gluefactory/robust_estimators/relative_pose/
poselib.py:9-45`); the 8-point algorithm degrades on near-planar scenes and
low-parallax pairs, which is where MegaDepth pose-AUC is decided.

Design (correct-by-construction, no ported code):
  1. Nullspace basis E = x*B1 + y*B2 + z*B3 + B4 from the 5x9 epipolar
     constraint matrix via eigh(Q^T Q) (batched, MXU-friendly).
  2. The 10 cubic constraints det(E) = 0 and 2*E*E^T*E - tr(E*E^T)*E = 0 are
     expanded with generic trace-time polynomial algebra over the 20
     monomials of degree <= 3 in (x, y, z) (index tables built in numpy).
  3. Hidden-variable resultant: grouping by the 10 (x, y)-monomials turns the
     system into C(z) m(x, y) = 0 with C a 10x10 matrix whose entries are
     polynomials in z; a nontrivial solution needs det C(z) = 0, a degree-10
     polynomial in z recovered by evaluation at 16 Chebyshev nodes +
     least-squares interpolation (precomputed pseudo-inverse). The node dets
     are rescaled per sample before interpolation so the float32 path stays
     well conditioned.
  4. Real roots: the compactified polynomial q(t) = p(tan t) * cos^10(t) is
     evaluated on a uniform t-grid over (-pi/2, pi/2); sign changes bracket
     simple real roots (including large ones) and fixed-count bisection
     refines them. Static shapes throughout - no data-dependent control
     flow, so the whole solver jits into one program. (TPU has no
     nonsymmetric eigendecomposition, ruling out the usual action-matrix /
     companion-matrix route.)
  5. Degenerate-axis robustness: a pair of nearly equal roots compresses to
     one grid cell under the tan compactification and produces no sign
     change. The same constraint tensor is therefore solved under all three
     hidden-variable choices (z, x, y hidden — a permutation of the
     nullspace basis), and the candidate sets are unioned: a cluster along
     one axis is generically well separated along another. Measured GT
     recovery on random minimal problems: 86% with one grouping, 98% with
     three (float64).
  6. Back-substitution: for each root, the nullvector of C(z) (via SVD)
     yields x, y; a few damped Newton iterations on the full 10-polynomial
     system in (x, y, z) then polish each candidate to solver precision
     (this is what makes the float32/TPU path accurate, not just the f64
     path).

Everything is vmapped over hypothesis sets: `essential_5pt` maps (S, 5, 2)
minimal samples to (S, 30, 3, 3) candidate essential matrices with a
validity mask.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# trace-time polynomial algebra over monomials of degree <= 3 in (x, y, z)
# ---------------------------------------------------------------------------

# all exponent triples (i, j, k), i + j + k <= 3 -> 20 monomials
MONOS = [
    (i, j, k)
    for i in range(4)
    for j in range(4 - i)
    for k in range(4 - i - j)
]
M_IDX = {m: n for n, m in enumerate(MONOS)}
N_MONO = len(MONOS)  # 20
_MONO_EXP = np.asarray(MONOS)  # (20, 3)

# index of the linear monomials (for building E from the nullspace basis)
IX_X = M_IDX[(1, 0, 0)]
IX_Y = M_IDX[(0, 1, 0)]
IX_Z = M_IDX[(0, 0, 1)]
IX_1 = M_IDX[(0, 0, 0)]

# product table: list of (p, q, r) with mono[p] * mono[q] = mono[r]
_PROD = []
for p, (a, b, c) in enumerate(MONOS):
    for q, (d, e, f) in enumerate(MONOS):
        tot = (a + d, b + e, c + f)
        if sum(tot) <= 3:
            _PROD.append((p, q, M_IDX[tot]))
_PROD_P = np.asarray([t[0] for t in _PROD])
_PROD_Q = np.asarray([t[1] for t in _PROD])
_PROD_R = np.asarray([t[2] for t in _PROD])

# derivative tables: d/dvar maps mono r -> (coef, mono index); zeros routed
# to a dump slot via coef 0
_DIFF_IDX = np.zeros((3, N_MONO), np.int64)
_DIFF_COEF = np.zeros((3, N_MONO), np.float64)
for var in range(3):
    for n, exp in enumerate(MONOS):
        if exp[var] > 0:
            tgt = list(exp)
            tgt[var] -= 1
            _DIFF_IDX[var, n] = M_IDX[tuple(tgt)]
            _DIFF_COEF[var, n] = exp[var]


def poly_mul(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Multiply polynomials in the 20-monomial basis.

    P, Q: (..., 20). Degrees must be compatible (product degree <= 3); higher
    products never occur here because factors are degree <= 2 and <= 1.
    """
    terms = P[..., _PROD_P] * Q[..., _PROD_Q]  # (..., n_terms)
    out = jnp.zeros(P.shape[:-1] + (N_MONO,), P.dtype)
    return out.at[..., _PROD_R].add(terms)


# the 10 (x, y)-monomials for the hidden-variable grouping and, per
# (x, y, z)-monomial, its (column, z-power) coordinates in C(z)
XY_MONOS = [
    (3, 0), (2, 1), (1, 2), (0, 3),
    (2, 0), (1, 1), (0, 2),
    (1, 0), (0, 1), (0, 0),
]
XY_IDX = {m: n for n, m in enumerate(XY_MONOS)}
_COL = np.asarray([XY_IDX[(i, j)] for (i, j, _k) in MONOS])
_ZPOW = np.asarray([k for (_i, _j, k) in MONOS])
IX_MX = XY_IDX[(1, 0)]
IX_MY = XY_IDX[(0, 1)]
IX_M1 = XY_IDX[(0, 0)]

# interpolation: det C(z) has degree <= 10; recover its 11 coefficients from
# 16 Chebyshev nodes with a precomputed least-squares pseudo-inverse
_N_NODES = 16
_NODES = np.cos((2 * np.arange(_N_NODES) + 1) / (2.0 * _N_NODES) * np.pi)
_VAND = np.stack([_NODES**k for k in range(11)], axis=1)  # (16, 11)
_PINV = np.linalg.pinv(_VAND)  # (11, 16)

_N_ROOTS = 10
_GRID = 128  # sign-change grid over t in (-pi/2, pi/2)
_BISECT = 40
_NEWTON = 4

# the three hidden-variable choices: permutations of the (x, y, z) basis rows
_GROUPINGS = ((0, 1, 2), (2, 1, 0), (0, 2, 1))


def _constraint_polys(basis: jnp.ndarray) -> jnp.ndarray:
    """The 10 cubic constraint polynomials of the 5-point problem.

    basis: (..., 4, 9) nullspace basis [B1, B2, B3, B4] with
    E = x B1 + y B2 + z B3 + B4. Returns (..., 10, 20) coefficients with
    unit-norm rows (the constraints are homogeneous, so row scale is free
    and normalizing keeps the float32 determinant path conditioned).
    """
    shape = basis.shape[:-2]
    # E entries as linear polynomials: (..., 3, 3, 20)
    E = jnp.zeros(shape + (3, 3, N_MONO), basis.dtype)
    B = basis.reshape(shape + (4, 3, 3))
    for n, ix in enumerate((IX_X, IX_Y, IX_Z, IX_1)):
        E = E.at[..., ix].set(B[..., n, :, :])

    def e(i, j):
        return E[..., i, j, :]

    # det(E) (degree 3)
    def minor(i0, i1, j0, j1):
        return poly_mul(e(i0, j0), e(i1, j1)) - poly_mul(e(i0, j1), e(i1, j0))

    det = (
        poly_mul(e(0, 0), minor(1, 2, 1, 2))
        - poly_mul(e(0, 1), minor(1, 2, 0, 2))
        + poly_mul(e(0, 2), minor(1, 2, 0, 1))
    )

    # P = E E^T (degree 2), T = 2P - tr(P) I, then T E = 0 (9 eqs, degree 3)
    P = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc = poly_mul(e(i, 0), e(j, 0))
            acc = acc + poly_mul(e(i, 1), e(j, 1))
            acc = acc + poly_mul(e(i, 2), e(j, 2))
            P[i][j] = acc
    tr = P[0][0] + P[1][1] + P[2][2]
    T = [[2.0 * P[i][j] - (tr if i == j else 0.0) for j in range(3)] for i in range(3)]
    rows = [det]
    for i in range(3):
        for j in range(3):
            acc = poly_mul(T[i][0], e(0, j))
            acc = acc + poly_mul(T[i][1], e(1, j))
            acc = acc + poly_mul(T[i][2], e(2, j))
            rows.append(acc)
    cons = jnp.stack(rows, axis=-2)  # (..., 10, 20)
    norm = jnp.linalg.norm(cons, axis=-1, keepdims=True)
    return cons / jnp.maximum(norm, 1e-30)


def _group_hidden_variable(constraints: jnp.ndarray) -> jnp.ndarray:
    """(..., 10, 20) -> C(z) coefficients (..., 10 rows, 10 cols, 4 z-powers)."""
    shape = constraints.shape[:-1]
    C = jnp.zeros(shape + (10, 4), constraints.dtype)
    return C.at[..., _COL, _ZPOW].add(constraints)


def _eval_poly_z(C: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate C(z): C (..., 10, 10, 4), z (...,) -> (..., 10, 10)."""
    zp = jnp.stack([jnp.ones_like(z), z, z * z, z * z * z], axis=-1)
    return jnp.einsum("...rck,...k->...rc", C, zp)


def _det_poly_coeffs(C: jnp.ndarray) -> jnp.ndarray:
    """Degree-10 coefficients of det C(z) via node evaluation + interpolation.

    C: (..., 10, 10, 4) -> (..., 11) coefficients, ascending powers. The node
    determinants are rescaled to max |det| = 1 per sample (polynomial scale
    is irrelevant for roots, and raw dets underflow float32).
    """
    Cn = jnp.stack(
        [_eval_poly_z(C, jnp.full(C.shape[:-3], n, C.dtype)) for n in _NODES],
        axis=-3,
    )  # (..., 16, 10, 10)
    dets = jnp.linalg.det(Cn)  # (..., 16)
    scale = jnp.max(jnp.abs(dets), axis=-1, keepdims=True)
    dets = dets / jnp.maximum(scale, 1e-30)
    pinv = jnp.asarray(_PINV, C.dtype)
    return jnp.einsum("cn,...n->...c", pinv, dets)  # (..., 11)


def _eval_compact(coeffs: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """q(t) = p(tan t) * cos^10 t = sum_k c_k sin^k t cos^(10-k) t.

    Finite and smooth on [-pi/2, pi/2]; same sign pattern as p(tan t).
    coeffs: (..., 11); t: (..., G) -> (..., G).
    """
    s, c = jnp.sin(t), jnp.cos(t)
    out = jnp.zeros_like(t)
    for k in range(11):
        out = out + coeffs[..., k, None] * s**k * c ** (10 - k)
    return out


def _real_roots_deg10(coeffs: jnp.ndarray):
    """Simple real roots of a degree-10 polynomial, fixed shapes.

    coeffs: (..., 11) ascending. Returns (roots (..., 10), valid (..., 10)).
    Near-double roots inside one grid cell are missed here by construction;
    the caller compensates with multiple hidden-variable groupings.
    """
    eps = 1e-3  # stay clear of the tan poles
    t_grid = jnp.linspace(-np.pi / 2 + eps, np.pi / 2 - eps, _GRID)
    q = _eval_compact(coeffs, jnp.broadcast_to(t_grid, coeffs.shape[:-1] + (_GRID,)))
    sign_change = q[..., :-1] * q[..., 1:] < 0  # (..., G-1)
    # pick up to 10 bracket indices (top_k on mask, earliest first)
    order_scores = jnp.where(
        sign_change, -jnp.arange(_GRID - 1, dtype=jnp.float32), -jnp.inf
    )
    _, bidx = jax.lax.top_k(order_scores, _N_ROOTS)  # (..., 10)
    valid = jnp.take_along_axis(sign_change, bidx, axis=-1)

    lo = t_grid[bidx]
    hi = t_grid[bidx + 1]
    q_lo = _eval_compact(coeffs, lo)

    def bisect(state, _):
        lo, hi, q_lo = state
        mid = 0.5 * (lo + hi)
        q_mid = _eval_compact(coeffs, mid)
        same = q_lo * q_mid > 0
        lo_n = jnp.where(same, mid, lo)
        q_lo_n = jnp.where(same, q_mid, q_lo)
        hi_n = jnp.where(same, hi, mid)
        return (lo_n, hi_n, q_lo_n), None

    (lo, hi, _), _ = jax.lax.scan(bisect, (lo, hi, q_lo), None, length=_BISECT)
    roots = jnp.tan(0.5 * (lo + hi))
    return roots, valid


def _eval_monos(x, y, z):
    """Monomial vector (..., 20) at (x, y, z)."""
    pows = []
    for var in (x, y, z):
        p0 = jnp.ones_like(var)
        pows.append(jnp.stack([p0, var, var * var, var * var * var], axis=-1))
    px, py, pz = pows
    return (
        px[..., _MONO_EXP[:, 0]] * py[..., _MONO_EXP[:, 1]] * pz[..., _MONO_EXP[:, 2]]
    )


def _newton_polish(cons: jnp.ndarray, x, y, z):
    """Damped Gauss-Newton on the 10 constraint polynomials in (x, y, z).

    cons: (..., 10, 20); x, y, z: (..., R) candidate coordinates (R roots per
    sample). Polishes each candidate to solver precision — this is what makes
    the float32/TPU path accurate. Steps that increase the residual revert.
    """
    consb = cons[..., None, :, :]  # (..., 1, 10, 20)

    def residual(x, y, z):
        m = _eval_monos(x, y, z)  # (..., R, 20)
        F = jnp.einsum("...rc,...c->...r", consb, m)  # (..., R, 10)
        dm = []
        for var in range(3):
            dvar = m[..., _DIFF_IDX[var]] * jnp.asarray(_DIFF_COEF[var], m.dtype)
            dm.append(jnp.einsum("...rc,...c->...r", consb, dvar))
        J = jnp.stack(dm, axis=-1)  # (..., R, 10, 3)
        return F, J

    def step(carry, _):
        x, y, z, best = carry
        F, J = residual(x, y, z)
        JtJ = jnp.einsum("...ri,...rj->...ij", J, J)  # (..., 3, 3)
        JtF = jnp.einsum("...ri,...r->...i", J, F)
        damp = 1e-10 * jnp.trace(JtJ, axis1=-2, axis2=-1)[..., None]
        JtJ = JtJ + damp[..., None] * jnp.eye(3, dtype=JtJ.dtype)
        delta = jnp.linalg.solve(JtJ, JtF[..., None])[..., 0]  # (..., 3)
        xn, yn, zn = x - delta[..., 0], y - delta[..., 1], z - delta[..., 2]
        Fn, _ = residual(xn, yn, zn)
        new = jnp.linalg.norm(Fn, axis=-1)
        ok = (new < best) & jnp.isfinite(new)
        return (
            jnp.where(ok, xn, x),
            jnp.where(ok, yn, y),
            jnp.where(ok, zn, z),
            jnp.where(ok, new, best),
        ), None

    F0, _ = residual(x, y, z)
    best0 = jnp.linalg.norm(F0, axis=-1)
    (x, y, z, _), _ = jax.lax.scan(step, (x, y, z, best0), None, length=_NEWTON)
    return x, y, z


def _solve_grouping(basis: jnp.ndarray):
    """Candidates for one hidden-variable choice.

    basis: (S, 4, 9) with rows already permuted so the hidden variable is
    the third. Returns (E (S, 10, 3, 3), valid (S, 10)) — E in the
    *permuted* parametrization, which is basis-consistent so no unpermute
    is needed.
    """
    cons = _constraint_polys(basis)  # (S, 10, 20)
    C = _group_hidden_variable(cons)  # (S, 10, 10, 4)
    coeffs = _det_poly_coeffs(C)  # (S, 11)
    roots, valid = _real_roots_deg10(coeffs)  # (S, 10)

    # back-substitute each root: nullvector of C(z) -> (x, y)
    Cz = jax.vmap(_eval_poly_z, in_axes=(None, -1), out_axes=-3)(C, roots)
    # Cz: (S, 10 roots, 10, 10); nullvector = last right-singular vector
    _, _, Vt = jnp.linalg.svd(Cz)
    m = Vt[..., -1, :]  # (S, 10 roots, 10)
    denom = m[..., IX_M1]
    good = jnp.abs(denom) > 1e-8 * jnp.linalg.norm(m, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x = m[..., IX_MX] / denom
    y = m[..., IX_MY] / denom
    valid = valid & good

    x, y, z = _newton_polish(cons, x, y, roots)

    B = basis.reshape(basis.shape[:-2] + (4, 3, 3))  # (S, 4, 3, 3)
    E = (
        x[..., None, None] * B[..., None, 0, :, :]
        + y[..., None, None] * B[..., None, 1, :, :]
        + z[..., None, None] * B[..., None, 2, :, :]
        + B[..., None, 3, :, :]
    )  # (S, 10, 3, 3)
    return E, valid


def essential_5pt(p0: jnp.ndarray, p1: jnp.ndarray, groupings: int = 3):
    """Batched Nister 5-point solver.

    p0, p1: (S, 5, 2) normalized image coordinates of minimal samples.
    groupings: how many hidden-variable choices to union (1-3; 3 is the
    robust default, see module docstring item 5).
    Returns (E (S, 10 * groupings, 3, 3) candidates, valid mask of the same
    leading shape). E satisfies x1^T E x0 = 0 for the sample points;
    ||E||_F = sqrt(2) (unit singular pair after manifold projection).
    """
    dtype = jnp.promote_types(p0.dtype, jnp.float32)
    x0, y0 = p0[..., 0].astype(dtype), p0[..., 1].astype(dtype)
    x1, y1 = p1[..., 0].astype(dtype), p1[..., 1].astype(dtype)
    ones = jnp.ones_like(x0)
    Q = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )  # (S, 5, 9)
    # nullspace via direct SVD of Q (not eigh(Q^T Q): the squaring halves
    # float32 precision, and the basis error floors the whole solver)
    _, _, Vt = jnp.linalg.svd(Q, full_matrices=True)
    basis = Vt[..., 5:9, :]  # (S, 4, 9): B1..B4 = x, y, z, 1

    Es, valids = [], []
    for perm in _GROUPINGS[:groupings]:
        pbasis = basis[..., list(perm) + [3], :]
        E, valid = _solve_grouping(pbasis)
        Es.append(E)
        valids.append(valid)
    E = jnp.concatenate(Es, axis=-3)
    valid = jnp.concatenate(valids, axis=-1)

    # project onto the essential manifold (singular values -> (1, 1, 0))
    U, S, Vt = jnp.linalg.svd(E)
    S_clean = jnp.stack(
        [jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]), jnp.zeros_like(S[..., 0])],
        axis=-1,
    )
    E = U @ (S_clean[..., :, None] * Vt)
    return E, valid
