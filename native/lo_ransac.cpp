// Native LO-RANSAC: homography (4-pt DLT) and essential matrix (5-pt
// Nister / 8-pt) with MSAC scoring, local optimization (IRLS refits for H,
// pose-manifold Gauss-Newton for E), and adaptive iteration counts.
//
// This is the host-side counterpart of `gluefactory_tpu/ops/ransac.py`
// and the replacement for the reference's external PoseLib dependency
// (reference `robust_estimators/{homography,relative_pose}/poselib.py`):
// same algorithmic structure (LO-RANSAC), pure C++ (no Eigen), exposed via
// a C ABI consumed through ctypes.
//
// Build: g++ -O3 -shared -fPIC -o liblo_ransac.so lo_ransac.cpp

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// small dense linear algebra (row-major)
// ---------------------------------------------------------------------------

// Jacobi eigen-decomposition of a symmetric n x n matrix (n <= 9).
// A is destroyed; V receives eigenvectors (columns); d the eigenvalues.
void jacobi_eigen(double* A, int n, double* V, double* d) {
  for (int i = 0; i < n * n; ++i) V[i] = 0.0;
  for (int i = 0; i < n; ++i) V[i * n + i] = 1.0;
  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < n; ++p)
      for (int q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
    if (off < 1e-24) break;
    for (int p = 0; p < n; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-30) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double tau = (aqq - app) / (2.0 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) /
                   (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
        double c = 1.0 / std::sqrt(1.0 + t * t);
        double s = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - s * akq;
          A[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - s * aqk;
          A[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - s * vkq;
          V[k * n + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < n; ++i) d[i] = A[i * n + i];
}

// smallest-eigenvalue eigenvector of symmetric n x n A -> x (unit norm)
void nullspace(double* A, int n, double* x) {
  std::vector<double> V(n * n), d(n);
  jacobi_eigen(A, n, V.data(), d.data());
  int best = 0;
  for (int i = 1; i < n; ++i)
    if (d[i] < d[best]) best = i;
  double norm = 0.0;
  for (int i = 0; i < n; ++i) {
    x[i] = V[i * n + best];
    norm += x[i] * x[i];
  }
  norm = std::sqrt(norm);
  for (int i = 0; i < n; ++i) x[i] /= norm;
}

void mat3_mul(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[i * 3 + k] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

double det3(const double* M) {
  return M[0] * (M[4] * M[8] - M[5] * M[7]) -
         M[1] * (M[3] * M[8] - M[5] * M[6]) +
         M[2] * (M[3] * M[7] - M[4] * M[6]);
}

// SVD of a 3x3 via eigen-decomposition of M^T M (enough for E projection
// and essential decomposition where singular values are well separated).
void svd3(const double* M, double* U, double* S, double* Vt) {
  double MtM[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += M[k * 3 + i] * M[k * 3 + j];
      MtM[i * 3 + j] = s;
    }
  double V[9], d[3], A[9];
  std::memcpy(A, MtM, sizeof(A));
  jacobi_eigen(A, 3, V, d);
  int order[3] = {0, 1, 2};
  std::sort(order, order + 3, [&](int a, int b) { return d[a] > d[b]; });
  for (int j = 0; j < 3; ++j) {
    S[j] = std::sqrt(std::max(d[order[j]], 0.0));
    for (int i = 0; i < 3; ++i) Vt[j * 3 + i] = V[i * 3 + order[j]];
  }
  // U = M V S^-1 (with Gram-Schmidt fallback for tiny singular values)
  for (int j = 0; j < 3; ++j) {
    double col[3] = {0, 0, 0};
    for (int i = 0; i < 3; ++i)
      for (int k = 0; k < 3; ++k) col[i] += M[i * 3 + k] * Vt[j * 3 + k];
    double n = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    if (n < 1e-12) {
      // complete to a right-handed basis
      double a[3] = {U[0 * 3 + 0], U[1 * 3 + 0], U[2 * 3 + 0]};
      double b[3] = {U[0 * 3 + 1], U[1 * 3 + 1], U[2 * 3 + 1]};
      col[0] = a[1] * b[2] - a[2] * b[1];
      col[1] = a[2] * b[0] - a[0] * b[2];
      col[2] = a[0] * b[1] - a[1] * b[0];
      n = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
      if (n < 1e-12) n = 1.0;
    }
    for (int i = 0; i < 3; ++i) U[i * 3 + j] = col[i] / n;
  }
}

// ---------------------------------------------------------------------------
// homography
// ---------------------------------------------------------------------------

// weighted normalized DLT from n correspondences -> H (row major, 3x3)
bool dlt_homography(const float* p0, const float* p1, const double* w, int n,
                    double* H) {
  // normalization transforms
  double mean0[2] = {0, 0}, mean1[2] = {0, 0}, wsum = 0;
  for (int i = 0; i < n; ++i) {
    if (w[i] <= 0) continue;
    wsum += w[i];
    mean0[0] += w[i] * p0[2 * i];
    mean0[1] += w[i] * p0[2 * i + 1];
    mean1[0] += w[i] * p1[2 * i];
    mean1[1] += w[i] * p1[2 * i + 1];
  }
  if (wsum < 1e-9) return false;
  for (int k = 0; k < 2; ++k) {
    mean0[k] /= wsum;
    mean1[k] /= wsum;
  }
  double s0 = 0, s1 = 0;
  for (int i = 0; i < n; ++i) {
    if (w[i] <= 0) continue;
    double dx0 = p0[2 * i] - mean0[0], dy0 = p0[2 * i + 1] - mean0[1];
    double dx1 = p1[2 * i] - mean1[0], dy1 = p1[2 * i + 1] - mean1[1];
    s0 += w[i] * std::sqrt(dx0 * dx0 + dy0 * dy0);
    s1 += w[i] * std::sqrt(dx1 * dx1 + dy1 * dy1);
  }
  s0 = std::sqrt(2.0) / std::max(s0 / wsum, 1e-12);
  s1 = std::sqrt(2.0) / std::max(s1 / wsum, 1e-12);

  double AtA[81] = {0};
  for (int i = 0; i < n; ++i) {
    if (w[i] <= 0) continue;
    double x = (p0[2 * i] - mean0[0]) * s0;
    double y = (p0[2 * i + 1] - mean0[1]) * s0;
    double u = (p1[2 * i] - mean1[0]) * s1;
    double v = (p1[2 * i + 1] - mean1[1]) * s1;
    double r1[9] = {x, y, 1, 0, 0, 0, -u * x, -u * y, -u};
    double r2[9] = {0, 0, 0, x, y, 1, -v * x, -v * y, -v};
    for (int a = 0; a < 9; ++a)
      for (int b = 0; b < 9; ++b)
        AtA[a * 9 + b] += w[i] * (r1[a] * r1[b] + r2[a] * r2[b]);
  }
  double h[9];
  nullspace(AtA, 9, h);
  // denormalize: H = T1^-1 Hn T0
  double Hn[9];
  std::memcpy(Hn, h, sizeof(Hn));
  double T0[9] = {s0, 0, -s0 * mean0[0], 0, s0, -s0 * mean0[1], 0, 0, 1};
  double T1inv[9] = {1 / s1, 0, mean1[0], 0, 1 / s1, mean1[1], 0, 0, 1};
  double tmp[9];
  mat3_mul(Hn, T0, tmp);
  mat3_mul(T1inv, tmp, H);
  double scale = H[8];
  if (std::fabs(scale) < 1e-12) return false;
  for (int i = 0; i < 9; ++i) H[i] /= scale;
  return true;
}

double sym_transfer_error2(const double* H, const double* Hinv, const float* a,
                           const float* b) {
  double x = a[0], y = a[1];
  double wz = H[6] * x + H[7] * y + H[8];
  if (std::fabs(wz) < 1e-12) return 1e18;
  double px = (H[0] * x + H[1] * y + H[2]) / wz;
  double py = (H[3] * x + H[4] * y + H[5]) / wz;
  double d1 = (px - b[0]) * (px - b[0]) + (py - b[1]) * (py - b[1]);
  double u = b[0], v = b[1];
  double wz2 = Hinv[6] * u + Hinv[7] * v + Hinv[8];
  if (std::fabs(wz2) < 1e-12) return 1e18;
  double qx = (Hinv[0] * u + Hinv[1] * v + Hinv[2]) / wz2;
  double qy = (Hinv[3] * u + Hinv[4] * v + Hinv[5]) / wz2;
  double d2 = (qx - a[0]) * (qx - a[0]) + (qy - a[1]) * (qy - a[1]);
  return 0.25 * (std::sqrt(d1) + std::sqrt(d2)) * (std::sqrt(d1) + std::sqrt(d2));
}

bool invert3(const double* M, double* Minv) {
  double d = det3(M);
  if (std::fabs(d) < 1e-15) return false;
  double inv[9];
  inv[0] = (M[4] * M[8] - M[5] * M[7]) / d;
  inv[1] = (M[2] * M[7] - M[1] * M[8]) / d;
  inv[2] = (M[1] * M[5] - M[2] * M[4]) / d;
  inv[3] = (M[5] * M[6] - M[3] * M[8]) / d;
  inv[4] = (M[0] * M[8] - M[2] * M[6]) / d;
  inv[5] = (M[2] * M[3] - M[0] * M[5]) / d;
  inv[6] = (M[3] * M[7] - M[4] * M[6]) / d;
  inv[7] = (M[1] * M[6] - M[0] * M[7]) / d;
  inv[8] = (M[0] * M[4] - M[1] * M[3]) / d;
  std::memcpy(Minv, inv, sizeof(inv));
  return true;
}

// ---------------------------------------------------------------------------
// essential matrix
// ---------------------------------------------------------------------------

bool eight_point(const float* p0, const float* p1, const double* w, int n,
                 double* E) {
  double AtA[81] = {0};
  double cnt = 0;
  for (int i = 0; i < n; ++i) {
    if (w[i] <= 0) continue;
    cnt += 1;
    double x0 = p0[2 * i], y0 = p0[2 * i + 1];
    double x1 = p1[2 * i], y1 = p1[2 * i + 1];
    double r[9] = {x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, 1.0};
    for (int a = 0; a < 9; ++a)
      for (int b = 0; b < 9; ++b) AtA[a * 9 + b] += w[i] * r[a] * r[b];
  }
  if (cnt < 8) return false;
  double e[9];
  nullspace(AtA, 9, e);
  // project to essential manifold: singular values (1, 1, 0)
  double U[9], S[3], Vt[9];
  svd3(e, U, S, Vt);
  // fix determinants for a proper decomposition later
  double D[9] = {1, 0, 0, 0, 1, 0, 0, 0, 0};
  double tmp[9];
  mat3_mul(U, D, tmp);
  mat3_mul(tmp, Vt, E);
  return true;
}

// ---------------------------------------------------------------------------
// 5-point (Nister) minimal solver — hidden-variable resultant, same design
// as the device solver in `gluefactory_tpu/ops/essential_5pt.py`: 10 cubic
// constraints over the 4-dim nullspace, det of the 10x10 z-polynomial
// matrix interpolated to a degree-10 polynomial, compactified grid +
// bisection real roots, nullvector back-substitution, Newton polish, and
// three hidden-variable groupings for near-double-root robustness.
// ---------------------------------------------------------------------------

struct FiveTables {
  int monos[20][3];
  int midx[4][4][4];
  // product table entries (p, q, r): mono[p] * mono[q] = mono[r]
  std::vector<std::array<int, 3>> prod;
  int col[20], zpow[20];           // (x,y,z)-mono -> (xy-mono column, z power)
  int ix_x, ix_y, ix_z, ix_1;      // linear monomial indices
  int m_x, m_y, m_1;               // xy-monomial indices
  int didx[3][20];                 // derivative index tables
  double dcoef[3][20];
};

const FiveTables& five_tables() {
  static FiveTables T = [] {
    FiveTables t{};
    int n = 0;
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4 - i; ++j)
        for (int k = 0; k < 4 - i - j; ++k) {
          t.monos[n][0] = i;
          t.monos[n][1] = j;
          t.monos[n][2] = k;
          t.midx[i][j][k] = n;
          ++n;
        }
    t.ix_x = t.midx[1][0][0];
    t.ix_y = t.midx[0][1][0];
    t.ix_z = t.midx[0][0][1];
    t.ix_1 = t.midx[0][0][0];
    for (int p = 0; p < 20; ++p)
      for (int q = 0; q < 20; ++q) {
        int a = t.monos[p][0] + t.monos[q][0];
        int b = t.monos[p][1] + t.monos[q][1];
        int c = t.monos[p][2] + t.monos[q][2];
        if (a + b + c <= 3) t.prod.push_back({p, q, t.midx[a][b][c]});
      }
    // xy-monomial order (must index x^1 y^0, x^0 y^1, x^0 y^0 for backsub)
    const int xy[10][2] = {{3, 0}, {2, 1}, {1, 2}, {0, 3}, {2, 0},
                           {1, 1}, {0, 2}, {1, 0}, {0, 1}, {0, 0}};
    for (int m = 0; m < 20; ++m) {
      for (int c = 0; c < 10; ++c)
        if (xy[c][0] == t.monos[m][0] && xy[c][1] == t.monos[m][1])
          t.col[m] = c;
      t.zpow[m] = t.monos[m][2];
    }
    t.m_x = 7;
    t.m_y = 8;
    t.m_1 = 9;
    for (int var = 0; var < 3; ++var)
      for (int m = 0; m < 20; ++m) {
        int e[3] = {t.monos[m][0], t.monos[m][1], t.monos[m][2]};
        if (e[var] > 0) {
          t.dcoef[var][m] = e[var];
          e[var] -= 1;
          t.didx[var][m] = t.midx[e[0]][e[1]][e[2]];
        } else {
          t.dcoef[var][m] = 0.0;
          t.didx[var][m] = 0;
        }
      }
    return t;
  }();
  return T;
}

void poly_mul20(const double* a, const double* b, double* out) {
  const FiveTables& T = five_tables();
  for (int i = 0; i < 20; ++i) out[i] = 0.0;
  for (const auto& pqr : T.prod) out[pqr[2]] += a[pqr[0]] * b[pqr[1]];
}

// basis: 4x9 rows B1..B4 with E = x B1 + y B2 + z B3 + B4
// cons: 10x20 unit-norm constraint polynomial rows
void five_constraints(const double basis[4][9], double cons[10][20]) {
  const FiveTables& T = five_tables();
  double Ep[3][3][20];  // E entries as degree-1 polynomials
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      for (int m = 0; m < 20; ++m) Ep[i][j][m] = 0.0;
      Ep[i][j][T.ix_x] = basis[0][i * 3 + j];
      Ep[i][j][T.ix_y] = basis[1][i * 3 + j];
      Ep[i][j][T.ix_z] = basis[2][i * 3 + j];
      Ep[i][j][T.ix_1] = basis[3][i * 3 + j];
    }
  auto minor2 = [&](int i0, int i1, int j0, int j1, double* out) {
    double a[20], b[20];
    poly_mul20(Ep[i0][j0], Ep[i1][j1], a);
    poly_mul20(Ep[i0][j1], Ep[i1][j0], b);
    for (int m = 0; m < 20; ++m) out[m] = a[m] - b[m];
  };
  // det(E)
  double m12[20], tmp[20];
  minor2(1, 2, 1, 2, m12);
  poly_mul20(Ep[0][0], m12, cons[0]);
  minor2(1, 2, 0, 2, m12);
  poly_mul20(Ep[0][1], m12, tmp);
  for (int m = 0; m < 20; ++m) cons[0][m] -= tmp[m];
  minor2(1, 2, 0, 1, m12);
  poly_mul20(Ep[0][2], m12, tmp);
  for (int m = 0; m < 20; ++m) cons[0][m] += tmp[m];
  // P = E E^T (degree 2); Tm = 2P - tr(P) I; rows of Tm E = 0
  double P[3][3][20];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      for (int m = 0; m < 20; ++m) P[i][j][m] = 0.0;
      for (int k = 0; k < 3; ++k) {
        poly_mul20(Ep[i][k], Ep[j][k], tmp);
        for (int m = 0; m < 20; ++m) P[i][j][m] += tmp[m];
      }
    }
  double trP[20];
  for (int m = 0; m < 20; ++m)
    trP[m] = P[0][0][m] + P[1][1][m] + P[2][2][m];
  int r = 1;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j, ++r) {
      for (int m = 0; m < 20; ++m) cons[r][m] = 0.0;
      for (int k = 0; k < 3; ++k) {
        double Tik[20];
        for (int m = 0; m < 20; ++m)
          Tik[m] = 2.0 * P[i][k][m] - (i == k ? trP[m] : 0.0);
        poly_mul20(Tik, Ep[k][j], tmp);
        for (int m = 0; m < 20; ++m) cons[r][m] += tmp[m];
      }
    }
  for (int q = 0; q < 10; ++q) {
    double nrm = 0.0;
    for (int m = 0; m < 20; ++m) nrm += cons[q][m] * cons[q][m];
    nrm = std::sqrt(std::max(nrm, 1e-300));
    for (int m = 0; m < 20; ++m) cons[q][m] /= nrm;
  }
}

// evaluate the 10x10 matrix C(z) from grouped coefficients
void five_evalC(const double Ccoef[10][10][4], double z, double C[100]) {
  double zp[4] = {1.0, z, z * z, z * z * z};
  for (int r = 0; r < 10; ++r)
    for (int c = 0; c < 10; ++c) {
      double s = 0.0;
      for (int k = 0; k < 4; ++k) s += Ccoef[r][c][k] * zp[k];
      C[r * 10 + c] = s;
    }
}

// determinant of a 10x10 by partial-pivot Gaussian elimination
double det10(double* A) {
  double det = 1.0;
  for (int c = 0; c < 10; ++c) {
    int piv = c;
    for (int r = c + 1; r < 10; ++r)
      if (std::fabs(A[r * 10 + c]) > std::fabs(A[piv * 10 + c])) piv = r;
    if (piv != c) {
      for (int k = 0; k < 10; ++k) std::swap(A[c * 10 + k], A[piv * 10 + k]);
      det = -det;
    }
    double p = A[c * 10 + c];
    if (std::fabs(p) < 1e-300) return 0.0;
    det *= p;
    for (int r = c + 1; r < 10; ++r) {
      double f = A[r * 10 + c] / p;
      for (int k = c; k < 10; ++k) A[r * 10 + k] -= f * A[c * 10 + k];
    }
  }
  return det;
}

// solve a dense n x n system in place (partial pivoting); b receives x
bool solve_dense(double* A, double* b, int n) {
  for (int c = 0; c < n; ++c) {
    int piv = c;
    for (int r = c + 1; r < n; ++r)
      if (std::fabs(A[r * n + c]) > std::fabs(A[piv * n + c])) piv = r;
    if (std::fabs(A[piv * n + c]) < 1e-300) return false;
    if (piv != c) {
      for (int k = 0; k < n; ++k) std::swap(A[c * n + k], A[piv * n + k]);
      std::swap(b[c], b[piv]);
    }
    double p = A[c * n + c];
    for (int r = c + 1; r < n; ++r) {
      double f = A[r * n + c] / p;
      for (int k = c; k < n; ++k) A[r * n + k] -= f * A[c * n + k];
      b[r] -= f * b[c];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double s = b[r];
    for (int k = r + 1; k < n; ++k) s -= A[r * n + k] * b[k];
    b[r] = s / A[r * n + r];
  }
  return true;
}

// degree-10 polynomial coefficients of det C(z) via 11 Chebyshev nodes
void five_det_coeffs(const double Ccoef[10][10][4], double coeffs[11]) {
  double nodes[11], dets[11];
  for (int i = 0; i < 11; ++i)
    nodes[i] = std::cos((2 * i + 1) / 22.0 * M_PI);
  double maxd = 0.0;
  for (int i = 0; i < 11; ++i) {
    double C[100];
    five_evalC(Ccoef, nodes[i], C);
    dets[i] = det10(C);
    maxd = std::max(maxd, std::fabs(dets[i]));
  }
  if (maxd < 1e-300) maxd = 1.0;
  double V[121];
  for (int i = 0; i < 11; ++i) {
    double p = 1.0;
    for (int k = 0; k < 11; ++k) {
      V[i * 11 + k] = p;
      p *= nodes[i];
    }
    coeffs[i] = dets[i] / maxd;
  }
  solve_dense(V, coeffs, 11);
}

double five_eval_poly(const double coeffs[11], double z) {
  double s = 0.0;
  for (int k = 10; k >= 0; --k) s = s * z + coeffs[k];
  return s;
}

// q(t) = p(tan t) cos^10 t — finite on [-pi/2, pi/2], same sign as p(tan t)
double five_eval_compact(const double coeffs[11], double t) {
  double s = std::sin(t), c = std::cos(t);
  double out = 0.0, sk = 1.0;
  double cpow[11];
  cpow[0] = 1.0;
  for (int k = 1; k <= 10; ++k) cpow[k] = cpow[k - 1] * c;
  for (int k = 0; k <= 10; ++k) {
    out += coeffs[k] * sk * cpow[10 - k];
    sk *= s;
  }
  return out;
}

int five_real_roots(const double coeffs[11], double roots[10]) {
  const int G = 512;
  const double eps = 1e-3;
  double t0 = -M_PI / 2 + eps, t1 = M_PI / 2 - eps;
  double prev_t = t0, prev_q = five_eval_compact(coeffs, t0);
  int count = 0;
  for (int g = 1; g < G && count < 10; ++g) {
    double t = t0 + (t1 - t0) * g / (G - 1);
    double q = five_eval_compact(coeffs, t);
    if (prev_q * q < 0) {
      double lo = prev_t, hi = t, qlo = prev_q;
      for (int b = 0; b < 60; ++b) {
        double mid = 0.5 * (lo + hi);
        double qm = five_eval_compact(coeffs, mid);
        if (qlo * qm > 0) {
          lo = mid;
          qlo = qm;
        } else {
          hi = mid;
        }
      }
      double z = std::tan(0.5 * (lo + hi));
      // Newton polish on p(z) directly
      for (int it = 0; it < 8; ++it) {
        double p = five_eval_poly(coeffs, z);
        double dp = 0.0, zp = 1.0;
        for (int k = 1; k <= 10; ++k) {
          dp += k * coeffs[k] * zp;
          zp *= z;
        }
        if (std::fabs(dp) < 1e-300) break;
        double step = p / dp;
        if (!std::isfinite(step) || std::fabs(step) > 1.0) break;
        z -= step;
      }
      roots[count++] = z;
    }
    prev_t = t;
    prev_q = q;
  }
  return count;
}

// Newton polish of (x, y, z) on the 10 constraint polynomials
void five_newton(const double cons[10][20], double& x, double& y, double& z) {
  const FiveTables& T = five_tables();
  auto eval_monos = [&](double x, double y, double z, double* m) {
    double px[4] = {1, x, x * x, x * x * x};
    double py[4] = {1, y, y * y, y * y * y};
    double pz[4] = {1, z, z * z, z * z * z};
    for (int i = 0; i < 20; ++i)
      m[i] = px[T.monos[i][0]] * py[T.monos[i][1]] * pz[T.monos[i][2]];
  };
  auto resid_norm = [&](double x, double y, double z) {
    double m[20], s = 0.0;
    eval_monos(x, y, z, m);
    for (int q = 0; q < 10; ++q) {
      double f = 0.0;
      for (int i = 0; i < 20; ++i) f += cons[q][i] * m[i];
      s += f * f;
    }
    return s;
  };
  double best = resid_norm(x, y, z);
  for (int it = 0; it < 5; ++it) {
    double m[20];
    eval_monos(x, y, z, m);
    double F[10], J[10][3];
    for (int q = 0; q < 10; ++q) {
      F[q] = 0.0;
      for (int i = 0; i < 20; ++i) F[q] += cons[q][i] * m[i];
      for (int var = 0; var < 3; ++var) {
        double d = 0.0;
        for (int i = 0; i < 20; ++i)
          d += cons[q][i] * T.dcoef[var][i] * m[T.didx[var][i]];
        J[q][var] = d;
      }
    }
    double JtJ[9] = {0}, JtF[3] = {0};
    for (int q = 0; q < 10; ++q) {
      for (int a = 0; a < 3; ++a) {
        JtF[a] += J[q][a] * F[q];
        for (int b = 0; b < 3; ++b) JtJ[a * 3 + b] += J[q][a] * J[q][b];
      }
    }
    double tr = JtJ[0] + JtJ[4] + JtJ[8];
    for (int a = 0; a < 3; ++a) JtJ[a * 3 + a] += 1e-12 * tr;
    if (!solve_dense(JtJ, JtF, 3)) break;
    double xn = x - JtF[0], yn = y - JtF[1], zn = z - JtF[2];
    double rn = resid_norm(xn, yn, zn);
    if (std::isfinite(rn) && rn < best) {
      x = xn;
      y = yn;
      z = zn;
      best = rn;
    } else {
      break;
    }
  }
}

// mp0, mp1: 5 matched normalized points. E_cands: up to 30 essential
// matrices (manifold-projected). Returns candidate count.
int five_point_candidates(const float* mp0, const float* mp1,
                          double E_cands[][9]) {
  const FiveTables& T = five_tables();
  // nullspace basis of the 5x9 epipolar constraint matrix
  double QtQ[81] = {0};
  for (int i = 0; i < 5; ++i) {
    double x0 = mp0[2 * i], y0 = mp0[2 * i + 1];
    double x1 = mp1[2 * i], y1 = mp1[2 * i + 1];
    double r[9] = {x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, 1.0};
    for (int a = 0; a < 9; ++a)
      for (int b = 0; b < 9; ++b) QtQ[a * 9 + b] += r[a] * r[b];
  }
  double V[81], d[9], A[81];
  std::memcpy(A, QtQ, sizeof(A));
  jacobi_eigen(A, 9, V, d);
  int order[9] = {0, 1, 2, 3, 4, 5, 6, 7, 8};
  std::sort(order, order + 9, [&](int a, int b) { return d[a] < d[b]; });
  double basis0[4][9];
  for (int n = 0; n < 4; ++n)
    for (int i = 0; i < 9; ++i) basis0[n][i] = V[i * 9 + order[n]];

  const int perms[3][3] = {{0, 1, 2}, {2, 1, 0}, {0, 2, 1}};
  int count = 0;
  for (int g = 0; g < 3; ++g) {
    double basis[4][9];
    for (int n = 0; n < 3; ++n)
      std::memcpy(basis[n], basis0[perms[g][n]], sizeof(basis[0]));
    std::memcpy(basis[3], basis0[3], sizeof(basis[0]));
    double cons[10][20];
    five_constraints(basis, cons);
    double Ccoef[10][10][4];
    std::memset(Ccoef, 0, sizeof(Ccoef));
    for (int q = 0; q < 10; ++q)
      for (int m = 0; m < 20; ++m)
        Ccoef[q][T.col[m]][T.zpow[m]] += cons[q][m];
    double coeffs[11];
    five_det_coeffs(Ccoef, coeffs);
    double roots[10];
    int nr = five_real_roots(coeffs, roots);
    for (int r = 0; r < nr; ++r) {
      double C[100];
      five_evalC(Ccoef, roots[r], C);
      // nullvector of C via smallest eigenvector of C^T C
      double CtC[100];
      for (int i = 0; i < 10; ++i)
        for (int j = 0; j < 10; ++j) {
          double s = 0.0;
          for (int k = 0; k < 10; ++k) s += C[k * 10 + i] * C[k * 10 + j];
          CtC[i * 10 + j] = s;
        }
      double Vm[100], dm[10];
      jacobi_eigen(CtC, 10, Vm, dm);
      int bi = 0;
      for (int i = 1; i < 10; ++i)
        if (dm[i] < dm[bi]) bi = i;
      double m1 = Vm[T.m_1 * 10 + bi];
      if (std::fabs(m1) < 1e-10) continue;
      double x = Vm[T.m_x * 10 + bi] / m1;
      double y = Vm[T.m_y * 10 + bi] / m1;
      double z = roots[r];
      five_newton(cons, x, y, z);
      double E[9];
      for (int i = 0; i < 9; ++i)
        E[i] = x * basis[0][i] + y * basis[1][i] + z * basis[2][i] +
               basis[3][i];
      // project to the essential manifold
      double U[9], S[3], Vt[9], D[9] = {1, 0, 0, 0, 1, 0, 0, 0, 0}, tmp[9];
      svd3(E, U, S, Vt);
      mat3_mul(U, D, tmp);
      mat3_mul(tmp, Vt, E_cands[count]);
      ++count;
      if (count >= 30) return count;
    }
  }
  return count;
}

double epi_error2(const double* E, const float* a, const float* b) {
  double x0 = a[0], y0 = a[1], x1 = b[0], y1 = b[1];
  double Ex0 = E[0] * x0 + E[1] * y0 + E[2];
  double Ex1 = E[3] * x0 + E[4] * y0 + E[5];
  double Ex2 = E[6] * x0 + E[7] * y0 + E[8];
  double Etx0 = E[0] * x1 + E[3] * y1 + E[6];
  double Etx1 = E[1] * x1 + E[4] * y1 + E[7];
  double val = x1 * Ex0 + y1 * Ex1 + Ex2;
  double n0 = Ex0 * Ex0 + Ex1 * Ex1;
  double n1 = Etx0 * Etx0 + Etx1 * Etx1;
  double d = std::fabs(val) * (1.0 / std::sqrt(std::max(n0, 1e-18)) +
                               1.0 / std::sqrt(std::max(n1, 1e-18))) * 0.5;
  return d * d;
}

// Rodrigues exponential: axis-angle w -> rotation R
void so3_exp(const double* w, double* R) {
  double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  double K[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  if (th < 1e-12) {
    for (int i = 0; i < 9; ++i) R[i] = K[i];
    R[0] += 1;
    R[4] += 1;
    R[8] += 1;
    return;
  }
  double a = std::sin(th) / th, b = (1 - std::cos(th)) / (th * th);
  double K2[9];
  mat3_mul(K, K, K2);
  for (int i = 0; i < 9; ++i) R[i] = a * K[i] + b * K2[i];
  R[0] += 1;
  R[4] += 1;
  R[8] += 1;
}

// Local optimization on the pose manifold: Gauss-Newton over the 5-DOF
// (so3 tangent, unit-translation tangent) parametrization minimizing
// MSAC-truncated Sampson error. A linear (weighted 8-point) refit is
// rank-deficient on planar scenes; this parametrization cannot leave the
// space of valid poses. Mirrors `refine_pose_gn` in
// `gluefactory_tpu/ops/ransac.py`.
void refine_pose_gn(const float* pts0, const float* pts1, const uint8_t* valid,
                    int n, double th2, double* R, double* t, int iters) {
  double R0[9], t0[3];
  std::memcpy(R0, R, sizeof(R0));
  std::memcpy(t0, t, sizeof(t0));
  // tangent basis of t0
  double a[3] = {1, 0, 0};
  if (std::fabs(t0[0]) > 0.9) {
    a[0] = 0;
    a[1] = 1;
  }
  double b1[3] = {t0[1] * a[2] - t0[2] * a[1], t0[2] * a[0] - t0[0] * a[2],
                  t0[0] * a[1] - t0[1] * a[0]};
  double nb = std::sqrt(b1[0] * b1[0] + b1[1] * b1[1] + b1[2] * b1[2]);
  if (nb < 1e-12) return;
  for (int i = 0; i < 3; ++i) b1[i] /= nb;
  double b2[3] = {t0[1] * b1[2] - t0[2] * b1[1], t0[2] * b1[0] - t0[0] * b1[2],
                  t0[0] * b1[1] - t0[1] * b1[0]};

  auto pose_of = [&](const double* p, double* Rp, double* tp) {
    double dR[9];
    so3_exp(p, dR);
    mat3_mul(R0, dR, Rp);
    for (int i = 0; i < 3; ++i) tp[i] = t0[i] + b1[i] * p[3] + b2[i] * p[4];
    double nt = std::sqrt(tp[0] * tp[0] + tp[1] * tp[1] + tp[2] * tp[2]);
    if (nt < 1e-12) nt = 1.0;
    for (int i = 0; i < 3; ++i) tp[i] /= nt;
  };
  auto sampson = [&](const double* E, int i) {
    double x0 = pts0[2 * i], y0 = pts0[2 * i + 1];
    double x1 = pts1[2 * i], y1 = pts1[2 * i + 1];
    double Ex0 = E[0] * x0 + E[1] * y0 + E[2];
    double Ex1 = E[3] * x0 + E[4] * y0 + E[5];
    double Ex2 = E[6] * x0 + E[7] * y0 + E[8];
    double Et0 = E[0] * x1 + E[3] * y1 + E[6];
    double Et1 = E[1] * x1 + E[4] * y1 + E[7];
    double num = x1 * Ex0 + y1 * Ex1 + Ex2;
    double den = Ex0 * Ex0 + Ex1 * Ex1 + Et0 * Et0 + Et1 * Et1;
    return num / std::sqrt(std::max(den, 1e-18));
  };
  auto E_at = [&](const double* p, double* E) {
    double Rp[9], tp[3];
    pose_of(p, Rp, tp);
    double tx[9] = {0, -tp[2], tp[1], tp[2], 0, -tp[0], -tp[1], tp[0], 0};
    mat3_mul(tx, Rp, E);
  };
  auto objective = [&](const double* p) {
    double E[9];
    E_at(p, E);
    double s = 0.0;
    for (int i = 0; i < n; ++i) {
      if (!valid[i]) continue;
      double r = sampson(E, i);
      s += std::min(r * r, th2);
    }
    return s;
  };

  double params[5] = {0, 0, 0, 0, 0};
  double best = objective(params);
  for (int it = 0; it < iters; ++it) {
    double E[9];
    E_at(params, E);
    // MSAC weights at the current pose
    std::vector<double> w(n, 0.0);
    for (int i = 0; i < n; ++i) {
      if (!valid[i]) continue;
      double r = sampson(E, i);
      w[i] = std::max(0.0, 1.0 - (r * r) / th2);
    }
    // numeric Jacobian of the residual vector (central differences)
    const double h = 1e-6;
    std::vector<double> J(n * 5);
    double Ep[9];
    for (int c = 0; c < 5; ++c) {
      double pp[5], pm[5];
      std::memcpy(pp, params, sizeof(pp));
      std::memcpy(pm, params, sizeof(pm));
      pp[c] += h;
      pm[c] -= h;
      double Em[9];
      E_at(pp, Ep);
      E_at(pm, Em);
      for (int i = 0; i < n; ++i)
        J[i * 5 + c] =
            valid[i] ? (sampson(Ep, i) - sampson(Em, i)) / (2 * h) : 0.0;
    }
    double JtJ[25] = {0}, Jtr[5] = {0};
    for (int i = 0; i < n; ++i) {
      if (w[i] <= 0) continue;
      double r = sampson(E, i);
      for (int aa = 0; aa < 5; ++aa) {
        Jtr[aa] += w[i] * J[i * 5 + aa] * r;
        for (int bb = 0; bb < 5; ++bb)
          JtJ[aa * 5 + bb] += w[i] * J[i * 5 + aa] * J[i * 5 + bb];
      }
    }
    double tr = 0.0;
    for (int aa = 0; aa < 5; ++aa) tr += JtJ[aa * 5 + aa];
    for (int aa = 0; aa < 5; ++aa) JtJ[aa * 5 + aa] += 1e-8 * tr;
    if (!solve_dense(JtJ, Jtr, 5)) break;
    double newp[5];
    for (int aa = 0; aa < 5; ++aa) newp[aa] = params[aa] - Jtr[aa];
    double obj = objective(newp);
    if (std::isfinite(obj) && obj < best) {
      std::memcpy(params, newp, sizeof(newp));
      best = obj;
    } else {
      break;
    }
  }
  pose_of(params, R, t);
}

}  // namespace

extern "C" {

// Returns 1 on success. H_out: 9 doubles; inliers_out: n bytes.
int lo_ransac_homography(const float* pts0, const float* pts1,
                         const uint8_t* valid, int n, float th, int max_iters,
                         int lo_iters, unsigned seed, double* H_out,
                         uint8_t* inliers_out, int* num_inliers) {
  std::vector<int> idx;
  idx.reserve(n);
  for (int i = 0; i < n; ++i)
    if (valid[i]) idx.push_back(i);
  if ((int)idx.size() < 4) return 0;
  std::mt19937 rng(seed);
  const double th2 = (double)th * th;
  double best_score = -1.0;
  double best_H[9];
  std::vector<double> w(n, 0.0);
  int iters = max_iters;
  for (int it = 0; it < iters; ++it) {
    // minimal sample of 4 distinct points
    int s[4];
    for (int k = 0; k < 4; ++k) {
      bool dup;
      do {
        s[k] = idx[rng() % idx.size()];
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (s[j] == s[k]);
      } while (dup);
    }
    float mp0[8], mp1[8];
    double mw[4] = {1, 1, 1, 1};
    for (int k = 0; k < 4; ++k) {
      mp0[2 * k] = pts0[2 * s[k]];
      mp0[2 * k + 1] = pts0[2 * s[k] + 1];
      mp1[2 * k] = pts1[2 * s[k]];
      mp1[2 * k + 1] = pts1[2 * s[k] + 1];
    }
    double H[9], Hinv[9];
    if (!dlt_homography(mp0, mp1, mw, 4, H)) continue;
    if (!invert3(H, Hinv)) continue;
    double score = 0;
    int ninl = 0;
    for (int i : idx) {
      double e2 = sym_transfer_error2(H, Hinv, pts0 + 2 * i, pts1 + 2 * i);
      if (e2 < th2) {
        score += 1.0 - e2 / th2;
        ++ninl;
      }
    }
    if (score > best_score) {
      best_score = score;
      std::memcpy(best_H, H, sizeof(best_H));
      // adaptive iteration count (0.99 confidence)
      double inl_ratio = (double)ninl / idx.size();
      double p4 = inl_ratio * inl_ratio * inl_ratio * inl_ratio;
      if (p4 > 1e-9) {
        int need = (int)(std::log(0.01) / std::log(1.0 - p4)) + 1;
        iters = std::min(iters, std::max(it + 1, need));
      }
    }
  }
  if (best_score < 0) return 0;

  // local optimization: IRLS refits on soft MSAC weights
  for (int lo = 0; lo < lo_iters; ++lo) {
    double Hinv[9];
    if (!invert3(best_H, Hinv)) break;
    for (int i = 0; i < n; ++i) {
      if (!valid[i]) {
        w[i] = 0;
        continue;
      }
      double e2 = sym_transfer_error2(best_H, Hinv, pts0 + 2 * i, pts1 + 2 * i);
      w[i] = e2 < th2 ? 1.0 - e2 / th2 : 0.0;
    }
    double H[9];
    if (!dlt_homography(pts0, pts1, w.data(), n, H)) break;
    double Hi2[9];
    if (!invert3(H, Hi2)) break;
    double score = 0;
    for (int i : idx) {
      double e2 = sym_transfer_error2(H, Hi2, pts0 + 2 * i, pts1 + 2 * i);
      if (e2 < th2) score += 1.0 - e2 / th2;
    }
    if (score > best_score) {
      best_score = score;
      std::memcpy(best_H, H, sizeof(best_H));
    } else {
      break;
    }
  }

  double Hinv[9];
  invert3(best_H, Hinv);
  int cnt = 0;
  for (int i = 0; i < n; ++i) {
    bool inl = valid[i] &&
               sym_transfer_error2(best_H, Hinv, pts0 + 2 * i, pts1 + 2 * i) < th2;
    inliers_out[i] = inl ? 1 : 0;
    cnt += inl;
  }
  *num_inliers = cnt;
  std::memcpy(H_out, best_H, sizeof(best_H));
  return 1;
}

// pts in normalized (K^-1) coords; th in normalized units.
// E_out: 9; R_out: 9; t_out: 3. solver: 0 = 5-pt Nister (PoseLib-parity
// default), 1 = 8-pt.
int lo_ransac_essential(const float* pts0, const float* pts1,
                        const uint8_t* valid, int n, float th, int max_iters,
                        int lo_iters, unsigned seed, int solver, double* E_out,
                        double* R_out, double* t_out, uint8_t* inliers_out,
                        int* num_inliers) {
  std::vector<int> idx;
  for (int i = 0; i < n; ++i)
    if (valid[i]) idx.push_back(i);
  const int sample_size = solver == 0 ? 5 : 8;
  if ((int)idx.size() < std::max(sample_size, 8)) return 0;
  std::mt19937 rng(seed);
  const double th2 = (double)th * th;
  double best_score = -1.0, best_E[9];
  std::vector<double> w(n, 0.0);
  auto score_model = [&](const double* E, int* ninl_out) {
    double score = 0;
    int ninl = 0;
    for (int i : idx) {
      double e2 = epi_error2(E, pts0 + 2 * i, pts1 + 2 * i);
      if (e2 < th2) {
        score += 1.0 - e2 / th2;
        ++ninl;
      }
    }
    if (ninl_out) *ninl_out = ninl;
    return score;
  };
  int iters = max_iters;
  for (int it = 0; it < iters; ++it) {
    int s[8];
    for (int k = 0; k < sample_size; ++k) {
      bool dup;
      do {
        s[k] = idx[rng() % idx.size()];
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (s[j] == s[k]);
      } while (dup);
    }
    float mp0[16], mp1[16];
    for (int k = 0; k < sample_size; ++k) {
      mp0[2 * k] = pts0[2 * s[k]];
      mp0[2 * k + 1] = pts0[2 * s[k] + 1];
      mp1[2 * k] = pts1[2 * s[k]];
      mp1[2 * k + 1] = pts1[2 * s[k] + 1];
    }
    int best_ninl = 0;
    bool improved = false;
    if (solver == 0) {
      double cands[30][9];
      int nc = five_point_candidates(mp0, mp1, cands);
      for (int c = 0; c < nc; ++c) {
        int ninl;
        double score = score_model(cands[c], &ninl);
        if (score > best_score) {
          best_score = score;
          std::memcpy(best_E, cands[c], sizeof(best_E));
          best_ninl = ninl;
          improved = true;
        }
      }
    } else {
      double mw[8] = {1, 1, 1, 1, 1, 1, 1, 1};
      double E[9];
      if (!eight_point(mp0, mp1, mw, 8, E)) continue;
      int ninl;
      double score = score_model(E, &ninl);
      if (score > best_score) {
        best_score = score;
        std::memcpy(best_E, E, sizeof(best_E));
        best_ninl = ninl;
        improved = true;
      }
    }
    if (improved) {
      double inl_ratio = (double)best_ninl / idx.size();
      double pk = std::pow(inl_ratio, sample_size);
      if (pk > 1e-9) {
        int need = (int)(std::log(0.01) / std::log(1.0 - pk)) + 1;
        // floor of 100 iterations: on degenerate (e.g. planar) scenes the
        // first good-scoring model can be in the wrong basin of a near
        // ambiguity, and only more samples find the better-scoring one
        int min_iters = std::min(max_iters, 100);
        iters = std::min(iters, std::max({it + 1, need, min_iters}));
      }
    }
  }
  if (best_score < 0) return 0;

  // linear IRLS refit (accept-if-better; can help on well-conditioned
  // scenes, is guarded by score on degenerate ones)
  for (int lo = 0; lo < lo_iters; ++lo) {
    for (int i = 0; i < n; ++i) {
      if (!valid[i]) {
        w[i] = 0;
        continue;
      }
      double e2 = epi_error2(best_E, pts0 + 2 * i, pts1 + 2 * i);
      w[i] = e2 < th2 ? 1.0 - e2 / th2 : 0.0;
    }
    double E[9];
    if (!eight_point(pts0, pts1, w.data(), n, E)) break;
    double score = score_model(E, nullptr);
    if (score > best_score) {
      best_score = score;
      std::memcpy(best_E, E, sizeof(best_E));
    } else {
      break;
    }
  }

  int cnt = 0;
  for (int i = 0; i < n; ++i) {
    bool inl =
        valid[i] && epi_error2(best_E, pts0 + 2 * i, pts1 + 2 * i) < th2;
    inliers_out[i] = inl ? 1 : 0;
    cnt += inl;
  }

  // pose recovery: decompose + cheirality over the 4 candidates
  double U[9], S[3], Vt[9];
  svd3(best_E, U, S, Vt);
  if (det3(U) < 0)
    for (int i = 0; i < 9; ++i) U[i] = -U[i];
  if (det3(Vt) < 0)
    for (int i = 0; i < 9; ++i) Vt[i] = -Vt[i];
  double W[9] = {0, -1, 0, 1, 0, 0, 0, 0, 1};
  double Wt[9] = {0, 1, 0, -1, 0, 0, 0, 0, 1};
  double R1[9], R2[9], tmp[9];
  mat3_mul(U, W, tmp);
  mat3_mul(tmp, Vt, R1);
  mat3_mul(U, Wt, tmp);
  mat3_mul(tmp, Vt, R2);
  double tvec[3] = {U[2], U[5], U[8]};

  auto cheirality = [&](const double* R, const double* t) {
    int pos = 0;
    for (int i : idx) {
      if (!inliers_out[i]) continue;
      double r0[3] = {pts0[2 * i], pts0[2 * i + 1], 1.0};
      double r1[3] = {pts1[2 * i], pts1[2 * i + 1], 1.0};
      double Rr0[3];
      for (int a = 0; a < 3; ++a)
        Rr0[a] = R[a * 3] * r0[0] + R[a * 3 + 1] * r0[1] + R[a * 3 + 2] * r0[2];
      // midpoint depths: solve [Rr0, -r1] z = -t (2x2 normal equations)
      double taa = 0, tbb = 0, tab = 0, ta = 0, tb = 0;
      for (int a = 0; a < 3; ++a) {
        taa += Rr0[a] * Rr0[a];
        tbb += r1[a] * r1[a];
        tab += Rr0[a] * (-r1[a]);
        ta += -Rr0[a] * t[a];
        tb += r1[a] * t[a];
      }
      double det = taa * tbb - tab * tab;
      if (std::fabs(det) < 1e-15) continue;
      double z0 = (ta * tbb - tb * tab) / det;
      double z1 = (taa * tb - tab * ta) / det;
      if (z0 > 0 && z1 > 0) ++pos;
    }
    return pos;
  };

  const double* Rs[4] = {R1, R1, R2, R2};
  double ts[4][3] = {{tvec[0], tvec[1], tvec[2]},
                     {-tvec[0], -tvec[1], -tvec[2]},
                     {tvec[0], tvec[1], tvec[2]},
                     {-tvec[0], -tvec[1], -tvec[2]}};
  int best_c = -1, best_pos = -1;
  for (int c = 0; c < 4; ++c) {
    int pos = cheirality(Rs[c], ts[c]);
    if (pos > best_pos) {
      best_pos = pos;
      best_c = c;
    }
  }
  double R_fin[9], t_fin[3];
  std::memcpy(R_fin, Rs[best_c], sizeof(R_fin));
  std::memcpy(t_fin, ts[best_c], sizeof(t_fin));

  // pose-manifold local optimization (see refine_pose_gn)
  if (lo_iters > 0) {
    double R_gn[9], t_gn[3];
    std::memcpy(R_gn, R_fin, sizeof(R_gn));
    std::memcpy(t_gn, t_fin, sizeof(t_gn));
    refine_pose_gn(pts0, pts1, valid, n, th2, R_gn, t_gn, 4 * lo_iters);
    double tx[9] = {0,       -t_gn[2], t_gn[1],  t_gn[2], 0,
                    -t_gn[0], -t_gn[1], t_gn[0], 0};
    double E_gn[9];
    mat3_mul(tx, R_gn, E_gn);
    if (score_model(E_gn, nullptr) >= best_score) {
      std::memcpy(best_E, E_gn, sizeof(best_E));
      std::memcpy(R_fin, R_gn, sizeof(R_fin));
      std::memcpy(t_fin, t_gn, sizeof(t_fin));
      cnt = 0;
      for (int i = 0; i < n; ++i) {
        bool inl =
            valid[i] && epi_error2(best_E, pts0 + 2 * i, pts1 + 2 * i) < th2;
        inliers_out[i] = inl ? 1 : 0;
        cnt += inl;
      }
    }
  }

  *num_inliers = cnt;
  std::memcpy(E_out, best_E, sizeof(best_E));
  std::memcpy(R_out, R_fin, 9 * sizeof(double));
  std::memcpy(t_out, t_fin, 3 * sizeof(double));
  return 1;
}

}  // extern "C"
