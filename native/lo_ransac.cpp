// Native LO-RANSAC: homography (4-pt DLT) and essential matrix (8-pt)
// with MSAC scoring, local optimization by iteratively-reweighted refits,
// and adaptive iteration counts.
//
// This is the host-side counterpart of `gluefactory_tpu/ops/ransac.py`
// and the replacement for the reference's external PoseLib dependency
// (reference `robust_estimators/{homography,relative_pose}/poselib.py`):
// same algorithmic structure (LO-RANSAC), pure C++ (no Eigen), exposed via
// a C ABI consumed through ctypes.
//
// Build: g++ -O3 -shared -fPIC -o liblo_ransac.so lo_ransac.cpp

#include <algorithm>
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
// E_out: 9; R_out: 9; t_out: 3.
int lo_ransac_essential(const float* pts0, const float* pts1,
                        const uint8_t* valid, int n, float th, int max_iters,
                        int lo_iters, unsigned seed, double* E_out,
                        double* R_out, double* t_out, uint8_t* inliers_out,
                        int* num_inliers) {
  std::vector<int> idx;
  for (int i = 0; i < n; ++i)
    if (valid[i]) idx.push_back(i);
  if ((int)idx.size() < 8) return 0;
  std::mt19937 rng(seed);
  const double th2 = (double)th * th;
  double best_score = -1.0, best_E[9];
  std::vector<double> w(n, 0.0);
  int iters = max_iters;
  for (int it = 0; it < iters; ++it) {
    int s[8];
    for (int k = 0; k < 8; ++k) {
      bool dup;
      do {
        s[k] = idx[rng() % idx.size()];
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (s[j] == s[k]);
      } while (dup);
    }
    float mp0[16], mp1[16];
    double mw[8] = {1, 1, 1, 1, 1, 1, 1, 1};
    for (int k = 0; k < 8; ++k) {
      mp0[2 * k] = pts0[2 * s[k]];
      mp0[2 * k + 1] = pts0[2 * s[k] + 1];
      mp1[2 * k] = pts1[2 * s[k]];
      mp1[2 * k + 1] = pts1[2 * s[k] + 1];
    }
    double E[9];
    if (!eight_point(mp0, mp1, mw, 8, E)) continue;
    double score = 0;
    int ninl = 0;
    for (int i : idx) {
      double e2 = epi_error2(E, pts0 + 2 * i, pts1 + 2 * i);
      if (e2 < th2) {
        score += 1.0 - e2 / th2;
        ++ninl;
      }
    }
    if (score > best_score) {
      best_score = score;
      std::memcpy(best_E, E, sizeof(best_E));
      double inl_ratio = (double)ninl / idx.size();
      double p8 = std::pow(inl_ratio, 8);
      if (p8 > 1e-9) {
        int need = (int)(std::log(0.01) / std::log(1.0 - p8)) + 1;
        iters = std::min(iters, std::max(it + 1, need));
      }
    }
  }
  if (best_score < 0) return 0;

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
    double score = 0;
    for (int i : idx) {
      double e2 = epi_error2(E, pts0 + 2 * i, pts1 + 2 * i);
      if (e2 < th2) score += 1.0 - e2 / th2;
    }
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
  *num_inliers = cnt;

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
  std::memcpy(E_out, best_E, sizeof(best_E));
  std::memcpy(R_out, Rs[best_c], 9 * sizeof(double));
  std::memcpy(t_out, ts[best_c], 3 * sizeof(double));
  return 1;
}

}  // extern "C"
