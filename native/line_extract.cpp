// LSD-style line-segment extraction over EXTERNAL gradient fields.
//
// The core of DeepLSD (Pautrat et al., CVPR 2023) replaces the image
// gradient driving LSD's region growing (von Gioi et al., PAMI 2010) with a
// network-predicted surrogate: a magnitude field (line proximity from the
// distance field) and a level-line angle field (the angle field). The
// reference consumes this through the external `deeplsd` package's modified
// pytlsd (`gluefactory/models/lines/deeplsd.py:9-106`); this is a
// from-scratch implementation of that guided extraction:
//
//   1. pixels sorted by magnitude (1024-bin pseudo-ordering, descending);
//   2. greedy region growing: BFS over 8-neighbours whose angle is within
//      `ang_tol` of the region's running mean direction (angles mod pi,
//      averaged as doubled-angle unit vectors);
//   3. rectangle fit: magnitude-weighted centroid + principal direction of
//      the weighted second-moment matrix; endpoints from the extremal
//      projections; width from the perpendicular extent;
//   4. aligned-density validation (n / (length * width) >= min_density),
//      with one radius-shrink retry like LSD's `reduce_region_radius`;
//   5. segments sorted by length, top max_lines returned.
//
// Build: g++ -O3 -shared -fPIC -o libline_extract.so line_extract.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;

inline float angle_diff(float a, float b) {
  // distance between undirected orientations (mod pi)
  float d = std::fabs(a - b);
  d = std::fmod(d, kPi);
  return std::min(d, kPi - d);
}

struct Region {
  std::vector<int> px;  // flat indices
  float mean_cos = 0.f, mean_sin = 0.f;  // doubled-angle accumulator
  float angle = 0.f;

  void add(int idx, float ang) {
    px.push_back(idx);
    mean_cos += std::cos(2 * ang);
    mean_sin += std::sin(2 * ang);
    angle = 0.5f * std::atan2(mean_sin, mean_cos);
  }
};

struct Rect {
  float x1, y1, x2, y2, length, width, density;
};

Rect fit_rect(const Region& reg, const float* mag, int w) {
  // magnitude-weighted centroid
  double sw = 0, cx = 0, cy = 0;
  for (int idx : reg.px) {
    double m = mag[idx];
    cx += m * (idx % w);
    cy += m * (idx / w);
    sw += m;
  }
  cx /= sw;
  cy /= sw;
  // weighted second moments
  double ixx = 0, iyy = 0, ixy = 0;
  for (int idx : reg.px) {
    double m = mag[idx];
    double dx = (idx % w) - cx, dy = (idx / w) - cy;
    ixx += m * dx * dx;
    iyy += m * dy * dy;
    ixy += m * dx * dy;
  }
  // principal direction (largest eigenvector of [[ixx,ixy],[ixy,iyy]])
  double tr = ixx + iyy, det = ixx * iyy - ixy * ixy;
  double l1 = tr / 2 + std::sqrt(std::max(tr * tr / 4 - det, 0.0));
  double dx, dy;
  if (std::fabs(ixy) > 1e-12) {
    dx = l1 - iyy;
    dy = ixy;
  } else if (ixx >= iyy) {
    dx = 1;
    dy = 0;
  } else {
    dx = 0;
    dy = 1;
  }
  double n = std::hypot(dx, dy);
  dx /= n;
  dy /= n;
  // extremal projections along / across the direction
  double tmin = 1e18, tmax = -1e18, smin = 1e18, smax = -1e18;
  for (int idx : reg.px) {
    double px = (idx % w) - cx, py = (idx / w) - cy;
    double t = px * dx + py * dy;
    double s = -px * dy + py * dx;
    tmin = std::min(tmin, t);
    tmax = std::max(tmax, t);
    smin = std::min(smin, s);
    smax = std::max(smax, s);
  }
  // endpoint trim: a proximity band of half-width r_b extends ~r_b past the
  // true segment ends (the radial distance cap) — pull each endpoint back by
  // the observed half-width so endpoints land on the segment, not the cap
  double half_w = 0.5 * (smax - smin);
  double trim = std::min(half_w, 0.25 * (tmax - tmin));
  tmin += trim;
  tmax -= trim;
  Rect r;
  r.x1 = float(cx + tmin * dx);
  r.y1 = float(cy + tmin * dy);
  r.x2 = float(cx + tmax * dx);
  r.y2 = float(cy + tmax * dy);
  r.length = float(tmax - tmin);
  r.width = float(std::max(smax - smin, 1.0));
  r.density = float(reg.px.size()) / (r.length * r.width + 1e-6f);
  return r;
}

}  // namespace

extern "C" int extract_lines(
    const float* mag,    // (h, w) surrogate gradient magnitude, >= 0
    const float* angle,  // (h, w) level-line / line angle, mod pi
    int h, int w,
    float mag_thresh,    // pixels below this never join a region
    float ang_tol,       // region-growing angle tolerance (rad)
    float min_density,   // aligned-point density threshold (LSD: 0.7)
    int min_size,        // minimum region cardinality
    int max_lines,
    float* out_segs,     // (max_lines, 4): x1 y1 x2 y2
    float* out_scores    // (max_lines): segment length
) {
  const int n = h * w;
  // 1024-bin pseudo-sort by magnitude, descending
  float max_mag = 0.f;
  for (int i = 0; i < n; ++i) max_mag = std::max(max_mag, mag[i]);
  if (max_mag <= 0.f) return 0;
  const int kBins = 1024;
  std::vector<std::vector<int>> bins(kBins);
  for (int i = 0; i < n; ++i) {
    if (mag[i] < mag_thresh) continue;
    int b = std::min(int(mag[i] / max_mag * kBins), kBins - 1);
    bins[b].push_back(i);
  }
  std::vector<uint8_t> used(n, 0);
  std::vector<Rect> rects;
  std::vector<int> queue;

  auto grow = [&](int seed, Region& reg) {
    reg = Region();
    queue.clear();
    queue.push_back(seed);
    used[seed] = 1;
    reg.add(seed, angle[seed]);
    for (size_t qi = 0; qi < queue.size(); ++qi) {
      int idx = queue[qi];
      int x = idx % w, y = idx / w;
      for (int dy = -1; dy <= 1; ++dy) {
        for (int dx = -1; dx <= 1; ++dx) {
          int nx = x + dx, ny = y + dy;
          if (nx < 0 || nx >= w || ny < 0 || ny >= h) continue;
          int ni = ny * w + nx;
          if (used[ni] || mag[ni] < mag_thresh) continue;
          if (angle_diff(angle[ni], reg.angle) > ang_tol) continue;
          used[ni] = 1;
          reg.add(ni, angle[ni]);
          queue.push_back(ni);
        }
      }
    }
  };

  for (int b = kBins - 1; b >= 0; --b) {
    for (int seed : bins[b]) {
      if (used[seed]) continue;
      Region reg;
      grow(seed, reg);
      if (int(reg.px.size()) < min_size) continue;
      Rect r = fit_rect(reg, mag, w);
      if (r.density < min_density) {
        // LSD reduce_region_radius: drop pixels far from the centroid and
        // refit once
        float cx = 0.5f * (r.x1 + r.x2), cy = 0.5f * (r.y1 + r.y2);
        float rad = 0.75f * 0.5f * r.length;
        Region reg2;
        for (int idx : reg.px) {
          float px = idx % w - cx, py = idx / w - cy;
          if (px * px + py * py <= rad * rad) reg2.add(idx, angle[idx]);
        }
        if (int(reg2.px.size()) < min_size) continue;
        r = fit_rect(reg2, mag, w);
        if (r.density < min_density) continue;
      }
      rects.push_back(r);
    }
  }
  std::sort(rects.begin(), rects.end(),
            [](const Rect& a, const Rect& b) { return a.length > b.length; });
  int m = std::min<int>(rects.size(), max_lines);
  for (int i = 0; i < m; ++i) {
    out_segs[4 * i + 0] = rects[i].x1;
    out_segs[4 * i + 1] = rects[i].y1;
    out_segs[4 * i + 2] = rects[i].x2;
    out_segs[4 * i + 3] = rects[i].y2;
    out_scores[i] = rects[i].length;
  }
  return m;
}
