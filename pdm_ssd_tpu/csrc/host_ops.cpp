// Native host-side ops for the data pipeline (C++ equivalents of the
// reference's CPU extensions):
//
//   - rotated_overlap_bev: exact rotated-rectangle intersection areas via
//     Sutherland-Hodgman clipping (role of `pcdet/ops/iou3d_nms/src/
//     iou3d_cpu.cpp` — used by the GT-sampling collision check and the
//     KITTI evaluator's BEV/3D overlaps).
//   - points_in_boxes_cpu: per-(box, point) rotated containment mask (role of
//     `roiaware_pool3d` CPU path — GT-database creation).
//   - voxelize: point -> (voxel, coord, count) hash with per-voxel point cap
//     (role of spconv's Point2VoxelCPU3d in `data_processor.py:16-61`).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image). Built by
// `pdm_ssd_tpu/csrc/__init__.py` with g++ -O3 on first import; every caller
// has a vectorized numpy fallback, so the native library is a pure
// acceleration layer for dataloader workers.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct P2 {
  double x, y;
};

inline double cross(const P2 &o, const P2 &a, const P2 &b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// corners of box (cx, cy, dx, dy, angle), CCW
inline void corners(const float *b, P2 out[4]) {
  double c = std::cos((double)b[4]), s = std::sin((double)b[4]);
  double hx = b[2] / 2.0, hy = b[3] / 2.0;
  const double lx[4] = {hx, -hx, -hx, hx};
  const double ly[4] = {hy, hy, -hy, -hy};
  for (int i = 0; i < 4; ++i) {
    out[i].x = lx[i] * c - ly[i] * s + b[0];
    out[i].y = lx[i] * s + ly[i] * c + b[1];
  }
}

// clip convex polygon by the left half-plane of edge a->b
inline int clip_halfplane(const P2 *in, int n, P2 a, P2 b, P2 *out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const P2 &cur = in[i];
    const P2 &nxt = in[(i + 1) % n];
    double dc = cross(a, b, cur);
    double dn = cross(a, b, nxt);
    if (dc >= 0) out[m++] = cur;
    if ((dc >= 0) != (dn >= 0)) {
      double t = dc / (dc - dn);
      out[m].x = cur.x + t * (nxt.x - cur.x);
      out[m].y = cur.y + t * (nxt.y - cur.y);
      ++m;
    }
  }
  return m;
}

inline double rect_overlap(const float *ra, const float *rb) {
  P2 pa[16], pb[16], ca[4], cb[4];
  corners(ra, ca);
  corners(rb, cb);
  int n = 4;
  std::memcpy(pa, ca, sizeof(ca));
  P2 *cur = pa, *nxt = pb;
  for (int e = 0; e < 4 && n >= 3; ++e) {
    n = clip_halfplane(cur, n, cb[e], cb[(e + 1) % 4], nxt);
    std::swap(cur, nxt);
  }
  if (n < 3) return 0.0;
  double area = 0.0;
  for (int i = 0; i < n; ++i) {
    const P2 &p = cur[i];
    const P2 &q = cur[(i + 1) % n];
    area += p.x * q.y - q.x * p.y;
  }
  return std::fabs(area) / 2.0;
}

}  // namespace

extern "C" {

// rects: (n, 5) [cx, cy, dx, dy, angle]; out: (n, m) intersection areas
void rotated_overlap_bev(const float *rects_a, int n, const float *rects_b,
                         int m, float *out) {
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < m; ++j)
      out[i * m + j] = (float)rect_overlap(rects_a + i * 5, rects_b + j * 5);
}

// points: (n, 3); boxes: (m, 7) center-z; out: (m, n) 0/1
void points_in_boxes_cpu(const float *pts, int n, const float *boxes, int m,
                         int32_t *out) {
  for (int j = 0; j < m; ++j) {
    const float *b = boxes + j * 7;
    float ca = std::cos(-b[6]), sa = std::sin(-b[6]);
    for (int i = 0; i < n; ++i) {
      const float *p = pts + i * 3;
      float dx = p[0] - b[0], dy = p[1] - b[1], dz = p[2] - b[2];
      float lx = dx * ca - dy * sa;
      float ly = dx * sa + dy * ca;
      out[j * n + i] = (std::fabs(dz) <= b[5] / 2.0f &&
                        std::fabs(lx) < b[3] / 2.0f + 1e-5f &&
                        std::fabs(ly) < b[4] / 2.0f + 1e-5f)
                           ? 1
                           : 0;
    }
  }
}

// points (n, nf) with xyz leading; returns number of voxels written.
// out_voxels: (max_vox, max_pts, nf); out_coords: (max_vox, 3) zyx;
// out_num: (max_vox,)
int voxelize(const float *points, int n, int nf, const float *voxel_size,
             const float *range_min, const int32_t *grid, int max_pts,
             int max_vox, float *out_voxels, int32_t *out_coords,
             int32_t *out_num) {
  std::unordered_map<int64_t, int> table;
  table.reserve(n);
  int n_vox = 0;
  const int64_t gx = grid[0], gy = grid[1], gz = grid[2];
  for (int i = 0; i < n; ++i) {
    const float *p = points + i * nf;
    int64_t ix = (int64_t)std::floor((p[0] - range_min[0]) / voxel_size[0]);
    int64_t iy = (int64_t)std::floor((p[1] - range_min[1]) / voxel_size[1]);
    int64_t iz = (int64_t)std::floor((p[2] - range_min[2]) / voxel_size[2]);
    if (ix < 0 || ix >= gx || iy < 0 || iy >= gy || iz < 0 || iz >= gz)
      continue;
    int64_t key = (iz * gy + iy) * gx + ix;
    auto it = table.find(key);
    int v;
    if (it == table.end()) {
      if (n_vox >= max_vox) continue;
      v = n_vox++;
      table.emplace(key, v);
      out_coords[v * 3 + 0] = (int32_t)iz;
      out_coords[v * 3 + 1] = (int32_t)iy;
      out_coords[v * 3 + 2] = (int32_t)ix;
      out_num[v] = 0;
    } else {
      v = it->second;
    }
    if (out_num[v] < max_pts) {
      std::memcpy(out_voxels + ((int64_t)v * max_pts + out_num[v]) * nf, p,
                  sizeof(float) * nf);
      out_num[v] += 1;
    }
  }
  return n_vox;
}

}  // extern "C"
