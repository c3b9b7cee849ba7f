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
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
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


// ---------------------------------------------------------------------------
// Sparse-ladder kernel-map builder (host side of
// pdm_ssd_tpu/ops/sparse_maps.py — see that file for the semantics; this is
// the O(V*27) sorted-merge fast path, ~40x the numpy searchsorted builder (70 ms/sample vs 2.8 s at the 0.05 m caps):
// every tap of the 27-tap maps is one sequential two-pointer pass over the
// sorted flat keys — no random probes).
// ---------------------------------------------------------------------------

namespace {

struct Stage {
  std::vector<int32_t> coords;  // (n, 3) zyx sorted by flat
  std::vector<int64_t> keys;    // (n,) sorted flat keys of the actives
  int n = 0;
  int64_t D = 0, H = 0, W = 0;
  inline int64_t flat(int64_t z, int64_t y, int64_t x) const {
    return (z * H + y) * W + x;
  }
  void build_keys() {
    keys.resize(n);
    for (int i = 0; i < n; ++i)
      keys[i] = flat(coords[i * 3], coords[i * 3 + 1], coords[i * 3 + 2]);
  }
};

// submanifold 3x3x3 neighbor map; out (cap, 27), absent -> cap.
// Both the sites and their per-tap target keys are sorted (the flat-key
// order invariant), so taps resolve by sequential two-pointer merges over
// the key array — no random probes (the probes dominated the earlier
// builder: ~190 -> ~60 ms/sample at the 0.05 m shapes). The three x-taps
// of each (dz, dy) group target ADJACENT keys (tk-1, tk, tk+1), which in
// the sorted array sit at consecutive positions — so ONE merge pass per
// group resolves all three (9 passes instead of 27; measured 69.6 ->
// ~40 ms/sample at the production caps).
void subm_map(const Stage &s, int cap, int32_t *out) {
  std::fill(out, out + (int64_t)cap * 27, cap);
  for (int i = 0; i < s.n; ++i) out[(int64_t)i * 27 + 13] = i;  // center tap
  int g = 0;
  for (int dz = -1; dz <= 1; ++dz)
    for (int dy = -1; dy <= 1; ++dy, ++g) {
      const int k0 = g * 3;  // taps (dz, dy, {-1, 0, +1})
      const bool center_group = (dz == 0 && dy == 0);
      const int64_t off = (dz * s.H + dy) * s.W;
      int j = 0;
      for (int i = 0; i < s.n; ++i) {
        const int64_t z = s.coords[i * 3] + dz,
                      y = s.coords[i * 3 + 1] + dy;
        if (z < 0 || z >= s.D || y < 0 || y >= s.H) continue;
        const int64_t x = s.coords[i * 3 + 2];
        const int64_t tk = s.keys[i] + off;  // dx = 0 target
        while (j < s.n && s.keys[j] < tk - 1) ++j;
        int j2 = j;
        if (j2 < s.n && s.keys[j2] == tk - 1) {
          // x == 0: key tk-1 is the previous row's last cell, not a
          // neighbor — advance past it but set no tap.
          if (x > 0) out[(int64_t)i * 27 + k0] = j2;
          ++j2;
        }
        if (j2 < s.n && s.keys[j2] == tk) {
          // dz == dy == 0: dx = 0 is the center tap, already set to i
          if (!center_group) out[(int64_t)i * 27 + k0 + 1] = j2;
          ++j2;
        }
        if (x + 1 < s.W && j2 < s.n && s.keys[j2] == tk + 1)
          out[(int64_t)i * 27 + k0 + 2] = j2;
      }
    }
}

// strided sparse-conv output sites + per-tap input map
void down_stage(const Stage &in, const int *ks, const int *st, const int *pd,
                int cap_out, Stage &out, int32_t *map /* (cap_out, K) */) {
  out.D = (in.D + 2 * pd[0] - ks[0]) / st[0] + 1;
  out.H = (in.H + 2 * pd[1] - ks[1]) / st[1] + 1;
  out.W = (in.W + 2 * pd[2] - ks[2]) / st[2] + 1;
  // active-output discovery via a bitmap over the (small, <=12M cell)
  // output grid: set one bit per (input, reachable output) pair, then a
  // single in-order scan emits the sorted deduped actives — replaces the
  // former sort+unique of the ~8n candidate list (the builder's next
  // hotspot after the tap merges went sequential).
  const int64_t ncell = out.D * out.H * out.W;
  std::vector<uint64_t> bits((size_t)((ncell + 63) >> 6), 0);
  for (int i = 0; i < in.n; ++i) {
    int64_t c[3] = {in.coords[i * 3], in.coords[i * 3 + 1],
                    in.coords[i * 3 + 2]};
    int64_t lims[3] = {out.D, out.H, out.W};
    int64_t oz[3], oy[3], ox[3];
    int nz = 0, ny = 0, nx = 0;
    for (int k = 0; k < ks[0]; ++k) {
      int64_t num = c[0] + pd[0] - k;
      if (num >= 0 && num % st[0] == 0 && num / st[0] < lims[0])
        oz[nz++] = num / st[0];
    }
    for (int k = 0; k < ks[1]; ++k) {
      int64_t num = c[1] + pd[1] - k;
      if (num >= 0 && num % st[1] == 0 && num / st[1] < lims[1])
        oy[ny++] = num / st[1];
    }
    for (int k = 0; k < ks[2]; ++k) {
      int64_t num = c[2] + pd[2] - k;
      if (num >= 0 && num % st[2] == 0 && num / st[2] < lims[2])
        ox[nx++] = num / st[2];
    }
    for (int a = 0; a < nz; ++a)
      for (int b = 0; b < ny; ++b)
        for (int d = 0; d < nx; ++d) {
          int64_t f = (oz[a] * out.H + oy[b]) * out.W + ox[d];
          bits[(size_t)(f >> 6)] |= 1ull << (f & 63);
        }
  }
  out.n = 0;
  out.coords.assign((size_t)cap_out * 3, 0);
  for (size_t w = 0; w < bits.size() && out.n < cap_out; ++w) {
    uint64_t word = bits[w];
    while (word && out.n < cap_out) {
      int64_t f = ((int64_t)w << 6) + __builtin_ctzll(word);
      word &= word - 1;
      out.coords[out.n * 3 + 2] = (int32_t)(f % out.W);
      out.coords[out.n * 3 + 1] = (int32_t)((f / out.W) % out.H);
      out.coords[out.n * 3 + 0] = (int32_t)(f / (out.W * out.H));
      ++out.n;
    }
  }
  out.build_keys();
  const int K = ks[0] * ks[1] * ks[2];
  const int cap_in_slot = (int)(in.coords.size() / 3);
  std::fill(map, map + (int64_t)cap_out * K, cap_in_slot);
  // two-pointer merges (see subm_map): the input target key
  // flat_in(z*st-pd+kz, ...) is monotone in the sorted output order. For
  // 3-wide x kernels the three kx taps target CONSECUTIVE keys, so one
  // pass per (kz, ky) group resolves all three.
  if (ks[2] == 3) {
    int g = 0;
    for (int kz = 0; kz < ks[0]; ++kz)
      for (int ky = 0; ky < ks[1]; ++ky, ++g) {
        const int k0 = g * 3;
        int j = 0;
        for (int i = 0; i < out.n; ++i) {
          const int64_t sz = out.coords[i * 3] * st[0] - pd[0] + kz,
                        sy = out.coords[i * 3 + 1] * st[1] - pd[1] + ky,
                        sx0 = out.coords[i * 3 + 2] * st[2] - pd[2];
          if (sz < 0 || sz >= in.D || sy < 0 || sy >= in.H) continue;
          // kx = 0 target key; stays linear in x even when sx0 = -1
          // (the out-of-range taps are guarded below but still consume
          // their adjacent key positions)
          const int64_t tk = (sz * in.H + sy) * in.W + sx0;
          while (j < in.n && in.keys[j] < tk) ++j;
          int j2 = j;
          for (int kx = 0; kx < 3; ++kx) {
            const int64_t sx = sx0 + kx;
            if (j2 < in.n && in.keys[j2] == tk + kx) {
              if (sx >= 0 && sx < in.W)
                map[(int64_t)i * K + k0 + kx] = j2;
              ++j2;
            }
          }
        }
      }
  } else {
    int k = 0;
    for (int kz = 0; kz < ks[0]; ++kz)
      for (int ky = 0; ky < ks[1]; ++ky)
        for (int kx = 0; kx < ks[2]; ++kx, ++k) {
          int j = 0;
          for (int i = 0; i < out.n; ++i) {
            const int64_t sz = out.coords[i * 3] * st[0] - pd[0] + kz,
                          sy = out.coords[i * 3 + 1] * st[1] - pd[1] + ky,
                          sx = out.coords[i * 3 + 2] * st[2] - pd[2] + kx;
            if (sz < 0 || sz >= in.D || sy < 0 || sy >= in.H || sx < 0 ||
                sx >= in.W)
              continue;
            const int64_t tk = in.flat(sz, sy, sx);
            while (j < in.n && in.keys[j] < tk) ++j;
            if (j == in.n) break;
            if (in.keys[j] == tk) map[(int64_t)i * K + k] = j;
          }
        }
  }
}

// transpose of a strided-conv rulebook (the host analog of spconv's
// SparseInverseConv3d indice_key reuse; see sparse_maps.invert_down_map):
// up[j, K-1-k] = i iff down[i, k] == j. Consumed as the UNet decoder's
// inverse-conv forward map AND as the gather-transpose training backward
// plan (`sparse_backbone.sparse_conv_mm`).
void invert_map(const int32_t *down, int cap_out, int K, int cap_in,
                int32_t *up) {
  std::fill(up, up + (int64_t)cap_in * K, cap_out);
  for (int i = 0; i < cap_out; ++i)
    for (int k = 0; k < K; ++k) {
      int32_t j = down[(int64_t)i * K + k];
      if (j < cap_in) up[(int64_t)j * K + (K - 1 - k)] = i;
    }
}

// One sample of the ladder build; pointers are per-sample slices. The
// four up* pointers may be null (eval path skips the transpose maps).
void build_one(const int32_t *coords, int n_in, const int32_t *dims0,
               const int32_t *caps, int32_t *perm1, int32_t *coords1,
               uint8_t *mask1, int32_t *submap1, int32_t *coords2,
               uint8_t *mask2, int32_t *downmap2, int32_t *submap2,
               int32_t *coords3, uint8_t *mask3, int32_t *downmap3,
               int32_t *submap3, int32_t *coords4, uint8_t *mask4,
               int32_t *downmap4, int32_t *submap4, int32_t *coords_out,
               uint8_t *mask_out, int32_t *outmap, int32_t *upmap2,
               int32_t *upmap3, int32_t *upmap4, int32_t *upmap_out) {
  const int specs[4][3][3] = {
      {{3, 3, 3}, {2, 2, 2}, {1, 1, 1}},
      {{3, 3, 3}, {2, 2, 2}, {1, 1, 1}},
      {{3, 3, 3}, {2, 2, 2}, {0, 1, 1}},
      {{3, 1, 1}, {2, 1, 1}, {0, 0, 0}},
  };
  Stage s1;
  s1.D = dims0[0];
  s1.H = dims0[1];
  s1.W = dims0[2];
  int n1 = std::min(n_in, caps[0]);
  // sort input slots by flat key; perm1 maps sorted slot -> input slot
  std::vector<std::pair<int64_t, int32_t>> order(n1);
  for (int i = 0; i < n1; ++i)
    order[i] = {s1.flat(coords[i * 3], coords[i * 3 + 1], coords[i * 3 + 2]),
                i};
  std::sort(order.begin(), order.end());
  s1.n = n1;
  s1.coords.assign((size_t)caps[0] * 3, 0);
  std::fill(perm1, perm1 + caps[0], 0);
  std::fill(mask1, mask1 + caps[0], 0);
  for (int i = 0; i < n1; ++i) {
    int32_t src = order[i].second;
    perm1[i] = src;
    mask1[i] = 1;
    for (int a = 0; a < 3; ++a) s1.coords[i * 3 + a] = coords[src * 3 + a];
  }
  std::memcpy(coords1, s1.coords.data(), sizeof(int32_t) * (size_t)caps[0] * 3);
  s1.build_keys();
  subm_map(s1, caps[0], submap1);

  Stage s2, s3, s4, so;
  Stage *stages[4] = {&s2, &s3, &s4, &so};
  Stage *prev = &s1;
  int32_t *coord_out[4] = {coords2, coords3, coords4, coords_out};
  uint8_t *mask_arr[4] = {mask2, mask3, mask4, mask_out};
  int32_t *down_arr[4] = {downmap2, downmap3, downmap4, outmap};
  int32_t *subm_arr[4] = {submap2, submap3, submap4, nullptr};
  int32_t *up_arr[4] = {upmap2, upmap3, upmap4, upmap_out};
  const int Ks[4] = {27, 27, 27, 3};
  for (int t = 0; t < 4; ++t) {
    Stage &cur = *stages[t];
    down_stage(*prev, specs[t][0], specs[t][1], specs[t][2], caps[t + 1], cur,
               down_arr[t]);
    std::memcpy(coord_out[t], cur.coords.data(),
                sizeof(int32_t) * (size_t)caps[t + 1] * 3);
    std::fill(mask_arr[t], mask_arr[t] + caps[t + 1], 0);
    std::fill(mask_arr[t], mask_arr[t] + cur.n, 1);
    if (subm_arr[t]) subm_map(cur, caps[t + 1], subm_arr[t]);
    if (up_arr[t])
      invert_map(down_arr[t], caps[t + 1], Ks[t], caps[t], up_arr[t]);
    prev = &cur;
  }
}

}  // namespace

extern "C" {

// One sample of build_backbone8x_maps (sparse_maps.py). Returns 0.
// coords: (n_in, 3) zyx (any order); dims0 = (D+1, H, W); caps (5).
int build_ladder_maps(
    const int32_t *coords, int n_in, const int32_t *dims0,
    const int32_t *caps, int32_t *perm1, int32_t *coords1, uint8_t *mask1,
    int32_t *submap1, int32_t *coords2, uint8_t *mask2, int32_t *downmap2,
    int32_t *submap2, int32_t *coords3, uint8_t *mask3, int32_t *downmap3,
    int32_t *submap3, int32_t *coords4, uint8_t *mask4, int32_t *downmap4,
    int32_t *submap4, int32_t *coords_out, uint8_t *mask_out,
    int32_t *outmap) {
  build_one(coords, n_in, dims0, caps, perm1, coords1, mask1, submap1,
            coords2, mask2, downmap2, submap2, coords3, mask3, downmap3,
            submap3, coords4, mask4, downmap4, submap4, coords_out, mask_out,
            outmap, nullptr, nullptr, nullptr, nullptr);
  return 0;
}

// Whole-batch ladder build with a C-level worker pool over the samples
// (the reference amortizes rulebook building across CUDA threads;
// here the batch dim is the host-side parallel axis — ONE GIL-released
// ctypes call per batch, samples fanned out over `n_threads` std::threads
// with per-thread Stage arenas on their own stacks).
//
//   coords   (B, V, 3) int32   n_ins (B,) valid prefix lengths
//   outs: array of 17 (+4 with want_upmaps) batched output pointers in
//   LADDER_ARG_ORDER (+ upmap2, upmap3, upmap4, upmap_out), each (B, ...).
int build_ladder_maps_batch(const int32_t *coords, const int32_t *n_ins,
                            int B, int V, const int32_t *dims0,
                            const int32_t *caps, int want_upmaps,
                            int n_threads, void **outs) {
  const int64_t c1 = caps[0], c2 = caps[1], c3 = caps[2], c4 = caps[3],
                co = caps[4];
  // per-sample element strides of the 21 outputs, in ABI order
  const int64_t strides[21] = {
      c1,     c1 * 3, c1,     c1 * 27,                    // perm1..submap1
      c2 * 3, c2,     c2 * 27, c2 * 27,                   // stage 2
      c3 * 3, c3,     c3 * 27, c3 * 27,                   // stage 3
      c4 * 3, c4,     c4 * 27, c4 * 27,                   // stage 4
      co * 3, co,     co * 3,                             // out
      c1 * 27, c2 * 27,                                   // upmap2, upmap3
  };
  const int64_t up4_stride = c3 * 27, upout_stride = c4 * 3;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= B) return;
      auto p32 = [&](int idx, int64_t stride) {
        return (int32_t *)outs[idx] + (int64_t)b * stride;
      };
      auto pu8 = [&](int idx, int64_t stride) {
        return (uint8_t *)outs[idx] + (int64_t)b * stride;
      };
      build_one(
          coords + (int64_t)b * V * 3, n_ins[b], dims0, caps,
          p32(0, strides[0]), p32(1, strides[1]), pu8(2, strides[2]),
          p32(3, strides[3]), p32(4, strides[4]), pu8(5, strides[5]),
          p32(6, strides[6]), p32(7, strides[7]), p32(8, strides[8]),
          pu8(9, strides[9]), p32(10, strides[10]), p32(11, strides[11]),
          p32(12, strides[12]), pu8(13, strides[13]), p32(14, strides[14]),
          p32(15, strides[15]), p32(16, strides[16]), pu8(17, strides[17]),
          p32(18, strides[18]),
          want_upmaps ? p32(19, strides[19]) : nullptr,
          want_upmaps ? p32(20, strides[20]) : nullptr,
          want_upmaps ? (int32_t *)outs[21] + (int64_t)b * up4_stride
                      : nullptr,
          want_upmaps ? (int32_t *)outs[22] + (int64_t)b * upout_stride
                      : nullptr);
    }
  };
  int nt = std::max(1, std::min(n_threads, B));
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto &th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
