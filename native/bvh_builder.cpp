// Native binned-SAH BVH builder for yulio_raytracer_tpu.
//
// Replaces the role of Embree's rtcCommit BVH build (the reference's only
// native acceleration-structure component) for large scenes where the
// numpy reference builder (geometry/bvh.py) is too slow.  Produces the
// exact same flattened skip-pointer layout: DFS order, interior node i's
// left child at i+1, skip[i] = end of subtree; leaf = (start, count) into
// the permuted triangle order.
//
// C ABI, consumed via ctypes (no pybind11 in the build image).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void grow(const AABB &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float half_area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Builder {
  const AABB *boxes;
  const Vec3 *cents;
  int leaf_size;
  int nbins;

  std::vector<float> lo, hi;
  std::vector<int32_t> start, count, skip;
  std::vector<int64_t> order;

  int emit_leaf(const AABB &b, int64_t *idx, int64_t n) {
    int me = (int)count.size();
    push_node(b);
    start[me] = (int32_t)order.size();
    count[me] = (int32_t)n;
    order.insert(order.end(), idx, idx + n);
    return me;
  }

  void push_node(const AABB &b) {
    lo.insert(lo.end(), {b.lo.x, b.lo.y, b.lo.z});
    hi.insert(hi.end(), {b.hi.x, b.hi.y, b.hi.z});
    start.push_back(0);
    count.push_back(0);
    skip.push_back(0);
  }

  // returns subtree end (== skip of the root of this subtree)
  int build(int64_t *idx, int64_t n) {
    AABB bounds;
    for (int64_t i = 0; i < n; ++i) bounds.grow(boxes[idx[i]]);

    if (n <= leaf_size) {
      int me = emit_leaf(bounds, idx, n);
      skip[me] = me + 1;
      return me + 1;
    }

    // centroid bounds + widest axis
    AABB cb;
    for (int64_t i = 0; i < n; ++i) cb.grow(cents[idx[i]]);
    float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    float clo = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
    float extent = ext[axis];

    int64_t *mid = nullptr;
    if (extent > 1e-30f) {
      // binned SAH sweep
      const int B = nbins;
      std::vector<AABB> bbox(B);
      std::vector<int64_t> cnt(B, 0);
      float scale = B * (1.0f - 1e-6f) / extent;
      auto bin_of = [&](int64_t t) {
        const Vec3 &c = cents[t];
        float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
        int b = (int)((v - clo) * scale);
        return std::min(std::max(b, 0), B - 1);
      };
      for (int64_t i = 0; i < n; ++i) {
        int b = bin_of(idx[i]);
        cnt[b]++;
        bbox[b].grow(boxes[idx[i]]);
      }
      // suffix sweep
      std::vector<float> rarea(B);
      std::vector<int64_t> rcnt(B);
      {
        AABB acc;
        int64_t c = 0;
        for (int b = B - 1; b >= 0; --b) {
          acc.grow(bbox[b]);
          c += cnt[b];
          rarea[b] = acc.half_area();
          rcnt[b] = c;
        }
      }
      // prefix sweep + best split
      float best_cost = std::numeric_limits<float>::infinity();
      int best_k = -1;
      {
        AABB acc;
        int64_t c = 0;
        for (int b = 0; b < B - 1; ++b) {
          acc.grow(bbox[b]);
          c += cnt[b];
          if (c == 0 || rcnt[b + 1] == 0) continue;
          float cost = c * acc.half_area() + rcnt[b + 1] * rarea[b + 1];
          if (cost < best_cost) {
            best_cost = cost;
            best_k = b;
          }
        }
      }
      if (best_k >= 0) {
        mid = std::partition(idx, idx + n, [&](int64_t t) {
          return bin_of(t) <= best_k;
        });
        if (mid == idx || mid == idx + n) mid = nullptr;
      }
    }
    if (!mid) {
      // median fallback
      mid = idx + n / 2;
      std::nth_element(idx, mid, idx + n, [&](int64_t a, int64_t b) {
        const Vec3 &ca = cents[a];
        const Vec3 &cb2 = cents[b];
        float va = axis == 0 ? ca.x : (axis == 1 ? ca.y : ca.z);
        float vb = axis == 0 ? cb2.x : (axis == 1 ? cb2.y : cb2.z);
        return va < vb;
      });
    }

    int me = (int)count.size();
    push_node(bounds);
    build(idx, mid - idx);
    int end = build(mid, idx + n - mid);
    skip[me] = end;
    return end;
  }
};

}  // namespace

extern "C" {

// Returns number of nodes, or -1 if max_nodes was insufficient.
// Outputs: lo/hi (max_nodes*3), start/count/skip (max_nodes),
// order (T entries: new position -> old triangle index).
int64_t yrt_build_bvh(const float *v0, const float *e1, const float *e2,
                      const uint8_t *valid, int64_t T, int32_t leaf_size,
                      int32_t nbins, float *out_lo, float *out_hi,
                      int32_t *out_start, int32_t *out_count,
                      int32_t *out_skip, int64_t *out_order,
                      int64_t max_nodes) {
  std::vector<AABB> boxes(T);
  std::vector<Vec3> cents(T);
  std::vector<int64_t> live;
  std::vector<int64_t> dead;
  live.reserve(T);
  for (int64_t t = 0; t < T; ++t) {
    Vec3 a{v0[3 * t], v0[3 * t + 1], v0[3 * t + 2]};
    Vec3 b{a.x + e1[3 * t], a.y + e1[3 * t + 1], a.z + e1[3 * t + 2]};
    Vec3 c{a.x + e2[3 * t], a.y + e2[3 * t + 1], a.z + e2[3 * t + 2]};
    AABB bb;
    bb.grow(a);
    bb.grow(b);
    bb.grow(c);
    boxes[t] = bb;
    cents[t] = {0.5f * (bb.lo.x + bb.hi.x), 0.5f * (bb.lo.y + bb.hi.y),
                0.5f * (bb.lo.z + bb.hi.z)};
    if (valid[t])
      live.push_back(t);
    else
      dead.push_back(t);
  }

  Builder bld;
  bld.boxes = boxes.data();
  bld.cents = cents.data();
  bld.leaf_size = leaf_size;
  bld.nbins = nbins;
  bld.build(live.data(), (int64_t)live.size());

  int64_t n = (int64_t)bld.count.size();
  if (n > max_nodes) return -1;
  std::memcpy(out_lo, bld.lo.data(), n * 3 * sizeof(float));
  std::memcpy(out_hi, bld.hi.data(), n * 3 * sizeof(float));
  std::memcpy(out_start, bld.start.data(), n * sizeof(int32_t));
  std::memcpy(out_count, bld.count.data(), n * sizeof(int32_t));
  std::memcpy(out_skip, bld.skip.data(), n * sizeof(int32_t));
  bld.order.insert(bld.order.end(), dead.begin(), dead.end());
  std::memcpy(out_order, bld.order.data(), T * sizeof(int64_t));
  return n;
}

}  // extern "C"
