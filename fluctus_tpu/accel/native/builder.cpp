// Native SBVH/BVH builder — C++ implementation of the host hierarchy build.
//
// Capability parity with the reference's C++ builders (src/bvh.cpp SAH sweep,
// src/sbvh.cpp spatial splits) and semantic parity with the NumPy builders in
// accel/bvh.py + accel/sbvh.py: full-sweep object SAH over 3 axes,
// chopped-AABB-binning spatial splits gated by the alpha overlap threshold,
// reference duplication, MaxLeaf/MaxDepth bounds, pre-order flat emission
// with left-child = index + 1. ~100-1000x the Python build speed; required
// for San-Miguel-scale scenes (SURVEY §7 "hard parts").
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <future>
#include <limits>
#include <numeric>
#include <thread>
#include <vector>

namespace {

constexpr int SPATIAL_BINS = 128;

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float get(const Vec3 &v, int axis) {
  return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
}
static inline void set(Vec3 &v, int axis, float val) {
  if (axis == 0) v.x = val; else if (axis == 1) v.y = val; else v.z = val;
}

struct AABB {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void grow(const AABB &o) { lo = vmin(lo, o.lo); hi = vmax(hi, o.hi); }
  double area() const {
    double dx = std::max(0.0f, hi.x - lo.x);
    double dy = std::max(0.0f, hi.y - lo.y);
    double dz = std::max(0.0f, hi.z - lo.z);
    return 2.0 * (dx * dy + dy * dz + dz * dx);
  }
  bool valid() const { return lo.x <= hi.x; }
};

struct Ref {
  int32_t prim;
  AABB box;
  Vec3 centroid() const {
    return {(box.lo.x + box.hi.x) * 0.5f, (box.lo.y + box.hi.y) * 0.5f,
            (box.lo.z + box.hi.z) * 0.5f};
  }
};

// Sutherland-Hodgman clip of a convex polygon against one axis half-space.
// keep_below keeps points with coord <= plane. Returns the vertex count.
static int clip_poly(const Vec3 *in, int n_in, Vec3 *out, int axis,
                     float plane, bool keep_below) {
  int n_out = 0;
  for (int i = 0; i < n_in; ++i) {
    const Vec3 &a = in[i];
    const Vec3 &b = in[(i + 1) % n_in];
    float da = get(a, axis) - plane;
    float db = get(b, axis) - plane;
    bool ia = keep_below ? da <= 0.0f : da >= 0.0f;
    bool ib = keep_below ? db <= 0.0f : db >= 0.0f;
    if (ia) out[n_out++] = a;
    if (ia != ib) {
      float t = da / (da - db);
      out[n_out++] = {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
                      a.z + t * (b.z - a.z)};
    }
  }
  return n_out;
}

// Exact clipped bounds: AABB of (triangle `prim` clipped to the axis slab
// [lo_p, hi_p]) intersected with the reference's current box (refs carry
// ancestor-split bounds tighter than the full triangle). Invalid AABB when
// the clipped polygon is empty — the triangle does not actually reach this
// slab even though its reference box straddles it.
struct TriClip {
  const float *v0, *v1, *v2;
  AABB slab_box(int prim, int axis, float lo_p, float hi_p,
                const AABB &refbox) const {
    Vec3 poly_a[8], poly_b[8];
    poly_a[0] = {v0[3 * prim], v0[3 * prim + 1], v0[3 * prim + 2]};
    poly_a[1] = {v1[3 * prim], v1[3 * prim + 1], v1[3 * prim + 2]};
    poly_a[2] = {v2[3 * prim], v2[3 * prim + 1], v2[3 * prim + 2]};
    int n = 3;
    if (lo_p > -std::numeric_limits<float>::infinity()) {
      n = clip_poly(poly_a, n, poly_b, axis, lo_p, false);
      std::memcpy(poly_a, poly_b, n * sizeof(Vec3));
    }
    if (hi_p < std::numeric_limits<float>::infinity())
      n = clip_poly(poly_a, n, poly_b, axis, hi_p, true);
    else
      std::memcpy(poly_b, poly_a, n * sizeof(Vec3));
    AABB out;
    for (int i = 0; i < n; ++i) {
      out.lo = vmin(out.lo, poly_b[i]);
      out.hi = vmax(out.hi, poly_b[i]);
    }
    if (!out.valid()) return out;
    out.lo = vmax(out.lo, refbox.lo);
    out.hi = vmin(out.hi, refbox.hi);
    return out;
  }
};

struct Builder {
  int max_leaf;
  int max_depth;
  double alpha;
  bool spatial;
  double root_area = 0.0;
  int depth_seen = 0;
  TriClip tris{nullptr, nullptr, nullptr};
  // duplication stats (reference logs these per build, src/sbvh.cpp:41-48)
  int64_t n_spatial_nodes = 0;
  int64_t n_duplicated = 0;
  int64_t n_unsplit_left = 0;
  int64_t n_unsplit_right = 0;

  std::vector<float> node_lo, node_hi;
  std::vector<int32_t> node_right, node_count, node_parent;
  std::vector<int32_t> out_prims;

  int emit_node(const AABB &box, int parent, bool is_right) {
    int idx = static_cast<int>(node_count.size());
    if (is_right && parent >= 0) node_right[parent] = idx;
    node_lo.insert(node_lo.end(), {box.lo.x, box.lo.y, box.lo.z});
    node_hi.insert(node_hi.end(), {box.hi.x, box.hi.y, box.hi.z});
    node_parent.push_back(parent);
    node_right.push_back(-1);
    node_count.push_back(0);
    return idx;
  }

  void build(std::vector<Ref> &refs, int parent, bool is_right, int depth) {
    AABB box;
    for (const Ref &r : refs) box.grow(r.box);
    int idx = emit_node(box, parent, is_right);
    depth_seen = std::max(depth_seen, depth);
    int n = static_cast<int>(refs.size());

    if (n <= max_leaf) {
      node_right[idx] = static_cast<int32_t>(out_prims.size());
      node_count[idx] = n;
      for (const Ref &r : refs) out_prims.push_back(r.prim);
      return;
    }
    if (depth >= max_depth) {
      // soft depth bound: median split until leaf-sized (oversized leaves
      // would overflow the fixed-width device leaf tests)
      std::vector<int> order(n);
      std::iota(order.begin(), order.end(), 0);
      int axis = 0;
      {
        AABB cb;
        for (const Ref &r : refs) cb.grow(r.box);
        float ex = cb.hi.x - cb.lo.x, ey = cb.hi.y - cb.lo.y,
              ez = cb.hi.z - cb.lo.z;
        axis = (ex >= ey && ex >= ez) ? 0 : (ey >= ez ? 1 : 2);
      }
      std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return get(refs[a].centroid(), axis) < get(refs[b].centroid(), axis);
      });
      int split = n / 2;
      std::vector<Ref> left, right;
      for (int i = 0; i < split; ++i) left.push_back(refs[order[i]]);
      for (int i = split; i < n; ++i) right.push_back(refs[order[i]]);
      refs.clear();
      refs.shrink_to_fit();
      build(left, idx, false, depth + 1);
      { std::vector<Ref>().swap(left); }
      build(right, idx, true, depth + 1);
      return;
    }

    // ---- full-sweep object SAH over 3 axes (axes evaluated in parallel
    // for large nodes — the sweep dominates build time)
    double best_cost = std::numeric_limits<double>::infinity();
    int best_axis = -1, best_split = -1;
    AABB best_lbox, best_rbox;
    std::vector<int> best_order;

    struct AxisResult {
      double cost = std::numeric_limits<double>::infinity();
      int split = -1;
      AABB lbox, rbox;
      std::vector<int> order;
    };
    auto sweep_axis = [&](int axis) {
      AxisResult res;
      res.order.resize(n);
      std::iota(res.order.begin(), res.order.end(), 0);
      std::stable_sort(res.order.begin(), res.order.end(),
                       [&](int a, int b) {
        return get(refs[a].centroid(), axis) < get(refs[b].centroid(), axis);
      });
      std::vector<double> right_sa(n);
      std::vector<AABB> suffix(n);
      AABB acc;
      for (int i = n - 1; i >= 0; --i) {
        acc.grow(refs[res.order[i]].box);
        suffix[i] = acc;
        right_sa[i] = acc.area();
      }
      AABB left;
      for (int i = 0; i < n - 1; ++i) {
        left.grow(refs[res.order[i]].box);
        double cost = left.area() * (i + 1) + right_sa[i + 1] * (n - 1 - i);
        if (cost < res.cost) {
          res.cost = cost;
          res.split = i + 1;
          res.lbox = left;
          res.rbox = suffix[i + 1];
        }
      }
      return res;
    };

    AxisResult ax[3];
    if (n > 16384) {
      auto f1 = std::async(std::launch::async, sweep_axis, 1);
      auto f2 = std::async(std::launch::async, sweep_axis, 2);
      ax[0] = sweep_axis(0);
      ax[1] = f1.get();
      ax[2] = f2.get();
    } else {
      for (int axis = 0; axis < 3; ++axis) ax[axis] = sweep_axis(axis);
    }
    for (int axis = 0; axis < 3; ++axis) {
      if (ax[axis].cost < best_cost) {
        best_cost = ax[axis].cost;
        best_axis = axis;
        best_split = ax[axis].split;
        best_lbox = ax[axis].lbox;
        best_rbox = ax[axis].rbox;
        best_order = std::move(ax[axis].order);
      }
    }

    // ---- spatial split when object children overlap enough
    bool use_spatial = false;
    int s_axis = -1;
    float s_plane = 0.0f;
    AABB s_lbox, s_rbox;        // bin-accumulated child boxes at the plane
    int s_nl = 0, s_nr = 0;     // duplicate-counting child populations
    if (spatial && best_axis >= 0) {
      AABB ov;
      ov.lo = vmax(best_lbox.lo, best_rbox.lo);
      ov.hi = vmin(best_lbox.hi, best_rbox.hi);
      if (ov.lo.x < ov.hi.x && ov.lo.y < ov.hi.y && ov.lo.z < ov.hi.z &&
          ov.area() > alpha * root_area) {
        double s_cost = std::numeric_limits<double>::infinity();
        for (int axis = 0; axis < 3; ++axis) {
          float extent = get(box.hi, axis) - get(box.lo, axis);
          if (extent <= 0) continue;
          float width = extent / SPATIAL_BINS;
          AABB bins[SPATIAL_BINS];
          int entry[SPATIAL_BINS] = {0}, exit_[SPATIAL_BINS] = {0};
          for (const Ref &r : refs) {
            int b0 = std::clamp(
                static_cast<int>((get(r.box.lo, axis) - get(box.lo, axis)) /
                                 width),
                0, SPATIAL_BINS - 1);
            int b1 = std::clamp(
                static_cast<int>((get(r.box.hi, axis) - get(box.lo, axis)) /
                                 width),
                0, SPATIAL_BINS - 1);
            entry[b0]++;
            exit_[b1]++;
            if (b1 == b0) {
              bins[b0].grow(r.box);
              continue;
            }
            // exact triangle clipping per spanned slab (not box chop):
            // straddlers contribute only the geometry actually inside the
            // bin, so bin boxes — and the SAH they drive — stay tight
            for (int b = b0; b <= b1; ++b) {
              AABB clipped = tris.slab_box(
                  r.prim, axis, get(box.lo, axis) + b * width,
                  get(box.lo, axis) + (b + 1) * width, r.box);
              if (clipped.valid()) bins[b].grow(clipped);
            }
          }
          AABB lt[SPATIAL_BINS], rt[SPATIAL_BINS];
          AABB acc;
          for (int b = 0; b < SPATIAL_BINS; ++b) {
            acc.grow(bins[b]);
            lt[b] = acc;
          }
          acc = AABB();
          for (int b = SPATIAL_BINS - 1; b >= 0; --b) {
            acc.grow(bins[b]);
            rt[b] = acc;
          }
          int nl = 0, nr = n;
          for (int b = 0; b < SPATIAL_BINS - 1; ++b) {
            nl += entry[b];
            nr -= exit_[b];
            if (nl == 0 || nr == 0 || !lt[b].valid() || !rt[b + 1].valid())
              continue;
            double cost = lt[b].area() * nl + rt[b + 1].area() * nr;
            if (cost < s_cost) {
              s_cost = cost;
              s_axis = axis;
              s_plane = get(box.lo, axis) + (b + 1) * width;
              s_lbox = lt[b];
              s_rbox = rt[b + 1];
              s_nl = nl;
              s_nr = nr;
            }
          }
        }
        use_spatial = s_axis >= 0 && s_cost < best_cost;
      }
    }

    std::vector<Ref> left, right;
    if (use_spatial) {
      // Per-reference unsplit arbitration (SBVH reference unsplitting):
      // compare the SAH of duplicating the straddler against absorbing its
      // whole box into one child and removing it from the other. The bin
      // boxes already contain every straddler's clipped contribution, so
      // C_split needs no per-ref growth.
      double a_l = s_lbox.area(), a_r = s_rbox.area();
      double c_split = a_l * s_nl + a_r * s_nr;
      int64_t dup = 0, ul = 0, ur = 0;
      for (const Ref &r : refs) {
        if (get(r.box.hi, s_axis) <= s_plane) {
          left.push_back(r);
        } else if (get(r.box.lo, s_axis) >= s_plane) {
          right.push_back(r);
        } else {
          AABB gl = s_lbox;
          gl.grow(r.box);
          AABB gr = s_rbox;
          gr.grow(r.box);
          double c_ul = gl.area() * s_nl + a_r * (s_nr - 1);
          double c_ur = a_l * (s_nl - 1) + gr.area() * s_nr;
          Ref l = r, g = r;
          l.box = tris.slab_box(
              r.prim, s_axis, -std::numeric_limits<float>::infinity(),
              s_plane, r.box);
          g.box = tris.slab_box(
              r.prim, s_axis, s_plane,
              std::numeric_limits<float>::infinity(), r.box);
          if (!g.box.valid() || (c_ul < c_split && c_ul <= c_ur)) {
            left.push_back(r);          // unsplit left: keep full box
            ++ul;
          } else if (!l.box.valid() || c_ur < c_split) {
            right.push_back(r);
            ++ur;
          } else {
            left.push_back(l);          // duplicate with exact clipped boxes
            right.push_back(g);
            ++dup;
          }
        }
      }
      if (left.empty() || right.empty() ||
          std::max(left.size(), right.size()) >= static_cast<size_t>(n)) {
        use_spatial = false;
      } else {
        ++n_spatial_nodes;
        n_duplicated += dup;
        n_unsplit_left += ul;
        n_unsplit_right += ur;
      }
    }
    if (!use_spatial) {
      left.clear();
      right.clear();
      if (best_axis < 0) {  // degenerate: median on longest axis
        best_order.resize(n);
        std::iota(best_order.begin(), best_order.end(), 0);
        best_split = n / 2;
      }
      for (int i = 0; i < best_split; ++i)
        left.push_back(refs[best_order[i]]);
      for (int i = best_split; i < n; ++i)
        right.push_back(refs[best_order[i]]);
    }

    refs.clear();
    refs.shrink_to_fit();
    build(left, idx, false, depth + 1);
    { std::vector<Ref>().swap(left); }
    build(right, idx, true, depth + 1);
  }
};

Builder *g_last = nullptr;

}  // namespace

extern "C" {

// Builds the hierarchy; returns sizes via out params. Arrays are fetched
// with fetch_arrays() and freed with release().
int build_hierarchy(const float *v0, const float *v1, const float *v2,
                    int64_t n_tris, int max_leaf, int max_depth,
                    double alpha, int use_spatial, int64_t *n_nodes,
                    int64_t *n_prims, int *depth) {
  delete g_last;
  g_last = new Builder();
  g_last->max_leaf = max_leaf;
  g_last->max_depth = max_depth;
  g_last->alpha = alpha;
  g_last->spatial = use_spatial != 0;
  g_last->tris = TriClip{v0, v1, v2};

  std::vector<Ref> refs(n_tris);
  AABB root;
  for (int64_t i = 0; i < n_tris; ++i) {
    Vec3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    Vec3 b{v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
    Vec3 c{v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
    refs[i].prim = static_cast<int32_t>(i);
    refs[i].box.lo = vmin(vmin(a, b), c);
    refs[i].box.hi = vmax(vmax(a, b), c);
    root.grow(refs[i].box);
  }
  g_last->root_area = root.area();
  g_last->build(refs, -1, false, 0);

  *n_nodes = static_cast<int64_t>(g_last->node_count.size());
  *n_prims = static_cast<int64_t>(g_last->out_prims.size());
  *depth = g_last->depth_seen;
  return 0;
}

int fetch_arrays(float *node_lo, float *node_hi, int32_t *node_right,
                 int32_t *node_count, int32_t *node_parent,
                 int32_t *prim_idx) {
  if (!g_last) return 1;
  std::memcpy(node_lo, g_last->node_lo.data(),
              g_last->node_lo.size() * sizeof(float));
  std::memcpy(node_hi, g_last->node_hi.data(),
              g_last->node_hi.size() * sizeof(float));
  std::memcpy(node_right, g_last->node_right.data(),
              g_last->node_right.size() * sizeof(int32_t));
  std::memcpy(node_count, g_last->node_count.data(),
              g_last->node_count.size() * sizeof(int32_t));
  std::memcpy(node_parent, g_last->node_parent.data(),
              g_last->node_parent.size() * sizeof(int32_t));
  std::memcpy(prim_idx, g_last->out_prims.data(),
              g_last->out_prims.size() * sizeof(int32_t));
  return 0;
}

// Spatial-split statistics of the last build (reference logs the same
// duplication accounting, src/sbvh.cpp:41-48).
void get_stats(int64_t *spatial_nodes, int64_t *duplicated,
               int64_t *unsplit_left, int64_t *unsplit_right) {
  if (!g_last) {
    *spatial_nodes = *duplicated = *unsplit_left = *unsplit_right = 0;
    return;
  }
  *spatial_nodes = g_last->n_spatial_nodes;
  *duplicated = g_last->n_duplicated;
  *unsplit_left = g_last->n_unsplit_left;
  *unsplit_right = g_last->n_unsplit_right;
}

void release() {
  delete g_last;
  g_last = nullptr;
}

}  // extern "C"
