// Native mesh kernels: marching-tetrahedra triangle assembly + mesh utils.
//
// The TPU does the heavy part of mesh extraction (dense SDF grid
// evaluation through the chunked decoder); the triangle ASSEMBLY is
// host-side and latency-sensitive — the vectorized-numpy fallback in
// eval/mesh.py allocates O(cells x tets) intermediates and takes seconds
// at 256^3. This C++ implementation streams cells, emits triangles into
// growable buffers, and dedups vertices with a hash map — ~50x the numpy
// path. Loaded via ctypes (no pybind11 in this image); built by
// native/build.sh or lazily by eval/mesh.py.
//
// Reference analog: DIST-Renderer has NO native components (SURVEY.md §2)
// — mesh extraction there goes through scikit-image's compiled marching
// cubes. This is the equivalent compiled layer for the rebuild.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// 6-tetrahedra decomposition of the unit cube; corner bit layout
// c = x + 2y + 4z must match eval/mesh.py's _CUBE ordering.
const int kCube[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};
const int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

struct Builder {
  const float* grid;
  int r;
  float bound, iso, step;
  std::vector<float> verts;
  std::vector<int64_t> faces;
  std::unordered_map<uint64_t, int64_t> edge_to_vertex;

  inline float val(int64_t lin) const { return grid[lin]; }

  inline void corner_pos(int64_t lin, float* out) const {
    int64_t rr = r;
    int64_t i = lin / (rr * rr), j = (lin / rr) % rr, k = lin % rr;
    out[0] = -bound + step * (float)i;
    out[1] = -bound + step * (float)j;
    out[2] = -bound + step * (float)k;
  }

  int64_t vertex_on_edge(int64_t a, int64_t b) {
    if (a > b) { int64_t t = a; a = b; b = t; }
    uint64_t key = ((uint64_t)a << 32) | (uint64_t)b;
    auto it = edge_to_vertex.find(key);
    if (it != edge_to_vertex.end()) return it->second;
    float va = val(a), vb = val(b);
    float denom = vb - va;
    float t = denom == 0.0f ? 0.5f : (iso - va) / denom;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    float pa[3], pb[3];
    corner_pos(a, pa);
    corner_pos(b, pb);
    int64_t idx = (int64_t)(verts.size() / 3);
    verts.push_back(pa[0] + t * (pb[0] - pa[0]));
    verts.push_back(pa[1] + t * (pb[1] - pa[1]));
    verts.push_back(pa[2] + t * (pb[2] - pa[2]));
    edge_to_vertex.emplace(key, idx);
    return idx;
  }

  inline void tri(int64_t a0, int64_t a1, int64_t b0, int64_t b1,
                  int64_t c0, int64_t c1) {
    int64_t v0 = vertex_on_edge(a0, a1);
    int64_t v1 = vertex_on_edge(b0, b1);
    int64_t v2 = vertex_on_edge(c0, c1);
    if (v0 == v1 || v1 == v2 || v0 == v2) return;
    faces.push_back(v0);
    faces.push_back(v1);
    faces.push_back(v2);
  }

  void tet(const int64_t lin[4], const float v[4]) {
    int code = (v[0] < iso) | ((v[1] < iso) << 1) | ((v[2] < iso) << 2) |
               ((v[3] < iso) << 3);
    if (code == 0 || code == 15) return;
    // single corner inside
    static const int singles[4][3] = {{1, 2, 3}, {0, 3, 2}, {0, 1, 3}, {0, 2, 1}};
    for (int c = 0; c < 4; ++c) {
      const int* o = singles[c];
      if (code == (1 << c)) {
        tri(lin[c], lin[o[0]], lin[c], lin[o[1]], lin[c], lin[o[2]]);
        return;
      }
      if (code == (15 ^ (1 << c))) {
        tri(lin[c], lin[o[0]], lin[c], lin[o[2]], lin[c], lin[o[1]]);
        return;
      }
    }
    // two in / two out -> quad as two triangles
    static const int pairs[3][4] = {{0, 1, 2, 3}, {0, 2, 1, 3}, {0, 3, 1, 2}};
    for (int pi = 0; pi < 3; ++pi) {
      int a = pairs[pi][0], b = pairs[pi][1], c = pairs[pi][2], d = pairs[pi][3];
      if (code == ((1 << a) | (1 << b))) {
        tri(lin[a], lin[c], lin[a], lin[d], lin[b], lin[c]);
        tri(lin[b], lin[c], lin[a], lin[d], lin[b], lin[d]);
        return;
      }
      if (code == ((1 << c) | (1 << d))) {
        tri(lin[c], lin[a], lin[d], lin[a], lin[c], lin[b]);
        tri(lin[c], lin[b], lin[d], lin[a], lin[d], lin[b]);
        return;
      }
    }
  }

  void run() {
    const int64_t rr = r;
    step = 2.0f * bound / (float)(r - 1);
    for (int64_t i = 0; i + 1 < rr; ++i) {
      for (int64_t j = 0; j + 1 < rr; ++j) {
        const float* row0 = grid + i * rr * rr + j * rr;
        for (int64_t k = 0; k + 1 < rr; ++k) {
          // quick sign-change reject on the cube
          float mn = 1e30f, mx = -1e30f;
          int64_t lin[8];
          float v[8];
          for (int c = 0; c < 8; ++c) {
            int64_t ci = i + kCube[c][0], cj = j + kCube[c][1],
                    ck = k + kCube[c][2];
            lin[c] = ci * rr * rr + cj * rr + ck;
            v[c] = grid[lin[c]];
            if (v[c] < mn) mn = v[c];
            if (v[c] > mx) mx = v[c];
          }
          if (mn > iso || mx < iso) continue;
          for (int t = 0; t < 6; ++t) {
            int64_t tl[4];
            float tv[4];
            for (int q = 0; q < 4; ++q) {
              tl[q] = lin[kTets[t][q]];
              tv[q] = v[kTets[t][q]];
            }
            tet(tl, tv);
          }
        }
        (void)row0;
      }
    }
  }
};

Builder* g_last = nullptr;

}  // namespace

extern "C" {

// Phase 1: build; returns counts so the caller can allocate output buffers.
// grid: [r*r*r] fp32 row-major (i, j, k). Returns 0 on success.
int mt_build(const float* grid, int r, float bound, float iso,
             int64_t* n_verts, int64_t* n_faces) {
  delete g_last;
  g_last = new Builder();
  g_last->grid = grid;
  g_last->r = r;
  g_last->bound = bound;
  g_last->iso = iso;
  g_last->run();
  *n_verts = (int64_t)(g_last->verts.size() / 3);
  *n_faces = (int64_t)(g_last->faces.size() / 3);
  return 0;
}

// Phase 2: copy out and free.
int mt_take(float* verts_out, int64_t* faces_out) {
  if (!g_last) return 1;
  std::memcpy(verts_out, g_last->verts.data(),
              g_last->verts.size() * sizeof(float));
  std::memcpy(faces_out, g_last->faces.data(),
              g_last->faces.size() * sizeof(int64_t));
  delete g_last;
  g_last = nullptr;
  return 0;
}

// Area-weighted surface sampling (chamfer prep) — mirrors
// eval/mesh.py::sample_mesh_surface.
int mesh_sample_surface(const float* verts, int64_t n_verts,
                        const int64_t* faces, int64_t n_faces,
                        int64_t n_samples, uint64_t seed, float* out) {
  (void)n_verts;
  if (n_faces <= 0) return 1;
  std::vector<double> cum(n_faces);
  double total = 0.0;
  for (int64_t f = 0; f < n_faces; ++f) {
    const float* a = verts + 3 * faces[3 * f];
    const float* b = verts + 3 * faces[3 * f + 1];
    const float* c = verts + 3 * faces[3 * f + 2];
    float ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    float ac[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    float cr[3] = {ab[1] * ac[2] - ab[2] * ac[1],
                   ab[2] * ac[0] - ab[0] * ac[2],
                   ab[0] * ac[1] - ab[1] * ac[0]};
    double area = 0.5 * std::sqrt((double)cr[0] * cr[0] +
                                  (double)cr[1] * cr[1] +
                                  (double)cr[2] * cr[2]);
    total += area;
    cum[f] = total;
  }
  if (total <= 0.0) return 1;
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
  auto next = [&s]() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    return (double)(s >> 11) / (double)(1ull << 53);
  };
  for (int64_t i = 0; i < n_samples; ++i) {
    double target = next() * total;
    int64_t lo = 0, hi = n_faces - 1;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (cum[mid] < target) lo = mid + 1; else hi = mid;
    }
    const float* a = verts + 3 * faces[3 * lo];
    const float* b = verts + 3 * faces[3 * lo + 1];
    const float* c = verts + 3 * faces[3 * lo + 2];
    double u = next(), v = next();
    if (u + v > 1.0) { u = 1.0 - u; v = 1.0 - v; }
    for (int d = 0; d < 3; ++d)
      out[3 * i + d] =
          (float)(a[d] + u * (b[d] - a[d]) + v * (c[d] - a[d]));
  }
  return 0;
}

// ---------------------------------------------------------------------------
// BVH raycaster: mesh -> depth maps (the preprocessing tool's hot loop).
//
// The reference's depth-completion data comes from offline depth renders of
// ShapeNet meshes (SURVEY.md §2 'Preprocessing tools'); this is the rebuild's
// renderer for that step. Median-split BVH over triangle centroids,
// iterative stack traversal, Moller-Trumbore intersection. ~100x the numpy
// brute-force fallback on real meshes.

namespace {

struct BVH {
  struct Node {
    float bmin[3], bmax[3];
    int32_t left;    // internal: left child (right = left + 1); leaf: -1
    int32_t start, count;  // leaf triangle range in tri_order
  };
  std::vector<Node> nodes;
  std::vector<int64_t> tri_order;
  std::vector<float> v0, e1, e2;  // per ORIGINAL triangle, 3 floats each
  std::vector<float> cent;

  void build(const float* verts, const int64_t* faces, int64_t n_faces) {
    v0.resize(3 * n_faces);
    e1.resize(3 * n_faces);
    e2.resize(3 * n_faces);
    cent.resize(3 * n_faces);
    tri_order.resize(n_faces);
    for (int64_t f = 0; f < n_faces; ++f) {
      const float* a = verts + 3 * faces[3 * f];
      const float* b = verts + 3 * faces[3 * f + 1];
      const float* c = verts + 3 * faces[3 * f + 2];
      for (int d = 0; d < 3; ++d) {
        v0[3 * f + d] = a[d];
        e1[3 * f + d] = b[d] - a[d];
        e2[3 * f + d] = c[d] - a[d];
        cent[3 * f + d] = (a[d] + b[d] + c[d]) / 3.0f;
      }
      tri_order[f] = f;
    }
    nodes.clear();
    nodes.reserve(2 * (size_t)n_faces);
    build_node(0, n_faces);
  }

  int32_t build_node(int64_t start, int64_t count) {
    int32_t idx = (int32_t)nodes.size();
    nodes.push_back(Node());
    float bmin[3] = {1e30f, 1e30f, 1e30f}, bmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = start; i < start + count; ++i) {
      int64_t f = tri_order[i];
      for (int d = 0; d < 3; ++d) {
        float lo = v0[3 * f + d], hi = lo;
        float p1 = lo + e1[3 * f + d], p2 = lo + e2[3 * f + d];
        if (p1 < lo) lo = p1;
        if (p2 < lo) lo = p2;
        if (p1 > hi) hi = p1;
        if (p2 > hi) hi = p2;
        if (lo < bmin[d]) bmin[d] = lo;
        if (hi > bmax[d]) bmax[d] = hi;
      }
    }
    for (int d = 0; d < 3; ++d) {
      nodes[idx].bmin[d] = bmin[d];
      nodes[idx].bmax[d] = bmax[d];
    }
    if (count <= 4) {
      nodes[idx].left = -1;
      nodes[idx].start = (int32_t)start;
      nodes[idx].count = (int32_t)count;
      return idx;
    }
    // split along the widest centroid axis at the median
    int axis = 0;
    float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = start; i < start + count; ++i) {
      int64_t f = tri_order[i];
      for (int d = 0; d < 3; ++d) {
        float c = cent[3 * f + d];
        if (c < cmin[d]) cmin[d] = c;
        if (c > cmax[d]) cmax[d] = c;
      }
    }
    float wid = -1.0f;
    for (int d = 0; d < 3; ++d)
      if (cmax[d] - cmin[d] > wid) { wid = cmax[d] - cmin[d]; axis = d; }
    int64_t mid = start + count / 2;
    std::nth_element(
        tri_order.begin() + start, tri_order.begin() + mid,
        tri_order.begin() + start + count,
        [this, axis](int64_t a, int64_t b) {
          return cent[3 * a + axis] < cent[3 * b + axis];
        });
    if (mid == start || mid == start + count) mid = start + count / 2;
    int32_t l = build_node(start, mid - start);
    int32_t r = build_node(mid, start + count - mid);
    nodes[idx].left = l;
    (void)r;  // right child is emitted immediately after the left subtree
    nodes[idx].start = r;
    nodes[idx].count = 0;
    return idx;
  }

  inline bool hit_box(const Node& n, const float* o, const float* inv_d,
                      float tmax) const {
    float t0 = 0.0f, t1 = tmax;
    for (int d = 0; d < 3; ++d) {
      float ta = (n.bmin[d] - o[d]) * inv_d[d];
      float tb = (n.bmax[d] - o[d]) * inv_d[d];
      if (ta > tb) { float t = ta; ta = tb; tb = t; }
      if (ta > t0) t0 = ta;
      if (tb < t1) t1 = tb;
      if (t0 > t1) return false;
    }
    return true;
  }

  float cast(const float* o, const float* dir) const {
    float inv_d[3];
    for (int d = 0; d < 3; ++d)
      inv_d[d] = 1.0f / (dir[d] == 0.0f ? 1e-30f : dir[d]);
    float best = 1e30f;
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
      const Node& n = nodes[stack[--sp]];
      if (!hit_box(n, o, inv_d, best)) continue;
      if (n.left < 0) {
        for (int32_t i = n.start; i < n.start + n.count; ++i) {
          int64_t f = tri_order[i];
          // Moller-Trumbore
          const float* a = &v0[3 * f];
          const float* u = &e1[3 * f];
          const float* w = &e2[3 * f];
          float p[3] = {dir[1] * w[2] - dir[2] * w[1],
                        dir[2] * w[0] - dir[0] * w[2],
                        dir[0] * w[1] - dir[1] * w[0]};
          float det = u[0] * p[0] + u[1] * p[1] + u[2] * p[2];
          if (det > -1e-12f && det < 1e-12f) continue;
          float inv = 1.0f / det;
          float s[3] = {o[0] - a[0], o[1] - a[1], o[2] - a[2]};
          float uu = (s[0] * p[0] + s[1] * p[1] + s[2] * p[2]) * inv;
          if (uu < 0.0f || uu > 1.0f) continue;
          float q[3] = {s[1] * u[2] - s[2] * u[1],
                        s[2] * u[0] - s[0] * u[2],
                        s[0] * u[1] - s[1] * u[0]};
          float vv = (dir[0] * q[0] + dir[1] * q[1] + dir[2] * q[2]) * inv;
          if (vv < 0.0f || uu + vv > 1.0f) continue;
          float t = (w[0] * q[0] + w[1] * q[1] + w[2] * q[2]) * inv;
          if (t > 1e-6f && t < best) best = t;
        }
      } else {
        stack[sp++] = n.left;
        stack[sp++] = n.start;  // right child index stored in start
      }
    }
    return best;
  }
};

BVH* g_bvh = nullptr;

}  // namespace

// Phase 1: build the BVH over a triangle mesh.
int rc_build(const float* verts, int64_t n_verts, const int64_t* faces,
             int64_t n_faces) {
  (void)n_verts;
  if (n_faces <= 0) return 1;
  delete g_bvh;
  g_bvh = new BVH();
  g_bvh->build(verts, faces, n_faces);
  return 0;
}

// Phase 2 (repeatable): cast rays; depth_out = hit distance, INF on miss.
int rc_cast(const float* origins, const float* dirs, int64_t n_rays,
            float* depth_out) {
  if (!g_bvh) return 1;
  for (int64_t i = 0; i < n_rays; ++i) {
    float t = g_bvh->cast(origins + 3 * i, dirs + 3 * i);
    depth_out[i] = t >= 1e30f ? INFINITY : t;
  }
  return 0;
}

// Phase 3: free.
int rc_free() {
  delete g_bvh;
  g_bvh = nullptr;
  return 0;
}

}  // extern "C"
