// Native marching-cubes core for mesh export.
//
// TPU-native counterpart of the reference's mc_lib (cpp/third/mesh/
// MarchingCubes.{h,cpp}, MarchingCubesNoColor.{h,cpp}): zero-isosurface
// extraction with edge-interpolated vertices/colors and the all-8-corner
// weight gate (MarchingCubes.cpp:528-535).  The triangle LUT is passed in
// from Python (psgradientsdf_tpu/ops/mc_tables.py derives it at import
// time), so the native and numpy paths produce identical topology.
//
// Exported C ABI (ctypes):
//   mc_extract(...)  -> fills malloc'd vertex/face/color buffers
//   mc_free(ptr)     -> frees a buffer returned by mc_extract
//
// Grid layout: phi[Z][Y][X] row-major (X fastest), inside = phi > level.
// Corner/edge numbering matches mc_tables.py (Lorensen/Bourke).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

const int CORNERS[8][3] = {
    // (x, y, z)
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

const int EDGES[12][2] = {
    {0, 1}, {1, 2}, {2, 3}, {3, 0},
    {4, 5}, {5, 6}, {6, 7}, {7, 4},
    {0, 4}, {1, 5}, {2, 6}, {3, 7},
};

struct V3 { float x, y, z; };

}  // namespace

extern "C" {

// Returns 0 on success.  Caller frees out_* with mc_free.
int mc_extract(
    const float* phi,      // [Z*Y*X]
    const float* weight,   // [Z*Y*X] or nullptr (no gate)
    const float* color,    // [Z*Y*X*3] or nullptr
    int64_t Z, int64_t Y, int64_t X,
    float level,
    const int8_t* tri_table,  // [256*16], -1 terminated triples
    float voxel, float ox, float oy, float oz,
    float** out_verts, int32_t** out_faces, float** out_colors,
    int64_t* n_verts, int64_t* n_faces) {
  *out_verts = nullptr;
  *out_faces = nullptr;
  *out_colors = nullptr;
  *n_verts = 0;
  *n_faces = 0;
  if (X < 2 || Y < 2 || Z < 2) return 0;

  const int64_t sy = X, sz = (int64_t)X * Y;
  std::vector<float> verts;     // xyz triples
  std::vector<float> cols;      // rgb triples
  std::vector<int32_t> faces;   // vertex-index triples
  // global edge key -> vertex index; key = ((z*Y + y)*X + x)*3 + axis
  std::unordered_map<int64_t, int32_t> edge_vertex;
  edge_vertex.reserve(1 << 16);

  for (int64_t z = 0; z + 1 < Z; ++z) {
    for (int64_t y = 0; y + 1 < Y; ++y) {
      const int64_t rowbase = z * sz + y * sy;
      for (int64_t x = 0; x + 1 < X; ++x) {
        const int64_t base = rowbase + x;
        float v[8];
        int cfg = 0;
        bool wok = true;
        for (int c = 0; c < 8; ++c) {
          const int64_t idx =
              base + CORNERS[c][0] + CORNERS[c][1] * sy + CORNERS[c][2] * sz;
          v[c] = phi[idx];
          if (v[c] > level) cfg |= 1 << c;
          if (weight && !(weight[idx] > 0.0f)) wok = false;
        }
        if (cfg == 0 || cfg == 255 || !wok) continue;

        const int8_t* tri = tri_table + cfg * 16;
        for (int t = 0; t < 16 && tri[t] >= 0; t += 3) {
          int32_t vid[3];
          for (int k = 0; k < 3; ++k) {
            const int e = tri[t + k];
            const int a = EDGES[e][0], b = EDGES[e][1];
            // canonical low corner + axis of the edge
            int pax = (int)x + CORNERS[a][0], pay = (int)y + CORNERS[a][1],
                paz = (int)z + CORNERS[a][2];
            int pbx = (int)x + CORNERS[b][0], pby = (int)y + CORNERS[b][1],
                pbz = (int)z + CORNERS[b][2];
            const int lx = pax < pbx ? pax : pbx;
            const int ly = pay < pby ? pay : pby;
            const int lz = paz < pbz ? paz : pbz;
            const int axis = (pax != pbx) ? 0 : (pay != pby ? 1 : 2);
            const int64_t key =
                (((int64_t)lz * Y + ly) * X + lx) * 3 + axis;
            auto it = edge_vertex.find(key);
            if (it != edge_vertex.end()) {
              vid[k] = it->second;
            } else {
              const float va = v[a], vb = v[b];
              float denom = vb - va;
              if (std::fabs(denom) < 1e-12f)
                denom = 1e-12f;
              float tt = (level - va) / denom;
              if (tt < 0.0f) tt = 0.0f;
              if (tt > 1.0f) tt = 1.0f;
              const float fx = pax + tt * (pbx - pax);
              const float fy = pay + tt * (pby - pay);
              const float fz = paz + tt * (pbz - paz);
              vid[k] = (int32_t)(verts.size() / 3);
              verts.push_back(ox + voxel * fx);
              verts.push_back(oy + voxel * fy);
              verts.push_back(oz + voxel * fz);
              if (color) {
                const int64_t ia = (int64_t)paz * sz + (int64_t)pay * sy + pax;
                const int64_t ib = (int64_t)pbz * sz + (int64_t)pby * sy + pbx;
                for (int ch = 0; ch < 3; ++ch) {
                  const float ca = color[ia * 3 + ch];
                  const float cb = color[ib * 3 + ch];
                  cols.push_back(ca + tt * (cb - ca));
                }
              }
              edge_vertex.emplace(key, vid[k]);
            }
          }
          faces.push_back(vid[0]);
          faces.push_back(vid[1]);
          faces.push_back(vid[2]);
        }
      }
    }
  }

  *n_verts = (int64_t)(verts.size() / 3);
  *n_faces = (int64_t)(faces.size() / 3);
  if (*n_verts) {
    *out_verts = (float*)std::malloc(verts.size() * sizeof(float));
    std::memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
    if (color) {
      *out_colors = (float*)std::malloc(cols.size() * sizeof(float));
      std::memcpy(*out_colors, cols.data(), cols.size() * sizeof(float));
    }
  }
  if (*n_faces) {
    *out_faces = (int32_t*)std::malloc(faces.size() * sizeof(int32_t));
    std::memcpy(*out_faces, faces.data(), faces.size() * sizeof(int32_t));
  }
  return 0;
}

void mc_free(void* p) { std::free(p); }

}  // extern "C"
