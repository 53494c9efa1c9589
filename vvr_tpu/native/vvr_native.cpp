// vvr_native — C++ runtime components (ctypes ABI).
//
// The reference implements its host runtime in Rust (world build,
// tree flatten, mesher — src/voxel/*); this library provides the TPU
// framework's native equivalents where Python/NumPy is the wrong tool:
//
//   * trace_dense   — the dense-DDA CPU oracle (render/oracle.py defines the
//                     semantics; this is the fast path for golden tests at
//                     scale). Mirrors trace_shi's contract
//                     (shaders/ray_stuff_other.slang:424-437).
//   * pack_bricks   — brick-pyramid node-mask packing (world/pyramid.py
//                     _pack_node_masks) for fast world (re)builds.
//   * mesh_chunk    — blocky per-exposed-face cube mesher (OBJ export; the
//                     reference's surface-nets mesher lives in
//                     world/mesher.py::mesh_chunk_surface_nets)
//                     (reference src/voxel/meshes.rs:87-161): one vertex per
//                     sign-change cell at center+0.5, quads across set/unset
//                     face transitions.
//
// Build: make -C vvr_tpu/native      (g++ -O3 -march=native -shared -fPIC)
// Loaded via ctypes by vvr_tpu/native/__init__.py with NumPy fallbacks.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Dense-DDA oracle. occ: bit-packed occupancy (x-major: lin = x + y*S + z*S^2,
// bit lin&7 of byte lin>>3). Same float formulas as the JAX kernel:
// t = (bound - o) * inv_d recomputed per step, z>y>x tie rule.
// ---------------------------------------------------------------------------
void trace_dense(const uint8_t* occ, int32_t size,
                 const float* ray_o, const float* ray_d, int64_t n_rays,
                 int32_t max_steps,
                 uint8_t* out_hit, int32_t* out_face,
                 int32_t* out_axis_coord, float* out_t) {
    const float BIG = 1e30f;
    const int64_t s = size;
    for (int64_t r = 0; r < n_rays; ++r) {
        const float ox = ray_o[r * 3], oy = ray_o[r * 3 + 1], oz = ray_o[r * 3 + 2];
        const float dx = ray_d[r * 3], dy = ray_d[r * 3 + 1], dz = ray_d[r * 3 + 2];
        out_hit[r] = 0; out_face[r] = 0; out_axis_coord[r] = 0; out_t[r] = BIG;

        if (!(ox >= 0 && ox < size && oy >= 0 && oy < size && oz >= 0 && oz < size))
            continue;

        const float ix = dx == 0.0f ? BIG : 1.0f / dx;
        const float iy = dy == 0.0f ? BIG : 1.0f / dy;
        const float iz = dz == 0.0f ? BIG : 1.0f / dz;
        const int sx = dx > 0 ? 1 : -1, sy = dy > 0 ? 1 : -1, sz = dz > 0 ? 1 : -1;
        const int px = dx > 0 ? 1 : 0, py = dy > 0 ? 1 : 0, pz = dz > 0 ? 1 : 0;

        int cx = std::min(std::max((int)std::floor(ox), 0), size - 1);
        int cy = std::min(std::max((int)std::floor(oy), 0), size - 1);
        int cz = std::min(std::max((int)std::floor(oz), 0), size - 1);
        float t = 0.0f;
        int face = 0;

        for (int step = 0; step < max_steps; ++step) {
            const int64_t lin = (int64_t)cx + (int64_t)cy * s + (int64_t)cz * s * s;
            if ((occ[lin >> 3] >> (lin & 7)) & 1) {
                out_hit[r] = 1;
                out_face[r] = face;
                out_t[r] = t;
                out_axis_coord[r] = face == 0 ? cx : (face == 1 ? cy : cz);
                break;
            }
            const float tx = dx == 0.0f ? BIG : ((float)(cx + px) - ox) * ix;
            const float ty = dy == 0.0f ? BIG : ((float)(cy + py) - oy) * iy;
            const float tz = dz == 0.0f ? BIG : ((float)(cz + pz) - oz) * iz;
            float tmin = std::min(tx, std::min(ty, tz));
            if (tz <= tmin) { face = 2; cz += sz; }
            else if (ty <= tmin) { face = 1; cy += sy; }
            else { face = 0; cx += sx; }
            t = tmin;
            if (cx < 0 || cx >= size || cy < 0 || cy >= size ||
                cz < 0 || cz >= size)
                break;
        }
    }
}

// ---------------------------------------------------------------------------
// Brick-mask packing: child-cell grid (n^3 bits, x-major) -> per-node u64
// masks (m = n/4 nodes per edge, node-major x-major, bit = x | y<<2 | z<<4).
// ---------------------------------------------------------------------------
void pack_bricks(const uint8_t* bits, int32_t n, uint64_t* out_masks) {
    const int m = n / 4;
    const int64_t nn = n;
    for (int bz = 0; bz < m; ++bz)
        for (int by = 0; by < m; ++by)
            for (int bx = 0; bx < m; ++bx) {
                uint64_t mask = 0;
                for (int lz = 0; lz < 4; ++lz)
                    for (int ly = 0; ly < 4; ++ly)
                        for (int lx = 0; lx < 4; ++lx) {
                            const int64_t x = bx * 4 + lx, y = by * 4 + ly,
                                          z = bz * 4 + lz;
                            const int64_t lin = x + y * nn + z * nn * nn;
                            if ((bits[lin >> 3] >> (lin & 7)) & 1)
                                mask |= 1ull << (lx | (ly << 2) | (lz << 4));
                        }
                out_masks[(int64_t)bx + (int64_t)by * m + (int64_t)bz * m * m] = mask;
            }
}

// ---------------------------------------------------------------------------
// Surface-nets style chunk mesher (reference src/voxel/meshes.rs:87-161):
// pass 1: one vertex per cell that has any set voxel adjacent to an unset
// region boundary (we emit per set voxel with any exposed face, at center);
// pass 2: one quad (two triangles, 4 verts referenced) per exposed face.
// Output arrays are caller-allocated with capacity; returns counts.
// vertices: float xyz; indices: uint32 triples.
// ---------------------------------------------------------------------------
int64_t mesh_chunk(const uint8_t* bits, int32_t n,
                   float* out_verts, int64_t vert_cap,
                   uint32_t* out_idx, int64_t idx_cap,
                   int64_t* out_n_idx) {
    const int64_t nn = n;
    auto solid = [&](int x, int y, int z) -> bool {
        if (x < 0 || x >= n || y < 0 || y >= n || z < 0 || z >= n) return false;
        const int64_t lin = (int64_t)x + (int64_t)y * nn + (int64_t)z * nn * nn;
        return (bits[lin >> 3] >> (lin & 7)) & 1;
    };
    static const int NB[6][3] = {{1,0,0},{-1,0,0},{0,1,0},{0,-1,0},{0,0,1},{0,0,-1}};
    // quad corner offsets per face axis (winding per axis like meshes.rs)
    int64_t nv = 0, ni = 0;
    for (int z = 0; z < n; ++z)
        for (int y = 0; y < n; ++y)
            for (int x = 0; x < n; ++x) {
                if (!solid(x, y, z)) continue;
                for (int f = 0; f < 6; ++f) {
                    if (solid(x + NB[f][0], y + NB[f][1], z + NB[f][2])) continue;
                    // exposed face: emit 4 verts + 2 tris
                    if (nv + 4 > vert_cap || ni + 6 > idx_cap) { *out_n_idx = ni; return -1; }
                    const int axis = f / 2;
                    const float side = (f % 2 == 0) ? 1.0f : 0.0f;
                    float base[3] = {(float)x, (float)y, (float)z};
                    base[axis] += side;
                    const int u = (axis + 1) % 3, v = (axis + 2) % 3;
                    for (int k = 0; k < 4; ++k) {
                        float p[3] = {base[0], base[1], base[2]};
                        p[u] += (k == 1 || k == 2) ? 1.0f : 0.0f;
                        p[v] += (k >= 2) ? 1.0f : 0.0f;
                        out_verts[(nv + k) * 3] = p[0];
                        out_verts[(nv + k) * 3 + 1] = p[1];
                        out_verts[(nv + k) * 3 + 2] = p[2];
                    }
                    const bool flip = (f % 2) == 1;
                    static const int TRI[2][6] = {{0,1,2, 0,2,3}, {0,2,1, 0,3,2}};
                    for (int k = 0; k < 6; ++k)
                        out_idx[ni + k] = (uint32_t)(nv + TRI[flip][k]);
                    nv += 4; ni += 6;
                }
            }
    *out_n_idx = ni;
    return nv;
}

}  // extern "C"
