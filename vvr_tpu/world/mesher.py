"""Chunk mesher — the rasterization debug path's geometry.

Rebuild of src/voxel/meshes.rs: per chunk, pass 1 emits vertices for exposed
cells, pass 2 emits quads across set/unset face transitions with per-axis
winding (:87-161); chunk meshes are concatenated into shared vertex/index
buffers with per-chunk draw ranges (`SingleChunkInBuffer`, :10-15,33-44).

The C++ mesher (vvr_tpu/native) is used when built; the NumPy fallback
produces identical buffers (tested). Meshes serve the debug/preview path
(export to OBJ, or external rasterization) — the TPU main path is the ray
tracer."""

from __future__ import annotations

import dataclasses

import numpy as np

from vvr_tpu import native
from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk, ChunkKind

# face order: +x -x +y -y +z -z (reference FACE_NORMALS, other.slang:50-57)
_NB = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                [0, 0, 1], [0, 0, -1]], np.int32)


def mesh_voxels_numpy(vox: np.ndarray):
    """Vectorized fallback mesher: (verts (V,3) f32, indices (I,) u32),
    4 verts + 2 tris per exposed face, same layout as the C++ mesher."""
    vox = np.asarray(vox, bool)
    n = vox.shape[0]
    p = np.pad(vox, 1)
    verts_out = []
    idx_out = []
    base = 0
    for f in range(6):
        dz, dy, dx = _NB[f][2], _NB[f][1], _NB[f][0]
        nb = p[1 + dz:1 + dz + n, 1 + dy:1 + dy + n, 1 + dx:1 + dx + n]
        exposed = vox & ~nb
        zz, yy, xx = np.nonzero(exposed)
        if len(xx) == 0:
            continue
        axis = f // 2
        side = 1.0 if f % 2 == 0 else 0.0
        basep = np.stack([xx, yy, zz], 1).astype(np.float32)
        basep[:, axis] += side
        u, v = (axis + 1) % 3, (axis + 2) % 3
        corners = np.zeros((len(xx), 4, 3), np.float32)
        for k in range(4):
            c = basep.copy()
            if k in (1, 2):
                c[:, u] += 1.0
            if k >= 2:
                c[:, v] += 1.0
            corners[:, k] = c
        tri = np.array([0, 1, 2, 0, 2, 3] if f % 2 == 0 else
                       [0, 2, 1, 0, 3, 2], np.uint32)
        idx = (np.arange(len(xx), dtype=np.uint32)[:, None] * 4
               + base + tri[None, :]).reshape(-1)
        verts_out.append(corners.reshape(-1, 3))
        idx_out.append(idx)
        base += len(xx) * 4
    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros(0, np.uint32)
    return np.concatenate(verts_out), np.concatenate(idx_out)


@dataclasses.dataclass
class ChunkDrawRange:
    """SingleChunkInBuffer (meshes.rs:10-15)."""
    chunk_position: np.ndarray
    first_index: int
    index_count: int
    vertex_offset: int


@dataclasses.dataclass
class VoxelMeshBuffers:
    """Concatenated world mesh (meshes.rs:23-44)."""
    vertices: np.ndarray   # (V, 3) f32 world-space
    indices: np.ndarray    # (I,) u32 (relative to each chunk's vertex_offset)
    ranges: list

    @classmethod
    def build(cls, chunks: list[Chunk], prefer_native: bool = True):
        all_v = []
        all_i = []
        ranges = []
        voff = 0
        ioff = 0
        for c in chunks:
            if c.kind == ChunkKind.EMPTY:
                continue
            out = native.mesh_chunk_native(c.voxels) if prefer_native else None
            if out is None:
                out = mesh_voxels_numpy(c.voxels)
            v, i = out
            origin = (c.position.astype(np.float32) * CHUNK_SIZE)[None, :]
            all_v.append(v + origin)
            all_i.append(i)
            ranges.append(ChunkDrawRange(c.position.copy(), ioff, len(i), voff))
            voff += len(v)
            ioff += len(i)
        if not all_v:
            return cls(np.zeros((0, 3), np.float32), np.zeros(0, np.uint32), [])
        return cls(np.concatenate(all_v), np.concatenate(all_i), ranges)

    def export_obj(self, path):
        """Debug/preview export."""
        with open(path, "w") as f:
            for v in self.vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for r in self.ranges:
                tri = self.indices[r.first_index:r.first_index + r.index_count]
                for k in range(0, len(tri), 3):
                    a, b, c = (int(t) + r.vertex_offset + 1 for t in tri[k:k + 3])
                    f.write(f"f {a} {b} {c}\n")
