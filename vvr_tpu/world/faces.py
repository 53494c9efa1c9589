"""Exposed-face extraction — the geometry input of the primary-ray
rasterizer (ops/rastertrace.py).

Every first hit of a ray that starts in empty space lies on an *exposed
face*: a unit quad between a solid voxel and an empty neighbor (or the
world boundary). The set of exposed faces is therefore a complete,
direction-independent representation of first-hit visibility, extracted
once per world (and patchable per edit).

Layout: struct-of-arrays over N faces
  vx, vy, vz : int32 — the SOLID voxel's coordinates
  axis       : int32 0/1/2 — the face's perpendicular axis (x/y/z)
  sgn        : int32 0/1 — 1 if the empty neighbor is at +axis
The face's plane coordinate along `axis` is v_axis + sgn.

This replaces nothing in the reference (it rasterizes chunk meshes only as
a debug path, src/voxel/meshes.rs); it is the TPU-native object-order
formulation of the primary megakernel dispatch (raytracer.slang:110-119).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FaceSet:
    vx: np.ndarray
    vy: np.ndarray
    vz: np.ndarray
    axis: np.ndarray
    sgn: np.ndarray
    size: int

    def __len__(self):
        return len(self.vx)


def extract_faces(occ: np.ndarray) -> FaceSet:
    """All exposed faces of dense bool occupancy [z,y,x]. World-boundary
    neighbors count as empty (rays can only hit them from outside the
    volume, which trace_shi rejects, but keeping them is harmless and
    preserves the solid-empty boundary definition)."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    parts = []
    # [z,y,x] array axes map to world axes x=2, y=1, z=0
    for axis, arr_ax in ((0, 2), (1, 1), (2, 0)):
        for sgn in (0, 1):
            nb = np.zeros_like(occ)
            sl_src = [slice(None)] * 3
            sl_dst = [slice(None)] * 3
            if sgn == 1:  # neighbor at +axis
                sl_src[arr_ax] = slice(1, None)
                sl_dst[arr_ax] = slice(0, -1)
            else:
                sl_src[arr_ax] = slice(0, -1)
                sl_dst[arr_ax] = slice(1, None)
            nb[tuple(sl_dst)] = occ[tuple(sl_src)]
            exposed = occ & ~nb
            z, y, x = np.nonzero(exposed)
            parts.append((x, y, z,
                          np.full(len(x), axis, np.int32),
                          np.full(len(x), sgn, np.int32)))
    vx = np.concatenate([p[0] for p in parts]).astype(np.int32)
    vy = np.concatenate([p[1] for p in parts]).astype(np.int32)
    vz = np.concatenate([p[2] for p in parts]).astype(np.int32)
    axis = np.concatenate([p[3] for p in parts])
    sgn = np.concatenate([p[4] for p in parts])
    return FaceSet(vx, vy, vz, axis, sgn, size)
