"""Chunk — the 64^3 unit of world storage.

Reference: src/voxel/chunk.rs. A chunk is classified Full / Empty / Partial
(with the invariant that Partial is never all-0 or all-1, chunk.rs:10-25), and
carries its bottom-up "mips": 4 levels (64 -> 16 -> 4 -> 1) of any/all
occupancy plus tight per-cell AABBs (chunk_to_sparse, chunk.rs:211-322).

Here the mip build is fully vectorized NumPy (the reference uses triple nested
loops + rayon); voxel arrays are indexed [z, y, x] so the C-contiguous linear
index equals the reference's x-major convention (src/voxel/util.rs:8-38).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

CHUNK_SIZE = 64       # src/voxel/chunk.rs:6
CHUNK_MIPS = 4        # 64 -> 16 -> 4 -> 1


class ChunkKind(enum.Enum):
    EMPTY = 0
    FULL = 1
    PARTIAL = 2


@dataclasses.dataclass
class ChunkMips:
    """any/all occupancy + tight bounds per mip level.

    any_mips[k]  : bool (m, m, m) [z,y,x], m = 64 >> (2k)  (k = 0..3)
    all_mips[k]  : bool (m, m, m)
    bounds[k]    : int32 (m, m, m, 6) chunk-local tight AABB (minx,miny,minz,
                   maxx,maxy,maxz; max exclusive); undefined where any=False.
    """

    any_mips: list
    all_mips: list
    bounds: list


@dataclasses.dataclass
class Chunk:
    """position: (3,) int chunk coords; voxels: bool (64,64,64) [z,y,x]."""

    position: np.ndarray
    voxels: np.ndarray
    kind: ChunkKind = ChunkKind.PARTIAL
    mips: ChunkMips | None = None
    world_bounds: np.ndarray | None = None  # (6,) int32, world voxel coords

    def __post_init__(self):
        self.position = np.asarray(self.position, np.int32)
        self.voxels = np.asarray(self.voxels, bool)
        assert self.voxels.shape == (CHUNK_SIZE,) * 3

    def rebuild(self):
        """Classify + build mips (reference Chunk::rebuild, chunk.rs:205)."""
        n = int(self.voxels.sum())
        if n == 0:
            self.kind = ChunkKind.EMPTY
        elif n == CHUNK_SIZE ** 3:
            self.kind = ChunkKind.FULL
        else:
            self.kind = ChunkKind.PARTIAL
        self.mips = build_chunk_mips(self.voxels)
        origin = self.position.astype(np.int64) * CHUNK_SIZE
        if self.kind == ChunkKind.EMPTY:
            self.world_bounds = np.zeros(6, np.int32)  # degenerate, like
            # the reference's Aabb::default() for empty chunks (chunk.rs:219)
        else:
            local = self.mips.bounds[CHUNK_MIPS - 1][0, 0, 0]
            self.world_bounds = (local + np.concatenate([origin, origin])).astype(np.int32)
        return self


_B0_CACHE = None


def _voxel_bounds_grid() -> np.ndarray:
    """Per-voxel unit AABBs (cached module-wide; building it per chunk
    dominated the 4096-chunk world build)."""
    global _B0_CACHE
    if _B0_CACHE is None:
        m = CHUNK_SIZE
        zz, yy, xx = np.meshgrid(np.arange(m), np.arange(m), np.arange(m),
                                 indexing="ij")
        _B0_CACHE = np.stack([xx, yy, zz, xx + 1, yy + 1, zz + 1],
                             axis=-1).astype(np.int32)
    return _B0_CACHE


def build_chunk_mips(voxels: np.ndarray) -> ChunkMips:
    """Vectorized bottom-up mip build (reference chunk_to_sparse,
    chunk.rs:211-322): any/all over 4x4x4 groups + tight child-union AABBs."""
    voxels = np.asarray(voxels, bool)
    any_mips = [voxels]
    all_mips = [voxels]
    bounds = [_voxel_bounds_grid()]

    for _ in range(1, CHUNK_MIPS):
        prev_any = any_mips[-1]
        prev_all = all_mips[-1]
        prev_b = bounds[-1]
        pm = prev_any.shape[0]
        nm = pm // 4
        ga = prev_any.reshape(nm, 4, nm, 4, nm, 4)
        gl = prev_all.reshape(nm, 4, nm, 4, nm, 4)
        nxt_any = ga.any(axis=(1, 3, 5))
        nxt_all = gl.all(axis=(1, 3, 5))
        # union of child bounds where child any is set
        gb = prev_b.reshape(nm, 4, nm, 4, nm, 4, 6)
        mask = ga[..., None]
        big = np.int32(1 << 20)
        mins = np.where(mask, gb[..., :3], big).min(axis=(1, 3, 5))
        maxs = np.where(mask, gb[..., 3:], -big).max(axis=(1, 3, 5))
        nxt_b = np.concatenate([mins, maxs], axis=-1).astype(np.int32)
        any_mips.append(nxt_any)
        all_mips.append(nxt_all)
        bounds.append(nxt_b)

    return ChunkMips(any_mips, all_mips, bounds)
