"""Incremental world edits — set/clear voxels with in-place structure updates.

The reference's edit path does a FULL tree rebuild per edit (click() ->
svo.set + rebuild, src/renderer.rs:362-369 disabled; FIXME at
src/voxel/sparse.rs:314-318 calls it out). The dense brick pyramid makes the
incremental version straightforward (SURVEY.md §7 step 6 'do better'): an
edited voxel touches exactly one node row per level (its ancestor chain), so
we recompute those rows host-side from the chunk bitsets and scatter only the
changed rows into the device array.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk, ChunkKind
from vvr_tpu.world.pyramid import BrickPyramid


class WorldEditor:
    """Owns the mutable world: chunk bitsets + the device brick pyramid."""

    def __init__(self, chunks: list[Chunk], pyramid: BrickPyramid):
        self.pyramid = pyramid
        self.size = pyramid.size
        self.depth = pyramid.depth
        n = self.size // CHUNK_SIZE
        self._chunk_index = {}
        for c in chunks:
            self._chunk_index[tuple(int(v) for v in c.position)] = c
        self.chunks = chunks
        # dense bool view for recomputing masks (shares chunk storage layout)
        self._occ = np.zeros((self.size,) * 3, bool)
        for c in chunks:
            x, y, z = (int(v) * CHUNK_SIZE for v in c.position)
            self._occ[z:z + CHUNK_SIZE, y:y + CHUNK_SIZE, x:x + CHUNK_SIZE] = c.voxels

    def _node_row(self, level: int, cell: np.ndarray) -> int:
        g = max(self.size >> (2 * level), 1)
        return self.pyramid.bases[level] + int(cell[0]) + int(cell[1]) * g \
            + int(cell[2]) * g * g

    def _recompute_row(self, level: int, cell: np.ndarray):
        """any/full u64 masks of node `cell` at `level` from the occupancy."""
        cs = 1 << (2 * (level - 1))          # child cell size in voxels
        ox, oy, oz = (int(c) * cs * 4 for c in cell)
        region = self._occ[oz:oz + 4 * cs, oy:oy + 4 * cs, ox:ox + 4 * cs]
        g = region.reshape(4, cs, 4, cs, 4, cs)
        any_b = g.any(axis=(1, 3, 5))        # (z4, y4, x4)
        full_b = g.all(axis=(1, 3, 5))

        def pack(b):
            flat = b.reshape(64)             # z-major, x fastest = bit order
            by = np.packbits(flat, bitorder="little")
            w = by.view(np.uint32)
            return int(w[0]), int(w[1])

        return pack(any_b), pack(full_b)

    def set_voxels(self, positions: np.ndarray, solid: bool) -> int:
        """Set/clear voxels at (K, 3) int world coords. Returns the number of
        node rows patched on device."""
        positions = np.atleast_2d(np.asarray(positions, np.int64))
        positions = positions[
            np.all((positions >= 0) & (positions < self.size), axis=1)]
        if len(positions) == 0:
            return 0

        # update chunk bitsets + dense view
        for x, y, z in positions:
            self._occ[z, y, x] = solid
            key = (int(x) // CHUNK_SIZE, int(y) // CHUNK_SIZE, int(z) // CHUNK_SIZE)
            c = self._chunk_index.get(key)
            if c is None:
                c = Chunk(np.array(key), np.zeros((CHUNK_SIZE,) * 3, bool))
                self._chunk_index[key] = c
                self.chunks.append(c)
            c.voxels[z % CHUNK_SIZE, y % CHUNK_SIZE, x % CHUNK_SIZE] = solid
            n_set = c.voxels.sum()
            c.kind = (ChunkKind.EMPTY if n_set == 0 else
                      ChunkKind.FULL if n_set == CHUNK_SIZE ** 3 else
                      ChunkKind.PARTIAL)

        # affected node rows: the ancestor chain of every edited voxel
        rows = {}
        for p in positions:
            for level in range(1, self.depth + 1):
                cell = p >> (2 * level)
                rows[(level, tuple(cell))] = None
        idx = []
        vals = []
        for (level, cell) in rows:
            (alo, ahi), (flo, fhi) = self._recompute_row(level, np.array(cell))
            idx.append(self._node_row(level, np.array(cell)))
            vals.append((alo, ahi, flo, fhi))

        idx = jnp.asarray(np.array(idx, np.int32))
        vals = jnp.asarray(np.array(vals, np.uint32))
        self.pyramid = BrickPyramid(
            self.pyramid.rows.at[idx].set(vals),
            self.pyramid.depth, self.pyramid.bases)
        return len(rows)

    def occupancy(self) -> np.ndarray:
        return self._occ
