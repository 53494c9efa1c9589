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

    def __init__(self, chunks: list[Chunk], pyramid: BrickPyramid,
                 jumpgrid=None):
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
        self.jumpgrid = None
        self.faces = None      # device face tuple (ops/rastertrace.py)
        if jumpgrid is not None:
            self.attach_jump_grid(jumpgrid)

    def attach_faces(self, faces=None):
        """Keep the exposed-face arrays (primary-ray rasterizer input) in
        sync with edits. Rebuilt in full per edit batch: extraction is a
        handful of vectorized shifts over the occupancy (fine for
        interactive brushes; a per-superbrick incremental patch would need
        variable-length device arrays)."""
        self.faces = faces if faces is not None else self._build_faces()
        return self.faces

    def _build_faces(self):
        from vvr_tpu.world.faces import extract_merged_faces
        return extract_merged_faces(self._occ).device_tuple()

    def attach_jump_grid(self, grid):
        """Keep a JumpGrid (ops/jump.py's structure) in sync with edits.
        Host mirrors of the superbrick occupancy and both distance fields
        let row patches be assembled without device reads."""
        from vvr_tpu.world import jumpgrid as jg
        self.jumpgrid = grid
        g = self.size // jg.SB
        self._occ_sb = self._occ.reshape(
            g, jg.SB, g, jg.SB, g, jg.SB).any(axis=(1, 3, 5))
        self._jg_dist = jg.chebyshev_distance(self._occ_sb)
        self._jg_odist = jg.octant_distances(self._occ_sb)

    def _patch_jump_grid(self, positions: np.ndarray):
        """Patch the jump grid for edited voxel positions (K, 3) x,y,z.

        Occupancy/subcell words change only in the edited superbricks (one
        row scatter). The distance fields depend only on WHICH superbricks
        are non-empty, so they are recomputed (and their columns rewritten
        device-wide) only when an edit flips a superbrick empty<->non-empty
        — a solidify into empty space would otherwise leave stale, UNSAFE
        jump radii elsewhere."""
        from vvr_tpu.world import jumpgrid as jg
        g = self.size // jg.SB
        sbs = np.unique(positions >> 3, axis=0)        # (K, 3) x,y,z
        k = len(sbs)
        occ6 = self._occ.reshape(g, jg.SB, g, jg.SB, g, jg.SB).transpose(
            0, 2, 4, 1, 3, 5)                          # (gz,gy,gx, lz,ly,lx)
        regions = occ6[sbs[:, 2], sbs[:, 1], sbs[:, 0]]  # (K, lz,ly,lx)
        vals = np.zeros((k, jg.ROW_WORDS), np.uint32)
        # words[0:16]: word = 2*lz + (ly>>2), bit = lx + 8*(ly&3)
        occw = regions.reshape(k, jg.SB, 2, 4, jg.SB).reshape(k, 512)
        vals[:, :16] = np.packbits(occw, axis=1,
                                   bitorder="little").view(np.uint32)
        # words[17:19]: 4^3 subcell any, bit = cx | cy<<2 | cz<<4
        sub = regions.reshape(k, 4, 2, 4, 2, 4, 2).any(axis=(2, 4, 6))
        vals[:, 17:19] = np.packbits(sub.reshape(k, 64), axis=1,
                                     bitorder="little").view(np.uint32)
        new_sb = regions.any(axis=(1, 2, 3))
        old_sb = self._occ_sb[sbs[:, 2], sbs[:, 1], sbs[:, 0]]
        flipped = bool((new_sb != old_sb).any())
        rows = self.jumpgrid.rows
        if flipped:
            self._occ_sb[sbs[:, 2], sbs[:, 1], sbs[:, 0]] = new_sb
            self._jg_dist = jg.chebyshev_distance(self._occ_sb)
            self._jg_odist = jg.octant_distances(self._occ_sb)
        vals[:, 16] = self._jg_dist[sbs[:, 2], sbs[:, 1], sbs[:, 0]]
        for oct_ in range(8):
            vals[:, 24 + oct_] = self._jg_odist[
                oct_, sbs[:, 2], sbs[:, 1], sbs[:, 0]]
        idx = (sbs[:, 0] + sbs[:, 1] * g + sbs[:, 2] * g * g).astype(np.int32)
        rows = rows.at[jnp.asarray(idx)].set(jnp.asarray(vals))
        if flipped:
            # rewrite the distance columns grid-wide (9 column scatters)
            rows = rows.at[:, 16].set(
                jnp.asarray(self._jg_dist.ravel().astype(np.uint32)))
            for oct_ in range(8):
                rows = rows.at[:, 24 + oct_].set(jnp.asarray(
                    self._jg_odist[oct_].ravel().astype(np.uint32)))
        from vvr_tpu.world.jumpgrid import JumpGrid
        self.jumpgrid = JumpGrid(rows, self.size)

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

    def _recompute_rows_batch(self, level: int, cells: np.ndarray):
        """Vectorized any/full (lo, hi) u32 masks for (K, 3) cells at
        `level`: one reshape of the occupancy + one fancy-index per call."""
        cs = 1 << (2 * (level - 1))
        g = max(self.size >> (2 * level), 1)
        blk = 4 * cs
        occ6 = self._occ.reshape(g, blk, g, blk, g, blk).transpose(
            0, 2, 4, 1, 3, 5)                      # (gz,gy,gx, bz,by,bx) view
        regions = occ6[cells[:, 2], cells[:, 1], cells[:, 0]]  # (K, blk^3)
        r = regions.reshape(-1, 4, cs, 4, cs, 4, cs)
        any_b = r.any(axis=(2, 4, 6)).reshape(-1, 64)   # (K, z4*y4*x4)
        full_b = r.all(axis=(2, 4, 6)).reshape(-1, 64)
        pa = np.packbits(any_b, axis=1, bitorder="little").view(np.uint32)
        pf = np.packbits(full_b, axis=1, bitorder="little").view(np.uint32)
        return pa, pf                                   # each (K, 2)

    def set_voxels(self, positions: np.ndarray, solid: bool) -> int:
        """Set/clear voxels at (K, 3) int world coords in ONE vectorized
        pass: the occupancy update, the per-level affected-row recompute and
        the device scatters (node table AND grouped table) are all batched —
        a 1,000-voxel brush patches the device with one scatter per table.
        Returns the number of node rows patched."""
        positions = np.atleast_2d(np.asarray(positions, np.int64))
        positions = positions[
            np.all((positions >= 0) & (positions < self.size), axis=1)]
        if len(positions) == 0:
            return 0
        px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
        self._occ[pz, py, px] = solid

        # chunk bitsets: group positions by chunk, one scatter per chunk
        keys = positions // CHUNK_SIZE
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        for ki, key_arr in enumerate(uniq):
            key = tuple(int(v) for v in key_arr)
            c = self._chunk_index.get(key)
            if c is None:
                c = Chunk(np.array(key), np.zeros((CHUNK_SIZE,) * 3, bool))
                self._chunk_index[key] = c
                self.chunks.append(c)
            sel = positions[inv == ki] % CHUNK_SIZE
            c.voxels[sel[:, 2], sel[:, 1], sel[:, 0]] = solid
            n_set = c.voxels.sum()
            c.kind = (ChunkKind.EMPTY if n_set == 0 else
                      ChunkKind.FULL if n_set == CHUNK_SIZE ** 3 else
                      ChunkKind.PARTIAL)

        # affected rows per level: the ancestor chains, deduplicated; the
        # grouped table needs whole 2x2x2 groups, so recompute every member
        # node of each affected group (idempotent for unaffected members)
        grouped = self.pyramid.rows_grp is not None
        new_rows = self.pyramid.rows
        new_grp = self.pyramid.rows_grp
        n_patched = 0
        for level in range(1, self.depth + 1):
            cells = np.unique(positions >> (2 * level), axis=0)
            g = max(self.size >> (2 * level), 1)
            if grouped:
                groups = np.unique(cells >> 1, axis=0)
                # all 8 members of each group; members beyond the level grid
                # are zero padding in the grouped table (never addressed)
                offs = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                                 for x in (0, 1)], np.int64)
                members = groups[:, None, :] * 2 + offs[None]     # (G, 8, 3)
                member_ok = (members < g).all(axis=2)             # (G, 8)
                cells = np.unique(members.reshape(-1, 3)[
                    member_ok.reshape(-1)], axis=0)
            pa, pf = self._recompute_rows_batch(level, cells)
            idx = (self.pyramid.bases[level] + cells[:, 0] + cells[:, 1] * g
                   + cells[:, 2] * g * g).astype(np.int32)
            vals = np.concatenate([pa, pf], axis=1)
            new_rows = new_rows.at[jnp.asarray(idx)].set(jnp.asarray(vals))
            n_patched += len(cells)
            if grouped:
                gg = max((g + 1) // 2, 1)
                gidx = (self.pyramid.gbases[level] + groups[:, 0]
                        + groups[:, 1] * gg
                        + groups[:, 2] * gg * gg).astype(np.int32)
                # assemble (G, 16) rows: word [sub*2 + hi], sub = x|y<<1|z<<2
                gvals = np.zeros((len(groups), 16), np.uint32)
                cell_key = {tuple(c): i for i, c in enumerate(cells)}
                for sub in range(8):
                    ok = member_ok[:, sub]
                    if not ok.any():
                        continue
                    rows_i = np.array([cell_key[tuple(m)]
                                       for m in members[ok, sub]])
                    gvals[ok, 2 * sub] = pa[rows_i, 0]
                    gvals[ok, 2 * sub + 1] = pa[rows_i, 1]
                new_grp = new_grp.at[jnp.asarray(gidx)].set(
                    jnp.asarray(gvals))
        self.pyramid = BrickPyramid(
            new_rows, self.pyramid.depth, self.pyramid.bases,
            rows_grp=new_grp, gbases=self.pyramid.gbases)
        if self.jumpgrid is not None:
            self._patch_jump_grid(positions)
        if self.faces is not None:
            self.faces = self._build_faces()
        return n_patched

    def occupancy(self) -> np.ndarray:
        return self._occ
