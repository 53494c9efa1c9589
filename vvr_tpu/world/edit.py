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
    """Owns the mutable world: chunk bitsets + the device brick pyramid.

    `pyramid` may be None for paged-scale worlds (1024^3 — the scene
    skips the 260 MB pyramid there, renderer.py); pass `size` instead and
    attach the structures that exist (attach_paged / attach_jump_grid /
    attach_faces)."""

    def __init__(self, chunks: list[Chunk], pyramid: BrickPyramid | None,
                 jumpgrid=None, size: int | None = None):
        self.pyramid = pyramid
        if pyramid is not None:
            self.size = pyramid.size
            self.depth = pyramid.depth
        else:
            assert size is not None, "size required when pyramid is None"
            self.size = int(size)
            self.depth = max(self.size.bit_length() - 1, 2) // 2
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
        import time as _time
        self.last_timings = {}

        def _timed(tag, fn, *a):
            t0 = _time.monotonic()
            out = fn(*a)
            self.last_timings[tag] = round(
                (_time.monotonic() - t0) * 1e3, 1)
            return out

        n_patched = 0
        if self.pyramid is None:
            if getattr(self, "_pg_prows", None) is not None:
                n_patched += _timed("paged_ms", self._patch_paged,
                                    positions)
            if self.jumpgrid is not None:
                _timed("jump_ms", self._patch_jump_grid, positions)
            if self.faces is not None:
                _timed("faces_ms", self._refresh_faces, positions)
            return n_patched
        grouped = self.pyramid.rows_grp is not None
        new_rows = self.pyramid.rows
        new_grp = self.pyramid.rows_grp
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
        if getattr(self, "_pg_prows", None) is not None:
            n_patched += self._patch_paged(positions)
        if self.jumpgrid is not None:
            self._patch_jump_grid(positions)
        if self.faces is not None:
            self._refresh_faces(positions)
        return n_patched

    def occupancy(self) -> np.ndarray:
        return self._occ

    # ---- paged two-level grid (world/paged.py) ---------------------------

    def _sb_words(self, sbs: np.ndarray):
        """(words16, sub2, occupied) for (K, 3) x,y,z superbrick coords —
        the pool-row payload (pool layout, world/paged.py: 512-bit voxel
        occupancy in the jump-grid word order + u64 2^3-subcell any-mask,
        bit = cx | cy<<2 | cz<<4)."""
        from vvr_tpu.world import jumpgrid as jg
        g = self.size // jg.SB
        k = len(sbs)
        occ6 = self._occ.reshape(g, jg.SB, g, jg.SB, g, jg.SB).transpose(
            0, 2, 4, 1, 3, 5)
        regions = occ6[sbs[:, 2], sbs[:, 1], sbs[:, 0]]   # (K, lz,ly,lx)
        occw = regions.reshape(k, jg.SB, 2, 4, jg.SB).reshape(k, 512)
        words = np.packbits(occw, axis=1,
                            bitorder="little").view(np.uint32)  # (K, 16)
        sub = regions.reshape(k, 4, 2, 4, 2, 4, 2).any(axis=(2, 4, 6))
        sub2 = np.packbits(sub.reshape(k, 64), axis=1,
                           bitorder="little").view(np.uint32)   # (K, 2)
        return words, sub2, regions.any(axis=(1, 2, 3))

    def attach_paged(self, tail_slack: int = 4096):
        """Editable paged grid (world/paged.py layout) with PER-PAGE pool
        slack: the kernel reads each page's pool base from its own row
        (ops/paged.py prow[:, 2]), so bases need not be the exact prefix
        popcount — each page gets `count + max(count/4, 2)` reserved pool
        rows, and a superbrick flip rewrites ONLY its page's row span
        (<= 64 row scatter) instead of shifting the whole pool (the
        reference's full-rebuild FIXME, src/voxel/sparse.rs:314-318,
        at pool granularity). A page outgrowing its span is reallocated
        into the shared tail; exhausting the tail forces a full rebuild
        (shape change -> one-time recompile)."""
        from vvr_tpu.world import jumpgrid as jg
        from vvr_tpu.world.paged import (PAGE_SB, PAGE_WORDS, PG,
                                         POOL_WORDS, PagedGrid)
        from vvr_tpu.world.pyramid import _pack_node_masks
        assert self.size % PG == 0, "paged grid needs size % 32 == 0"
        g = self.size // jg.SB
        p = self.size // PG
        occ_sb = self._occ.reshape(g, jg.SB, g, jg.SB, g, jg.SB).any(
            axis=(1, 3, 5))                               # [z,y,x]
        counts = occ_sb.reshape(p, PAGE_SB, p, PAGE_SB, p, PAGE_SB).sum(
            axis=(1, 3, 5)).ravel().astype(np.int64)      # x-major pages
        caps = counts + np.maximum(counts // 4, 2)
        base = np.zeros_like(caps)
        np.cumsum(caps[:-1], out=base[1:])
        total = int(caps.sum()) + tail_slack

        prows = np.zeros((p ** 3, PAGE_WORDS), np.uint32)
        prows[:, 0:2] = _pack_node_masks(occ_sb)
        prows[:, 2] = base.astype(np.uint32)
        occ_pg = occ_sb.reshape(p, PAGE_SB, p, PAGE_SB, p, PAGE_SB).any(
            axis=(1, 3, 5))
        prows[:, 3] = self._paged_odist_col(occ_pg)

        brows = np.zeros((total, POOL_WORDS), np.uint32)
        gz, gy, gx = np.nonzero(occ_sb)
        page_id = ((gx >> 2).astype(np.int64)
                   + (gy >> 2).astype(np.int64) * p
                   + (gz >> 2).astype(np.int64) * p * p)
        bit = (gx & 3) | ((gy & 3) << 2) | ((gz & 3) << 4)
        order = np.argsort(page_id * 64 + bit, kind="stable")
        sbs = np.stack([gx, gy, gz], -1)[order]
        # rank within page = position since the page's first occupied sb
        pid_s = page_id[order]
        firsts = np.zeros(len(pid_s), np.int64)
        newp = np.ones(len(pid_s), bool)
        newp[1:] = pid_s[1:] != pid_s[:-1]
        firsts = np.maximum.accumulate(
            np.where(newp, np.arange(len(pid_s)), 0))
        rank = np.arange(len(pid_s)) - firsts
        rowi = base[pid_s] + rank
        words, sub2, _ = self._sb_words(sbs)
        brows[rowi, 0:16] = words
        brows[rowi, 16:18] = sub2

        self._pg_occ_sb = occ_sb
        self._pg_occ_pg = occ_pg
        self._pg_counts = counts
        self._pg_caps = caps
        self._pg_base = base
        self._pg_spare = int(caps.sum())   # tail allocation cursor
        self._pg_total = total
        self._pg_brows_host = brows
        self._pg_prows = prows
        self.paged = PagedGrid(jnp.asarray(prows), jnp.asarray(brows),
                               self.size)
        return self.paged

    @staticmethod
    def _paged_odist_col(occ_pg: np.ndarray) -> np.ndarray:
        from vvr_tpu.world.jumpgrid import octant_distances
        odist = np.minimum(octant_distances(occ_pg, cap=15), 15).astype(
            np.uint32)
        packed = np.zeros(occ_pg.shape, np.uint32)
        for oct_ in range(8):
            packed |= odist[oct_] << np.uint32(4 * oct_)
        return packed.ravel()

    def _patch_paged(self, positions: np.ndarray) -> int:
        """Patch the paged grid for edited voxel positions (K, 3) x,y,z.
        Non-flip edits scatter only the touched pool rows; a superbrick
        occupancy flip rewrites its page's pool span + page row; a
        page-level flip additionally rewrites the octant-radius column
        (page count is p^3 <= 32K — one small scatter)."""
        from vvr_tpu.world.paged import PAGE_SB, PagedGrid
        from vvr_tpu.world.pyramid import _pack_node_masks
        p = self.size // 32
        aff = np.unique(positions >> 3, axis=0)            # (K, 3) x,y,z
        words, sub2, new_occ = self._sb_words(aff)
        page_id = ((aff[:, 0] >> 2).astype(np.int64)
                   + (aff[:, 1] >> 2).astype(np.int64) * p
                   + (aff[:, 2] >> 2).astype(np.int64) * p * p)
        bit = (aff[:, 0] & 3) | ((aff[:, 1] & 3) << 2) | ((aff[:, 2] & 3) << 4)
        old_occ = self._pg_occ_sb[aff[:, 2], aff[:, 1], aff[:, 0]]
        flip = new_occ != old_occ
        row_idx = []
        row_val = []
        prow_idx = []
        prow_val = []
        n_rows = 0

        def mask_below(mask_lo, mask_hi, b):
            if b >= 32:
                return (int(mask_lo).bit_count()
                        + (int(mask_hi) & ((1 << (b - 32)) - 1)).bit_count())
            return (int(mask_lo) & ((1 << b) - 1)).bit_count()

        if not flip.any():
            # in-place pool-row updates for still-occupied superbricks
            for k in np.nonzero(new_occ)[0]:
                pg = int(page_id[k])
                lo, hi = (int(self._pg_prows[pg, 0]),
                          int(self._pg_prows[pg, 1]))
                r = int(self._pg_base[pg]) + mask_below(lo, hi, int(bit[k]))
                vals = np.zeros(20, np.uint32)
                vals[0:16] = words[k]
                vals[16:18] = sub2[k]
                self._pg_brows_host[r] = vals
                row_idx.append(r)
                row_val.append(vals)
                n_rows += 1
        else:
            self._pg_occ_sb[aff[:, 2], aff[:, 1], aff[:, 0]] = new_occ
            pg_flip = False
            for pg in np.unique(page_id):
                pgi = int(pg)
                px = pgi % p
                py = (pgi // p) % p
                pz = pgi // (p * p)
                reg = self._pg_occ_sb[pz * PAGE_SB:(pz + 1) * PAGE_SB,
                                      py * PAGE_SB:(py + 1) * PAGE_SB,
                                      px * PAGE_SB:(px + 1) * PAGE_SB]
                newmask = _pack_node_masks(reg)[0]          # (2,) u32
                cnt = int(reg.sum())
                if cnt > self._pg_caps[pgi]:
                    # reallocate the page into the shared tail
                    need = cnt + max(cnt // 4, 2)
                    if self._pg_spare + need > self._pg_total:
                        return self._paged_full_rebuild(positions)
                    self._pg_base[pgi] = self._pg_spare
                    self._pg_caps[pgi] = need
                    self._pg_spare += need
                # rewrite the page's pool span: old rows of surviving
                # superbricks come from the host mirror; affected ones
                # from the freshly computed words
                lz, ly, lx = np.nonzero(reg)                # z,y,x local
                bits_n = (lx | (ly << 2) | (lz << 4)).astype(np.int64)
                o = np.argsort(bits_n)
                bits_n = bits_n[o]
                gxyz = np.stack([px * PAGE_SB + lx[o], py * PAGE_SB + ly[o],
                                 pz * PAGE_SB + lz[o]], -1)
                new_rows = np.zeros((cnt, 20), np.uint32)
                old_lo = int(self._pg_prows[pgi, 0])
                old_hi = int(self._pg_prows[pgi, 1])
                old_base_rows = self._pg_brows_host
                in_aff = {(int(a[0]), int(a[1]), int(a[2])): k
                          for k, a in enumerate(aff)
                          if int(page_id[k]) == pgi}
                ob = int(self._pg_prows[pgi, 2])
                for r_i in range(cnt):
                    key = (int(gxyz[r_i, 0]), int(gxyz[r_i, 1]),
                           int(gxyz[r_i, 2]))
                    k = in_aff.get(key)
                    if k is not None:
                        new_rows[r_i, 0:16] = words[k]
                        new_rows[r_i, 16:18] = sub2[k]
                    else:
                        b = int(bits_n[r_i])
                        was = ((old_hi >> (b - 32)) & 1 if b >= 32
                               else (old_lo >> b) & 1)
                        assert was, "surviving superbrick missing from mask"
                        new_rows[r_i] = old_base_rows[
                            ob + mask_below(old_lo, old_hi, b)]
                nb = int(self._pg_base[pgi])
                self._pg_brows_host[nb:nb + cnt] = new_rows
                row_idx.extend(range(nb, nb + cnt))
                row_val.extend(new_rows)
                n_rows += cnt
                # page row: mask + base (+ odist col rewritten below)
                old_pg_occ = (old_lo | old_hi) != 0
                self._pg_counts[pgi] = cnt
                self._pg_prows[pgi, 0:2] = newmask
                self._pg_prows[pgi, 2] = np.uint32(nb)
                prow_idx.append(pgi)
                if (cnt > 0) != old_pg_occ:
                    pg_flip = True
            if pg_flip:
                self._pg_occ_pg = self._pg_occ_sb.reshape(
                    p, PAGE_SB, p, PAGE_SB, p, PAGE_SB).any(axis=(1, 3, 5))
                self._pg_prows[:, 3] = self._paged_odist_col(self._pg_occ_pg)
                # octant radii change grid-wide on a page flip: one
                # column scatter (<= 32K rows)
                new_prows = self.paged.prows.at[:, 3].set(
                    jnp.asarray(self._pg_prows[:, 3]))
            else:
                new_prows = self.paged.prows
            for pgi in prow_idx:
                prow_val.append(self._pg_prows[pgi].copy())
            if prow_idx:
                new_prows = new_prows.at[jnp.asarray(
                    np.asarray(prow_idx, np.int32))].set(
                    jnp.asarray(np.stack(prow_val)))
            self.paged = PagedGrid(new_prows, self.paged.brows, self.size)
        if row_idx:
            brows = self.paged.brows.at[jnp.asarray(
                np.asarray(row_idx, np.int32))].set(
                jnp.asarray(np.stack(row_val)))
            self.paged = PagedGrid(self.paged.prows, brows, self.size)
        return n_rows

    def _paged_full_rebuild(self, positions) -> int:
        """Tail exhausted: rebuild mirrors + device arrays from scratch
        (shape may change -> one-time recompile of consumers)."""
        self.attach_paged()
        return int(len(positions))

    # ---- incremental exposed faces (world/faces.py region extraction) ----

    def attach_faces_incremental(self, region: int = CHUNK_SIZE,
                                 slack: float = 0.5, pad_rows: int = 4,
                                 total_rows: int | None = None):
        """Editable face set: per-REGION (default chunk-sized) extraction
        into capacity-padded device slots. Runs are capped at region
        boundaries (extract_merged_faces_region), so one region's
        re-extraction composes with untouched neighbors; padding rows are
        zero-extent sentinels both consumers skip (ops/rastertrace.py
        `visible &= eu > 0`, ops/sunshadow.py `occl &= eu > 0`).
        Face count rises vs the global greedy merge (runs no longer span
        regions) — measured ~1-3% on terrain; the raster entry loop's
        trip count tracks the dynamic entry total, so the cost is the
        slightly larger allocation, not proportional work.

        The DEVICE arrays are allocated at a FIXED total capacity
        (`total_rows`, default sum(caps) * 1.25 rounded up to 4096): the
        face tuple's SHAPE is part of every consumer's jit key, so a slot
        overflow must never change it. Overflow REBASES the regions
        inside the fixed capacity (host-side re-pack + one re-upload)
        instead of re-allocating — at 1024^3 a shape change cost a ~98 s
        frame recompile AND trips the axon backend's multi-specialization
        fragility (round-5 diag, PROGRESS.md)."""
        from vvr_tpu.world.faces import extract_merged_faces_region
        self._fc_region = int(region)
        nr = self.size // self._fc_region
        sets = {}
        counts = np.zeros(nr ** 3, np.int64)
        for rz in range(nr):
            for ry in range(nr):
                for rx in range(nr):
                    fs = self._region_faces(rx, ry, rz)
                    sets[(rx, ry, rz)] = fs
                    counts[rx + ry * nr + rz * nr * nr] = len(fs)
        caps = np.maximum(counts + (counts * slack).astype(np.int64),
                          counts + pad_rows)
        base = np.zeros_like(caps)
        np.cumsum(caps[:-1], out=base[1:])
        needed = int(caps.sum())
        if total_rows is None:
            total_rows = getattr(self, "_fc_total", 0)
        total = max(int(total_rows), (needed * 5 + 3) // 4)
        total = -(-total // 4096) * 4096
        host = {k: np.zeros(total, np.int32)
                for k in ("vx", "vy", "vz", "axis", "sgn", "eu", "ev",
                          "einfo")}
        # sentinel padding: off-world min corner, zero extent, sgn 0 —
        # invisible to every camera inside x > -8 and skipped by eu > 0
        host["vx"][:] = -8
        host["vy"][:] = -8
        host["vz"][:] = -8
        for (rx, ry, rz), fs in sets.items():
            b = int(base[rx + ry * nr + rz * nr * nr])
            for k in host:
                host[k][b:b + len(fs)] = getattr(fs, k)
        self._fc_base = base
        self._fc_caps = caps
        self._fc_counts = counts
        self._fc_total = total
        self._fc_host = host
        self.faces = tuple(jnp.asarray(host[k]) for k in
                           ("vx", "vy", "vz", "axis", "sgn", "eu", "ev",
                            "einfo"))
        return self.faces

    def _region_faces(self, rx: int, ry: int, rz: int):
        from vvr_tpu.world.faces import extract_merged_faces_region
        cs = self._fc_region
        s = self.size
        halo = np.zeros((cs + 2,) * 3, bool)
        x0, y0, z0 = rx * cs, ry * cs, rz * cs
        zs = slice(max(z0 - 1, 0), min(z0 + cs + 1, s))
        ys = slice(max(y0 - 1, 0), min(y0 + cs + 1, s))
        xs = slice(max(x0 - 1, 0), min(x0 + cs + 1, s))
        halo[zs.start - (z0 - 1):zs.stop - (z0 - 1),
             ys.start - (y0 - 1):ys.stop - (y0 - 1),
             xs.start - (x0 - 1):xs.stop - (x0 - 1)] = \
            self._occ[zs, ys, xs]
        return extract_merged_faces_region(halo, (x0, y0, z0), s, cs)

    def _refresh_faces(self, positions: np.ndarray):
        """Incremental if attach_faces_incremental was used, else the
        full rebuild (attach_faces's original behavior)."""
        if getattr(self, "_fc_host", None) is None:
            self.faces = self._build_faces()
            return
        cs = self._fc_region
        nr = self.size // cs
        # affected regions: the positions' own + neighbors across region
        # boundaries (an edit changes the NEIGHBOR voxel's exposure too)
        cand = [positions]
        for ax in range(3):
            for d in (-1, 1):
                q = positions.copy()
                q[:, ax] += d
                cand.append(q)
        cand = np.concatenate(cand, 0)
        cand = cand[np.all((cand >= 0) & (cand < self.size), axis=1)]
        regs = np.unique(cand // cs, axis=0)
        row_idx = []
        row_vals = {k: [] for k in ("vx", "vy", "vz", "axis", "sgn",
                                    "eu", "ev", "einfo")}
        for rx, ry, rz in regs:
            ri = int(rx + ry * nr + rz * nr * nr)
            fs = self._region_faces(int(rx), int(ry), int(rz))
            if len(fs) > self._fc_caps[ri]:
                # slot overflow: full re-attach (one-time recompile of
                # consumers on the new shapes)
                self.attach_faces_incremental(region=cs)
                return
            b = int(self._fc_base[ri])
            cap = int(self._fc_caps[ri])
            n = len(fs)
            sl = slice(b, b + cap)
            for k in row_vals:
                col = np.full(cap, -8 if k in ("vx", "vy", "vz") else 0,
                              np.int32)
                col[:n] = getattr(fs, k)
                self._fc_host[k][sl] = col
                row_vals[k].append(col)
            row_idx.append(np.arange(b, b + cap, dtype=np.int32))
            self._fc_counts[ri] = n
        if not row_idx:
            return
        idx = jnp.asarray(np.concatenate(row_idx))
        keys = ("vx", "vy", "vz", "axis", "sgn", "eu", "ev", "einfo")
        self.faces = tuple(
            self.faces[i].at[idx].set(
                jnp.asarray(np.concatenate(row_vals[k])))
            for i, k in enumerate(keys))
