"""Paged two-level jump grid — the 1024^3-scale acceleration structure.

At the reference's flagship scale (1024^3 voxels — /root/reference/
src/voxel/util.rs:5-6) the flat JumpGrid's (S/8)^3 row table reaches 2M
rows x 128 B = 256 MB, and the dense table wastes memory on empty space
(the world is a terrain shell; <5% of superbricks are occupied). The
paged variant splits it:

  page table `prows` ((S/32)^3, 8) u32, x-major, one row per 32^3-voxel
  PAGE (= 4^3 superbricks):
    w0, w1 : u64 occupancy mask of the page's 4^3 superbricks
             (bit = sx | sy<<2 | sz<<4 — the pyramid node layout,
             world/occupancy.py)
    w2     : pool base index — the prefix popcount of all previous
             pages' masks (reference popcount-indexing,
             src/voxel/sparse.rs:318-513, applied at page granularity)
    w3     : 8 per-direction-octant one-sided empty-box jump radii in
             PAGE units, 4 bits each (capped 15, jumps chain);
             0 <=> page non-empty
    w4..7  : zero padding (row width is free up to 256 B)

  brick pool `brows` (n_occupied_superbricks, 20) u32: rows ONLY for
  occupied superbricks, ordered by (page x-major, in-page bit index):
    [0:16]  : the superbrick's 512-bit voxel occupancy
              (jump-grid word layout, world/occupancy.py brick_solid)
    [16:18] : u64 any-mask of the brick's 4^3 2^3-voxel subcells
    [18:20] : zero padding

A ray pays one page fetch per page it crosses (empty pages are crossed
in ONE fetch via the octant radius — 32-voxel granularity), walks the
in-register 64-bit mask across empty superbricks inside partial pages
(zero fetches), and fetches pool rows only for occupied superbricks it
actually enters. At 1024^3 the page table is 32^3 = 32K rows and the
pool ~100K rows — ~14 MB total vs the flat grid's 256 MB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.world.jumpgrid import SB, octant_distances, pack_superbricks

PG = 32          # page edge, voxels
PAGE_SB = 4      # superbricks per page edge
POOL_WORDS = 20
PAGE_WORDS = 8


@jax.tree_util.register_pytree_node_class
class PagedGrid:
    """prows ((S/32)^3, 8) u32 + brows (pool, 20) u32, both x-major."""

    def __init__(self, prows, brows, size: int):
        self.prows = prows
        self.brows = brows
        self.size = int(size)

    @property
    def psize(self) -> int:
        # page-table edge — from the table itself: small worlds pad the
        # TABLES to one 32^3 page while .size stays the true world size
        m = round(len(self.prows) ** (1 / 3))
        return next(mm for mm in (m - 1, m, m + 1) if mm ** 3
                    == len(self.prows))

    @property
    def gsize(self) -> int:
        return self.psize * PAGE_SB

    def tree_flatten(self):
        return (self.prows, self.brows), (self.size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    def memory_bytes(self) -> int:
        return self.prows.size * 4 + self.brows.size * 4


def build_paged_grid(occ: np.ndarray) -> PagedGrid:
    """Build from dense bool occupancy [z, y, x]. Worlds smaller than (or
    not a multiple of) the 32-voxel page edge are zero-padded in the
    TABLES only — PagedGrid.size stays the true world size, which is what
    the kernel's out-of-bounds exit tests use."""
    from vvr_tpu.world.pyramid import _pack_node_masks
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    padded = -(-size // PG) * PG
    if padded != size:
        ext = np.zeros((padded, padded, padded), bool)
        ext[:size, :size, :size] = occ
        occ = ext
    true_size = size
    size = padded
    g = size // SB
    p = size // PG

    occ_sb = occ.reshape(g, SB, g, SB, g, SB).any(axis=(1, 3, 5))  # [z,y,x]
    # page masks: occ_sb is a (4p)^3 grid of superbricks; _pack_node_masks
    # packs each 4^3 cell with bit = x | y<<2 | z<<4 (the layout we want)
    pmask = _pack_node_masks(occ_sb)                      # (p^3, 2) u32
    counts = occ_sb.reshape(p, PAGE_SB, p, PAGE_SB, p, PAGE_SB).sum(
        axis=(1, 3, 5)).ravel().astype(np.int64)          # x-major
    base = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=base[1:])
    n_pool = int(counts.sum())

    prows = np.zeros((p ** 3, PAGE_WORDS), np.uint32)
    prows[:, 0:2] = pmask
    prows[:, 2] = base.astype(np.uint32)
    occ_pg = occ_sb.reshape(p, PAGE_SB, p, PAGE_SB, p, PAGE_SB).any(
        axis=(1, 3, 5))                                   # [z,y,x]
    odist = np.minimum(octant_distances(occ_pg, cap=15), 15).astype(
        np.uint32)
    packed = np.zeros((p, p, p), np.uint32)
    for oct_ in range(8):
        packed |= odist[oct_] << np.uint32(4 * oct_)
    prows[:, 3] = packed.ravel()

    # pool rows in (page x-major, in-page bit) order: sort occupied
    # superbrick flat indices by key = page_id * 64 + bit
    gz, gy, gx = np.nonzero(occ_sb)                       # [z,y,x] grid
    page_id = ((gx >> 2).astype(np.int64) + (gy >> 2).astype(np.int64) * p
               + (gz >> 2).astype(np.int64) * p * p)
    bit = (gx & 3) | ((gy & 3) << 2) | ((gz & 3) << 4)
    key = page_id * 64 + bit
    order = np.argsort(key, kind="stable")
    sb_flat = (gx.astype(np.int64) + gy.astype(np.int64) * g
               + gz.astype(np.int64) * g * g)[order]      # x-major sb rows

    words = pack_superbricks(occ)                         # (g^3, 16)
    h = size // 2
    occ2 = occ.reshape(h, 2, h, 2, h, 2).any(axis=(1, 3, 5))
    sub = _pack_node_masks(occ2)                          # (g^3, 2)
    # pool capacity rounds up to a power of two (min 512): the kernel
    # gathers by row index and never reads past n_pool, so padding is
    # free semantically, and a quantized shape means different scenes of
    # the same world size share one jit specialization (test-suite
    # compile collapse; also fewer recompiles across edit sessions)
    cap = 512
    while cap < n_pool:
        cap *= 2
    brows = np.zeros((cap, POOL_WORDS), np.uint32)
    brows[:n_pool, 0:16] = words[sb_flat]
    brows[:n_pool, 16:18] = sub[sb_flat]
    return PagedGrid(jnp.asarray(prows), jnp.asarray(brows), true_size)
