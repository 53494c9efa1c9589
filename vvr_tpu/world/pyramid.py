"""Occupancy mip pyramid — the structure the TPU traversal kernels walk.

TPU-first replacement for the reference's pointer-based SVO buffers
(src/voxel/sparse.rs): instead of bitmask -> popcount -> child-index dependent
fetches (ray_stuff_other.slang:155-224), every pyramid cell is addressed by
pure arithmetic from its (x, y, z, level), so a traversal step is one
vectorized gather. See ARCHITECTURE.md.

Layout: one flat uint32 array.
  level 0 (voxels)      : 1 bit / cell  — bit = any = full
  level l in [1, depth] : 2 bits / cell — bit0 = any voxel below set,
                          bit1 = all voxels below set (reference FULL_NODE,
                          src/voxel/sparse.rs:389)
Cells are x-major (lin = x + y*S + z*S^2, src/voxel/util.rs:8-38), bits packed
little-endian within u32 words; per-level word offsets in `bases`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk


def _pack_bits_u32(bits: np.ndarray) -> np.ndarray:
    """bool (n,) -> little-endian packed uint32 words, padded to word size."""
    bits = np.asarray(bits, bool).ravel()
    pad = (-len(bits)) % 32
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, bool)])
    return np.packbits(bits, bitorder="little").view(np.uint32)


@jax.tree_util.register_pytree_node_class
class OccupancyPyramid:
    """Flat packed pyramid + static addressing metadata (a pytree: `words`
    is the array leaf; depth/bases are static aux data)."""

    def __init__(self, words, depth: int, bases: tuple):
        self.words = words
        self.depth = int(depth)
        self.bases = tuple(int(b) for b in bases)

    @property
    def size(self) -> int:
        return 1 << (2 * self.depth)

    def tree_flatten(self):
        return (self.words,), (self.depth, self.bases)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    # ---- host-side accessors (testing / oracle) ----
    def level_bits(self, level: int) -> tuple[np.ndarray, np.ndarray]:
        """(any, full) bool arrays [z,y,x] for a level (host, for tests)."""
        s = self.size >> (2 * level)
        w = np.asarray(self.words)
        if level == 0:
            n_words = max(1, s ** 3 // 32)
            raw = np.unpackbits(
                w[self.bases[0]:self.bases[0] + n_words].view(np.uint8),
                bitorder="little")[: s ** 3]
            a = raw.astype(bool).reshape(s, s, s)
            return a, a.copy()
        n_words = max(1, s ** 3 * 2 // 32)
        raw = np.unpackbits(
            w[self.bases[level]:self.bases[level] + n_words].view(np.uint8),
            bitorder="little")[: s ** 3 * 2].reshape(-1, 2).astype(bool)
        return (raw[:, 0].reshape(s, s, s), raw[:, 1].reshape(s, s, s))


def _reduce4(a: np.ndarray, op) -> np.ndarray:
    m = a.shape[0] // 4
    return op(a.reshape(m, 4, m, 4, m, 4), axis=(1, 3, 5))


def build_pyramid(occ: np.ndarray) -> OccupancyPyramid:
    """Build from a dense bool occupancy grid [z,y,x] (host NumPy)."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    depth = int(round(np.log2(size) / 2))
    assert (1 << (2 * depth)) == size, f"size {size} must be a power of 4"

    level_words = [_pack_bits_u32(occ)]
    any_l, full_l = occ, occ
    for _ in range(1, depth + 1):
        any_l = _reduce4(any_l, np.ndarray.any)
        full_l = _reduce4(full_l, np.ndarray.all)
        inter = np.stack([any_l.ravel(), full_l.ravel()], axis=-1)
        level_words.append(_pack_bits_u32(inter))

    bases = []
    off = 0
    for w in level_words:
        bases.append(off)
        off += len(w)
    words = np.concatenate(level_words)
    return OccupancyPyramid(jnp.asarray(words), depth, tuple(bases))


def build_pyramid_from_chunks(chunks: list[Chunk], size: int) -> OccupancyPyramid:
    """Build without materializing the dense grid above chunk granularity —
    uses each chunk's prebuilt mips (the 1024^3 world path)."""
    depth = int(round(np.log2(size) / 2))
    n = size // CHUNK_SIZE

    # level 0..3 from chunk mips; chunk mip k has cell size 4^k
    level_words = []
    for k in range(0, 4):
        s = size >> (2 * k)
        cs = CHUNK_SIZE >> (2 * k)
        if k == 0:
            grid = np.zeros((s, s, s), bool)
            for c in chunks:
                x, y, z = (int(v) * cs for v in c.position)
                grid[z:z + cs, y:y + cs, x:x + cs] = c.voxels
            level_words.append(_pack_bits_u32(grid))
            any_top, full_top = grid, grid
        else:
            ga = np.zeros((s, s, s), bool)
            gf = np.zeros((s, s, s), bool)
            for c in chunks:
                x, y, z = (int(v) * cs for v in c.position)
                ga[z:z + cs, y:y + cs, x:x + cs] = c.mips.any_mips[k]
                gf[z:z + cs, y:y + cs, x:x + cs] = c.mips.all_mips[k]
            inter = np.stack([ga.ravel(), gf.ravel()], axis=-1)
            level_words.append(_pack_bits_u32(inter))
            any_top, full_top = ga, gf

    for _ in range(4, depth + 1):
        any_top = _reduce4(any_top, np.ndarray.any)
        full_top = _reduce4(full_top, np.ndarray.all)
        inter = np.stack([any_top.ravel(), full_top.ravel()], axis=-1)
        level_words.append(_pack_bits_u32(inter))

    bases = []
    off = 0
    for w in level_words:
        bases.append(off)
        off += len(w)
    return OccupancyPyramid(jnp.asarray(np.concatenate(level_words)), depth, tuple(bases))


# ---------------------------------------------------------------------------
# Brick pyramid — the traversal-optimized node-table form
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class BrickPyramid:
    """Node tables for the brick traversal (ops/traverse.py).

    For each level l in [1, depth], a dense table of nodes: one row of four
    u32s per level-l cell: [any_lo, any_hi, full_lo, full_hi] — the 64-bit
    any/full masks of its 4x4x4 children (level l-1 cells), child bit index
    x | y<<2 | z<<4 (the reference's u64 node bitmask, src/voxel/sparse.rs +
    ray_stuff_other.slang:155-224, but addressed *densely* by cell coords
    instead of popcount-prefix pointers — address arithmetic replaces the
    pointer chase, see ARCHITECTURE.md). All levels concatenate into one
    (rows, 4) array so a node fetch is ONE 16-byte row gather (measured on
    v5e: a 16B row costs ~1.2x a 4B element).
    """

    def __init__(self, rows, depth: int, bases: tuple, rows_any=None,
                 rows_grp=None, gbases: tuple | None = None):
        self.rows = rows          # (R, 4) uint32
        self.depth = int(depth)
        self.bases = tuple(int(b) for b in bases)  # row offset per level 1..D
        # any-masks only, (R, 2): an 8-byte row gathers ~18% faster than 16B
        # and the full-mask is purely an early-out (identical hit semantics)
        self.rows_any = rows[:, :2] if rows_any is None else rows_any
        # grouped any-masks, (G, 16): one 64-byte row carries the (lo, hi)
        # any-masks of a 2x2x2 *group* of sibling nodes (an 8^3-voxel
        # superbrick at level 1). Measured on v5e: a 64 B row gather from the
        # 32K-row group table costs the same ~4.9 ns as an 8 B gather, so one
        # fetch services every intra-group node transition for free (word
        # layout: [sub*2 + hi], sub = x | y<<1 | z<<2 of the node within the
        # group). gbases[l] = group-row offset of level l.
        self.rows_grp = rows_grp
        self.gbases = tuple(int(b) for b in gbases) if gbases else None

    @property
    def size(self) -> int:
        return 1 << (2 * self.depth)

    def tree_flatten(self):
        return ((self.rows, self.rows_any, self.rows_grp),
                (self.depth, self.bases, self.gbases))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], rows_any=children[1],
                   rows_grp=children[2], gbases=aux[2])


def _pack_node_masks(bits: np.ndarray) -> np.ndarray:
    """bool (n, n, n) child-cell grid [z,y,x] -> (m^3, 2) u32 lo/hi masks of
    each 4x4x4 node, bit = x | y<<2 | z<<4."""
    n = bits.shape[0]
    m = n // 4
    g = bits.reshape(m, 4, m, 4, m, 4)            # (mz,4z,my,4y,mx,4x)
    g = g.transpose(0, 2, 4, 1, 3, 5)             # (mz,my,mx, z4,y4,x4)
    flat = g.reshape(m ** 3, 64)
    packed = np.packbits(flat, axis=1, bitorder="little")  # (m^3, 8) u8
    return packed.view(np.uint32)                 # (m^3, 2) lo, hi


def _group_nodes(any2: np.ndarray) -> np.ndarray:
    """(m^3, 2) per-node u32 (lo, hi) any-masks in x-major cell order ->
    (g^3, 16) rows of 2x2x2 node groups, g = ceil(m/2); word layout
    [sub*2 + hi] with sub = x | y<<1 | z<<2. Odd m (top levels) pads with
    zero nodes (never addressed: cells beyond the grid are unreachable)."""
    m = round(len(any2) ** (1 / 3))
    m = next(mm for mm in (m - 1, m, m + 1) if mm ** 3 == len(any2))
    g = (m + 1) // 2
    cells = any2.reshape(m, m, m, 2)
    if m % 2:
        cells = np.pad(cells, ((0, 1), (0, 1), (0, 1), (0, 0)))
    grp = cells.reshape(g, 2, g, 2, g, 2, 2)          # (gz,2z,gy,2y,gx,2x,w)
    grp = grp.transpose(0, 2, 4, 1, 3, 5, 6)          # (gz,gy,gx, z2,y2,x2,w)
    return np.ascontiguousarray(grp.reshape(g ** 3, 16))


def build_brick_pyramid(occ: np.ndarray) -> BrickPyramid:
    """Build from dense occupancy [z,y,x]."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    depth = int(round(np.log2(size) / 2))
    assert (1 << (2 * depth)) == size

    any_l, full_l = occ, occ
    tables = []
    gtables = []
    for _ in range(1, depth + 1):
        a2 = _pack_node_masks(any_l)
        f2 = _pack_node_masks(full_l)
        tables.append(np.concatenate([a2, f2], axis=1))  # (m^3, 4)
        gtables.append(_group_nodes(a2))
        any_l = _reduce4(any_l, np.ndarray.any)
        full_l = _reduce4(full_l, np.ndarray.all)

    bases = [0]  # index 0 unused (no level-0 table); level l at bases[l]
    gbases = [0]
    off = goff = 0
    for t, gt in zip(tables, gtables):
        bases.append(off)
        gbases.append(goff)
        off += len(t)
        goff += len(gt)
    return BrickPyramid(jnp.asarray(np.concatenate(tables)), depth,
                        tuple(bases),
                        rows_grp=jnp.asarray(np.concatenate(gtables)),
                        gbases=tuple(gbases))


def brick_pyramid_from_chunks(chunks, size: int) -> BrickPyramid:
    """Chunk-based build (no dense grid above chunk granularity for the
    voxel level would need the dense grid anyway for level 1; this path just
    assembles it chunk-wise)."""
    from vvr_tpu.world.generator import assemble_dense
    return build_brick_pyramid(assemble_dense(chunks, size))
