"""Jump grid — superbrick occupancy + chebyshev distance, one row per 8^3.

The flat-traversal acceleration structure for ops/jump.py, replacing the
reference's recursive SVO descent (shaders/ray_stuff_other.slang:111-308)
with a TPU-shaped design: the world is a (S/8)^3 grid of 8^3-voxel
"superbricks"; each grid cell has ONE 128-byte row holding

  words[0:16] : the superbrick's 512-bit voxel occupancy
                (word = 2*lz + (ly>>2), bit = lx + 8*(ly&3))
  words[16]   : chebyshev distance (in superbricks) to the nearest
                non-empty superbrick; 0 = this superbrick is non-empty
  words[17:19]: 64-bit any-mask of the brick's 4^3 grid of 2^3-voxel
                subcells (bit = cx | cy<<2 | cz<<4) — lets the in-brick
                DDA cross empty 2^3 regions in one step
  words[19:24]: zero padding
  words[24:32]: per-direction-octant jump distances: words[24 + oct]
                (oct = (dx>0) | (dy>0)<<1 | (dz>0)<<2) is the largest d
                such that the axis-aligned box extending d-1 superbricks
                from this one ALONG THE OCTANT ONLY is all-empty. Always
                >= the chebyshev distance (the box is one-sided), so
                rays jump farther — up-going rays (sky misses, shadow
                rays toward the sun) clear the terrain in 1-2 fetches.

Rationale (measured, v5e — tools/microbench_gather.py): a random row gather
from a <=32K-row table costs ~4.9 ns/lane REGARDLESS of row width up to
128 B. One fetch therefore buys the full voxel occupancy of an 8^3 region
plus the safe empty-jump radius — the hierarchical pyramid needs 3-7
dependent 8 B fetches for the same information. Empty space is crossed in
O(1) fetches per jump instead of per-node DDA steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SB = 8          # superbrick edge, voxels
ROW_WORDS = 32  # u32 words per row (128 B)


@jax.tree_util.register_pytree_node_class
class JumpGrid:
    """(G^3, 32) u32 rows, x-major (row = x + y*G + z*G*G), G = size // 8."""

    def __init__(self, rows, size: int):
        self.rows = rows
        self.size = int(size)

    @property
    def gsize(self) -> int:
        return self.size // SB

    def tree_flatten(self):
        return (self.rows,), (self.size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


def chebyshev_distance(occ_sb: np.ndarray, cap: int | None = None) -> np.ndarray:
    """Chebyshev distance (in cells) to the nearest True cell of occ_sb
    [z,y,x]; 0 at True cells. Iterated separable 3-wide min-filter (+1)."""
    g = occ_sb.shape[0]
    cap = g if cap is None else cap
    d = np.where(occ_sb, 0, cap).astype(np.int32)
    for _ in range(cap):
        prev = d
        m = d
        for ax in range(3):
            lo = np.full_like(m, cap)
            hi = np.full_like(m, cap)
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[ax] = slice(1, None)
            sl_hi[ax] = slice(None, -1)
            lo[tuple(sl_hi)] = m[tuple(sl_lo)]
            hi[tuple(sl_lo)] = m[tuple(sl_hi)]
            m = np.minimum(m, np.minimum(lo, hi))
        d = np.minimum(d, m + 1)
        d = np.where(occ_sb, 0, d)
        if (d == prev).all():
            break
    return d


def _shift_fill(a: np.ndarray, off: tuple, fill: int) -> np.ndarray:
    """a sampled at v + off ([z,y,x] offsets), out-of-grid -> fill."""
    out = np.full_like(a, fill)
    src = []
    dst = []
    for ax, o in enumerate(off):
        n = a.shape[ax]
        if o >= 0:
            src.append(slice(o, n))
            dst.append(slice(0, n - o))
        else:
            src.append(slice(0, n + o))
            dst.append(slice(-o, n))
    out[tuple(dst)] = a[tuple(src)]
    return out


def octant_distances(occ_sb: np.ndarray, cap: int = 32) -> np.ndarray:
    """(8, G, G, G) int32: for each direction octant, the largest d such
    that the one-sided box {v + c*sign, c in [0, d-1]^3} is all-empty
    (0 at non-empty cells). Recurrence d(v) = 1 + min over the 7 proper
    {0,1}^3*sign neighbors, iterated to fixpoint; out-of-grid counts as
    empty so rays jump cleanly out of the world."""
    g = occ_sb.shape[0]
    cap = min(cap, g)
    out = np.zeros((8,) + occ_sb.shape, np.int32)
    offs = [(cz, cy, cx) for cz in (0, 1) for cy in (0, 1) for cx in (0, 1)
            if (cx, cy, cz) != (0, 0, 0)]
    for oct_ in range(8):
        sx = 1 if (oct_ & 1) else -1
        sy = 1 if (oct_ & 2) else -1
        sz = 1 if (oct_ & 4) else -1
        d = np.where(occ_sb, 0, cap).astype(np.int32)
        for _ in range(cap):
            prev = d
            m = np.full_like(d, cap)
            for (cz, cy, cx) in offs:
                np.minimum(m, _shift_fill(d, (cz * sz, cy * sy, cx * sx),
                                          cap), out=m)
            d = np.where(occ_sb, 0, np.minimum(d, np.minimum(m, cap - 1) + 1))
            if (d == prev).all():
                break
        out[oct_] = d
    return out


def pack_superbricks(occ: np.ndarray) -> np.ndarray:
    """bool occ [z,y,x] (S,S,S) -> (G^3, 16) u32 occupancy words with
    word = 2*lz + (ly>>2), bit-in-word = lx + 8*(ly&3)."""
    s = occ.shape[0]
    g = s // SB
    # [gz, lz, gy, ly, gx, lx] -> rows [gz,gy,gx][word bits]
    v = occ.reshape(g, SB, g, SB, g, SB)
    v = v.transpose(0, 2, 4, 1, 3, 5)          # (gz,gy,gx, lz,ly,lx)
    # word = 2*lz + (ly>>2): order bits as (lz, ly>>2, ly&3, lx)
    v = v.reshape(g, g, g, SB, 2, 4, SB)       # lz, lyhi, lylo, lx
    v = v.reshape(g ** 3, SB * 2, 32)          # (rows, word, bit)
    flat = np.ascontiguousarray(v).reshape(g ** 3, 512)
    packed = np.packbits(flat, axis=1, bitorder="little")
    return packed.view(np.uint32)               # (g^3, 16)


@jax.tree_util.register_pytree_node_class
class JumpGrid2:
    """Two-tier jump grid (ops/jump2.py): 16 B jump rows per 8^3 superbrick
    + 8 B minibrick rows per 4^3 voxel region.

    jrows (G^3, 4) u32, x-major, G = size // 8:
      w0, w1: 4^3 subcell any-mask (subcell = 2^3 voxels, bit = cx|cy<<2|cz<<4)
      w2    : 8 per-octant one-sided empty-box radii, 4 bits each (capped 15;
              jumps chain when farther). 0 <=> superbrick non-empty.
      w3    : chebyshev distance (diagnostics)
    mrows (M^3, 2) u32, x-major, M = size // 4: 64-bit voxel occupancy of
      each 4^3 minibrick (bit = x&3 | (y&3)<<2 | (z&3)<<4)."""

    def __init__(self, jrows, mrows, size: int):
        self.jrows = jrows
        self.mrows = mrows
        self.size = int(size)

    @property
    def gsize(self) -> int:
        return self.size // SB

    def tree_flatten(self):
        return (self.jrows, self.mrows), (self.size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


def build_jump_grid2(occ: np.ndarray) -> JumpGrid2:
    """Build the two-tier grid from dense bool occupancy [z,y,x]."""
    from vvr_tpu.world.pyramid import _pack_node_masks
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    assert size % SB == 0, f"size {size} must be a multiple of {SB}"
    g = size // SB
    h = size // 2
    occ2 = occ.reshape(h, 2, h, 2, h, 2).any(axis=(1, 3, 5))  # subcell any
    jrows = np.zeros((g ** 3, 4), np.uint32)
    jrows[:, 0:2] = _pack_node_masks(occ2)      # 4^3 subcells per superbrick
    occ_sb = occ.reshape(g, SB, g, SB, g, SB).any(axis=(1, 3, 5))
    odist = np.minimum(octant_distances(occ_sb), 15).astype(np.uint32)
    packed = np.zeros((g, g, g), np.uint32)
    for oct_ in range(8):
        packed |= odist[oct_] << np.uint32(4 * oct_)
    jrows[:, 2] = packed.ravel()
    jrows[:, 3] = chebyshev_distance(occ_sb).ravel().astype(np.uint32)
    mrows = _pack_node_masks(occ)               # (M^3, 2), M = size // 4
    return JumpGrid2(jnp.asarray(jrows), jnp.asarray(mrows), size)


def build_jump_grid(occ: np.ndarray) -> JumpGrid:
    """Build from dense bool occupancy [z,y,x]; size must be a multiple of 8."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    assert size % SB == 0, f"size {size} must be a multiple of {SB}"
    g = size // SB
    words = pack_superbricks(occ)               # (g^3, 16)
    occ_sb = occ.reshape(g, SB, g, SB, g, SB).any(axis=(1, 3, 5))
    dist = chebyshev_distance(occ_sb)           # [z,y,x]
    rows = np.zeros((g ** 3, ROW_WORDS), np.uint32)
    rows[:, :16] = words
    rows[:, 16] = dist.ravel().astype(np.uint32)  # x-major: [z,y,x].ravel()
    # 2^3-subcell any-masks: reduce to the (S/2)^3 grid, pack each brick's
    # 4^3 subcells as a u64 (lo, hi) pair with bit = cx | cy<<2 | cz<<4
    # (pyramid._pack_node_masks packs exactly that shape)
    from vvr_tpu.world.pyramid import _pack_node_masks
    h = size // 2
    occ2 = occ.reshape(h, 2, h, 2, h, 2).any(axis=(1, 3, 5))
    rows[:, 17:19] = _pack_node_masks(occ2)
    odist = octant_distances(occ_sb)            # (8, g, g, g)
    for oct_ in range(8):
        rows[:, 24 + oct_] = odist[oct_].ravel().astype(np.uint32)
    return JumpGrid(jnp.asarray(rows), size)
