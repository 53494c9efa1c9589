"""Jump grid — superbrick occupancy + chebyshev distance, one row per 8^3.

The flat-traversal acceleration structure for ops/jump.py, replacing the
reference's recursive SVO descent (shaders/ray_stuff_other.slang:111-308)
with a TPU-shaped design: the world is a (S/8)^3 grid of 8^3-voxel
"superbricks"; each grid cell has ONE 128-byte row holding

  words[0:16] : the superbrick's 512-bit voxel occupancy
                (word = 2*lz + (ly>>2), bit = lx + 8*(ly&3))
  words[16]   : chebyshev distance (in superbricks) to the nearest
                non-empty superbrick; 0 = this superbrick is non-empty
  words[17:32]: zero padding (power-of-two row stride)

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
    return JumpGrid(jnp.asarray(rows), size)
