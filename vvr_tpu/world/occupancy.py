"""Occupancy bit layouts — the single source of truth (VERDICT r2 weak #7).

Two packed-occupancy layouts exist in the framework, and every decoder
lives here so a future layout change happens in ONE place:

* brick-pyramid node rows (world/pyramid.py): a 4^3 cell's any-bits as a
  (lo, hi) u32 pair; bit = x | y<<2 | z<<4 within the node — the
  reference's child index layout (/root/reference/src/voxel/util.rs:32-38,
  shaders/ray_stuff_other.slang:197-198). Level-1 any-bits ARE voxels.

* jump-grid rows (world/jumpgrid.py): an 8^3 superbrick's 512-bit voxel
  occupancy as 16 u32 words; word = 2*lz + (ly>>2), bit = lx + 8*(ly&3).

Consumers: ops/traverse.solid_at, ops/overlap.pyramid_is_solid,
ops/jump (in-brick stepper), ops/sunshadow._near_segment.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32


# ---- (lo, hi) u32-pair 64-bit masks (pyramid node rows) ----

def node_bit(x, y, z):
    """Bit index of local coords within a 4^3 node: x | y<<2 | z<<4."""
    return ((x & 3) | ((y & 3) << 2) | ((z & 3) << 4)).astype(I32)


def bit64(lo, hi, bit):
    """Test bit (0..63) of a (lo, hi) u32 pair."""
    word = jnp.where(bit >= 32, hi, lo)
    return ((word >> (bit & 31).astype(U32)) & U32(1)) == 1


def pyramid_voxel_solid(pyr, v):
    """Occupancy of integer voxel coords v ((..., 3), already in range) —
    one level-1 node-row gather + bit test."""
    g = pyr.size >> 2
    addr = (I32(pyr.bases[1]) + (v[..., 0] >> 2) + (v[..., 1] >> 2) * g
            + (v[..., 2] >> 2) * g * g)
    row = jnp.take(pyr.rows_any, addr, axis=0, mode="clip")
    return bit64(row[..., 0], row[..., 1],
                 node_bit(v[..., 0], v[..., 1], v[..., 2]))


# ---- 16-word 512-bit masks (jump-grid superbrick rows) ----

def brick_word_index(lx, ly, lz):
    """(word 0..15, shift 0..31) of local coords within an 8^3 brick."""
    return 2 * lz + (ly >> 2), (lx + ((ly & 3) << 3)).astype(U32)


def sel16(words, w):
    """words[w] via a 4-level binary select tree (words: sequence of 16
    (N,) u32 vectors). Separate contiguous vectors, NOT an (N, 16) array —
    column reads of an interleaved array are strided vector loads,
    measured to dominate the sub-step cost (PROGRESS.md)."""
    b0, b1, b2, b3 = (w & 1) == 0, (w & 2) == 0, (w & 4) == 0, (w & 8) == 0
    a = [jnp.where(b0, words[2 * k], words[2 * k + 1]) for k in range(8)]
    b = [jnp.where(b1, a[2 * k], a[2 * k + 1]) for k in range(4)]
    c = [jnp.where(b2, b[2 * k], b[2 * k + 1]) for k in range(2)]
    return jnp.where(b3, c[0], c[1])


def brick_solid(words, lx, ly, lz):
    """Voxel bit of local coords from a brick's 16 occupancy words."""
    w, sh = brick_word_index(lx, ly, lz)
    return ((sel16(words, w) >> sh) & U32(1)) == 1
