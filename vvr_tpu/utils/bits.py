"""Bit/index helpers shared by the world model and the kernels.

The reference manipulates u64 child bitmasks (src/voxel/sparse.rs,
shaders/ray_stuff_other.slang:155-224). TPUs have no 64-bit integer lanes, so
u64 quantities are modelled as (lo, hi) u32 pairs everywhere on-device; NumPy
host code uses real uint64.

Index convention (x-major) mirrors the reference (src/voxel/util.rs:8-38):
  linear = x + y*size + z*size*size          (grid indexing)
  child bit within a 4x4x4 node = x | y<<2 | z<<4
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# x-major linear indexing (reference: src/voxel/util.rs:8-38)
# ---------------------------------------------------------------------------

def offset_to_index(xyz, size: int):
    """(x,y,z) -> x + y*size + z*size^2 ; works on numpy or jnp arrays."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return x + y * size + z * size * size


def index_to_offset(index, size: int):
    """Inverse of offset_to_index; returns stacked (..., 3)."""
    mod = index % (size * size)
    x = mod % size
    y = mod // size
    z = index // (size * size)
    if isinstance(index, np.ndarray) or np.isscalar(index):
        return np.stack(np.broadcast_arrays(x, y, z), axis=-1)
    return jnp.stack([x, y, z], axis=-1)


def child_bit_index(local_xyz):
    """Bit index of a child within a 4x4x4 node: x | y<<2 | z<<4
    (reference: src/voxel/util.rs:32-38, ray_stuff_other.slang:197-198)."""
    x, y, z = local_xyz[..., 0], local_xyz[..., 1], local_xyz[..., 2]
    return x | (y << 2) | (z << 4)


# ---------------------------------------------------------------------------
# u64-as-2xu32 on device
# ---------------------------------------------------------------------------

def u64_split(v: np.ndarray):
    """Host: uint64 array -> (lo, hi) uint32 arrays."""
    v = np.asarray(v, dtype=np.uint64)
    return (v & np.uint64(0xFFFFFFFF)).astype(np.uint32), (v >> np.uint64(32)).astype(np.uint32)


def u64_join(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))


def popcount32(v):
    """Vectorized 32-bit popcount (Hacker's Delight), jnp or numpy uint32."""
    m = jnp if isinstance(v, jnp.ndarray) else np
    v = v.astype(U32 if m is jnp else np.uint32)
    c1, c2, c4 = (0x55555555, 0x33333333, 0x0F0F0F0F)
    if m is np:
        c1, c2, c4 = np.uint32(c1), np.uint32(c2), np.uint32(c4)
        v = v - ((v >> np.uint32(1)) & c1)
        v = (v & c2) + ((v >> np.uint32(2)) & c2)
        v = (v + (v >> np.uint32(4))) & c4
        return (v * np.uint32(0x01010101)) >> np.uint32(24)
    v = v - ((v >> 1) & c1)
    v = (v & c2) + ((v >> 2) & c2)
    v = (v + (v >> 4)) & c4
    return (v * U32(0x01010101)) >> 24


def popcount_prefix_u64(lo, hi, bit_index):
    """Number of set bits strictly below `bit_index` in the u64 (lo, hi) —
    the child-offset rule the GPU traversal relies on
    (ray_stuff_other.slang:216-218). Works on jnp u32 arrays, bit in [0,64)."""
    m = jnp
    bit = bit_index.astype(I32)
    # mask for bits < bit within each 32-bit half
    in_lo = bit < 32
    lo_bits = m.where(in_lo, bit, 32)
    hi_bits = m.where(in_lo, 0, bit - 32)
    lo_mask = m.where(lo_bits >= 32, U32(0xFFFFFFFF),
                      (U32(1) << lo_bits.astype(U32)) - U32(1))
    hi_mask = m.where(hi_bits >= 32, U32(0xFFFFFFFF),
                      (U32(1) << hi_bits.astype(U32)) - U32(1))
    return popcount32(lo & lo_mask) + popcount32(hi & hi_mask)


def u64_get_bit(lo, hi, bit_index):
    """Test bit `bit_index` of the u64 (lo, hi); jnp arrays, bit in [0,64)."""
    bit = bit_index.astype(I32)
    word = jnp.where(bit < 32, lo, hi)
    return (word >> (bit & 31).astype(U32)) & U32(1)


# ---------------------------------------------------------------------------
# base-4 trailing alignment (HDDA ascent)
# ---------------------------------------------------------------------------

def base4_trailing_levels(v, max_levels: int):
    """How many trailing base-4 digits of `v` are zero, capped at max_levels.
    Used by the HDDA to ascend to the coarsest pyramid level whose cell
    boundary was crossed (ARCHITECTURE.md)."""
    m = jnp if isinstance(v, jnp.ndarray) else np
    v = v.astype(I32 if m is jnp else np.int32)
    out = m.zeros_like(v)
    ok = m.ones_like(v, dtype=bool)
    cur = v
    for _ in range(max_levels):
        aligned = (cur & 3) == 0
        ok = ok & aligned
        out = out + ok.astype(out.dtype)
        cur = cur >> 2
    return out
