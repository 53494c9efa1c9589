"""Sparse voxel texture (SVT) — page table + brick pool, and its update pass.

The reference keeps a 1024^3 sparse-resident RGBA8 3D image with 64^3 binding
granularity and a 16^3 R8 metadata image marking fully-solid chunks as 255
(src/voxel.rs:164-506; O(1) `is_solid` = metadata==255 || svt==255,
shaders/other.slang:16-25). Vulkan sparse residency becomes the TPU-native
page-table + brick-pool pair (ARCHITECTURE.md): only PARTIAL chunks own an
RGBA8 brick; EMPTY/FULL chunks are page-table codes.

Also implements the per-frame voxel "simulation" pass
(shaders/voxel_interesting_compute.slang:9-35, dispatched one partial chunk
per frame round-robin, src/renderer.rs:581-609): solid voxels (w==255) take
their per-block hash colour; everything else becomes the 3x3x3 neighbourhood
average * 254/255 — a toy cellular blur. Here the whole 64^3 brick updates as
one fused jitted op (jnp.roll neighbourhood sum — no gathers).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.utils.hash import per_block_unique_colour
from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk, ChunkKind

PAGE_EMPTY = -1
PAGE_FULL = -2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseVoxelTexture:
    page_table: jnp.ndarray   # (n,n,n) int32 [z,y,x]: code or brick slot
    metadata: jnp.ndarray     # (n,n,n) uint8: 255 = fully solid chunk
    bricks: jnp.ndarray       # (B, 64, 64, 64, 4) uint8 rgba [z,y,x]
    origins: jnp.ndarray      # (B, 3) int32 world voxel origin per brick

    def tree_flatten(self):
        return (self.page_table, self.metadata, self.bricks, self.origins), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_bricks(self) -> int:
        return self.bricks.shape[0]


def build_svt(chunks: list[Chunk], size: int) -> SparseVoxelTexture:
    """Allocate bricks for partial chunks; initialize alpha=occupancy*255
    (the reference's colour field starts empty — population was disabled,
    src/voxel.rs:116-118 FIXME — we initialize alpha so AO and the update
    pass work out of the box)."""
    n = size // CHUNK_SIZE
    page = np.full((n, n, n), PAGE_EMPTY, np.int32)
    meta = np.zeros((n, n, n), np.uint8)
    bricks = []
    origins = []
    for c in chunks:
        x, y, z = (int(v) for v in c.position)
        if c.kind == ChunkKind.FULL:
            page[z, y, x] = PAGE_FULL
            meta[z, y, x] = 255
        elif c.kind == ChunkKind.PARTIAL:
            page[z, y, x] = len(bricks)
            rgba = np.zeros((CHUNK_SIZE,) * 3 + (4,), np.uint8)
            rgba[..., 3] = c.voxels.astype(np.uint8) * 255
            bricks.append(rgba)
            origins.append(np.array([x, y, z], np.int32) * CHUNK_SIZE)
    if not bricks:
        bricks = [np.zeros((CHUNK_SIZE,) * 3 + (4,), np.uint8)]
        origins = [np.zeros(3, np.int32)]
    return SparseVoxelTexture(
        jnp.asarray(page), jnp.asarray(meta),
        jnp.asarray(np.stack(bricks)), jnp.asarray(np.stack(origins)))


def is_solid(svt: SparseVoxelTexture, pos):
    """Fetcher.is_solid (other.slang:18-25): metadata==255 or voxel w==255.
    pos: (..., 3) int voxel coords (caller clamps to the world)."""
    cp = pos // CHUNK_SIZE
    page = svt.page_table[cp[..., 2], cp[..., 1], cp[..., 0]]
    lp = pos % CHUNK_SIZE
    slot = jnp.maximum(page, 0)
    w = svt.bricks[slot, lp[..., 2], lp[..., 1], lp[..., 0], 3]
    return (page == PAGE_FULL) | ((page >= 0) & (w == 255))


@functools.partial(jax.jit, donate_argnums=(0,))
def svt_update_brick(bricks, slot, origin):
    """The voxel 'interesting' compute pass on one brick
    (voxel_interesting_compute.slang:9-35). Solid voxels (w==255) ->
    per-block hash colour (w stays 255); others -> 3x3x3 mean * 254/255.
    Neighbourhood via stacked rolls (no gathers); chunk-edge semantics use
    clamp-to-brick (the reference reads across the sparse image; bricks are
    independent pages here)."""
    brick = bricks[slot].astype(jnp.float32) / 255.0   # (64,64,64,4)
    solid = bricks[slot, ..., 3] == 255

    zz, yy, xx = jnp.meshgrid(jnp.arange(CHUNK_SIZE), jnp.arange(CHUNK_SIZE),
                              jnp.arange(CHUNK_SIZE), indexing="ij")
    wpos = jnp.stack([xx + origin[0], yy + origin[1], zz + origin[2]], -1)
    colour = per_block_unique_colour(wpos.astype(jnp.float32))
    colorized = jnp.concatenate(
        [colour, jnp.ones_like(colour[..., :1])], -1)

    p = jnp.pad(brick, ((1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = jnp.zeros_like(brick)
    for dz in (0, 1, 2):
        for dy in (0, 1, 2):
            for dxx in (0, 1, 2):
                acc = acc + p[dz:dz + CHUNK_SIZE, dy:dy + CHUNK_SIZE,
                              dxx:dxx + CHUNK_SIZE]
    blurred = (acc / 27.0) * (254.0 / 255.0)

    new = jnp.where(solid[..., None], colorized, blurred)
    new_u8 = jnp.clip(new * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    # keep w==255 for solids exactly (colorized writes 255 already)
    return bricks.at[slot].set(new_u8)


def sample_colour_nearest(svt: SparseVoxelTexture, pos):
    """Nearest RGBA sample in [0,1] at world positions (..., 3) f32 — the
    reference's `svt.Load(block_pos)` diffuse fetch (raytracer.slang:200)."""
    p = jnp.floor(pos).astype(jnp.int32)
    cp = p // CHUNK_SIZE
    page = svt.page_table[cp[..., 2], cp[..., 1], cp[..., 0]]
    lp = p % CHUNK_SIZE
    slot = jnp.maximum(page, 0)
    rgba = svt.bricks[slot, lp[..., 2], lp[..., 1], lp[..., 0]].astype(jnp.float32) / 255.0
    full_col = jnp.concatenate(
        [jnp.zeros_like(rgba[..., :3]), jnp.ones_like(rgba[..., :1])], -1)
    rgba = jnp.where((page == PAGE_FULL)[..., None], full_col, rgba)
    return jnp.where((page == PAGE_EMPTY)[..., None], 0.0, rgba)
