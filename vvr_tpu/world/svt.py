"""Sparse voxel texture analog — O(1) occupancy/colour lookups + filtered
density sampling.

The reference keeps a sparse-resident 1024^3 RGBA8 3D image with a 16^3
metadata image marking fully-solid chunks (src/voxel.rs:127-506,
shaders/other.slang:16-25). The TPU analog (ARCHITECTURE.md): a page table +
brick pool for the dynamic/colour path (world/bricks.py), plus this dense u8
density field used for the filtered AO sample
(raytracer.slang:274-277: `svt_sampler.Sample((world+offset)/size).w`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32


def density_from_occupancy(occ: np.ndarray) -> jnp.ndarray:
    """Dense u8 density (255 = solid), [z,y,x] — the SVT alpha channel."""
    return jnp.asarray(np.asarray(occ, bool).astype(np.uint8) * 255)


def sample_density_trilinear(density, pos):
    """Trilinear density in [0,1] at world positions (..., 3) — the linear
    SVT sampler (src/voxel.rs:462-493). Clamp-to-edge, texel centers at +0.5."""
    s = density.shape[0]
    p = pos - 0.5
    p0 = jnp.floor(p)
    f = p - p0
    p0 = p0.astype(I32)

    flat = density.reshape(-1)

    def tap(dx, dy, dz):
        x = jnp.clip(p0[..., 0] + dx, 0, s - 1)
        y = jnp.clip(p0[..., 1] + dy, 0, s - 1)
        z = jnp.clip(p0[..., 2] + dz, 0, s - 1)
        # flat 1D gather (multi-axis fancy indexing lowers poorly on TPU)
        return jnp.take(flat, (z * s + y) * s + x,
                        mode="clip").astype(F32) / 255.0

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = tap(0, 0, 0) * (1 - fx) + tap(1, 0, 0) * fx
    c10 = tap(0, 1, 0) * (1 - fx) + tap(1, 1, 0) * fx
    c01 = tap(0, 0, 1) * (1 - fx) + tap(1, 0, 1) * fx
    c11 = tap(0, 1, 1) * (1 - fx) + tap(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def is_solid(density, pos):
    """Point occupancy test (other.slang:18-25 Fetcher.is_solid)."""
    s = density.shape[0]
    p = jnp.clip(jnp.floor(pos).astype(I32), 0, s - 1)
    return density[p[..., 2], p[..., 1], p[..., 0]] == 255
