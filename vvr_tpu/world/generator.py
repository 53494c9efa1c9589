"""World generation — FBM terrain, TPU-jitted.

Reference: src/voxel.rs:58-95 — 6-octave Perlin FBM height (freq 0.001,
*700 + 80), terraced to steps of 10, modulated by a 3-octave Billow detail
field (freq 0.01); a voxel is solid iff y < surface(x, z).

The reference evaluates noise per voxel on a rayon thread pool; here the
height field is a single jitted 2D evaluation on the accelerator and the
dense occupancy is a broadcast compare — the terrain is a heightfield, so the
per-voxel loop is redundant work the TPU never does. Terrain parameters scale
with world size so smaller worlds (bench configs) are shrunk versions of the
1024^3 original.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.config import WorldConfig
from vvr_tpu.ops import noise
from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk


@functools.partial(jax.jit, static_argnums=(0,))
def _height_field(cfg: WorldConfig) -> jnp.ndarray:
    """Surface height h(x, z) for every column; (size, size) f32 [z, x]."""
    s = cfg.size
    scale = s / 1024.0  # shrink terrain for small bench worlds
    coords = jnp.arange(s, dtype=jnp.float32)
    x = coords[None, :]
    z = coords[:, None]
    # world-space frequency compensated so features keep their shape
    f = cfg.fbm_frequency / scale
    h = noise.fbm2(x * 1.0, z * 1.0, cfg.fbm_octaves, f, seed=cfg.seed)
    height = h * (cfg.fbm_amplitude * scale) + cfg.fbm_offset * scale

    step = cfg.terrace_step * scale
    stepped = jnp.floor(height / step) * step
    diff = jnp.abs(height - stepped) / (step / 2.0) - 0.5

    detail = noise.fbm2(x * 1.0, z * 1.0, cfg.detail_octaves,
                        cfg.detail_frequency / scale, seed=cfg.seed + 101,
                        billow=True)
    return stepped + (-diff) * detail * (5.0 * scale)


def generate_height_field(cfg: WorldConfig) -> np.ndarray:
    return np.asarray(_height_field(cfg))


def generate_world(cfg: WorldConfig, rebuild: bool = True) -> list[Chunk]:
    """Generate all chunks (reference create_sparse_structures else-branch,
    src/voxel.rs:58-95). Returns chunks in x-major chunk order."""
    surface = generate_height_field(cfg)  # [z, x]
    n = cfg.chunk_count
    ys = np.arange(CHUNK_SIZE, dtype=np.float32)
    chunks = []
    # x-major order to mirror index_to_offset(index, num_chunks)
    for index in range(n ** 3):
        cx = index % n
        cy = (index // n) % n
        cz = index // (n * n)
        hslab = surface[cz * CHUNK_SIZE:(cz + 1) * CHUNK_SIZE,
                        cx * CHUNK_SIZE:(cx + 1) * CHUNK_SIZE]  # [z, x]
        wy = ys + cy * CHUNK_SIZE                                # world y
        # voxels[z, y, x] = wy < h(x, z)
        vox = wy[None, :, None] < hslab[:, None, :]
        chunk = Chunk(np.array([cx, cy, cz]), vox)
        if rebuild:
            chunk.rebuild()
        chunks.append(chunk)
    return chunks


def assemble_dense(chunks: list[Chunk], size: int) -> np.ndarray:
    """Dense bool occupancy (size, size, size) [z,y,x] from chunks."""
    occ = np.zeros((size, size, size), dtype=bool)
    for c in chunks:
        x, y, z = (int(v) * CHUNK_SIZE for v in c.position)
        occ[z:z + CHUNK_SIZE, y:y + CHUNK_SIZE, x:x + CHUNK_SIZE] = c.voxels
    return occ
