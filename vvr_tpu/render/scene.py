"""Scene — owns the world's device-resident structures.

The analog of the resources InternalApp holds (src/renderer.rs:33-104): the
occupancy pyramid (traversal), the SVO buffers (parity/checkpoint artifact),
the SVT density field (AO), and the animated point lights
(src/renderer.rs:290-303,494-505; 100 lights, xorshift-seeded)."""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from vvr_tpu.config import WorldConfig
from vvr_tpu.world import cache as cache_mod
from vvr_tpu.world.chunk import Chunk
from vvr_tpu.world.generator import assemble_dense, generate_world
from vvr_tpu.world.pyramid import (BrickPyramid, brick_pyramid_from_chunks,
                                   build_pyramid_from_chunks)
from vvr_tpu.world.svt import density_from_occupancy
from vvr_tpu.world.tree import (SparseVoxelTree, bounds_pyramid_from_chunks,
                                flatten_tree)

log = logging.getLogger(__name__)

NUM_LIGHTS = 100  # src/renderer.rs:290


@dataclasses.dataclass
class Scene:
    cfg: WorldConfig
    chunks: list
    pyramid: BrickPyramid    # hierarchical traversal structure (ops/traverse.py)
    tree: SparseVoxelTree
    density: object          # jnp u8 (S,S,S) or None
    lights: np.ndarray       # (NUM_LIGHTS, 4) f32
    jumpgrid: object = None  # flat traversal structure (ops/jump.py) or None
    jumpgrid2: object = None  # two-tier variant (ops/jump2.py) or None
    paged: object = None     # paged two-level grid (ops/paged.py) or None
    faces: object = None     # device face arrays for ops/rastertrace.py
    epoch: int = 0           # world version: bump on ANY occupancy change
                             # (WorldEditor sync) — cache keys (sun grids)
                             # include it so derived structures invalidate
    _chunk_index: dict | None = None  # solid_at_host lookup cache

    def ensure_pyramid(self):
        """Build the brick pyramid lazily. At paged-grid scales (1024^3)
        the pyramid is 260 MB of redundant structure the frame never
        reads — build_scene(with_pyramid=False) skips it and the few
        non-hot consumers (raster debug path, overlap AO) call this."""
        if self.pyramid is None:
            self.pyramid = brick_pyramid_from_chunks(self.chunks,
                                                     self.cfg.size)
        return self.pyramid

    def solid_at_host(self, p) -> bool:
        """Host-side point occupancy (the camera-inside-solid probe the
        rasterizer needs — ops/rastertrace.py). Chunk-dict lookup; no
        device structure required (at 1024^3 the device pyramid existed
        only for this one probe)."""
        from vvr_tpu.world.chunk import CHUNK_SIZE
        s = self.cfg.size
        x, y, z = (int(min(max(np.floor(c), 0), s - 1)) for c in p)
        if self._chunk_index is None:
            self._chunk_index = {tuple(int(v) for v in c.position): c
                                 for c in self.chunks}
        c = self._chunk_index.get((x // CHUNK_SIZE, y // CHUNK_SIZE,
                                   z // CHUNK_SIZE))
        if c is None:
            return False
        return bool(c.voxels[z % CHUNK_SIZE, y % CHUNK_SIZE,
                             x % CHUNK_SIZE])

    def ensure_tree(self):
        """Build the reference-layout SVO buffers lazily (a parity /
        checkpoint artifact — the render path never reads it, and the
        flatten measurably stalls under the remote-TPU tunnel env)."""
        if self.tree is None:
            occ_pyr = build_pyramid_from_chunks(self.chunks, self.cfg.size)
            self.tree = flatten_tree(
                occ_pyr, bounds_pyramid_from_chunks(self.chunks,
                                                    self.cfg.size))
            log.info("tree: %s", self.tree.metrics)
        return self.tree

    def ensure_jumpgrid(self):
        """Build the jump grid lazily (needs the dense occupancy once)."""
        if self.jumpgrid is None:
            from vvr_tpu.world.jumpgrid import build_jump_grid
            self.jumpgrid = build_jump_grid(
                assemble_dense(self.chunks, self.cfg.size))
        return self.jumpgrid

    def ensure_jumpgrid2(self):
        """Build the two-tier jump grid lazily (traversal="jump2")."""
        if getattr(self, "jumpgrid2", None) is None:
            from vvr_tpu.world.jumpgrid import build_jump_grid2
            self.jumpgrid2 = build_jump_grid2(
                assemble_dense(self.chunks, self.cfg.size))
        return self.jumpgrid2

    def ensure_paged(self):
        """Build the paged two-level grid lazily (traversal="paged" or
        auto at >512^3 — world/paged.py)."""
        if getattr(self, "paged", None) is None:
            from vvr_tpu.world.paged import build_paged_grid
            self.paged = build_paged_grid(
                assemble_dense(self.chunks, self.cfg.size))
        return self.paged

    def ensure_faces(self):
        """Exposed-face arrays (greedy-merged rectangles) for the
        primary-ray rasterizer and the sun-shadow classifier."""
        if self.faces is None:
            from vvr_tpu.world.faces import extract_merged_faces
            fs = extract_merged_faces(
                assemble_dense(self.chunks, self.cfg.size))
            self.faces = fs.device_tuple()
        return self.faces

    @property
    def size(self) -> int:
        return self.cfg.size

    def animate_lights(self, camera_position, elapsed: float, delta: float):
        """CPU light animation (src/renderer.rs:494-505): each light lerps
        toward a point on a rotating disk around the camera."""
        rng = np.random.default_rng(421)  # seed parity (renderer.rs:494)
        axes = rng.random((NUM_LIGHTS, 3)).astype(np.float32) - 0.5
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        c, s = np.cos(elapsed), np.sin(elapsed)
        # Rodrigues rotation of unit_x around each axis by `elapsed`
        ux = np.array([1.0, 0.0, 0.0], np.float32)
        k = axes
        rot = (ux[None] * c
               + np.cross(k, ux[None]) * s
               + k * (k @ ux)[:, None] * (1 - c))
        target = np.asarray(camera_position, np.float32)[None] + rot * 5.0
        t = min(max(delta, 0.0), 1.0)
        self.lights[:, :3] += (target - self.lights[:, :3]) * t


def build_scene(cfg: WorldConfig, force_regenerate: bool = False,
                cache_path=None, with_density: bool = True,
                with_tree: bool = False, with_pyramid: bool = True) -> Scene:
    """create_sparse_structures analog (src/voxel.rs:20-125): load the cached
    world or generate + cache it, then build device structures."""
    path = cache_path or cache_mod.default_cache_path(cfg.size)
    chunks = None
    if not force_regenerate:
        chunks = cache_mod.load_world(path)
        if chunks is not None:
            log.info("world cache hit: %s (%d chunks)", path, len(chunks))
    if chunks is None:
        log.info("generating world (size %d)...", cfg.size)
        chunks = generate_world(cfg)
        try:
            cache_mod.save_world(path, chunks, cfg.size)
        except OSError as e:  # pragma: no cover
            log.warning("could not write world cache: %s", e)

    pyramid = brick_pyramid_from_chunks(chunks, cfg.size) \
        if with_pyramid else None
    tree = None
    if with_tree:
        occ_pyr = build_pyramid_from_chunks(chunks, cfg.size)
        tree = flatten_tree(occ_pyr, bounds_pyramid_from_chunks(chunks, cfg.size))
        log.info("tree: %s", tree.metrics)
    density = None
    if with_density:
        density = density_from_occupancy(assemble_dense(chunks, cfg.size))

    rng = np.random.default_rng(421)
    lights = (rng.random((NUM_LIGHTS, 4)).astype(np.float32) * cfg.size)
    return Scene(cfg, chunks, pyramid, tree, density, lights)
