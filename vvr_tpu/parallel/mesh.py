"""Multi-chip scaling — shard pixel-row bands over a device mesh.

The reference is single-GPU (SURVEY.md §2.4); the TPU build scales the
same workload across chips as data parallelism over pixel rows: the scene
(acceleration rows + faces + sun grids + sky textures) is replicated — it
is small (a 256^3 jump grid is ~4 MiB) — and the ray batch is sharded
along the first axis, which in row-major pixel order makes each shard a
contiguous band of image rows.

The FLAGSHIP composition (the one bench.py measures — rasterized primary
visibility + sun-space shadow classifier + DDA residue) shards by
per-band rasterization inside `jax.shard_map`: each device bbox-clips the
replicated face set to its band and rasterizes only that band's tile
entries (ops/rastertrace.py band mode), classifies its own shadow lanes,
and runs the compaction-cascade DDA on its local residue. Fragment floats
depend only on global pixel coordinates, so the banded frame is
bit-identical to the single-chip frame (tests/test_parallel.py pins it).

There are no collectives in the per-band hot loop; the only cross-device
traffic is the row-sharded HDR image flowing into the post pass (bloom's
mip chain reads across band edges — XLA inserts the halo/gather
collectives, which ride ICI).
"""

from __future__ import annotations

import functools

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
                         svt_density=None, mirror_materials: bool = False,
                         raster=None, sunmask=None, lights=None):
    """The full frame jitted over the mesh: pixel rows DP-sharded, scene
    replicated. With `raster`/`sunmask` this is the FLAGSHIP composition
    (per-band rasterization + sun classifier + local DDA residue);
    without them it is the ray-order frame. Returns (u8 image, hdr),
    bit-identical to render_frame on one chip."""
    from vvr_tpu.ops import post as post_ops
    from vvr_tpu.ops import sky as sky_ops
    from vvr_tpu.render.frame import raytrace_pass

    ndev = mesh.devices.size
    rh, rw = cfg.render_height, cfg.render_width
    if rh % ndev != 0:
        raise ValueError(f"render height {rh} not divisible by mesh size "
                         f"{ndev}")
    band_h = rh // ndev

    pyr = replicate(mesh, pyr)
    raster = replicate(mesh, raster)
    sunmask = replicate(mesh, sunmask)
    svt_density = replicate(mesh, svt_density)
    lights = replicate(mesh, lights)
    o, d = shard_rays(mesh, o, d)
    sun = jax.device_put(jnp.asarray(sun), NamedSharding(mesh, P()))
    time = jnp.float32(time)

    @functools.partial(jax.jit, static_argnames=())
    def frame(pyr, o, d, sun, time, svt_density, lights, raster, sunmask):
        clouds_tex = sky_ops.write_clouds(sun[:3], time,
                                          cfg.clouds_resolution)
        skybox = sky_ops.write_skybox(sun[:3], time, cfg.skybox_resolution)

        def band_fn(pyr_b, o_b, d_b, sun_b, time_b, sky_b, clouds_b,
                    svt_b, lights_b, raster_b, sunmask_b):
            j0 = jax.lax.axis_index("rays") * band_h
            (r, g, b), alpha, _dbg = raytrace_pass(
                pyr_b, o_b, d_b, sky_b, clouds_b, sun_b, time_b, cfg,
                svt_density=svt_b, mirror_materials=mirror_materials,
                lights=lights_b, raster=raster_b, sunmask=sunmask_b,
                band=(j0, band_h))
            return r, g, b, alpha

        r, g, b, alpha = jax.shard_map(
            band_fn, mesh=mesh,
            in_specs=(P(), P("rays"), P("rays"), P(), P(), P(), P(), P(),
                      P(), P(), P()),
            out_specs=(P("rays"), P("rays"), P("rays"), P("rays")),
            check_vma=False,
        )(pyr, o, d, sun, time, skybox, clouds_tex, svt_density, lights,
          raster, sunmask)

        hdr_p = jnp.stack([r.reshape(rh, rw),
                           g.reshape(rh, rw),
                           b.reshape(rh, rw),
                           alpha.reshape(rh, rw)], 0)
        if cfg.bloom_enabled:
            bloom2 = post_ops.bloom_pyramid_p(hdr_p)
        else:
            bloom2 = jnp.zeros((4, max(rh >> 2, 1), max(rw >> 2, 1)),
                               jnp.float32)
        img = post_ops.composite_p(hdr_p, bloom2, cfg.height, cfg.width,
                                   cfg.bloom_strength, cfg.bloom_enabled)
        return img, jnp.transpose(hdr_p, (1, 2, 0))

    return frame(pyr, o, d, sun, time, svt_density, lights, raster,
                 sunmask)
