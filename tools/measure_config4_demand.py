"""Measure per-bounce lane demand for the config-4 frame (256^3, 1080p,
4-bounce mirrors + AO + 4-sample soft shadows) at the benchmark camera.

Sizes every wavefront capacity: the round-4 profile caught the overflow
safety nets EXECUTING in the steady state (cond.32 soft-residue net
1101 ms, cond.44 bounce-ray net 823 ms, jp_net at the batched-residue
width 411 ms — ~2.5 s of the 4.38 s frame), which means the caps sit
BELOW the real demand at this camera. Prints one JSON line of counts.

Usage (TPU host): python tools/measure_config4_demand.py [depth]
"""
from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops import sky as sky_ops
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.render.frame import raytrace_pass
from vvr_tpu.render.renderer import Renderer
from vvr_tpu.utils.camera import Camera


def main(depth: int):
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=4,
                       max_ray_iterations=4, ambient_occlusion=True)
    t0 = time.monotonic()
    r = Renderer(WorldConfig(depth=depth), cfg, mirror_materials=True)
    print("setup s:", round(time.monotonic() - t0, 1), flush=True)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    grid = r.scene.ensure_jumpgrid()
    sun = jnp.asarray(r.sun)
    sunmask = r._sunmask()
    skybox, clouds = r._sky(0.0)
    import numpy as np
    right, up, forward = cam.basis()
    rcam = (jnp.asarray(cam.position, jnp.float32),
            jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
            jnp.asarray(forward, jnp.float32),
            jnp.float32(np.tan(np.radians(cam.fov) / 2.0)))
    probe = jnp.asarray(r.scene.solid_at_host(cam.position))
    from vvr_tpu.world.svt import density_from_occupancy
    from vvr_tpu.world.generator import assemble_dense
    dens = density_from_occupancy(
        assemble_dense(r.scene.chunks, r.scene.size))

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def demand_fn(grid, o, d, sun, cfg, dens, raster, sunmask,
                  skybox, clouds):
        _, _, dbg = raytrace_pass(
            grid, o, d, skybox, clouds, sun, jnp.float32(0.0), cfg,
            svt_density=dens, mirror_materials=True, raster=raster,
            sunmask=sunmask, raster_cap=r._raster_cap(),
            collect_demand=True)
        return dbg["demand"]

    dem = demand_fn(grid, o, d, sun, cfg, dens, (r.scene.faces, rcam,
                    probe), sunmask, skybox, clouds)
    n = cfg.render_width * cfg.render_height
    out = {k: int(v) for k, v in dem.items()}
    out["n"] = n
    caps = {"bounce1_cap": n // 4, "bounce2plus_cap": n // 16,
            "soft_residue_cap1": max(n // 8, 4096),
            "soft_dda_cap": n // 4}
    out.update(caps)
    print(json.dumps(out), flush=True)
    for b in range(4):
        a = out.get(f"b{b}_active")
        if a is None:
            continue
        print(f"bounce {b}: active {a} ({a / n:.3f}n)  "
              f"hit {out.get(f'b{b}_hit', 0)}  "
              f"shadow_active {out.get(f'b{b}_shadow_active', 0)}  "
              f"residue {out.get(f'b{b}_soft_dda_residue', 0)} "
              f"({out.get(f'b{b}_soft_dda_residue', 0) / n:.3f}n)  "
              f"mirror {out.get(f'b{b}_mirror', 0)} "
              f"({out.get(f'b{b}_mirror', 0) / n:.4f}n)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
