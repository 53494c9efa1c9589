"""Diagnose the config4-shaped masked-vs-DDA frame mismatch (9/18432
pixels off by one u8 step): logic bug or XLA program-shape fusion wobble?
Prints HDR diff stats — a wobble shows |hdr| diffs at the 1e-6 scale on
quantization-boundary pixels; a shadow/AO logic bug shows O(0.1) diffs.

Usage: JAX_PLATFORMS=cpu python tools/check_config4_wobble.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.render.frame import render_frame
from vvr_tpu.render.renderer import Renderer
from vvr_tpu.render.scene import build_scene
from vvr_tpu.utils.camera import Camera
from vvr_tpu.world.generator import assemble_dense
from vvr_tpu.world.svt import density_from_occupancy


def main():
    wcfg = WorldConfig(depth=3)
    scene = build_scene(wcfg, with_density=False)
    # mirror the pytest fixture EXACTLY: occ/dens from a FRESH
    # generate_world (the small_world fixture), scene from build_scene
    # (which loads the assets cache) — the failing test mixes the two
    from vvr_tpu.world.generator import generate_world
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    dens = density_from_occupancy(occ)
    occ_scene = assemble_dense(scene.chunks, scene.size)
    import numpy as _np
    print("worlds equal:", bool((_np.asarray(occ) ==
                                 _np.asarray(occ_scene)).all()))
    cam = Camera.look_at([32.0, 45.0, 6.0], [32.0, 10.0, 40.0], fov=85.0)
    base = dict(width=96, height=64, shadow_samples=4,
                max_ray_iterations=3, skybox_resolution=32,
                clouds_resolution=32, ambient_occlusion=True,
                traversal="jump")
    r_mask = Renderer(wcfg, RenderConfig(**base, sun_mask="auto"),
                      scene=scene)
    r_dda = Renderer(wcfg, RenderConfig(**base, sun_mask="off"),
                     scene=scene)
    grid = scene.ensure_jumpgrid()
    o, d = camera_rays(cam, 96, 64)
    sun = jnp.asarray(r_mask.sun)
    sunmask = r_mask._sunmask()
    kw = dict(svt_density=dens, mirror_materials=True)
    img_m, hdr_m = render_frame(grid, o, d, sun, jnp.float32(0.0),
                                r_mask.cfg, sunmask=sunmask, **kw)
    img_d, hdr_d = render_frame(grid, o, d, sun, jnp.float32(0.0),
                                r_dda.cfg, **kw)
    hm, hd = np.asarray(hdr_m), np.asarray(hdr_d)
    im, idd = np.asarray(img_m).astype(int), np.asarray(img_d).astype(int)
    d8 = np.abs(im - idd)
    dh = np.abs(hm - hd)
    bad = np.argwhere(d8.max(-1) > 0)
    print("u8 diff pixels:", (d8.max(-1) > 0).sum(), "max:", d8.max())
    print("hdr max abs diff:", dh.max(),
          "rel:", (dh / np.maximum(np.abs(hd), 1e-6)).max())
    print("hdr diff at u8-bad pixels:",
          [float(dh[y, x].max()) for y, x in bad[:10]])
    print("hdr vals there:",
          [float(np.abs(hd[y, x]).max()) for y, x in bad[:10]])


if __name__ == "__main__":
    main()
