"""A/B the raster tile shape (tkx, tky) at bench scale on TPU.

The fragment vector is (CH, tkx*tky): its minor axis fills tkx*tky/128 of
each vreg, so 4x4 tiles run the chunk body at 12.5% lane utilization while
16x8 runs full-width — but small faces pay a whole tile of coverage lanes
either way, so wider tiles also inflate wasted fragments. Measure, don't
guess. Winners are bit-identical across shapes (u32 scatter-min is
order-free); this also asserts that.

Run on TPU: python tools/ab_raster_tile.py
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vvr_tpu.config import WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.ops.rastertrace import trace_raster
from vvr_tpu.ops.traverse import solid_at
from vvr_tpu.utils.camera import Camera
from vvr_tpu.world.faces import extract_merged_faces
from vvr_tpu.world.generator import assemble_dense, generate_world
from vvr_tpu.world.pyramid import build_brick_pyramid


def timeit(fn, reps=5):
    r = fn()
    jax.block_until_ready(r)
    np.asarray(r.t.ravel()[0])
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn()
        jax.block_until_ready(r)
        np.asarray(r.t.ravel()[0])
    return (time.monotonic() - t0) / reps * 1e3, r


def main():
    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    size = wcfg.size
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    W, H = 1920, 1080
    _, d = camera_rays(cam, W, H)
    fdt = extract_merged_faces(occ).device_tuple()
    pyr = build_brick_pyramid(occ)
    right, up, fwd = cam.basis()
    th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    ct = (jnp.asarray(cam.position, jnp.float32),
          jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
          jnp.asarray(fwd, jnp.float32), jnp.float32(th))
    probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))

    ref = None
    for tkx, tky in [(4, 4), (8, 4), (8, 8), (16, 8), (32, 4), (16, 16)]:
        def run(tkx=tkx, tky=tky):
            return trace_raster(fdt, ct, d, probe, size, W, H,
                                tkx=tkx, tky=tky)
        ms, res = timeit(run)
        h = np.asarray(res.hit)
        t = np.asarray(res.t)
        if ref is None:
            ref = (h, t, np.asarray(res.face), np.asarray(res.axis_coord))
            eq = True
        else:
            eq = (np.array_equal(ref[0], h) and np.array_equal(ref[1], t)
                  and np.array_equal(ref[2], np.asarray(res.face))
                  and np.array_equal(ref[3], np.asarray(res.axis_coord)))
        print(json.dumps({"tile": f"{tkx}x{tky}", "ms": round(ms, 2),
                          "equal_to_4x4": bool(eq)}), flush=True)


if __name__ == "__main__":
    main()
