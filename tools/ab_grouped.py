"""A/B: grouped 64B-row traversal vs round-1 any-only 8B rows (bench camera).

Run: python tools/ab_grouped.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vvr_tpu.config import WorldConfig
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.ops.traverse import trace
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.generator import assemble_dense, generate_world
    from vvr_tpu.world.pyramid import BrickPyramid, build_brick_pyramid

    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    pyr = build_brick_pyramid(occ)
    pyr_flat = BrickPyramid(pyr.rows, pyr.depth, pyr.bases)  # no rows_grp
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    print(json.dumps({"n": int(n), "dev": str(jax.devices()[0])}), flush=True)

    def run(name, p, use_full, with_stats=False):
        f = jax.jit(lambda oo, dd: trace(
            p, oo, dd, max_steps=256, with_stats=with_stats,
            use_full=use_full).t.sum())
        np.asarray(f(o, d))
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            np.asarray(f(o, d))
            ts.append(time.monotonic() - t0)
        sec = float(np.median(ts))
        print(json.dumps({"mode": name, "ms": round(sec * 1e3, 1),
                          "mrays": round(n / sec / 1e6, 2)}), flush=True)

    run("grouped", pyr, False)
    run("any8B", pyr_flat, False)
    run("full16B", pyr_flat, True)
    run("grouped+stats", pyr, False, True)




def jumpmain():
    import jax
    import jax.numpy as jnp

    from vvr_tpu.config import WorldConfig
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.generator import assemble_dense, generate_world
    from vvr_tpu.world.jumpgrid import build_jump_grid

    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    grid = build_jump_grid(occ)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    print(json.dumps({"n": int(n), "dev": str(jax.devices()[0])}), flush=True)

    import itertools
    for fe, p1 in itertools.product((4, 6, 8), (4, 6, 8)):
        def f(oo, dd, fe=fe, p1=p1):
            return trace_jump(grid, oo, dd, with_stats=False,
                              fetch_every=fe, phase1_groups=p1).t.sum()
        f = jax.jit(f)
        np.asarray(f(o, d))
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            np.asarray(f(o, d))
            ts.append(time.monotonic() - t0)
        sec = float(np.median(ts))
        print(json.dumps({"mode": f"jump fe={fe} p1={p1}",
                          "ms": round(sec * 1e3, 1),
                          "mrays": round(n / sec / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    import sys as _s
    jumpmain() if "--jump" in _s.argv else main()
