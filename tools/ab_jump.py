"""TPU A/B: jump-grid flat traversal vs grouped pyramid HDDA on the
flagship composition (256^3 bench scene, 1080p primary + packed shadows).

Also sweeps the jump kernel's fetch_every / phase1 / cascade knobs, since
its survivor curve (jumps collapse empty space) differs from the pyramid's.

Run ONE at a time on the TPU: python tools/ab_jump.py [--survivors]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vvr_tpu.config import WorldConfig
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.ops.traverse import trace
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.generator import assemble_dense, generate_world
    from vvr_tpu.world.jumpgrid import build_jump_grid
    from vvr_tpu.world.pyramid import build_brick_pyramid

    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    pyr = build_brick_pyramid(occ)
    grid = build_jump_grid(occ)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71], np.float32))
    sun = sun / jnp.linalg.norm(sun)
    print(json.dumps({"n_rays": int(n), "device": str(jax.devices()[0]),
                      "rows_mib": round(grid.rows.nbytes / 2**20, 1)}),
          flush=True)

    if "--survivors" in sys.argv:
        for groups in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
            res = trace_jump(grid, o, d, max_steps=groups * 6,
                             with_stats=True, compact=False)
            unresolved = int(np.asarray(
                (~res.hit & (res.iterations >= groups * 6 - 5)).sum()))
            print(json.dumps({"groups": groups,
                              "active_frac": round(unresolved / n, 4)}),
                  flush=True)
        return

    def flagship_pyr():
        res = trace(pyr, o, d, max_steps=256, with_stats=False,
                    use_full=False)
        hit = res.hit
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace(pyr, s_o, sdir, max_steps=256, active=hit,
                     pack_first=(n * 3) // 4, with_stats=False,
                     use_full=False)
        return res.t.sum() + sres.t.sum()

    def flagship_jump(fe, p1, cascade):
        res = trace_jump(grid, o, d, max_steps=2048, with_stats=False,
                         fetch_every=fe, phase1_groups=p1, cascade=cascade)
        hit = res.hit
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace_jump(grid, s_o, sdir, max_steps=2048, active=hit,
                          pack_first=(n * 3) // 4, with_stats=False,
                          fetch_every=fe, phase1_groups=p1, cascade=cascade)
        return res.t.sum() + sres.t.sum()

    def bench(fn, *args, **kw):
        np.asarray(fn(*args, **kw))
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            np.asarray(fn(*args, **kw))
            ts.append(time.monotonic() - t0)
        sec = float(np.median(ts))
        return round(sec * 1e3, 1), round(2 * n / sec / 1e6, 2)

    fp = jax.jit(flagship_pyr)
    ms, mrays = bench(fp)
    print(json.dumps({"kernel": "pyramid", "ms": ms, "mrays": mrays}),
          flush=True)

    fj = jax.jit(flagship_jump, static_argnames=("fe", "p1", "cascade"))
    runs = [(6, 6, None), (4, 6, None), (8, 6, None), (6, 4, None),
            (6, 8, None)]
    for casc in (
        ((1, 2, 0), (1, 10, 6), (1, 50, 12)),
        ((2, 5, 0), (1, 16, 6), (1, 64, 12)),
        ((1, 2, 0), (1, 8, 4), (1, 32, 10)),
    ):
        runs.append((6, 4, casc))
    for fe, p1, casc in runs:
        try:
            ms, mrays = bench(fj, fe, p1, casc)
            print(json.dumps({"kernel": "jump", "fe": fe, "p1": p1,
                              "cascade": casc, "ms": ms, "mrays": mrays}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": "jump", "fe": fe, "p1": p1,
                              "cascade": casc, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
