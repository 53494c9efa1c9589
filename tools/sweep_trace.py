"""TPU sweep of traversal tuning knobs on the bench scene (256^3, 1080p).

Times the flagship composition (primary rays full-width + packed shadow
rays) for combinations of fetch_every / phase1_groups / cascade schedule,
and reports the survivor curve once so capacities can be retuned by data.

Run ONE at a time on the TPU: python tools/sweep_trace.py [--survivors]
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
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.ops.traverse import trace
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.generator import assemble_dense, generate_world
    from vvr_tpu.world.pyramid import build_brick_pyramid

    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    pyr = build_brick_pyramid(occ)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71], np.float32))
    sun = sun / jnp.linalg.norm(sun)
    print(json.dumps({"n_rays": int(n), "device": str(jax.devices()[0])}),
          flush=True)

    if "--survivors" in sys.argv:
        # survivor curve: actives after each group count (fe=4), grouped mode
        for groups in (2, 4, 6, 8, 10, 14, 18, 24, 32, 48, 64):
            res = trace(pyr, o, d, max_steps=groups * 4, with_stats=True,
                        use_full=False, compact=False)
            # rays still unresolved at the step cap ~ survivors
            unresolved = int(np.asarray(
                (~res.hit & (res.iterations >= groups * 4 - 3)).sum()))
            print(json.dumps({"groups": groups,
                              "active_frac": round(unresolved / n, 4)}),
                  flush=True)
        return

    def flagship(fe, p1, cascade):
        res = trace(pyr, o, d, max_steps=256, with_stats=False,
                    use_full=False, fetch_every=fe, phase1_groups=p1,
                    cascade=cascade)
        hit = res.hit
        sgn = jnp.where(d >= 0, 1.0, -1.0)
        # shadow rays from approximate hit points (composition-faithful)
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace(pyr, s_o, sdir, max_steps=256, active=hit,
                     pack_first=(n * 3) // 4, with_stats=False,
                     use_full=False, fetch_every=fe, phase1_groups=p1,
                     cascade=cascade)
        return res.t.sum() + sres.t.sum()

    import functools
    runs = []
    for fe in (3, 4, 5, 6):
        runs.append((fe, 10, None))
    # cascade variants at the best-guess fe (reordered later by results)
    for casc in (
        ((11, 20, 0), (1, 10, 14), (1, 50, 26)),          # round-1 default
        ((1, 2, 0), (1, 8, 10), (1, 32, 20)),
        ((1, 2, 0), (1, 16, 16), (1, 64, 24)),
        ((2, 5, 0), (1, 16, 12), (1, 64, 20)),
    ):
        runs.append((4, 8, casc))
        runs.append((5, 8, casc))

    fj = jax.jit(flagship, static_argnames=("fe", "p1", "cascade"))
    for fe, p1, casc in runs:
        try:
            np.asarray(fj(fe, p1, casc))  # compile+warm
            ts = []
            for _ in range(4):
                t0 = time.monotonic()
                np.asarray(fj(fe, p1, casc))
                ts.append(time.monotonic() - t0)
            sec = float(np.median(ts))
            mrays = 2 * n / sec / 1e6
            print(json.dumps({"fe": fe, "p1": p1,
                              "cascade": casc, "ms": round(sec * 1e3, 1),
                              "mrays": round(mrays, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"fe": fe, "p1": p1, "cascade": casc,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
