"""Measure per-group cost vs width for each traversal kernel on TPU.

For each kernel, times compact=False runs with increasing max_steps caps and
reports the marginal cost per fetch-group at full width, plus the cost of
one pack stage (nonzero+gather+scatter) at 2M width. These numbers make
cascade design arithmetic instead of guesswork.

Run ONE at a time on the TPU: python tools/microbench_steps.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vvr_tpu.config import WorldConfig
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.ops.jump2 import trace_jump2
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.ops.traverse import trace
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.generator import assemble_dense, generate_world
    from vvr_tpu.world.jumpgrid import build_jump_grid, build_jump_grid2
    from vvr_tpu.world.pyramid import build_brick_pyramid

    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    pyr = build_brick_pyramid(occ)
    grid = build_jump_grid(occ)
    grid2 = build_jump_grid2(occ)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    print(json.dumps({"n": int(n), "device": str(jax.devices()[0])}),
          flush=True)

    def timed(f):
        np.asarray(f())
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            np.asarray(f())
            ts.append(time.monotonic() - t0)
        return float(np.median(ts)) * 1e3

    def series(name, fn, fe, caps):
        prev = None
        for cap in caps:
            ms = timed(lambda: fn(cap))
            marg = None if prev is None else round((ms - prev[1])
                                                   / (cap - prev[0]) * fe, 2)
            print(json.dumps({"kernel": name, "max_steps": cap,
                              "ms": round(ms, 1),
                              "ms_per_group_full": marg}), flush=True)
            prev = (cap, ms)

    fj = jax.jit(lambda cap: trace_jump(
        grid, o, d, max_steps=cap, with_stats=False,
        compact=False).hit.sum(), static_argnums=0)
    fj2 = jax.jit(lambda cap: trace_jump2(
        grid2, o, d, max_steps=cap, with_stats=False,
        compact=False).hit.sum(), static_argnums=0)
    fp = jax.jit(lambda cap: trace(
        pyr, o, d, max_steps=cap, with_stats=False, use_full=False,
        compact=False).hit.sum(), static_argnums=0)

    series("jump", fj, 6, (6, 12, 18, 24, 36))
    series("jump2", fj2, 6, (6, 12, 18, 24, 36))
    series("pyramid", fp, 4, (4, 8, 12, 16, 24))

    # one pack stage at full width: nonzero + 10 gathers + scatters
    def pack_once():
        act = d[:, 1] < 0.2  # ~arbitrary mask, similar density to survivors
        idx = jnp.nonzero(act, size=n // 2, fill_value=n)[0]
        safe = jnp.minimum(idx, n - 1)
        vals = [o[safe], d[safe]]
        back = o.at[idx].set(vals[0], mode="drop")
        return back.sum() + vals[1].sum()

    ms = timed(jax.jit(pack_once))
    print(json.dumps({"op": "pack_stage_w2M_cap1M", "ms": round(ms, 1)}),
          flush=True)

    # raw gather cost in context: one fetch-group with fe=2 (1 gather+1 alu)
    fj_fe2 = jax.jit(lambda cap: trace_jump(
        grid, o, d, max_steps=cap, with_stats=False, compact=False,
        fetch_every=2).hit.sum(), static_argnums=0)
    series("jump_fe2", fj_fe2, 2, (2, 4, 8))


if __name__ == "__main__":
    main()
