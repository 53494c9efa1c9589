"""Profile one flagship trace on TPU and print the op-level time breakdown.

Usage: python tools/profile_trace.py [jump|pyramid] [--frame]
Parses the jax.profiler trace (vm.trace.json.gz) and sums durations by op
category so the optimization target is measured, not guessed.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import sys
import time

import numpy as np


def run(kind: str, frame: bool):
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
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71], np.float32))
    sun = sun / jnp.linalg.norm(sun)

    if kind == "frame":
        from vvr_tpu.config import RenderConfig
        from vvr_tpu.render.renderer import Renderer
        rcfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                            max_ray_iterations=3)
        r = Renderer(wcfg, rcfg)

        class _F:
            def __call__(self):
                img = r.render(cam, time=0.0)
                return img[-1, -1]
        one = _F()
    elif kind == "raster":
        from vvr_tpu.ops.rastertrace import trace_raster
        from vvr_tpu.ops.traverse import solid_at
        from vvr_tpu.world.faces import extract_merged_faces
        fd = extract_merged_faces(occ).device_tuple()
        right, up, fwd = cam.basis()
        th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
        ct = (jnp.asarray(cam.position, jnp.float32),
              jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
              jnp.asarray(fwd, jnp.float32), jnp.float32(th))
        pyr2 = build_brick_pyramid(occ)
        probe = solid_at(pyr2, jnp.asarray(cam.position, jnp.float32))

        def one():
            return trace_raster(fd, ct, d, probe, 256, 1920, 1080).t.sum()
    elif kind == "jump":
        acc = build_jump_grid(occ)

        def one():
            res = trace_jump(acc, o, d, max_steps=2048, with_stats=False)
            sres = trace_jump(acc, o + d * res.t[:, None] + sun[None, :] * .05,
                              jnp.broadcast_to(sun, (n, 3)), max_steps=2048,
                              active=res.hit, pack_first=(n * 3) // 4,
                              with_stats=False)
            return res.t.sum() + sres.t.sum()
    else:
        acc = build_brick_pyramid(occ)

        def one():
            res = trace(acc, o, d, max_steps=256, with_stats=False,
                        use_full=False)
            sres = trace(acc, o + d * res.t[:, None] + sun[None, :] * .05,
                         jnp.broadcast_to(sun, (n, 3)), max_steps=256,
                         active=res.hit, pack_first=(n * 3) // 4,
                         with_stats=False, use_full=False)
            return res.t.sum() + sres.t.sum()

    f = one if kind == "frame" else jax.jit(one)
    np.asarray(f())  # compile + warm
    t0 = time.monotonic()
    np.asarray(f())
    wall = time.monotonic() - t0

    trace_dir = "/tmp/jaxtrace_prof"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        np.asarray(f())
    print(json.dumps({"kind": kind, "wall_ms": round(wall * 1e3, 1),
                      "n_rays": int(n)}), flush=True)
    return trace_dir


def analyze(trace_dir: str):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep only device-lane events (XLA ops); drop host/python rows
    buckets = {}
    scopes = {}
    total = 0.0
    for e in events:
        name = e.get("name", "")
        args = e.get("args", {})
        if "long_name" not in args and "hlo_op" not in args and \
                not re.match(r"^(fusion|copy|gather|scatter|while|"
                             r"dynamic|custom|convert|reduce|select|"
                             r"broadcast|iota|transpose|slice|concatenate|"
                             r"bitcast|add|multiply|compare|and|or|tuple)",
                             name):
            continue
        dur = e["dur"] / 1e3  # us -> ms
        total += dur
        key = re.sub(r"[.\d]+$", "", name)
        buckets[key] = buckets.get(key, 0.0) + dur
        sc = args.get("scope", "") or args.get("tf_op", "")
        if sc:
            scopes[sc] = scopes.get(sc, 0.0) + dur
    top = sorted(buckets.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({"device_total_ms": round(total, 1)}))
    for k, v in top:
        print(f"{v:10.1f} ms  {k}")
    if scopes:
        print("--- by scope ---")
        for k, v in sorted(scopes.items(), key=lambda kv: -kv[1])[:15]:
            print(f"{v:10.1f} ms  {k}")


if __name__ == "__main__":
    kind = next((a for a in sys.argv[1:] if not a.startswith("-")),
                "pyramid")
    td = run(kind, "--frame" in sys.argv)
    analyze(td)
