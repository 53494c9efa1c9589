"""Round-5: profile the REAL Renderer frame (sky cache passed as traced
args — profile_frame_r4.py closed over the sky textures, turning them
into jit constants, which places them differently and skews the gather
costs). Prints the ranked per-op table.

Usage: python tools/profile_frame_r5.py [W H]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def rank(trace_dir: str, top: int = 40):
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        data = json.load(fh)
    evs = []
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        args = e.get("args", {}) or {}
        if "long_name" not in args and "hlo_op" not in args:
            continue
        evs.append((e["dur"] / 1e3, e["name"],
                    (args.get("long_name") or "")[:150]))
    evs.sort(reverse=True)
    tot = sum(d for d, _, _ in evs)
    print(f"total attributed {tot:.1f} ms over {len(evs)} ops", flush=True)
    acc = 0.0
    for d, n, ln in evs[:top]:
        acc += d
        print(f"{d:7.2f}  {acc:7.1f}  {n:26s} {ln}", flush=True)


def main():
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera

    W = int(sys.argv[1]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    cfg = RenderConfig(width=W, height=H, shadow_samples=1,
                       max_ray_iterations=3)
    r = Renderer(WorldConfig(depth=4), cfg)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    r.render(cam, timed=True)
    t0 = time.monotonic()
    r.render(cam, timed=True)
    print(json.dumps({"wall_ms": round((time.monotonic() - t0) * 1e3, 1)}),
          flush=True)
    td = "/tmp/jaxtrace_r5_renderer"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        img = r.render(cam, timed=True)
        np.asarray(img[-1, -1])
    rank(td)


if __name__ == "__main__":
    main()
