"""Profile the flagship frame EXACTLY as bench.py runs it (Renderer.render
with traced camera/sun/time, sky + sunmask caches engaged).

The earlier profile_frame_r4.py jitted a closure that closed over o/d, so
XLA constant-folded every pixel-only function into huge [2M,1] pred
constants — its select_n attribution does not reflect the bench graph.
Prints the same per-op / per-scope summaries. Run on TPU.
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from tools.profile_frame_r4 import analyze
from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.render.renderer import Renderer
from vvr_tpu.utils.camera import Camera


def main():
    world_cfg = WorldConfig(depth=4)
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                       max_ray_iterations=3)
    r = Renderer(world_cfg, cfg)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    for _ in range(2):
        r.render(cam, timed=True)
    samples = []
    for i in range(5):
        t0 = time.monotonic()
        r.render(cam, time=i / 60.0, timed=True)
        samples.append((time.monotonic() - t0) * 1e3)
    print("wall ms per frame:", [round(s, 1) for s in samples], flush=True)
    td = "/tmp/jaxtrace_bench_r4"
    import shutil
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        r.render(cam, time=0.05, timed=True)
    analyze(td, "bench_frame")


if __name__ == "__main__":
    main()
