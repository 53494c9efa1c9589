"""Profile CONFIG 4 (256^3, 1080p, 4-bounce mirrors + AO + 4-sample soft
shadows) exactly as tools/bench_scale.py runs it. Prints per-op device
sums from a jax.profiler trace — sizes the bounce-tail attack (measured
4735 ms pre-bshrink, 2026-08-19).

Usage (TPU host): python tools/profile_config4.py
"""
from __future__ import annotations

import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from tools.profile_frame_r4 import analyze
from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.render.renderer import Renderer
from vvr_tpu.utils.camera import Camera


def main():
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=4,
                       max_ray_iterations=4, ambient_occlusion=True)
    t0 = time.monotonic()
    r = Renderer(WorldConfig(depth=4), cfg, mirror_materials=True)
    print("setup s:", round(time.monotonic() - t0, 1), flush=True)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    for i in range(2):
        r.render(cam, time=i / 60.0, timed=True)
    t0 = time.monotonic()
    r.render(cam, time=0.05, timed=True)
    print("wall ms:", round((time.monotonic() - t0) * 1e3, 1), flush=True)
    td = "/tmp/jaxtrace_config4"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        r.render(cam, time=0.07, timed=True)
    analyze(td, "config4", top=45)


if __name__ == "__main__":
    main()
