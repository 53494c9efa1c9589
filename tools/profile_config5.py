"""Profile CONFIG 5 (1024^3 dynamic world, 1080p) exactly as bench_scale
runs it, with a selectable traversal. Prints per-op / per-scope device
sums from a jax.profiler trace — the decomposition the config-5 attack
is sized from (paged measured 6491 ms vs round-3 jump 3455 ms).

Usage (TPU host, one variant per process):
    python tools/profile_config5.py [paged|jump|pyramid]
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


def main(traversal: str):
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                       max_ray_iterations=3, traversal=traversal)
    t0 = time.monotonic()
    r = Renderer(WorldConfig(depth=5), cfg, dynamic_world=True)
    print("setup s:", round(time.monotonic() - t0, 1), flush=True)
    cam = Camera.look_at([512.0, 400.0, 80.0], [512.0, 80.0, 720.0],
                         fov=85.0)
    for i in range(2):
        r.render(cam, time=i / 60.0, timed=True)
    t0 = time.monotonic()
    r.render(cam, time=0.05, timed=True)
    print("wall ms:", round((time.monotonic() - t0) * 1e3, 1), flush=True)
    td = f"/tmp/jaxtrace_config5_{traversal}"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        r.render(cam, time=0.07, timed=True)
    analyze(td, f"config5_{traversal}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "paged")
