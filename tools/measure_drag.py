"""Sun-drag frame cost (VERDICT r3 weak #8 ledger entry): a middle-mouse
sun drag pays a per-direction sun-grid rebuild (renderer.py drag grids at
512^2) the reference gets for free. Measure the drag-time frame rate so
it can't silently regress: N frames, each with a slightly different sun
direction (forcing a grid rebuild per frame — the worst case), vs the
static-sun frame rate.

Run on TPU: python tools/measure_drag.py
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera

    cfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                       max_ray_iterations=3)
    r = Renderer(WorldConfig(depth=4), cfg)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)

    def set_sun(i):
        a = 0.9 + 0.003 * i          # small per-frame drag steps
        s = np.array([-0.28 * np.cos(a), 0.65, -0.71 * np.sin(a)],
                     np.float32)
        s /= np.linalg.norm(s)
        r.sun = np.concatenate([s, [0.0]]).astype(np.float32)

    # static-sun baseline
    set_sun(0)
    r.render(cam, timed=True)
    r.render(cam, timed=True)
    t0 = time.monotonic()
    for i in range(6):
        r.render(cam, time=i / 60.0, timed=True)
    static_ms = (time.monotonic() - t0) / 6 * 1e3

    # drag: low-res grids (app.py holds set_sun) + a new sun every frame
    # -> per-direction drag-grid rebuild, the worst case
    r.set_sun_dragging(True)
    set_sun(1)
    r.render(cam, timed=True)  # compile the drag-resolution variant
    t0 = time.monotonic()
    for i in range(6):
        set_sun(2 + i)
        r.render(cam, time=i / 60.0, timed=True)
    drag_ms = (time.monotonic() - t0) / 6 * 1e3
    r.set_sun_dragging(False)

    print(json.dumps({"static_frame_ms": round(static_ms, 1),
                      "drag_frame_ms": round(drag_ms, 1),
                      "drag_overhead_ms": round(drag_ms - static_ms, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
