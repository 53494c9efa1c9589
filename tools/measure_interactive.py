"""Interactive-demo fps measurement (VERDICT r3 next #4): sustained frame
rate with the CAMERA MOVING every frame — shadows on, sky cache and
sun-mask caches engaged — at a demo resolution. The reference is a live
winit window with mouse-look (src/main.rs:89-141); the TPU build's analog
is the headless app loop at a resolution where the measured frame rate is
interactive (>=10 fps).

The camera flies the bench terrain on a slow arc (new position AND look
direction every frame — nothing about the primary pass can be cached),
while the sun stays fixed (the sun-grid cache holds, exactly like the
reference's static sun between middle-mouse drags).

Usage: python tools/measure_interactive.py [width height [frames]]
Prints one JSON line per config; run on the TPU host.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def run(width: int, height: int, frames: int = 60):
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera

    cfg = RenderConfig(width=width, height=height, shadow_samples=1,
                       max_ray_iterations=3)
    r = Renderer(WorldConfig(depth=4), cfg)

    def cam_at(i: int) -> Camera:
        a = i * 0.013
        pos = np.array([128.0 + 24.0 * np.sin(a), 100.0 + 4.0 * np.sin(3 * a),
                        20.0 + 10.0 * a], np.float32)
        tgt = np.array([128.0 + 60.0 * np.sin(a * 0.7), 20.0,
                        180.0], np.float32)
        return Camera.look_at(pos, tgt, fov=85.0)

    # compile + warm (two distinct camera positions so nothing is
    # position-specialized)
    r.render(cam_at(0), time=0.0, timed=True)
    r.render(cam_at(1), time=1 / 60.0, timed=True)

    t0 = time.monotonic()
    for i in range(frames):
        r.render(cam_at(i + 2), time=(i + 2) / 60.0, timed=True)
    dt = time.monotonic() - t0
    fps = frames / dt
    print(json.dumps({
        "demo": f"{width}x{height} moving-camera",
        "frames": frames, "fps": round(fps, 2),
        "frame_ms": round(dt / frames * 1e3, 1),
        "shadow_samples": 1, "bounces": 3}), flush=True)
    return fps


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        w, h = int(sys.argv[1]), int(sys.argv[2])
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 60
        run(w, h, n)
    else:
        run(640, 360)
