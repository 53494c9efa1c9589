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

Usage: python tools/measure_interactive.py [width height [frames [ds]]]
`ds` is the downscale_factor — the reference's own knob (src/main.rs:37):
render at (w/ds, h/ds) internally, composite up to the full output
resolution inside the same jitted frame (ops/post.py integer upscale).
Prints one JSON line per config; run on the TPU host.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def run(width: int, height: int, frames: int = 60, ds: int = 1):
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera

    cfg = RenderConfig(width=width, height=height, shadow_samples=1,
                       max_ray_iterations=3, downscale_factor=ds)
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

    # Sustained (pipelined) rate: frames stay on device and dispatch
    # back-to-back, syncing once per 4-frame batch on a 3-byte checksum —
    # the frames-in-flight analog of the reference's 3-deep per-frame
    # data (src/per_frame_data.rs:5). The per-frame `timed=True` loop
    # would charge the remote tunnel's ~30 ms per-sync RTT to every
    # frame, which measures the tunnel, not the renderer.
    t0 = time.monotonic()
    img = None
    for i in range(frames):
        img = r.render(cam_at(i + 2), time=(i + 2) / 60.0, timed=False)
        if (i + 1) % 4 == 0:
            np.asarray(img[-1, -1])
    np.asarray(img[-1, -1])
    dt = time.monotonic() - t0
    fps = frames / dt

    # Per-frame latency (synced every frame) for the latency-honest row.
    t0 = time.monotonic()
    for i in range(8):
        r.render(cam_at(frames + 2 + i), time=(frames + 2 + i) / 60.0,
                 timed=True)
    lat_ms = (time.monotonic() - t0) / 8 * 1e3
    print(json.dumps({
        "demo": f"{width}x{height} moving-camera"
                + (f" (ds {ds}: internal {width//ds}x{height//ds})"
                   if ds > 1 else ""),
        "frames": frames, "fps": round(fps, 2),
        "frame_ms": round(dt / frames * 1e3, 1),
        "synced_latency_ms": round(lat_ms, 1),
        "downscale_factor": ds,
        "shadow_samples": 1, "bounces": 3}), flush=True)
    return fps


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        w, h = int(sys.argv[1]), int(sys.argv[2])
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 60
        d = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        run(w, h, n, d)
    else:
        run(640, 360)
