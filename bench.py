"""Headline benchmark — run on real TPU by the driver.

Config 3 of BASELINE.md: 256^3 terrain scene, 1080p, primary + 1 hard shadow
ray per pixel, PBR + analytic sky + bloom + ACES (the reference's default
quality: 1 shadow sample, 3 bounce cap — src/main.rs:37-47 — at 1080p).

Prints ONE JSON line:
  {"metric": "Mrays/s", "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is measured against the 100 Mrays/s/chip north-star target
(BASELINE.json); the reference publishes no numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import jax
    import numpy as np

    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera

    world_cfg = WorldConfig(depth=4)  # 256^3
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                       max_ray_iterations=3)
    r = Renderer(world_cfg, cfg)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)

    # warmup (compile) + timed frames, PIPELINED in batches: frames stay
    # on device (the frames-in-flight analog of the reference's 3-deep
    # per-frame data, src/per_frame_data.rs:5), so a batch dispatches 4
    # frames back-to-back and syncs once on the last frame's checksum —
    # device programs run in order, so the last sync bounds them all.
    # Sustained per-frame time = batch wall / 4; the remote-TPU tunnel's
    # per-sync round trip (~27-40 ms median, with rare multi-second
    # stalls) amortizes across the batch, and the MEDIAN batch is
    # reported so a stalled batch is discarded rather than averaged in.
    import numpy as np
    for _ in range(2):
        r.render(cam, timed=True)
    n_batches, batch = 5, 4
    rates = []
    for b in range(n_batches):
        t0 = time.monotonic()
        img = None
        for i in range(batch):
            img = r.render(cam, time=(b * batch + i) / 60.0, timed=False)
        np.asarray(img[-1, -1])  # 3-byte checksum forces the whole batch
        rates.append((time.monotonic() - t0) / batch)
    dt = sorted(rates)[n_batches // 2]

    rays = r.rays_per_frame
    mrays = rays / dt / 1e6
    result = {
        "metric": "Mrays/s",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "scene": "256^3 terrain", "resolution": "1920x1080",
            "rays_per_frame": rays, "frame_ms": round(dt * 1e3, 2),
            "fps": round(1.0 / dt, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
