"""Dump the flagship frame's lowered HLO (CPU, no TPU needed) and locate
(N,1)-shaped predicate intermediates — the round-4 TPU profile caught three
23.9 ms select fusions iterating over pred[2073600,1] constants. Captures
the EXACT render_frame invocation by intercepting the Renderer's dispatch,
then lowers it without executing."""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


class _Captured(Exception):
    def __init__(self, args, kwargs):
        self.args_ = args
        self.kwargs_ = kwargs


def main() -> int:
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render import renderer as rmod
    from vvr_tpu.render.frame import render_frame
    from vvr_tpu.utils.camera import Camera

    world_cfg = WorldConfig(depth=4)
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                       max_ray_iterations=3)
    r = rmod.Renderer(world_cfg, cfg)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)

    def capture(*args, **kwargs):
        raise _Captured(args, kwargs)

    rmod.render_frame = capture
    try:
        r.render(cam, timed=True)
    except _Captured as c:
        args, kwargs = c.args_, c.kwargs_
    finally:
        rmod.render_frame = render_frame

    lowered = render_frame.lower(*args, **kwargs)
    txt = lowered.as_text()
    out = "/tmp/frame_lowered.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "chars")
    pat = re.compile(r"2073600x1x|tensor<2073600x1xi1>")
    lines = [(i, ln) for i, ln in enumerate(txt.splitlines())
             if pat.search(ln)]
    print(f"{len(lines)} lines with 2073600x1 tensors")
    for i, ln in lines[:50]:
        print(i, ln.strip()[:220])
    return 0


if __name__ == "__main__":
    sys.exit(main())
