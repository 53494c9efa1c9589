"""Measure trace_raster's tile-entry demand for a camera — sizes the
adaptive cap_entries policy (config-5 found the 1<<20 cap overflowing at
1024^3: 763K faces pushed thousands of faces into the full-screen net,
~5.1 s of the 6.5 s frame).

Usage: python tools/measure_entry_demand.py [depth]
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vvr_tpu.config import WorldConfig
from vvr_tpu.render.scene import build_scene
from vvr_tpu.utils.camera import Camera
from vvr_tpu.ops.rastertrace import _project_faces, TKX, TKY


def main(depth: int):
    wcfg = WorldConfig(depth=depth)
    scene = build_scene(wcfg, with_density=False, with_pyramid=False)
    faces = scene.ensure_faces()
    n_faces = int(faces[0].shape[0])
    size = wcfg.size
    if depth >= 5:
        cam = Camera.look_at([512.0, 400.0, 80.0], [512.0, 80.0, 720.0],
                             fov=85.0)
    else:
        cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                             fov=85.0)
    right, up, fwd = cam.basis()
    th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    rcam = (jnp.asarray(cam.position, jnp.float32),
            jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
            jnp.asarray(fwd, jnp.float32), jnp.float32(th))

    @jax.jit
    def demand():
        (visible, straddle, onscreen, imin, imax, jmin, jmax,
         _ics, _jcs) = _project_faces(faces, rcam, 1920, 1080)
        ok = visible & ~straddle & onscreen & (jmin <= jmax)
        tw = imax // TKX - imin // TKX + 1
        thh = jmax // TKY - jmin // TKY + 1
        cnt = jnp.where(ok, tw * thh, 0)
        return (jnp.sum(cnt), jnp.sum(ok), jnp.sum(visible & straddle),
                jnp.max(cnt))

    total, n_ok, n_straddle, max_cnt = [int(x) for x in demand()]
    print(json.dumps({
        "depth": depth, "size": size, "n_faces": n_faces,
        "entry_demand": total, "ok_faces": n_ok,
        "straddle_faces": n_straddle, "max_single_face_entries": max_cnt,
        "demand_per_face": round(total / max(n_faces, 1), 3),
        "old_cap": 1 << 20, "overflow": max(0, total - (1 << 20))}),
        flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
