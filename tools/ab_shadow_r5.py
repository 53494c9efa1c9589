"""Round-5 A/B of the hard-shadow pipeline knobs at the bench camera.

The round-5 renderer profile attributes ~42 ms of the ~113 ms device
frame to the shadow pipeline: fine gather 9.0 + two-stage pack ~9.4 +
near-walk ~7 + residue DDA whiles ~8.6 + small-op tail. This tool times
masked_shadow_hits VARIANTS on the real bench-scene inputs (raster
winners' surface points) at 2M lanes, K-chained per jit to amortize the
axon tunnel RTT, and checks each variant's hits stay bit-identical.

Run on TPU: python tools/ab_shadow_r5.py [variant_index ...]
(one or two variants per process — each K-chained jit costs minutes of
remote compile; the persistent cache makes exact reruns fast)
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops import shade as shade_ops
from vvr_tpu.ops.jump import SHADOW_CASCADE, SHADOW_PHASE1, trace_jump
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.ops.rastertrace import trace_raster
from vvr_tpu.ops.sunshadow import build_sun_grids, masked_shadow_hits, \
    sun_basis
from vvr_tpu.utils.camera import Camera
from vvr_tpu.world.faces import extract_merged_faces
from vvr_tpu.world.generator import assemble_dense, generate_world
from vvr_tpu.world.jumpgrid import build_jump_grid

K = 2


def main():
    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    size = wcfg.size
    grid = build_jump_grid(occ)
    W, H = 1920, 1080
    n = W * H
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    o, d = camera_rays(cam, W, H)
    sun = np.array([-0.28, 0.65, -0.71], np.float32)
    sun /= np.linalg.norm(sun)
    sun_j = jnp.asarray(sun)
    fd = extract_merged_faces(occ).device_tuple()
    right, up, fwd = cam.basis()
    th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    ct = (jnp.asarray(cam.position, np.float32), jnp.asarray(right),
          jnp.asarray(up), jnp.asarray(fwd), jnp.float32(th))
    e1, e2, s = sun_basis(sun)
    e1j, e2j = jnp.asarray(e1), jnp.asarray(e2)
    grids, gok = build_sun_grids(fd, e1j, e2j, jnp.asarray(s), size)
    assert bool(gok)
    grids_hi = None
    if any(a in ("6", "7") for a in sys.argv[1:]):
        import time as _t
        t0 = _t.monotonic()
        grids_hi, gok_hi = build_sun_grids(fd, e1j, e2j, jnp.asarray(s),
                                           size, grid=4096,
                                           cap_entries=1 << 22)
        jax.block_until_ready(grids_hi[0])
        print(json.dumps({"build_4096_s":
                          round(_t.monotonic() - t0, 1),
                          "ok": bool(gok_hi)}), flush=True)

    # raster winners -> the frame's exact shadow-start channels
    res = trace_raster(fd, ct, d, jnp.asarray(False), size, W, H)
    sgn = jnp.where(d >= 0, 1.0, -1.0)
    face = res.face
    nx, ny, nz = shade_ops.get_face_normal_soa(
        face, sgn[:, 0], sgn[:, 1], sgn[:, 2])

    def sel_face(v3):
        return jnp.where(face == 0, v3[:, 0],
                         jnp.where(face == 1, v3[:, 1], v3[:, 2]))

    kk = res.axis_coord.astype(jnp.float32)
    plane = kk + jnp.where(sel_face(sgn) < 0, 1.0, 0.0)
    df = sel_face(d)
    dist = (plane - sel_face(o)) / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
    wx = jnp.where(face == 0, plane, o[:, 0] + d[:, 0] * dist)
    wy = jnp.where(face == 1, plane, o[:, 1] + d[:, 1] * dist)
    wz = jnp.where(face == 2, plane, o[:, 2] + d[:, 2] * dist)
    shadow_active = res.hit & ((nx * sun[0] + ny * sun[1] + nz * sun[2])
                               > 0.0)
    s_o = (wx + sun[0] * 0.05, wy + sun[1] * 0.05, wz + sun[2] * 0.05)
    s_o = tuple(jax.device_put(c) for c in s_o)
    shadow_active = jax.device_put(shadow_active)

    def tr(ro, rd, active=None, pack_first=None, with_stats=False,
           shadow=False, hard=False):
        from vvr_tpu.ops.jump import (RESIDUE_CASCADE, RESIDUE_PHASE1,
                                      RESIDUE_PREF_CASCADE,
                                      RESIDUE_PREF_PHASE1)
        if shadow and hard == "pref":
            ph, ca = RESIDUE_PREF_PHASE1, RESIDUE_PREF_CASCADE
        elif shadow and hard:
            ph, ca = RESIDUE_PHASE1, RESIDUE_CASCADE
        elif shadow:
            ph, ca = SHADOW_PHASE1, SHADOW_CASCADE
        else:
            ph, ca = 6, None
        return trace_jump(grid, ro, rd, max_steps=2048, active=active,
                          pack_first=pack_first, with_stats=with_stats,
                          phase1_groups=ph, cascade=ca)

    def variant(accel, cap1, near_k, g=None, dda_pack=None, cascade=None):
        gr = g if g is not None else grids
        if cascade is not None:
            import vvr_tpu.ops.jump as jump_mod
            jump_mod.RESIDUE_PREF_CASCADE = cascade

        def run(sox, soy, soz, act):
            acc = jnp.zeros((n,), jnp.int32)
            for k in range(K):
                h = masked_shadow_hits(
                    tr, (sox + k * 1e-7, soy, soz), sun_j, e1j, e2j,
                    gr, act, size, max(n // 10, 2048), accel=accel,
                    cap1=cap1, near_k=near_k, dda_pack=dda_pack)
                acc = acc + h.astype(jnp.int32)
            return acc
        return jax.jit(run)

    variants = [
        ("current (walk K=6, cap n/12)", lambda: variant(grid, None, 6)),
        ("no near-walk", lambda: variant(None, None, 6)),
        ("walk K=3", lambda: variant(grid, None, 3)),
        ("walk K=6, cap n/8", lambda: variant(grid, max(n // 8, 4096), 6)),
        ("walk K=6, cap n/16", lambda: variant(grid, max(n // 16, 4096),
                                               6)),
        ("walk K=9", lambda: variant(grid, None, 9)),
        ("grid 4096, cap n/24", lambda: variant(
            grid, max(n // 24, 4096), 6, g=grids_hi)),
        ("grid 4096, cap n/12", lambda: variant(grid, None, 6,
                                                g=grids_hi)),
        ("dda pack cap1/16", lambda: variant(grid, None, 6,
                                             dda_pack=10800)),
        ("pref cascade caps x2", lambda: variant(
            grid, None, 6, cascade=((1, 3, 4), (1, 12, 3), (1, 48, 0)))),
        ("dda pack/16 + caps x2", lambda: variant(
            grid, None, 6, dda_pack=10800,
            cascade=((1, 3, 4), (1, 12, 3), (1, 48, 0)))),
    ]
    sel = [int(a) for a in sys.argv[1:]] or list(range(len(variants)))
    ref = None
    for vi in sel:
        name, make = variants[vi]
        fn = make()
        out = fn(*s_o, shadow_active)
        outn = np.asarray(out)
        if ref is None:
            ref = outn
        else:
            assert (outn == ref).all(), f"{name} hits differ!"
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            out = fn(*s_o, shadow_active)
            np.asarray(out[:128])
            best = min(best, time.monotonic() - t0)
        print(json.dumps({"variant": name,
                          "ms": round(best * 1e3 / K, 2)}), flush=True)


if __name__ == "__main__":
    main()
