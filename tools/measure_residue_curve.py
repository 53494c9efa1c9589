"""Measure the SURVIVOR CURVE of the batched soft-shadow residue trace
(config 4's dominant cost): per-lane substep counts for the S x residue
jittered sun rays at the bench camera.

The round-4 profile shows jp_net_w1036800 (trace_jump's internal
full-width overflow net) executing for ~392 ms inside the soft-residue
wave loop: SHADOW_CASCADE's caps (1/6, 1/40, 1/200 after 18/24/42
substeps) are tuned for FULL-WIDTH shadow populations where most lanes
are easy sunlit terrain — the residue population is exclusively
cone-ambiguous silhouette lanes, so its survivor curve sits far above
those caps. This prints survivors-after-g-groups (FETCH_EVERY=6
substeps each) so the residue cascade can be sized from data.

Usage (TPU host): python tools/measure_residue_curve.py [depth=4]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.ops.sunshadow import soft_shadow_gate
from vvr_tpu.render.frame import make_tracer, raytrace_pass
from vvr_tpu.render.renderer import Renderer
from vvr_tpu.utils.camera import Camera
from vvr_tpu.utils.hash import hash13_soa, hash33_soa

F32 = jnp.float32


def main(depth: int = 4):
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=4,
                       max_ray_iterations=1, ambient_occlusion=False)
    t0 = time.monotonic()
    r = Renderer(WorldConfig(depth=depth), cfg, mirror_materials=True)
    print("setup s:", round(time.monotonic() - t0, 1), flush=True)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    grid = r.scene.ensure_jumpgrid()
    sun = jnp.asarray(r.sun)
    sunmask = r._sunmask()
    skybox, clouds = r._sky(0.0)
    size = r.scene.size

    # one bounce-0 pass for the dbg SoA channels (hit, normals, surface)
    _, _, dbg = raytrace_pass(grid, o, d, skybox, clouds, sun,
                              jnp.float32(0.0), cfg, sunmask=sunmask)
    hit = np.asarray(dbg["hit"])
    nx, ny, nz = (np.asarray(v) for v in dbg["normal_soa"])
    bx, by, bz = (np.asarray(v) for v in dbg["block_soa"])
    wx, wy, wz = (np.asarray(v) for v in dbg["world_soa"])
    special = np.asarray(hash13_soa(
        jnp.floor(jnp.asarray(bx, F32) / 8.0),
        jnp.floor(jnp.asarray(by, F32) / 8.0),
        jnp.floor(jnp.asarray(bz, F32) / 8.0)))
    mirror = hit & (special > 0.8)
    sun3 = np.asarray(sun)[:3]
    sun_facing = (nx * sun3[0] + ny * sun3[1] + nz * sun3[2]) > 0.0
    shadow_active = hit & ~mirror & sun_facing

    sm_e1, sm_e2, sm_grids = sunmask
    kh, km = soft_shadow_gate(
        (jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz)),
        tuple(jnp.float32(c) for c in sun3), sm_e1, sm_e2, sm_grids,
        jnp.asarray(shadow_active), size)
    dda = shadow_active & ~np.asarray(kh) & ~np.asarray(km)
    n = dda.shape[0]
    idx = np.nonzero(dda)[0]
    m = len(idx)
    print(f"n={n} shadow_active={int(shadow_active.sum())} "
          f"kh={int(np.asarray(kh).sum())} km={int(np.asarray(km).sum())} "
          f"residue={m} ({m / n:.3f}n)", flush=True)

    px = jnp.asarray(wx[idx])
    py = jnp.asarray(wy[idx])
    pz = jnp.asarray(wz[idx])
    S = 4
    bo, bd = [], []
    for s in range(S):
        c1, c2 = F32(23.12123545), F32(s * 30.43324)
        rx, ry, rz = hash33_soa(px * c1 + c2, py * c1 + c2, pz * c1 + c2)
        sdx = sun3[0] + (rx * 2.0 - 1.0) * 0.005
        sdy = sun3[1] + (ry * 2.0 - 1.0) * 0.005
        sdz = sun3[2] + (rz * 2.0 - 1.0) * 0.005
        sn = jnp.maximum(jnp.sqrt(sdx * sdx + sdy * sdy + sdz * sdz),
                         1e-12)
        sdx, sdy, sdz = sdx / sn, sdy / sn, sdz / sn
        sox = px + sun3[0] * 0.004 + sdx * 0.05
        soy = py + sun3[1] * 0.004 + sdy * 0.05
        soz = pz + sun3[2] * 0.004 + sdz * 0.05
        bo.append(jnp.stack([sox, soy, soz], -1))
        bd.append(jnp.stack([sdx, sdy, sdz], -1))
    tr = make_tracer(grid, cfg)
    res = tr(jnp.concatenate(bo, 0), jnp.concatenate(bd, 0),
             with_stats=True, shadow=True)
    it = np.asarray(res.iterations)
    tot = len(it)
    print(f"batched lanes: {tot}", flush=True)
    print("survivors after g groups (FETCH_EVERY=6 substeps each):")
    for g in range(0, 25):
        frac = float((it > g * 6).mean())
        print(f"  g={g:2d} ({g * 6:3d} substeps): {frac:.4f}")
        if frac < 0.002:
            break
    q = np.percentile(it, [50, 75, 90, 95, 99, 99.9, 100])
    print("iteration quantiles p50/p75/p90/p95/p99/p99.9/max:",
          [round(float(x), 1) for x in q], flush=True)

    # near-walk + lift prefilter effect (ops/sunshadow.py
    # near_walk_classify): what fraction of the batched sample rays the
    # DDA still has to trace, and that subset's survivor curve (sizes
    # the wave DDA's pack_first / cascade)
    import math
    from vvr_tpu.ops.sunshadow import SAFE, near_walk_classify
    gBCg, _, ga0, gb0, gts = sm_grids
    gres = int(math.isqrt(gBCg.shape[0]))
    qa = px * sm_e1[0] + py * sm_e1[1] + pz * sm_e1[2]
    qb = px * sm_e2[0] + py * sm_e2[1] + pz * sm_e2[2]
    gi = jnp.floor((qa - ga0) / gts).astype(jnp.int32)
    gj = jnp.floor((qb - gb0) / gts).astype(jnp.int32)
    ginb = (gi >= 0) & (gi < gres) & (gj >= 0) & (gj < gres)
    rowC = jnp.take(gBCg, jnp.where(ginb, gj * gres + gi, 0),
                    axis=0, mode="clip")[:, 1]
    rowC = jnp.where(ginb, rowC, jnp.float32(3e38))
    kh2, km2 = near_walk_classify(grid, jnp.concatenate(bo, 0),
                                  jnp.concatenate(bd, 0),
                                  jnp.tile(rowC, S),
                                  tuple(jnp.float32(c) for c in sun3),
                                  size)
    kh2 = np.asarray(kh2)
    km2 = np.asarray(km2)
    amb = ~kh2 & ~km2
    print(f"prefilter: walk-hit {kh2.mean():.4f}  "
          f"miss(lift/exit/outw) {km2.mean():.4f}  "
          f"DDA residual {amb.mean():.4f}", flush=True)
    # soundness spot-check vs the full trace's own answer
    hit_full = np.asarray(res.hit)
    assert not (kh2 & ~hit_full).any(), "walk-hit on a DDA-miss lane"
    assert not (km2 & hit_full).any(), "lift-miss on a DDA-hit lane"
    ita = it[amb]
    if len(ita):
        print("DDA-residual survivors after g groups:")
        for g in range(0, 25):
            frac = float((ita > g * 6).mean())
            print(f"  g={g:2d}: {frac:.4f} ({frac * amb.mean():.4f} of "
                  "batch width)")
            if frac < 0.005:
                break


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
