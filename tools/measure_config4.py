"""Per-pass budget of CONFIG 4 (4-bounce mirrors + AO + 4-sample soft
shadows, 1080p/256^3) — the 6.8 s/frame quality config (PROGRESS.md round-3
table). Times each structural piece as its own jit so round 4's attack
(between-bounce reordering, sample batching) is sized from measured numbers,
not vibes.

Run on the TPU host: python tools/measure_config4.py
"""
from __future__ import annotations

import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.utils.camera import Camera
from vvr_tpu.utils.hash import hash33
from vvr_tpu.world.generator import assemble_dense, generate_world
from vvr_tpu.world.jumpgrid import build_jump_grid
from vvr_tpu.world.pyramid import build_brick_pyramid
from vvr_tpu.world.faces import extract_merged_faces
from vvr_tpu.world.svt import density_from_occupancy
from vvr_tpu.ops.rastertrace import trace_raster
from vvr_tpu.ops.traverse import solid_at
from vvr_tpu.ops.jump import trace_jump, SHADOW_PHASE1, SHADOW_CASCADE
from vvr_tpu.ops.sunshadow import (CONE_TAN, build_sun_grids, sun_basis,
                                   soft_shadow_gate)
from vvr_tpu.ops import shade as shade_ops


def timeit(fn, *args, reps=3, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    return (time.monotonic() - t0) / reps * 1e3, r


def main():
    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    size = wcfg.size
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    W, H = 1920, 1080
    o, d = camera_rays(cam, W, H)
    n = o.shape[0]
    sun = np.array([-0.28, 0.65, -0.71], np.float32)
    sun /= np.linalg.norm(sun)
    sun_j = jnp.asarray(sun)

    grid = build_jump_grid(occ)
    pyr = build_brick_pyramid(occ)
    density = density_from_occupancy(occ)
    fd = extract_merged_faces(occ)
    fdt = fd.device_tuple()
    right, up, fwd = cam.basis()
    th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    ct = (jnp.asarray(cam.position, jnp.float32),
          jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
          jnp.asarray(fwd, jnp.float32), jnp.float32(th))
    probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))

    # primary hits -> the bounce-0 surface state (raster path)
    res = jax.jit(lambda dd: trace_raster(fdt, ct, dd, probe, size, W, H))(d)
    sgn = jnp.where(d >= 0, 1.0, -1.0)
    normal = shade_ops.get_face_normal(res.face, sgn)
    face = res.face

    def sel_face(vec):
        return jnp.where(face == 0, vec[:, 0],
                         jnp.where(face == 1, vec[:, 1], vec[:, 2]))
    k = res.axis_coord.astype(jnp.float32)
    plane = k + jnp.where(sel_face(sgn) < 0, 1.0, 0.0)
    df = sel_face(d)
    dist = (plane - sel_face(o)) / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
    world = o + d * dist[:, None]
    fsel = jnp.stack([face == 0, face == 1, face == 2], -1)
    world = jnp.where(fsel, plane[:, None], world)
    hit = res.hit

    # --- mirror bounce rays (the config-4 mirror rule: hash 8^3 groups) ---
    bp = jnp.where(fsel, res.axis_coord[:, None],
                   jnp.floor(world).astype(jnp.int32))
    _alb, _r, metal, special = shade_ops.material_at(bp, size, True)
    mirror = hit & (special > 0.8) & (metal > 0.0)
    n_mirror = int(jnp.sum(mirror))
    refl = d - 2.0 * jnp.sum(d * normal, -1, keepdims=True) * normal
    b_o = world + refl * 1e-3
    print(json.dumps({"mirror_lanes_bounce1": n_mirror,
                      "frac": round(n_mirror / n, 4)}), flush=True)

    # bounce-1 trace as the frame runs it (general ray order, packed)
    cap = max(n // 8, 2048)
    def bounce(m):
        return trace_jump(grid, b_o, refl, max_steps=2048, active=m,
                          pack_first=cap, with_stats=False,
                          phase1_groups=6).hit
    ms, _ = timeit(jax.jit(bounce), mirror)
    print(json.dumps({"pass": "bounce1_trace(ray order)", "ms": round(ms, 1)}),
          flush=True)

    # bounce-1 trace with rays SORTED by (origin superbrick, dir octant)
    def bounce_sorted(m):
        sb = (jnp.floor(b_o[:, 0] / 8).astype(jnp.int32)
              + jnp.floor(b_o[:, 1] / 8).astype(jnp.int32) * (size // 8)
              + jnp.floor(b_o[:, 2] / 8).astype(jnp.int32) * (size // 8) ** 2)
        octk = ((refl[:, 0] > 0).astype(jnp.int32)
                + 2 * (refl[:, 1] > 0).astype(jnp.int32)
                + 4 * (refl[:, 2] > 0).astype(jnp.int32))
        key = jnp.where(m, octk * (size // 8) ** 3 + sb, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)[:cap]
        valid = m[order]
        sub = trace_jump(grid, b_o[order], refl[order], max_steps=2048,
                         active=valid, with_stats=False, phase1_groups=6)
        return jnp.zeros((n,), bool).at[order].set(sub.hit & valid,
                                                   mode="drop")
    ms, _ = timeit(jax.jit(bounce_sorted), mirror)
    print(json.dumps({"pass": "bounce1_trace(sorted sb+oct)",
                      "ms": round(ms, 1)}), flush=True)

    # --- AO (filtered SVT sample, the config-4 live path) ---
    from vvr_tpu.world.svt import sample_density_trilinear
    def ao_f(w_, nrm):
        wtf = jnp.where(nrm < 0, -2.0, nrm)
        return 1.0 - jnp.clip(
            sample_density_trilinear(density, w_ + wtf) * 0.5, 0, 1)
    ms, _ = timeit(jax.jit(ao_f), world, normal)
    print(json.dumps({"pass": "ao_filtered_fullwidth", "ms": round(ms, 1)}),
          flush=True)

    # --- soft shadows: cone gate + 4-sample residue ---
    e1, e2, s = sun_basis(sun)
    e1j, e2j, sj = jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(s)
    grids, gok = build_sun_grids(fdt, e1j, e2j, sj, size,
                                 cap_entries=1 << 20, cone_tan=CONE_TAN)
    sun_facing = jnp.sum(normal * sun_j[None, :], -1) > 0.0
    shadow_active = hit & sun_facing
    shadow_start = world

    def gate(sa):
        return soft_shadow_gate(shadow_start, sun_j, e1j, e2j, grids, sa,
                                size)
    ms, (kh, km) = timeit(jax.jit(gate), shadow_active)
    dda_active = shadow_active & ~kh & ~km
    print(json.dumps({"pass": "soft_gate", "ms": round(ms, 1),
                      "residue_lanes": int(jnp.sum(dda_active)),
                      "frac_of_active": round(
                          float(jnp.sum(dda_active))
                          / max(float(jnp.sum(shadow_active)), 1), 4)}),
          flush=True)

    dda_cap = max(n // 4, 2048)
    S = 4

    def one_sample(s_idx, act):
        rng = hash33(shadow_start * 23.12123545 + s_idx * 30.43324) * 2.0 - 1.0
        sdir = sun_j[None, :] + rng * 0.005
        sdir = sdir / jnp.linalg.norm(sdir, axis=-1, keepdims=True)
        s_o = shadow_start + sun_j * 0.004 + sdir * 0.05
        return trace_jump(grid, s_o, sdir, max_steps=2048, active=act,
                          pack_first=dda_cap, shadow=False,
                          phase1_groups=SHADOW_PHASE1,
                          cascade=SHADOW_CASCADE, with_stats=False).hit

    def four_separate(act):
        hits = []
        for si in range(S):
            hits.append(one_sample(si, act))
        return jnp.stack(hits)
    ms, _ = timeit(jax.jit(four_separate), dda_active)
    print(json.dumps({"pass": f"soft_residue_{S}x_separate",
                      "ms": round(ms, 1)}), flush=True)

    # batched: pack residue ONCE, trace 4 samples as one 4x batch
    def four_batched(act):
        idx = jnp.nonzero(act, size=dda_cap, fill_value=n)[0]
        valid = idx < n
        safe = jnp.minimum(idx, n - 1)
        ss = shadow_start[safe]
        os_, ds_, va_ = [], [], []
        for si in range(S):
            rng = hash33(ss * 23.12123545 + si * 30.43324) * 2.0 - 1.0
            sdir = sun_j[None, :] + rng * 0.005
            sdir = sdir / jnp.linalg.norm(sdir, axis=-1, keepdims=True)
            os_.append(ss + sun_j * 0.004 + sdir * 0.05)
            ds_.append(sdir)
            va_.append(valid)
        ob = jnp.concatenate(os_)
        db = jnp.concatenate(ds_)
        vb = jnp.concatenate(va_)
        sub = trace_jump(grid, ob, db, max_steps=2048, active=vb,
                         with_stats=False, phase1_groups=SHADOW_PHASE1,
                         cascade=SHADOW_CASCADE)
        return sub.hit.reshape(S, dda_cap)
    ms, _ = timeit(jax.jit(four_batched), dda_active)
    print(json.dumps({"pass": f"soft_residue_{S}x_batched",
                      "ms": round(ms, 1)}), flush=True)

    # batched + sorted by (superbrick, octant): locality for the gathers
    def four_batched_sorted(act):
        idx = jnp.nonzero(act, size=dda_cap, fill_value=n)[0]
        valid = idx < n
        safe = jnp.minimum(idx, n - 1)
        ss = shadow_start[safe]
        os_, ds_ = [], []
        for si in range(S):
            rng = hash33(ss * 23.12123545 + si * 30.43324) * 2.0 - 1.0
            sdir = sun_j[None, :] + rng * 0.005
            sdir = sdir / jnp.linalg.norm(sdir, axis=-1, keepdims=True)
            os_.append(ss + sun_j * 0.004 + sdir * 0.05)
            ds_.append(sdir)
        ob = jnp.concatenate(os_)
        db = jnp.concatenate(ds_)
        vb = jnp.tile(valid, S)
        g8 = size // 8
        sb = (jnp.floor(ob[:, 0] / 8).astype(jnp.int32)
              + jnp.floor(ob[:, 1] / 8).astype(jnp.int32) * g8
              + jnp.floor(ob[:, 2] / 8).astype(jnp.int32) * g8 * g8)
        key = jnp.where(vb, sb, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)
        sub = trace_jump(grid, ob[order], db[order], max_steps=2048,
                         active=vb[order], with_stats=False,
                         phase1_groups=SHADOW_PHASE1,
                         cascade=SHADOW_CASCADE)
        return sub.hit
    ms, _ = timeit(jax.jit(four_batched_sorted), dda_active)
    print(json.dumps({"pass": f"soft_residue_{S}x_batched_sorted",
                      "ms": round(ms, 1)}), flush=True)

    # the 4 full-width cloud samples + shadow accumulation glue
    from vvr_tpu.ops import sky as sky_ops
    clouds_tex = sky_ops.write_clouds(sun_j, 0.0, 512)
    cb = sky_ops.block_clouds(clouds_tex)
    def glue(kh_, km_):
        shadow = jnp.zeros((n,), jnp.float32)
        for si in range(S):
            rng = hash33(shadow_start * 23.12123545 + si * 30.43324) * 2.0 - 1.0
            sdir = sun_j[None, :] + rng * 0.005
            sdir = sdir / jnp.linalg.norm(sdir, axis=-1, keepdims=True)
            strength = jnp.power(jnp.clip(
                jnp.sum(sdir * sun_j, -1), 0.0, 1.0), 40.0)
            s_hit = kh_
            cl = sky_ops.sample_clouds_blocked(cb, 512, sdir, shadow_start)
            shadow = shadow + jnp.where(
                s_hit, 0.0, strength * (1.0 - cl[..., 3])) / S
        return shadow
    ms, _ = timeit(jax.jit(glue), kh, km)
    print(json.dumps({"pass": f"soft_glue_{S}x(jitter+clouds)",
                      "ms": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
