"""Per-pass wall-clock decomposition of the flagship frame on TPU.

Times each pass as its own jit (raster primary, sun-grid build, classify
gather, residue DDA, sky, post) and prints the classifier's certainty
fractions — the numbers the round-3 optimization plan is sized from.
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
from vvr_tpu.world.generator import assemble_dense, generate_world
from vvr_tpu.world.jumpgrid import build_jump_grid
from vvr_tpu.world.pyramid import build_brick_pyramid
from vvr_tpu.world.faces import extract_merged_faces
from vvr_tpu.ops.rastertrace import trace_raster
from vvr_tpu.ops.traverse import solid_at
from vvr_tpu.ops.sunshadow import (build_sun_grids, sun_basis, classify,
                                   masked_shadow_hits, BACK)
from vvr_tpu.ops.jump import trace_jump, SHADOW_PHASE1, SHADOW_CASCADE
from vvr_tpu.ops import sky as sky_ops
from vvr_tpu.ops import post as post_ops


def timeit(fn, *args, reps=4, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args, **kw)
        jax.block_until_ready(r)
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

    fd = extract_merged_faces(occ)
    fdt = fd.device_tuple()
    print("faces:", len(fd), flush=True)
    grid = build_jump_grid(occ)
    pyr = build_brick_pyramid(occ)
    right, up, fwd = cam.basis()
    th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    ct = (jnp.asarray(cam.position, jnp.float32),
          jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
          jnp.asarray(fwd, jnp.float32), jnp.float32(th))
    probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))

    # --- raster primary ---
    rfn = jax.jit(lambda dd: trace_raster(fdt, ct, dd, probe, size, W, H))
    ms, res = timeit(rfn, d)
    print(json.dumps({"pass": "raster_primary", "ms": round(ms, 1)}), flush=True)

    # --- sun grids build ---
    e1, e2, s = sun_basis(sun)
    e1j, e2j, sj = jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(s)
    bms, (grids, gok) = timeit(lambda: build_sun_grids(
        fdt, e1j, e2j, sj, size, cap_entries=1 << 20))
    print(json.dumps({"pass": "sun_grid_build", "ms": round(bms, 1),
                      "ok": bool(gok)}), flush=True)

    # shadow-ray setup identical to the frame
    from vvr_tpu.ops import shade as shade_ops
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
    sun_facing = jnp.sum(normal * sun_j[None, :], -1) > 0.0
    shadow_active = res.hit & sun_facing
    s_o = world + sun_j * 0.05

    # --- classify fractions ---
    cs, cl = jax.jit(classify, static_argnames=("size",))(
        s_o, e1j, e2j, sj, grids, size)
    inw = jnp.all((s_o >= 0) & (s_o < size), axis=-1)
    known_hit = shadow_active & cs
    # replicate masked_shadow_hits' light rule (depth of surface point)
    gBC, cBC, a0, b0, ts_ = grids
    qa = s_o @ e1j; qb = s_o @ e2j; qz = s_o @ sun_j
    from vvr_tpu.ops.sunshadow import GRID, SAFE
    i = jnp.floor((qa - a0) / ts_).astype(jnp.int32)
    j = jnp.floor((qb - b0) / ts_).astype(jnp.int32)
    inb = inw & (i >= 0) & (i < GRID) & (j >= 0) & (j < GRID)
    tex = jnp.where(inb, j * GRID + i, 0)
    row = jnp.take(gBC, tex, axis=0, mode="clip")
    c_shadow = inb & (qz < row[:, 0] - SAFE)
    c_light = inb & (qz - BACK > row[:, 1] + SAFE)
    kh = shadow_active & c_shadow
    km = shadow_active & ~kh & (c_light | ~inw)
    amb = shadow_active & ~kh & ~km
    na = int(jnp.sum(shadow_active))
    # coarse-level fractions (the fast first gate of masked_shadow_hits)
    from vvr_tpu.ops.sunshadow import COARSE
    bf = GRID // COARSE
    ctex = jnp.where(inb, (j // bf) * COARSE + (i // bf), 0)
    crow = jnp.take(cBC, ctex, axis=0, mode="clip")
    cc_shadow = inb & (qz < crow[:, 0] - SAFE)
    cc_light = inb & (qz - BACK > crow[:, 1] + SAFE)
    ckh = shadow_active & cc_shadow
    ckm = shadow_active & ~ckh & (cc_light | ~inw)
    unres = shadow_active & ~ckh & ~ckm
    print(json.dumps({
        "shadow_active": na, "frac_of_rays": round(na / n, 3),
        "known_hit": round(float(jnp.sum(kh)) / max(na, 1), 4),
        "known_miss": round(float(jnp.sum(km)) / max(na, 1), 4),
        "ambiguous": int(jnp.sum(amb)),
        "amb_frac": round(float(jnp.sum(amb)) / max(na, 1), 4),
        "coarse_unresolved": int(jnp.sum(unres)),
        "coarse_unres_frac": round(float(jnp.sum(unres)) / max(na, 1),
                                   4)}), flush=True)

    # --- post-near-segment residue (lanes the packed DDA must trace) ---
    from vvr_tpu.ops.sunshadow import _near_segment
    amb_idx = jnp.nonzero(amb, size=max(n // 4, 4096), fill_value=n)[0]
    a_valid = amb_idx < n
    a_safe = jnp.minimum(amb_idx, n - 1)
    nh, nexit, tend = jax.jit(lambda po: _near_segment(grid, po, sun_j))(
        s_o[a_safe])
    arow = jnp.take(gBC, tex[a_safe], axis=0, mode="clip")
    lifted = (qz[a_safe] + tend > arow[:, 1] + SAFE)
    resid = a_valid & ~jnp.asarray(nh) & ~jnp.asarray(nexit) & ~lifted
    print(json.dumps({"near_hit": int(jnp.sum(a_valid & nh)),
                      "near_lifted_light": int(jnp.sum(
                          a_valid & ~nh & ~nexit & lifted)),
                      "dda_residual": int(jnp.sum(resid))}), flush=True)

    # --- classify gather alone (full width) ---
    def cls(pts):
        qa = pts @ e1j; qb = pts @ e2j
        i = jnp.floor((qa - a0) / ts_).astype(jnp.int32)
        j = jnp.floor((qb - b0) / ts_).astype(jnp.int32)
        tex = jnp.clip(j * GRID + i, 0, GRID * GRID - 1)
        row = jnp.take(gBC, tex, axis=0, mode="clip")
        return row[:, 0] + row[:, 1]
    ms, _ = timeit(jax.jit(cls), s_o)
    print(json.dumps({"pass": "classify_gather_fullwidth",
                      "ms": round(ms, 1)}), flush=True)

    # --- residue DDA (packed trace_jump exactly as masked_shadow_hits) ---
    sdir = jnp.broadcast_to(sun_j, s_o.shape)
    cap = max(n // 10, 2048)
    def resid(amb_):
        return trace_jump(grid, s_o, sdir, max_steps=2048, active=amb_,
                          pack_first=cap, phase1_groups=SHADOW_PHASE1,
                          cascade=SHADOW_CASCADE, with_stats=False).hit
    ms, _ = timeit(jax.jit(resid), amb)
    print(json.dumps({"pass": "residue_dda(with overflow net)",
                      "ms": round(ms, 1)}), flush=True)

    # --- residue without full-width overflow: pack once, no rest-trace ---
    def resid_packed(amb_):
        idx = jnp.nonzero(amb_, size=cap, fill_value=n)[0]
        valid = idx < n
        safe = jnp.minimum(idx, n - 1)
        sub = trace_jump(grid, s_o[safe], sdir[safe], max_steps=2048,
                         active=valid, phase1_groups=SHADOW_PHASE1,
                         cascade=SHADOW_CASCADE, with_stats=False)
        return jnp.zeros((n,), bool).at[idx].set(sub.hit & valid, mode="drop")
    ms, _ = timeit(jax.jit(resid_packed), amb)
    print(json.dumps({"pass": "residue_dda(packed only)",
                      "ms": round(ms, 1)}), flush=True)

    # --- full masked_shadow_hits as the frame calls it ---
    def tr(o_, d_, active=None, pack_first=None, with_stats=False,
           shadow=False):
        return trace_jump(grid, o_, d_, max_steps=2048, active=active,
                          pack_first=pack_first, with_stats=with_stats,
                          phase1_groups=SHADOW_PHASE1 if shadow else 6,
                          cascade=SHADOW_CASCADE if shadow else None)
    msh = jax.jit(lambda so, sa: masked_shadow_hits(
        tr, so, sun_j, e1j, e2j, grids, sa, size, cap, accel=grid))
    ms, _ = timeit(msh, s_o, shadow_active)
    print(json.dumps({"pass": "masked_shadow_hits(full)",
                      "ms": round(ms, 1)}), flush=True)

    # --- sky ---
    ms, _ = timeit(jax.jit(lambda: (sky_ops.write_clouds(sun_j, 0.0, 512),
                                    sky_ops.write_skybox(sun_j, 0.0, 256))))
    print(json.dumps({"pass": "sky_textures", "ms": round(ms, 1)}), flush=True)

    # --- post (bloom + composite) on a dummy hdr ---
    hdr = jnp.zeros((H, W, 4), jnp.float32)
    def postp(h_):
        bl = post_ops.bloom_pyramid(h_)
        return post_ops.composite(h_, bl, H, W, 0.05, True)
    ms, _ = timeit(jax.jit(postp), hdr)
    print(json.dumps({"pass": "post_bloom_composite", "ms": round(ms, 1)}),
          flush=True)

    # --- post PLANAR (what the frame actually runs, render/frame.py) ---
    hdr_p = jnp.zeros((4, H, W), jnp.float32)
    def postp2(h_):
        bl = post_ops.bloom_pyramid_p(h_)
        return post_ops.composite_p(h_, bl, H, W, 0.05, True)
    ms, _ = timeit(jax.jit(postp2), hdr_p)
    print(json.dumps({"pass": "post_planar", "ms": round(ms, 1)}), flush=True)

    # --- the shade/glue tail, piecewise (full 2M width, frame formulas) ---
    from vvr_tpu.ops import sky as sky_ops2
    normal_j = normal
    world_j = world
    bp = jnp.where(fsel, res.axis_coord[:, None],
                   jnp.floor(world).astype(jnp.int32))

    def sh_mat(bp_):
        return shade_ops.material_at(bp_, size, False)
    ms, _ = timeit(jax.jit(sh_mat), bp)
    print(json.dumps({"pass": "shade_material_at", "ms": round(ms, 1)}),
          flush=True)

    sun_col = sky_ops2.sun_colour(sun_j)
    scf = jnp.where(sun_j[1] > 0, 3.2 * sun_col, 0.0)
    alb, rough, metal, _sp = shade_ops.material_at(bp, size, False)
    shadow_f = jnp.ones((n,), jnp.float32)

    def sh_light(w_, a_, n_, r_, m_, s_):
        return shade_ops.lighting(w_, a_, n_, r_, m_,
                                  jnp.ones((n,), jnp.float32) ** 1.4, s_,
                                  -d, jnp.broadcast_to(sun_j, (n, 3)), scf)
    ms, _ = timeit(jax.jit(sh_light), world_j, alb, normal_j, rough, metal,
                   shadow_f)
    print(json.dumps({"pass": "shade_lighting", "ms": round(ms, 1)}),
          flush=True)

    # hit reconstruction (frame.py:136-155 op sequence)
    def sh_recon(res_face, res_axis):
        sgn_ = jnp.where(d >= 0, 1.0, -1.0)
        def sel_face(vec):
            return jnp.where(res_face == 0, vec[:, 0],
                             jnp.where(res_face == 1, vec[:, 1], vec[:, 2]))
        k_ = res_axis.astype(jnp.float32)
        plane_ = k_ + jnp.where(sel_face(sgn_) < 0, 1.0, 0.0)
        df_ = sel_face(d)
        dist_ = (plane_ - sel_face(o)) / jnp.where(jnp.abs(df_) < 1e-12,
                                                   1e-12, df_)
        w_ = o + d * dist_[:, None]
        fsel_ = jnp.stack([res_face == 0, res_face == 1, res_face == 2], -1)
        w_ = jnp.where(fsel_, plane_[:, None], w_)
        bp_ = jnp.where(fsel_, res_axis[:, None],
                        jnp.floor(w_).astype(jnp.int32))
        nrm = shade_ops.get_face_normal(res_face, sgn_)
        return w_, bp_, nrm
    ms, _ = timeit(jax.jit(sh_recon), res.face, res.axis_coord)
    print(json.dumps({"pass": "hit_reconstruction", "ms": round(ms, 1)}),
          flush=True)

    # miss shader from blocked tables (frame.py miss path)
    clouds_tex = sky_ops2.write_clouds(sun_j, 0.0, 512)
    skybox = sky_ops2.write_skybox(sun_j, 0.0, 256)
    cb = sky_ops2.block_clouds(clouds_tex)
    sb = sky_ops2.block_skybox(skybox)
    def sh_miss(o_, d_):
        return sky_ops2.sample_skybox_and_clouds_blocked(sb, 256, cb, 512,
                                                         o_, d_)
    ms, _ = timeit(jax.jit(sh_miss), o, d)
    print(json.dumps({"pass": "miss_shader_blocked", "ms": round(ms, 1)}),
          flush=True)

    # shadow-ray cloud modulation sample (frame.py shadow path)
    def sh_cl(w_):
        sdir = jnp.broadcast_to(sun_j, (n, 3))
        return sky_ops2.sample_clouds_blocked(cb, 512, sdir, w_)
    ms, _ = timeit(jax.jit(sh_cl), world_j)
    print(json.dumps({"pass": "shadow_cloud_sample", "ms": round(ms, 1)}),
          flush=True)

    # --- the full flagship frame (sky cached), for the budget total ---
    from vvr_tpu.config import RenderConfig
    from vvr_tpu.render.frame import render_frame
    cfg = RenderConfig(width=W, height=H, shadow_samples=1,
                       max_ray_iterations=3)
    sun4 = jnp.concatenate([sun_j, jnp.zeros((1,), jnp.float32)])
    def full_frame():
        img, hdr = render_frame(grid, o, d, sun4, jnp.float32(0.0), cfg,
                                raster=(fdt, ct, probe),
                                sunmask=(e1j, e2j, grids),
                                sky=(skybox, clouds_tex))
        return img
    ms, _ = timeit(jax.jit(full_frame))
    print(json.dumps({"pass": "FULL_FRAME(flagship)", "ms": round(ms, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
