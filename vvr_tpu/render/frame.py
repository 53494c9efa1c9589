"""Frame graph — the jitted per-frame pipeline.

The analog of InternalApp::render's command buffer (src/renderer.rs:465-1129),
as a single jitted function: XLA schedules the passes, barriers become data
dependencies (SURVEY.md §2.4):

  1. sky: clouds 512^2 + skybox cubemap 256^2 x6 (sky_compute.slang) — computed
     at frame start and consumed the same frame (the reference records them
     *after* the main pass, giving a 1-frame latency, SURVEY.md §3.2; we fix
     that quirk).
  2. raytrace: wavefront bounce loop (raytracer.slang:146-399) — per bounce a
     full HDDA trace, mirror continuation, Cook-Torrance shading with sun
     shadow rays (hard or N jittered soft samples, cloud-modulated), AO from
     the brick-pool density field, miss -> skybox+clouds.
  3. post: bloom mip chain + ACES + gamma + integer upscale
     (post_process_compute.slang).

Quality knobs come from RenderConfig as trace-time constants (the analog of
SPIR-V spec constants, src/pipeline.rs:102-112); camera/sun/time are traced
arguments (push constants)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vvr_tpu.config import (DEBUG_BUFFER_FETCHES, DEBUG_EXIT_TYPE,
                            DEBUG_ITERATIONS, DEBUG_NORMALS, DEBUG_WORLD,
                            RenderConfig)
from vvr_tpu.ops import post as post_ops
from vvr_tpu.ops import shade as shade_ops
from vvr_tpu.ops import sky as sky_ops
from vvr_tpu.ops.noise import snoise3
from vvr_tpu.ops.jump import SHADOW_CASCADE, SHADOW_PHASE1, trace_jump
from vvr_tpu.ops.traverse import trace
from vvr_tpu.utils.hash import hash33
from vvr_tpu.world.jumpgrid import JumpGrid, JumpGrid2

F32 = jnp.float32
I32 = jnp.int32


def make_tracer(accel, cfg: RenderConfig):
    """Uniform trace(o, d, ...) over either acceleration structure: the
    flat jump grid (ops/jump.py) or the hierarchical brick pyramid
    (ops/traverse.py). The jump kernel counts voxel sub-steps rather than
    node steps, so its cap scales up (a 256^3 corner-to-corner flat ray
    worst-cases ~770 sub-steps; jumps keep real rays far below)."""
    if isinstance(accel, JumpGrid):
        steps = cfg.traversal_max_steps * 8

        def tr(o, d, active=None, pack_first=None, with_stats=False,
               shadow=False):
            # sun-aligned shadow batches resolve on a steep survivor curve;
            # the shadow-tuned compaction schedule is ~1.7x faster there
            # (and ~1.4x SLOWER for primaries — keep them separate)
            return trace_jump(
                accel, o, d, max_steps=steps, active=active,
                pack_first=pack_first, with_stats=with_stats,
                phase1_groups=SHADOW_PHASE1 if shadow else 6,
                cascade=SHADOW_CASCADE if shadow else None)
        return tr

    if isinstance(accel, JumpGrid2):
        steps = cfg.traversal_max_steps * 8

        def tr2(o, d, active=None, pack_first=None, with_stats=False,
                shadow=False):
            from vvr_tpu.ops.jump2 import trace_jump2
            return trace_jump2(accel, o, d, max_steps=steps, active=active,
                               pack_first=pack_first, with_stats=with_stats)
        return tr2

    def tr(o, d, active=None, pack_first=None, with_stats=False,
           shadow=False):
        return trace(accel, o, d, max_steps=cfg.traversal_max_steps,
                     active=active, pack_first=pack_first,
                     with_stats=with_stats, use_full=False)
    return tr


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def heatmap(x):
    """Debug heatmap: blue -> green -> red over [0, 1]."""
    x = jnp.clip(x, 0.0, 1.0)[..., None]
    r = jnp.clip(2.0 * x - 1.0, 0.0, 1.0)
    g = 1.0 - jnp.abs(2.0 * x - 1.0)
    b = jnp.clip(1.0 - 2.0 * x, 0.0, 1.0)
    return jnp.concatenate([r, g, b], -1)


def raytrace_pass(pyr, o, d, skybox, clouds_tex, sun, time, cfg: RenderConfig,
                  svt_density=None, mirror_materials: bool = False,
                  lights=None, overlap_pyr=None, raster=None, sunmask=None,
                  band=None):
    """The megakernel as a wavefront (rays flat (N,3)). `pyr` is either
    acceleration structure (BrickPyramid or JumpGrid — make_tracer
    dispatches); `overlap_pyr` supplies the BrickPyramid the overlap-AO
    estimator needs when the tracer runs on the jump grid; `raster`
    (faces, cam, probe) switches bounce-0 visibility to the exposed-face
    rasterizer (ops/rastertrace.py) — rays must then be the unmasked
    camera wavefront; `band=(j0, band_h)` restricts the rasterizer to a
    pixel-row band (multi-chip sharding: rays are then the band's own —
    parallel/mesh.py). Returns (rgb (N,3), alpha (N,), first-hit debug
    dict)."""
    n = o.shape[0]
    size = pyr.size
    tr = make_tracer(pyr, cfg)
    colour = jnp.ones((n, 3), F32)
    out_rgb = jnp.zeros((n, 3), F32)
    alpha = jnp.zeros((n,), F32)
    active = jnp.ones((n,), bool)
    dbg = {}

    sun3 = sun[:3]
    sun_col = sky_ops.sun_colour(sun3)
    sun_colour_final = jnp.where(sun3[1] > 0, 3.2 * sun_col, 0.0)
    # blocked texture tables: full-width sky/cloud gathers index <=64K-row
    # tables (the fast gather regime; ops/sky.py block_clouds/block_skybox)
    clouds_blk = sky_ops.block_clouds(clouds_tex)
    skybox_blk = sky_ops.block_skybox(skybox)

    need_stats = cfg.debug_type in (DEBUG_ITERATIONS, DEBUG_BUFFER_FETCHES,
                                    DEBUG_EXIT_TYPE)
    for bounce in range(cfg.max_ray_iterations):
        if bounce == 0 and raster is not None:
            from vvr_tpu.ops.rastertrace import trace_raster
            faces, rcam, probe = raster
            j0, band_h = band if band is not None else (0, None)
            res = trace_raster(faces, rcam, d, probe, size,
                               cfg.render_width, cfg.render_height,
                               j0=j0, band_h=band_h)
        else:
            res = tr(o, d, active=active, with_stats=need_stats)
        hit = res.hit & active
        sgn = jnp.where(d >= 0, 1.0, -1.0)
        normal = shade_ops.get_face_normal(res.face, sgn)

        # exact hit reconstruction via ray-plane solve (raytracer.slang:169-177,
        # other.slang:36-43): the entry plane sits at axis_coord, +1 when
        # entering from the high side. All face-indexed values go through
        # selects — per-row dynamic indexing is a slow gather on TPU.
        face = res.face

        def sel_face(vec):
            return jnp.where(face == 0, vec[:, 0],
                             jnp.where(face == 1, vec[:, 1], vec[:, 2]))

        k = res.axis_coord.astype(F32)
        plane = k + jnp.where(sel_face(sgn) < 0, 1.0, 0.0)
        df = sel_face(d)
        dist = (plane - sel_face(o)) / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        world = o + d * dist[:, None]
        fsel = jnp.stack([face == 0, face == 1, face == 2], -1)
        world = jnp.where(fsel, plane[:, None], world)
        # hit voxel coordinate: exact on the face axis (we use the true hit
        # voxel; the reference floors the plane coordinate, which lands in
        # the *neighbour* cell on negative faces — a quirk we define away)
        block_pos = jnp.where(fsel, res.axis_coord[:, None],
                              jnp.floor(world).astype(I32))

        albedo, rough, metal, special = shade_ops.material_at(
            block_pos, size, mirror_materials)
        mirror = hit & (special > 0.8) & (metal > 0.0)
        shaded = hit & ~mirror

        if bounce == 0:
            dbg = dict(iterations=res.iterations, fetches=res.fetches,
                       missed_pops=res.missed_pops, normal=normal,
                       block_pos=block_pos, hit=hit, world=world)

        # ambient occlusion — "filtered" (raytracer.slang:274-277): density
        # sampled one voxel along the normal (-2 on negative axes);
        # "overlap": the planar overlap-query estimator (ops/overlap.py)
        if cfg.ambient_occlusion and cfg.ao_mode == "overlap":
            from vvr_tpu.ops.overlap import overlap_ao
            ao = overlap_ao(overlap_pyr if overlap_pyr is not None else pyr,
                            world, normal, face)
        elif cfg.ambient_occlusion and svt_density is not None:
            wtf = jnp.where(normal < 0, -2.0, normal)
            from vvr_tpu.world.svt import sample_density_trilinear
            ao = 1.0 - jnp.clip(
                sample_density_trilinear(svt_density, world + wtf) * 0.5, 0, 1)
        else:
            ao = jnp.ones((n,), F32)

        # sun shadows (raytracer.slang:326-351)
        shadow_start = world
        if cfg.pixelated_shadows:
            shadow_start = jnp.floor(world * 4.0) / 4.0
        # shadow rays exist only for shaded lanes facing the sun — lighting()
        # multiplies by max(n.l, 0), so n.l <= 0 lanes never need the trace
        sun_facing = jnp.sum(normal * sun3[None, :], -1) > 0.0
        shadow_active = shaded & sun_facing
        # front-pack them so misses/backfaces don't pay the traversal
        # gathers (cap 0.9n: terrain cameras reach ~80% hit fraction and a
        # cap overflow sends the excess to the full-width safety net)
        pack_cap = max((n * 9) // 10, 2048) if n >= 4096 else None
        if cfg.shadow_samples > 1:
            # cone classifier (ops/sunshadow.py soft_shadow_gate): ONE
            # classification answers all N jittered samples; only the
            # residue runs N per-sample DDAs, front-packed
            kh = jnp.zeros((n,), bool)
            km = jnp.zeros((n,), bool)
            dda_active = shadow_active
            dda_cap = pack_cap
            if sunmask is not None:
                from vvr_tpu.ops.sunshadow import soft_shadow_gate
                sm_e1, sm_e2, sm_grids = sunmask
                kh, km = soft_shadow_gate(shadow_start, sun3, sm_e1,
                                          sm_e2, sm_grids, shadow_active,
                                          size)
                dda_active = shadow_active & ~kh & ~km
                dda_cap = max(n // 4, 2048) if n >= 4096 else None
            shadow = jnp.zeros((n,), F32)
            for s in range(cfg.shadow_samples):
                rng = hash33(shadow_start * 23.12123545 + s * 30.43324) * 2.0 - 1.0
                sdir = _norm(sun3[None, :] + rng * 0.005)
                strength = jnp.power(jnp.clip(
                    jnp.sum(sdir * sun3, -1), 0.0, 1.0), 40.0)
                s_o = shadow_start + sun3 * 0.004 + sdir * 0.05
                s_dda = tr(s_o, sdir, active=dda_active,
                           pack_first=dda_cap, shadow=True).hit
                s_hit = kh | (~km & s_dda)
                cl = sky_ops.sample_clouds_blocked(
                    clouds_blk, cfg.clouds_resolution, sdir, shadow_start)
                shadow = shadow + jnp.where(
                    s_hit, 0.0, strength * (1.0 - cl[..., 3])) / cfg.shadow_samples
        elif cfg.shadow_samples == 1:
            s_o = shadow_start + sun3 * 0.05
            sdir = jnp.broadcast_to(sun3, (n, 3))
            if sunmask is not None:
                from vvr_tpu.ops.sunshadow import masked_shadow_hits
                sm_e1, sm_e2, sm_grids = sunmask
                s_hit = masked_shadow_hits(
                    tr, s_o, sun3, sm_e1, sm_e2, sm_grids,
                    shadow_active, size,
                    max(n // 10, 2048) if n >= 4096 else None,
                    accel=pyr if isinstance(pyr, JumpGrid) else None)
            else:
                s_hit = tr(s_o, sdir, active=shadow_active,
                           pack_first=pack_cap, shadow=True).hit
            cl = sky_ops.sample_clouds_blocked(
                clouds_blk, cfg.clouds_resolution, sdir, shadow_start)
            shadow = jnp.where(s_hit, 0.0, 1.0 - cl[..., 3])
        else:
            shadow = jnp.ones((n,), F32)

        # (debug_type == 0 — the rasterization path — is a separate pipeline:
        # render/raster.py, dispatched by the Renderer, not this megakernel)
        lit = shade_ops.lighting(
                world, albedo, normal, rough, metal,
                jnp.power(ao, 1.4), shadow, -d, jnp.broadcast_to(sun3, (n, 3)),
                sun_colour_final)
        # animated point lights (raytracer.slang:364-381 — the reference's
        # disabled loop, here behind cfg.point_lights): first 10 lights,
        # 10-unit radius, inverse-square falloff, shadow by distance compare
        if cfg.point_lights and lights is not None:
            for li in range(min(10, lights.shape[0])):
                lp = lights[li, :3]
                to_pos = shadow_start - lp[None, :]
                dist_l = jnp.linalg.norm(to_pos, axis=-1)
                near = shaded & (dist_l < 10.0)
                ldir = to_pos / jnp.maximum(dist_l, 1e-6)[:, None]
                lres = tr(jnp.broadcast_to(lp, (n, 3)), ldir, active=near,
                          pack_first=max(n // 8, 2048) if n >= 4096 else None)
                unshadowed = (lres.t + 0.1) > dist_l
                n_dot_l = jnp.clip(jnp.sum(normal * (-ldir), -1), 0.0, 1.0)
                s = jnp.clip(10.0 - dist_l, 0.0, 1.0)
                s = s * s * (3.0 - 2.0 * s)
                strength = s / jnp.maximum(dist_l * dist_l, 1e-4)
                lcol = hash33(jnp.full((3,), li * 3.21312, F32))
                add = (unshadowed & near).astype(F32) * n_dot_l * strength
                lit = lit + add[:, None] * lcol[None, :] * 0.3
        out_rgb = jnp.where(shaded[:, None], colour * lit, out_rgb)

        miss = active & ~res.hit
        # miss shader at full width from BLOCKED tables: the sky gathers
        # index <=64K-row tables (fast regime) instead of 393K/262K rows,
        # and no packing machinery is paid (a packed variant measured
        # worse — the index gathers + scatter at the pack cap exceeded the
        # blocked full-width gathers; round-3 ledger)
        sky_rgb = sky_ops.sample_skybox_and_clouds_blocked(
            skybox_blk, cfg.skybox_resolution, clouds_blk,
            cfg.clouds_resolution, o, d)
        out_rgb = jnp.where(miss[:, None], colour * sky_rgb, out_rgb)
        alpha = jnp.where(miss, 10.0, alpha)

        # mirror continuation (raytracer.slang:225-270)
        if mirror_materials:
            new_n = normal
            if cfg.wavy_reflections:
                new_n = _norm(normal + snoise3(world * 0.85 + time)[..., None] * 0.05)
            refl = d - 2.0 * jnp.sum(d * new_n, -1, keepdims=True) * new_n
            o = jnp.where(mirror[:, None], world + refl * 1e-3, o)
            d = jnp.where(mirror[:, None], refl, d)
            colour = jnp.where(mirror[:, None],
                               colour * albedo * metal[:, None], colour)
        active = mirror
        if not mirror_materials:
            break  # no lane can continue; skip dead bounces entirely

    out_rgb = jnp.where(active[:, None], 0.0, out_rgb)  # bounces exhausted
    return out_rgb, alpha, dbg


def _debug_image(dbg, cfg: RenderConfig, h: int, w: int, size: int):
    """Debug heatmaps (raytracer.slang:401-428), same normalizations."""
    if cfg.debug_type == DEBUG_ITERATIONS:
        return heatmap(dbg["iterations"].astype(F32).reshape(h, w) / 256.0)
    if cfg.debug_type == DEBUG_BUFFER_FETCHES:
        return heatmap(dbg["fetches"].astype(F32).reshape(h, w) / 32.0)
    if cfg.debug_type == DEBUG_NORMALS:
        return jnp.clip(dbg["normal"].reshape(h, w, 3), 0.0, 1.0)
    if cfg.debug_type == DEBUG_WORLD:
        return (dbg["block_pos"].reshape(h, w, 3) % 16).astype(F32) / 16.0
    if cfg.debug_type == DEBUG_EXIT_TYPE:
        # heatmap(num_entered_but_missed / 64) — raytracer.slang:421-423
        return heatmap(dbg["missed_pops"].astype(F32).reshape(h, w) / 64.0)
    return None


@functools.partial(jax.jit, static_argnames=("cfg", "mirror_materials"))
def render_frame(pyr, o, d, sun, time, cfg: RenderConfig,
                 svt_density=None, mirror_materials: bool = False,
                 lights=None, overlap_pyr=None, raster=None, sunmask=None,
                 sky=None):
    """Full frame: sky passes + raytrace + post. Rays must be the flattened
    (render_h * render_w) camera rays. `pyr` is either acceleration
    structure (see make_tracer); `raster` optionally supplies
    (faces, cam, probe) for rasterized primary visibility; `sky`
    optionally supplies prebuilt (skybox, clouds) textures (the renderer's
    cross-frame cache, renderer._sky — regenerated only when sun/quantized
    time move). Returns (u8 image (H, W, 3), hdr rgba (rh, rw, 4))."""
    rh, rw = cfg.render_height, cfg.render_width
    if sky is not None:
        skybox, clouds_tex = sky
    else:
        clouds_tex = sky_ops.write_clouds(sun[:3], time,
                                          cfg.clouds_resolution)
        skybox = sky_ops.write_skybox(sun[:3], time, cfg.skybox_resolution)

    rgb, alpha, dbg = raytrace_pass(pyr, o, d, skybox, clouds_tex, sun, time,
                                    cfg, svt_density, mirror_materials, lights,
                                    overlap_pyr, raster, sunmask)
    dbg_img = _debug_image(dbg, cfg, rh, rw, pyr.size)
    if dbg_img is not None:
        rgb = dbg_img.reshape(-1, 3)

    # post runs planar (4, rh, rw) — channel-minor images leave 4/128
    # lanes busy (ops/post.py layout note); the wavefront's flat (N,)
    # component columns reshape straight into planes
    hdr_p = jnp.stack([rgb[:, 0].reshape(rh, rw), rgb[:, 1].reshape(rh, rw),
                       rgb[:, 2].reshape(rh, rw), alpha.reshape(rh, rw)], 0)
    if cfg.bloom_enabled and dbg_img is None:
        bloom2 = post_ops.bloom_pyramid_p(hdr_p)
    else:
        bloom2 = jnp.zeros((4, max(rh >> 2, 1), max(rw >> 2, 1)), F32)
    img = post_ops.composite_p(hdr_p, bloom2, cfg.height, cfg.width,
                               cfg.bloom_strength,
                               cfg.bloom_enabled and dbg_img is None)
    return img, jnp.transpose(hdr_p, (1, 2, 0))
