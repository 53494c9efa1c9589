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
from vvr_tpu.utils.hash import hash33, hash33_soa
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
               shadow=False, hard=False):
            # sun-aligned shadow batches resolve on a steep survivor curve;
            # the shadow-tuned compaction schedule is ~1.7x faster there
            # (and ~1.4x SLOWER for primaries — keep them separate).
            # `hard` marks pre-packed all-hard populations (the soft cone
            # RESIDUE): their survivor curve sits far above the full-width
            # shadow schedule's caps. hard="pref" = prefiltered by the
            # near-walk (only ~7.5% of lanes active -> pack immediately);
            # hard=True = raw residue (ops/jump.py RESIDUE_* constants)
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
            return trace_jump(
                accel, o, d, max_steps=steps, active=active,
                pack_first=pack_first, with_stats=with_stats,
                phase1_groups=ph, cascade=ca)
        return tr

    if isinstance(accel, JumpGrid2):
        steps = cfg.traversal_max_steps * 8

        def tr2(o, d, active=None, pack_first=None, with_stats=False,
                shadow=False, hard=False):
            from vvr_tpu.ops.jump2 import trace_jump2
            return trace_jump2(accel, o, d, max_steps=steps, active=active,
                               pack_first=pack_first, with_stats=with_stats)
        return tr2

    from vvr_tpu.world.paged import PagedGrid
    if isinstance(accel, PagedGrid):
        # voxel sub-steps dominate near surfaces like the flat grid's;
        # empty space costs far fewer (page jumps) — same cap scale
        steps = cfg.traversal_max_steps * 8

        def trp(o, d, active=None, pack_first=None, with_stats=False,
                shadow=False, hard=False):
            from vvr_tpu.ops.jump import RESIDUE_CASCADE, RESIDUE_PHASE1
            from vvr_tpu.ops.paged import (SHADOW_CASCADE, SHADOW_PHASE1,
                                           trace_paged)
            ph = ((RESIDUE_PHASE1 if hard else SHADOW_PHASE1)
                  if shadow else 6)
            ca = ((RESIDUE_CASCADE if hard else SHADOW_CASCADE)
                  if shadow else None)
            return trace_paged(
                accel, o, d, max_steps=steps, active=active,
                pack_first=pack_first, with_stats=with_stats,
                phase1_groups=ph, cascade=ca)
        return trp

    def tr(o, d, active=None, pack_first=None, with_stats=False,
           shadow=False, hard=False):
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
                  band=None, soft_residue_cap: int | None = None,
                  raster_cap: int | None = None,
                  collect_demand: bool = False,
                  force_wide: bool = False):
    """The megakernel as a wavefront (rays flat (N,3)). `pyr` is either
    acceleration structure (BrickPyramid or JumpGrid — make_tracer
    dispatches); `overlap_pyr` supplies the BrickPyramid the overlap-AO
    estimator needs when the tracer runs on the jump grid; `raster`
    (faces, cam, probe) switches bounce-0 visibility to the exposed-face
    rasterizer (ops/rastertrace.py) — rays must then be the unmasked
    camera wavefront; `band=(j0, band_h)` restricts the rasterizer to a
    pixel-row band (multi-chip sharding: rays are then the band's own —
    parallel/mesh.py). Returns ((r, g, b) flat channels, alpha (N,),
    first-hit debug dict).

    The whole shading tail runs SoA — channels as separate (N,) arrays.
    Any (N, k) intermediate with a tiny minor axis runs at k/128 lane
    utilization on TPU: the round-4 profile caught the AoS tail's
    select trees fused over f32[N,1] at 25.6 ms PER CHANNEL (~1 ms flat)
    plus ~30 ms of relayout copies. Traversal kernels keep their (N, 3)
    ray interface; (N, 3) stacks only appear on packed subsets or
    config-gated paths (AO, point lights, mirror bounces)."""
    n = o.shape[0]
    size = pyr.size
    tr = make_tracer(pyr, cfg)
    one_f = jnp.ones((n,), F32)
    zero_f = jnp.zeros((n,), F32)
    col_r = col_g = col_b = one_f
    out_r = out_g = out_b = zero_f
    alpha = zero_f
    active = jnp.ones((n,), bool)
    dbg = {}

    sun3 = sun[:3]
    sun_col = sky_ops.sun_colour(sun3)
    sun_colour_final = jnp.where(sun3[1] > 0, 3.2 * sun_col, 0.0)
    # blocked texture tables: full-width sky/cloud gathers index <=64K-row
    # tables (the fast gather regime; ops/sky.py block_clouds/block_skybox)
    clouds_blk = sky_ops.block_clouds(clouds_tex)
    skybox_blk = sky_ops.block_skybox(skybox)

    # SoA ray state (origin/direction change only on mirror continuation)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    d_aos = d  # bounce-0 AoS view for the traversal kernels

    need_stats = cfg.debug_type in (DEBUG_ITERATIONS, DEBUG_BUFFER_FETCHES,
                                    DEBUG_EXIT_TYPE)
    demand = {}  # collect_demand: per-bounce lane counts (cap sizing —
                 # tools/measure_config4_demand.py; a fired overflow net
                 # costs a full-width trace, ~0.8-1.1 s at 2M lanes)

    def _dem(key, mask):
        if collect_demand:
            demand[key] = jnp.sum(mask.astype(I32))

    def bounce_body(bounce, res, active, ox, oy, oz, dx, dy, dz,
                    col_r, col_g, col_b, dem):
        """Everything after a bounce's visibility trace, at ANY width —
        the full wavefront (bounce 0, small frames, demand collection) or
        a packed continuation cap (the bounce wave below). The round-4
        profile showed bounce>=1 shading running at full 2M width every
        bounce (~1.16 s of full-width gathers: AO trilinear, materials,
        per-sample clouds, miss sky) while <= 17% of lanes were active —
        packing the TRACE alone was not enough. Parameters shadow the
        caller's channel names on purpose: the body is the former loop
        body, verbatim, at its own width.

        Returns (out_r, out_g, out_b values, write-mask (shaded|miss),
        miss, mirror, next ray/colour channels x9, dbg-or-None)."""
        n = ox.shape[0]
        one_f = jnp.ones((n,), F32)
        zero_f = jnp.zeros((n,), F32)
        hit = res.hit & active
        dem("active", active)
        dem("hit", hit)
        sgx = jnp.where(dx >= 0, F32(1.0), F32(-1.0))
        sgy = jnp.where(dy >= 0, F32(1.0), F32(-1.0))
        sgz = jnp.where(dz >= 0, F32(1.0), F32(-1.0))
        face = res.face
        nx, ny, nz = shade_ops.get_face_normal_soa(face, sgx, sgy, sgz)

        # exact hit reconstruction via ray-plane solve (raytracer.slang:169-177,
        # other.slang:36-43): the entry plane sits at axis_coord, +1 when
        # entering from the high side. All face-indexed values go through
        # selects — per-row dynamic indexing is a slow gather on TPU.
        def sel_face(vx, vy, vz):
            return jnp.where(face == 0, vx, jnp.where(face == 1, vy, vz))

        k = res.axis_coord.astype(F32)
        plane = k + jnp.where(sel_face(sgx, sgy, sgz) < 0, F32(1.0), F32(0.0))
        df = sel_face(dx, dy, dz)
        dist = (plane - sel_face(ox, oy, oz)) / jnp.where(
            jnp.abs(df) < 1e-12, F32(1e-12), df)
        wx = jnp.where(face == 0, plane, ox + dx * dist)
        wy = jnp.where(face == 1, plane, oy + dy * dist)
        wz = jnp.where(face == 2, plane, oz + dz * dist)
        # hit voxel coordinate: exact on the face axis (we use the true hit
        # voxel; the reference floors the plane coordinate, which lands in
        # the *neighbour* cell on negative faces — a quirk we define away)
        bx = jnp.where(face == 0, res.axis_coord, jnp.floor(wx).astype(I32))
        by = jnp.where(face == 1, res.axis_coord, jnp.floor(wy).astype(I32))
        bz = jnp.where(face == 2, res.axis_coord, jnp.floor(wz).astype(I32))

        alb_r, alb_g, alb_b = shade_ops.material_at_soa(bx, by, bz, size)
        if mirror_materials:
            # hash-chosen 8^3 mirror block groups (material_at's rule);
            # metallic = (special > 0.8) so `mirror` needs only special
            from vvr_tpu.utils.hash import hash13_soa
            special = hash13_soa(jnp.floor(bx.astype(F32) / 8.0),
                                 jnp.floor(by.astype(F32) / 8.0),
                                 jnp.floor(bz.astype(F32) / 8.0))
            mirror = hit & (special > 0.8)
        else:
            mirror = jnp.zeros((n,), bool)
        shaded = hit & ~mirror

        dbg_l = None
        if bounce == 0:
            dbg_l = dict(iterations=res.iterations, fetches=res.fetches,
                         missed_pops=res.missed_pops, hit=hit,
                         normal_soa=(nx, ny, nz), block_soa=(bx, by, bz),
                         world_soa=(wx, wy, wz))

        # ambient occlusion — "filtered" (raytracer.slang:274-277): density
        # sampled one voxel along the normal (-2 on negative axes);
        # "overlap": the planar overlap-query estimator (ops/overlap.py).
        # Both estimators keep their (N, 3) interface (config-gated stacks).
        if cfg.ambient_occlusion and cfg.ao_mode == "overlap":
            from vvr_tpu.ops.overlap import overlap_ao
            world = jnp.stack([wx, wy, wz], -1)
            normal = jnp.stack([nx, ny, nz], -1)
            ao = overlap_ao(overlap_pyr if overlap_pyr is not None else pyr,
                            world, normal, face)
        elif cfg.ambient_occlusion and svt_density is not None:
            from vvr_tpu.world.svt import sample_density_trilinear
            probe_pt = jnp.stack(
                [wx + jnp.where(nx < 0, F32(-2.0), nx),
                 wy + jnp.where(ny < 0, F32(-2.0), ny),
                 wz + jnp.where(nz < 0, F32(-2.0), nz)], -1)
            ao = 1.0 - jnp.clip(
                sample_density_trilinear(svt_density, probe_pt) * 0.5, 0, 1)
        else:
            ao = one_f

        # sun shadows (raytracer.slang:326-351)
        ssx, ssy, ssz = wx, wy, wz
        if cfg.pixelated_shadows:
            ssx = jnp.floor(wx * 4.0) / 4.0
            ssy = jnp.floor(wy * 4.0) / 4.0
            ssz = jnp.floor(wz * 4.0) / 4.0
        miss = active & ~res.hit

        # merged cloud lookup (hard shadows): the shadow modulation (hit
        # lanes, surface point toward the sun) and the miss shader (miss
        # lanes, camera ray) gather the SAME blocked cloud table, and no
        # lane ever needs both — one merged full-width gather replaces two
        # (~25-32 ms each at 2M lanes, round-4 profile fusion.137/104).
        # Each lane's index/sub/valid equal the unmerged lookup's, so the
        # fetched values (and the frame) are bit-identical.
        merged_clouds = None
        if cfg.shadow_samples == 1:
            v_s, row_s, sub_s = sky_ops.clouds_idx_soa(
                cfg.clouds_resolution, sun3, ssx, ssy, ssz)
            v_m, row_m, sub_m = sky_ops.clouds_idx_soa(
                cfg.clouds_resolution, (dx, dy, dz), ox, oy, oz)
            use_s = res.hit
            merged_clouds = sky_ops.clouds_fetch_soa(
                clouds_blk,
                jnp.where(use_s, row_s, row_m),
                jnp.where(use_s, sub_s, sub_m),
                jnp.where(use_s, v_s, v_m))
        # shadow rays exist only for shaded lanes facing the sun — lighting()
        # multiplies by max(n.l, 0), so n.l <= 0 lanes never need the trace
        sun_facing = (nx * sun3[0] + ny * sun3[1] + nz * sun3[2]) > 0.0
        shadow_active = shaded & sun_facing
        dem("shadow_active", shadow_active)
        # front-pack them so misses/backfaces don't pay the traversal
        # gathers (cap 0.9n: terrain cameras reach ~80% hit fraction and a
        # cap overflow sends the excess to the full-width safety net).
        # Every capacity scales with THIS body's width n — bounce>=1
        # bodies run at the packed continuation cap, so the old bshrink
        # factors are subsumed by the width itself
        pack_cap = (max((n * 9) // 10, 2048) if n >= 4096 else None)
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
                kh, km = soft_shadow_gate((ssx, ssy, ssz), sun3, sm_e1,
                                          sm_e2, sm_grids, shadow_active,
                                          size)
                dda_active = shadow_active & ~kh & ~km
                dem("soft_kh", kh)
                dem("soft_km", km)
                dem("soft_dda_residue", dda_active)
                dda_cap = max(n // 4, 2048) if n >= 4096 else None
            def sample_dir(s, px, py, pz):
                """Jittered sun direction + strength for sample `s` at
                surface channels (px,py,pz) — raytracer.slang:332-342."""
                c1, c2 = F32(23.12123545), F32(s * 30.43324)
                rx, ry, rz = hash33_soa(px * c1 + c2, py * c1 + c2,
                                        pz * c1 + c2)
                sdx = sun3[0] + (rx * 2.0 - 1.0) * 0.005
                sdy = sun3[1] + (ry * 2.0 - 1.0) * 0.005
                sdz = sun3[2] + (rz * 2.0 - 1.0) * 0.005
                sn = jnp.maximum(jnp.sqrt(sdx * sdx + sdy * sdy
                                          + sdz * sdz), 1e-12)
                sdx, sdy, sdz = sdx / sn, sdy / sn, sdz / sn
                strength = jnp.power(jnp.clip(
                    sdx * sun3[0] + sdy * sun3[1] + sdz * sun3[2],
                    0.0, 1.0), 40.0)
                return sdx, sdy, sdz, strength

            def ray_start(px, py, pz, sdx, sdy, sdz):
                return (px + sun3[0] * 0.004 + sdx * 0.05,
                        py + sun3[1] * 0.004 + sdy * 0.05,
                        pz + sun3[2] * 0.004 + sdz * 0.05)

            S = cfg.shadow_samples
            s_ddas = None
            if n >= 4096 and sunmask is not None:
                # batched residue DDA: dda_active is SAMPLE-INDEPENDENT
                # (the cone gate covers the whole jitter disc), so pack
                # the residue once and trace all S jittered samples in
                # ONE call — S packs + S trace launches (each with its
                # fixed phase1 cost over n/4 lanes) collapse into one
                # nonzero + one launch over S*cap1 tightly packed lanes.
                # Demand above cap1 runs FURTHER WAVES of the same shape
                # (lax.while; each wave clears >= 1 lane). The previous
                # full-width overflow net EXECUTED in the steady state —
                # the measured bench-camera residue is 0.196n (post
                # S-support erosion; was 0.278n before it —
                # tools/measure_config4_demand.py) against the n/8 cap
                # (2 waves), and the old net's S full-width masked traces
                # cost 1101 ms of config 4's 4383 (round-4 profile cond.32)
                cap1 = soft_residue_cap or max(n // 8, 4096)
                # two-stage grouped pack: ~3x cheaper than a full-width
                # nonzero at 2M lanes (ops/pack.py; cone residue clusters
                # on silhouettes like the hard-shadow ambiguity does)
                from vvr_tpu.ops.pack import pack_indices_grouped

                # near-walk + lift prefilter (jump-grid scenes): most
                # sample rays resolve LOCALLY (silhouette wall) or lift
                # above the surface texel's cone gridC (certain light,
                # depth is monotone along the ray) — only the remainder
                # pays the DDA (ops/sunshadow.py near_walk_classify)
                use_walk = isinstance(pyr, JumpGrid)

                def wave(c):
                    todo, acc = c
                    idx, p_valid = pack_indices_grouped(todo, cap1)
                    safe = jnp.minimum(idx, n - 1)
                    pxs, pys, pzs = ssx[safe], ssy[safe], ssz[safe]
                    bo, bd = [], []
                    for s in range(S):
                        sdx, sdy, sdz, _ = sample_dir(s, pxs, pys, pzs)
                        sox_, soy_, soz_ = ray_start(pxs, pys, pzs,
                                                     sdx, sdy, sdz)
                        bo.append(jnp.stack([sox_, soy_, soz_], -1))
                        bd.append(jnp.stack([sdx, sdy, sdz], -1))
                    bo_cat = jnp.concatenate(bo, 0)
                    bd_cat = jnp.concatenate(bd, 0)
                    act = jnp.tile(p_valid, S)
                    if use_walk:
                        import math as _math
                        from vvr_tpu.ops.sunshadow import \
                            near_walk_classify
                        gBCg, _, ga0, gb0, gts = sm_grids
                        gres = int(_math.isqrt(gBCg.shape[0]))
                        qa = (pxs * sm_e1[0] + pys * sm_e1[1]
                              + pzs * sm_e1[2])
                        qb = (pxs * sm_e2[0] + pys * sm_e2[1]
                              + pzs * sm_e2[2])
                        gi = jnp.floor((qa - ga0) / gts).astype(I32)
                        gj = jnp.floor((qb - gb0) / gts).astype(I32)
                        ginb = ((gi >= 0) & (gi < gres)
                                & (gj >= 0) & (gj < gres))
                        rowC = jnp.take(
                            gBCg, jnp.where(ginb, gj * gres + gi, 0),
                            axis=0, mode="clip")[:, 1]
                        rowC = jnp.where(ginb, rowC, F32(3e38))
                        kh2, km2 = near_walk_classify(
                            pyr, bo_cat, bd_cat, jnp.tile(rowC, S),
                            sun3, size)
                        act_dda = act & ~kh2 & ~km2
                        dda = tr(bo_cat, bd_cat, active=act_dda,
                                 shadow=True, hard="pref").hit
                        bhit = ((act & kh2)
                                | (act_dda & dda)).reshape(S, cap1)
                    else:
                        bhit = tr(bo_cat, bd_cat, active=act,
                                  shadow=True, hard=True).hit.reshape(
                                      S, cap1)
                    idxw = jnp.where(p_valid, idx, n)
                    acc = acc.at[:, idxw].set(bhit, mode="drop")
                    todo = todo & ~jnp.zeros((n,), bool).at[idxw].set(
                        True, mode="drop")
                    return todo, acc

                _, acc = jax.lax.while_loop(
                    lambda c: jnp.any(c[0]), wave,
                    (dda_active, jnp.zeros((S, n), bool)))
                s_ddas = list(acc)

            shadow = zero_f
            for s in range(S):
                sdx, sdy, sdz, strength = sample_dir(s, ssx, ssy, ssz)
                if s_ddas is not None:
                    s_dda = s_ddas[s]
                else:
                    sox_, soy_, soz_ = ray_start(ssx, ssy, ssz,
                                                 sdx, sdy, sdz)
                    s_dda = tr(jnp.stack([sox_, soy_, soz_], -1),
                               jnp.stack([sdx, sdy, sdz], -1),
                               active=dda_active, pack_first=dda_cap,
                               shadow=True).hit
                s_hit = kh | (~km & s_dda)
                _, _, _, cl_a = sky_ops.sample_clouds_blocked_soa(
                    clouds_blk, cfg.clouds_resolution, (sdx, sdy, sdz),
                    ssx, ssy, ssz)
                shadow = shadow + jnp.where(
                    s_hit, 0.0, strength * (1.0 - cl_a)) / S
        elif cfg.shadow_samples == 1:
            s_o = (ssx + sun3[0] * 0.05, ssy + sun3[1] * 0.05,
                   ssz + sun3[2] * 0.05)
            if sunmask is not None:
                from vvr_tpu.ops.sunshadow import masked_shadow_hits
                sm_e1, sm_e2, sm_grids = sunmask
                s_hit = masked_shadow_hits(
                    tr, s_o, sun3, sm_e1, sm_e2, sm_grids,
                    shadow_active, size,
                    max(n // 10, 2048) if n >= 4096 else None,
                    accel=pyr if isinstance(pyr, JumpGrid) else None)
            else:
                s_hit = tr(jnp.stack(s_o, -1),
                           jnp.broadcast_to(sun3, (n, 3)),
                           active=shadow_active,
                           pack_first=pack_cap, shadow=True).hit
            cl_a = merged_clouds[3]  # hit lanes carry the shadow sample
            shadow = jnp.where(s_hit, 0.0, 1.0 - cl_a)
        else:
            shadow = one_f

        # (debug_type == 0 — the rasterization path — is a separate pipeline:
        # render/raster.py, dispatched by the Renderer, not this megakernel)
        lit_r, lit_g, lit_b = shade_ops.lighting_soa(
            (alb_r, alb_g, alb_b), (nx, ny, nz), jnp.float32(0.80),
            jnp.power(ao, 1.4), shadow, (-dx, -dy, -dz), sun3,
            sun_colour_final)
        # animated point lights (raytracer.slang:364-381 — the reference's
        # disabled loop, here behind cfg.point_lights): first 10 lights,
        # 10-unit radius, inverse-square falloff, shadow by distance compare
        if cfg.point_lights and lights is not None:
            for li in range(min(10, lights.shape[0])):
                lp = lights[li, :3]
                tpx, tpy, tpz = ssx - lp[0], ssy - lp[1], ssz - lp[2]
                dist_l = jnp.sqrt(tpx * tpx + tpy * tpy + tpz * tpz)
                near = shaded & (dist_l < 10.0)
                inv_l = 1.0 / jnp.maximum(dist_l, 1e-6)
                ldx, ldy, ldz = tpx * inv_l, tpy * inv_l, tpz * inv_l
                lres = tr(jnp.broadcast_to(lp, (n, 3)),
                          jnp.stack([ldx, ldy, ldz], -1), active=near,
                          pack_first=max(n // 8, 2048) if n >= 4096 else None)
                unshadowed = (lres.t + 0.1) > dist_l
                n_dot_l = jnp.clip(-(nx * ldx + ny * ldy + nz * ldz),
                                   0.0, 1.0)
                s = jnp.clip(10.0 - dist_l, 0.0, 1.0)
                s = s * s * (3.0 - 2.0 * s)
                strength = s / jnp.maximum(dist_l * dist_l, 1e-4)
                lcol = hash33(jnp.full((3,), li * 3.21312, F32))
                add = (unshadowed & near).astype(F32) * n_dot_l * strength
                lit_r = lit_r + add * (lcol[0] * 0.3)
                lit_g = lit_g + add * (lcol[1] * 0.3)
                lit_b = lit_b + add * (lcol[2] * 0.3)
        o_vr = col_r * lit_r     # valid where shaded (write-mask below)
        o_vg = col_g * lit_g
        o_vb = col_b * lit_b

        # miss shader at full width from BLOCKED tables: the sky gathers
        # index <=64K-row tables (fast regime) instead of 393K/262K rows,
        # and no packing machinery is paid (a packed variant measured
        # worse — the index gathers + scatter at the pack cap exceeded the
        # blocked full-width gathers; round-3 ledger, re-confirmed round 4
        # at 107.6 vs 84.6 ms standalone, tools/microbench_skymiss.py)
        if merged_clouds is not None:
            # miss lanes carry the camera-ray cloud sample (merged gather)
            cr_m, cg_m, cb_m, ca_m = merged_clouds
            s_r, s_g, s_b = sky_ops.sample_skybox_blocked_soa(
                skybox_blk, cfg.skybox_resolution, dx, dy, dz)
            sky_r = s_r + (cr_m - s_r) * ca_m
            sky_g = s_g + (cg_m - s_g) * ca_m
            sky_b = s_b + (cb_m - s_b) * ca_m
        else:
            sky_r, sky_g, sky_b = \
                sky_ops.sample_skybox_and_clouds_blocked_soa(
                    skybox_blk, cfg.skybox_resolution, clouds_blk,
                    cfg.clouds_resolution, (ox, oy, oz), dx, dy, dz)
        o_vr = jnp.where(miss, col_r * sky_r, o_vr)
        o_vg = jnp.where(miss, col_g * sky_g, o_vg)
        o_vb = jnp.where(miss, col_b * sky_b, o_vb)

        # mirror continuation (raytracer.slang:225-270)
        if mirror_materials:
            nnx, nny, nnz = nx, ny, nz
            if cfg.wavy_reflections:
                world = jnp.stack([wx, wy, wz], -1)
                sn3 = snoise3(world * 0.85 + time) * 0.05
                nnx, nny, nnz = nx + sn3, ny + sn3, nz + sn3
                inv_n = 1.0 / jnp.maximum(
                    jnp.sqrt(nnx * nnx + nny * nny + nnz * nnz), 1e-12)
                nnx, nny, nnz = nnx * inv_n, nny * inv_n, nnz * inv_n
            dd2 = 2.0 * (dx * nnx + dy * nny + dz * nnz)
            rfx = dx - dd2 * nnx
            rfy = dy - dd2 * nny
            rfz = dz - dd2 * nnz
            ox = jnp.where(mirror, wx + rfx * 1e-3, ox)
            oy = jnp.where(mirror, wy + rfy * 1e-3, oy)
            oz = jnp.where(mirror, wz + rfz * 1e-3, oz)
            dx = jnp.where(mirror, rfx, dx)
            dy = jnp.where(mirror, rfy, dy)
            dz = jnp.where(mirror, rfz, dz)
            # colour *= albedo * metallic; metallic == 1 on mirror lanes
            col_r = jnp.where(mirror, col_r * alb_r, col_r)
            col_g = jnp.where(mirror, col_g * alb_g, col_g)
            col_b = jnp.where(mirror, col_b * alb_b, col_b)
        dem("mirror", mirror)
        return (o_vr, o_vg, o_vb, shaded | miss, miss, mirror,
                ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, dbg_l)

    # ---- the bounce loop ----
    # bounce 0 runs the body at full width (every lane is live). From
    # bounce 1 on, the continuation set is sparse (measured at the bench
    # camera: 0.173n / 0.114n / 0.043n — mirrors cluster, no geometric
    # decay), so the ENTIRE bounce — trace AND shading — runs inside a
    # cap-wide wave: pack the continuations (two-stage grouped), key-sort
    # by (direction octant, origin superbrick) for traversal locality,
    # trace + shade at cap width, scatter the output writes and the next
    # continuation set. Demand above the cap runs further waves (each
    # clears >= 1 lane; exact at any demand). force_wide and
    # collect_demand keep the old full-width bounces (equality testing /
    # demand measurement).
    use_wave = (mirror_materials and n >= 4096 and not collect_demand
                and not force_wide)
    g_sb = max(size // 8, 1)

    for bounce in range(cfg.max_ray_iterations):
        def dem_b(key, mask, _b=bounce):
            _dem(f"b{_b}_{key}", mask)

        if bounce == 0 or not use_wave:
            if bounce == 0 and raster is not None:
                from vvr_tpu.ops.rastertrace import trace_raster
                faces, rcam, probe = raster
                j0, band_h = band if band is not None else (0, None)
                # adaptive entry capacity (renderer sizes it from the
                # scene's face count): at 1024^3 the default 1<<20
                # overflowed and sent thousands of faces through the
                # full-screen net, ~5.1 s of the 6.5 s config-5 frame
                # (tools/profile_config5.py)
                kw = ({} if raster_cap is None
                      else {"cap_entries": raster_cap})
                res = trace_raster(faces, rcam, d_aos, probe, size,
                                   cfg.render_width, cfg.render_height,
                                   j0=j0, band_h=band_h, **kw)
            elif bounce == 0:
                res = tr(o, d_aos, active=active, with_stats=need_stats)
            else:
                res = tr(jnp.stack([ox, oy, oz], -1), d_aos,
                         active=active)
            (o_vr, o_vg, o_vb, omask, missb, mirror, ox, oy, oz,
             dx, dy, dz, col_r, col_g, col_b, dbg_l) = bounce_body(
                bounce, res, active, ox, oy, oz, dx, dy, dz,
                col_r, col_g, col_b, dem_b)
            if bounce == 0:
                dbg = dbg_l
            out_r = jnp.where(omask, o_vr, out_r)
            out_g = jnp.where(omask, o_vg, out_g)
            out_b = jnp.where(omask, o_vb, out_b)
            alpha = jnp.where(missb, F32(10.0), alpha)
            active = mirror
            if mirror_materials:
                d_aos = jnp.stack([dx, dy, dz], -1)
        else:
            cap = (max(n // 4, 2048) if bounce == 1
                   else max(n // 6, 2048) if bounce == 2
                   else max(n // 16, 2048))
            from vvr_tpu.ops.pack import pack_indices_grouped

            def bwave(c, _cap=cap, _b=bounce):
                (todo, w_or, w_og, w_ob, w_al, cox, coy, coz, cdx, cdy,
                 cdz, ccr, ccg, ccb, nact) = c
                idx, p_valid = pack_indices_grouped(todo, _cap)
                safe = jnp.minimum(idx, n - 1)
                # key-sort at cap width (pack first: a full-width argsort
                # costs ~3x the grouped pack at 2M lanes)
                sbx = jnp.clip(cox[safe], 0, size - 1).astype(I32) >> 3
                sby = jnp.clip(coy[safe], 0, size - 1).astype(I32) >> 3
                sbz = jnp.clip(coz[safe], 0, size - 1).astype(I32) >> 3
                octk = ((cdx[safe] > 0).astype(I32)
                        + 2 * (cdy[safe] > 0).astype(I32)
                        + 4 * (cdz[safe] > 0).astype(I32))
                key = jnp.where(
                    p_valid,
                    octk * (g_sb * g_sb * g_sb)
                    + sbx + sby * g_sb + sbz * (g_sb * g_sb),
                    jnp.iinfo(jnp.int32).max)
                so = jnp.argsort(key)
                ridx = jnp.where(p_valid, idx, n)[so]
                valid = p_valid[so]
                sf = jnp.minimum(ridx, n - 1)
                box, boy, boz = cox[sf], coy[sf], coz[sf]
                bdx, bdy, bdz = cdx[sf], cdy[sf], cdz[sf]
                bcr, bcg, bcb = ccr[sf], ccg[sf], ccb[sf]
                sub = tr(jnp.stack([box, boy, boz], -1),
                         jnp.stack([bdx, bdy, bdz], -1), active=valid)
                (o_vr, o_vg, o_vb, omask, missb, mirror, nox, noy, noz,
                 ndx, ndy, ndz, ncr, ncg, ncb, _) = bounce_body(
                    _b, sub, valid, box, boy, boz, bdx, bdy, bdz,
                    bcr, bcg, bcb, lambda *_: None)
                w = jnp.where(valid & omask, ridx, n)
                w_or = w_or.at[w].set(o_vr, mode="drop")
                w_og = w_og.at[w].set(o_vg, mode="drop")
                w_ob = w_ob.at[w].set(o_vb, mode="drop")
                w_al = w_al.at[jnp.where(valid & missb, ridx, n)].set(
                    F32(10.0), mode="drop")
                cw = jnp.where(valid & mirror, ridx, n)
                cox = cox.at[cw].set(nox, mode="drop")
                coy = coy.at[cw].set(noy, mode="drop")
                coz = coz.at[cw].set(noz, mode="drop")
                cdx = cdx.at[cw].set(ndx, mode="drop")
                cdy = cdy.at[cw].set(ndy, mode="drop")
                cdz = cdz.at[cw].set(ndz, mode="drop")
                ccr = ccr.at[cw].set(ncr, mode="drop")
                ccg = ccg.at[cw].set(ncg, mode="drop")
                ccb = ccb.at[cw].set(ncb, mode="drop")
                nact = nact.at[cw].set(True, mode="drop")
                todo = todo & ~jnp.zeros((n,), bool).at[
                    jnp.where(valid, ridx, n)].set(True, mode="drop")
                return (todo, w_or, w_og, w_ob, w_al, cox, coy, coz,
                        cdx, cdy, cdz, ccr, ccg, ccb, nact)

            st = (active, out_r, out_g, out_b, alpha, ox, oy, oz,
                  dx, dy, dz, col_r, col_g, col_b,
                  jnp.zeros((n,), bool))
            st = jax.lax.while_loop(lambda c: jnp.any(c[0]), bwave, st)
            (_, out_r, out_g, out_b, alpha, ox, oy, oz, dx, dy, dz,
             col_r, col_g, col_b, active) = st
        if not mirror_materials:
            break  # no lane can continue; skip dead bounces entirely

    out_r = jnp.where(active, F32(0.0), out_r)  # bounces exhausted
    out_g = jnp.where(active, F32(0.0), out_g)
    out_b = jnp.where(active, F32(0.0), out_b)
    if collect_demand:
        dbg["demand"] = demand
    return (out_r, out_g, out_b), alpha, dbg


def _debug_image(dbg, cfg: RenderConfig, h: int, w: int, size: int):
    """Debug heatmaps (raytracer.slang:401-428), same normalizations."""
    if cfg.debug_type == DEBUG_ITERATIONS:
        return heatmap(dbg["iterations"].astype(F32).reshape(h, w) / 256.0)
    if cfg.debug_type == DEBUG_BUFFER_FETCHES:
        return heatmap(dbg["fetches"].astype(F32).reshape(h, w) / 32.0)
    if cfg.debug_type == DEBUG_NORMALS:
        return jnp.clip(jnp.stack(dbg["normal_soa"], -1).reshape(h, w, 3),
                        0.0, 1.0)
    if cfg.debug_type == DEBUG_WORLD:
        return (jnp.stack(dbg["block_soa"], -1).reshape(h, w, 3)
                % 16).astype(F32) / 16.0
    if cfg.debug_type == DEBUG_EXIT_TYPE:
        # heatmap(num_entered_but_missed / 64) — raytracer.slang:421-423
        return heatmap(dbg["missed_pops"].astype(F32).reshape(h, w) / 64.0)
    return None


@functools.partial(jax.jit, static_argnames=("cfg", "mirror_materials",
                                             "soft_residue_cap",
                                             "raster_cap", "force_wide"))
def render_frame(pyr, o, d, sun, time, cfg: RenderConfig,
                 svt_density=None, mirror_materials: bool = False,
                 lights=None, overlap_pyr=None, raster=None, sunmask=None,
                 sky=None, soft_residue_cap: int | None = None,
                 raster_cap: int | None = None, force_wide: bool = False):
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

    (r, g, b), alpha, dbg = raytrace_pass(pyr, o, d, skybox, clouds_tex,
                                          sun, time, cfg, svt_density,
                                          mirror_materials, lights,
                                          overlap_pyr, raster, sunmask,
                                          soft_residue_cap=soft_residue_cap,
                                          raster_cap=raster_cap,
                                          force_wide=force_wide)
    dbg_img = _debug_image(dbg, cfg, rh, rw, pyr.size)
    if dbg_img is not None:
        r, g, b = (dbg_img[..., 0].reshape(-1), dbg_img[..., 1].reshape(-1),
                   dbg_img[..., 2].reshape(-1))

    # post runs planar (4, rh, rw) — channel-minor images leave 4/128
    # lanes busy (ops/post.py layout note); the wavefront's flat (N,)
    # channels reshape straight into planes (SoA end-to-end)
    hdr_p = jnp.stack([r.reshape(rh, rw), g.reshape(rh, rw),
                       b.reshape(rh, rw), alpha.reshape(rh, rw)], 0)
    if cfg.bloom_enabled and dbg_img is None:
        bloom2 = post_ops.bloom_pyramid_p(hdr_p)
    else:
        bloom2 = jnp.zeros((4, max(rh >> 2, 1), max(rw >> 2, 1)), F32)
    img = post_ops.composite_p(hdr_p, bloom2, cfg.height, cfg.width,
                               cfg.bloom_strength,
                               cfg.bloom_enabled and dbg_img is None)
    return img, jnp.transpose(hdr_p, (1, 2, 0))
