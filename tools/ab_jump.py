"""TPU A/B: jump-grid flat traversal vs grouped pyramid HDDA on the
flagship composition (256^3 bench scene, 1080p primary + packed shadows).

Also sweeps the jump kernel's fetch_every / phase1 / cascade knobs, since
its survivor curve (jumps collapse empty space) differs from the pyramid's.

Run ONE at a time on the TPU: python tools/ab_jump.py [--survivors]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vvr_tpu.config import WorldConfig
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.ops.jump2 import trace_jump2
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.ops.traverse import trace
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.generator import assemble_dense, generate_world
    from vvr_tpu.world.jumpgrid import build_jump_grid, build_jump_grid2
    from vvr_tpu.world.pyramid import build_brick_pyramid

    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    pyr = build_brick_pyramid(occ)
    grid = build_jump_grid(occ)
    grid2 = build_jump_grid2(occ)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    o, d = camera_rays(cam, 1920, 1080)
    n = o.shape[0]
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71], np.float32))
    sun = sun / jnp.linalg.norm(sun)
    print(json.dumps({"n_rays": int(n), "device": str(jax.devices()[0]),
                      "rows_mib": round(grid.rows.nbytes / 2**20, 1)}),
          flush=True)

    if "--survivors" in sys.argv and "--shadow-tune" not in sys.argv:
        for groups in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
            res = trace_jump(grid, o, d, max_steps=groups * 6,
                             with_stats=True, compact=False)
            unresolved = int(np.asarray(
                (~res.hit & (res.iterations >= groups * 6 - 5)).sum()))
            print(json.dumps({"groups": groups,
                              "active_frac": round(unresolved / n, 4)}),
                  flush=True)
        return

    def flagship_pyr(grouped=False):
        res = trace(pyr, o, d, max_steps=256, with_stats=False,
                    use_full=False, grouped=grouped)
        hit = res.hit
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace(pyr, s_o, sdir, max_steps=256, active=hit,
                     pack_first=(n * 3) // 4, with_stats=False,
                     use_full=False, grouped=grouped)
        return res.t.sum() + sres.t.sum()

    def flagship_jump(fe, p1, cascade):
        res = trace_jump(grid, o, d, max_steps=2048, with_stats=False,
                         fetch_every=fe, phase1_groups=p1, cascade=cascade)
        hit = res.hit
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace_jump(grid, s_o, sdir, max_steps=2048, active=hit,
                          pack_first=(n * 3) // 4, with_stats=False,
                          fetch_every=fe, phase1_groups=p1, cascade=cascade)
        return res.t.sum() + sres.t.sum()

    def bench(fn, *args, **kw):
        np.asarray(fn(*args, **kw))
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            np.asarray(fn(*args, **kw))
            ts.append(time.monotonic() - t0)
        sec = float(np.median(ts))
        return round(sec * 1e3, 1), round(2 * n / sec / 1e6, 2)

    def flagship_jump2(fe, p1, cascade):
        res = trace_jump2(grid2, o, d, max_steps=2048, with_stats=False,
                          fetch_every=fe, phase1_groups=p1, cascade=cascade)
        hit = res.hit
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace_jump2(grid2, s_o, sdir, max_steps=2048, active=hit,
                           pack_first=(n * 3) // 4, with_stats=False,
                           fetch_every=fe, phase1_groups=p1, cascade=cascade)
        return res.t.sum() + sres.t.sum()

    def flagship_mix():
        """primary: pyramid any8B; shadow: jump kernel (one octant, the
        jump grid's best case — both kernels are oracle-exact so mixing
        keeps the composition exact)."""
        res = trace(pyr, o, d, max_steps=256, with_stats=False,
                    use_full=False)
        hit = res.hit
        w = o + d * res.t[:, None]
        s_o = w + sun[None, :] * 0.05
        sdir = jnp.broadcast_to(sun, (n, 3))
        sres = trace_jump(grid, s_o, sdir, max_steps=2048, active=hit,
                          pack_first=(n * 3) // 4, with_stats=False)
        return res.t.sum() + sres.t.sum()

    if "--raster" in sys.argv:
        from vvr_tpu.ops.rastertrace import trace_raster
        from vvr_tpu.ops.traverse import solid_at
        from vvr_tpu.world.faces import extract_merged_faces
        fd = extract_merged_faces(occ).device_tuple()
        right, up, fwd = cam.basis()
        th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
        ct = (jnp.asarray(cam.position, jnp.float32),
              jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
              jnp.asarray(fwd, jnp.float32), jnp.float32(th))
        probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))
        print(json.dumps({"faces": len(fset)}), flush=True)

        def raster_only():
            res = trace_raster(fd, ct, d, probe, 256, 1920, 1080)
            return res.t.sum()

        def raster_flagship():
            res = trace_raster(fd, ct, d, probe, 256, 1920, 1080)
            hit = res.hit
            w = o + d * jnp.where(hit, res.t, 0.0)[:, None]
            s_o = w + sun[None, :] * 0.05
            sdir = jnp.broadcast_to(sun, (n, 3))
            sres = trace_jump(grid, s_o, sdir, max_steps=2048, active=hit,
                              pack_first=(n * 3) // 4, with_stats=False)
            return res.t.sum() + sres.t.sum()

        ms, mrays = bench(jax.jit(raster_only))
        print(json.dumps({"kernel": "raster_primary_only", "ms": ms,
                          "mrays_both": mrays}), flush=True)
        ms, mrays = bench(jax.jit(raster_flagship))
        print(json.dumps({"kernel": "raster+jumpshadow", "ms": ms,
                          "mrays": mrays}), flush=True)

    if "--sunmask" in sys.argv:
        from vvr_tpu.ops.jump import SHADOW_CASCADE, SHADOW_PHASE1
        from vvr_tpu.ops.rastertrace import trace_raster
        from vvr_tpu.ops.sunshadow import (build_sun_grids,
                                           masked_shadow_hits, sun_basis)
        from vvr_tpu.ops.traverse import solid_at
        from vvr_tpu.world.faces import extract_merged_faces
        fd = extract_merged_faces(occ).device_tuple()
        right, up, fwd = cam.basis()
        th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
        ct = (jnp.asarray(cam.position, jnp.float32),
              jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
              jnp.asarray(fwd, jnp.float32), jnp.float32(th))
        probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))
        res = trace_raster(fd, ct, d, probe, 256, 1920, 1080)
        hit = jax.block_until_ready(res.hit)
        s_o = jax.block_until_ready(
            o + d * jnp.where(hit, res.t, 0.0)[:, None] + sun[None, :] * .05)

        e1, e2, s_ = sun_basis(np.asarray(sun))
        e1j, e2j = jnp.asarray(e1), jnp.asarray(e2)
        t0 = time.monotonic()
        grids, gok = jax.block_until_ready(build_sun_grids(
            fd, e1j, e2j, jnp.asarray(s_), 256))
        print(json.dumps({"grid_build_ms":
                          round((time.monotonic() - t0) * 1e3, 1),
                          "ok": bool(gok)}), flush=True)
        t0 = time.monotonic()
        grids, gok = jax.block_until_ready(build_sun_grids(
            fd, e1j, e2j, jnp.asarray(s_), 256))
        print(json.dumps({"grid_build_warm_ms":
                          round((time.monotonic() - t0) * 1e3, 1)}),
              flush=True)

        def tr(o_, d_, active=None, pack_first=None, with_stats=False,
               shadow=False):
            return trace_jump(grid, o_, d_, max_steps=2048, active=active,
                              pack_first=pack_first, with_stats=with_stats,
                              phase1_groups=SHADOW_PHASE1 if shadow else 6,
                              cascade=SHADOW_CASCADE if shadow else None)

        from vvr_tpu.ops.sunshadow import BACK, classify
        cs, _ = classify(s_o, e1j, e2j, sun, grids, 256)
        # light-certainty at the surface depth (the back-margin of
        # masked_shadow_hits == classify's light test at s_o - BACK*s)
        _, cl = classify(s_o - sun[None, :] * BACK, e1j, e2j, sun,
                         grids, 256)
        kh = hit & cs
        inw = jnp.all((s_o >= 0) & (s_o < 256), axis=-1)
        km = hit & ~kh & (cl | ~inw)
        amb = hit & ~kh & ~km
        stats = {k: int(np.asarray(v).sum()) for k, v in
                 (("shadow_lanes", hit), ("cs", cs), ("cl", cl),
                  ("known_hit", kh), ("known_miss", km),
                  ("ambiguous", amb))}
        print(json.dumps(stats), flush=True)

        def masked():
            return masked_shadow_hits(tr, s_o, sun, e1j, e2j,
                                      grids, hit, 256,
                                      n // 10).sum()

        def pure():
            return tr(s_o, jnp.broadcast_to(sun, (n, 3)), active=hit,
                      pack_first=(n * 9) // 10, shadow=True).hit.sum()

        a = int(np.asarray(jax.jit(masked)()))
        b = int(np.asarray(jax.jit(pure)()))
        print(json.dumps({"masked_hits": a, "pure_hits": b,
                          "equal": a == b}), flush=True)
        ms, _ = bench(jax.jit(masked))
        print(json.dumps({"kernel": "shadow_masked", "ms": ms}), flush=True)
        ms, _ = bench(jax.jit(pure))
        print(json.dumps({"kernel": "shadow_pure_dda", "ms": ms}),
              flush=True)
        return

    if "--shadow-tune" in sys.argv:
        # primary hits via the (cheap) rasterizer, then sweep the shadow
        # trace: kernel x (fe, p1, cascade, pack cap)
        from vvr_tpu.ops.rastertrace import trace_raster
        from vvr_tpu.ops.traverse import solid_at
        from vvr_tpu.world.faces import extract_merged_faces
        fd = extract_merged_faces(occ).device_tuple()
        right, up, fwd = cam.basis()
        th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
        ct = (jnp.asarray(cam.position, jnp.float32),
              jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
              jnp.asarray(fwd, jnp.float32), jnp.float32(th))
        probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))
        res = trace_raster(fd, ct, d, probe, 256, 1920, 1080)
        hit = jax.block_until_ready(res.hit)
        w = o + d * jnp.where(hit, res.t, 0.0)[:, None]
        s_o = jax.block_until_ready(w + sun[None, :] * 0.05)
        sdir = jnp.broadcast_to(sun, (n, 3))
        nhit = int(np.asarray(hit).sum())
        print(json.dumps({"shadow_lanes": nhit, "frac": round(nhit / n, 3)}),
              flush=True)

        if "--survivors" in sys.argv:
            for groups in (1, 2, 3, 4, 6, 8, 12):
                r2 = trace_jump(grid, s_o, sdir, max_steps=groups * 6,
                                active=hit, with_stats=True, compact=False)
                unresolved = int(np.asarray(
                    (~r2.hit & hit
                     & (r2.iterations >= groups * 6 - 5)).sum()))
                print(json.dumps({"groups": groups,
                                  "active_frac_of_hits":
                                      round(unresolved / max(nhit, 1), 4)}),
                      flush=True)
            return

        def sj(pack_num, pack_den, fe, p1, cascade):
            r2 = trace_jump(grid, s_o, sdir, max_steps=2048, active=hit,
                            pack_first=(n * pack_num) // pack_den,
                            with_stats=False, fetch_every=fe,
                            phase1_groups=p1, cascade=cascade)
            return r2.t.sum()

        def sp(pack_num, pack_den, fe, p1):
            r2 = trace(pyr, s_o, sdir, max_steps=256, active=hit,
                       pack_first=(n * pack_num) // pack_den,
                       with_stats=False, use_full=False, fetch_every=fe,
                       phase1_groups=p1)
            return r2.t.sum()

        fj_ = jax.jit(sj, static_argnums=(0, 1, 2, 3, 4))
        fp_ = jax.jit(sp, static_argnums=(0, 1, 2, 3))
        for args in ((17, 20, 6, 6, None),
                     (17, 20, 6, 3, ((1, 6, 1), (1, 40, 3), (1, 200, 0))),
                     (17, 20, 6, 4, ((1, 25, 2), (1, 100, 0))),
                     (17, 20, 6, 2, ((1, 4, 1), (1, 25, 2), (1, 100, 0))),
                     (9, 10, 6, 3, ((1, 6, 1), (1, 40, 3), (1, 200, 0))),
                     (17, 20, 4, 5, ((1, 20, 3), (1, 100, 0)))):
            try:
                ms, _ = bench(fj_, *args)
                print(json.dumps({"kernel": "jump", "args": args, "ms": ms}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"args": args, "error": str(e)[:160]}),
                      flush=True)
        for args in ((17, 20, 4, 10), (17, 20, 4, 6)):
            try:
                ms, _ = bench(fp_, *args)
                print(json.dumps({"kernel": "pyr", "args": args, "ms": ms}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"args": args, "error": str(e)[:160]}),
                      flush=True)
        return

    if "--mix" in sys.argv:
        fm = jax.jit(flagship_mix)
        ms, mrays = bench(fm)
        print(json.dumps({"kernel": "mix_pyr+jumpshadow", "ms": ms,
                          "mrays": mrays}), flush=True)
    if "--pyr" in sys.argv:
        fp = jax.jit(flagship_pyr, static_argnums=0)
        ms, mrays = bench(fp, False)
        print(json.dumps({"kernel": "pyramid", "ms": ms, "mrays": mrays}),
              flush=True)
    if "--pyrg" in sys.argv:
        fp = jax.jit(flagship_pyr, static_argnums=0)
        ms, mrays = bench(fp, True)
        print(json.dumps({"kernel": "pyramid_grouped", "ms": ms,
                          "mrays": mrays}), flush=True)

    # survivor-matched cascades (tools/ab_jump.py --survivors, v5e:
    # actives 65% @2 groups, 28% @3, 15.6% @4, 6.1% @6, 3% @8, 0.4% @12)
    CASCADES = {
        "svA": ((3, 8, 3), (1, 12, 6), (1, 100, 0)),
        "svB": ((7, 10, 2), (1, 5, 4), (1, 25, 6), (1, 200, 0)),
        "svC": ((3, 8, 3), (1, 25, 9), (1, 400, 0)),
    }
    runs = []
    for key in sys.argv[1:]:
        if key.startswith(("j:", "j2:")):
            kern, fe, p1, cn = key.split(":")
            runs.append(("jump" if kern == "j" else "jump2", int(fe),
                         int(p1), CASCADES.get(cn) if cn != "none" else None))
    fj = jax.jit(flagship_jump, static_argnames=("fe", "p1", "cascade"))
    fj2 = jax.jit(flagship_jump2, static_argnames=("fe", "p1", "cascade"))
    for kern, fe, p1, casc in runs:
        try:
            ms, mrays = bench(fj2 if kern == "jump2" else fj, fe, p1, casc)
            print(json.dumps({"kernel": kern, "fe": fe, "p1": p1,
                              "cascade": casc, "ms": ms, "mrays": mrays}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": kern, "fe": fe, "p1": p1,
                              "cascade": casc, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
