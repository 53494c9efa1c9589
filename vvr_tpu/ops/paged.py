"""Paged two-level traversal — the 1024^3-scale kernel (world/paged.py).

Same wavefront shape as ops/jump.py (fetch/alu groups + straggler
compaction cascade), with a three-level ray state instead of the flat
grid's two:

  pend_pg  : needs the PAGE row — empty pages are crossed in one fetch
             via the per-octant page jump radius (32-voxel granularity);
             non-empty pages latch the 64-bit superbrick mask + pool
             base into registers;
  in-page  : DDA over the page's 4^3 superbricks against the REGISTER
             mask — empty superbricks inside partial pages cost zero
             fetches; an occupied superbrick computes its pool row by
             prefix popcount (the reference's child indexing,
             shaders/ray_stuff_other.slang:216-224, at 8^3 granularity);
  pend_pl / in-brick : the pool-row fetch + the flat kernel's exact
             in-brick voxel DDA (2^3-subcell skips included).

Every gather table stays small (page table 32K rows at 1024^3; pool
~100K rows) and — decisive at this scale — the FETCH COUNT per ray
drops: empty space costs one fetch per 32..480 voxels instead of one
per 8.., and in-page empty superbricks cost none.

Hit contract identical to ops/traverse.trace / ops/jump.trace_jump
(TraceResult; oracle-equality tested in tests/test_paged.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vvr_tpu.ops.traverse import BIG_T, TraceResult, _run_groups, _sel3
from vvr_tpu.world.occupancy import brick_solid
from vvr_tpu.world.paged import PG, PagedGrid

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

FETCH_EVERY = 6
PHASE1_GROUPS = 6
SHADOW_PHASE1 = 3
SHADOW_CASCADE = ((1, 6, 1), (1, 40, 3), (1, 200, 0))


def _mask_bit(mlo, mhi, bit):
    word = jnp.where(bit >= 32, mhi, mlo)
    return ((word >> (bit & 31).astype(U32)) & U32(1)) == 1


def _pool_offset(mlo, mhi, bit):
    """popcount(mask & ((1 << bit) - 1)) for a (lo, hi) u64 pair — the
    reference's popcount-prefix child indexing
    (shaders/ray_stuff_other.slang:216-224) at superbrick granularity."""
    below_lo = jnp.where(bit >= 32, U32(0xFFFFFFFF),
                         (U32(1) << jnp.minimum(bit, 31).astype(U32))
                         - U32(1))
    below_hi = jnp.where(
        bit >= 32,
        (U32(1) << jnp.maximum(bit - 32, 0).astype(U32)) - U32(1), U32(0))
    return (jax.lax.population_count(mlo & below_lo).astype(I32)
            + jax.lax.population_count(mhi & below_hi).astype(I32))


def _make_stepper(grid: PagedGrid, ray, max_steps: int, count_stats: bool):
    size = grid.size
    p = grid.psize
    prows = grid.prows
    brows = grid.brows
    (ox, oy, oz, dx, dy, dz, ix_, iy_, iz_, sx, sy, sz, px_, py_, pz_) = ray
    oct_sh = (4 * (px_ | (py_ << 1) | (pz_ << 2))).astype(U32)

    def pg_addr(vx, vy, vz):
        return (vx >> 5) + (vy >> 5) * p + (vz >> 5) * p * p

    def fetch(s):
        """One page gather + one pool gather per fetch slot (lanes use
        whichever their mode pends on; the other clips to row 0)."""
        act = s["act"]
        did_pg = s["pend_pg"] & act
        did_pl = s["pend_pl"] & act
        prow = jnp.take(prows, jnp.where(did_pg, s["addr_pg"], 0), axis=0,
                        mode="clip")
        brow = jnp.take(brows, jnp.where(did_pl, s["addr_pl"], 0), axis=0,
                        mode="clip")
        out = dict(s)

        # --- page row: jump across empty pages / latch mask + base ---
        dval = ((prow[:, 3] >> oct_sh) & U32(15)).astype(I32)
        jmp = did_pg & (dval > 0)
        ent = did_pg & (dval == 0)
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        bx, by, bz = vx >> 5, vy >> 5, vz >> 5
        exx = jnp.where(dx > 0, (bx + dval) * PG, (bx - dval + 1) * PG)
        exy = jnp.where(dy > 0, (by + dval) * PG, (by - dval + 1) * PG)
        exz = jnp.where(dz > 0, (bz + dval) * PG, (bz - dval + 1) * PG)
        tx = jnp.where(dx == 0.0, F32(BIG_T), (exx.astype(F32) - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (exy.astype(F32) - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (exz.astype(F32) - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        lo_x = jnp.where(dx > 0, bx * PG, (bx - dval + 1) * PG)
        hi_x = jnp.where(dx > 0, (bx + dval) * PG - 1, bx * PG + PG - 1)
        lo_y = jnp.where(dy > 0, by * PG, (by - dval + 1) * PG)
        hi_y = jnp.where(dy > 0, (by + dval) * PG - 1, by * PG + PG - 1)
        lo_z = jnp.where(dz > 0, bz * PG, (bz - dval + 1) * PG)
        hi_z = jnp.where(dz > 0, (bz + dval) * PG - 1, bz * PG + PG - 1)
        cx = jnp.where(dx > 0, exx, exx - 1)
        cy = jnp.where(dy > 0, exy, exy - 1)
        cz = jnp.where(dz > 0, exz, exz - 1)
        fx = jnp.clip(jnp.floor(ox + dx * te).astype(I32), lo_x, hi_x)
        fy = jnp.clip(jnp.floor(oy + dy * te).astype(I32), lo_y, hi_y)
        fz = jnp.clip(jnp.floor(oz + dz * te).astype(I32), lo_z, hi_z)
        nvx = jnp.where(nface == 0, cx, fx)
        nvy = jnp.where(nface == 1, cy, fy)
        nvz = jnp.where(nface == 2, cz, fz)
        oob = ((nvx < 0) | (nvx >= size) | (nvy < 0) | (nvy >= size)
               | (nvz < 0) | (nvz >= size))

        out["vx"] = jnp.where(jmp, nvx, vx)
        out["vy"] = jnp.where(jmp, nvy, vy)
        out["vz"] = jnp.where(jmp, nvz, vz)
        out["t"] = jnp.where(jmp, te, s["t"])
        out["face"] = jnp.where(jmp, nface, s["face"])
        out["addr_pg"] = jnp.where(jmp, pg_addr(nvx, nvy, nvz),
                                   s["addr_pg"])
        out["act"] = act & ~(jmp & oob)
        out["mlo"] = jnp.where(ent, prow[:, 0], s["mlo"])
        out["mhi"] = jnp.where(ent, prow[:, 1], s["mhi"])
        out["base"] = jnp.where(ent, prow[:, 2].astype(I32), s["base"])
        out["inpg"] = s["inpg"] | ent

        # --- pool row: latch brick words ---
        for k in range(16):
            out[f"g{k}"] = jnp.where(did_pl, brow[:, k], s[f"g{k}"])
        out["slo"] = jnp.where(did_pl, brow[:, 16], s["slo"])
        out["shi"] = jnp.where(did_pl, brow[:, 17], s["shi"])
        out["inb"] = s["inb"] | did_pl

        out["pend_pg"] = (s["pend_pg"] & ~ent) | (jmp & ~oob)
        out["pend_pl"] = s["pend_pl"] & ~did_pl
        out["it"] = s["it"] + (did_pg | did_pl).astype(I32)
        if count_stats:
            out["fe"] = s["fe"] + did_pg.astype(I32) + did_pl.astype(I32)
        capped = out["it"] >= max_steps
        out["act"] = out["act"] & ~capped
        return out

    def alu(s):
        """One sub-step: in-brick lanes run the flat kernel's voxel DDA
        (with 2^3-subcell skips); in-page lanes test the register mask
        for the current superbrick (occupied -> pool fetch pends) or
        step at superbrick scale."""
        act = s["act"]
        inb = s["inb"]
        inpg = s["inpg"] & ~inb
        live_b = act & inb & ~s["hit"]
        live_p = act & inpg & ~s["hit"] & ~s["pend_pl"] & ~s["pend_pg"]
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        lx, ly, lz = vx & 7, vy & 7, vz & 7

        # --- in-brick: solid test + voxel/subcell step ---
        solid = brick_solid([s[f"g{k}"] for k in range(16)], lx, ly, lz)
        hit_now = live_b & solid

        sbit = ((lx >> 1) | ((ly >> 1) << 2) | ((lz >> 1) << 4)).astype(I32)
        sword = jnp.where(sbit >= 32, s["shi"], s["slo"])
        sub_empty = ((sword >> (sbit & 31).astype(U32)) & U32(1)) == 0

        # --- in-page: current superbrick occupancy from the mask ---
        pbit = (((vx >> 3) & 3) | (((vy >> 3) & 3) << 2)
                | (((vz >> 3) & 3) << 4)).astype(I32)
        sb_occ = _mask_bit(s["mlo"], s["mhi"], pbit)
        enter_pool = live_p & sb_occ
        pool_addr = s["base"] + _pool_offset(s["mlo"], s["mhi"], pbit)

        # --- unified step: scale 1/2 for bricks, 8 for page mode ---
        step_b = live_b & ~solid
        step_p = live_p & ~sb_occ
        stepping = step_b | step_p
        big = sub_empty  # only meaningful for in-brick lanes
        bxv = jnp.where(step_p, ((vx >> 3) + px_) << 3,
                        jnp.where(big, ((vx >> 1) + px_) << 1, vx + px_)
                        ).astype(F32)
        byv = jnp.where(step_p, ((vy >> 3) + py_) << 3,
                        jnp.where(big, ((vy >> 1) + py_) << 1, vy + py_)
                        ).astype(F32)
        bzv = jnp.where(step_p, ((vz >> 3) + pz_) << 3,
                        jnp.where(big, ((vz >> 1) + pz_) << 1, vz + pz_)
                        ).astype(F32)
        tx = jnp.where(dx == 0.0, F32(BIG_T), (bxv - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (byv - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (bzv - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        bxi = bxv.astype(I32)
        byi = byv.astype(I32)
        bzi = bzv.astype(I32)
        cxx = jnp.where(dx > 0, bxi, bxi - 1)
        cyy = jnp.where(dy > 0, byi, byi - 1)
        czz = jnp.where(dz > 0, bzi, bzi - 1)
        # non-crossed coords: float-derived, clipped into the current
        # stepping cell (subcell for big brick steps, superbrick for page
        # steps; plain voxel steps keep the coordinate)
        clo_x = jnp.where(step_p, (vx >> 3) << 3, (vx >> 1) << 1)
        clo_y = jnp.where(step_p, (vy >> 3) << 3, (vy >> 1) << 1)
        clo_z = jnp.where(step_p, (vz >> 3) << 3, (vz >> 1) << 1)
        span = jnp.where(step_p, 7, 1)
        fxv = jnp.clip(jnp.floor(ox + dx * te).astype(I32), clo_x,
                       clo_x + span)
        fyv = jnp.clip(jnp.floor(oy + dy * te).astype(I32), clo_y,
                       clo_y + span)
        fzv = jnp.clip(jnp.floor(oz + dz * te).astype(I32), clo_z,
                       clo_z + span)
        keep_f = step_p | big
        nvx = jnp.where(nface == 0, cxx, jnp.where(keep_f, fxv, vx))
        nvy = jnp.where(nface == 1, cyy, jnp.where(keep_f, fyv, vy))
        nvz = jnp.where(nface == 2, czz, jnp.where(keep_f, fzv, vz))
        moved = _sel3(nface, nvx, nvy, nvz)
        stayed = _sel3(nface, vx, vy, vz)
        left_brick = (moved >> 3) != (stayed >> 3)
        left_page = (moved >> 5) != (stayed >> 5)
        oob = (moved < 0) | (moved >= size)

        out = dict(s)
        out["hit"] = s["hit"] | hit_now
        out["act"] = act & ~hit_now & ~(stepping & oob)
        out["vx"] = jnp.where(stepping, nvx, vx)
        out["vy"] = jnp.where(stepping, nvy, vy)
        out["vz"] = jnp.where(stepping, nvz, vz)
        out["t"] = jnp.where(stepping, te, s["t"])
        out["face"] = jnp.where(stepping, nface, s["face"])

        ok = stepping & ~oob
        # brick exits within the page: occupied next brick -> pool pend,
        # empty -> page mode (mask walk); page exits -> page pend
        b_leave = step_b & left_brick & ok
        npbit = (((nvx >> 3) & 3) | (((nvy >> 3) & 3) << 2)
                 | (((nvz >> 3) & 3) << 4)).astype(I32)
        n_occ = _mask_bit(s["mlo"], s["mhi"], npbit)
        n_pool = s["base"] + _pool_offset(s["mlo"], s["mhi"], npbit)
        to_pool = (enter_pool
                   | (b_leave & ~left_page & n_occ))
        to_page_walk = b_leave & ~left_page & ~n_occ
        to_page_fetch = (step_b | step_p) & left_page & ok

        out["inb"] = inb & ~b_leave
        out["inpg"] = jnp.where(to_page_walk, True,
                                jnp.where(to_pool | to_page_fetch, False,
                                          s["inpg"] & ~enter_pool))
        out["pend_pl"] = (s["pend_pl"] | to_pool) & ~to_page_fetch
        out["addr_pl"] = jnp.where(
            enter_pool, pool_addr,
            jnp.where(b_leave & ~left_page & n_occ, n_pool, s["addr_pl"]))
        out["pend_pg"] = s["pend_pg"] | to_page_fetch
        out["addr_pg"] = jnp.where(to_page_fetch,
                                   pg_addr(nvx, nvy, nvz), s["addr_pg"])
        out["it"] = s["it"] + (live_b | live_p).astype(I32)
        out["em"] = s["em"] + (step_b & left_brick).astype(I32)
        capped = out["it"] >= max_steps
        out["act"] = out["act"] & ~capped
        return out

    return fetch, alu


def _make_ray(ro, rd):
    rox, roy, roz = (ro[:, i].astype(F32) for i in range(3))
    rdx, rdy, rdz = (rd[:, i].astype(F32) for i in range(3))

    def inv(dc):
        return jnp.where(dc == 0.0, F32(BIG_T), 1.0 / dc)

    return (rox, roy, roz, rdx, rdy, rdz, inv(rdx), inv(rdy), inv(rdz),
            jnp.where(rdx > 0, 1, -1).astype(I32),
            jnp.where(rdy > 0, 1, -1).astype(I32),
            jnp.where(rdz > 0, 1, -1).astype(I32),
            (rdx > 0).astype(I32), (rdy > 0).astype(I32),
            (rdz > 0).astype(I32))


def _init_state(grid: PagedGrid, n, act0, o3):
    ox, oy, oz = o3
    size = grid.size
    p = grid.psize
    zero_i = jnp.zeros((n,), I32)
    vx = jnp.clip(jnp.floor(ox).astype(I32), 0, size - 1)
    vy = jnp.clip(jnp.floor(oy).astype(I32), 0, size - 1)
    vz = jnp.clip(jnp.floor(oz).astype(I32), 0, size - 1)
    return dict(
        act=act0, hit=jnp.zeros((n,), bool),
        pend_pg=act0, pend_pl=jnp.zeros((n,), bool),
        inpg=jnp.zeros((n,), bool), inb=jnp.zeros((n,), bool),
        vx=vx, vy=vy, vz=vz,
        t=jnp.zeros((n,), F32), face=zero_i,
        addr_pg=(vx >> 5) + (vy >> 5) * p + (vz >> 5) * p * p,
        addr_pl=zero_i,
        mlo=jnp.zeros((n,), U32), mhi=jnp.zeros((n,), U32), base=zero_i,
        slo=jnp.zeros((n,), U32), shi=jnp.zeros((n,), U32),
        it=zero_i, fe=zero_i, em=zero_i,
        **{f"g{k}": jnp.zeros((n,), U32) for k in range(16)},
    )


def _outputs(st, rr, size):
    hit = st["hit"]
    axis_coord = _sel3(st["face"], st["vx"], st["vy"], st["vz"])
    return TraceResult(hit=hit, face=st["face"],
                       axis_coord=jnp.where(hit, axis_coord, 0),
                       t=jnp.where(hit, st["t"], F32(BIG_T)),
                       iterations=st["it"], fetches=st["fe"],
                       missed_pops=st["em"])


@functools.partial(jax.jit, static_argnames=("max_steps", "compact",
                                             "pack_first", "fetch_every",
                                             "phase1_groups", "with_stats",
                                             "cascade"))
def trace_paged(grid: PagedGrid, ray_o, ray_d, max_steps: int = 2048,
                active=None, compact: bool = True,
                pack_first: int | None = None,
                fetch_every: int = FETCH_EVERY,
                phase1_groups: int = PHASE1_GROUPS,
                with_stats: bool = True,
                cascade: tuple | None = None) -> TraceResult:
    """Trace N rays against the paged grid. Contract = traverse.trace."""
    if pack_first is not None and active is not None:
        n = ray_o.shape[0]
        np_idx = jnp.nonzero(active, size=pack_first, fill_value=n)[0]
        p_valid = np_idx < n
        p_safe = jnp.minimum(np_idx, n - 1)
        sub = trace_paged(grid, ray_o[p_safe], ray_d[p_safe],
                          max_steps=max_steps, active=p_valid,
                          compact=compact, pack_first=None,
                          fetch_every=fetch_every,
                          phase1_groups=phase1_groups,
                          with_stats=with_stats, cascade=cascade)
        packed_mark = jnp.zeros((n,), bool).at[np_idx].set(p_valid,
                                                           mode="drop")
        overflow = active & ~packed_mark
        rest = jax.lax.cond(
            jnp.any(overflow),
            lambda _: trace_paged(grid, ray_o, ray_d, max_steps=max_steps,
                                  active=overflow, compact=True,
                                  pack_first=None, fetch_every=fetch_every,
                                  phase1_groups=phase1_groups,
                                  with_stats=with_stats, cascade=cascade),
            lambda _: TraceResult(
                hit=jnp.zeros((n,), bool), face=jnp.zeros((n,), I32),
                axis_coord=jnp.zeros((n,), I32),
                t=jnp.full((n,), F32(BIG_T)),
                iterations=jnp.zeros((n,), I32),
                fetches=jnp.zeros((n,), I32),
                missed_pops=jnp.zeros((n,), I32)), None)

        def scat(a, b):
            return a.at[np_idx].set(jnp.where(p_valid, b, a[p_safe]),
                                    mode="drop")
        return TraceResult(
            hit=scat(rest.hit, sub.hit),
            face=scat(rest.face, sub.face),
            axis_coord=scat(rest.axis_coord, sub.axis_coord),
            t=scat(rest.t, sub.t),
            iterations=scat(rest.iterations, sub.iterations),
            fetches=scat(rest.fetches, sub.fetches),
            missed_pops=scat(rest.missed_pops, sub.missed_pops))

    size = grid.size
    n = ray_o.shape[0]
    ray = _make_ray(ray_o, ray_d)
    ox, oy, oz = ray[0], ray[1], ray[2]
    inside = ((ox >= 0) & (ox < size) & (oy >= 0) & (oy < size)
              & (oz >= 0) & (oz < size))
    act0 = inside if active is None else (inside & active)
    state = _init_state(grid, n, act0, (ox, oy, oz))
    fetch, alu = _make_stepper(grid, ray, max_steps, with_stats)

    if not (compact and n >= 4096):
        state = _run_groups(fetch, alu, state, None, fetch_every)
        return _outputs(state, ray, size)

    def finish(st, ro, rd, rr, rounds):
        f_fn, a_fn = _make_stepper(grid, rr, max_steps, with_stats)
        m0 = ro.shape[0]
        if not rounds:
            with jax.named_scope(f"pgd_final_while_w{m0}"):
                st = _run_groups(f_fn, a_fn, st, None, fetch_every)
            return _outputs(st, rr, size)

        cap, groups = rounds[0]
        with jax.named_scope(f"pgd_groups_w{m0}"):
            st = _run_groups(f_fn, a_fn, st, groups, fetch_every)

        m = ro.shape[0]
        idx = jnp.nonzero(st["act"], size=cap, fill_value=m)[0]
        valid = idx < m
        safe = jnp.minimum(idx, m - 1)
        sro = ro[safe]
        srd = rd[safe]
        srr = _make_ray(sro, srd)
        # packed lanes re-fetch both rows (page mask/base + pool words)
        # instead of carrying 20 words through the pack: pend both — the
        # fetch slot issues both gathers anyway. Pool lanes keep addr_pl;
        # in-page/pending lanes resolve from the page row alone.
        was_pool = st["inb"][safe] | st["pend_pl"][safe]
        sub = dict(
            act=valid, hit=jnp.zeros((cap,), bool),
            pend_pg=valid, pend_pl=valid & was_pool,
            inpg=jnp.zeros((cap,), bool), inb=jnp.zeros((cap,), bool),
            vx=st["vx"][safe], vy=st["vy"][safe], vz=st["vz"][safe],
            t=st["t"][safe], face=st["face"][safe],
            addr_pg=st["addr_pg"][safe], addr_pl=st["addr_pl"][safe],
            mlo=jnp.zeros((cap,), U32), mhi=jnp.zeros((cap,), U32),
            base=jnp.zeros((cap,), I32),
            slo=jnp.zeros((cap,), U32), shi=jnp.zeros((cap,), U32),
            it=st["it"][safe], fe=st["fe"][safe], em=st["em"][safe],
            **{f"g{k}": jnp.zeros((cap,), U32) for k in range(16)},
        )
        sres = finish(sub, sro, srd, srr, rounds[1:])

        mark = jnp.zeros((m,), bool).at[idx].set(valid, mode="drop")
        st = dict(st)
        st["act"] = st["act"] & ~mark
        with jax.named_scope(f"pgd_net_w{m}"):
            st = _run_groups(f_fn, a_fn, st, None, fetch_every)
        res = _outputs(st, rr, size)

        def merge(a, b):
            return a.at[idx].set(b, mode="drop")
        return TraceResult(
            hit=merge(res.hit, sres.hit),
            face=merge(res.face, sres.face),
            axis_coord=merge(res.axis_coord, sres.axis_coord),
            t=merge(res.t, sres.t),
            iterations=merge(res.iterations, sres.iterations)
            if with_stats else res.iterations,
            fetches=merge(res.fetches, sres.fetches) if with_stats
            else res.fetches,
            missed_pops=merge(res.missed_pops, sres.missed_pops)
            if with_stats else res.missed_pops)

    with jax.named_scope(f"pgd_phase1_w{n}"):
        state = _run_groups(fetch, alu, state, phase1_groups, fetch_every)
    if cascade is None:
        seq = [
            (max((n * 11) // 20, 2048), 0),
            (max(n // 10, 2048), 10),
            (max(n // 50, 2048), 20),
        ]
    else:
        seq = [(max((n * num) // den, 2048), groups)
               for (num, den, groups) in cascade]
    return finish(state, ray_o, ray_d, ray, seq)
