"""Distance-jump superbrick traversal — the round-2 flagship kernel.

A flat (non-hierarchical) re-architecture of the reference's recursive SVO
descent (shaders/ray_stuff_other.slang:111-308, entry trace_shi :424-437),
designed around the measured v5e cost model instead of the GPU's cache
hierarchy: the expensive operation on TPU is ISSUING a gather (~4.9 ns/lane
from a <=32K-row table regardless of row width), while wide rows and vector
ALU are nearly free. So instead of walking a tree with many narrow dependent
fetches, each fetch grabs a 128-byte JumpGrid row (world/jumpgrid.py) that
answers BOTH questions a ray ever asks:

  * dist > 0  — every superbrick within chebyshev radius dist-1 is empty:
                jump straight to the exit plane of that empty box (the
                whole empty-space descent/ascent dance of the hierarchical
                kernel collapses into one fetch + one AABB exit);
  * dist == 0 — the row carries the superbrick's full 512-bit voxel
                occupancy: the ray runs an in-register 8^3 voxel DDA with
                ZERO further fetches until it hits or leaves the brick.

The wavefront machinery matches ops/traverse.py: groups of FETCH_EVERY
sub-steps whose first slot carries the (gather + jump) phase, lanes latch a
`pend` flag when they need a new row, and a straggler-compaction cascade
front-packs survivors into geometrically smaller batches (each level keeps
a full-width safety net, so results are exact for any survivor
distribution).

Hit contract is identical to ops/traverse.py TraceResult (and therefore to
the reference's DdaTraversalOutput, ray_stuff_other.slang:99-106); the
dense-DDA oracle (render/oracle.py) is the shared ground truth and the two
kernels are tested bit-equal against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vvr_tpu.ops.traverse import (BIG_T, TraceResult, _run_groups, _sel3)
from vvr_tpu.world.jumpgrid import SB, JumpGrid

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

FETCH_EVERY = 6      # sub-steps per group; slot 0 carries the gather + jump
PHASE1_GROUPS = 6    # groups before the first straggler compaction

# Shadow-ray tuning (tools/ab_jump.py --shadow-tune, v5e, bench scene):
# sun-aligned rays from surface hits resolve on a much steeper curve than
# primaries (90% within 3 fetch groups, 98% within 4), so compaction can
# engage far earlier — 554 ms vs 927 ms with the primary-tuned schedule.
SHADOW_PHASE1 = 3
SHADOW_CASCADE = ((1, 6, 1), (1, 40, 3), (1, 200, 0))

# Batched RESIDUE populations (the soft-shadow cone residue the frame
# front-packs and traces S samples at once) are all silhouette lanes.
# Measured survivor curve at the config-4 bench camera
# (tools/measure_residue_curve.py, v5e, 1.62M batched sample rays):
# 18 substeps -> 5.1%, 24 -> 2.4%, 30 -> 1.45%, 48 -> 0.09%; p99 = 34
# substeps, max = 90 (NO heavy tail — the cone gate's certain-light
# side already removes the world-length grazing marches). Caps below
# keep >=4x headroom over that curve; the round-4 profile showed
# jp_net_w1036800 executing ~392 ms under SHADOW_CASCADE.
RESIDUE_PHASE1 = 3
RESIDUE_CASCADE = ((1, 4, 2), (1, 16, 3), (1, 64, 0))

# After the near-walk + lift prefilter (ops/sunshadow.py
# near_walk_classify) only 7.5% of the batched sample lanes still run
# the DDA (walk-hit 11.5%, lift/exit-miss 81.0% — same bench camera),
# so the DDA packs IMMEDIATELY (phase1 0: a full-width group costs
# ~39 ms at 1M lanes and resolves almost nothing of this population —
# its g=1 survivor fraction is 98.8%). Residual curve (fractions of
# batch width): 24 substeps -> 1.49%, 42 -> 0.27%.
RESIDUE_PREF_PHASE1 = 0
RESIDUE_PREF_CASCADE = ((1, 6, 4), (1, 32, 3), (1, 128, 0))


# the brick occupancy decode lives in world/occupancy.py (single source
# of truth for bit layouts — VERDICT r2 weak #7)
from vvr_tpu.world.occupancy import brick_solid  # noqa: E402


def _make_stepper(grid: JumpGrid, ray, max_steps: int, count_stats: bool):
    size = grid.size
    g = grid.gsize
    rows = grid.rows
    (ox, oy, oz, dx, dy, dz, ix_, iy_, iz_, sx, sy, sz, px_, py_, pz_) = ray

    def sb_addr(bx, by, bz):
        return bx + by * g + bz * g * g

    def fetch(s):
        """Gather the pending superbrick row; empty bricks jump immediately
        (their exit plane is fully determined by the row's distance word),
        non-empty bricks latch the 512-bit mask and enter in-brick mode."""
        did = s["pend"] & s["act"]
        addr = jnp.where(did, s["addr"], 0)
        r = jnp.take(rows, addr, axis=0, mode="clip")
        # per-octant jump distance: words[24 + (dx>0) | (dy>0)<<1 | (dz>0)<<2]
        # (the octant is a per-ray constant; 7-select tree)
        e0 = jnp.where(px_ == 1, r[:, 25], r[:, 24])
        e1 = jnp.where(px_ == 1, r[:, 27], r[:, 26])
        e2 = jnp.where(px_ == 1, r[:, 29], r[:, 28])
        e3 = jnp.where(px_ == 1, r[:, 31], r[:, 30])
        f0 = jnp.where(py_ == 1, e1, e0)
        f1 = jnp.where(py_ == 1, e3, e2)
        dval = jnp.where(pz_ == 1, f1, f0).astype(I32)
        out = dict(s)
        for k in range(16):  # one strided unpack per fetch, contiguous after
            out[f"g{k}"] = jnp.where(did, r[:, k], s[f"g{k}"])
        out["slo"] = jnp.where(did, r[:, 17], s["slo"])
        out["shi"] = jnp.where(did, r[:, 18], s["shi"])

        jmp = did & (dval > 0)
        ent = did & (dval == 0)
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        bx, by, bz = vx >> 3, vy >> 3, vz >> 3
        # exit planes of the one-sided safe box {sb + c, c in [0, d-1]^3
        # along the octant}; the back planes are the brick's own bounds
        exx = jnp.where(dx > 0, (bx + dval) * SB, (bx - dval + 1) * SB)
        exy = jnp.where(dy > 0, (by + dval) * SB, (by - dval + 1) * SB)
        exz = jnp.where(dz > 0, (bz + dval) * SB, (bz - dval + 1) * SB)
        tx = jnp.where(dx == 0.0, F32(BIG_T), (exx.astype(F32) - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (exy.astype(F32) - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (exz.astype(F32) - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        # landing voxel: crossed axis exact, others derived + clipped into
        # the safe box (same float formulas as the oracle's step)
        lo_x = jnp.where(dx > 0, bx * SB, (bx - dval + 1) * SB)
        hi_x = jnp.where(dx > 0, (bx + dval) * SB - 1, bx * SB + SB - 1)
        lo_y = jnp.where(dy > 0, by * SB, (by - dval + 1) * SB)
        hi_y = jnp.where(dy > 0, (by + dval) * SB - 1, by * SB + SB - 1)
        lo_z = jnp.where(dz > 0, bz * SB, (bz - dval + 1) * SB)
        hi_z = jnp.where(dz > 0, (bz + dval) * SB - 1, bz * SB + SB - 1)
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
        out["addr"] = jnp.where(jmp, sb_addr(nvx >> 3, nvy >> 3, nvz >> 3),
                                s["addr"])
        out["act"] = s["act"] & ~(jmp & oob)
        out["pend"] = (s["pend"] & ~ent) | (jmp & ~oob)
        out["inb"] = s["inb"] | ent
        out["it"] = s["it"] + did.astype(I32)
        if count_stats:
            out["fe"] = s["fe"] + did.astype(I32)
        capped = out["it"] >= max_steps
        out["act"] = out["act"] & ~capped
        return out

    def alu(s):
        """One in-brick DDA sub-step: solid test, then a voxel step — or a
        2^3-subcell step when the row's subcell mask says the ray's whole
        subcell is empty (subcell planes are voxel planes, so the float
        t/face formulas stay oracle-identical; non-crossed coordinates are
        clipped into the subcell exactly like jump landings)."""
        live = s["act"] & s["inb"] & ~s["hit"]
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        lx, ly, lz = vx & 7, vy & 7, vz & 7

        solid = brick_solid([s[f"g{k}"] for k in range(16)], lx, ly, lz)
        hit_now = live & solid

        # subcell occupancy: bit cx | cy<<2 | cz<<4 of the (slo, shi) u64
        sbit = ((lx >> 1) | ((ly >> 1) << 2) | ((lz >> 1) << 4)).astype(I32)
        sword = jnp.where(sbit >= 32, s["shi"], s["slo"])
        sub_empty = ((sword >> (sbit & 31).astype(U32)) & U32(1)) == 0

        step = live & ~solid
        big = sub_empty  # scale-2 step (only meaningful for stepping lanes)
        bx = jnp.where(big, ((vx >> 1) + px_) << 1, vx + px_).astype(F32)
        by = jnp.where(big, ((vy >> 1) + py_) << 1, vy + py_).astype(F32)
        bz = jnp.where(big, ((vz >> 1) + pz_) << 1, vz + pz_).astype(F32)
        tx = jnp.where(dx == 0.0, F32(BIG_T), (bx - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (by - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (bz - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        # crossed axis: first voxel beyond the selected bound plane;
        # non-crossed: unchanged (voxel step) or float-derived + clipped
        # into the current subcell (scale-2 step)
        bxi = bx.astype(I32)
        byi = by.astype(I32)
        bzi = bz.astype(I32)
        cxx = jnp.where(dx > 0, bxi, bxi - 1)
        cyy = jnp.where(dy > 0, byi, byi - 1)
        czz = jnp.where(dz > 0, bzi, bzi - 1)
        fx = jnp.clip(jnp.floor(ox + dx * te).astype(I32),
                      (vx >> 1) << 1, ((vx >> 1) << 1) + 1)
        fy = jnp.clip(jnp.floor(oy + dy * te).astype(I32),
                      (vy >> 1) << 1, ((vy >> 1) << 1) + 1)
        fz = jnp.clip(jnp.floor(oz + dz * te).astype(I32),
                      (vz >> 1) << 1, ((vz >> 1) << 1) + 1)
        nvx = jnp.where(nface == 0, cxx, jnp.where(big, fx, vx))
        nvy = jnp.where(nface == 1, cyy, jnp.where(big, fy, vy))
        nvz = jnp.where(nface == 2, czz, jnp.where(big, fz, vz))
        moved = _sel3(nface, nvx, nvy, nvz)
        stayed = _sel3(nface, vx, vy, vz)
        exited = (moved >> 3) != (stayed >> 3)
        oob = (moved < 0) | (moved >= size)

        out = dict(s)
        out["hit"] = s["hit"] | hit_now
        out["act"] = s["act"] & ~hit_now & ~(step & oob)
        out["vx"] = jnp.where(step, nvx, vx)
        out["vy"] = jnp.where(step, nvy, vy)
        out["vz"] = jnp.where(step, nvz, vz)
        out["t"] = jnp.where(step, te, s["t"])
        out["face"] = jnp.where(step, nface, s["face"])
        leave = step & exited & ~oob
        out["inb"] = s["inb"] & ~leave
        out["pend"] = s["pend"] | leave
        out["addr"] = jnp.where(leave, (nvx >> 3) + (nvy >> 3) * g
                                + (nvz >> 3) * g * g, s["addr"])
        out["it"] = s["it"] + live.astype(I32)
        out["em"] = s["em"] + (step & exited).astype(I32)
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


def _init_state(grid: JumpGrid, n, act0, o3):
    ox, oy, oz = o3
    size = grid.size
    g = grid.gsize
    zero_i = jnp.zeros((n,), I32)
    vx = jnp.clip(jnp.floor(ox).astype(I32), 0, size - 1)
    vy = jnp.clip(jnp.floor(oy).astype(I32), 0, size - 1)
    vz = jnp.clip(jnp.floor(oz).astype(I32), 0, size - 1)
    return dict(
        act=act0, hit=jnp.zeros((n,), bool), pend=act0,
        inb=jnp.zeros((n,), bool),
        vx=vx, vy=vy, vz=vz,
        t=jnp.zeros((n,), F32), face=zero_i,
        addr=(vx >> 3) + (vy >> 3) * g + (vz >> 3) * g * g,
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
def trace_jump(grid: JumpGrid, ray_o, ray_d, max_steps: int = 2048,
               active=None, compact: bool = True,
               pack_first: int | None = None,
               fetch_every: int = FETCH_EVERY,
               phase1_groups: int = PHASE1_GROUPS,
               with_stats: bool = True,
               cascade: tuple | None = None) -> TraceResult:
    """Trace N rays against the jump grid. Same contract as traverse.trace.

    max_steps counts sub-steps (jumps + voxel steps); the flat DDA takes
    more voxel steps than the hierarchical kernel's node steps, so the cap
    defaults higher (a corner-to-corner 256^3 ray worst-cases ~770 voxel
    steps; jumps shorten real rays far below that)."""
    if pack_first is not None and active is not None:
        n = ray_o.shape[0]
        np_idx = jnp.nonzero(active, size=pack_first, fill_value=n)[0]
        p_valid = np_idx < n
        p_safe = jnp.minimum(np_idx, n - 1)
        sub = trace_jump(grid, ray_o[p_safe], ray_d[p_safe],
                         max_steps=max_steps, active=p_valid,
                         compact=compact, pack_first=None,
                         fetch_every=fetch_every,
                         phase1_groups=phase1_groups,
                         with_stats=with_stats, cascade=cascade)
        packed_mark = jnp.zeros((n,), bool).at[np_idx].set(p_valid,
                                                           mode="drop")
        overflow = active & ~packed_mark
        # full-width overflow net under lax.cond: zero device work unless
        # the pack capacity actually overflowed (the trivial branch equals
        # a trace over an empty active set — hit=False, t=BIG_T, face=0)
        rest = jax.lax.cond(
            jnp.any(overflow),
            lambda _: trace_jump(grid, ray_o, ray_d, max_steps=max_steps,
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
            with jax.named_scope(f"jp_final_while_w{m0}"):
                st = _run_groups(f_fn, a_fn, st, None, fetch_every)
            return _outputs(st, rr, size)

        cap, groups = rounds[0]
        with jax.named_scope(f"jp_groups_w{m0}"):
            st = _run_groups(f_fn, a_fn, st, groups, fetch_every)

        m = ro.shape[0]
        idx = jnp.nonzero(st["act"], size=cap, fill_value=m)[0]
        valid = idx < m
        safe = jnp.minimum(idx, m - 1)
        sro = ro[safe]
        srd = rd[safe]
        srr = _make_ray(sro, srd)
        # packed lanes refetch their row instead of carrying the 64 B mask
        # through the pack (in-brick lanes keep their addr; dist==0 re-enters
        # in-brick mode with voxel coords intact)
        sub = dict(
            act=valid, hit=jnp.zeros((cap,), bool),
            pend=valid, inb=jnp.zeros((cap,), bool),
            vx=st["vx"][safe], vy=st["vy"][safe], vz=st["vz"][safe],
            t=st["t"][safe], face=st["face"][safe], addr=st["addr"][safe],
            slo=jnp.zeros((cap,), U32), shi=jnp.zeros((cap,), U32),
            it=st["it"][safe], fe=st["fe"][safe], em=st["em"][safe],
            **{f"g{k}": jnp.zeros((cap,), U32) for k in range(16)},
        )
        sres = finish(sub, sro, srd, srr, rounds[1:])

        mark = jnp.zeros((m,), bool).at[idx].set(valid, mode="drop")
        st = dict(st)
        st["act"] = st["act"] & ~mark
        with jax.named_scope(f"jp_net_w{m}"):
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

    with jax.named_scope(f"jp_phase1_w{n}"):
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
