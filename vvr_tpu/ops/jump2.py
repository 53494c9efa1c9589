"""Two-tier jump traversal — narrow-state flat DDA (the round-2 rework).

Profiling the first jump kernel (tools/profile_trace.py, v5e) showed the
wall is ~70% vector ALU / state movement and only ~25% gather: carrying the
512-bit brick occupancy through the loop ((N,16) u32 state + a 15-select
word tree per sub-step) costs more than the fetches it saves. This kernel
keeps the jump grid's O(1)-fetch empty-space skipping but strips the
carried state to ~15 narrow words and replaces the word-select tree with
single-register bit tests, by splitting the acceleration data in two:

  * jump rows (world/jumpgrid.py JumpGrid2.jrows, 16 B per 8^3 superbrick):
      w0,w1 : 4^3 subcell any-mask (subcell = 2^3 voxels,
              bit = cx | cy<<2 | cz<<4)
      w2    : 8 per-octant one-sided empty-box radii, 4 bits each
              (dval = (w2 >> 4*oct) & 15; 0 => superbrick non-empty)
      w3    : chebyshev distance (diagnostics / parity with words[16])
  * mini rows (JumpGrid2.mrows, 8 B per 4^3 "minibrick"): the 64-bit voxel
      occupancy of a 4^3 region (bit = x&3 | (y&3)<<2 | (z&3)<<4) — the
      occupancy pyramid's finest-level node masks, fetched ONLY when the
      ray enters an occupied subcell.

A ray is always in one of two DDA scales (sc): 2-voxel subcell steps
against the jump row's mask (sc=1), or 1-voxel steps against the minibrick
mask (sc=0). Both scales share ONE step formula — the plane coordinate is
((v >> sc) + dir_positive) << sc — so the float t/face math is identical to
the dense oracle's at every scale (subcell and minibrick planes are voxel
planes). Empty superbricks are crossed with the same one-sided octant jump
as ops/jump.py.

Hit contract: TraceResult, bit-equal to render/oracle.py trace_dense (the
reference's trace_shi semantics, shaders/ray_stuff_other.slang:424-437).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vvr_tpu.ops.traverse import BIG_T, TraceResult, _run_groups, _sel3
from vvr_tpu.world.jumpgrid import SB, JumpGrid2

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

FETCH_EVERY = 6
PHASE1_GROUPS = 4


def _make_stepper(grid: JumpGrid2, ray, max_steps: int, count_stats: bool):
    size = grid.size
    g = grid.gsize
    m = size // 4
    jrows = grid.jrows
    mrows = grid.mrows
    (ox, oy, oz, dx, dy, dz, ix_, iy_, iz_, sx, sy, sz, px_, py_, pz_) = ray
    oct_shift = (4 * (px_ | (py_ << 1) | (pz_ << 2))).astype(U32)

    def fetch(s):
        """One fetch slot: gather the pending jump row (lanes crossing a
        superbrick boundary) and/or the pending minibrick row (lanes that
        entered an occupied subcell). A lane is never pending both."""
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        didj = s["pend"] & s["act"]
        addrj = (vx >> 3) + (vy >> 3) * g + (vz >> 3) * g * g
        rj = jnp.take(jrows, jnp.where(didj, addrj, 0), axis=0, mode="clip")
        dval = ((rj[:, 2] >> oct_shift) & U32(15)).astype(I32)

        out = dict(s)
        out["slo"] = jnp.where(didj, rj[:, 0], s["slo"])
        out["shi"] = jnp.where(didj, rj[:, 1], s["shi"])

        jmp = didj & (dval > 0)
        ent = didj & (dval == 0)
        bx, by, bz = vx >> 3, vy >> 3, vz >> 3
        # exit planes of the one-sided empty box {sb + c, c in [0, d-1]^3
        # along the octant}; back planes are the brick's own bounds
        exx = jnp.where(dx > 0, (bx + dval) * SB, (bx - dval + 1) * SB)
        exy = jnp.where(dy > 0, (by + dval) * SB, (by - dval + 1) * SB)
        exz = jnp.where(dz > 0, (bz + dval) * SB, (bz - dval + 1) * SB)
        tx = jnp.where(dx == 0.0, F32(BIG_T), (exx.astype(F32) - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (exy.astype(F32) - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (exz.astype(F32) - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        # landing voxel: crossed axis exact, others derived + clipped into
        # the box (same float formulas as the oracle's step)
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

        # minibrick gather for lanes that latched an occupied subcell
        didm = s["pendm"] & s["act"]
        addrm = (vx >> 2) + (vy >> 2) * m + (vz >> 2) * m * m
        rm = jnp.take(mrows, jnp.where(didm, addrm, 0), axis=0, mode="clip")
        out["mlo"] = jnp.where(didm, rm[:, 0], s["mlo"])
        out["mhi"] = jnp.where(didm, rm[:, 1], s["mhi"])

        out["vx"] = jnp.where(jmp, nvx, vx)
        out["vy"] = jnp.where(jmp, nvy, vy)
        out["vz"] = jnp.where(jmp, nvz, vz)
        out["t"] = jnp.where(jmp, te, s["t"])
        out["face"] = jnp.where(jmp, nface, s["face"])
        out["act"] = s["act"] & ~(jmp & oob)
        out["pend"] = (s["pend"] & ~ent) | (jmp & ~oob)
        out["sc"] = jnp.where(ent, 1, jnp.where(didm, 0, s["sc"]))
        out["pendm"] = s["pendm"] & ~didm
        did = didj | didm
        out["it"] = s["it"] + did.astype(I32)
        if count_stats:
            out["fe"] = s["fe"] + did.astype(I32)
        capped = out["it"] >= max_steps
        out["act"] = out["act"] & ~capped
        return out

    def alu(s):
        """One DDA sub-step at the lane's current scale sc (0: voxel steps
        vs the minibrick mask; 1: 2^3-subcell steps vs the jump row's
        subcell mask). Solid voxel at sc=0 -> hit; occupied subcell at
        sc=1 -> latch a minibrick fetch (no movement); else step."""
        live = s["act"] & ~s["hit"] & ~s["pend"] & ~s["pendm"]
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        sc = s["sc"]

        bit =(((vx >> sc) & 3) | (((vy >> sc) & 3) << 2)
               | (((vz >> sc) & 3) << 4)).astype(I32)
        lo = jnp.where(sc == 1, s["slo"], s["mlo"])
        hi = jnp.where(sc == 1, s["shi"], s["mhi"])
        word = jnp.where(bit >= 32, hi, lo)
        occ = ((word >> (bit & 31).astype(U32)) & U32(1)) == 1

        hit_now = live & occ & (sc == 0)
        desc = live & occ & (sc == 1)
        step = live & ~occ

        # unified step: plane = ((v >> sc) + dir_positive) << sc
        bx = (((vx >> sc) + px_) << sc).astype(F32)
        by = (((vy >> sc) + py_) << sc).astype(F32)
        bz = (((vz >> sc) + pz_) << sc).astype(F32)
        tx = jnp.where(dx == 0.0, F32(BIG_T), (bx - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (by - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (bz - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        # crossed axis: first voxel beyond the plane; non-crossed: unchanged
        # at sc=0, float-derived + clipped into the current cell at sc=1
        bxi = bx.astype(I32)
        byi = by.astype(I32)
        bzi = bz.astype(I32)
        cxx = jnp.where(dx > 0, bxi, bxi - 1)
        cyy = jnp.where(dy > 0, byi, byi - 1)
        czz = jnp.where(dz > 0, bzi, bzi - 1)
        cell_x = (vx >> sc) << sc
        cell_y = (vy >> sc) << sc
        cell_z = (vz >> sc) << sc
        top = sc  # cell top offset: (1 << sc) - 1 == sc for sc in {0, 1}
        fx = jnp.clip(jnp.floor(ox + dx * te).astype(I32), cell_x,
                      cell_x + top)
        fy = jnp.clip(jnp.floor(oy + dy * te).astype(I32), cell_y,
                      cell_y + top)
        fz = jnp.clip(jnp.floor(oz + dz * te).astype(I32), cell_z,
                      cell_z + top)
        nvx = jnp.where(nface == 0, cxx, jnp.where(sc == 1, fx, vx))
        nvy = jnp.where(nface == 1, cyy, jnp.where(sc == 1, fy, vy))
        nvz = jnp.where(nface == 2, czz, jnp.where(sc == 1, fz, vz))
        moved = _sel3(nface, nvx, nvy, nvz)
        stayed = _sel3(nface, vx, vy, vz)
        left_mini = (moved >> 2) != (stayed >> 2)
        left_sb = (moved >> 3) != (stayed >> 3)
        oob = (moved < 0) | (moved >= size)

        out = dict(s)
        out["hit"] = s["hit"] | hit_now
        out["act"] = s["act"] & ~hit_now & ~(step & oob)
        out["vx"] = jnp.where(step, nvx, vx)
        out["vy"] = jnp.where(step, nvy, vy)
        out["vz"] = jnp.where(step, nvz, vz)
        out["t"] = jnp.where(step, te, s["t"])
        out["face"] = jnp.where(step, nface, s["face"])
        leave_sb = step & left_sb & ~oob
        out["pend"] = s["pend"] | leave_sb
        out["pendm"] = (s["pendm"] | desc) & ~leave_sb
        # voxel lanes that exit their minibrick (but not the superbrick)
        # pop back to subcell scale — the subcell mask is still latched
        out["sc"] = jnp.where(step & (sc == 0) & left_mini & ~left_sb,
                              1, s["sc"])
        out["it"] = s["it"] + live.astype(I32)
        if count_stats:
            out["em"] = s["em"] + (step & left_sb).astype(I32)
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


def _init_state(grid: JumpGrid2, n, act0, o3, count_stats: bool,
                carry=None):
    size = grid.size
    zero_i = jnp.zeros((n,), I32)
    zero_u = jnp.zeros((n,), U32)
    if carry is None:
        ox, oy, oz = o3
        vx = jnp.clip(jnp.floor(ox).astype(I32), 0, size - 1)
        vy = jnp.clip(jnp.floor(oy).astype(I32), 0, size - 1)
        vz = jnp.clip(jnp.floor(oz).astype(I32), 0, size - 1)
        t = jnp.zeros((n,), F32)
        face = zero_i
        it = zero_i
        fe = zero_i
        em = zero_i
    else:
        vx, vy, vz, t, face, it, fe, em = carry
    st = dict(
        act=act0, hit=jnp.zeros((n,), bool), pend=act0,
        pendm=jnp.zeros((n,), bool), sc=jnp.ones((n,), I32),
        vx=vx, vy=vy, vz=vz, t=t, face=face,
        slo=zero_u, shi=zero_u, mlo=zero_u, mhi=zero_u,
        it=it,
    )
    if count_stats:
        st["fe"] = fe
        st["em"] = em
    return st


def _outputs(st, count_stats: bool):
    hit = st["hit"]
    axis_coord = _sel3(st["face"], st["vx"], st["vy"], st["vz"])
    zero = jnp.zeros_like(st["it"])
    return TraceResult(hit=hit, face=st["face"],
                       axis_coord=jnp.where(hit, axis_coord, 0),
                       t=jnp.where(hit, st["t"], F32(BIG_T)),
                       iterations=st["it"],
                       fetches=st["fe"] if count_stats else zero,
                       missed_pops=st["em"] if count_stats else zero)


@functools.partial(jax.jit, static_argnames=("max_steps", "compact",
                                             "pack_first", "fetch_every",
                                             "phase1_groups", "with_stats",
                                             "cascade"))
def trace_jump2(grid: JumpGrid2, ray_o, ray_d, max_steps: int = 2048,
                active=None, compact: bool = True,
                pack_first: int | None = None,
                fetch_every: int = FETCH_EVERY,
                phase1_groups: int = PHASE1_GROUPS,
                with_stats: bool = True,
                cascade: tuple | None = None) -> TraceResult:
    """Trace N rays against the two-tier jump grid; contract identical to
    ops/traverse.trace and ops/jump.trace_jump."""
    if pack_first is not None and active is not None:
        n = ray_o.shape[0]
        np_idx = jnp.nonzero(active, size=pack_first, fill_value=n)[0]
        p_valid = np_idx < n
        p_safe = jnp.minimum(np_idx, n - 1)
        sub = trace_jump2(grid, ray_o[p_safe], ray_d[p_safe],
                          max_steps=max_steps, active=p_valid,
                          compact=compact, pack_first=None,
                          fetch_every=fetch_every,
                          phase1_groups=phase1_groups,
                          with_stats=with_stats, cascade=cascade)
        packed_mark = jnp.zeros((n,), bool).at[np_idx].set(p_valid,
                                                           mode="drop")
        overflow = active & ~packed_mark
        # full-width overflow net under lax.cond (see ops/jump.py)
        rest = jax.lax.cond(
            jnp.any(overflow),
            lambda _: trace_jump2(grid, ray_o, ray_d, max_steps=max_steps,
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
    state = _init_state(grid, n, act0, (ox, oy, oz), with_stats)
    fetch, alu = _make_stepper(grid, ray, max_steps, with_stats)

    if not (compact and n >= 4096):
        state = _run_groups(fetch, alu, state, None, fetch_every)
        return _outputs(state, with_stats)

    def finish(st, ro, rd, rr, rounds):
        f_fn, a_fn = _make_stepper(grid, rr, max_steps, with_stats)
        m0 = ro.shape[0]
        if not rounds:
            with jax.named_scope(f"j2_final_while_w{m0}"):
                st = _run_groups(f_fn, a_fn, st, None, fetch_every)
            return _outputs(st, with_stats)

        cap, groups = rounds[0]
        with jax.named_scope(f"j2_groups_w{m0}"):
            st = _run_groups(f_fn, a_fn, st, groups, fetch_every)

        m = ro.shape[0]
        idx = jnp.nonzero(st["act"], size=cap, fill_value=m)[0]
        valid = idx < m
        safe = jnp.minimum(idx, m - 1)
        sro = ro[safe]
        srd = rd[safe]
        srr = _make_ray(sro, srd)
        # packed lanes refetch their rows instead of carrying masks through
        # the pack (voxel coords / t / face / counters carry over)
        zs = jnp.zeros((cap,), I32)
        carry = (st["vx"][safe], st["vy"][safe], st["vz"][safe],
                 st["t"][safe], st["face"][safe], st["it"][safe],
                 st["fe"][safe] if with_stats else zs,
                 st["em"][safe] if with_stats else zs)
        sub = _init_state(grid, cap, valid, None, with_stats, carry=carry)
        sres = finish(sub, sro, srd, srr, rounds[1:])

        mark = jnp.zeros((m,), bool).at[idx].set(valid, mode="drop")
        st = dict(st)
        st["act"] = st["act"] & ~mark
        with jax.named_scope(f"j2_net_w{m}"):
            st = _run_groups(f_fn, a_fn, st, None, fetch_every)
        res = _outputs(st, with_stats)

        def merge(a, b):
            return a.at[idx].set(b, mode="drop")
        return TraceResult(
            hit=merge(res.hit, sres.hit),
            face=merge(res.face, sres.face),
            axis_coord=merge(res.axis_coord, sres.axis_coord),
            t=merge(res.t, sres.t),
            iterations=merge(res.iterations, sres.iterations),
            fetches=merge(res.fetches, sres.fetches),
            missed_pops=merge(res.missed_pops, sres.missed_pops))

    with jax.named_scope(f"j2_phase1_w{n}"):
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
