"""Brick-DDA traversal — the hot kernel.

TPU-native re-architecture of the reference's compile-time-recursive stackless
DDA (shaders/ray_stuff_other.slang:111-308, entry trace_shi :424-437) as a
mask-predicated wavefront over a ray batch, walking the dense brick pyramid
(world/pyramid.py BrickPyramid). Like the reference, a "node" holds the u64
any-mask of its 4x4x4 children and the in-node walk is a <=12-step 3D DDA
(slang :188-305); unlike the reference, nodes are addressed *arithmetically*
from (cell, level), a node may also carry its children's u64 full-mask (the
FULL_NODE early-out, slang :229-243, as a bit instead of a pointer sentinel),
and recursion becomes integer descend/ascend:

  child any bit & (leaf | full bit)  -> HIT at child granularity
  child any bit                      -> descend (fetch child node row)
  empty                              -> in-node DDA step; on node exit,
                                        ascend to the coarsest level whose
                                        boundary was crossed (base-4
                                        alignment) and fetch that node

TPU cost model (measured, v5e — tools/microbench_gather.py): a random row
gather costs ~4.9 ns/lane from a <=32K-row table REGARDLESS of row width up
to 64 B, rising to ~6-13 ns for a 266K-row table; a vector ALU sub-step over
2M lanes costs ~1.4-5 ns/lane. The kernel is therefore organized to MINIMIZE
GATHER ISSUES and to fetch WIDE from SMALL tables:

  * grouped mode (the flagship path): one 64-byte row fetch yields the
    any-masks of a 2x2x2 *group* of sibling nodes (an 8^3-voxel superbrick
    at level 1), held in registers; node transitions that stay inside the
    cached group — the common case for surface-skimming rays — are a
    register 8-way select, not a fetch;
  * the loop body is a group of FETCH_EVERY sub-steps, only the first of
    which contains the gather — lanes that need an uncached row latch a
    `pending` flag and stall in ALU sub-steps until the next fetch;
  * after PHASE1_GROUPS groups, surviving rays (stragglers skimming the
    surface) are front-packed by a stable argsort and finished in a batch
    a fraction of the size, so the whole-batch while_loop is not held
    hostage by the worst ray; a final full-batch loop guarantees
    correctness if the packed capacity ever overflows.

Hit contract matches the reference (DdaTraversalOutput,
ray_stuff_other.slang:99-106): (hit, face, axis_coord, t) where `axis_coord`
is the entry-plane coordinate of the hit block — origin[face] for leaf hits
(:291) and origin[face] + (sign<0)*(voxel_size-1) for full-node hits (:243).
Rays with origin outside [0, size)^3 miss (trace_shi bounds check :430-432);
rays starting inside a solid cell hit with face 0 and the origin voxel's
coordinate (dense-DDA oracle semantics, render/oracle.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from vvr_tpu.world.pyramid import BrickPyramid

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

BIG_T = 1e30
FETCH_EVERY = 4      # default sub-steps per group; first carries the gather
PHASE1_GROUPS = 10   # default groups before straggler compaction
PACK_FRACTION = 4    # default packed capacity = N / PACK_FRACTION


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TraceResult:
    hit: jnp.ndarray         # bool (N,)
    face: jnp.ndarray        # int32 (N,) axis of entry face: 0=x 1=y 2=z
    axis_coord: jnp.ndarray  # int32 (N,) entry-plane block coordinate
    t: jnp.ndarray           # f32 (N,) conservative entry distance
    iterations: jnp.ndarray  # int32 (N,) DDA sub-steps (debug heatmap parity)
    fetches: jnp.ndarray     # int32 (N,) node rows fetched (buffer_fetches)
    missed_pops: jnp.ndarray  # int32 (N,) nodes entered-but-missed (the
                              # reference ExitType counter, slang :251 — here
                              # counted as popped levels per node exit)

    def tree_flatten(self):
        return (self.hit, self.face, self.axis_coord, self.t,
                self.iterations, self.fetches, self.missed_pops), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _sel3(face, x, y, z):
    return jnp.where(face == 0, x, jnp.where(face == 1, y, z))


def _sel_level(level, values):
    """values[level] via a select chain (values: static scalars, any dtype)."""
    out = jnp.full(level.shape, values[-1], dtype=jnp.asarray(values[-1]).dtype)
    for lv in range(len(values) - 2, -1, -1):
        out = jnp.where(level == lv, values[lv], out)
    return out


# bit layouts live in ONE module (world/occupancy.py) — a layout change
# must not need coordinated edits across traverse/overlap/jump/sunshadow
from vvr_tpu.world.occupancy import bit64 as _bit64  # noqa: E402


def _sel8(g, sub, off):
    """g[2*sub + off] via a select tree (g: sequence of 16 (N,) u32 vectors,
    sub in 0..7). The group words live as SEPARATE contiguous vectors, not
    an (N, 16) array: column reads of an interleaved array are 16-byte-
    strided vector loads, which profiling showed dominate the sub-step cost
    (the 'slice' fusions in tools/profile_trace.py)."""
    c = [jnp.where((sub & 1) == 0, g[4 * k + off], g[4 * k + 2 + off])
         for k in range(4)]
    d0 = jnp.where((sub & 2) == 0, c[0], c[1])
    d1 = jnp.where((sub & 2) == 0, c[2], c[3])
    return jnp.where((sub & 4) == 0, d0, d1)


def solid_at(pyr: BrickPyramid, p):
    """Occupancy of the voxel containing position p ((..., 3) f32/int) —
    one level-1 node-row gather + bit test (level-1 any bits ARE voxels).
    Out-of-world positions clip to the nearest voxel (camera probes)."""
    from vvr_tpu.world.occupancy import pyramid_voxel_solid
    v = jnp.clip(jnp.floor(jnp.asarray(p, F32)).astype(I32), 0,
                 pyr.size - 1)
    return pyramid_voxel_solid(pyr, v)


def _addr_fns(pyr: BrickPyramid):
    """(node_addr, group_addr) closures over static pyramid metadata."""
    depth = pyr.depth
    size = pyr.size
    bases = [I32(b) for b in pyr.bases] + [I32(0)]
    ngrid = [I32(max(size >> (2 * lv), 1)) for lv in range(depth + 1)]

    def node_addr(lvl, cx, cy, cz):
        g = _sel_level(lvl, ngrid)
        return _sel_level(lvl, bases) + cx + cy * g + cz * g * g

    if pyr.gbases is None:
        return node_addr, None
    gbases = [I32(b) for b in pyr.gbases] + [I32(0)]
    ggrid = [I32(max((max(size >> (2 * lv), 1) + 1) // 2, 1))
             for lv in range(depth + 1)]

    def group_addr(lvl, cx, cy, cz):
        g = _sel_level(lvl, ggrid)
        return (_sel_level(lvl, gbases) + (cx >> 1) + (cy >> 1) * g
                + (cz >> 1) * g * g)

    return node_addr, group_addr


def _make_stepper(pyr: BrickPyramid, ray, max_steps: int, count_stats: bool,
                  use_full: bool = True, grouped: bool = False):
    """Returns (fetch_fn, alu_fn) over dict state, closed over static pyramid
    metadata and the per-ray constants. use_full=True walks the per-node
    (any, full) table with the FULL_NODE early-out; use_full=False walks the
    any-only 8-byte rows (measured fastest on v5e: the A/B in
    tools/ab_grouped.py put any8B at 2.6x the grouped path — register-
    caching a 64 B group costs more ALU/state bandwidth than it saves in
    gathers); grouped=True additionally walks the 2x2x2-group 64 B rows with
    a register cache (kept as an opt-in experiment). Identical hit results
    in all modes."""
    depth = pyr.depth
    size = pyr.size
    grouped = grouped and (not use_full) and pyr.rows_grp is not None
    rows = pyr.rows_grp if grouped else (pyr.rows if use_full else pyr.rows_any)
    (ox, oy, oz, dx, dy, dz, ix_, iy_, iz_, sx, sy, sz, px_, py_, pz_) = ray

    node_addr, group_addr = _addr_fns(pyr)
    # static per-level constants; level l node has children at level l-1
    child_sz = [F32(1 << (2 * max(lv - 1, 0))) for lv in range(depth + 1)]
    inv_grand = [F32(1.0 / (1 << (2 * max(lv - 2, 0)))) for lv in range(depth + 1)]
    grid_child = [I32(size >> (2 * max(lv - 1, 0))) for lv in range(depth + 1)]

    def fetch(s):
        did = s["pend"] & s["act"]
        addr = jnp.where(did, s["addr"], 0)
        r = jnp.take(rows, addr, axis=0, mode="clip")
        s = dict(s)
        if grouped:
            sub = ((s["nx"] & 1) | ((s["ny"] & 1) << 1)
                   | ((s["nz"] & 1) << 2))
            rs = [r[:, k] for k in range(16)]  # one strided unpack per fetch
            s["alo"] = jnp.where(did, _sel8(rs, sub, 0), s["alo"])
            s["ahi"] = jnp.where(did, _sel8(rs, sub, 1), s["ahi"])
            for k in range(16):
                s[f"g{k}"] = jnp.where(did, rs[k], s[f"g{k}"])
            s["gaddr"] = jnp.where(did, s["addr"], s["gaddr"])
        else:
            s["alo"] = jnp.where(did, r[:, 0], s["alo"])
            s["ahi"] = jnp.where(did, r[:, 1], s["ahi"])
            if use_full:
                s["flo"] = jnp.where(did, r[:, 2], s["flo"])
                s["fhi"] = jnp.where(did, r[:, 3], s["fhi"])
        s["pend"] = s["pend"] & ~did
        if count_stats:
            s["fe"] = s["fe"] + did.astype(I32)
        return s

    def alu(s):
        act, pend = s["act"], s["pend"]
        live = act & ~pend
        lvl = s["lvl"]
        nx, ny, nz = s["nx"], s["ny"], s["nz"]
        lx, ly, lz = s["lx"], s["ly"], s["lz"]
        t = s["t"]

        bit = (lx | (ly << 2) | (lz << 4)).astype(I32)
        abit = _bit64(s["alo"], s["ahi"], bit)
        leaf = lvl == 1
        if use_full:
            fbit = _bit64(s["flo"], s["fhi"], bit)
            hit_now = live & abit & (leaf | fbit)
        else:
            hit_now = live & abit & leaf
        desc = live & abit & ~hit_now
        stepping = live & ~abit

        # ---- descend: new node = child cell at level lvl-1
        dnx = nx * 4 + lx
        dny = ny * 4 + ly
        dnz = nz * 4 + lz
        dlvl = jnp.maximum(lvl - 1, 1)
        inv_g = _sel_level(lvl, inv_grand)  # grandchild cell size reciprocal
        dlx = jnp.clip(((ox + dx * t) * inv_g).astype(I32) - dnx * 4, 0, 3)
        dly = jnp.clip(((oy + dy * t) * inv_g).astype(I32) - dny * 4, 0, 3)
        dlz = jnp.clip(((oz + dz * t) * inv_g).astype(I32) - dnz * 4, 0, 3)

        # ---- step: exit t of the current child cell (z > y > x tie rule)
        cs = _sel_level(lvl, child_sz)
        bx = (nx * 4 + lx + px_).astype(F32) * cs
        by = (ny * 4 + ly + py_).astype(F32) * cs
        bz = (nz * 4 + lz + pz_).astype(F32) * cs
        tx = jnp.where(dx == 0.0, F32(BIG_T), (bx - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(BIG_T), (by - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(BIG_T), (bz - oz) * iz_)
        t_exit = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= t_exit, 2, jnp.where(ty <= t_exit, 1, 0))

        slx = lx + jnp.where(nface == 0, sx, 0)
        sly = ly + jnp.where(nface == 1, sy, 0)
        slz = lz + jnp.where(nface == 2, sz, 0)
        inside_node = ((slx >= 0) & (slx <= 3) & (sly >= 0) & (sly <= 3)
                       & (slz >= 0) & (slz <= 3))

        # node exit: stepped child coords in the level-(lvl-1) grid
        gcx = nx * 4 + slx
        gcy = ny * 4 + sly
        gcz = nz * 4 + slz
        gsz = _sel_level(lvl, grid_child)
        oob = ((gcx < 0) | (gcx >= gsz) | (gcy < 0) | (gcy >= gsz)
               | (gcz < 0) | (gcz >= gsz))

        crossed = _sel3(nface, gcx, gcy, gcz)
        ssign = _sel3(nface, sx, sy, sz)
        cross_c = jnp.where(ssign > 0, crossed, crossed + 1)
        # ascend `a` levels: new node level L = lvl + a, capped at depth.
        # alignment in level-(lvl-1) cell units: each extra aligned base-4
        # digit beyond the first allows one more level up. a = the number of
        # trailing base-4 zero digits of cross_c>>2, via the branch-free
        # ctz identity popcount((x & -x) - 1) (x=0 -> 32 -> capped anyway).
        cap = depth - lvl
        cur = (cross_c >> 2).astype(U32)
        ctz = jnp.bitwise_count((cur & (~cur + U32(1))) - U32(1)).astype(I32)
        a = jnp.minimum(ctz >> 1, cap)
        newl = lvl + a
        # new node cell (level L) and local coords (level L-1) of position
        shift_node = 2 * (a + 1)
        shift_loc = 2 * a
        anx = gcx >> shift_node
        any_ = gcy >> shift_node
        anz = gcz >> shift_node
        alx = (gcx >> shift_loc) & 3
        aly = (gcy >> shift_loc) & 3
        alz = (gcz >> shift_loc) & 3

        exit_node = stepping & ~inside_node & ~oob
        trans = desc | exit_node

        # transition target node (descend and exit are mutually exclusive)
        tlvl = jnp.where(desc, dlvl, newl)
        tnx = jnp.where(desc, dnx, anx)
        tny = jnp.where(desc, dny, any_)
        tnz = jnp.where(desc, dnz, anz)

        # ---- merge
        out = dict(s)
        if grouped:
            taddr = group_addr(tlvl, tnx, tny, tnz)
            cache_hit = trans & (taddr == s["gaddr"])
            need = trans & ~cache_hit
            sub = ((tnx & 1) | ((tny & 1) << 1) | ((tnz & 1) << 2))
            gvecs = [s[f"g{k}"] for k in range(16)]
            out["alo"] = jnp.where(cache_hit, _sel8(gvecs, sub, 0),
                                   s["alo"])
            out["ahi"] = jnp.where(cache_hit, _sel8(gvecs, sub, 1),
                                   s["ahi"])
        else:
            taddr = node_addr(tlvl, tnx, tny, tnz)
            need = trans
        out["hit"] = s["hit"] | hit_now
        out["act"] = act & ~hit_now & ~(stepping & oob)
        out["pend"] = pend | need
        out["addr"] = jnp.where(need, taddr, s["addr"])
        out["nx"] = jnp.where(trans, tnx, nx)
        out["ny"] = jnp.where(trans, tny, ny)
        out["nz"] = jnp.where(trans, tnz, nz)
        out["lvl"] = jnp.where(trans, tlvl, lvl)
        out["lx"] = jnp.where(desc, dlx,
                              jnp.where(exit_node, alx,
                                        jnp.where(stepping, slx, lx)))
        out["ly"] = jnp.where(desc, dly,
                              jnp.where(exit_node, aly,
                                        jnp.where(stepping, sly, ly)))
        out["lz"] = jnp.where(desc, dlz,
                              jnp.where(exit_node, alz,
                                        jnp.where(stepping, slz, lz)))
        out["t"] = jnp.where(stepping, t_exit, t)
        out["face"] = jnp.where(stepping, nface, s["face"])
        out["hlvl"] = jnp.where(hit_now, lvl, s["hlvl"])
        out["it"] = s["it"] + live.astype(I32)
        if count_stats:
            out["em"] = s["em"] + jnp.where(exit_node, a + 1, 0)
        capped = out["it"] >= max_steps
        out["act"] = out["act"] & ~capped
        return out

    return fetch, alu


def _run_groups(fetch, alu, state, n_groups: int | None, fetch_every: int):
    """Run (fetch + (fetch_every-1) alu) groups; bounded if n_groups given,
    else while any ray is active."""
    def group(s):
        s = fetch(s)
        for _ in range(fetch_every - 1):
            s = alu(s)
        return s

    if n_groups is not None:
        # bounded runs must still exit when no lane is active: overflow
        # fallback traces otherwise burn full-width gather groups on zero
        # work (a fori_loop here cost ~800 ms/frame of dead gathers)
        def bcond(c):
            return (c[0] < n_groups) & jnp.any(c[1]["act"])

        def bbody(c):
            return c[0] + 1, group(c[1])

        return jax.lax.while_loop(bcond, bbody, (0, state))[1]

    def cond(s):
        return jnp.any(s["act"])
    return jax.lax.while_loop(cond, group, state)


def _init_state(pyr: BrickPyramid, n, act0, o3, s_lvl, start_cell, use_full,
                grouped):
    ox, oy, oz = o3
    zero_i = jnp.zeros((n,), I32)
    zero_u = jnp.zeros((n,), U32)
    size = pyr.size
    if start_cell is None:
        ncx0 = ncy0 = ncz0 = zero_i
    else:
        sc = start_cell.astype(I32)
        ncx0 = jnp.broadcast_to(sc[0], (n,))
        ncy0 = jnp.broadcast_to(sc[1], (n,))
        ncz0 = jnp.broadcast_to(sc[2], (n,))
    node_addr, group_addr = _addr_fns(pyr)
    lvl0 = jnp.full((n,), s_lvl, I32)
    if grouped:
        addr0 = group_addr(lvl0, ncx0, ncy0, ncz0)
    else:
        addr0 = node_addr(lvl0, ncx0, ncy0, ncz0)
    inv_child0 = F32(1.0 / (1 << (2 * (s_lvl - 1))))
    state = dict(
        act=act0, hit=jnp.zeros((n,), bool), pend=act0,
        nx=ncx0, ny=ncy0, nz=ncz0, lvl=lvl0,
        alo=zero_u, ahi=zero_u,
        lx=jnp.clip((ox * inv_child0).astype(I32) - ncx0 * 4, 0, 3),
        ly=jnp.clip((oy * inv_child0).astype(I32) - ncy0 * 4, 0, 3),
        lz=jnp.clip((oz * inv_child0).astype(I32) - ncz0 * 4, 0, 3),
        t=jnp.zeros((n,), F32), face=zero_i, addr=addr0,
        it=zero_i, fe=zero_i, em=zero_i, hlvl=jnp.ones((n,), I32),
    )
    if use_full:
        state["flo"] = zero_u
        state["fhi"] = zero_u
    if grouped:
        for k in range(16):
            state[f"g{k}"] = zero_u
        state["gaddr"] = jnp.full((n,), -1, I32)
    return state


@functools.partial(jax.jit, static_argnames=("max_steps", "compact",
                                             "pack_first", "fetch_every",
                                             "phase1_groups", "pack_fraction",
                                             "with_stats", "start_level",
                                             "use_full", "grouped", "cascade"))
def trace(pyr: BrickPyramid, ray_o, ray_d, max_steps: int = 512,
          active=None, compact: bool = True,
          pack_first: int | None = None, fetch_every: int = FETCH_EVERY,
          phase1_groups: int = PHASE1_GROUPS,
          pack_fraction: int = PACK_FRACTION,
          with_stats: bool = True, start_level: int | None = None,
          start_cell=None, use_full: bool = True, grouped: bool = False,
          cascade: tuple | None = None) -> TraceResult:
    """Trace N rays against the brick pyramid. ray_o/ray_d: (N, 3) f32.

    pack_first: if given (static), rays with active=True are front-packed
    into a batch of that capacity before tracing — use when a minority of
    lanes is active (e.g. shadow rays from hit pixels) so inactive lanes do
    not pay the per-group gather. Overflow beyond the capacity is traced at
    full width by the safety net (zero extra trips when it fits)."""
    if pack_first is not None and active is not None:
        n = ray_o.shape[0]
        np_idx = jnp.nonzero(active, size=pack_first, fill_value=n)[0]
        p_valid = np_idx < n
        p_safe = jnp.minimum(np_idx, n - 1)
        sub = trace(pyr, ray_o[p_safe], ray_d[p_safe], max_steps=max_steps,
                    active=p_valid, compact=compact, pack_first=None,
                    fetch_every=fetch_every, phase1_groups=phase1_groups,
                    pack_fraction=pack_fraction, with_stats=with_stats,
                    use_full=use_full, grouped=grouped)
        # overflow lanes (beyond capacity) traced at full width; zero work
        # when everything fit
        packed_mark = jnp.zeros((n,), bool).at[np_idx].set(p_valid, mode="drop")
        overflow = active & ~packed_mark
        # full-width overflow net under lax.cond: zero device work unless
        # the pack capacity actually overflowed (the trivial branch equals
        # a trace over an empty active set — hit=False, t=BIG_T, face=0)
        rest = jax.lax.cond(
            jnp.any(overflow),
            lambda _: trace(pyr, ray_o, ray_d, max_steps=max_steps,
                            active=overflow, compact=True, pack_first=None,
                            fetch_every=fetch_every, with_stats=with_stats,
                            use_full=use_full, grouped=grouped),
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
    depth = pyr.depth
    size = pyr.size
    n = ray_o.shape[0]
    grouped = grouped and (not use_full) and pyr.rows_grp is not None

    ox, oy, oz = (ray_o[:, i].astype(F32) for i in range(3))
    dx, dy, dz = (ray_d[:, i].astype(F32) for i in range(3))

    def inv(dc):
        return jnp.where(dc == 0.0, F32(BIG_T), 1.0 / dc)

    ray = (ox, oy, oz, dx, dy, dz, inv(dx), inv(dy), inv(dz),
           jnp.where(dx > 0, 1, -1).astype(I32),
           jnp.where(dy > 0, 1, -1).astype(I32),
           jnp.where(dz > 0, 1, -1).astype(I32),
           (dx > 0).astype(I32), (dy > 0).astype(I32), (dz > 0).astype(I32))

    inside = ((ox >= 0) & (ox < size) & (oy >= 0) & (oy < size)
              & (oz >= 0) & (oz < size))
    act0 = inside if active is None else (inside & active)

    # start-node hint: when every active origin shares one node (primary
    # camera rays), skip the common root descent — ~2 fetches per ray. The
    # traversal is correct from ANY node containing the origins: empty nodes
    # simply step + ascend out (dense addressing means every cell has a row).
    s_lvl = depth if start_level is None else start_level
    state = _init_state(pyr, n, act0, (ox, oy, oz), s_lvl, start_cell,
                        use_full, grouped)

    fetch, alu = _make_stepper(pyr, ray, max_steps, with_stats, use_full,
                               grouped)

    def outputs(st, rr, oo):
        oxx, oyy, ozz = oo
        hit = st["hit"]
        face = st["face"]
        hlvl = jnp.maximum(st["hlvl"] - 1, 0)     # hit child level
        ccx = st["nx"] * 4 + st["lx"]
        ccy = st["ny"] * 4 + st["ly"]
        ccz = st["nz"] * 4 + st["lz"]
        vsz = I32(1) << (2 * hlvl)
        origin_f = _sel3(face, ccx, ccy, ccz) * vsz
        neg = _sel3(face, rr[9], rr[10], rr[11]) < 0
        axis_coord = origin_f + jnp.where(neg, vsz - 1, 0)
        sv = _sel3(face, jnp.clip(oxx.astype(I32), 0, size - 1),
                   jnp.clip(oyy.astype(I32), 0, size - 1),
                   jnp.clip(ozz.astype(I32), 0, size - 1))
        axis_coord = jnp.where(st["t"] == 0.0, sv, axis_coord)
        return TraceResult(hit=hit, face=face,
                           axis_coord=jnp.where(hit, axis_coord, 0),
                           t=jnp.where(hit, st["t"], F32(BIG_T)),
                           iterations=st["it"], fetches=st["fe"],
                           missed_pops=st["em"])

    if not (compact and n >= 4096):
        state = _run_groups(fetch, alu, state, None, fetch_every)
        return outputs(state, ray, (ox, oy, oz))

    # ---- compaction cascade: bounded full-width groups, then repeatedly
    # front-pack survivors into geometrically smaller batches. Each level
    # keeps a full-width safety net (zero trips unless its pack capacity
    # overflowed), so results are exact for any survivor distribution.
    def make_ray(ro, rd):
        rox, roy, roz = (ro[:, i].astype(F32) for i in range(3))
        rdx, rdy, rdz = (rd[:, i].astype(F32) for i in range(3))
        return (rox, roy, roz, rdx, rdy, rdz, inv(rdx), inv(rdy), inv(rdz),
                jnp.where(rdx > 0, 1, -1).astype(I32),
                jnp.where(rdy > 0, 1, -1).astype(I32),
                jnp.where(rdz > 0, 1, -1).astype(I32),
                (rdx > 0).astype(I32), (rdy > 0).astype(I32),
                (rdz > 0).astype(I32))

    node_addr_f, group_addr_f = _addr_fns(pyr)

    def finish(st, ro, rd, rr, rounds):
        """Run the remaining cascade on (state, rays); returns TraceResult."""
        f_fn, a_fn = _make_stepper(pyr, rr, max_steps, with_stats, use_full,
                                   grouped)
        o3 = (rr[0], rr[1], rr[2])
        m0 = ro.shape[0]
        if not rounds:
            with jax.named_scope(f"tr_final_while_w{m0}"):
                st = _run_groups(f_fn, a_fn, st, None, fetch_every)
            return outputs(st, rr, o3)

        cap, groups = rounds[0]
        with jax.named_scope(f"tr_groups_w{m0}"):
            st = _run_groups(f_fn, a_fn, st, groups, fetch_every)

        m = ro.shape[0]
        idx = jnp.nonzero(st["act"], size=cap, fill_value=m)[0]
        valid = idx < m
        safe = jnp.minimum(idx, m - 1)
        sro = ro[safe]
        srd = rd[safe]
        srr = make_ray(sro, srd)

        snx, sny, snz = st["nx"][safe], st["ny"][safe], st["nz"][safe]
        slvl = st["lvl"][safe]
        if grouped:
            saddr = group_addr_f(slvl, snx, sny, snz)
        else:
            saddr = node_addr_f(slvl, snx, sny, snz)
        zc = jnp.zeros((cap,), U32)
        sub = dict(
            act=valid, hit=jnp.zeros((cap,), bool), pend=valid,
            nx=snx, ny=sny, nz=snz, lvl=slvl,
            alo=zc, ahi=zc,
            lx=st["lx"][safe], ly=st["ly"][safe], lz=st["lz"][safe],
            t=st["t"][safe], face=st["face"][safe], addr=saddr,
            it=st["it"][safe], fe=st["fe"][safe], em=st["em"][safe],
            hlvl=jnp.ones((cap,), I32),
        )
        if use_full:
            sub["flo"] = zc
            sub["fhi"] = zc
        if grouped:
            for k in range(16):
                sub[f"g{k}"] = zc
            sub["gaddr"] = jnp.full((cap,), -1, I32)
        sres = finish(sub, sro, srd, srr, rounds[1:])

        # deactivate packed lanes; safety net for capacity overflow
        mark = jnp.zeros((m,), bool).at[idx].set(valid, mode="drop")
        st = dict(st)
        st["act"] = st["act"] & ~mark
        with jax.named_scope(f"tr_net_w{m}"):
            st = _run_groups(f_fn, a_fn, st, None, fetch_every)
        res = outputs(st, rr, o3)

        def merge(a, b):
            # fill slots carry idx == m and are dropped by the scatter
            return a.at[idx].set(b, mode="drop")
        return TraceResult(
            hit=merge(res.hit, sres.hit),
            face=merge(res.face, sres.face),
            axis_coord=merge(res.axis_coord, sres.axis_coord),
            t=merge(res.t, sres.t),
            iterations=merge(res.iterations, sres.iterations) if with_stats
            else res.iterations,
            fetches=merge(res.fetches, sres.fetches) if with_stats
            else res.fetches,
            missed_pops=merge(res.missed_pops, sres.missed_pops)
            if with_stats else res.missed_pops)

    # phase 1 at full width, then the cascade. finish()'s convention per
    # entry (cap, groups): run `groups` at the current width, then pack
    # survivors into `cap`; the recursion base runs while-till-done at the
    # smallest width. Survivor fractions shrink faster than capacities, and
    # every level's safety net covers overflow exactly.
    with jax.named_scope(f"tr_phase1_w{n}"):
        state = _run_groups(fetch, alu, state, phase1_groups, fetch_every)
    # capacities follow the measured survivor curve (terrain camera, v5e:
    # ~49% active after 10 groups, 8.4% after 24, ~0.4% after 50) with
    # margin; packing costs ~150 ns/lane so needless capacity is expensive,
    # and the per-level overflow nets keep any distribution correct.
    # `cascade` overrides the schedule: ((num, den, groups), ...) meaning
    # pack survivors into capacity n*num//den after running `groups` more
    # full/packed-width groups (see finish()); used by tools/sweep_trace.py.
    if cascade is None:
        seq = [
            (max((n * 11) // 20, 2048), 0),
            (max(n // 10, 2048), 14),
            (max(n // 50, 2048), 26),
        ]
    else:
        seq = [(max((n * num) // den, 2048), groups)
               for (num, den, groups) in cascade]
    return finish(state, ray_o, ray_d, ray, seq)
