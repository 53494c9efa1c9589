"""Primary-ray visibility by exposed-face rasterization — object-order
first hits.

The per-ray DDA costs O(pixels x traversal steps) of VPU work; round-2
profiling (PROGRESS.md cost model v2) showed that wall saturates the VPU at
~2.3 Mrays/s regardless of acceleration structure. Primary rays from a
pinhole camera admit an object-order flip: every first hit (from an
empty-space origin) lies on an *exposed face* (world/faces.py), so
first-hit visibility = depth-min rasterization of those faces. Cost:
O(faces + covered fragments + pixels), ~100x less arithmetic at 256^3.

Exactness contract (same bar as every traversal kernel in this repo —
bit-equality with render/oracle.py on the test corpus):
  * the fragment t is the oracle's own entry formula
    (plane - o_axis) * (1/d_axis), with d recomputed per fragment by the
    raygen formulas (identical op sequence => identical floats);
  * per-pixel winners are resolved by scatter-min over a monotonic u32
    key: the bit pattern of positive f32 t (IEEE positive floats order
    as unsigned ints), exponent-biased into 30 bits, with the fragment's
    FACE AXIS in the 2 low bits. Only real fragments nominate an axis,
    and exact cross-axis t-ties resolve x > y > z — the oracle steps
    tied axes z -> y -> x and hits on the LAST step that enters solid,
    so among real tied faces x wins (the engineered-tie test
    test_adversarial_near_tie_winners pins this);
  * the winning plane is RECONSTRUCTED per pixel from (t, axis): the
    candidate planes floor/ceil of o + d*t along the DECODED axis are
    re-evaluated through the same t formula and matched within a few
    ulps — planes are >= 1 apart, so the match is unambiguous;
  * rays whose origin is outside the volume miss (trace_shi rule,
    shaders/ray_stuff_other.slang:424-437); a ray whose origin voxel is
    solid hits at t=0 with face=0 (oracle start-in-solid semantics).

Coverage uses floor(o_u + d_u * t) == face_u — the oracle's cell tracking
is incremental, so agreement at voxel-edge-grazing rays is validated by
the oracle-equality tests rather than proved; the same empirical bar the
jump kernels' clipped landings meet.

Faces are binned per frame by projected bounding box into fixed KxK
fragment buckets (4/16/64), with bbox overflow routed upward and a
dynamic-trip full-screen loop as the final safety net — every visible face
is rasterized exactly once regardless of camera.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.ops.traverse import BIG_T, TraceResult

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

SENTINEL = jnp.uint32(0xFFFFFFFF)


def _project_faces(fv, cam, width: int, height: int):
    """Per-face visibility + conservative pixel bbox of the projected quad.
    Returns (visible, straddle, onscreen, imin, imax, jmin, jmax,
    ics, jcs) — ics/jcs (F, 4) are the projected corner pixel coords in
    (du, dv) order (0,0),(0,1),(1,0),(1,1), valid when not straddling
    (the hi-z cull's convex-quad containment test uses them)."""
    vx, vy, vz, axis, sgn, eu, ev = fv[:7]
    eu = eu.astype(F32)
    ev = ev.astype(F32)
    pos, right, up, forward, tan_half = cam
    ratio = width / height
    tx = tan_half
    ty = tan_half / ratio
    n = vx.shape[0]
    plane = jnp.where(axis == 0, vx, jnp.where(axis == 1, vy, vz)) + sgn
    o_a = jnp.where(axis == 0, pos[0], jnp.where(axis == 1, pos[1], pos[2]))
    visible = jnp.where(sgn == 1, o_a > plane.astype(F32),
                        o_a < plane.astype(F32))
    # zero-extent rows are slot padding (WorldEditor incremental faces) —
    # never rasterized
    visible = visible & (eu > 0)

    # quad corners: plane coordinate on `axis`, (u, v+{0,1}) spans on others
    base = jnp.stack([vx, vy, vz], -1).astype(F32)       # (N, 3)
    pc = plane.astype(F32)
    imin = jnp.full((n,), width, I32)
    imax = jnp.full((n,), -1, I32)
    jmin = jnp.full((n,), height, I32)
    jmax = jnp.full((n,), -1, I32)
    some_behind = jnp.zeros((n,), bool)
    all_behind = jnp.ones((n,), bool)
    ics = []
    jcs = []
    ax_is = [axis == 0, axis == 1, axis == 2]
    for du_ in (0.0, 1.0):
        for dv_ in (0.0, 1.0):
            # corner coordinates: on `axis` -> plane; on the other two axes
            # -> voxel coord + {0,eu}/{0,ev}: axis 0 spans (y+du*eu,
            # z+dv*ev), axis 1 (x+du*eu, z+dv*ev), axis 2 (x+du*eu,
            # y+dv*ev) — the FaceSet u/v mapping
            cx = jnp.where(ax_is[0], pc, base[:, 0] + du_ * eu)
            cy = jnp.where(ax_is[1], pc,
                           base[:, 1] + jnp.where(ax_is[0], du_ * eu,
                                                  dv_ * ev))
            cz = jnp.where(ax_is[2], pc, base[:, 2] + dv_ * ev)
            qx = cx - pos[0]
            qy = cy - pos[1]
            qz = cz - pos[2]
            zc = qx * forward[0] + qy * forward[1] + qz * forward[2]
            xc = qx * right[0] + qy * right[1] + qz * right[2]
            yc = qx * up[0] + qy * up[1] + qz * up[2]
            beh = zc <= 1e-6
            some_behind = some_behind | beh
            all_behind = all_behind & beh
            zs = jnp.maximum(zc, 1e-6)
            su = xc / (zs * tx)
            sv = yc / (zs * ty)
            ic = (su + 1.0) * (width * 0.5) - 0.5
            jc = (1.0 - sv) * (height * 0.5) - 0.5
            ics.append(ic)
            jcs.append(jc)
            # sub-pixel conservative margin (fragments are the cost unit:
            # a whole-pixel margin doubled small faces' area)
            imin = jnp.minimum(imin, jnp.floor(ic - 0.01).astype(I32))
            imax = jnp.maximum(imax, jnp.ceil(ic + 0.01).astype(I32))
            jmin = jnp.minimum(jmin, jnp.floor(jc - 0.01).astype(I32))
            jmax = jnp.maximum(jmax, jnp.ceil(jc + 0.01).astype(I32))
    onscreen = (imax >= 0) & (imin <= width - 1) & (jmax >= 0) \
        & (jmin <= height - 1)
    imin = jnp.clip(imin, 0, width - 1)
    imax = jnp.clip(imax, 0, width - 1)
    jmin = jnp.clip(jmin, 0, height - 1)
    jmax = jnp.clip(jmax, 0, height - 1)
    # a face whose corners ALL lie behind the camera plane cannot contain
    # any point o + t*d with t > 0 (every in-FOV d has positive forward
    # component) — geometrically invisible. Straddling faces can't be
    # bboxed and go to the full-screen net.
    straddle = some_behind & ~all_behind
    return (visible & ~all_behind, straddle, onscreen, imin, imax, jmin,
            jmax, jnp.stack(ics, -1), jnp.stack(jcs, -1))


# Default tile shape in pixels; fragments per entry = TKX*TKY. The tile
# is the fragment vector's MINOR axis: (CH, TKX*TKY) elementwise ops run
# at (TKX*TKY)/128 lane utilization on TPU (8,128)-tiled vregs, so wider
# tiles trade wasted coverage lanes (small faces still pay a full tile)
# for full-width vector ops. 4x4 was the round-2 choice when the scatter
# was per-ELEMENT; round-5 re-measured with the per-entry row scatter:
# 8x4 wins (65-68 vs 68-73 ms/call at the bench camera incl. sync; 12x4
# ties 8x4 within tunnel noise, 8x8/16x4 regress — tools/
# ab_raster_tile.py, winners bit-identical across shapes).
TKX = 8
TKY = 4


def _f32_bits(t):
    """Monotonic u32 key for positive f32 t."""
    return jax.lax.bitcast_convert_type(t, jnp.uint32)


# the oracle steps tied axes in z -> y -> x order and hits on the LAST
# step that enters solid, so among REAL tied faces x beats y beats z
# (tests/test_raster_trace.py::test_adversarial_near_tie_winners found
# the old fixed z>y>x reconstruction rank wrong at engineered exact ties)
_BITS_BIAS = jnp.uint32(0x20000000)   # exponent 64: t >= 2^-63 assumed


def _axis_key_dyn(t, axis):
    """Monotonic u32 scatter key carrying the fragment's face axis in the
    2 low bits: (t_bits - BIAS) << 2 | axis. Exponent-biasing makes room
    (covered fragments have t far below 2^64, keeping the shifted value
    under 2^32); ties in t then resolve by the oracle's step preference
    (x > y > z among real faces), and the winner's AXIS is decoded from
    the key — only real fragments ever nominate an axis, which is what
    makes tie resolution exact."""
    b = _f32_bits(t)
    b = jnp.where(b > _BITS_BIAS, b - _BITS_BIAS, jnp.uint32(0))
    pref = jnp.where(axis == 0, 0, jnp.where(axis == 1, 1, 2))
    return (b << 2) | pref.astype(jnp.uint32)


def _key_decode(key):
    """(t_bits, axis) of a scatter key (valid only when key != SENTINEL)."""
    return (key >> 2) + _BITS_BIAS, (key & 3).astype(I32)


@functools.partial(jax.jit, static_argnames=("size", "width", "height",
                                             "cap_entries", "cap_screen",
                                             "band_h", "tkx", "tky"))
def trace_raster(faces, cam, d_rays, solid_probe, size: int, width: int,
                 height: int, cap_entries: int = 1 << 20,
                 cap_screen: int = 4096, j0=0,
                 band_h: int | None = None, tkx: int = TKX,
                 tky: int = TKY) -> TraceResult:
    """First hits of the camera's H x W primary rays against the face set.

    Band mode (multi-chip sharding, parallel/mesh.py): pass `band_h` (the
    band's pixel-row count, static) and `j0` (its first global row,
    traced — inside shard_map it is axis_index * band_h) with `d_rays`
    the band's own rays; faces are bbox-clipped to the band and the
    result covers band_h*width rays. Fragment floats depend only on
    GLOBAL pixel coordinates, so banded winners == full-frame winners
    bit-for-bit (tests/test_parallel.py).

    faces: device tuple (vx, vy, vz, axis, sgn, eu, ev), int32 (F,)
    cam:   (pos(3,), right(3,), up(3,), forward(3,), tan_half) f32
    d_rays: (H*W, 3) f32 — THE wavefront's own direction array (raygen
            output). Fragments recompute d by formula (cheap, but XLA's
            shape-dependent FMA contraction wobbles it ~1 ulp), so the
            key's t bits are approximate; the per-pixel reconstruction
            recomputes the exact t/axis_coord from d_rays with the
            oracle's formulas along the key's decoded axis. Residual
            caveat: two distinct real faces of DIFFERENT axes whose true
            t's differ by 1-3 ulps without being equal could swap under
            the fragment wobble (exact ties are resolved exactly;
            unobserved on any corpus incl. the engineered-tie test).
    solid_probe: () bool — whether the camera's origin voxel is solid
                 (start-in-solid rays hit at t=0, face=0)

    Fragment generation is tile-exact (scatter elements are the cost unit,
    ~10 ns each — tools/profile_trace.py): each visible face emits
    ceil(w/TK)*ceil(h/TK) tile entries via an exclusive-scan allocation
    whose face ids propagate through a cumulative max (no dynamic shapes),
    and each entry rasterizes a TK x TK pixel tile. Faces that overflow
    cap_entries (allocation is prefix-ordered) or straddle the camera
    plane fall back to a dynamic-trip full-screen loop — every visible
    face is rasterized exactly once regardless of camera.

    Returns TraceResult over H*W rays (row-major, top-left first)."""
    vx, vy, vz, axis, sgn, feu, fev = faces[:7]
    pos = cam[0]
    if band_h is None:
        band_h = height
    j0 = jnp.asarray(j0, I32)
    n_pix = width * band_h
    f = vx.shape[0]
    # trace_shi bounds rule: origin outside [0, size)^3 -> miss everything
    inside = ((pos[0] >= 0) & (pos[0] < size) & (pos[1] >= 0)
              & (pos[1] < size) & (pos[2] >= 0) & (pos[2] < size))

    (visible, straddle, onscreen, imin, imax, jmin, jmax,
     ics, jcs) = _project_faces(faces, cam, width, height)
    # clip each face's row range to this band; empty -> face not binned
    jmin = jnp.maximum(jmin, j0)
    jmax = jnp.minimum(jmax, j0 + band_h - 1)
    ok = visible & ~straddle & onscreen & (jmin <= jmax)

    # ---- tile-entry allocation (SCREEN-aligned tiles) ----
    # Tiles are anchored to the band's TK x TK pixel grid, so each entry
    # owns exactly one tile and the per-fragment element scatter becomes a
    # per-entry ROW scatter-min into a (n_tiles, TK*TK) buffer. TPU
    # scatter cost is INDEX-count-bound like gathers (row width ~free —
    # tools/microbench_scatter.py), so this is ~TK*TK x cheaper than
    # scattering the same fragments as elements. u32-min over identical
    # keys is order-free, so winners are bit-identical to the element
    # scatter's (and band tile alignment does not matter either).
    ntx = -(-width // tkx)
    nty = -(-band_h // tky)
    n_tiles = ntx * nty
    ti0 = imin // tkx
    tw = imax // tkx - ti0 + 1
    tj0 = (jmin - j0) // tky
    th_ = (jmax - j0) // tky - tj0 + 1
    cnt = jnp.where(ok, tw * th_, 0)
    off = jnp.cumsum(cnt) - cnt                            # exclusive scan
    placed = ok & (off + cnt <= cap_entries)
    over_cap = ok & ~placed
    total = jnp.max(jnp.where(placed, off + cnt, 0)).astype(I32)

    idx_f = jnp.arange(f, dtype=I32)
    starts = jnp.zeros((cap_entries,), I32).at[
        jnp.where(placed & (cnt > 0), off, cap_entries)].max(
        idx_f, mode="drop")
    ent_face = jax.lax.cummax(starts)                      # (cap_entries,)
    # pad by one chunk so dynamic_slice never clamps its start (clamping
    # would silently misalign the chunk masks when total ~ cap_entries)
    CH = min(cap_entries, 1 << 17)
    ent_face = jnp.concatenate([ent_face, jnp.zeros((CH,), I32)])

    # per-entry face data: one gather from a BIT-PACKED (F, 6) i32 table
    # (the wider the row, the bigger the gather output and its transpose;
    # every field is a small non-negative int, so 14 logical columns pack
    # into 6 — exact shifts/masks, values unchanged). Field widths:
    # pixels < 32768 (16-bit pairs), voxel coords < 65536, axis*2+sgn < 6
    # (3 bits), face extents < 2048 (11 bits), off < cap_entries (2^20).
    ftab = jnp.stack([
        imin | (imax << 16),
        jmin | (jmax << 16),
        vx | (vy << 16),
        vz | ((axis * 2 + sgn) << 16) | (feu << 19),
        fev,
        off,
    ], axis=1)

    # process entries in dynamic-trip chunks so the cost scales with the
    # camera's actual entry count, not the static capacity
    q = jnp.arange(tkx * tky, dtype=I32)[None, :]

    # (A hierarchical-z occlusion cull was built and measured here in
    # round 3 — global-tile-aligned entries, per-tile far depth from
    # fully-covering faces, provably-safe 1e-3 cull margin. NET NEGATIVE:
    # only 15% of entries fully cover their tile on the bench terrain, so
    # the cull removed too few fragments to pay for its prepass +20%
    # entry inflation (138-155 ms -> 165-167 ms). Reverted; ledger in
    # PROGRESS.md.)

    tbuf_t = jnp.full((n_tiles + 1, tkx * tky), SENTINEL, jnp.uint32)

    # raygen constants for the in-body SoA direction math (must mirror
    # raygen.generate_rays op-for-op; see _ray_dir)
    ratio = width / height
    tan_half = cam[4]
    txc = tan_half
    tyc = tan_half / ratio
    right, up, forward = cam[1], cam[2], cam[3]

    def chunk_body(c):
        start, tb = c
        ek = start + jnp.arange(CH, dtype=I32)
        ent_ok = ek < total
        fidx = jax.lax.dynamic_slice(ent_face, (start,), (CH,))
        row = jnp.take(ftab, jnp.where(ent_ok, fidx, 0), axis=0,
                       mode="clip")                        # (CH, 6)
        # ONE transpose, then major-axis rows + bit unpack: direct
        # row[:, k] column slices of the gather each paid a cross-lane
        # relayout (the round-4 profile's 11 ms while/body/slice + 20 ms
        # slice_reduce fusions); rows of the transpose are free and the
        # field unpack is full-lane ALU
        rowT = row.T
        c0, c1, c2, c3, e_ev_f, e_off = [rowT[k] for k in range(6)]
        e_imin, e_imax = c0 & 0xFFFF, c0 >> 16
        e_jmin, e_jmax = c1 & 0xFFFF, c1 >> 16
        e_vx, e_vy = c2 & 0xFFFF, c2 >> 16
        e_vz = c3 & 0xFFFF
        e_axsgn = (c3 >> 16) & 7
        e_eu_f = c3 >> 19
        e_ti0 = e_imin // tkx
        e_tw = e_imax // tkx - e_ti0 + 1
        e_tj0 = (e_jmin - j0) // tky
        li = ek - e_off
        til = e_ti0 + li % jnp.maximum(e_tw, 1)
        tjl = e_tj0 + li // jnp.maximum(e_tw, 1)
        base_i = til * tkx
        base_j = tjl * tky + j0
        e_ax = e_axsgn >> 1
        e_sgn = e_axsgn & 1
        e_plane = (jnp.where(e_ax == 0, e_vx,
                             jnp.where(e_ax == 1, e_vy, e_vz))
                   + e_sgn).astype(F32)
        i = base_i[:, None] + (q % tkx)
        j = base_j[:, None] + (q // tkx)
        # screen-aligned tiles can overhang the face bbox on every side
        ins = (ent_ok[:, None]
               & (i >= e_imin[:, None]) & (i <= e_imax[:, None])
               & (j >= e_jmin[:, None]) & (j <= e_jmax[:, None]))
        # SoA per-channel ray directions (the _ray_dir op sequence without
        # the (CH, TK*TK, 3) stack — same scalar ops, no minor-3 layout)
        uu = (i.astype(F32) + 0.5) / width * 2.0 - 1.0
        vv = 1.0 - (j.astype(F32) + 0.5) / height * 2.0
        rdx = forward[0] + uu * txc * right[0] + vv * tyc * up[0]
        rdy = forward[1] + uu * txc * right[1] + vv * tyc * up[1]
        rdz = forward[2] + uu * txc * right[2] + vv * tyc * up[2]
        dn = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        rdx, rdy, rdz = rdx / dn, rdy / dn, rdz / dn
        ax2 = e_ax[:, None]
        d_a = jnp.where(ax2 == 0, rdx, jnp.where(ax2 == 1, rdy, rdz))
        o_a = jnp.where(ax2 == 0, pos[0],
                        jnp.where(ax2 == 1, pos[1], pos[2]))
        inv_a = jnp.where(d_a == 0.0, F32(BIG_T), 1.0 / d_a)
        t = (e_plane[:, None] - o_a) * inv_a
        hx = jnp.floor(pos[0] + rdx * t).astype(I32)
        hy = jnp.floor(pos[1] + rdy * t).astype(I32)
        hz = jnp.floor(pos[2] + rdz * t).astype(I32)
        # coverage is a per-cell range test over the merged rectangle —
        # identical fragments to rasterizing its unit faces one by one
        e_eu = e_eu_f[:, None]
        e_ev = e_ev_f[:, None]
        u_c = jnp.where(ax2 == 0, hy, hx)
        u_0 = jnp.where(ax2 == 0, e_vy[:, None], e_vx[:, None])
        v_c = jnp.where(ax2 == 2, hy, hz)
        v_0 = jnp.where(ax2 == 2, e_vy[:, None], e_vz[:, None])
        cov_u = (u_c >= u_0) & (u_c < u_0 + e_eu)
        cov_v = (v_c >= v_0) & (v_c < v_0 + e_ev)
        cover = ins & (t > 0.0) & cov_u & cov_v & (j >= j0) \
            & (j < j0 + band_h)
        # one row-min per ENTRY; uncovered lanes write SENTINEL (no-ops)
        tid = jnp.where(ent_ok, tjl * ntx + til, n_tiles)
        tb = tb.at[tid].min(
            jnp.where(cover, _axis_key_dyn(t, ax2), SENTINEL), mode="drop")
        return start + CH, tb

    _, tbuf_t = jax.lax.while_loop(lambda c: c[0] < total, chunk_body,
                                   (jnp.int32(0), tbuf_t))

    # net faces (below) are full-screen elementwise passes in PIXEL order;
    # they accumulate into their own flat buffer, merged after the unpack
    tbuf = jnp.full((n_pix + 1,), SENTINEL, jnp.uint32)

    # full-screen safety net: straddling + allocation-overflow faces.
    # EXHAUSTIVE (no truncation): the face list is scanned in fixed-size
    # chunks (outer while_loop skips chunks with no net faces — near-free),
    # and each net face inside a chunk costs one full-screen predicated
    # min (inner while_loop with dynamic trip = the chunk's true count).
    # Every visible face is rasterized exactly once regardless of camera
    # or face count — the documented contract, now without the cap_screen
    # hole (ADVICE r2 #2).
    cls_net = (visible & straddle) | over_cap
    d_all = d_rays                                        # (n_pix, 3)
    CH2 = min(cap_screen, 1 << 12)
    n_chunks = -(-f // CH2)
    pad = n_chunks * CH2 - f
    cls_pad = jnp.concatenate([cls_net, jnp.zeros((pad,), bool)])
    chunk_has = jnp.any(cls_pad.reshape(n_chunks, CH2), axis=1)

    def net_face(fi, tb):
        ax = axis[fi]
        plane = (jnp.where(ax == 0, vx[fi],
                           jnp.where(ax == 1, vy[fi], vz[fi]))
                 + sgn[fi]).astype(F32)
        d_a = jnp.where(ax == 0, d_all[:, 0],
                        jnp.where(ax == 1, d_all[:, 1], d_all[:, 2]))
        o_a = jnp.where(ax == 0, pos[0],
                        jnp.where(ax == 1, pos[1], pos[2]))
        inv_a = jnp.where(d_a == 0.0, F32(BIG_T), 1.0 / d_a)
        t = (plane - o_a) * inv_a
        hx = jnp.floor(pos[0] + d_all[:, 0] * t).astype(I32)
        hy = jnp.floor(pos[1] + d_all[:, 1] * t).astype(I32)
        hz = jnp.floor(pos[2] + d_all[:, 2] * t).astype(I32)
        u_c = jnp.where(ax == 0, hy, hx)
        u_0 = jnp.where(ax == 0, vy[fi], vx[fi])
        v_c = jnp.where(ax == 2, hy, hz)
        v_0 = jnp.where(ax == 2, vy[fi], vz[fi])
        cover = ((t > 0.0) & (u_c >= u_0) & (u_c < u_0 + feu[fi])
                 & (v_c >= v_0) & (v_c < v_0 + fev[fi]))
        newt = jnp.where(cover, _axis_key_dyn(t, ax), SENTINEL)
        return tb.at[:n_pix].min(newt)

    def chunk_net(c):
        ci, tb = c
        base = ci * CH2
        mask_c = jax.lax.dynamic_slice(cls_pad, (base,), (CH2,))
        sel_c = jnp.nonzero(mask_c, size=CH2, fill_value=CH2)[0]
        cnt_c = jnp.sum(mask_c).astype(I32)

        def one(k, tb2):
            fi = jnp.minimum(base + sel_c[jnp.minimum(k, CH2 - 1)], f - 1)
            return k + 1, net_face(fi, tb2)

        _, tb = jax.lax.while_loop(lambda d2: d2[0] < cnt_c,
                                   lambda d2: one(d2[0], d2[1]),
                                   (jnp.int32(0), tb))
        # skip ahead to the next chunk that has net faces (or end)
        nxt = jnp.where((jnp.arange(n_chunks) > ci) & chunk_has,
                        jnp.arange(n_chunks), n_chunks)
        return jnp.min(nxt).astype(I32), tb

    first = jnp.min(jnp.where(chunk_has, jnp.arange(n_chunks),
                              n_chunks)).astype(I32)
    _, tbuf = jax.lax.while_loop(lambda c: c[0] < n_chunks, chunk_net,
                                 (first, tbuf))

    # ---- per-pixel winner reconstruction (exact formulas on d_rays) ----
    # The key carries the winning face's AXIS (decoded below), so the
    # reconstruction only has to locate WHICH PLANE of that axis the
    # winner crossed — candidate planes are >= 1 apart, far outside the
    # few-ulp fragment-d wobble, so the window match is unambiguous.
    # Cross-axis ties were already resolved DURING the scatter by the
    # oracle's step preference over real fragments.
    # unpack tiles to pixel order (pure relayout) and merge the net buffer
    key_t = tbuf_t[:n_tiles].reshape(nty, ntx, tky, tkx).transpose(
        0, 2, 1, 3).reshape(nty * tky, ntx * tkx)
    key = jnp.minimum(key_t[:band_h, :width].reshape(-1), tbuf[:n_pix])
    hit = key != SENTINEL
    wbits, face = _key_decode(key)
    t_approx = jax.lax.bitcast_convert_type(wbits, F32)
    hpos = pos[None, :] + d_all * t_approx[:, None]       # (n_pix, 3)
    d_a = jnp.where(face[:, None] == 0, d_all[:, :1],
                    jnp.where(face[:, None] == 1, d_all[:, 1:2],
                              d_all[:, 2:3]))[:, 0]
    o_a = jnp.where(face == 0, pos[0],
                    jnp.where(face == 1, pos[1], pos[2]))
    h_a = jnp.where(face == 0, hpos[:, 0],
                    jnp.where(face == 1, hpos[:, 1], hpos[:, 2]))
    # the barrier stops XLA's algebraic simplifier from folding
    # mul(x, 1/d) -> div(x, d): the oracle multiplies by the ROUNDED
    # reciprocal, and the fold is 1 ulp off that (whether it fires
    # depends on unrelated graph shape — it did after the round-3
    # coverage rework)
    inv_a = jax.lax.optimization_barrier(
        jnp.where(d_a == 0.0, F32(BIG_T), 1.0 / d_a))
    k0 = jnp.floor(h_a).astype(I32)
    axis_coord = jnp.zeros((n_pix,), I32)
    t_out = jnp.full((n_pix,), BIG_T, F32)
    found = jnp.zeros((n_pix,), bool)
    for kc in (0, 1):
        plane = (k0 + kc).astype(F32)
        ta = (plane - o_a) * inv_a
        # within the scattered winner's ulp window (fragment-d FMA wobble
        # propagates ~3 ulps through inv+mul); prefer the smaller exact t
        # if both planes somehow land inside (unreachable: planes are
        # >= 1 apart)
        window = jnp.abs(_f32_bits(ta).astype(jnp.int32)
                         - wbits.astype(jnp.int32)) <= 8
        match = hit & window & (ta > 0.0) & (~found | (ta < t_out))
        vc = jnp.where(d_a > 0, k0 + kc, k0 + kc - 1)
        axis_coord = jnp.where(match, vc, axis_coord)
        t_out = jnp.where(match, ta, t_out)
        found = found | match
    face = jnp.where(hit, face, 0)

    # start-in-solid: oracle hits at t=0, face=0, axis_coord = cell_x
    # (cell = clip(floor(o)) like the oracle's init)
    cell0 = jnp.clip(jnp.floor(pos).astype(I32), 0, size - 1)
    sp = solid_probe & inside
    face = jnp.where(sp, 0, face)
    axis_coord = jnp.where(sp, cell0[0], axis_coord)
    t_out = jnp.where(sp, 0.0, t_out)
    hit = (hit | sp) & inside
    t_out = jnp.where(hit, t_out, F32(BIG_T))

    zero = jnp.zeros((n_pix,), I32)
    return TraceResult(hit=hit, face=face,
                       axis_coord=jnp.where(hit, axis_coord, 0),
                       t=t_out, iterations=zero, fetches=zero,
                       missed_pops=zero)
