"""Sun-space occlusion classifier — conservative O(1) shadow answers.

All sun-shadow rays share one direction, so occlusion is a property of the
2D orthographic projection along the sun: a ray from P toward the sun is
  * CERTAINLY SHADOWED if some exposed face's projection fully covers P's
    projected point and the face lies strictly ahead of P along the sun;
  * CERTAINLY LIT if no face whose projection could touch P's point lies
    ahead of P;
  * ambiguous otherwise (silhouette texels) -> resolved by the exact DDA.

Two conservative grids over the projected world (built once per sun
direction, reused every frame; GRID static):
  gridB[t] = max over faces FULLY covering texel t (quad shrunk by SAFE)
             of the face's max depth        -> shadow-certain if
             z_start < gridB[t] - SAFE  (the covering face is wholly ahead)
  gridC[t] = max over faces POSSIBLY touching texel t (bbox grown by SAFE)
             of the face's max depth        -> light-certain if
             z_start > gridC[t] + SAFE  (every candidate is wholly behind)

Wait — shadow-certain needs the face AHEAD of the ray start: the crossing
depth lies in [zmin_f, zmax_f], so `z_start < zmin_f - SAFE` guarantees a
strictly-forward crossing; gridB therefore stores the MAX of zmin_f (any
single qualifying face suffices, and the deepest-starting one serves the
most queries). Conversely every face with zmax_f >= z_start - SAFE could
be crossed forward, so light-certainty needs the max of zmax_f to be
behind. SAFE (0.02 voxels) dwarfs the f32 projection error (~5e-4 at
1024-voxel coordinates); correctness is pinned by equality-vs-DDA tests
(tests/test_sunshadow.py) — the same empirical bar as every kernel here.

The classifier is an optimization of the frame's shadow pass
(raytracer.slang:326-351 semantics are unchanged): certain lanes skip the
traversal entirely; ambiguous lanes run the jump-kernel DDA bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32

GRID = 2048
SAFE = 0.02
NEG = jnp.float32(-3e38)
TK = 4  # texel-tile edge for the build's entry allocation


def sun_basis(sun3: np.ndarray):
    """Orthonormal (e1, e2, s) with s = unit sun direction (host-side)."""
    s = np.asarray(sun3, np.float32)
    s = s / np.linalg.norm(s)
    a = np.array([1.0, 0.0, 0.0], np.float32)
    if abs(s[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0], np.float32)
    e1 = np.cross(s, a)
    e1 = (e1 / np.linalg.norm(e1)).astype(np.float32)
    e2 = np.cross(s, e1).astype(np.float32)
    return e1, e2, s


@functools.partial(jax.jit, static_argnames=("size", "grid", "cap_entries"))
def build_sun_grids(faces, e1, e2, s, size: int, grid: int = GRID,
                    cap_entries: int = 1 << 20):
    """(gridB, gridC, a0, b0, ts): conservative occlusion grids for sun
    direction s (faces: the rastertrace device tuple)."""
    vx, vy, vz, axis, sgn = faces
    f = vx.shape[0]
    # projected extent of the world cube (conservative, fixed per size)
    corners = jnp.asarray(
        [[x, y, z] for x in (0.0, float(size)) for y in (0.0, float(size))
         for z in (0.0, float(size))], F32)
    pa = corners @ e1
    pb = corners @ e2
    a0 = jnp.min(pa) - 1.0
    b0 = jnp.min(pb) - 1.0
    ts = (jnp.maximum(jnp.max(pa) - a0, jnp.max(pb) - b0) + 2.0) / grid

    base = jnp.stack([vx, vy, vz], -1).astype(F32)
    pc = (jnp.where(axis == 0, vx, jnp.where(axis == 1, vy, vz))
          + sgn).astype(F32)
    ax_is = [axis == 0, axis == 1, axis == 2]
    ca = []
    cb = []
    cz = []
    for du_ in (0.0, 1.0):
        for dv_ in (0.0, 1.0):
            cx = jnp.where(ax_is[0], pc, base[:, 0] + du_)
            cy = jnp.where(ax_is[1], pc,
                           base[:, 1] + jnp.where(ax_is[0], du_, dv_))
            cz_ = jnp.where(ax_is[2], pc, base[:, 2] + dv_)
            ca.append(cx * e1[0] + cy * e1[1] + cz_ * e1[2])
            cb.append(cx * e2[0] + cy * e2[1] + cz_ * e2[2])
            cz.append(cx * s[0] + cy * s[1] + cz_ * s[2])
    ca = jnp.stack(ca, -1)                                  # (F, 4)
    cb = jnp.stack(cb, -1)
    czs = jnp.stack(cz, -1)
    zmin = jnp.min(czs, -1)
    zmax = jnp.max(czs, -1)
    amin = jnp.min(ca, -1)
    amax = jnp.max(ca, -1)
    bmin = jnp.min(cb, -1)
    bmax = jnp.max(cb, -1)

    # outer texel bbox (grown by SAFE)
    oi0 = jnp.clip(jnp.floor((amin - SAFE - a0) / ts).astype(I32),
                   0, grid - 1)
    oi1 = jnp.clip(jnp.floor((amax + SAFE - a0) / ts).astype(I32),
                   0, grid - 1)
    oj0 = jnp.clip(jnp.floor((bmin - SAFE - b0) / ts).astype(I32),
                   0, grid - 1)
    oj1 = jnp.clip(jnp.floor((bmax + SAFE - b0) / ts).astype(I32),
                   0, grid - 1)

    # half-plane form of the (shrunk) projected parallelogram: corners in
    # order (0,0), (0,1), (1,0), (1,1) of (du, dv): edges along
    # u = c2 - c0 and v = c1 - c0
    p0a, p0b = ca[:, 0], cb[:, 0]
    ua, ub = ca[:, 2] - p0a, cb[:, 2] - p0b
    va, vb = ca[:, 1] - p0a, cb[:, 1] - p0b
    det = ua * vb - ub * va
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    degenerate = jnp.abs(det) < 1e-12
    # world-distance SAFE as barycentric margins: the u-isolines are
    # det/|v_edge| apart in the projection plane (and symmetrically for v)
    adet = jnp.maximum(jnp.abs(det), 1e-12)
    mu = SAFE * jnp.sqrt(va * va + vb * vb) / adet
    mv = SAFE * jnp.sqrt(ua * ua + ub * ub) / adet

    # ---- tile-entry allocation over the OUTER bbox ----
    tw = (oi1 - oi0) // TK + 1
    th_ = (oj1 - oj0) // TK + 1
    cnt = tw * th_
    off = jnp.cumsum(cnt) - cnt
    placed = off + cnt <= cap_entries
    total = jnp.max(jnp.where(placed, off + cnt, 0)).astype(I32)
    idx_f = jnp.arange(f, dtype=I32)
    starts = jnp.zeros((cap_entries,), I32).at[
        jnp.where(placed & (cnt > 0), off, cap_entries)].max(
        idx_f, mode="drop")
    ent_face = jax.lax.cummax(starts)

    ftab = jnp.stack([oi0, oj0, oi1, oj1, tw, off], axis=1)
    gridB = jnp.full((grid * grid + 2,), NEG, F32)
    gridC = jnp.full((grid * grid + 2,), NEG, F32)
    CH = min(cap_entries, 1 << 17)
    q = jnp.arange(TK * TK, dtype=I32)[None, :]

    def chunk_body(c):
        start, gB, gC = c
        ek = start + jnp.arange(CH, dtype=I32)
        ent_ok = ek < total
        fidx = jnp.where(ent_ok, jax.lax.dynamic_slice(
            ent_face, (start,), (CH,)), 0)
        row = jnp.take(ftab, fidx, axis=0, mode="clip")
        li = ek - row[:, 5]
        bi = row[:, 0] + TK * (li % jnp.maximum(row[:, 4], 1))
        bj = row[:, 1] + TK * (li // jnp.maximum(row[:, 4], 1))
        i = bi[:, None] + (q % TK)
        j = bj[:, None] + (q // TK)
        ins = (ent_ok[:, None] & (i <= row[:, 2][:, None])
               & (j <= row[:, 3][:, None]) & (i < grid) & (j < grid))
        tex = j * grid + i
        fzmin = zmin[fidx][:, None]
        fzmax = zmax[fidx][:, None]
        # gridC: possibly-touching -> max of zmax
        gC = gC.at[jnp.where(ins, tex, grid * grid + 2).reshape(-1)].max(
            jnp.broadcast_to(fzmax, ins.shape).reshape(-1), mode="drop")
        # gridB: texel FULLY inside the shrunk quad -> max of zmin.
        # all 4 texel corners must be inside
        ta0 = a0 + i.astype(F32) * ts
        tb0 = b0 + j.astype(F32) * ts
        fully = ins & ~degenerate[fidx][:, None]
        f_p0a = p0a[fidx][:, None]
        f_p0b = p0b[fidx][:, None]
        f_ua = ua[fidx][:, None]
        f_ub = ub[fidx][:, None]
        f_va = va[fidx][:, None]
        f_vb = vb[fidx][:, None]
        f_inv = inv_det[fidx][:, None]
        f_mu = mu[fidx][:, None]
        f_mv = mv[fidx][:, None]
        # texel fully inside the SAFE-shrunk quad: all 4 texel corners
        for da_ in (0.0, 1.0):
            for db_ in (0.0, 1.0):
                da = (ta0 + da_ * ts) - f_p0a
                db = (tb0 + db_ * ts) - f_p0b
                uu = (da * f_vb - db * f_va) * f_inv
                vv = (f_ua * db - f_ub * da) * f_inv
                fully = fully & (uu > f_mu) & (uu < 1.0 - f_mu) \
                    & (vv > f_mv) & (vv < 1.0 - f_mv)
        gB = gB.at[jnp.where(fully, tex, grid * grid + 2).reshape(-1)].max(
            jnp.broadcast_to(fzmin, ins.shape).reshape(-1), mode="drop")
        return start + CH, gB, gC

    _, gridB, gridC = jax.lax.while_loop(
        lambda c: c[0] < total, chunk_body, (jnp.int32(0), gridB, gridC))
    # interleave as one (G^2, 2) table: classify then needs ONE 8 B row
    # gather instead of two 4 B gathers (measured 50 ms at 2M lanes)
    gBC = jnp.stack([gridB[:grid * grid], gridC[:grid * grid]], axis=1)
    return gBC, a0, b0, ts


LIFT = 1.6  # voxels along the sun cleared exactly by near_occlusion


@functools.partial(jax.jit, static_argnames=("size",))
def near_occlusion(jump_rows, s_o, s, active, size: int):
    """Exact occlusion of the first LIFT voxels along the (shared) sun
    direction from each start — the oracle's own stepping formulas,
    unrolled (LIFT < 2 crosses at most two planes per axis: <= 6 steps,
    7 voxel tests), against at most TWO gathered superbrick rows (one
    refetch when the segment crosses a superbrick boundary).

    Returns (hit, clean, exited, bad):
      hit    — a solid voxel is entered at t in [0, LIFT)
      clean  — the segment was fully resolved with no hit
      exited — the ray left the world within the segment (total miss)
      bad    — unresolved (a second superbrick crossing): caller must run
               the full DDA for these lanes
    The query point for the beyond-LIFT classifier is s_o + s*LIFT."""
    g = size // 8
    ox, oy, oz = s_o[:, 0], s_o[:, 1], s_o[:, 2]
    dx, dy, dz = s[0], s[1], s[2]

    def inv(c):
        return jnp.where(c == 0.0, F32(3e38), 1.0 / c)

    ix_, iy_, iz_ = inv(dx), inv(dy), inv(dz)
    px_ = (dx > 0).astype(I32)
    py_ = (dy > 0).astype(I32)
    pz_ = (dz > 0).astype(I32)
    inw = ((ox >= 0) & (ox < size) & (oy >= 0) & (oy < size)
           & (oz >= 0) & (oz < size)) & active
    vx = jnp.clip(jnp.floor(ox).astype(I32), 0, size - 1)
    vy = jnp.clip(jnp.floor(oy).astype(I32), 0, size - 1)
    vz = jnp.clip(jnp.floor(oz).astype(I32), 0, size - 1)
    bx0, by0, bz0 = vx >> 3, vy >> 3, vz >> 3

    def fetch_rows(sel, bx, by, bz):
        addr = bx + by * g + bz * g * g
        r = jnp.take(jump_rows, jnp.where(sel, addr, 0), axis=0,
                     mode="clip")
        return [r[:, k] for k in range(16)]

    rw = fetch_rows(inw, bx0, by0, bz0)

    def solid(rw_, lx, ly, lz):
        w = 2 * lz + (ly >> 2)
        b0, b1, b2, b3 = (w & 1) == 0, (w & 2) == 0, (w & 4) == 0, \
            (w & 8) == 0
        a = [jnp.where(b0, rw_[2 * k], rw_[2 * k + 1]) for k in range(8)]
        b = [jnp.where(b1, a[2 * k], a[2 * k + 1]) for k in range(4)]
        c = [jnp.where(b2, b[2 * k], b[2 * k + 1]) for k in range(2)]
        word = jnp.where(b3, c[0], c[1])
        sh = (lx + ((ly & 3) << 3)).astype(jnp.uint32)
        return ((word >> sh) & jnp.uint32(1)) == 1

    def phase(st, second: bool):
        """One test+step iteration (fori_loop body; bounded unroll would
        OOM at 2M lanes x 13 steps of temporaries)."""
        if second:
            act0 = ~st["done"] & ~st["bad"] & st["crossed"]
        else:
            act0 = ~st["done"] & ~st["bad"] & ~st["crossed"]
        vx, vy, vz = st["vx"], st["vy"], st["vz"]
        hit_now = act0 & solid(st["rw"], vx & 7, vy & 7, vz & 7)
        st["hit"] = st["hit"] | hit_now
        st["done"] = st["done"] | hit_now
        act = act0 & ~hit_now
        bx = (vx + px_).astype(F32)
        by = (vy + py_).astype(F32)
        bz = (vz + pz_).astype(F32)
        tx = jnp.where(dx == 0.0, F32(3e38), (bx - ox) * ix_)
        ty = jnp.where(dy == 0.0, F32(3e38), (by - oy) * iy_)
        tz = jnp.where(dz == 0.0, F32(3e38), (bz - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        seg_end = act & (te >= LIFT)
        st["done"] = st["done"] | seg_end
        act = act & ~seg_end
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        nvx = vx + jnp.where((nface == 0) & (dx > 0), 1,
                             jnp.where((nface == 0), -1, 0))
        nvy = vy + jnp.where((nface == 1) & (dy > 0), 1,
                             jnp.where((nface == 1), -1, 0))
        nvz = vz + jnp.where((nface == 2) & (dz > 0), 1,
                             jnp.where((nface == 2), -1, 0))
        out_world = ((nvx < 0) | (nvx >= size) | (nvy < 0) | (nvy >= size)
                     | (nvz < 0) | (nvz >= size))
        ex_now = act & out_world
        st["exited"] = st["exited"] | ex_now
        st["done"] = st["done"] | ex_now
        act = act & ~ex_now
        out_brick = ((nvx >> 3) != st["bx0"]) | ((nvy >> 3) != st["by0"]) \
            | ((nvz >> 3) != st["bz0"])
        cross_now = act & out_brick
        if second:
            st["bad"] = st["bad"] | cross_now   # second crossing
        else:
            st["crossed"] = st["crossed"] | cross_now
            st["ncx"] = jnp.where(cross_now, nvx, st["ncx"])
            st["ncy"] = jnp.where(cross_now, nvy, st["ncy"])
            st["ncz"] = jnp.where(cross_now, nvz, st["ncz"])
        act = act & ~out_brick
        st["vx"] = jnp.where(act, nvx, vx)
        st["vy"] = jnp.where(act, nvy, vy)
        st["vz"] = jnp.where(act, nvz, vz)
        return st

    st = dict(hit=jnp.zeros_like(inw), done=~inw,
              exited=jnp.zeros_like(inw), crossed=jnp.zeros_like(inw),
              bad=jnp.zeros_like(inw), vx=vx, vy=vy, vz=vz,
              ncx=vx, ncy=vy, ncz=vz, bx0=bx0, by0=by0, bz0=bz0, rw=rw)
    st = jax.lax.fori_loop(0, 7, lambda _, s: phase(s, False), st)
    # one refetch serves the crossing lanes; a second crossing -> bad
    crossed = st["crossed"]
    st["vx"] = jnp.where(crossed, st["ncx"], st["vx"])
    st["vy"] = jnp.where(crossed, st["ncy"], st["vy"])
    st["vz"] = jnp.where(crossed, st["ncz"], st["vz"])
    st["bx0"] = jnp.where(crossed, st["vx"] >> 3, st["bx0"])
    st["by0"] = jnp.where(crossed, st["vy"] >> 3, st["by0"])
    st["bz0"] = jnp.where(crossed, st["vz"] >> 3, st["bz0"])
    rw2 = fetch_rows(crossed, st["bx0"], st["by0"], st["bz0"])
    st["rw"] = [jnp.where(crossed, a, b) for a, b in zip(rw2, st["rw"])]
    st = jax.lax.fori_loop(0, 6, lambda _, s: phase(s, True), st)
    hit, done, exited, bad = st["hit"], st["done"], st["exited"], st["bad"]
    bad = bad | (~done & ~bad)   # safety: anything unfinished -> full DDA
    clean = inw & done & ~hit & ~exited
    return hit & inw, clean, exited & inw, bad & inw


def masked_shadow_hits(tr, jump_rows, s_o, sun3, e1, e2, grids,
                       shadow_active, size: int, pack_cap):
    """The frame's hard-shadow query with the classifier fast path:
    near-segment exact check + lifted-point classification; only ambiguous
    lanes run the full DDA (`tr`, the frame's shadow tracer). Bit-equal to
    running the DDA for every lane (tests/test_sunshadow.py)."""
    import jax.numpy as jnp2
    hit_n, clean, exited, bad = near_occlusion(jump_rows, s_o, sun3,
                                               shadow_active, size)
    p_l = s_o + sun3[None, :] * LIFT
    cs, cl = classify(p_l, e1, e2, sun3, grids, size)
    known_hit = shadow_active & (hit_n | cs)
    known_miss = shadow_active & ~known_hit & ((clean & cl) | exited)
    amb = shadow_active & ~known_hit & ~known_miss
    sdir = jnp2.broadcast_to(sun3, s_o.shape)
    # measured on the bench scene: the shadow-tuned schedule stays faster
    # for the ambiguous residue than the default cascade (353 vs 387 ms
    # for the whole masked pass)
    dda_hit = tr(s_o, sdir, active=amb, pack_first=pack_cap,
                 shadow=True).hit
    return jnp2.where(known_hit, True,
                      jnp2.where(known_miss, False, dda_hit))


@functools.partial(jax.jit, static_argnames=("size", "grid"))
def classify(points, e1, e2, s, grids, size: int, grid: int = GRID):
    """(certain_shadow, certain_light) for ray starts `points` (N, 3)
    toward the sun. Out-of-world starts are never `certain` — the DDA's
    origin-outside rule (miss) applies and the fallback path handles it."""
    gBC, a0, b0, ts = grids
    inw = jnp.all((points >= 0) & (points < size), axis=-1)
    qa = points @ e1
    qb = points @ e2
    qz = points @ s
    i = jnp.floor((qa - a0) / ts).astype(I32)
    j = jnp.floor((qb - b0) / ts).astype(I32)
    inb = inw & (i >= 0) & (i < grid) & (j >= 0) & (j < grid)
    tex = jnp.where(inb, j * grid + i, 0)
    row = jnp.take(gBC, tex, axis=0, mode="clip")
    zB = row[:, 0]
    zC = row[:, 1]
    certain_shadow = inb & (qz < zB - SAFE)
    certain_light = inb & (qz > zC + SAFE)
    return certain_shadow, certain_light
