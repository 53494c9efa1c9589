"""Sun-space occlusion classifier — O(1) shadow answers from anti-sun
face grids.

All sun-shadow rays share one direction s, so occlusion is a property of
the 2D orthographic projection along s. The round-3 key fact: a ray
traveling toward the sun can enter solid ONLY through an exposed face
whose normal opposes the sun (normal·s < 0 — crossing a face
perpendicular to axis a while moving sign(s_a) along a means the face's
empty side, hence its normal, points back toward -sign(s_a)·a). The
query point's own surface face has normal·s > 0 (shadow rays exist only
for sun-facing lanes), so it is never in the occluder set — which is
what lets the classifier answer at the true hit point with no "lift"
trick and no exact near-segment pre-pass (both of which round 2 needed
when the grids were built from ALL faces).

Two conservative grids over the projected world, built once per sun
direction from the ANTI-SUN subset of the merged exposed-face rectangles
(world/faces.py), interleaved into one (G^2, 2) f32 table:

  gridB[t] = max over occluder faces FULLY covering texel t (quad shrunk
             by SAFE) of the face's min depth along s. A query with
             z < gridB[t] - SAFE crosses that face strictly ahead ->
             CERTAINLY SHADOWED (the crossing enters solid).
  gridC[t] = max over occluder faces POSSIBLY touching t (bbox grown by
             SAFE) of the face's max depth. A query with
             z > gridC[t] + SAFE has every possible entry crossing
             strictly behind -> CERTAINLY LIT.

Contract (tests/test_sunshadow.py): for query points in EMPTY space
(every shadow-ray start is: hit point + 0.05 along s, guarded by the
back-margin below), a certain answer always agrees with the exact DDA.
Points inside solid may be wrongly light-certain (their entry crossing
can be far behind them) — masked_shadow_hits closes that hole by
evaluating light-certainty at the depth of the SURFACE point (s_o minus
the 0.05 offset): any segment crossing that could bury s_o registers in
gridC at a depth >= that, blocking the certain-light claim.

The classifier is an optimization of the frame's shadow pass
(raytracer.slang:326-351 semantics unchanged): certain lanes skip the
traversal; ambiguous lanes (true silhouette texels) run the exact DDA.
The one documented divergence: a certain-shadow answer asserts a real
forward crossing, which equals the DDA's answer whenever the DDA
terminates within its max_steps cap (a ray that would exhaust the cap
reports miss where the classifier correctly reports hit; unreachable on
the test corpus, ~2048 sub-steps).
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
TK = 4          # texel-tile edge for the build's entry allocation
BACK = 0.05     # the frame's shadow-start offset along s (render/frame.py)


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
    """((gBC, a0, b0, ts), ok): conservative occlusion grids for sun
    direction s. `faces` is the merged-rectangle device tuple
    (vx, vy, vz, axis, sgn, eu, ev). `ok` is a device bool scalar — False
    when the tile-entry allocation overflowed cap_entries, in which case
    gridC is NOT conservative and the caller must rebuild with a larger
    cap (renderer._sunmask retries) or disable the classifier."""
    vx, vy, vz, axis, sgn, eu, ev = faces
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

    # occluder subset: faces a sun-bound ray can enter solid through
    # (normal·s < 0; normal = +axis if sgn else -axis). Sun-facing faces
    # are excluded from BOTH grids — they cannot cause occlusion, and
    # excluding them is what makes near-surface queries classifiable.
    s_a = jnp.where(axis == 0, s[0], jnp.where(axis == 1, s[1], s[2]))
    occl = jnp.where(sgn == 1, s_a < 0.0, s_a > 0.0)

    base = jnp.stack([vx, vy, vz], -1).astype(F32)
    pc = (jnp.where(axis == 0, vx, jnp.where(axis == 1, vy, vz))
          + sgn).astype(F32)
    euf = eu.astype(F32)
    evf = ev.astype(F32)
    ax_is = [axis == 0, axis == 1, axis == 2]
    ca = []
    cb = []
    cz = []
    for du_ in (0.0, 1.0):
        for dv_ in (0.0, 1.0):
            cx = jnp.where(ax_is[0], pc, base[:, 0] + du_ * euf)
            cy = jnp.where(ax_is[1], pc,
                           base[:, 1] + jnp.where(ax_is[0], du_ * euf,
                                                  dv_ * evf))
            cz_ = jnp.where(ax_is[2], pc, base[:, 2] + dv_ * evf)
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

    # ---- tile-entry allocation over the OUTER bbox (occluders only) ----
    tw = (oi1 - oi0) // TK + 1
    th_ = (oj1 - oj0) // TK + 1
    cnt = jnp.where(occl, tw * th_, 0)
    off = jnp.cumsum(cnt) - cnt
    requested = jnp.max(off + cnt).astype(I32) if f else jnp.int32(0)
    ok = requested <= cap_entries
    placed = occl & (off + cnt <= cap_entries)
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
    # interleave as one (G^2, 2) table: classify needs ONE 8 B row gather
    # instead of two 4 B gathers (measured 50 ms at 2M lanes)
    gBC = jnp.stack([gridB[:grid * grid], gridC[:grid * grid]], axis=1)
    return (gBC, a0, b0, ts), ok


def masked_shadow_hits(tr, s_o, sun3, e1, e2, grids, shadow_active,
                       size: int, pack_cap, back: float = BACK):
    """The frame's hard-shadow query with the classifier fast path: one
    grid gather + two depth compares answers almost every lane; only
    ambiguous lanes (silhouette texels and tight near-surface geometry)
    run the full DDA (`tr`, the frame's shadow tracer).

    `s_o` is the DDA's own ray start — surface point + `back` along the
    sun. Shadow-certainty is evaluated at s_o's depth (the witness
    crossing must lie strictly ahead of the DDA start); light-certainty
    at the surface point's depth (so a crossing that buries s_o inside
    solid — where the DDA hits at t=0 — always blocks the claim).
    Out-of-world starts are certainly-miss (trace_shi's origin-outside
    rule, ray_stuff_other.slang:424-437).

    Bit-equal to running the DDA for every lane wherever the DDA
    terminates within its max_steps cap (tests/test_sunshadow.py; see the
    module docstring for the cap divergence)."""
    gBC, a0, b0, ts = grids
    inw = jnp.all((s_o >= 0) & (s_o < size), axis=-1)
    qa = s_o @ e1
    qb = s_o @ e2
    qz = s_o @ sun3
    grid = GRID
    i = jnp.floor((qa - a0) / ts).astype(I32)
    j = jnp.floor((qb - b0) / ts).astype(I32)
    inb = inw & (i >= 0) & (i < grid) & (j >= 0) & (j < grid)
    tex = jnp.where(inb, j * grid + i, 0)
    row = jnp.take(gBC, tex, axis=0, mode="clip")
    certain_shadow = inb & (qz < row[:, 0] - SAFE)
    certain_light = inb & (qz - back > row[:, 1] + SAFE)

    known_hit = shadow_active & certain_shadow
    known_miss = shadow_active & ~known_hit & (certain_light | ~inw)
    amb = shadow_active & ~known_hit & ~known_miss
    sdir = jnp.broadcast_to(sun3, s_o.shape)
    dda_hit = tr(s_o, sdir, active=amb, pack_first=pack_cap,
                 shadow=True).hit
    return jnp.where(known_hit, True,
                     jnp.where(known_miss, False, dda_hit))


@functools.partial(jax.jit, static_argnames=("size", "grid"))
def classify(points, e1, e2, s, grids, size: int, grid: int = GRID):
    """(certain_shadow, certain_light) for ray starts `points` (N, 3)
    toward the sun. Exact for points in empty space; points inside solid
    may be wrongly light-certain (see module docstring) — callers with
    possibly-buried starts must use a back-margin like masked_shadow_hits.
    Out-of-world starts are never `certain` — the DDA's origin-outside
    rule (miss) applies and the caller handles it."""
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
    certain_shadow = inb & (qz < row[:, 0] - SAFE)
    certain_light = inb & (qz > row[:, 1] + SAFE)
    return certain_shadow, certain_light
