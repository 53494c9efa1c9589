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

Depth bounds are AFFINE-INTERPOLATED per texel: every face is planar, so
its depth along s is an affine function z(a, b) of the projected
coordinates — evaluated at the 4 texel corners this gives exact
per-texel min/max instead of the face's global z-range. This matters
because the merged rectangles (world/faces.py) span large z ranges; with
global bounds a single long slope face made its entire footprint
ambiguous (the round-2 scheme), with affine bounds ambiguity shrinks to
true silhouette texels.

Two conservative grids over the projected world, built once per sun
direction from the ANTI-SUN subset of the merged exposed-face rectangles,
interleaved into one (G^2, 2) f32 table, plus a COARSE^2 block-reduced
level (min of gridB / max of gridC over each block) that answers most
lanes from the fast (<=64K-row) gather regime:

  gridB[t] = max over occluder faces FULLY covering texel t (quad shrunk
             by SAFE) of the face's affine min depth over t. A query with
             z < gridB[t] - SAFE crosses that face strictly ahead ->
             CERTAINLY SHADOWED (the crossing enters solid).
  gridC[t] = max over occluder faces POSSIBLY touching t (bbox grown by
             SAFE) of the face's affine max depth over t (+ the SAFE
             growth margin, clamped to the global max). A query with
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
traversal; ambiguous lanes (true silhouette texels) run the exact DDA,
front-packed so certain lanes pay no traversal gathers. The one
documented divergence: a certain-shadow answer asserts a real forward
crossing, which equals the DDA's answer whenever the DDA terminates
within its max_steps cap (a ray that would exhaust the cap reports miss
where the classifier correctly reports hit; unreachable on the test
corpus, ~2048 sub-steps).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.ops.pack import pack_indices_grouped

F32 = jnp.float32
I32 = jnp.int32

GRID = 2048
COARSE = 256      # block-reduced level; 256^2 = 64K rows = fast gathers
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


CONE_TAN = 0.0087   # max angular deviation of the frame's jittered soft-
                    # shadow directions: |rng|*0.005 <= 0.005*sqrt(3)
                    # (render/frame.py), tan ~ angle at this size

# cone-grid query-support slack (see the S-support block in
# build_sun_grids): real queries lie exactly ON a face (hit
# reconstruction pins the face-axis coordinate to the plane), so these
# are pure safety headroom for float rounding in the projections
# (pixelated_shadows, whose quarter-floor can bury the query, bypasses
# the classifier entirely — renderer.use_sunmask)
S_PAD = 0.5      # lateral: S-pass face bboxes grow by this
S_SLACK = 0.5    # depth: queries may sit this far below their column's S


@functools.partial(jax.jit, static_argnames=("size", "grid", "cap_entries",
                                             "cone_tan"))
def build_sun_grids(faces, e1, e2, s, size: int, grid: int = GRID,
                    cap_entries: int = 1 << 20, cone_tan: float = 0.0):
    """((gBC, cBC, a0, b0, ts), ok): conservative occlusion grids for sun
    direction s. `faces` is the merged-rectangle device tuple
    (vx, vy, vz, axis, sgn, eu, ev). `ok` is a device bool scalar — False
    when the tile-entry allocation overflowed cap_entries, in which case
    gridC is NOT conservative and the caller must rebuild with a larger
    cap (renderer._sunmask retries) or disable the classifier.

    cone_tan > 0 builds CONE grids for the soft-shadow pass: every margin
    grows by cone_tan * (face z - S[texel] + slack), where S is a coarse
    per-column lower bound of SURFACE depth (every query stands on a
    surface) — an upper bound of the lateral deviation any jittered
    direction accumulates between its start and that face — so a certain
    answer holds for EVERY direction in the cone at once (the N jittered
    samples share one classification; only the ambiguous residue runs N
    per-sample DDAs — raytracer.slang:332-342 semantics unchanged)."""
    vx, vy, vz, axis, sgn, eu, ev = faces[:7]
    einfo = (faces[7] if len(faces) > 7
             else jnp.zeros_like(vx))
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
    # zero-extent rows are slot padding (WorldEditor incremental faces) —
    # they are neither occluders nor S-grid support (degenerate anyway,
    # but excluding them here keeps the entry allocation tight)
    occl = occl & (eu > 0)

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

    # per-face margin: SAFE plus (cone grids) the cone's lateral reach at
    # this face's depth above the lowest possible query. The face-level
    # bound (query no lower than the WORLD min depth) is used for the
    # entry bbox and degenerate faces only — the rasterization loop
    # tightens it per texel from the S support grid below (round-4: the
    # world-min bound eroded 5-16 texels at 256^3 and the cone gate's
    # certain-shadow side never fired — measured kh = 0,
    # tools/measure_config4_demand.py)
    wzmin = jnp.min(corners @ s)
    grow = SAFE + cone_tan * jnp.maximum(zmax - wzmin + S_SLACK, 0.0)

    # outer texel bbox (grown by the face margin)
    oi0 = jnp.clip(jnp.floor((amin - grow - a0) / ts).astype(I32),
                   0, grid - 1)
    oi1 = jnp.clip(jnp.floor((amax + grow - a0) / ts).astype(I32),
                   0, grid - 1)
    oj0 = jnp.clip(jnp.floor((bmin - grow - b0) / ts).astype(I32),
                   0, grid - 1)
    oj1 = jnp.clip(jnp.floor((bmax + grow - b0) / ts).astype(I32),
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
    # world-distance margin as barycentric margins: the u-isolines are
    # det/|v_edge| apart in the projection plane (and symmetrically for v)
    adet = jnp.maximum(jnp.abs(det), 1e-12)
    rmu = jnp.sqrt(va * va + vb * vb) / adet   # world-dist -> bary u
    rmv = jnp.sqrt(ua * ua + ub * ub) / adet   # world-dist -> bary v
    mu = grow * rmu
    mv = grow * rmv
    # affine depth over the projection plane: z(a, b) = z0 + ga*(a - p0a)
    # + gb*(b - p0b) — exact because the face is planar and the projection
    # along s is linear. Degenerate (edge-on to s) faces keep (ga, gb)=0
    # and fall back to their global z-range below.
    z00 = czs[:, 0]
    zu = czs[:, 2] - z00
    zv = czs[:, 1] - z00
    g_a = (vb * zu - ub * zv) * inv_det
    g_b = (ua * zv - va * zu) * inv_det
    # affine change across the margin texel growth (for gridC's max
    # bound) and across the cone reach (gridB's min must lower-bound
    # crossings up to cone_m off the query's column)
    g_m = grow * (jnp.abs(g_a) + jnp.abs(g_b))
    g_bm = (grow - SAFE) * (jnp.abs(g_a) + jnp.abs(g_b))
    # internal-v-edge extensions (FaceSet.einfo): the full-cover test may
    # extend 1 voxel (= 1/ev in barycentric) across an edge whose far row
    # is covered by coplanar neighbors — they share this face's affine
    # depth function, so zBv stays a valid lower bound of the crossing.
    # Without this, every interior edge of the greedy-merge decomposition
    # cut an ambiguity stripe through the shadow body (round-3 ledger).
    x_v0 = (einfo & 1).astype(F32) / evf
    x_v1 = ((einfo >> 1) & 1).astype(F32) / evf

    # ---- cone grids: per-column query-depth support (round 4) ----
    # The cone's lateral reach at a crossing is cone_tan * (crossing
    # depth - QUERY depth), and every query stands on a surface — so a
    # COARSE per-column lower bound S of surface depth (min affine depth
    # over ALL faces — queries live on sun-facing faces too — with the
    # bbox grown by the pixelated-shadows shift) turns the per-texel
    # erosion into cone_tan * (face zmax - S[texel] + slack): the local
    # height above the supporting terrain instead of the world depth
    # range. Soundness: any query point lies ON a face of the set, whose
    # (padded) bbox covers the query's coarse texel, and the affine
    # corner min lower-bounds the face's depth there; S may only be too
    # LOW (extra erosion), never too high.
    gsum = jnp.abs(g_a) + jnp.abs(g_b)
    Sgrid = None
    s_ok = jnp.bool_(True)
    cs = min(COARSE, grid)
    bfc = grid // cs
    if cone_tan > 0.0:
        tsc = ts * bfc
        si0 = jnp.clip(jnp.floor((amin - S_PAD - a0) / tsc).astype(I32),
                       0, cs - 1)
        si1 = jnp.clip(jnp.floor((amax + S_PAD - a0) / tsc).astype(I32),
                       0, cs - 1)
        sj0 = jnp.clip(jnp.floor((bmin - S_PAD - b0) / tsc).astype(I32),
                       0, cs - 1)
        sj1 = jnp.clip(jnp.floor((bmax + S_PAD - b0) / tsc).astype(I32),
                       0, cs - 1)
        stw = si1 - si0 + 1
        scnt = (sj1 - sj0 + 1) * stw
        soff = jnp.cumsum(scnt) - scnt
        s_ok = jnp.max(soff + scnt).astype(I32) <= cap_entries
        s_placed = soff + scnt <= cap_entries
        s_total = jnp.max(jnp.where(s_placed, soff + scnt, 0)).astype(I32)
        idx_sf = jnp.arange(f, dtype=I32)
        s_starts = jnp.zeros((cap_entries,), I32).at[
            jnp.where(s_placed & (scnt > 0), soff, cap_entries)].max(
            idx_sf, mode="drop")
        s_entf = jax.lax.cummax(s_starts)
        stab = jnp.stack([si0, sj0, stw, soff], axis=1)
        SCH = min(cap_entries, 1 << 17)

        def s_body(c):
            start, Sg = c
            ek = start + jnp.arange(SCH, dtype=I32)
            okk = ek < s_total
            fidx = jnp.where(okk, jax.lax.dynamic_slice(
                s_entf, (start,), (SCH,)), 0)
            row = jnp.take(stab, fidx, axis=0, mode="clip")
            li = ek - row[:, 3]
            tw_ = jnp.maximum(row[:, 2], 1)
            ci = row[:, 0] + li % tw_
            cj = row[:, 1] + li // tw_
            ins_ = okk & (ci < cs) & (cj < cs)
            ta = a0 + ci.astype(F32) * tsc
            tb = b0 + cj.astype(F32) * tsc
            zmn = jnp.full(ci.shape, jnp.float32(3e38))
            for da_ in (0.0, 1.0):
                for db_ in (0.0, 1.0):
                    da = (ta + da_ * tsc) - p0a[fidx]
                    db = (tb + db_ * tsc) - p0b[fidx]
                    zc = z00[fidx] + da * g_a[fidx] + db * g_b[fidx]
                    zmn = jnp.minimum(zmn, zc)
            # clamp to the face's global min: outside the quad the affine
            # extrapolation undershoots (a LOWER S stays conservative but
            # needlessly erodes); edge-on faces use the global min
            zv = jnp.where(degenerate[fidx], zmin[fidx],
                           jnp.maximum(zmn, zmin[fidx]))
            Sg = Sg.at[jnp.where(ins_, cj * cs + ci, cs * cs + 2)].min(
                zv, mode="drop")
            return start + SCH, Sg

        _, Sgrid = jax.lax.while_loop(
            lambda c: c[0] < s_total, s_body,
            (jnp.int32(0), jnp.full((cs * cs + 2,), jnp.float32(3e38),
                                    F32)))

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
        f_deg = degenerate[fidx][:, None]
        f_p0a = p0a[fidx][:, None]
        f_p0b = p0b[fidx][:, None]
        f_ua = ua[fidx][:, None]
        f_ub = ub[fidx][:, None]
        f_va = va[fidx][:, None]
        f_vb = vb[fidx][:, None]
        f_inv = inv_det[fidx][:, None]
        f_z0 = z00[fidx][:, None]
        f_ga = g_a[fidx][:, None]
        f_gb = g_b[fidx][:, None]
        if cone_tan <= 0.0:
            f_mu = mu[fidx][:, None]
            f_mv = mv[fidx][:, None]
            f_gm = g_m[fidx][:, None]
            f_gbm = g_bm[fidx][:, None]
        else:
            # per-texel erosion from the S support grid: the cone reach
            # this texel's queries can accumulate by the face's depth.
            # grow_t <= the face-level grow (S >= world min), so the
            # entry bbox above still covers every marked texel.
            sci = jnp.minimum(i // bfc, cs - 1)
            scj = jnp.minimum(j // bfc, cs - 1)
            S_t = jnp.take(Sgrid, scj * cs + sci, mode="clip")
            grow_t = SAFE + cone_tan * jnp.maximum(
                fzmax - (S_t - S_SLACK), 0.0)
            f_mu = grow_t * rmu[fidx][:, None]
            f_mv = grow_t * rmv[fidx][:, None]
            f_gm = grow_t * gsum[fidx][:, None]
            f_gbm = (grow_t - SAFE) * gsum[fidx][:, None]
        f_xv0 = x_v0[fidx][:, None]
        f_xv1 = x_v1[fidx][:, None]
        ta0 = a0 + i.astype(F32) * ts
        tb0 = b0 + j.astype(F32) * ts
        fully = ins & ~f_deg
        zc_min = jnp.full(ins.shape, jnp.float32(3e38))
        zc_max = jnp.full(ins.shape, NEG)
        uu_min = jnp.full(ins.shape, jnp.float32(3e38))
        uu_max = jnp.full(ins.shape, jnp.float32(-3e38))
        vv_min = jnp.full(ins.shape, jnp.float32(3e38))
        vv_max = jnp.full(ins.shape, jnp.float32(-3e38))
        # 4 texel corners: the fully-inside test (SAFE-shrunk barycentric
        # margins, extended across internal v edges) and the affine depth
        # extrema in one pass
        for da_ in (0.0, 1.0):
            for db_ in (0.0, 1.0):
                da = (ta0 + da_ * ts) - f_p0a
                db = (tb0 + db_ * ts) - f_p0b
                uu = (da * f_vb - db * f_va) * f_inv
                vv = (f_ua * db - f_ub * da) * f_inv
                fully = fully & (uu > f_mu) & (uu < 1.0 - f_mu) \
                    & (vv > f_mv - f_xv0) & (vv < 1.0 - f_mv + f_xv1)
                uu_min = jnp.minimum(uu_min, uu)
                uu_max = jnp.maximum(uu_max, uu)
                vv_min = jnp.minimum(vv_min, vv)
                vv_max = jnp.maximum(vv_max, vv)
                zc = f_z0 + da * f_ga + db * f_gb
                zc_min = jnp.minimum(zc_min, zc)
                zc_max = jnp.maximum(zc_max, zc)
        # gridC: possibly-touching -> affine max over the SAFE-grown texel
        # (corner max + growth margin), clamped to the global max; edge-on
        # faces use the global range
        zCv = jnp.where(f_deg, fzmax,
                        jnp.minimum(fzmax, zc_max + f_gm))
        poss = ins
        if cone_tan > 0.0:
            # cone grids tighten possibly-touching from the bbox (grown
            # by the face-level WORST reach) to the quad grown by THIS
            # texel's reach: barycentric interval overlap is a superset
            # of quad-dilated-by-grow_t (isoline margins), so it stays
            # conservative while dropping out-of-reach texels whose
            # queries the cone can never deviate onto the face
            poss = ins & (f_deg
                          | ((uu_max > -f_mu) & (uu_min < 1.0 + f_mu)
                             & (vv_max > -f_mv) & (vv_min < 1.0 + f_mv)))
        gC = gC.at[jnp.where(poss, tex, grid * grid + 2).reshape(-1)].max(
            jnp.broadcast_to(zCv, ins.shape).reshape(-1), mode="drop")
        # gridB: texel FULLY inside the shrunk quad -> affine min over the
        # texel (exact: affine extrema sit at region corners, and `fully`
        # puts the whole texel inside the quad), lowered by the cone reach
        # (cone crossings land up to cone_m off the query's column; 0 for
        # hard-shadow grids), capped by the global max
        zBv = jnp.minimum(zc_min - f_gbm, fzmax)
        gB = gB.at[jnp.where(fully, tex, grid * grid + 2).reshape(-1)].max(
            jnp.broadcast_to(zBv, ins.shape).reshape(-1), mode="drop")
        return start + CH, gB, gC

    _, gridB, gridC = jax.lax.while_loop(
        lambda c: c[0] < total, chunk_body, (jnp.int32(0), gridB, gridC))
    # interleave as one (G^2, 2) table: classify needs ONE 8 B row gather
    # instead of two 4 B gathers (measured 50 ms at 2M lanes)
    gBC = jnp.stack([gridB[:grid * grid], gridC[:grid * grid]], axis=1)
    # coarse level: per-block min of gridB (a coarse-certain shadow implies
    # every fine texel agrees) and max of gridC (coarse-certain light
    # implies every fine texel agrees). grid is j-major: tex = j*grid + i.
    co = min(COARSE, grid)
    bf = grid // co
    cB = gridB[:grid * grid].reshape(co, bf, co, bf).min((1, 3))
    cC = gridC[:grid * grid].reshape(co, bf, co, bf).max((1, 3))
    cBC = jnp.stack([cB.reshape(-1), cC.reshape(-1)], axis=1)
    return (gBC, cBC, a0, b0, ts), ok & s_ok


def invalidate_sun_texels(grids, e1, e2, s, positions, size: int,
                          cone_tan: float = 0.0):
    """Conservative staleness repair after world edits: mark every sun-
    space texel whose gate answer COULD be affected by geometry changes
    at `positions` ((K, 3) int voxel coords) as AMBIGUOUS — certain-
    shadow depth to -inf (no shadow claim), certain-light depth to +inf
    (no light claim) — in both the fine and coarse tables. Lanes landing
    there run the exact DDA against the (patched) traversal structure, so
    frames stay exact without paying the full grid rebuild per edit
    (renderer._sunmask: ~220 ms at 256^3); the full rebuild happens
    lazily on the next sun move.

    Soundness: widening ambiguity is always conservative (the classifier
    only ever *skips* work it is certain about). The footprint is the
    edited voxels' projected bbox grown by the largest per-texel margin
    the build can ever apply (SAFE + cone reach over the whole world
    depth range) plus one texel of floor quantization: any face the edit
    adds/removes registers only within that region, and every gate
    (masked_shadow_hits, soft_shadow_gate, the near-walk lift) reads the
    query ray's OWN texel row — the projection is invariant along s, so
    no query outside the region can see the change."""
    import numpy as np
    gBC, cBC, a0, b0, ts = grids
    G = int(math.isqrt(gBC.shape[0]))
    CO = int(math.isqrt(cBC.shape[0]))
    bf = G // CO
    e1n = np.asarray(e1, np.float64)
    e2n = np.asarray(e2, np.float64)
    a0f = float(a0)
    b0f = float(b0)
    tsf = float(ts)
    grow = SAFE + (cone_tan * (size * math.sqrt(3.0) + S_SLACK)
                   if cone_tan > 0.0 else 0.0)
    # cluster by superbrick (edits are brush-local) and mark each
    # cluster's grown rect — fills stay tiny host-side
    pos = np.atleast_2d(np.asarray(positions, np.int64))
    sbs, inv = np.unique(pos >> 3, axis=0, return_inverse=True)
    mask = np.zeros((G, G), bool)
    offs = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                     for z in (0, 1)], np.float64)
    for k in range(len(sbs)):
        sel = pos[inv == k].astype(np.float64)
        cs = (sel[:, None, :] + offs[None]).reshape(-1, 3)  # cube corners
        pa = cs @ e1n
        pb = cs @ e2n
        i0 = max(int(np.floor((pa.min() - grow - a0f) / tsf)) - 1, 0)
        i1 = min(int(np.floor((pa.max() + grow - a0f) / tsf)) + 1, G - 1)
        j0 = max(int(np.floor((pb.min() - grow - b0f) / tsf)) - 1, 0)
        j1 = min(int(np.floor((pb.max() + grow - b0f) / tsf)) + 1, G - 1)
        mask[j0:j1 + 1, i0:i1 + 1] = True
    jj, ii = np.nonzero(mask)
    if len(jj) == 0:
        return grids
    tex = jnp.asarray((jj * G + ii).astype(np.int32))
    amb = jnp.stack([jnp.full((len(jj),), NEG, F32),
                     jnp.full((len(jj),), jnp.float32(3e38), F32)], -1)
    gBC = gBC.at[tex].set(amb)
    cj, ci = np.nonzero(mask.reshape(CO, bf, CO, bf).any(axis=(1, 3)))
    ctex = jnp.asarray((cj * CO + ci).astype(np.int32))
    camb = jnp.stack([jnp.full((len(cj),), NEG, F32),
                      jnp.full((len(cj),), jnp.float32(3e38), F32)], -1)
    cBC = cBC.at[ctex].set(camb)
    return (gBC, cBC, a0, b0, ts)


def _certain(qz, rowB, rowC, inb, back):
    """The two certainty tests (shadow at the ray start's depth, light at
    the surface point's depth — see masked_shadow_hits docstring)."""
    certain_shadow = inb & (qz < rowB - SAFE)
    certain_light = inb & (qz - back > rowC + SAFE)
    return certain_shadow, certain_light


NEAR_K = 6   # near-segment length in voxel crossings


def _near_segment(grid, p_o, sun3, K: int = NEAR_K):
    """Exact walk of the first K voxel crossings from p_o along the unit
    sun direction, against the jump grid's brick occupancy. Returns
    (hit, exited, t_end): hit = entered a solid voxel within the segment
    (binary-equal to the full DDA's eventual answer); exited = left the
    world (certain miss); t_end = the entry parameter of the last visited
    EMPTY cell — the "lifted" re-classification point (its projection
    texel equals the query's: moving along s leaves (a, b) unchanged,
    only the depth grows by t_end).

    `sun3` is either a length-3 vector (one direction for every lane) or
    a 3-tuple of per-lane (N,) channels (the soft path's jittered sample
    directions) — every stepping formula is elementwise either way.

    Why this exists: ambiguous lanes are silhouette texels — their answer
    is usually LOCAL (the step wall right next to the surface). Hits
    resolve here in 1-3 cells; misses lift the query's depth above the
    local wall's gridC so the certain-light test fires, sparing the full
    DDA a world-length march for rays the grids already understand
    (round-2's full-width near_occlusion prepass, reborn packed and
    grid-assisted). Stepping formulas are ops/jump.py's plain voxel step
    (same floats => same cell sequence as the exact tracer)."""
    size, g, rows = grid.size, grid.gsize, grid.rows
    ox, oy, oz = p_o[:, 0], p_o[:, 1], p_o[:, 2]
    dx, dy, dz = (sun3 if isinstance(sun3, tuple)
                  else (sun3[0], sun3[1], sun3[2]))
    big = jnp.float32(3e38)
    ix_ = jnp.where(dx == 0.0, big, 1.0 / dx)
    iy_ = jnp.where(dy == 0.0, big, 1.0 / dy)
    iz_ = jnp.where(dz == 0.0, big, 1.0 / dz)
    px_ = (dx > 0).astype(I32)
    py_ = (dy > 0).astype(I32)
    pz_ = (dz > 0).astype(I32)
    n = p_o.shape[0]
    vx = jnp.clip(jnp.floor(ox).astype(I32), 0, size - 1)
    vy = jnp.clip(jnp.floor(oy).astype(I32), 0, size - 1)
    vz = jnp.clip(jnp.floor(oz).astype(I32), 0, size - 1)
    t = jnp.zeros((n,), F32)
    t_end = jnp.zeros((n,), F32)
    hit = jnp.zeros((n,), bool)
    exited = jnp.zeros((n,), bool)
    alive = jnp.ones((n,), bool)
    U32 = jnp.uint32
    for _ in range(K):
        addr = (vx >> 3) + (vy >> 3) * g + (vz >> 3) * g * g
        r = jnp.take(rows, addr, axis=0, mode="clip")
        lx, ly, lz = vx & 7, vy & 7, vz & 7
        from vvr_tpu.world.occupancy import brick_solid
        solid = brick_solid([r[:, k] for k in range(16)], lx, ly, lz)
        hit = hit | (alive & solid)
        alive = alive & ~solid
        t_end = jnp.where(alive, t, t_end)
        # plain voxel step (ops/jump.py alu formulas, no subcell skip)
        bx = (vx + px_).astype(F32)
        by = (vy + py_).astype(F32)
        bz = (vz + pz_).astype(F32)
        tx = jnp.where(dx == 0.0, big, (bx - ox) * ix_)
        ty = jnp.where(dy == 0.0, big, (by - oy) * iy_)
        tz = jnp.where(dz == 0.0, big, (bz - oz) * iz_)
        te = jnp.minimum(tx, jnp.minimum(ty, tz))
        nface = jnp.where(tz <= te, 2, jnp.where(ty <= te, 1, 0))
        bxi = bx.astype(I32)
        byi = by.astype(I32)
        bzi = bz.astype(I32)
        nvx = jnp.where(nface == 0, jnp.where(dx > 0, bxi, bxi - 1), vx)
        nvy = jnp.where(nface == 1, jnp.where(dy > 0, byi, byi - 1), vy)
        nvz = jnp.where(nface == 2, jnp.where(dz > 0, bzi, bzi - 1), vz)
        oob = ((nvx < 0) | (nvx >= size) | (nvy < 0) | (nvy >= size)
               | (nvz < 0) | (nvz >= size))
        exited = exited | (alive & oob)
        step = alive & ~oob
        vx = jnp.where(step, nvx, vx)
        vy = jnp.where(step, nvy, vy)
        vz = jnp.where(step, nvz, vz)
        t = jnp.where(step, te, t)
        alive = step
        # t_end stays at the entry of the last TESTED-empty cell; the next
        # cell is untested until the following iteration's solid check
    return hit, exited, t_end


def near_walk_classify(accel, p_o, p_d, rowC, sun3, size: int):
    """Hit/miss prefilter for batched soft-shadow SAMPLE rays (the cone
    residue's S jittered rays, already packed): exact K-crossing walk,
    then lifted re-classification against the SURFACE texel's cone
    gridC row.

    Returns (known_hit, known_miss) — lanes in neither run the DDA.

    Soundness of the lift: the sample ray is a member of the cone from
    its surface query, so every face crossing it can ever make is
    registered in the surface texel's cone gridC (the cone-margin
    invariant the gate's certain-light side relies on), and its sun
    depth is MONOTONE along the ray (d.s > 0). Once the walk lifts the
    ray's depth above rowC + SAFE, every remaining crossing would sit
    above every registered one — there is none, so the ray is lit.
    `rowC` must be the CONE grid's C at the sample's SURFACE texel
    (+3e38 where the surface projects out of the grid: no claim).
    Out-of-world starts are certainly-miss (trace_jump's origin-outside
    rule — the walk's clamped start voxel would otherwise test garbage).

    Exactness: hit lanes are binary-equal to the full DDA (same float
    stepping); miss lanes are certain by the walk's world exit or the
    lift argument — tests/test_sunshadow.py checks all three against
    the dense oracle."""
    ox, oy, oz = p_o[:, 0], p_o[:, 1], p_o[:, 2]
    dx, dy, dz = p_d[:, 0], p_d[:, 1], p_d[:, 2]
    inw = ((ox >= 0) & (ox < size) & (oy >= 0) & (oy < size)
           & (oz >= 0) & (oz < size))
    nh, nexit, t_end = _near_segment(accel, p_o, (dx, dy, dz))
    qz_lift = (ox * sun3[0] + oy * sun3[1] + oz * sun3[2]
               + t_end * (dx * sun3[0] + dy * sun3[1] + dz * sun3[2]))
    known_hit = inw & nh
    known_miss = ~inw | (inw & ~nh
                         & (nexit | (qz_lift > rowC + SAFE)))
    return known_hit, known_miss


def masked_shadow_hits(tr, s_o, sun3, e1, e2, grids, shadow_active,
                       size: int, pack_cap, back: float = BACK,
                       accel=None, cap1: int | None = None,
                       near_k: int = NEAR_K,
                       dda_pack: int | None = None):
    """The frame's hard-shadow query with the classifier fast path:
    ONE full-width fine-grid gather answers ~92% of lanes (one-shot
    gather cost is lane-count-bound, NOT table-size-bound — round-4
    tools/microbench_prof.py: a (2M,)-index gather costs ~18-27 ms
    device from a 64K-row and a 4M-row table alike, so the round-3
    coarse gate + n/4 pack + packed fine gather chain paid an extra
    coarse gather AND an extra 2M-wide nonzero for nothing); only the
    ambiguous residue (true silhouette texels, ~6-8% of shadow lanes)
    is front-packed once for the near-segment walk + DDA. Lanes that
    overflow the pack capacity fall back to a full-width DDA under
    lax.cond — zero cost unless it fires.

    `s_o` is the DDA's own ray start — surface point + `back` along the
    sun. Shadow-certainty is evaluated at s_o's depth (the witness
    crossing must lie strictly ahead of the DDA start); light-certainty
    at the surface point's depth (so a crossing that buries s_o inside
    solid — where the DDA hits at t=0 — always blocks the claim).
    Out-of-world starts are certainly-miss (trace_shi's origin-outside
    rule, ray_stuff_other.slang:424-437).

    Bit-equal to running the DDA for every lane wherever the DDA
    terminates within its max_steps cap (tests/test_sunshadow.py; see the
    module docstring for the cap divergence).

    `s_o` is either an (N, 3) array or a 3-tuple of flat (N,) channels
    (the frame's SoA tail — (N, k) minor-axis intermediates run at k/128
    lane utilization; projections become explicit per-channel FMAs)."""
    gBC, cBC, a0, b0, ts = grids
    if isinstance(s_o, tuple):
        sox, soy, soz = s_o
    else:
        sox, soy, soz = s_o[:, 0], s_o[:, 1], s_o[:, 2]
    n = sox.shape[0]
    grid = int(math.isqrt(gBC.shape[0]))   # static under jit
    inw = ((sox >= 0) & (sox < size) & (soy >= 0) & (soy < size)
           & (soz >= 0) & (soz < size))
    qa = sox * e1[0] + soy * e1[1] + soz * e1[2]
    qb = sox * e2[0] + soy * e2[1] + soz * e2[2]
    qz = sox * sun3[0] + soy * sun3[1] + soz * sun3[2]
    i = jnp.floor((qa - a0) / ts).astype(I32)
    j = jnp.floor((qb - b0) / ts).astype(I32)
    inb = inw & (i >= 0) & (i < grid) & (j >= 0) & (j < grid)
    tex = jnp.where(inb, j * grid + i, 0)
    row = jnp.take(gBC, tex, axis=0, mode="clip")
    f_shadow, f_light = _certain(qz, row[:, 0], row[:, 1], inb, back)

    known_hit = shadow_active & f_shadow
    known_miss = shadow_active & ~known_hit & (f_light | ~inw)
    amb = shadow_active & ~known_hit & ~known_miss
    sdir_one = sun3

    if pack_cap is None or n < 4096:
        s_o_aos = (jnp.stack([sox, soy, soz], -1)
                   if isinstance(s_o, tuple) else s_o)
        dda_hit = tr(s_o_aos, jnp.broadcast_to(sdir_one, s_o_aos.shape),
                     active=amb, pack_first=pack_cap, shadow=True).hit
        return jnp.where(known_hit, True,
                         jnp.where(known_miss, False, dda_hit))

    # ---- pack the ambiguous residue once: near segment + packed DDA ----
    # bench camera: amb ~6-8% of 2M lanes; n/12 leaves headroom for low
    # suns (overflow stays exact through the full-width net below).
    # TWO-STAGE pack: a full-width jnp.nonzero costs ~41 ms at 2M lanes
    # (tools/microbench_pack.py — its scatter carries one index per INPUT
    # lane), but ambiguity clusters on silhouettes: 5.9% ambiguous lanes
    # live in 13.5% of 8-lane groups (measured, bench cam). Stage 1 packs
    # GROUP ids at n/8 width; stage 2 tightens the expanded groups to
    # true ambiguous lanes at the expanded width. Same index set, ~3x
    # cheaper; either cap's overflow leaves lanes unmarked for the net.
    cap1 = cap1 or max(n // 12, 4096)
    idx, valid = pack_indices_grouped(amb, cap1)
    safe = jnp.minimum(idx, n - 1)
    p_o = jnp.stack([sox[safe], soy[safe], soz[safe]], -1)
    p_dda_active = valid
    near_hit = jnp.zeros((cap1,), bool)
    if accel is not None:
        # silhouette lanes resolve locally: exact K-crossing walk, then
        # re-classify at the lifted depth with the SAME fine-grid row
        # (the projection texel is invariant along the sun direction)
        nh, nexit, t_end = _near_segment(accel, p_o, sun3, K=near_k)
        lift = qz[safe] + t_end > jnp.take(row[:, 1], safe) + SAFE
        near_hit = valid & nh
        p_dda_active = valid & ~(nh | nexit | lift)
    p_dda = tr(p_o, jnp.broadcast_to(sdir_one, p_o.shape),
               active=p_dda_active,
               pack_first=dda_pack or max(cap1 // 8, 2048),
               shadow=True).hit
    p_hit = near_hit | (p_dda_active & p_dda)
    packed_hits = jnp.zeros((n,), bool).at[idx].set(p_hit & valid,
                                                    mode="drop")
    packed_mark = jnp.zeros((n,), bool).at[idx].set(valid, mode="drop")
    overflow = amb & ~packed_mark

    def of_fallback(_):
        s_o_aos = jnp.stack([sox, soy, soz], -1)
        f_dda = tr(s_o_aos, jnp.broadcast_to(sdir_one, s_o_aos.shape),
                   active=overflow, pack_first=pack_cap, shadow=True).hit
        return overflow & f_dda

    of_hits = jax.lax.cond(jnp.any(overflow), of_fallback,
                           lambda _: jnp.zeros((n,), bool), None)
    return jnp.where(known_hit, True,
                     jnp.where(known_miss, False,
                               jnp.where(packed_mark, packed_hits,
                                         of_hits)))


SOFT_FWD = 0.06   # bound on how far ahead of the surface point any
                  # jittered sample's DDA start sits (0.004 along s +
                  # 0.05 along the jittered direction, render/frame.py)


def soft_shadow_gate(s_base, sun3, e1, e2, grids, shadow_active,
                     size: int, fwd: float = SOFT_FWD):
    """(known_hit, known_miss) full-width masks shared by ALL N jittered
    soft-shadow samples, from CONE grids (build_sun_grids with
    cone_tan=CONE_TAN): certain-shadow means every direction in the cone
    crosses into solid strictly ahead of every sample start; certain-light
    means none does. The residue (neither mask) runs the per-sample DDAs.
    `s_base` is the SURFACE point (shadow_start) — sample starts sit at
    most `fwd` ahead of it along s, and a crossing that buries a start
    registers in gridC above the surface depth, blocking certain-light.

    Contract: s_base must be SURFACE-SUPPORTED — on an exposed face of
    the world the grids were built from (within S_PAD/S_SLACK slack).
    The cone margins assume the query's sun depth is no lower than its
    column's S support (build_sun_grids round-4 erosion); every real
    shadow query is a DDA/raster hit point, which lies on a face
    (pixelated_shadows, whose quarter-floor breaks this, bypasses the
    classifier — renderer.use_sunmask). A free-floating point may be
    classified UNSOUNDLY — callers must not gate arbitrary points
    (tests/test_sunshadow.py samples real surface points)."""
    gBC, cBC, a0, b0, ts = grids
    if isinstance(s_base, tuple):
        sbx, sby, sbz = s_base
    else:
        sbx, sby, sbz = s_base[:, 0], s_base[:, 1], s_base[:, 2]
    grid = int(math.isqrt(gBC.shape[0]))
    inw = ((sbx >= 0) & (sbx < size) & (sby >= 0) & (sby < size)
           & (sbz >= 0) & (sbz < size))
    qa = sbx * e1[0] + sby * e1[1] + sbz * e1[2]
    qb = sbx * e2[0] + sby * e2[1] + sbz * e2[2]
    qz = sbx * sun3[0] + sby * sun3[1] + sbz * sun3[2]
    i = jnp.floor((qa - a0) / ts).astype(I32)
    j = jnp.floor((qb - b0) / ts).astype(I32)
    inb = inw & (i >= 0) & (i < grid) & (j >= 0) & (j < grid)
    tex = jnp.where(inb, j * grid + i, 0)
    # ONE full-width fine gather (one-shot gather cost is lane-count-
    # bound, not table-size-bound — the round-3 coarse gate + n/4 packed
    # refinement paid an extra gather and a 2M-wide nonzero for nothing)
    row = jnp.take(gBC, tex, axis=0, mode="clip")
    f_shadow = inb & (qz + fwd < row[:, 0] - SAFE)
    f_light = inb & (qz > row[:, 1] + SAFE)
    known_hit = shadow_active & f_shadow
    known_miss = shadow_active & ~known_hit & (f_light | ~inw)
    return known_hit, known_miss


@functools.partial(jax.jit, static_argnames=("size",))
def classify(points, e1, e2, s, grids, size: int):
    """(certain_shadow, certain_light) for ray starts `points` (N, 3)
    toward the sun, from the FINE grid (the coarse level is an internal
    fast path of masked_shadow_hits; its certainty implies this one).
    Exact for points in empty space; points inside solid may be wrongly
    light-certain (see module docstring) — callers with possibly-buried
    starts must use a back-margin like masked_shadow_hits.
    Out-of-world starts are never `certain` — the DDA's origin-outside
    rule (miss) applies and the caller handles it."""
    gBC, cBC, a0, b0, ts = grids
    grid = int(math.isqrt(gBC.shape[0]))
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
