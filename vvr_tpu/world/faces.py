"""Exposed-face extraction — the geometry input of the primary-ray
rasterizer (ops/rastertrace.py).

Every first hit of a ray that starts in empty space lies on an *exposed
face*: a unit quad between a solid voxel and an empty neighbor (or the
world boundary). The set of exposed faces is therefore a complete,
direction-independent representation of first-hit visibility, extracted
once per world (and patchable per edit).

Layout: struct-of-arrays over N faces
  vx, vy, vz : int32 — the SOLID voxel's coordinates
  axis       : int32 0/1/2 — the face's perpendicular axis (x/y/z)
  sgn        : int32 0/1 — 1 if the empty neighbor is at +axis
The face's plane coordinate along `axis` is v_axis + sgn.

This replaces nothing in the reference (it rasterizes chunk meshes only as
a debug path, src/voxel/meshes.rs); it is the TPU-native object-order
formulation of the primary megakernel dispatch (raytracer.slang:110-119).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FaceSet:
    """Axis-aligned face rectangles: (vx, vy, vz) is the MIN-corner solid
    voxel; (eu, ev) are integer extents along the face's two in-plane axes
    (u, v), with the per-axis mapping axis 0 -> (u=y, v=z),
    axis 1 -> (u=x, v=z), axis 2 -> (u=x, v=y) — the same mapping the
    rasterizer's coverage tests use (ops/rastertrace.py). Unit faces have
    eu == ev == 1."""

    vx: np.ndarray
    vy: np.ndarray
    vz: np.ndarray
    axis: np.ndarray
    sgn: np.ndarray
    size: int
    eu: np.ndarray = None
    ev: np.ndarray = None
    # internal-edge flags (bit0: the v0-1 edge row is fully covered by
    # coplanar exposed faces; bit1: same for the v0+ev row). Greedy u-runs
    # are maximal, so u edges are always true silhouettes; only v edges can
    # be internal. Consumed by the sun-grid build (ops/sunshadow.py): a
    # rectangle's full-cover test may extend 1 voxel across an internal
    # edge because the coplanar neighbor covers it and shares the same
    # affine depth function.
    einfo: np.ndarray = None

    def __post_init__(self):
        if self.eu is None:
            self.eu = np.ones(len(self.vx), np.int32)
        if self.ev is None:
            self.ev = np.ones(len(self.vx), np.int32)
        if self.einfo is None:
            self.einfo = np.zeros(len(self.vx), np.int32)

    def __len__(self):
        return len(self.vx)

    def device_tuple(self):
        import jax.numpy as jnp
        return tuple(jnp.asarray(a) for a in
                     (self.vx, self.vy, self.vz, self.axis, self.sgn,
                      self.eu, self.ev, self.einfo))


def extract_faces(occ: np.ndarray) -> FaceSet:
    """All exposed faces of dense bool occupancy [z,y,x]. World-boundary
    neighbors count as empty (rays can only hit them from outside the
    volume, which trace_shi rejects, but keeping them is harmless and
    preserves the solid-empty boundary definition)."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    parts = []
    # [z,y,x] array axes map to world axes x=2, y=1, z=0
    for axis, arr_ax in ((0, 2), (1, 1), (2, 0)):
        for sgn in (0, 1):
            nb = np.zeros_like(occ)
            sl_src = [slice(None)] * 3
            sl_dst = [slice(None)] * 3
            if sgn == 1:  # neighbor at +axis
                sl_src[arr_ax] = slice(1, None)
                sl_dst[arr_ax] = slice(0, -1)
            else:
                sl_src[arr_ax] = slice(0, -1)
                sl_dst[arr_ax] = slice(1, None)
            nb[tuple(sl_dst)] = occ[tuple(sl_src)]
            exposed = occ & ~nb
            z, y, x = np.nonzero(exposed)
            parts.append((x, y, z,
                          np.full(len(x), axis, np.int32),
                          np.full(len(x), sgn, np.int32)))
    vx = np.concatenate([p[0] for p in parts]).astype(np.int32)
    vy = np.concatenate([p[1] for p in parts]).astype(np.int32)
    vz = np.concatenate([p[2] for p in parts]).astype(np.int32)
    axis = np.concatenate([p[3] for p in parts])
    sgn = np.concatenate([p[4] for p in parts])
    return FaceSet(vx, vy, vz, axis, sgn, size)


def _exposed_mask(occ: np.ndarray, axis: int, sgn: int) -> np.ndarray:
    """Exposed-face mask at solid-voxel positions for one (axis, sgn)."""
    arr_ax = {0: 2, 1: 1, 2: 0}[axis]
    nb = np.zeros_like(occ)
    sl_src = [slice(None)] * 3
    sl_dst = [slice(None)] * 3
    if sgn == 1:
        sl_src[arr_ax] = slice(1, None)
        sl_dst[arr_ax] = slice(0, -1)
    else:
        sl_src[arr_ax] = slice(0, -1)
        sl_dst[arr_ax] = slice(1, None)
    nb[tuple(sl_dst)] = occ[tuple(sl_src)]
    return occ & ~nb


def _merge_layer_runs(mask_wvu: np.ndarray):
    """Greedy rectangle merge of a [w, v, u] bool mask: run-length along u,
    then fuse identical (w, u0, len) runs across consecutive v. Returns
    (w, u0, v0, eu, ev) int32 arrays. Fully vectorized (no Python loop
    over layers) — the u-merge is an edge-detect, the v-merge a
    lexsort + group-run-length."""
    nw, nv, nu = mask_wvu.shape
    m = mask_wvu
    left = np.zeros_like(m)
    left[:, :, 1:] = m[:, :, :-1]
    right = np.zeros_like(m)
    right[:, :, :-1] = m[:, :, 1:]
    sw, sv, su = np.nonzero(m & ~left)    # run starts, (w, v, u) sorted
    ew, ev_, eu_ = np.nonzero(m & ~right)  # run ends, same order/pairing
    del ew, ev_
    length = (eu_ - su + 1).astype(np.int64)
    # v-merge: group runs by (w, u0, len); within a group, consecutive v
    # values fuse into one rectangle
    order = np.lexsort((sv, length, su, sw))
    w = sw[order]
    v = sv[order]
    u0 = su[order]
    ln = length[order]
    if len(w) == 0:
        z = np.zeros(0, np.int32)
        return z, z, z, z, z
    new = np.ones(len(w), bool)
    new[1:] = ((w[1:] != w[:-1]) | (u0[1:] != u0[:-1])
               | (ln[1:] != ln[:-1]) | (v[1:] != v[:-1] + 1))
    gid = np.cumsum(new) - 1
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, len(w)))
    del gid
    return (w[starts].astype(np.int32), u0[starts].astype(np.int32),
            v[starts].astype(np.int32), ln[starts].astype(np.int32),
            counts.astype(np.int32))


def _v_edge_internal(mask_wvu: np.ndarray, w, u0, v0, eu, ev) -> np.ndarray:
    """Per-rectangle internal-v-edge flags (FaceSet.einfo): bit0 set when
    row v0-1 is fully covered by the plane mask over [u0, u0+eu), bit1 for
    row v0+ev. Chunked row-gather + cumsum (bounded memory at 1024^3)."""
    nw, nv, nu = mask_wvu.shape
    f = len(w)
    flags = np.zeros(f, np.int32)
    if f == 0:
        return flags
    for bit, voff in ((1, -1), (2, 0)):
        vq = v0 + (voff if voff < 0 else ev)
        okv = (vq >= 0) & (vq < nv)
        idx = np.nonzero(okv)[0]
        CH = 1 << 16
        for c0 in range(0, len(idx), CH):
            sel = idx[c0:c0 + CH]
            rows = mask_wvu[w[sel], vq[sel], :]            # (C, nu) bool
            cs = np.zeros((len(sel), nu + 1), np.int32)
            np.cumsum(rows, axis=1, out=cs[:, 1:])
            k = np.arange(len(sel))
            cnt = cs[k, u0[sel] + eu[sel]] - cs[k, u0[sel]]
            flags[sel[cnt == eu[sel]]] |= bit
    return flags


def extract_merged_faces(occ: np.ndarray) -> FaceSet:
    """Exposed faces with coplanar greedy-rectangle merging: adjacent
    same-(axis, sgn, plane) unit faces fuse into maximal rectangles
    (u-runs, then v-fusion of identical runs). The merged set covers
    exactly the same geometry as extract_faces — the rasterizers' coverage
    tests are per-cell range tests, so fragments (and therefore per-pixel
    winners) are identical; only the entry/face counts shrink (~10-40x on
    terrain). No reference analog (the reference has no object-order path
    for the raytracer; its mesher, src/voxel/meshes.rs:119-161, emits
    per-cell quads unmerged)."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    out = {k: [] for k in ("vx", "vy", "vz", "axis", "sgn", "eu", "ev",
                           "einfo")}
    # [z,y,x] -> [w,v,u] transpose per axis: axis0 (u=y,v=z,w=x): (2,0,1);
    # axis1 (u=x,v=z,w=y): (1,0,2); axis2 (u=x,v=y,w=z): (0,1,2)
    transp = {0: (2, 0, 1), 1: (1, 0, 2), 2: (0, 1, 2)}
    for axis in (0, 1, 2):
        for sgn in (0, 1):
            mask = _exposed_mask(occ, axis, sgn).transpose(transp[axis])
            w, u0, v0, eu, ev = _merge_layer_runs(mask)
            einfo = _v_edge_internal(mask, w, u0, v0, eu, ev)
            if axis == 0:
                vx, vy, vz = w, u0, v0
            elif axis == 1:
                vx, vy, vz = u0, w, v0
            else:
                vx, vy, vz = u0, v0, w
            out["vx"].append(vx)
            out["vy"].append(vy)
            out["vz"].append(vz)
            out["axis"].append(np.full(len(w), axis, np.int32))
            out["sgn"].append(np.full(len(w), sgn, np.int32))
            out["eu"].append(eu)
            out["ev"].append(ev)
            out["einfo"].append(einfo)
    cat = {k: np.concatenate(v) if v else np.zeros(0, np.int32)
           for k, v in out.items()}
    return FaceSet(cat["vx"], cat["vy"], cat["vz"], cat["axis"],
                   cat["sgn"], size, cat["eu"], cat["ev"], cat["einfo"])


def extract_merged_faces_region(occ_halo: np.ndarray, origin, size: int,
                                core: int) -> FaceSet:
    """Merged exposed faces of ONE core region (the per-chunk unit of
    incremental face patching — WorldEditor.attach_faces(incremental)).

    `occ_halo` is the (core+2)^3 occupancy of the region plus a 1-voxel
    halo (exposure at the core boundary needs the neighbor); `origin` is
    the core's world min corner. Faces are extracted from the halo'd
    exposure masks CROPPED to the core, so greedy runs never cross the
    region boundary — the invariant that makes per-region re-extraction
    compose into a consistent global face set (a run capped at a region
    edge stays capped no matter what the neighbor region holds). einfo
    internal-edge flags are likewise computed within the core only: an
    edge adjacent to a coplanar face in ANOTHER region reads as a
    silhouette, which only widens the sun-classifier's ambiguous residue
    (conservative; the exact DDA absorbs it)."""
    occ_halo = np.asarray(occ_halo, bool)
    assert occ_halo.shape == (core + 2,) * 3
    out = {k: [] for k in ("vx", "vy", "vz", "axis", "sgn", "eu", "ev",
                           "einfo")}
    transp = {0: (2, 0, 1), 1: (1, 0, 2), 2: (0, 1, 2)}
    corer = slice(1, core + 1)
    for axis in (0, 1, 2):
        for sgn in (0, 1):
            mask = _exposed_mask(occ_halo, axis, sgn)[
                corer, corer, corer].transpose(transp[axis])
            w, u0, v0, eu, ev = _merge_layer_runs(mask)
            einfo = _v_edge_internal(mask, w, u0, v0, eu, ev)
            if axis == 0:
                vx, vy, vz = w, u0, v0
            elif axis == 1:
                vx, vy, vz = u0, w, v0
            else:
                vx, vy, vz = u0, v0, w
            out["vx"].append(vx + np.int32(origin[0]))
            out["vy"].append(vy + np.int32(origin[1]))
            out["vz"].append(vz + np.int32(origin[2]))
            out["axis"].append(np.full(len(w), axis, np.int32))
            out["sgn"].append(np.full(len(w), sgn, np.int32))
            out["eu"].append(eu)
            out["ev"].append(ev)
            out["einfo"].append(einfo)
    cat = {k: np.concatenate(v) if v else np.zeros(0, np.int32)
           for k, v in out.items()}
    return FaceSet(cat["vx"], cat["vy"], cat["vz"], cat["axis"],
                   cat["sgn"], size, cat["eu"], cat["ev"], cat["einfo"])
