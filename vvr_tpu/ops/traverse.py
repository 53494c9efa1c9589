"""Hierarchical DDA traversal — the hot kernel.

TPU-native re-architecture of the reference's compile-time-recursive stackless
DDA (shaders/ray_stuff_other.slang:111-308, entry trace_shi :424-437): a
mask-predicated, fixed-cap `lax.while_loop` vectorized over a ray batch,
walking the dense occupancy mip pyramid (world/pyramid.py). Per iteration each
ray does ONE gather (its cell's any/full bits) plus vector ALU:

  occupied & (leaf | full)  -> HIT   (reference FULL_NODE early-out,
                                      ray_stuff_other.slang:229-243)
  occupied                  -> descend one level (integer child clamp)
  empty                     -> DDA step to the cell exit, then ascend to the
                               coarsest level whose boundary was crossed
                               (base-4 alignment of the crossed coordinate —
                               Museth-style HDDA ascent; replaces the
                               reference's recursion pop)

Hit contract matches the reference (DdaTraversalOutput,
ray_stuff_other.slang:99-106): (hit, face, axis_coord, t) where `axis_coord`
is the entry-plane coordinate of the hit block — origin[face] for leaf hits
(:291) and origin[face] + (sign<0) * (voxel_size-1) for full-node hits (:243).
Exact hit positions are reconstructed by the shading pass via the same
ray-plane solve the reference uses (raytracer.slang:169-177).

Rays whose origin lies outside [0, size)^3 miss immediately
(trace_shi bounds check, ray_stuff_other.slang:430-432).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from vvr_tpu.world.pyramid import OccupancyPyramid

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

_ACTIVE, _HIT, _MISS = 0, 1, 2
BIG_T = 1e30


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TraceResult:
    hit: jnp.ndarray         # bool (N,)
    face: jnp.ndarray        # int32 (N,) axis of entry face: 0=x 1=y 2=z
    axis_coord: jnp.ndarray  # int32 (N,) entry-plane block coordinate
    t: jnp.ndarray           # f32 (N,) conservative entry distance
    iterations: jnp.ndarray  # int32 (N,) HDDA steps taken (debug heatmaps)

    def tree_flatten(self):
        return (self.hit, self.face, self.axis_coord, self.t, self.iterations), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _cell_lookup(pyr: OccupancyPyramid, cell, level):
    """Gather (any, full) bits for (N,3) int cells at (N,) levels."""
    depth = pyr.depth
    bases = jnp.asarray(pyr.bases, I32)
    # bits per cell: level 0 -> 1, else 2
    bpc = jnp.where(level == 0, 1, 2)
    log2s = 2 * (depth - level)          # log2 of grid size at level
    s = (I32(1) << log2s)
    lin = cell[:, 0] + cell[:, 1] * s + cell[:, 2] * s * s
    bit_off = lin * bpc
    addr = bases[level] + (bit_off >> 5)
    shift = (bit_off & 31).astype(U32)
    w = jnp.take(pyr.words, addr, mode="clip")
    any_b = (w >> shift) & U32(1)
    full_shift = jnp.minimum(shift + U32(1), U32(31))  # level-0 lanes discard
    full_b = jnp.where(level == 0, any_b, (w >> full_shift) & U32(1))
    return any_b == 1, full_b == 1


def _argmin3_zyx(tx, ty, tz):
    """Face of the minimal exit t with z > y > x tie priority, matching the
    reference's firstbithigh(eqs) rule (ray_stuff_other.slang:294-295)."""
    tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
    face = jnp.where(tz <= tmin, 2, jnp.where(ty <= tmin, 1, 0))
    return tmin, face


def _base4_trailing(v, cap):
    """Trailing base-4 zero digits of v (i32 array), capped by `cap` (i32)."""
    out = jnp.zeros_like(v)
    ok = jnp.ones_like(v, dtype=bool)
    cur = v
    # static unroll: at most 5 levels in any supported world (depth<=5)
    for _ in range(5):
        aligned = (cur & 3) == 0
        ok = ok & aligned & (out < cap)
        out = out + ok.astype(out.dtype)
        cur = cur >> 2
    return out


@functools.partial(jax.jit, static_argnames=("max_steps", "start_level"))
def trace(pyr: OccupancyPyramid, ray_o, ray_d, max_steps: int = 256,
          active=None, start_level: int | None = None) -> TraceResult:
    """Trace N rays. ray_o/ray_d: (N,3) f32 (d need not be normalized).
    `active`: optional (N,) bool — inactive rays report miss.
    """
    depth = pyr.depth
    size = pyr.size
    n = ray_o.shape[0]
    top = depth if start_level is None else start_level

    o = ray_o.astype(F32)
    d = ray_d.astype(F32)
    inv_d = jnp.where(d == 0.0, F32(BIG_T), 1.0 / d)
    step_dir = jnp.where(d > 0, 1, -1).astype(I32)
    d_pos = (d > 0)

    inside = jnp.all((o >= 0) & (o < size), axis=1)
    status0 = jnp.where(inside, _ACTIVE, _MISS).astype(I32)
    if active is not None:
        status0 = jnp.where(active, status0, _MISS)

    # start at `top` level in the cell containing the origin
    lvl0 = jnp.full((n,), top, I32)
    cell0 = jnp.clip((o // (1 << (2 * top))).astype(I32), 0,
                     (size >> (2 * top)) - 1)

    state = dict(
        status=status0,
        cell=cell0,
        level=lvl0,
        t=jnp.zeros((n,), F32),
        face=jnp.zeros((n,), I32),
        iters=jnp.zeros((n,), I32),
    )

    def cond(s):
        return jnp.any(s["status"] == _ACTIVE)

    def body(s):
        act = s["status"] == _ACTIVE
        cell, level, t = s["cell"], s["level"], s["t"]

        any_b, full_b = _cell_lookup(pyr, cell, level)
        hit_now = act & any_b & ((level == 0) | full_b)
        descend = act & any_b & ~hit_now
        stepping = act & ~any_b

        # --- descend: child cell from current position, clamped to parent
        child_log = 2 * jnp.maximum(level - 1, 0)
        child_sz = (I32(1) << child_log).astype(F32)
        p = o + d * t[:, None]
        child = jnp.floor(p / child_sz[:, None]).astype(I32)
        child = jnp.clip(child, cell * 4, cell * 4 + 3)

        # --- step: exit t of current cell
        cell_log = 2 * level
        csz = (I32(1) << cell_log)
        bound = ((cell + d_pos.astype(I32)) * csz[:, None]).astype(F32)
        t_ax = (bound - o) * inv_d
        t_ax = jnp.where(d == 0.0, F32(BIG_T), t_ax)
        t_exit, new_face = _argmin3_zyx(t_ax[:, 0], t_ax[:, 1], t_ax[:, 2])
        stepped = cell + jnp.eye(3, dtype=I32)[new_face] * step_dir
        s_lvl = (size >> (2 * jnp.clip(level, 0, depth)))
        out = jnp.any((stepped < 0) | (stepped >= s_lvl[:, None]), axis=1)
        # ascent: coarsest level whose boundary the crossed coordinate aligns to
        crossed = stepped[jnp.arange(n), new_face]
        cross_c = jnp.where(step_dir[jnp.arange(n), new_face] > 0,
                            crossed, crossed + 1)
        asc = _base4_trailing(cross_c, jnp.minimum(depth - 1 - level,
                                                   jnp.full_like(level, 5)))
        new_lvl_step = level + asc
        new_cell_step = stepped >> (2 * asc)[:, None]

        # --- merge
        status = jnp.where(hit_now, _HIT,
                           jnp.where(stepping & out, _MISS, s["status"]))
        ncell = jnp.where(descend[:, None], child,
                          jnp.where(stepping[:, None], new_cell_step, cell))
        nlevel = jnp.where(descend, level - 1,
                           jnp.where(stepping, new_lvl_step, level))
        nt = jnp.where(stepping, t_exit, t)
        nface = jnp.where(stepping, new_face, s["face"])
        iters = s["iters"] + act.astype(I32)
        done_cap = iters >= max_steps
        status = jnp.where((status == _ACTIVE) & done_cap, _MISS, status)
        return dict(status=status, cell=ncell, level=nlevel, t=nt,
                    face=nface, iters=iters)

    out = jax.lax.while_loop(cond, body, state)

    hit = out["status"] == _HIT
    cell, level, face = out["cell"], out["level"], out["face"]
    vsz = (I32(1) << (2 * level))
    origin_f = cell[jnp.arange(n), face] * vsz
    neg = step_dir[jnp.arange(n), face] < 0
    axis_coord = origin_f + jnp.where(neg, vsz - 1, 0)
    # ray origin inside the hit cell (never stepped): the entry plane is the
    # origin voxel's own (face 0), matching the dense-DDA oracle. (The
    # reference returns the coarse cell plane here — a degenerate
    # camera-inside-solid case we define more precisely.)
    start_vox = jnp.clip(jnp.floor(o).astype(I32), 0, size - 1)
    axis_coord = jnp.where(out["t"] == 0.0,
                           start_vox[jnp.arange(n), face], axis_coord)
    return TraceResult(hit=hit, face=face,
                       axis_coord=jnp.where(hit, axis_coord, 0),
                       t=jnp.where(hit, out["t"], F32(BIG_T)),
                       iterations=out["iters"])
