"""Dynamic world: SVT brick pool, the voxel update pass, incremental edits."""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.world.bricks import (PAGE_EMPTY, PAGE_FULL, SparseVoxelTexture,
                                  build_svt, is_solid, sample_colour_nearest,
                                  svt_update_brick)
from vvr_tpu.world.chunk import Chunk
from vvr_tpu.world.edit import WorldEditor
from vvr_tpu.world.pyramid import build_brick_pyramid
from vvr_tpu.ops.traverse import trace
from vvr_tpu.render.oracle import trace_dense


def _mini_chunks():
    full = Chunk([0, 0, 0], np.ones((64,) * 3, bool)).rebuild()
    empty = Chunk([1, 0, 0], np.zeros((64,) * 3, bool)).rebuild()
    part_vox = np.zeros((64,) * 3, bool)
    part_vox[:8] = True  # bottom slab solid (z < 8)
    partial = Chunk([0, 1, 0], part_vox).rebuild()
    return [full, empty, partial]


def test_build_svt_pages():
    svt = build_svt(_mini_chunks(), 128)
    page = np.asarray(svt.page_table)
    assert page[0, 0, 0] == PAGE_FULL
    assert page[0, 0, 1] == PAGE_EMPTY
    assert page[0, 1, 0] >= 0
    assert np.asarray(svt.metadata)[0, 0, 0] == 255
    assert svt.num_bricks == 1


def test_is_solid_semantics():
    svt = build_svt(_mini_chunks(), 128)
    pos = jnp.asarray([[5, 5, 5],      # in full chunk
                       [70, 5, 5],     # in empty chunk
                       [5, 70, 3],     # partial chunk, solid slab (z=3)
                       [5, 70, 40]],   # partial chunk, air
                      jnp.int32)
    got = np.asarray(is_solid(svt, pos))
    assert got.tolist() == [True, False, True, False]


def test_svt_update_pass():
    svt = build_svt(_mini_chunks(), 128)
    slot = np.asarray(svt.page_table)[0, 1, 0]
    bricks = svt_update_brick(svt.bricks, jnp.int32(slot),
                              jnp.asarray([0, 64, 0], jnp.int32))
    b = np.asarray(bricks[slot])
    # solid voxels got a hash colour with alpha 255
    assert b[3, 5, 5, 3] == 255
    assert b[3, 5, 5, :3].sum() > 0
    # air stays air-ish (blur of mostly zeros)
    assert b[40, 5, 5, 3] < 255
    # second pass: blur spreads colour into air near the surface
    bricks2 = svt_update_brick(bricks, jnp.int32(slot),
                               jnp.asarray([0, 64, 0], jnp.int32))
    b2 = np.asarray(bricks2[slot])
    assert b2[8, 5, 5, :3].sum() > 0  # just above the slab


def test_colour_sample():
    svt = build_svt(_mini_chunks(), 128)
    col = np.asarray(sample_colour_nearest(
        svt, jnp.asarray([[5.5, 5.5, 5.5], [70.2, 5.5, 5.5]], jnp.float32)))
    assert col[0, 3] == 1.0   # full chunk -> alpha 1
    assert col[1, 3] == 0.0   # empty chunk


def test_edits_update_traversal():
    rng = np.random.default_rng(0)
    occ = np.zeros((64, 64, 64), bool)
    occ[10, :, :] = True  # slab at z=10
    chunks = [Chunk([0, 0, 0], occ).rebuild()]
    pyr = build_brick_pyramid(occ)
    ed = WorldEditor(chunks, pyr)

    # carve a hole and shoot a ray through it
    hole = [(31, 31), (31, 32), (32, 31), (32, 32)]
    ed.set_voxels(np.array([[x, y, 10] for x, y in hole]), solid=False)
    o = jnp.asarray([[31.5, 31.5, 0.5]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    res = trace(ed.pyramid, o, d)
    assert not bool(np.asarray(res.hit)[0])  # flies through the hole
    # a neighbouring ray still hits the slab
    o2 = jnp.asarray([[40.5, 31.5, 0.5]], jnp.float32)
    res2 = trace(ed.pyramid, o2, d)
    assert bool(np.asarray(res2.hit)[0])
    assert int(np.asarray(res2.axis_coord)[0]) == 10

    # add a floating block and hit it
    ed.set_voxels(np.array([[31, 31, 5]]), solid=True)
    res3 = trace(ed.pyramid, o, d)
    assert bool(np.asarray(res3.hit)[0])
    assert int(np.asarray(res3.axis_coord)[0]) == 5

    # the grouped (flagship) table must be patched too
    res4 = trace(ed.pyramid, o, d, use_full=False)
    assert bool(np.asarray(res4.hit)[0])
    assert int(np.asarray(res4.axis_coord)[0]) == 5

    # after edits the pyramid must equal a from-scratch build, BOTH tables
    fresh = build_brick_pyramid(ed.occupancy())
    np.testing.assert_array_equal(np.asarray(fresh.rows),
                                  np.asarray(ed.pyramid.rows))
    np.testing.assert_array_equal(np.asarray(fresh.rows_grp),
                                  np.asarray(ed.pyramid.rows_grp))


def test_brush_edit_batched():
    """A 10^3-voxel brush edit patches the device in one vectorized pass and
    leaves the pyramid identical to a from-scratch build (VERDICT r1 #9)."""
    occ = np.zeros((64, 64, 64), bool)
    occ[20, :, :] = True
    chunks = [Chunk([0, 0, 0], occ).rebuild()]
    ed = WorldEditor(chunks, build_brick_pyramid(occ))
    xs, ys, zs = np.meshgrid(np.arange(10), np.arange(10), np.arange(10),
                             indexing="ij")
    brush = np.stack([xs, ys, zs], -1).reshape(-1, 3) + np.array([25, 25, 21])
    n = ed.set_voxels(brush, solid=True)
    assert n > 0
    fresh = build_brick_pyramid(ed.occupancy())
    np.testing.assert_array_equal(np.asarray(fresh.rows),
                                  np.asarray(ed.pyramid.rows))
    np.testing.assert_array_equal(np.asarray(fresh.rows_grp),
                                  np.asarray(ed.pyramid.rows_grp))
    # a ray from above now lands on the brush top (z = 30)
    res = trace(ed.pyramid, jnp.asarray([[30.0, 30.0, 63.0]], jnp.float32),
                jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), use_full=False)
    assert bool(np.asarray(res.hit)[0])
    assert int(np.asarray(res.axis_coord)[0]) == 30


def test_edits_update_jump_grid():
    """Edits keep the attached JumpGrid identical to a from-scratch build,
    including the empty<->non-empty flips that force a distance-field
    recompute (stale radii would be UNSAFE jumps)."""
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.world.jumpgrid import build_jump_grid

    occ = np.zeros((64, 64, 64), bool)
    occ[10, :, :] = True
    chunks = [Chunk([0, 0, 0], occ).rebuild()]
    ed = WorldEditor(chunks, build_brick_pyramid(occ),
                     jumpgrid=build_jump_grid(occ))

    # carve a hole (no superbrick flip: the slab's bricks stay non-empty)
    hole = [(31, 31), (31, 32), (32, 31), (32, 32)]
    ed.set_voxels(np.array([[x, y, 10] for x, y in hole]), solid=False)
    np.testing.assert_array_equal(
        np.asarray(build_jump_grid(ed.occupancy()).rows),
        np.asarray(ed.jumpgrid.rows))

    # floating block in previously-empty space: superbrick flips non-empty,
    # distances must shrink everywhere around it
    ed.set_voxels(np.array([[31, 31, 40]]), solid=True)
    np.testing.assert_array_equal(
        np.asarray(build_jump_grid(ed.occupancy()).rows),
        np.asarray(ed.jumpgrid.rows))
    res = trace_jump(ed.jumpgrid,
                     jnp.asarray([[31.5, 31.5, 63.0]], jnp.float32),
                     jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32))
    assert bool(np.asarray(res.hit)[0])
    assert int(np.asarray(res.axis_coord)[0]) == 40

    # clear it again: superbrick flips back to empty (distances regrow)
    ed.set_voxels(np.array([[31, 31, 40]]), solid=False)
    np.testing.assert_array_equal(
        np.asarray(build_jump_grid(ed.occupancy()).rows),
        np.asarray(ed.jumpgrid.rows))


def _expand_unit(vx, vy, vz, axis, sgn, eu, ev):
    """Expand merged face rectangles into their covered unit faces."""
    rows = []
    for i in range(len(vx)):
        us, vs = np.meshgrid(np.arange(eu[i]), np.arange(ev[i]),
                             indexing="ij")
        us, vs = us.ravel(), vs.ravel()
        if axis[i] == 0:
            x, y, z = np.full_like(us, vx[i]), vy[i] + us, vz[i] + vs
        elif axis[i] == 1:
            x, y, z = vx[i] + us, np.full_like(us, vy[i]), vz[i] + vs
        else:
            x, y, z = vx[i] + us, vy[i] + vs, np.full_like(us, vz[i])
        rows.append(np.stack(
            [x, y, z, np.full_like(us, axis[i]), np.full_like(us, sgn[i])],
            1))
    return np.concatenate(rows) if rows else np.zeros((0, 5), np.int64)


def test_edits_update_faces():
    """Edits keep the attached exposed-face set equal to a fresh build
    (merged rectangles cover exactly the fresh unit-face multiset), and
    the rasterizer sees carved holes."""
    from vvr_tpu.world.faces import extract_faces

    occ = np.zeros((64, 64, 64), bool)
    occ[10, :, :] = True
    chunks = [Chunk([0, 0, 0], occ).rebuild()]
    ed = WorldEditor(chunks, build_brick_pyramid(occ))
    ed.attach_faces()
    ed.set_voxels(np.array([[31, 31, 10], [31, 32, 10]]), solid=False)
    fresh = extract_faces(ed.occupancy())
    got = _expand_unit(*(np.asarray(a) for a in ed.faces[:7]))
    want = np.stack([fresh.vx, fresh.vy, fresh.vz, fresh.axis, fresh.sgn],
                    1).astype(np.int64)
    assert len(got) == len(want)
    # same unit-face multiset (order may differ)
    got = got[np.lexsort(got.T)]
    want = want[np.lexsort(want.T)]
    np.testing.assert_array_equal(got, want)


def test_edit_full_and_empty_transitions():
    occ = np.ones((16, 16, 16), bool)
    chunks = []  # chunk granularity is 64; 16^3 world has no chunk list
    pyr = build_brick_pyramid(occ)
    ed = WorldEditor([], pyr)
    ed._occ[:] = occ
    ed.set_voxels(np.array([[0, 0, 0]]), solid=False)
    # root full bit must have dropped: a ray to the corner now hits deeper
    res = trace(ed.pyramid, jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32),
                jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32))
    ref = trace_dense(ed.occupancy(),
                      np.array([[0.5, 0.5, 0.5]], np.float32),
                      np.array([[1.0, 0.0, 0.0]], np.float32))
    assert bool(np.asarray(res.hit)[0]) == bool(ref["hit"][0])
    assert int(np.asarray(res.axis_coord)[0]) == int(ref["axis_coord"][0]) == 1


def test_edits_update_paged_grid():
    """Per-frame edits keep the attached PAGED grid (the 1024^3-scale
    two-level structure, world/paged.py) traversal-equal to a
    from-scratch build — BASELINE config 5's edit path (VERDICT r4 next
    #3). The patched pool layout may differ (attach_paged reserves
    per-page slack so patches never re-base), so equality is asserted on
    TRAVERSAL RESULTS over a ray corpus plus the brush probe, not on raw
    rows."""
    from vvr_tpu.ops.paged import trace_paged
    from vvr_tpu.world.paged import build_paged_grid

    occ = np.zeros((64, 64, 64), bool)
    occ[:, :20, :] = True          # occ[z, y, x] slab
    chunks = [Chunk([0, 0, 0], occ.transpose(2, 1, 0).copy()).rebuild()]
    ed = WorldEditor(chunks, None, size=64)
    pg = ed.attach_paged()

    rng = np.random.default_rng(11)
    o = rng.uniform(-4, 68, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    def results(g):
        r = trace_paged(g, oj, dj, max_steps=2048)
        return (np.asarray(r.hit), np.asarray(r.face),
                np.asarray(r.axis_coord))

    # brush on the slab top + a floating ball in empty space (page flips
    # empty -> non-empty), then carve part back (non-empty -> empty pool
    # spans)
    xs, ys, zs = np.meshgrid(*[np.arange(-2, 3)] * 3, indexing="ij")
    ball = np.stack([xs, ys, zs], -1).reshape(-1, 3)
    for center, solid in [((32, 20, 32), True), ((16, 40, 48), True),
                          ((16, 40, 48), False), ((8, 19, 8), False)]:
        pts = ball + np.asarray(center)
        pts = pts[(pts >= 0).all(1) & (pts < 64).all(1)]
        n = ed.set_voxels(pts, solid)
        assert n >= 0
        fresh = build_paged_grid(ed.occupancy())
        got = results(ed.paged)
        want = results(fresh)
        for g, w, name in zip(got, want, ("hit", "face", "axis_coord")):
            np.testing.assert_array_equal(g, w, err_msg=name)
