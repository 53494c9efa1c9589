"""Jump-grid traversal correctness: both flat-jump kernels (ops/jump.py
trace_jump, ops/jump2.py trace_jump2) must agree with the dense-DDA CPU
oracle on hit/face/axis_coord — same contract as ops/traverse.trace
(reference semantics: trace_shi, shaders/ray_stuff_other.slang:424-437).

Covers the flat-DDA-specific machinery the hierarchical tests can't: octant
jump distances (one-sided empty boxes), subcell skip masks / two-tier scale
switching, jump landings (crossed-axis-exact + clipped float coords), and
the compaction cascade over the 256^3 bench terrain.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops.jump import trace_jump
from vvr_tpu.ops.jump2 import trace_jump2
from vvr_tpu.ops.paged import trace_paged
from vvr_tpu.render.oracle import trace_dense
from vvr_tpu.world.jumpgrid import (build_jump_grid, build_jump_grid2,
                                    chebyshev_distance, octant_distances)
from vvr_tpu.world.paged import build_paged_grid

# all flat/paged jump kernels share the test suite: (build, trace) pairs
IMPLS = [
    pytest.param((build_jump_grid, trace_jump), id="jump"),
    pytest.param((build_jump_grid2, trace_jump2), id="jump2"),
    pytest.param((build_paged_grid, trace_paged), id="paged"),
]


@pytest.fixture(params=IMPLS)
def impl(request):
    return request.param


def random_rays(rng, n, size, inside=True):
    if inside:
        o = rng.uniform(0.5, size - 0.5, size=(n, 3))
    else:
        o = rng.uniform(-size, 2 * size, size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


CORPUS_N = 3000   # ONE canonical ray-batch shape per kernel: every smoke
                  # corpus test pads to it (and uses 64^3 scenes +
                  # max_steps=4096), so the whole oracle suite shares a
                  # single jit specialization per kernel — the smoke
                  # tier's cost is CPU compile time, not the corpora


def pad_rays(o, d, n=CORPUS_N):
    """Tile a small ray set up to the canonical batch shape (duplicate
    rays are just more oracle coverage)."""
    reps = -(-n // len(o))
    return (np.tile(o, (reps, 1))[:n].astype(np.float32),
            np.tile(d, (reps, 1))[:n].astype(np.float32))


def assert_matches_oracle(impl, occ, o, d, max_steps=4096, **kw):
    build, tracer = impl
    res = tracer(build(occ), jnp.asarray(o), jnp.asarray(d),
                 max_steps=max_steps, **kw)
    ref = trace_dense(occ, o, d)
    hit = np.asarray(res.hit)
    np.testing.assert_array_equal(hit, ref["hit"], err_msg="hit mismatch")
    np.testing.assert_array_equal(np.asarray(res.face)[hit], ref["face"][hit],
                                  err_msg="face mismatch")
    np.testing.assert_array_equal(np.asarray(res.axis_coord)[hit],
                                  ref["axis_coord"][hit],
                                  err_msg="axis_coord mismatch")
    return res, ref


# ---------------------------------------------------------------------------
# grid-build invariants
# ---------------------------------------------------------------------------

def test_chebyshev_distance_small():
    occ_sb = np.zeros((4, 4, 4), bool)
    occ_sb[0, 0, 0] = True  # [z,y,x]
    d = chebyshev_distance(occ_sb)
    assert d[0, 0, 0] == 0
    assert d[0, 0, 3] == 3
    assert d[3, 3, 3] == 3
    assert d[1, 1, 1] == 1


def test_octant_distances_invariants():
    rng = np.random.default_rng(2)
    occ_sb = rng.random((8, 8, 8)) < 0.1
    occ_sb[0, 0, 0] = True  # ensure at least one solid
    cheb = chebyshev_distance(occ_sb)
    od = octant_distances(occ_sb)
    # octant distance dominates chebyshev (one-sided box is a subset of the
    # two-sided box) and is 0 exactly at non-empty cells
    for oct_ in range(8):
        np.testing.assert_array_equal(od[oct_] == 0, occ_sb)
        assert (od[oct_][~occ_sb] >= cheb[~occ_sb]).all()
    # brute-force check a few cells: the one-sided box must be all-empty
    g = occ_sb.shape[0]
    for oct_ in (0, 3, 5, 7):
        sx = 1 if (oct_ & 1) else -1
        sy = 1 if (oct_ & 2) else -1
        sz = 1 if (oct_ & 4) else -1
        for (z, y, x) in [(0, 0, 0), (4, 4, 4), (7, 7, 7), (2, 5, 3)]:
            dv = int(od[oct_][z, y, x])
            if dv == 0:
                continue
            for cz in range(dv):
                for cy in range(dv):
                    for cx in range(dv):
                        zz, yy, xx = z + cz * sz, y + cy * sy, x + cx * sx
                        if 0 <= zz < g and 0 <= yy < g and 0 <= xx < g:
                            assert not occ_sb[zz, yy, xx], (oct_, z, y, x, dv)


def test_jump_grid2_row_layout(small_world):
    """JumpGrid2 rows must encode exactly the JumpGrid fields they mirror."""
    _, _, occ = small_world
    g1 = build_jump_grid(occ)
    g2 = build_jump_grid2(occ)
    r1 = np.asarray(g1.rows)
    j2 = np.asarray(g2.jrows)
    np.testing.assert_array_equal(j2[:, 0], r1[:, 17])  # subcell lo
    np.testing.assert_array_equal(j2[:, 1], r1[:, 18])  # subcell hi
    np.testing.assert_array_equal(j2[:, 3], r1[:, 16])  # chebyshev
    for oct_ in range(8):
        np.testing.assert_array_equal((j2[:, 2] >> (4 * oct_)) & 15,
                                      np.minimum(r1[:, 24 + oct_], 15))


# ---------------------------------------------------------------------------
# oracle equivalence
# ---------------------------------------------------------------------------

def test_single_voxel_hits(impl):
    occ = np.zeros((64, 64, 64), bool)
    occ[8, 8, 8] = True
    o = np.array([[0.5, 8.5, 8.5], [0.5, 8.5, 8.5], [8.5, 8.5, 8.5]],
                 np.float32)
    d = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0]], np.float32)
    o, d = pad_rays(o, d)
    res, _ = assert_matches_oracle(impl, occ, o, d)
    hit = np.asarray(res.hit)
    assert hit[:3].tolist() == [True, False, True]
    assert int(np.asarray(res.face)[0]) == 0
    assert int(np.asarray(res.axis_coord)[0]) == 8


def test_ray_starting_inside_solid(impl):
    occ = np.ones((64, 64, 64), bool)
    o = np.array([[5.5, 5.5, 5.5]], np.float32)
    d = np.array([[1, 0, 0]], np.float32)
    o, d = pad_rays(o, d)
    res, _ = assert_matches_oracle(impl, occ, o, d)
    assert bool(np.asarray(res.hit)[0])
    assert int(np.asarray(res.face)[0]) == 0


def test_outside_origin_misses(impl):
    build, tracer = impl
    occ = np.ones((64, 64, 64), bool)
    o = np.array([[-1.0, 5.0, 5.0], [64.0, 5.0, 5.0]], np.float32)
    d = np.array([[1, 0, 0], [-1, 0, 0]], np.float32)
    o, d = pad_rays(o, d)
    res = tracer(build(occ), jnp.asarray(o), jnp.asarray(d),
                 max_steps=4096)
    assert not np.asarray(res.hit).any()


def test_axis_aligned_rays(impl):
    rng = np.random.default_rng(3)
    occ = rng.random((64, 64, 64)) < 0.02
    n = 200
    o = rng.uniform(0.25, 63.75, size=(n, 3)).astype(np.float32)
    d = np.zeros((n, 3), np.float32)
    ax = rng.integers(0, 3, n)
    sign = rng.choice([-1.0, 1.0], n)
    d[np.arange(n), ax] = sign
    o, d = pad_rays(o, d)
    assert_matches_oracle(impl, occ, o, d)


def test_random_sparse_scene(impl):
    rng = np.random.default_rng(4)
    occ = rng.random((64, 64, 64)) < 0.01
    o, d = random_rays(rng, CORPUS_N, 64)
    assert_matches_oracle(impl, occ, o, d)


@pytest.mark.full
def test_random_dense_scene(impl):
    rng = np.random.default_rng(5)
    occ = rng.random((64, 64, 64)) < 0.4
    o, d = random_rays(rng, 2000, 64)
    assert_matches_oracle(impl, occ, o, d)


@pytest.mark.full
def test_far_jump_scene(impl):
    """Solid only in one corner superbrick: distance jumps span most of the
    grid; rays from the far corner must still land bit-exactly."""
    occ = np.zeros((128, 128, 128), bool)
    occ[0:8, 0:8, 0:8] = True
    rng = np.random.default_rng(6)
    o = rng.uniform(100, 127, size=(500, 3)).astype(np.float32)
    tgt = rng.uniform(0, 8, size=(500, 3))
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res, ref = assert_matches_oracle(impl, occ, o, d)
    assert ref["hit"].all()
    # jumps must make this cheap: far fewer sub-steps than the ~200-voxel
    # flat DDA distance (jump2 chains 15-capped jumps, still far fewer)
    assert np.asarray(res.iterations).max() < 80


def test_empty_world_misses_everywhere(impl):
    build, tracer = impl
    occ = np.zeros((64, 64, 64), bool)
    rng = np.random.default_rng(8)
    o, d = random_rays(rng, CORPUS_N, 64)
    res = tracer(build(occ), jnp.asarray(o), jnp.asarray(d),
                 max_steps=4096)
    assert not np.asarray(res.hit).any()
    # whole-grid octant jumps: out in very few iterations
    assert np.asarray(res.iterations).max() <= 4


def test_active_mask(impl):
    build, tracer = impl
    occ = np.ones((64, 64, 64), bool)
    o = np.full((4, 3), 5.5, np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (4, 1))
    o, d = pad_rays(o, d)
    act_np = np.tile([True, False, True, False], CORPUS_N // 4)
    res = tracer(build(occ), jnp.asarray(o), jnp.asarray(d),
                 max_steps=4096, active=jnp.asarray(act_np))
    np.testing.assert_array_equal(np.asarray(res.hit), act_np)


def test_terrain_scene(impl, small_world):
    _, _, occ = small_world
    rng = np.random.default_rng(7)
    o, d = random_rays(rng, 3000, occ.shape[0])
    assert_matches_oracle(impl, occ, o, d)


@pytest.mark.full
def test_subcell_skip_agrees_on_half_empty_bricks(impl):
    """Bricks whose lower 4^3 half is empty exercise the subcell skip / the
    two-tier scale switch."""
    rng = np.random.default_rng(9)
    mask = rng.random((64, 64, 64)) < 0.3
    xs = np.arange(64)
    occ = mask & ((xs[None, None, :] & 7) >= 4) & ((xs[None, :, None] & 7) >= 4)
    o, d = random_rays(rng, 2000, 64)
    assert_matches_oracle(impl, occ, o, d)


@pytest.mark.full
def test_compaction_cascade_matches_wide_path(impl, medium_world):
    """Flagship scale (VERDICT r1 #5): 256^3 bench terrain, >=4096 rays so
    the straggler cascade engages; compact and non-compact must agree with
    the oracle and each other."""
    build, tracer = impl
    _, _, occ = medium_world
    rng = np.random.default_rng(11)
    o1 = rng.uniform([100, 80, 10], [160, 120, 40], (3000, 3))
    t1 = rng.uniform([0, 0, 100], [256, 80, 256], (3000, 3))
    d1 = t1 - o1
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    o2, d2 = random_rays(rng, 3000, 256)
    o = np.concatenate([o1, o2]).astype(np.float32)
    d = np.concatenate([d1, d2]).astype(np.float32)
    grid = build(occ)
    ref = trace_dense(occ, o, d)
    assert ref["hit"].any() and not ref["hit"].all()
    a = tracer(grid, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
               compact=True)
    b = tracer(grid, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
               compact=False)
    for res in (a, b):
        hit = np.asarray(res.hit)
        np.testing.assert_array_equal(hit, ref["hit"])
        np.testing.assert_array_equal(np.asarray(res.face)[hit],
                                      ref["face"][hit])
        np.testing.assert_array_equal(np.asarray(res.axis_coord)[hit],
                                      ref["axis_coord"][hit])


@pytest.mark.full
def test_pack_first_path(impl, medium_world):
    """pack_first (masked shadow-ray packing) returns oracle-exact results
    for the active lanes and passthrough for inactive ones."""
    build, tracer = impl
    _, _, occ = medium_world
    rng = np.random.default_rng(13)
    o, d = random_rays(rng, 5000, 256)
    act = rng.random(5000) < 0.5
    grid = build(occ)
    res = tracer(grid, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
                 active=jnp.asarray(act), pack_first=4096)
    ref = trace_dense(occ, o, d)
    hit = np.asarray(res.hit)
    assert not hit[~act].any()
    np.testing.assert_array_equal(hit[act], ref["hit"][act])
    hm = act & ref["hit"]
    np.testing.assert_array_equal(np.asarray(res.face)[hm], ref["face"][hm])
    np.testing.assert_array_equal(np.asarray(res.axis_coord)[hm],
                                  ref["axis_coord"][hm])
