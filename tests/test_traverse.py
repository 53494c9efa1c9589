"""Traversal correctness: the HDDA kernel must agree with the dense-DDA CPU
oracle on hit/face/axis_coord for random rays and structured scenes
(SURVEY.md §4 'bit-exact CPU-reference traversal vs kernel traversal')."""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops.traverse import trace
from vvr_tpu.render.oracle import trace_dense
from vvr_tpu.world.pyramid import build_brick_pyramid as build_pyramid


def random_rays(rng, n, size, inside=True):
    if inside:
        o = rng.uniform(0.5, size - 0.5, size=(n, 3))
    else:
        o = rng.uniform(-size, 2 * size, size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


CORPUS_N = 3000   # one canonical ray-batch shape (see test_jump.py): all
                  # smoke corpus tests share one jit specialization


def pad_rays(o, d, n=CORPUS_N):
    reps = -(-n // len(o))
    return (np.tile(o, (reps, 1))[:n].astype(np.float32),
            np.tile(d, (reps, 1))[:n].astype(np.float32))


def assert_matches_oracle(occ, o, d, max_steps=4096):
    res = trace(build_pyramid(occ), jnp.asarray(o), jnp.asarray(d),
                max_steps=max_steps)
    ref = trace_dense(occ, o, d)
    hit = np.asarray(res.hit)
    np.testing.assert_array_equal(hit, ref["hit"], err_msg="hit mismatch")
    np.testing.assert_array_equal(np.asarray(res.face)[hit], ref["face"][hit],
                                  err_msg="face mismatch")
    np.testing.assert_array_equal(np.asarray(res.axis_coord)[hit],
                                  ref["axis_coord"][hit],
                                  err_msg="axis_coord mismatch")
    return res, ref


def test_single_voxel_hits():
    occ = np.zeros((64, 64, 64), bool)
    occ[8, 8, 8] = True  # voxel at x=8,y=8,z=8
    # ray straight down +x through the voxel center
    o = np.array([[0.5, 8.5, 8.5], [0.5, 8.5, 8.5], [8.5, 8.5, 8.5]], np.float32)
    d = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0]], np.float32)
    o, d = pad_rays(o, d)
    res, _ = assert_matches_oracle(occ, o, d)
    hit = np.asarray(res.hit)
    assert hit[:3].tolist() == [True, False, True]
    assert int(np.asarray(res.face)[0]) == 0
    assert int(np.asarray(res.axis_coord)[0]) == 8


def test_ray_starting_inside_solid():
    occ = np.ones((64, 64, 64), bool)
    o = np.array([[5.5, 5.5, 5.5]], np.float32)
    d = np.array([[1, 0, 0]], np.float32)
    o, d = pad_rays(o, d)
    res, _ = assert_matches_oracle(occ, o, d)
    assert bool(np.asarray(res.hit)[0])
    assert int(np.asarray(res.face)[0]) == 0  # initial face, like trace_shi


def test_outside_origin_misses():
    occ = np.ones((64, 64, 64), bool)
    o = np.array([[-1.0, 5.0, 5.0], [64.0, 5.0, 5.0]], np.float32)
    d = np.array([[1, 0, 0], [-1, 0, 0]], np.float32)
    o, d = pad_rays(o, d)
    res = trace(build_pyramid(occ), jnp.asarray(o), jnp.asarray(d),
                max_steps=4096)
    assert not np.asarray(res.hit).any()  # trace_shi bounds rule


def test_axis_aligned_rays():
    rng = np.random.default_rng(3)
    occ = rng.random((64, 64, 64)) < 0.02
    n = 200
    o = rng.uniform(0.25, 63.75, size=(n, 3)).astype(np.float32)
    d = np.zeros((n, 3), np.float32)
    ax = rng.integers(0, 3, n)
    sign = rng.choice([-1.0, 1.0], n)
    d[np.arange(n), ax] = sign
    o, d = pad_rays(o, d)
    assert_matches_oracle(occ, o, d)


def test_random_sparse_scene():
    rng = np.random.default_rng(4)
    occ = rng.random((64, 64, 64)) < 0.01
    o, d = random_rays(rng, CORPUS_N, 64)
    assert_matches_oracle(occ, o, d)


def test_random_dense_scene():
    rng = np.random.default_rng(5)
    occ = rng.random((64, 64, 64)) < 0.4
    o, d = random_rays(rng, 2000, 64)
    assert_matches_oracle(occ, o, d)


def test_full_region_early_out():
    occ = np.zeros((64, 64, 64), bool)
    occ[0:16, 0:16, 0:16] = True   # one full 16^3 = full level-2 cell
    rng = np.random.default_rng(6)
    o, d = random_rays(rng, CORPUS_N, 64)
    res, ref = assert_matches_oracle(occ, o, d)
    # rays that hit should mostly terminate in very few iterations thanks to
    # the full-node early-out
    hits = np.asarray(res.hit)
    if hits.any():
        assert np.asarray(res.iterations)[hits].mean() < 60


def test_terrain_scene(small_world):
    _, _, occ = small_world
    rng = np.random.default_rng(7)
    o, d = random_rays(rng, 3000, occ.shape[0])
    assert_matches_oracle(occ, o, d)


def test_empty_world_misses_everywhere():
    occ = np.zeros((64, 64, 64), bool)
    rng = np.random.default_rng(8)
    o, d = random_rays(rng, CORPUS_N, 64)
    res = trace(build_pyramid(occ), jnp.asarray(o), jnp.asarray(d),
                max_steps=4096)
    assert not np.asarray(res.hit).any()


def test_active_mask():
    occ = np.ones((64, 64, 64), bool)
    o = np.full((4, 3), 5.5, np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (4, 1))
    o, d = pad_rays(o, d)
    act_np = np.tile([True, False, True, False], CORPUS_N // 4)
    res = trace(build_pyramid(occ), jnp.asarray(o), jnp.asarray(d),
                max_steps=4096, active=jnp.asarray(act_np))
    np.testing.assert_array_equal(np.asarray(res.hit), act_np)


def test_grouped_mode_matches_oracle(small_world):
    """grouped=True (64 B 2x2x2-node-group rows, register sibling cache)
    must give identical results to the default any8B path."""
    _, _, occ = small_world
    rng = np.random.default_rng(17)
    o, d = random_rays(rng, CORPUS_N, occ.shape[0])
    pyr = build_pyramid(occ)
    a = trace(pyr, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
              use_full=False)
    b = trace(pyr, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
              use_full=False, grouped=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(a.face)[hit],
                                  np.asarray(b.face)[hit])
    np.testing.assert_array_equal(np.asarray(a.axis_coord)[hit],
                                  np.asarray(b.axis_coord)[hit])


def test_any_only_rows_match_oracle(small_world):
    """use_full=False (8-byte any-only rows) must give identical results —
    the full-mask is purely a traversal early-out."""
    _, _, occ = small_world
    rng = np.random.default_rng(12)
    o, d = random_rays(rng, CORPUS_N, occ.shape[0])
    pyr = build_pyramid(occ)
    a = trace(pyr, jnp.asarray(o), jnp.asarray(d), max_steps=4096)
    b = trace(pyr, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
              use_full=False)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(a.face)[hit], np.asarray(b.face)[hit])
    np.testing.assert_array_equal(np.asarray(a.axis_coord)[hit],
                                  np.asarray(b.axis_coord)[hit])


# ---------------------------------------------------------------------------
# Flagship-scale correctness (VERDICT r1 #5): the benchmark-shaped scene
# ---------------------------------------------------------------------------

@pytest.mark.full
def test_bench_scene_256_matches_oracle(medium_world):
    """Oracle-vs-kernel on the 256^3 terrain the benchmark renders, a few
    thousand rays, BOTH table modes (per-node full-mask path and the grouped
    any-only flagship path)."""
    _, _, occ = medium_world
    rng = np.random.default_rng(11)
    pyr = build_pyramid(occ)
    # mix of camera-like rays (from the bench camera region) and random rays
    o1 = rng.uniform([100, 80, 10], [160, 120, 40], (2048, 3))
    t1 = rng.uniform([0, 0, 100], [256, 80, 256], (2048, 3))
    d1 = t1 - o1
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    o2, d2 = random_rays(rng, 2048, 256)
    o = np.concatenate([o1, o2]).astype(np.float32)
    d = np.concatenate([d1, d2]).astype(np.float32)
    ref = trace_dense(occ, o, d)
    assert ref["hit"].any() and not ref["hit"].all()
    for use_full in (True, False):
        res = trace(pyr, jnp.asarray(o), jnp.asarray(d), max_steps=4096,
                    use_full=use_full)
        hit = np.asarray(res.hit)
        np.testing.assert_array_equal(hit, ref["hit"])
        np.testing.assert_array_equal(np.asarray(res.face)[hit],
                                      ref["face"][hit])
        np.testing.assert_array_equal(np.asarray(res.axis_coord)[hit],
                                      ref["axis_coord"][hit])


@pytest.mark.full
def test_world_1024_build_and_trace_smoke():
    """1024^3 world (the reference's flagship scale): chunked build + a
    handful of oracle-checked rays."""
    from vvr_tpu.config import WorldConfig
    from vvr_tpu.world.generator import assemble_dense, generate_world
    cfg = WorldConfig(depth=5)
    chunks = generate_world(cfg)
    occ = assemble_dense(chunks, cfg.size)
    pyr = build_pyramid(occ)
    assert pyr.size == 1024
    rng = np.random.default_rng(5)
    o = rng.uniform([200, 150, 200], [800, 400, 800], (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    ref = trace_dense(occ, o, d)
    assert ref["hit"].any()
    res = trace(pyr, jnp.asarray(o), jnp.asarray(d), max_steps=8192,
                use_full=False)
    hit = np.asarray(res.hit)
    np.testing.assert_array_equal(hit, ref["hit"])
    np.testing.assert_array_equal(np.asarray(res.axis_coord)[hit],
                                  ref["axis_coord"][hit])
