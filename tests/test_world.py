"""World model tests: generation determinism, chunk mips, pyramid invariants."""

import numpy as np
import pytest

from vvr_tpu.config import WorldConfig
from vvr_tpu.world.chunk import Chunk, ChunkKind, build_chunk_mips
from vvr_tpu.world.generator import generate_world, assemble_dense, generate_height_field
from vvr_tpu.world.pyramid import build_pyramid, build_pyramid_from_chunks


def test_generation_deterministic():
    cfg = WorldConfig(depth=3)
    h1 = generate_height_field(cfg)
    h2 = generate_height_field(cfg)
    np.testing.assert_array_equal(h1, h2)
    h3 = generate_height_field(WorldConfig(depth=3, seed=7))
    assert not np.array_equal(h1, h3)


def test_world_is_nontrivial(small_world):
    _, chunks, occ = small_world
    frac = occ.mean()
    assert 0.05 < frac < 0.95, f"terrain fraction {frac} degenerate"
    kinds = {c.kind for c in chunks}
    assert ChunkKind.PARTIAL in kinds


def test_chunk_mips_any_all():
    rng = np.random.default_rng(0)
    vox = rng.random((64, 64, 64)) < 0.3
    mips = build_chunk_mips(vox)
    for k in range(1, 4):
        m = 64 >> (2 * k)
        g = vox.reshape(m, 64 // m, m, 64 // m, m, 64 // m)
        # note reshape groups (z,y,x); compare via direct recompute
        any_expect = mips.any_mips[k - 1].reshape(m, 4, m, 4, m, 4).any(axis=(1, 3, 5))
        all_expect = mips.all_mips[k - 1].reshape(m, 4, m, 4, m, 4).all(axis=(1, 3, 5))
        np.testing.assert_array_equal(mips.any_mips[k], any_expect)
        np.testing.assert_array_equal(mips.all_mips[k], all_expect)
    # root
    assert mips.any_mips[3][0, 0, 0] == vox.any()
    assert mips.all_mips[3][0, 0, 0] == vox.all()


def test_chunk_bounds_tight():
    vox = np.zeros((64, 64, 64), bool)
    vox[10, 20, 30] = True      # z=10, y=20, x=30
    vox[11, 22, 33] = True
    mips = build_chunk_mips(vox)
    root_b = mips.bounds[3][0, 0, 0]
    np.testing.assert_array_equal(root_b, [30, 20, 10, 34, 23, 12])


def test_chunk_classification():
    c = Chunk([0, 0, 0], np.zeros((64,) * 3, bool)).rebuild()
    assert c.kind == ChunkKind.EMPTY
    c = Chunk([0, 0, 0], np.ones((64,) * 3, bool)).rebuild()
    assert c.kind == ChunkKind.FULL
    assert c.world_bounds.tolist() == [0, 0, 0, 64, 64, 64]


def test_pyramid_levels_exact(small_world):
    _, _, occ = small_world
    pyr = build_pyramid(occ)
    assert pyr.size == occ.shape[0]
    a0, f0 = pyr.level_bits(0)
    np.testing.assert_array_equal(a0, occ)
    cur_any, cur_full = occ, occ
    for lvl in range(1, pyr.depth + 1):
        m = occ.shape[0] >> (2 * lvl)
        cur_any = cur_any.reshape(m, 4, m, 4, m, 4).any(axis=(1, 3, 5))
        cur_full = cur_full.reshape(m, 4, m, 4, m, 4).all(axis=(1, 3, 5))
        a, f = pyr.level_bits(lvl)
        np.testing.assert_array_equal(a, cur_any)
        np.testing.assert_array_equal(f, cur_full)


def test_pyramid_from_chunks_matches_dense(small_world):
    cfg, chunks, occ = small_world
    p1 = build_pyramid(occ)
    p2 = build_pyramid_from_chunks(chunks, cfg.size)
    np.testing.assert_array_equal(np.asarray(p1.words), np.asarray(p2.words))
    assert p1.bases == p2.bases


@pytest.mark.full
def test_full_implies_any(medium_world):
    _, _, occ = medium_world
    pyr = build_pyramid(occ)
    for lvl in range(1, pyr.depth + 1):
        a, f = pyr.level_bits(lvl)
        assert not (f & ~a).any()


def test_cache_roundtrip(tmp_path, small_world):
    from vvr_tpu.world import cache as cm
    cfg, chunks, occ = small_world
    p = tmp_path / "w.npz"
    cm.save_world(p, chunks, cfg.size)
    loaded = cm.load_world(p)
    assert len(loaded) == len(chunks)
    for a, b in zip(loaded, chunks):
        np.testing.assert_array_equal(a.voxels, b.voxels)
        np.testing.assert_array_equal(a.position, b.position)
        assert a.kind == b.kind


def test_tree_checkpoint_roundtrip(tmp_path, small_world):
    from vvr_tpu.world import cache as cm
    from vvr_tpu.world.pyramid import build_pyramid
    from vvr_tpu.world.tree import bounds_pyramid_from_dense, flatten_tree
    _, _, occ = small_world
    tree = flatten_tree(build_pyramid(occ), bounds_pyramid_from_dense(occ))
    p = tmp_path / "t.npz"
    cm.save_tree(p, tree)
    t2 = cm.load_tree(p)
    np.testing.assert_array_equal(t2.indices, tree.indices)
    np.testing.assert_array_equal(t2.bitmasks, tree.bitmasks)
    np.testing.assert_array_equal(t2.aabbs, tree.aabbs)
    assert t2.level_starts == tree.level_starts
