"""Property tests for the SVO64 flattener — the popcount invariant the GPU
traversal relies on (SURVEY.md §4: 'exactly a property test waiting to be
written'; reference debug_asserts at src/voxel/sparse.rs:341-348,405-446)."""

import numpy as np
import pytest

from vvr_tpu.world.pyramid import build_pyramid
from vvr_tpu.world.tree import (
    FULL_NODE, BOTTOM_NODE, bounds_pyramid_from_dense,
    bounds_pyramid_from_chunks, flatten_tree, verify_popcount_invariant,
)


def make_tree(occ):
    pyr = build_pyramid(occ)
    return flatten_tree(pyr, bounds_pyramid_from_dense(occ))


def test_flatten_random_scene():
    rng = np.random.default_rng(10)
    occ = rng.random((64, 64, 64)) < 0.2
    tree = make_tree(occ)
    verify_popcount_invariant(tree)
    assert tree.num_nodes > 1
    # root is node 0 and its children start at index 1 (trace_shi enters with
    # base_index=1, ray_stuff_other.slang:436)
    assert tree.level_starts[tree.depth] == 0
    assert int(tree.indices[0]) in (1, int(FULL_NODE))


def test_flatten_full_world():
    occ = np.ones((16, 16, 16), bool)
    tree = make_tree(occ)
    assert tree.num_nodes == 1
    assert int(tree.indices[0]) == int(FULL_NODE)
    assert int(tree.bitmasks[0]) == 0xFFFFFFFFFFFFFFFF


def test_flatten_empty_world():
    occ = np.zeros((16, 16, 16), bool)
    tree = make_tree(occ)
    assert tree.num_nodes == 1
    assert int(tree.bitmasks[0]) == 0


def test_full_subtree_pruned():
    occ = np.zeros((64, 64, 64), bool)
    occ[0:16, 0:16, 0:16] = True   # full level-2 cell
    occ[32, 32, 32] = True          # lone voxel elsewhere
    tree = make_tree(occ)
    verify_popcount_invariant(tree)
    # the full 16^3 subtree contributes exactly one FULL_NODE at height 2
    h2 = slice(tree.level_starts[2], tree.level_starts[1])
    n_full = int((tree.indices[h2] == FULL_NODE).sum())
    assert n_full == 1
    # height-1 nodes carry the BOTTOM sentinel (children are raw voxels)
    h1 = tree.indices[tree.level_starts[1]:]
    assert set(np.unique(h1)) <= {int(BOTTOM_NODE), int(FULL_NODE)}


def test_aabb_packing_bounds():
    occ = np.zeros((64, 64, 64), bool)
    occ[10, 20, 30] = True  # z=10, y=20, x=30
    tree = make_tree(occ)
    root = int(tree.aabbs[0])
    mn = (root & 1023, (root >> 10) & 1023, (root >> 20) & 1023)
    mx = ((root >> 30) & 1023, (root >> 40) & 1023, (root >> 50) & 1023)
    assert mn == (30, 20, 10)
    assert mx == (31, 21, 11)  # exclusive max, clamped semantics of reference


def test_terrain_tree_invariant(small_world):
    cfg, chunks, occ = small_world
    pyr = build_pyramid(occ)
    tree = flatten_tree(pyr, bounds_pyramid_from_dense(occ))
    verify_popcount_invariant(tree)
    # chunk-based bounds path agrees with dense path
    b2 = bounds_pyramid_from_chunks(chunks, cfg.size)
    tree2 = flatten_tree(pyr, b2)
    np.testing.assert_array_equal(tree.aabbs, tree2.aabbs)
    np.testing.assert_array_equal(tree.indices, tree2.indices)


def test_bitmask_matches_any_bits():
    rng = np.random.default_rng(11)
    occ = rng.random((16, 16, 16)) < 0.3
    pyr = build_pyramid(occ)
    tree = flatten_tree(pyr, bounds_pyramid_from_dense(occ))
    # height-1 node bitmasks are the raw voxel bits of their 4^3 block
    a1, _ = pyr.level_bits(1)
    h1_cells = np.argwhere(a1)  # [z,y,x] — includes cells under full parents
    # root bitmask = any bits of level (depth-1)
    ad, _ = pyr.level_bits(pyr.depth - 1)
    expect_root = 0
    for b in range(64):
        x, y, z = b & 3, (b >> 2) & 3, (b >> 4) & 3
        if ad[z, y, x]:
            expect_root |= 1 << b
    assert int(tree.bitmasks[0]) == expect_root


def test_sah_metric():
    from vvr_tpu.world.tree import surface_area_bitmask
    assert surface_area_bitmask(0) == 0
    assert surface_area_bitmask(1) == 6                 # single voxel
    assert surface_area_bitmask((1 << 64) - 1) == 96    # full 4^3: 16*6
    occ = np.zeros((16, 16, 16), bool)
    occ[0, 0, 0] = True
    pyr = build_pyramid(occ)
    tree = flatten_tree(pyr, bounds_pyramid_from_dense(occ), calculate_sah=True)
    assert tree.metrics["sah_total"] > 0
