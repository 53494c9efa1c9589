"""Sparse voxel 64-tree — reference-layout flattened buffers.

Rebuild of the reference's `SparseVoxelOctree` + `convert_to_buffers`
(src/voxel/sparse.rs:13-205, 318-513): the tree of 4x4x4-branching nodes is
flattened in BFS (level) order into three parallel buffers

  indices  : u32  — base index of the node's first child; FULL_NODE
             (0xFFFFFFFE) marks a full subtree (sparse.rs:389), BOTTOM_NODE
             (0xFFFFFFFF) marks height-1 nodes whose children are raw voxels
             (the reference leaves a dangling next-index there, sparse.rs:356;
             we store the sentinel — never dereferenced by any traversal)
  bitmasks : u64  — which of the 64 children exist (any-occupancy)
  aabbs    : u64  — tight world AABB, 10 bits/axis min & max, both clamped to
             [0, size-1], flag nibble zero (pack_aabb_bounds, sparse.rs:299-311)

and child addressing follows the popcount-prefix rule: the flat index of child
at bit b equals base_child_index + popcount(bitmask & ((1 << b) - 1))
(sparse.rs:405-446, consumed by ray_stuff_other.slang:216-224).

Unlike the reference's per-node BFS queue (a Rust loop over millions of
nodes), the flatten here is vectorized per level: node cells are derived from
the occupancy pyramid (nodes = any-cells without a full ancestor; empty
chunks never register, sparse.rs:48-51), child order is (parent BFS order,
bit index), and base indices come from an exclusive cumsum of child counts.

These buffers are the parity/checkpoint artifact and oracle input; the hot
TPU traversal walks the pyramid instead (see ARCHITECTURE.md).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from vvr_tpu.world.chunk import CHUNK_SIZE, Chunk
from vvr_tpu.world.pyramid import OccupancyPyramid

FULL_NODE = np.uint32(0xFFFFFFFF - 1)   # src/voxel/util.rs:4
BOTTOM_NODE = np.uint32(0xFFFFFFFF)     # src/voxel/util.rs:3

# 64 child offsets in bit-index order (bit = x | y<<2 | z<<4)
_OFFS = np.array([[b & 3, (b >> 2) & 3, (b >> 4) & 3] for b in range(64)],
                 np.int32)


@dataclasses.dataclass
class SparseVoxelTree:
    indices: np.ndarray        # (N,) uint32
    bitmasks: np.ndarray       # (N,) uint64
    aabbs: np.ndarray          # (N,) uint64
    level_starts: dict         # height -> first BFS index of that height
    depth: int
    metrics: dict

    @property
    def num_nodes(self) -> int:
        return len(self.indices)


def bounds_pyramid_from_dense(occ: np.ndarray) -> list[np.ndarray]:
    """Tight world-space AABBs per any-cell for levels 1..depth.
    Returns grids[l] of shape (S_l, S_l, S_l, 6) int32 (min xyz, max xyz
    exclusive); only valid where the any bit is set. Dense path for
    small/medium worlds; chunk-based path below avoids the voxel-level grid."""
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    depth = int(round(np.log2(size) / 2))
    zz, yy, xx = np.meshgrid(*(np.arange(size),) * 3, indexing="ij")
    b = np.stack([xx, yy, zz, xx + 1, yy + 1, zz + 1], -1).astype(np.int32)
    big = np.int32(1 << 20)
    grids = []
    mask = occ
    for _ in range(1, depth + 1):
        m = mask.shape[0] // 4
        gm = mask.reshape(m, 4, m, 4, m, 4)
        gb = b.reshape(m, 4, m, 4, m, 4, 6)
        mins = np.where(gm[..., None], gb[..., :3], big).min(axis=(1, 3, 5))
        maxs = np.where(gm[..., None], gb[..., 3:], -big).max(axis=(1, 3, 5))
        b = np.concatenate([mins, maxs], -1)
        mask = gm.any(axis=(1, 3, 5))
        grids.append(b)
    return grids


def bounds_pyramid_from_chunks(chunks: list[Chunk], size: int) -> list[np.ndarray]:
    """Chunk-mip-based bounds pyramid (levels 1..depth) — never materializes
    voxel-granularity bounds for the whole world."""
    depth = int(round(np.log2(size) / 2))
    big = np.int32(1 << 20)
    grids = []
    for k in range(1, 4):
        s = size >> (2 * k)
        cs = CHUNK_SIZE >> (2 * k)
        g = np.empty((s, s, s, 6), np.int32)
        g[..., :3] = big
        g[..., 3:] = -big
        for c in chunks:
            if c.kind.name == "EMPTY":
                continue
            x, y, z = (int(v) * cs for v in c.position)
            wb = c.mips.bounds[k].copy()
            origin = c.position.astype(np.int32) * CHUNK_SIZE
            wb[..., :3] += origin
            wb[..., 3:] += origin
            g[z:z + cs, y:y + cs, x:x + cs] = wb
        grids.append(g)
    b = grids[-1]
    for _ in range(4, depth + 1):
        m = b.shape[0] // 4
        gb = b.reshape(m, 4, m, 4, m, 4, 6)
        mins = gb[..., :3].min(axis=(1, 3, 5))
        maxs = gb[..., 3:].max(axis=(1, 3, 5))
        b = np.concatenate([mins, maxs], -1)
        grids.append(b)
    return grids


def _pack_aabbs(bmin: np.ndarray, bmax: np.ndarray, size: int) -> np.ndarray:
    """pack_aabb_bounds (sparse.rs:299-311): both min and (exclusive) max are
    clamped to [0, size-1]; 10 bits per axis; flag nibble 0."""
    mn = np.clip(bmin, 0, size - 1).astype(np.uint64)
    mx = np.clip(bmax, 0, size - 1).astype(np.uint64)
    lo = mn[:, 0] | (mn[:, 1] << np.uint64(10)) | (mn[:, 2] << np.uint64(20))
    hi = mx[:, 0] | (mx[:, 1] << np.uint64(10)) | (mx[:, 2] << np.uint64(20))
    return lo | (hi << np.uint64(30))


def surface_area_bitmask(mask: int) -> int:
    """Exposed-face count of the 4x4x4 bitmask (the reference's optional SAH
    metric, src/voxel/sparse.rs:469,524-545)."""
    area = 0
    for b in range(64):
        if not (mask >> b) & 1:
            continue
        x, y, z = b & 3, (b >> 2) & 3, (b >> 4) & 3
        for dx, dy, dz in ((1,0,0),(-1,0,0),(0,1,0),(0,-1,0),(0,0,1),(0,0,-1)):
            nx, ny, nz = x+dx, y+dy, z+dz
            if not (0 <= nx < 4 and 0 <= ny < 4 and 0 <= nz < 4):
                area += 1
            elif not (mask >> (nx | (ny << 2) | (nz << 4))) & 1:
                area += 1
    return area


def flatten_tree(pyr: OccupancyPyramid, bounds: list[np.ndarray],
                 calculate_sah: bool = False) -> SparseVoxelTree:
    """Level-order flatten. `bounds` from bounds_pyramid_from_dense/chunks.
    calculate_sah: add the normalized surface-area metric to metrics (the
    reference's CALCULATE_SAH, sparse.rs:466-476; off by default there too)."""
    t0 = time.monotonic()
    depth = pyr.depth
    size = pyr.size

    any_g = {}
    full_g = {}
    for lvl in range(0, depth + 1):
        a, f = pyr.level_bits(lvl)
        any_g[lvl], full_g[lvl] = a, f

    # per level: cells (M,3) BFS-ordered, full flags, bitmask, child counts
    cells = {depth: np.zeros((1, 3), np.int32)}
    fulls = {depth: np.array([bool(full_g[depth][0, 0, 0])])}

    level_count = {}
    level_nodes = {}
    for lvl in range(depth, 0, -1):
        P = cells[lvl]
        F = fulls[lvl]
        ca = any_g[lvl - 1]
        child_cells = P[:, None, :] * 4 + _OFFS[None, :, :]      # (M,64,3)
        cb = ca[child_cells[..., 2], child_cells[..., 1], child_cells[..., 0]]
        bitmask = np.packbits(cb, axis=1, bitorder="little")     # (M,8) u8
        bitmask = bitmask.view(np.uint64).ravel()
        level_nodes[lvl] = dict(cells=P, full=F, bitmask=bitmask)
        level_count[lvl] = len(P)
        if lvl > 1:
            expand = cb & (~F)[:, None]                          # full: prune
            sel = expand.ravel()
            nxt = child_cells.reshape(-1, 3)[sel]
            cf = full_g[lvl - 1]
            nxt_full = cf[nxt[:, 2], nxt[:, 1], nxt[:, 0]]
            cells[lvl - 1] = nxt
            fulls[lvl - 1] = nxt_full
            level_nodes[lvl]["child_counts"] = expand.sum(axis=1)
        else:
            level_nodes[lvl]["child_counts"] = np.zeros(len(P), np.int64)

    # BFS level starts (root emitted first)
    level_starts = {}
    off = 0
    for lvl in range(depth, 0, -1):
        level_starts[lvl] = off
        off += level_count[lvl]
    total = off

    indices = np.empty(total, np.uint32)
    bitmasks = np.empty(total, np.uint64)
    aabbs = np.empty(total, np.uint64)

    for lvl in range(depth, 0, -1):
        nd = level_nodes[lvl]
        s0 = level_starts[lvl]
        s1 = s0 + level_count[lvl]
        cc = nd["child_counts"]
        if lvl > 1:
            base = level_starts[lvl - 1] + np.concatenate(
                [[0], np.cumsum(cc)[:-1]]).astype(np.uint32)
            base = np.where(nd["full"], FULL_NODE, base)
        else:
            base = np.where(nd["full"], FULL_NODE, BOTTOM_NODE)
        indices[s0:s1] = base
        bitmasks[s0:s1] = nd["bitmask"]
        # bounds: root uses level grid too; level == depth grid is bounds[-1]
        g = bounds[lvl - 1]
        c = nd["cells"]
        bb = g[c[:, 2], c[:, 1], c[:, 0]]
        aabbs[s0:s1] = _pack_aabbs(bb[:, :3], bb[:, 3:], size)

    full_count = int(sum(n["full"].sum() for n in level_nodes.values()))
    set_bits = sum(int(np.unpackbits(n["bitmask"].view(np.uint8)).sum())
                   for n in level_nodes.values())
    metrics = dict(
        nodes=total,
        build_time_s=time.monotonic() - t0,
        full_nodes=full_count,
        avg_bits_set=set_bits / max(total, 1),
        level_counts={lvl: level_count[lvl] for lvl in range(depth, 0, -1)},
    )
    if calculate_sah:
        area_4x4x4 = 4 * 4 * 6
        sah = sum(surface_area_bitmask(int(m)) / area_4x4x4 for m in bitmasks)
        metrics["sah_total"] = sah
        metrics["sah_normalized_pct"] = 100.0 * sah / max(total, 1)
    return SparseVoxelTree(indices, bitmasks, aabbs, level_starts, depth, metrics)


def verify_popcount_invariant(tree: SparseVoxelTree) -> None:
    """The invariant the GPU traversal relies on (sparse.rs:405-446):
    child_flat_index == base + popcount(bitmask & ((1<<bit)-1)) and children
    of node order are contiguous in BFS order. Raises AssertionError."""
    depth = tree.depth
    starts = tree.level_starts
    for lvl in range(depth, 1, -1):
        s0, nxt = starts[lvl], starts[lvl - 1]
        base = tree.indices[s0:nxt].astype(np.int64)
        masks = tree.bitmasks[s0:nxt]
        expand = base != int(FULL_NODE)
        pc = np.array([bin(int(m)).count("1") for m in masks], np.int64)
        pc = np.where(expand, pc, 0)
        # children of consecutive expandable nodes are contiguous in BFS
        # order starting at the next level's first index...
        expected = nxt + np.concatenate([[0], np.cumsum(pc)[:-1]])
        np.testing.assert_array_equal(base[expand], expected[expand])
        # ...and they exactly fill the next level
        n_children = int(pc.sum())
        next_end = starts[lvl - 2] if lvl - 2 in starts else tree.num_nodes
        assert n_children == next_end - nxt, (lvl, n_children, next_end - nxt)
        # per-child popcount-prefix rule on a sample of nodes
        rng = np.random.default_rng(0)
        sample = rng.choice(len(base), min(64, len(base)), replace=False)
        for i in sample:
            if not expand[i]:
                continue
            m = int(masks[i])
            k = 0
            for b in range(64):
                if (m >> b) & 1:
                    prefix = bin(m & ((1 << b) - 1)).count("1")
                    assert prefix == k
                    k += 1
