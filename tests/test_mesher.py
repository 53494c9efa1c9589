"""Mesher + AO-solver tests."""

import jax.numpy as jnp
import numpy as np

from vvr_tpu.world.chunk import Chunk
from vvr_tpu.world.mesher import (VoxelMeshBuffers, mesh_chunk_surface_nets,
                                   mesh_voxels_blocky)
from vvr_tpu.ops.shade import ao_solver


def test_numpy_mesher_single_cube():
    vox = np.zeros((8, 8, 8), bool)
    vox[2, 3, 4] = True
    v, i = mesh_voxels_blocky(vox)
    assert len(v) == 24 and len(i) == 36
    assert v[:, 0].min() == 4 and v[:, 0].max() == 5


def test_numpy_matches_native_counts():
    from vvr_tpu import native
    rng = np.random.default_rng(0)
    vox = rng.random((16, 16, 16)) < 0.3
    v1, i1 = mesh_voxels_blocky(vox)
    out = native.mesh_chunk_native(vox)
    if out is not None:
        v2, i2 = out
        assert len(v1) == len(v2) and len(i1) == len(i2)
        # same set of vertices (order differs between the two passes)
        s1 = set(map(tuple, v1.tolist()))
        s2 = set(map(tuple, v2.tolist()))
        assert s1 == s2


def test_world_mesh_buffers():
    c1 = Chunk([0, 0, 0], np.zeros((64,) * 3, bool))
    c1.voxels[0, 0, 0] = True
    c1.rebuild()
    c2 = Chunk([1, 0, 0], np.zeros((64,) * 3, bool))
    c2.voxels[5, 5, 5] = True
    c2.rebuild()
    empty = Chunk([0, 1, 0], np.zeros((64,) * 3, bool)).rebuild()
    buf = VoxelMeshBuffers.build([c1, c2, empty], prefer_native=False,
                                 scheme="blocky")
    assert len(buf.ranges) == 2            # empty chunk skipped
    assert len(buf.vertices) == 48
    assert len(buf.indices) == 72
    # second chunk's verts are offset by its world origin (x+64)
    r2 = buf.ranges[1]
    v2 = buf.vertices[r2.vertex_offset:]
    assert v2[:, 0].min() >= 64 + 5


def test_export_obj(tmp_path):
    c = Chunk([0, 0, 0], np.zeros((64,) * 3, bool))
    c.voxels[1, 1, 1] = True
    c.rebuild()
    buf = VoxelMeshBuffers.build([c], prefer_native=False, scheme="blocky")
    path = tmp_path / "mesh.obj"
    buf.export_obj(path)
    text = path.read_text()
    assert text.count("\nf ") + text.startswith("f ") == 12  # 12 tris
    assert text.count("v ") >= 24


def test_ao_solver_open_vs_walled():
    # hit on top face (+y) of a floor block; a wall occludes one side
    occ = np.zeros((8, 8, 8), bool)
    occ[0, 2, :] = True          # floor row at y=2? occ[z,y,x]: y=2 plane...
    occ = np.zeros((8, 8, 8), bool)
    occ[2, 2, 4] = True          # the block we stand on (x=4,y=2,z=2)
    occ[2, 3, 5] = True          # wall block beside the hit face (y=3,x=5)

    def is_solid(p):
        p = jnp.clip(p, 0, 7)
        return jnp.asarray(occ)[p[..., 2], p[..., 1], p[..., 0]]

    block = jnp.asarray([[4, 2, 2]], jnp.int32)
    face = jnp.asarray([1], jnp.int32)               # y face
    sgn = jnp.asarray([[1.0, -1.0, 1.0]], jnp.float32)  # ray going down
    # uv near the wall side (x high) vs far side
    ao_near = ao_solver(is_solid, block, jnp.asarray([[0.9, 0.0, 0.5]]), face, sgn)
    ao_far = ao_solver(is_solid, block, jnp.asarray([[0.1, 0.0, 0.5]]), face, sgn)
    assert float(ao_near[0]) < float(ao_far[0])
    assert 0.0 <= float(ao_near[0]) <= 1.0
    # fully open sky: no occlusion
    occ2 = np.zeros((8, 8, 8), bool)

    def open_solid(p):
        return jnp.zeros(p.shape[:-1], bool)

    ao_open = ao_solver(open_solid, block, jnp.asarray([[0.5, 0.0, 0.5]]), face, sgn)
    assert float(ao_open[0]) == 1.0


def _surface_nets_bruteforce(vox):
    """Direct triple-loop port of the reference rule (meshes.rs:87-161):
    vertex per mixed 2x2x2 cell at center+0.5; quads across interior face
    transitions with dir = is_set ^ (axis == 1). Returns (verts set as
    tuples, list of triangles as vertex-POSITION triples)."""
    s = vox.shape[0]

    def get(x, y, z):
        return bool(vox[z, y, x])

    verts = {}
    for x in range(s - 1):
        for y in range(s - 1):
            for z in range(s - 1):
                cnt = sum(get(x + dx, y + dy, z + dz)
                          for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))
                if 0 < cnt < 8:
                    verts[(x, y, z)] = (x + 0.5, y + 0.5, z + 0.5)
    offs = {0: [(0, 0, 0), (0, 1, 0), (0, 0, 1), (0, 1, 1)],
            1: [(0, 0, 0), (1, 0, 0), (0, 0, 1), (1, 0, 1)],
            2: [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)]}
    order_a, order_b = [0, 1, 2, 2, 1, 3], [1, 0, 2, 1, 2, 3]
    tris = []
    for x in range(1, s - 1):
        for y in range(1, s - 1):
            for z in range(1, s - 1):
                for axis in range(3):
                    nxt = [x, y, z]
                    nxt[axis] += 1
                    a, b = get(x, y, z), get(*nxt)
                    if a == b:
                        continue
                    quad = []
                    for o in offs[axis]:
                        cell = tuple(n - 1 + d for n, d in zip(nxt, o))
                        quad.append(verts[cell])
                    order = order_a if (a ^ (axis == 1)) else order_b
                    for k in range(0, 6, 3):
                        tris.append(tuple(quad[order[k + j]] for j in range(3)))
    return set(verts.values()), tris


def test_surface_nets_single_voxel():
    vox = np.zeros((8, 8, 8), bool)
    vox[2, 3, 4] = True            # z=2, y=3, x=4
    v, i = mesh_chunk_surface_nets(vox)
    # 8 mixed cells around the voxel -> 8 vertices at centers + 0.5
    assert len(v) == 8 and len(i) == 36      # 6 quads = 12 tris
    expect = {(x + 0.5, y + 0.5, z + 0.5)
              for x in (3, 4) for y in (2, 3) for z in (1, 2)}
    assert set(map(tuple, v.tolist())) == expect


def test_surface_nets_matches_bruteforce():
    rng = np.random.default_rng(3)
    vox = rng.random((10, 10, 10)) < 0.35
    v, i = mesh_chunk_surface_nets(vox)
    bf_verts, bf_tris = _surface_nets_bruteforce(vox)
    assert set(map(tuple, v.tolist())) == bf_verts
    got_tris = {tuple(map(tuple, v[i[k:k + 3]].tolist()))
                for k in range(0, len(i), 3)}
    assert got_tris == {tuple(map(tuple, t)) for t in
                        ((tuple(p) for p in tri) for tri in bf_tris)}
    # winding preserved: compare ordered triples, not just vertex sets
    assert len(got_tris) == len(set(map(tuple, bf_tris)))


def test_surface_nets_differs_from_blocky():
    vox = np.zeros((8, 8, 8), bool)
    vox[2, 3, 4] = True
    bv, bi = mesh_voxels_blocky(vox)
    sv, si = mesh_chunk_surface_nets(vox)
    assert len(bv) != len(sv)      # 24 duplicated corners vs 8 cell centers
