"""Mesher + AO-solver tests."""

import jax.numpy as jnp
import numpy as np

from vvr_tpu.world.chunk import Chunk
from vvr_tpu.world.mesher import VoxelMeshBuffers, mesh_voxels_numpy
from vvr_tpu.ops.shade import ao_solver


def test_numpy_mesher_single_cube():
    vox = np.zeros((8, 8, 8), bool)
    vox[2, 3, 4] = True
    v, i = mesh_voxels_numpy(vox)
    assert len(v) == 24 and len(i) == 36
    assert v[:, 0].min() == 4 and v[:, 0].max() == 5


def test_numpy_matches_native_counts():
    from vvr_tpu import native
    rng = np.random.default_rng(0)
    vox = rng.random((16, 16, 16)) < 0.3
    v1, i1 = mesh_voxels_numpy(vox)
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
    buf = VoxelMeshBuffers.build([c1, c2, empty], prefer_native=False)
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
    buf = VoxelMeshBuffers.build([c], prefer_native=False)
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
