"""Native C++ layer: builds, loads, and agrees with the NumPy implementations."""

import numpy as np
import pytest

from vvr_tpu import native
from vvr_tpu.render.oracle import trace_dense


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_oracle_matches_numpy(have_native):
    rng = np.random.default_rng(0)
    occ = rng.random((64, 64, 64)) < 0.05
    n = 3000
    o = rng.uniform(0.5, 63.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = native.trace_dense_native(occ, o, d)
    b = trace_dense(occ, o, d, prefer_native=False)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    hit = a["hit"]
    np.testing.assert_array_equal(a["face"][hit], b["face"][hit])
    np.testing.assert_array_equal(a["axis_coord"][hit], b["axis_coord"][hit])
    np.testing.assert_allclose(a["t"][hit], b["t"][hit], rtol=1e-6)


def test_native_pack_bricks_matches(have_native):
    from vvr_tpu.world.pyramid import _pack_node_masks
    rng = np.random.default_rng(1)
    bits = rng.random((16, 16, 16)) < 0.4
    got = native.pack_bricks_native(bits)
    want_lohi = _pack_node_masks(bits)  # (m^3, 2) u32
    want = want_lohi[:, 0].astype(np.uint64) | (
        want_lohi[:, 1].astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, want)


def test_native_mesher_counts(have_native):
    vox = np.zeros((8, 8, 8), bool)
    vox[2, 3, 4] = True  # single cube: 6 faces, 24 verts, 36 indices
    verts, idx = native.mesh_chunk_native(vox)
    assert len(verts) == 24
    assert len(idx) == 36
    # all triangles reference valid vertices and lie on the cube surface
    assert idx.max() < len(verts)
    assert verts[:, 0].min() >= 4 and verts[:, 0].max() <= 5
    assert verts[:, 1].min() >= 3 and verts[:, 1].max() <= 4
    assert verts[:, 2].min() >= 2 and verts[:, 2].max() <= 3


def test_native_mesher_watertight_counts(have_native):
    rng = np.random.default_rng(2)
    vox = rng.random((16, 16, 16)) < 0.3
    out = native.mesh_chunk_native(vox)
    assert out is not None
    verts, idx = out
    # exposed face count from numpy
    p = np.pad(vox, 1)
    faces = 0
    shifts = [(0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0), (1, 0, 0), (-1, 0, 0)]
    for dz, dy, dx in shifts:
        nb = p[1 + dz:17 + dz, 1 + dy:17 + dy, 1 + dx:17 + dx]
        faces += int((vox & ~nb).sum())
    assert len(idx) == faces * 6
    assert len(verts) == faces * 4
