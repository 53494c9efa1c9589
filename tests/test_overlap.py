"""AO overlap-query library tests (ops/overlap.py) vs a brute-force NumPy
oracle implementing the reference pseudocode (ray_stuff_other.slang:310-520,
including the overlap-volume formula's sign quirk)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops.overlap import (cube_overlap_density,
                                 cube_overlap_density_svo, overlap_ao,
                                 planar_overlap_density, pyramid_is_solid,
                                 volume_aabb_aabb_overlap)
from vvr_tpu.world.pyramid import build_brick_pyramid


def _overlap_np(amin, center, half):
    bmin, bmax = center - half, center + half
    mx = np.maximum(amin, bmin)
    mn = np.minimum(amin + 1, bmax)
    v = mx - mn
    return max(-v[0] * v[1] * v[2], 0.0)


def _cube_density_np(occ, center, half):
    k = int(np.ceil(half))
    s = 0.0
    size = occ.shape[0]
    for x in range(-k, k + 1):
        for y in range(-k, k + 1):
            for z in range(-k, k + 1):
                pos = np.trunc(center + np.array([x, y, z], np.float32)
                               ).astype(int)
                if np.all(pos >= 0) and np.all(pos < size) \
                        and occ[pos[2], pos[1], pos[0]]:
                    s += _overlap_np(pos.astype(np.float32), center, half)
    return s / (2 * half) ** 3


def _planar_density_np(occ, center, half, axis):
    uv = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[axis]
    k = int(np.ceil(half))
    s = 0.0
    size = occ.shape[0]
    for u in range(-k, k + 1):
        for v in range(-k, k + 1):
            off = np.zeros(3, np.float32)
            off[uv[0]] = u
            off[uv[1]] = v
            pos = np.trunc(center + off).astype(int)
            if np.all(pos >= 0) and np.all(pos < size) \
                    and occ[pos[2], pos[1], pos[0]]:
                s += _overlap_np(pos.astype(np.float32), center, half)
    return s / (2 * half) ** 2


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    occ = rng.random((16, 16, 16)) < 0.3
    return occ, build_brick_pyramid(occ)


def test_is_solid_matches_grid(scene):
    occ, pyr = scene
    rng = np.random.default_rng(1)
    pos = rng.integers(-2, 18, (256, 3))
    got = np.asarray(pyramid_is_solid(pyr, jnp.asarray(pos)))
    for p, g in zip(pos, got):
        inb = np.all(p >= 0) and np.all(p < 16)
        assert g == (inb and bool(occ[p[2], p[1], p[0]]))


def test_volume_overlap_basic():
    amin = jnp.asarray([[2, 2, 2]], jnp.int32)
    # cube centered on the voxel, half 0.5 -> full unit overlap
    v = volume_aabb_aabb_overlap(amin, amin + 1,
                                 jnp.asarray([[2.5, 2.5, 2.5]]), 0.5)
    assert np.isclose(float(v[0]), 1.0)
    # half overlap in x
    v = volume_aabb_aabb_overlap(amin, amin + 1,
                                 jnp.asarray([[3.0, 2.5, 2.5]]), 0.5)
    assert np.isclose(float(v[0]), 0.5)


@pytest.mark.full
@pytest.mark.parametrize("half", [0.8, 1.5, 2.4])
def test_cube_density_vs_oracle(scene, half):
    occ, pyr = scene
    rng = np.random.default_rng(2)
    centers = rng.uniform(1.0, 15.0, (32, 3)).astype(np.float32)
    got = np.asarray(cube_overlap_density(pyr, jnp.asarray(centers), half))
    want = [_cube_density_np(occ, c, half) for c in centers]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_planar_density_vs_oracle(scene):
    occ, pyr = scene
    rng = np.random.default_rng(3)
    centers = rng.uniform(1.0, 15.0, (32, 3)).astype(np.float32)
    axes = rng.integers(0, 3, 32)
    got = np.asarray(planar_overlap_density(
        pyr, jnp.asarray(centers), 0.8, jnp.asarray(axes, jnp.int32)))
    want = [_planar_density_np(occ, c, 0.8, int(a))
            for c, a in zip(centers, axes)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.full
def test_svo_variant_equals_svt(scene):
    occ, pyr = scene
    rng = np.random.default_rng(4)
    centers = rng.uniform(2.0, 14.0, (16, 3)).astype(np.float32)
    a = np.asarray(cube_overlap_density_svo(pyr, jnp.asarray(centers), 1.5))
    b = np.asarray(cube_overlap_density(pyr, jnp.asarray(centers), 1.5))
    np.testing.assert_allclose(a, b)


def test_overlap_ao_range_and_signal(scene):
    occ, pyr = scene
    # a point deep inside solid region vs high above: occluded < open
    occ2 = np.zeros((16, 16, 16), bool)
    occ2[2, :, :] = True          # floor at z=2 (occ[z,y,x])
    occ2[3:8, 8, 8] = True        # a pillar next to one sample
    pyr2 = build_brick_pyramid(occ2)
    world = jnp.asarray([[8.3, 8.3, 3.0], [2.0, 2.0, 3.0]], jnp.float32)
    normal = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    face = jnp.asarray([2, 2], jnp.int32)
    ao = np.asarray(overlap_ao(pyr2, world, normal, face))
    assert np.all((ao >= 0) & (ao <= 1))
    assert ao[0] < ao[1]          # beside the pillar -> darker
