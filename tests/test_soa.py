"""SoA shading-tail helpers vs their AoS originals.

The round-4 frame profile showed (N, k) tiny-minor-axis intermediates run
at k/128 lane utilization on TPU, so the full-width tail computes SoA
(vvr_tpu/ops/{shade,sky}.py, utils/hash.py). These tests pin the SoA
variants to the AoS originals: identical up to reassociation ulps (the
per-channel formulas reassociate dot products), asserted at tight float32
tolerance, with exact equality where the op sequence is unchanged.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops import shade, sky
from vvr_tpu.utils import hash as vhash

pytestmark = pytest.mark.smoke


def _rand(n, rng, lo=-2.0, hi=2.0):
    return jnp.asarray(rng.uniform(lo, hi, n).astype(np.float32))


def test_hash33_soa_matches():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-500, 500, (4096, 3)).astype(np.float32))
    aos = np.asarray(vhash.hash33(p))
    r, g, b = vhash.hash33_soa(p[:, 0], p[:, 1], p[:, 2])
    soa = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    np.testing.assert_allclose(aos, soa, atol=2e-7)


def test_hash13_soa_matches():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-500, 500, (4096, 3)).astype(np.float32))
    aos = np.asarray(vhash.hash13(p))
    soa = np.asarray(vhash.hash13_soa(p[:, 0], p[:, 1], p[:, 2]))
    np.testing.assert_allclose(aos, soa, atol=2e-7)


def test_per_block_colour_soa_matches():
    rng = np.random.default_rng(2)
    bp = jnp.asarray(rng.integers(0, 256, (4096, 3)).astype(np.int32))
    aos = np.asarray(vhash.per_block_unique_colour(bp.astype(jnp.float32)))
    r, g, b = vhash.per_block_unique_colour_soa(bp[:, 0], bp[:, 1], bp[:, 2])
    soa = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    np.testing.assert_allclose(aos, soa, atol=1e-6)


def test_material_at_soa_matches():
    rng = np.random.default_rng(3)
    bp = jnp.asarray(rng.integers(0, 256, (4096, 3)).astype(np.int32))
    alb, rough, metal, _sp = shade.material_at(bp, 256)
    r, g, b = shade.material_at_soa(bp[:, 0], bp[:, 1], bp[:, 2], 256)
    soa = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    np.testing.assert_allclose(np.asarray(alb), soa, atol=1e-6)


def test_get_face_normal_soa_matches():
    rng = np.random.default_rng(4)
    face = jnp.asarray(rng.integers(0, 3, 4096).astype(np.int32))
    sgn = jnp.asarray(np.where(rng.random((4096, 3)) < 0.5, -1.0,
                               1.0).astype(np.float32))
    aos = np.asarray(shade.get_face_normal(face, sgn))
    nx, ny, nz = shade.get_face_normal_soa(face, sgn[:, 0], sgn[:, 1],
                                           sgn[:, 2])
    soa = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], -1)
    np.testing.assert_array_equal(aos, soa)  # -0.0 == 0.0 under ==


def test_lighting_soa_matches_m_zero():
    rng = np.random.default_rng(5)
    n = 4096
    alb = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    view = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)
    sun = np.array([0.3, 0.8, -0.52], np.float32)
    sun /= np.linalg.norm(sun)
    sun_j = jnp.asarray(sun)
    vis = jnp.asarray(rng.random(n).astype(np.float32))
    shad = jnp.asarray(rng.random(n).astype(np.float32))
    scol = jnp.asarray(np.array([3.1, 2.9, 2.2], np.float32))
    aos = np.asarray(shade.lighting(
        jnp.zeros((n, 3)), alb, nrm, jnp.float32(0.8), jnp.float32(0.0),
        vis, shad, view, jnp.broadcast_to(sun_j, (n, 3)), scol))
    r, g, b = shade.lighting_soa(
        (alb[:, 0], alb[:, 1], alb[:, 2]),
        (nrm[:, 0], nrm[:, 1], nrm[:, 2]), jnp.float32(0.8), vis, shad,
        (view[:, 0], view[:, 1], view[:, 2]), sun_j, scol)
    soa = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    np.testing.assert_allclose(aos, soa, rtol=2e-5, atol=2e-6)


def test_sample_skybox_blocked_soa_matches():
    rng = np.random.default_rng(6)
    skybox = jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32))
    blk = sky.block_skybox(skybox)
    d = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    aos = np.asarray(sky.sample_skybox_blocked(blk, 32, d))
    r, g, b = sky.sample_skybox_blocked_soa(blk, 32, d[:, 0], d[:, 1],
                                            d[:, 2])
    soa = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    np.testing.assert_array_equal(aos, soa)


def test_sample_clouds_blocked_soa_matches():
    rng = np.random.default_rng(7)
    clouds = jnp.asarray(rng.random((64, 64, 4)).astype(np.float32))
    blk = sky.block_clouds(clouds)
    d = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray(rng.uniform(0, 256, (4096, 3)).astype(np.float32))
    aos = np.asarray(sky.sample_clouds_blocked(blk, 64, d, pos))
    soa = sky.sample_clouds_blocked_soa(blk, 64,
                                        (d[:, 0], d[:, 1], d[:, 2]),
                                        pos[:, 0], pos[:, 1], pos[:, 2])
    soa = np.stack([np.asarray(c) for c in soa], -1)
    np.testing.assert_array_equal(aos, soa)

    # constant-direction form (hard shadows: all rays share the sun)
    sun = jnp.asarray(np.array([0.1, 0.7, -0.7], np.float32))
    sun = sun / jnp.linalg.norm(sun)
    aos2 = np.asarray(sky.sample_clouds_blocked(
        blk, 64, jnp.broadcast_to(sun, (4096, 3)), pos))
    soa2 = sky.sample_clouds_blocked_soa(blk, 64, sun, pos[:, 0],
                                         pos[:, 1], pos[:, 2])
    soa2 = np.stack([np.asarray(c) for c in soa2], -1)
    np.testing.assert_array_equal(aos2, soa2)


def test_miss_shader_soa_matches():
    rng = np.random.default_rng(8)
    skybox = jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32))
    clouds = jnp.asarray(rng.random((64, 64, 4)).astype(np.float32))
    sblk = sky.block_skybox(skybox)
    cblk = sky.block_clouds(clouds)
    d = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray(rng.uniform(0, 256, (4096, 3)).astype(np.float32))
    aos = np.asarray(sky.sample_skybox_and_clouds_blocked(
        sblk, 32, cblk, 64, pos, d))
    soa = sky.sample_skybox_and_clouds_blocked_soa(
        sblk, 32, cblk, 64, (pos[:, 0], pos[:, 1], pos[:, 2]),
        d[:, 0], d[:, 1], d[:, 2])
    soa = np.stack([np.asarray(c) for c in soa], -1)
    np.testing.assert_array_equal(aos, soa)
