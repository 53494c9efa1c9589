"""Sky/atmosphere/cloud tests: physical sanity + cubemap round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops import sky


SUN_UP = jnp.asarray(np.array([0.0, 0.8, 0.6]) / np.linalg.norm([0, 0.8, 0.6]))
SUN_DOWN = jnp.asarray(np.array([0.0, -0.5, 0.86]))


def _dirs(n, rng):
    d = rng.normal(size=(n, 3))
    return jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)


def test_sky_daytime_is_blue_up():
    up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    c = np.asarray(sky.sky(jnp.broadcast_to(SUN_UP, (1, 3)), up))
    assert c[0, 2] > c[0, 0] > 0  # blue dominant
    assert np.all(np.isfinite(c))


def test_sky_night_is_dark():
    rng = np.random.default_rng(0)
    d = _dirs(64, rng)
    c = np.asarray(sky.sky(jnp.broadcast_to(SUN_DOWN, d.shape), d))
    assert np.all(np.isfinite(c))
    assert c.mean() < 0.05


def test_sun_disc_bright():
    c_sun = np.asarray(sky.sky(SUN_UP, SUN_UP))
    c_off = np.asarray(sky.sky(SUN_UP, jnp.asarray([0.6, 0.8, 0.0], jnp.float32)))
    assert c_sun.sum() > 50 * c_off.sum()


def test_sun_colour_lerp():
    midday = np.asarray(sky.sun_colour(jnp.asarray([0.0, 1.0, 0.0], jnp.float32)))
    sunset = np.asarray(sky.sun_colour(jnp.asarray([1.0, 0.0, 0.0], jnp.float32)))
    assert midday[2] > sunset[2]  # sunset is orange (low blue)
    assert sunset[0] > sunset[2]


@pytest.mark.full
def test_skybox_roundtrip():
    """sample_skybox must invert the write_skybox face mapping: sampling the
    cubemap in a random direction matches evaluating sky() directly."""
    rng = np.random.default_rng(1)
    box = sky.write_skybox(SUN_UP, 0.0, resolution=64)
    d = _dirs(500, rng)
    sampled = np.asarray(sky.sample_skybox(box, d))
    direct = np.asarray(sky.sky(jnp.broadcast_to(SUN_UP, d.shape), d))
    # nearest sampling at 64^2 -> compare with generous tolerance, excluding
    # directions near the sun disc (huge gradient)
    near_sun = np.asarray(jnp.sum(d * SUN_UP, -1)) > 0.995
    err = np.abs(sampled - direct)[~near_sun]
    rel = err / (np.abs(direct[~near_sun]) + 1e-2)
    assert np.quantile(rel, 0.95) < 0.35, np.quantile(rel, 0.95)


def test_clouds_texture_sane():
    tex = np.asarray(sky.write_clouds(SUN_UP, 0.0, resolution=64))
    assert tex.shape == (64, 64, 4)
    assert np.all(np.isfinite(tex))
    assert 0.0 <= tex[..., 3].min() and tex[..., 3].max() <= 1.0
    assert tex[..., 3].max() > 0.1  # some clouds exist


def test_clouds_sampling_above_plane_only():
    tex = sky.write_clouds(SUN_UP, 0.0, resolution=64)
    pos = jnp.asarray([[0.0, 100.0, 0.0]], jnp.float32)
    up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    down = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    c_up = np.asarray(sky.sample_clouds(tex, up, pos))
    c_down = np.asarray(sky.sample_clouds(tex, down, pos))
    assert c_down.sum() == 0.0  # plane is above
    assert np.all(np.isfinite(c_up))


@pytest.mark.full
def test_miss_shader_blends():
    tex = sky.write_clouds(SUN_UP, 0.0, resolution=32)
    box = sky.write_skybox(SUN_UP, 0.0, resolution=32)
    rng = np.random.default_rng(2)
    d = _dirs(100, rng)
    pos = jnp.zeros((100, 3), jnp.float32)
    c = np.asarray(sky.sample_skybox_and_clouds(box, tex, pos, d))
    assert np.all(np.isfinite(c))


def test_environment_approximations():
    d_up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d_dn = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    sky_c = jnp.asarray([0.2, 0.4, 0.9], jnp.float32)
    gnd_c = jnp.asarray([0.1, 0.08, 0.05], jnp.float32)
    up = np.asarray(sky.environment_diffuse(d_up, sky_c, gnd_c))
    dn = np.asarray(sky.environment_diffuse(d_dn, sky_c, gnd_c))
    np.testing.assert_allclose(up[0], np.asarray(sky_c), atol=1e-6)
    np.testing.assert_allclose(dn[0], np.asarray(gnd_c), atol=1e-6)
    r = jnp.asarray([0.5], jnp.float32)
    spec = np.asarray(sky.environment_specular(d_up, r, sky_c, gnd_c))
    assert np.isfinite(spec).all()
    assert (spec >= 0).all()


def test_sample_clouds_blocked_equals_plain():
    # block_clouds/sample_clouds_blocked are the fast-regime gather form
    # of sample_clouds — values must be IDENTICAL (same texels selected)
    tex = sky.write_clouds(SUN_UP, 0.3, resolution=64)
    blk = sky.block_clouds(tex)
    rng = np.random.default_rng(7)
    d = _dirs(500, rng)
    pos = jnp.asarray(rng.uniform(-500, 500, (500, 3)), jnp.float32)
    a = np.asarray(sky.sample_clouds(tex, d, pos))
    b = np.asarray(sky.sample_clouds_blocked(blk, 64, d, pos))
    np.testing.assert_array_equal(a, b)


def test_sample_skybox_blocked_equals_plain():
    box = sky.write_skybox(SUN_UP, 0.0, resolution=32)
    blk = sky.block_skybox(box)
    rng = np.random.default_rng(8)
    d = _dirs(500, rng)
    a = np.asarray(sky.sample_skybox(box, d))
    b = np.asarray(sky.sample_skybox_blocked(blk, 32, d))
    np.testing.assert_array_equal(a, b)
    # and the combined miss shader
    tex = sky.write_clouds(SUN_UP, 0.0, resolution=32)
    cblk = sky.block_clouds(tex)
    pos = jnp.asarray(rng.uniform(-500, 500, (500, 3)), jnp.float32)
    m1 = np.asarray(sky.sample_skybox_and_clouds(box, tex, pos, d))
    m2 = np.asarray(sky.sample_skybox_and_clouds_blocked(blk, 32, cblk, 32,
                                                         pos, d))
    np.testing.assert_array_equal(m1, m2)
