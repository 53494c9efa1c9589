"""Post-processing tests: bilinear sampler, bloom chain, compositor."""

import jax.numpy as jnp
import numpy as np

from vvr_tpu.ops import post


def test_bilinear_sample_identity_at_centers():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((8, 16, 4)), jnp.float32)
    # texel centers: uv = (k+0.5)/res
    u = (jnp.arange(16, dtype=jnp.float32) + 0.5) / 16
    v = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8
    vv, uu = jnp.meshgrid(v, u, indexing="ij")
    out = np.asarray(post.bilinear_sample(img, uu, vv))
    np.testing.assert_allclose(out, np.asarray(img), rtol=1e-6)


def test_bilinear_sample_interpolates():
    img = jnp.asarray([[0.0, 1.0]], jnp.float32)[..., None] * jnp.ones((1, 1, 4))
    mid = np.asarray(post.bilinear_sample(img, jnp.asarray(0.5), jnp.asarray(0.5)))
    np.testing.assert_allclose(mid, 0.5, atol=1e-6)


def test_bloom_threshold():
    # dark image (length <= 0.6 everywhere) -> no bloom at all
    dark = jnp.full((64, 64, 4), 0.1, jnp.float32)
    b = np.asarray(post.bloom_pyramid(dark))
    np.testing.assert_allclose(b, 0.0, atol=1e-6)
    # one bright spot blooms outward
    img = jnp.zeros((64, 64, 4), jnp.float32).at[32, 32].set(50.0)
    b2 = np.asarray(post.bloom_pyramid(img))
    assert b2.shape == (16, 16, 4)
    assert b2.max() > 0
    assert np.isfinite(b2).all()


def test_bloom_mip_count():
    assert post.bloom_mip_count(800, 600) == 7  # ilog2(600)=9 -> 7
    assert post.bloom_mip_count(1920, 1080) == 8


def test_composite_upscale_and_gamma():
    rendered = jnp.full((30, 40, 4), 0.5, jnp.float32)
    bloom = jnp.zeros((7, 10, 4), jnp.float32)
    img = np.asarray(post.composite(rendered, bloom, 60, 80))
    assert img.shape == (60, 80, 3)
    assert img.dtype == np.uint8
    # aces(0.5)~0.43 -> gamma -> ~0.68
    expect = (np.clip((0.5 * (2.51 * 0.5 + 0.03)) / (0.5 * (2.43 * 0.5 + 0.59) + 0.14), 0, 1)) ** (1 / 2.2)
    np.testing.assert_allclose(img[0, 0] / 255.0, expect, atol=0.01)


def test_composite_miss_alpha_contributes_to_bloom():
    # the reference's sky alpha (10) pushes length above the threshold even
    # when rgb is dim — sky blooms
    img = jnp.zeros((64, 64, 4), jnp.float32).at[:, :, 3].set(10.0)
    img = img.at[:, :, 0].set(0.2)
    b = np.asarray(post.bloom_pyramid(img))
    assert b[..., 0].max() > 0.0
