"""PBR shading tests: energy sanity, face normals, material rules, ACES."""

import jax.numpy as jnp
import numpy as np

from vvr_tpu.ops import shade


def _n(v):
    v = np.asarray(v, np.float32)
    return jnp.asarray(v / np.linalg.norm(v))


def test_face_normal_opposes_ray():
    # face k normal = -(face==k) * sign (other.slang:62-64)
    f = jnp.asarray([0, 1, 2, 0], jnp.int32)
    sgn = jnp.asarray([[1, 1, 1], [1, -1, 1], [1, 1, -1], [-1, 1, 1]], jnp.float32)
    n = np.asarray(shade.get_face_normal(f, sgn))
    np.testing.assert_array_equal(n, [[-1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]])


def test_lighting_sunlit_vs_shadowed():
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2, jnp.float32)
    sun = jnp.broadcast_to(_n([0.2, 0.9, 0.1]), (2, 3))
    view = jnp.broadcast_to(_n([0.0, 0.7, -0.7]), (2, 3))
    albedo = jnp.ones((2, 3), jnp.float32)
    rough = jnp.full((2,), 0.8, jnp.float32)
    metal = jnp.zeros((2,), jnp.float32)
    vis = jnp.ones((2,), jnp.float32)
    shadows = jnp.asarray([1.0, 0.0], jnp.float32)
    sun_col = jnp.full((3,), 3.0, jnp.float32)
    out = np.asarray(shade.lighting(jnp.zeros((2, 3)), albedo, n, rough, metal,
                                    vis, shadows, view, sun, sun_col))
    assert np.all(np.isfinite(out))
    assert out[0].sum() > 4 * out[1].sum()      # shadowed is much darker
    assert out[1].sum() > 0                      # ambient survives shadow


def test_lighting_normal_facing_away_is_ambient_only():
    n = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    sun = jnp.broadcast_to(_n([0.0, 1.0, 0.0]), (1, 3))
    view = jnp.broadcast_to(_n([0.0, -0.7, -0.7]), (1, 3))
    out = np.asarray(shade.lighting(
        jnp.zeros((1, 3)), jnp.ones((1, 3)), n,
        jnp.full((1,), 0.8), jnp.zeros((1,)), jnp.ones((1,)),
        jnp.ones((1,)), view, sun, jnp.full((3,), 3.0)))
    ambient = 0.2 * 0.2  # flat ambient * 0.2 (pbr.slang:131,141) times kd<1
    assert out.max() <= ambient + 1e-3


def test_material_rules():
    bp = jnp.asarray([[10, 5, 5], [200, 5, 5]], jnp.int32)
    albedo, rough, metal, special = shade.material_at(bp, 256)
    albedo = np.asarray(albedo)
    np.testing.assert_allclose(albedo[0], 1.0)          # x <= size/2 -> white
    assert (albedo[1] > 0.5).all() and (albedo[1] < 1.0).any()  # hash colour
    assert np.allclose(np.asarray(rough), 0.8)
    assert np.allclose(np.asarray(metal), 0.0)
    assert np.allclose(np.asarray(special), 0.0)


def test_material_mirror_rule():
    rng = np.random.default_rng(0)
    bp = jnp.asarray(rng.integers(0, 256, (512, 3)), jnp.int32)
    _, _, metal, special = shade.material_at(bp, 256, mirror_materials=True)
    mirrors = np.asarray((special > 0.8) & (metal > 0))
    assert 0 < mirrors.sum() < 512  # some but not all blocks are mirrors


def test_aces_range_and_monotonic():
    x = jnp.linspace(0.0, 20.0, 100)[:, None] * jnp.ones((1, 3))
    y = np.asarray(shade.aces(x))
    assert y.min() >= 0.0 and y.max() <= 1.0
    assert np.all(np.diff(y[:, 0]) >= -1e-6)
    assert shade.aces(jnp.zeros(3))[0] < 0.01


def test_specular_no_nan_degenerate():
    # grazing/degenerate geometry must not produce NaN (slang guards with
    # select(isinf(tmp), 1000, clamp(...)), pbr.slang:58-59)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    v = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)   # orthogonal view
    l = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    h = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    s = np.asarray(shade.specular(jnp.full((1, 3), 0.04), jnp.full((1,), 0.0),
                                  v, l, n, h))
    assert np.all(np.isfinite(s))
    assert s.max() <= 1000.0
