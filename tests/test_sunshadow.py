"""Sun-space occlusion classifier: `certain` answers must agree with the
dense-DDA oracle (the conservative grids may only claim what the exact
trace confirms), and the ambiguous fraction must stay small enough to be
worth it."""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops.sunshadow import build_sun_grids, classify, sun_basis
from vvr_tpu.render.oracle import trace_dense
from vvr_tpu.world.faces import extract_faces


def _faces_dev(occ):
    fs = extract_faces(occ)
    return tuple(jnp.asarray(a) for a in (fs.vx, fs.vy, fs.vz, fs.axis,
                                          fs.sgn))


SUNS = [np.array(v, np.float32) / np.linalg.norm(v) for v in
        ([-0.28, 0.65, -0.71], [0.1, 0.95, 0.2], [0.6, 0.5, 0.6],
         [-0.3, 0.9, 0.3])]


@pytest.mark.parametrize("sun_i", range(len(SUNS)))
def test_classifier_agrees_with_oracle(small_world, sun_i):
    _, _, occ = small_world
    size = occ.shape[0]
    sun = SUNS[sun_i]
    e1, e2, s = sun_basis(sun)
    fd = _faces_dev(occ)
    grids = build_sun_grids(fd, jnp.asarray(e1), jnp.asarray(e2),
                            jnp.asarray(s), size)

    rng = np.random.default_rng(100 + sun_i)
    # surface-biased + uniform sample points (shadow starts in practice
    # sit just above surfaces)
    pts = np.concatenate([
        rng.uniform(0.2, size - 0.2, (4000, 3)),
        rng.uniform([0, 0, 0], [size, size * 0.6, size], (4000, 3)),
    ]).astype(np.float32)
    cs, cl = classify(jnp.asarray(pts), jnp.asarray(e1), jnp.asarray(e2),
                      jnp.asarray(s), grids, size)
    cs = np.asarray(cs)
    cl = np.asarray(cl)
    d = np.broadcast_to(s, pts.shape).astype(np.float32)
    ref = trace_dense(occ, pts, d)
    # a certain answer must MATCH the exact trace
    assert not (cs & ~ref["hit"]).any(), "certain-shadow on a lit point"
    assert not (cl & ref["hit"]).any(), "certain-light on a shadowed point"
    assert not (cs & cl).any()
    # and the classifier must actually resolve most points
    inw = np.all((pts >= 0) & (pts < size), axis=1)
    resolved = (cs | cl)[inw].mean()
    assert resolved > 0.5, f"classifier resolved only {resolved:.2%}"


def test_near_occlusion_is_exact(small_world):
    """near_occlusion's hit/clean/exited answers must agree with the exact
    oracle over the first LIFT voxels."""
    from vvr_tpu.ops.sunshadow import LIFT, near_occlusion
    from vvr_tpu.world.jumpgrid import build_jump_grid
    _, _, occ = small_world
    size = occ.shape[0]
    sun = SUNS[0]
    grid = build_jump_grid(occ)
    rng = np.random.default_rng(7)
    pts = rng.uniform(0.2, size - 0.2, (6000, 3)).astype(np.float32)
    act = jnp.ones((len(pts),), bool)
    hit, clean, exited, bad = near_occlusion(
        grid.rows, jnp.asarray(pts), jnp.asarray(sun), act, size)
    hit, clean, exited, bad = (np.asarray(x) for x in
                               (hit, clean, exited, bad))
    d = np.broadcast_to(sun, pts.shape).astype(np.float32)
    ref = trace_dense(occ, pts, d)
    near_ref = ref["hit"] & (ref["t"] < LIFT - 1e-4)
    # near-hit must be a real hit within the segment; a clean segment must
    # have no oracle hit within it
    assert not (hit & ~ref["hit"]).any()
    assert not (clean & near_ref).any()
    assert (hit | clean | exited | bad).all()
    # exited lanes are total misses
    assert not (exited & ref["hit"]).any()
    # the vast majority should resolve without the full DDA
    assert bad.mean() < 0.35


def test_masked_shadow_equals_pure_dda_frame(small_world):
    """The classifier-accelerated shadow pass must produce the IDENTICAL
    frame to the pure-DDA shadow pass."""
    import jax.numpy as jnp2
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import build_scene
    from vvr_tpu.utils.camera import Camera

    wcfg = WorldConfig(depth=3)
    cam = Camera.look_at([32.0, 45.0, 6.0], [32.0, 10.0, 40.0], fov=85.0)
    base = dict(width=96, height=64, shadow_samples=1, max_ray_iterations=2,
                skybox_resolution=32, clouds_resolution=32,
                traversal="jump")
    scene = build_scene(wcfg, with_density=False)
    r_mask = Renderer(wcfg, RenderConfig(**base, sun_mask="auto"),
                      scene=scene)
    r_dda = Renderer(wcfg, RenderConfig(**base, sun_mask="off"),
                     scene=scene)
    assert r_mask.use_sunmask and not r_dda.use_sunmask
    img_m = np.asarray(r_mask.render(cam, time=0.0))
    img_d = np.asarray(r_dda.render(cam, time=0.0))
    np.testing.assert_array_equal(img_m, img_d)
