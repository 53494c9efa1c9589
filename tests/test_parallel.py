"""Multi-device sharding tests on the 8-device virtual CPU mesh: the sharded
render must produce the same image as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.config import RenderConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.ops.traverse import trace
from vvr_tpu.parallel.mesh import make_mesh, render_frame_sharded, replicate, shard_rays
from vvr_tpu.render.frame import render_frame
from vvr_tpu.utils.camera import Camera

CFG = RenderConfig(width=96, height=64, shadow_samples=1, max_ray_iterations=2,
                   skybox_resolution=32, clouds_resolution=32)


@pytest.fixture(scope="module")
def pyr(small_world):
    from vvr_tpu.world.pyramid import build_brick_pyramid as build_pyramid
    _, _, occ = small_world
    return build_pyramid(occ)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_trace_matches_single(pyr):
    rng = np.random.default_rng(0)
    o = rng.uniform(1, 63, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    single = trace(pyr, jnp.asarray(o), jnp.asarray(d))

    mesh = make_mesh(8)
    so, sd = shard_rays(mesh, jnp.asarray(o), jnp.asarray(d))
    rp = replicate(mesh, pyr)
    sharded = trace(rp, so, sd)
    np.testing.assert_array_equal(np.asarray(single.hit), np.asarray(sharded.hit))
    np.testing.assert_array_equal(np.asarray(single.axis_coord),
                                  np.asarray(sharded.axis_coord))


def test_sharded_frame_matches_single(pyr):
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    o, d = camera_rays(cam, CFG.render_width, CFG.render_height)
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71, 0.0], np.float32))
    img1, _ = render_frame(pyr, o, d, sun, jnp.float32(0.0), CFG)

    mesh = make_mesh(8)
    img8, _ = render_frame_sharded(mesh, pyr, o, d, sun, 0.0, CFG)
    diff = np.abs(np.asarray(img1).astype(int) - np.asarray(img8).astype(int))
    assert (diff > 1).mean() < 1e-3


def test_graft_entry_contract():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[2] == 3 and out.dtype == jnp.uint8
    ge.dryrun_multichip(8)
