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


def test_sharded_flagship_frame_exact(small_world):
    """The FLAGSHIP composition (per-band rasterized primary + sun-space
    shadow classifier + local DDA residue) sharded over 8 devices must be
    BIT-IDENTICAL to the single-chip frame — u8 image AND f32 HDR. Sized
    so each shard holds 512*8 = 4096 rays: the first compaction-cascade
    capacity engages inside every shard (the round-2 dryrun never
    exercised the cascade under sharding)."""
    import __graft_entry__ as ge
    from vvr_tpu.world.jumpgrid import build_jump_grid

    _, _, occ = small_world
    grid = build_jump_grid(occ)
    cfg = RenderConfig(width=512, height=64, shadow_samples=1,
                       max_ray_iterations=2, skybox_resolution=32,
                       clouds_resolution=32)
    cam = Camera.look_at([32.0, 28.0, 6.0], [32.0, 2.0, 45.0], fov=85.0)
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71, 0.0], np.float32))
    raster, sunmask = ge._flagship_parts(occ, cam, sun)

    img1, hdr1 = render_frame(grid, o, d, sun, jnp.float32(0.0), cfg,
                              raster=raster, sunmask=sunmask)
    mesh = make_mesh(8)
    img8, hdr8 = render_frame_sharded(mesh, grid, o, d, sun, 0.0, cfg,
                                      raster=raster, sunmask=sunmask)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img8))
    np.testing.assert_array_equal(np.asarray(hdr1), np.asarray(hdr8))


def test_graft_entry_contract():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[2] == 3 and out.dtype == jnp.uint8
    ge.dryrun_multichip(8)
