"""End-to-end frame tests + golden-image regression at snapshot cameras
(SURVEY.md §4: snapshot poses are the reproducibility fixtures). Goldens are
self-generated (the reference publishes no images) and guard against
unintended behavioral drift; regenerate with
  python tests/test_render.py --regen
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.render.frame import render_frame
from vvr_tpu.utils.camera import Camera, load_snapshots

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"

SMALL_CFG = RenderConfig(width=96, height=64, shadow_samples=1,
                         max_ray_iterations=2, skybox_resolution=32,
                         clouds_resolution=32)


def _render(pyr, cam, cfg=SMALL_CFG, sun=(-0.28, 0.65, -0.71), **kw):
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    s = np.asarray(sun, np.float32)
    s = np.concatenate([s / np.linalg.norm(s), [0.0]]).astype(np.float32)
    img, hdr = render_frame(pyr, o, d, jnp.asarray(s), jnp.float32(0.0), cfg, **kw)
    return np.asarray(img), np.asarray(hdr)


@pytest.fixture(scope="module")
def pyr(small_world):
    from vvr_tpu.world.pyramid import build_brick_pyramid as build_pyramid
    _, _, occ = small_world
    return build_pyramid(occ)


def test_frame_shapes_and_content(pyr):
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img, hdr = _render(pyr, cam)
    assert img.shape == (64, 96, 3) and img.dtype == np.uint8
    assert hdr.shape == (64, 96, 4)
    assert np.isfinite(hdr).all()
    # scene must contain both terrain (alpha 0) and sky (alpha 10)
    assert (hdr[..., 3] == 10.0).any() and (hdr[..., 3] == 0.0).any()
    # image is not constant
    assert img.std() > 10


@pytest.mark.full
def test_shadows_darken(pyr):
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img_sh, _ = _render(pyr, cam)
    cfg_nosh = RenderConfig(**{**SMALL_CFG.__dict__, "shadow_samples": 0})
    img_nosh, _ = _render(pyr, cam, cfg_nosh)
    assert img_nosh.astype(int).sum() > img_sh.astype(int).sum()


@pytest.mark.full
def test_soft_shadows_run(pyr):
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "shadow_samples": 4})
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img, hdr = _render(pyr, cam, cfg)
    assert np.isfinite(hdr).all()


@pytest.mark.full
def test_debug_modes_render(pyr):
    # reference DebugType numbering: 1=iterations 2=fetches 3=normals
    # 4=world 5=exit-type (raytracer.slang:46-53)
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    imgs = {}
    for dt in (1, 2, 3, 4, 5):
        cfg = RenderConfig(**{**SMALL_CFG.__dict__, "debug_type": dt})
        img, _ = _render(pyr, cam, cfg)
        assert img.std() > 0, f"debug mode {dt} produced a constant image"
        imgs[dt] = img
    # iterations and buffer-fetches are DIFFERENT counters (a fetch happens
    # only on descend/node-exit; a sub-step always counts) -> distinct views
    assert (imgs[1] != imgs[2]).any(), "iterations == fetches heatmap"
    assert (imgs[5] != imgs[1]).any(), "exit-type == iterations heatmap"


@pytest.mark.full
def test_raster_debug_path(pyr, small_world):
    """debug_type == 0: real mesh rasterization (render/raster.py), not the
    raytracer (renderer.rs:694-771 + rasterized.slang)."""
    from vvr_tpu.render.raster import raster_debug_frame
    from vvr_tpu.world.mesher import VoxelMeshBuffers
    _, chunks, _ = small_world
    mesh = VoxelMeshBuffers.build(chunks)
    assert len(mesh.vertices) > 0
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "debug_type": 0})
    sun = np.array([-0.28, 0.65, -0.71, 0.0], np.float32)
    sun[:3] /= np.linalg.norm(sun[:3])
    img = np.asarray(raster_debug_frame(mesh, pyr, cam, sun, 0.0, cfg))
    assert img.shape == (64, 96, 3)
    # geometry covers part of the frame in flat black/white; sky elsewhere
    gray = (img[..., 0] == img[..., 1]) & (img[..., 1] == img[..., 2])
    assert 0.05 < gray.mean() < 1.0, "no rasterized geometry visible"
    # and it is NOT the raytraced main view
    main_img, _ = _render(pyr, cam)
    assert (np.abs(img.astype(int) - main_img.astype(int)) > 8).mean() > 0.05


@pytest.mark.full
def test_raster_debug_closeup_no_dropped_triangles(pyr, small_world):
    """Triangles projecting wider than K_BIG pixels must still be drawn
    (full-screen fallback pass) — the round-3 build dropped them, so
    close-up frames showed sky through the nearest wall
    (VERDICT r3 #8; reference shaders/rasterized.slang:38-86 has no such
    limit)."""
    from vvr_tpu.render.raster import raster_debug_frame
    from vvr_tpu.world.mesher import VoxelMeshBuffers
    _, chunks, occ = small_world
    mesh = VoxelMeshBuffers.build(chunks)
    occ_np = np.asarray(occ)
    # terrain height under column (32, 32): camera hovers just above it
    col = occ_np[32, :, 32]
    h = int(np.max(np.nonzero(col)[0]))
    fwd_col = occ_np[32, :, 36]
    ht = int(np.max(np.nonzero(fwd_col)[0])) if fwd_col.any() else h
    cam = Camera.look_at([32.5, h + 1.6, 32.5], [32.5, ht + 0.5, 36.5],
                         fov=85)
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "debug_type": 0})
    sun = np.array([-0.28, 0.65, -0.71, 0.0], np.float32)
    sun[:3] /= np.linalg.norm(sun[:3])
    img = np.asarray(raster_debug_frame(mesh, pyr, cam, sun, 0.0, cfg))
    gray = (img[..., 0] == img[..., 1]) & (img[..., 1] == img[..., 2])
    # the nearest ground fills the bottom of the frame with triangles far
    # wider than K_BIG; with the drop they rendered as sky (gray ~ 0)
    assert gray[-img.shape[0] // 4:].mean() > 0.9, \
        "close-up ground not rasterized (huge triangles dropped?)"


def test_clip_straddlers_geometry():
    """Near-plane clipping (render/raster.py _clip_straddlers — VERDICT
    r4 missing #3): straddling triangles split into fully-in-front
    triangles whose new vertices lie exactly on w = NEAR_W."""
    from vvr_tpu.render.raster import NEAR_W, _clip_straddlers
    pos = np.zeros(3, np.float32)
    fwd = np.array([0.0, 0.0, 1.0], np.float32)
    # one vert in front (w=2), two behind (w=0.1): 1 clipped triangle
    verts = np.array([[0, 0, 2], [1, 0, 0.1], [-1, 0, 0.1],
                      # two in front, one behind: 2 clipped triangles
                      [0, 2, 2], [1, 2, 3], [0.5, 2, 0.2]], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    ev, et, nt = _clip_straddlers(verts, tris, pos, fwd)
    assert nt == 3
    allv = np.concatenate([verts, ev])
    w_all = (allv - pos) @ fwd
    for k in range(nt):
        tw = w_all[et[k]]
        assert (tw >= NEAR_W - 1e-5).all(), f"tri {k} not in front: {tw}"
    # the new vertices sit exactly on the plane
    assert np.allclose((ev[:4] - pos) @ fwd, NEAR_W, atol=1e-5)
    # all-in-front and all-behind triangles are untouched
    verts2 = np.array([[0, 0, 2], [1, 0, 3], [0, 1, 2.5],
                       [0, 0, 0.1], [1, 0, 0.2], [0, 1, 0.3]], np.float32)
    tris2 = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    _, _, nt2 = _clip_straddlers(verts2, tris2, pos, fwd)
    assert nt2 == 0


@pytest.mark.full
def test_raster_debug_straddling_wall_clipped(pyr, small_world):
    """A camera INSIDE the scene looking along a wall makes wall
    triangles straddle the near plane; without clipping those pixels
    showed sky (the round-4 documented gap). The clipped frame must
    cover strictly more geometry than a clip-disabled one."""
    import vvr_tpu.render.raster as raster_mod
    from vvr_tpu.render.raster import raster_debug_frame
    from vvr_tpu.world.mesher import VoxelMeshBuffers
    _, chunks, occ = small_world
    mesh = VoxelMeshBuffers.build(chunks)
    occ_np = np.asarray(occ)
    col = occ_np[32, :, 32]
    h = int(np.max(np.nonzero(col)[0]))
    # eye at surface height (terrain walls pass THROUGH the near plane),
    # gaze grazing along the ground
    cam = Camera.look_at([32.5, h + 0.4, 32.5], [38.5, h - 0.2, 38.5],
                         fov=100)
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "debug_type": 0})
    sun = np.array([-0.28, 0.65, -0.71, 0.0], np.float32)
    sun[:3] /= np.linalg.norm(sun[:3])
    img = np.asarray(raster_debug_frame(mesh, pyr, cam, sun, 0.0, cfg))

    real_clip = raster_mod._clip_straddlers
    try:
        raster_mod._clip_straddlers = lambda v, t, p, f: (
            np.zeros((2 * raster_mod.CLIP_CAP, 3), np.float32),
            np.zeros((raster_mod.CLIP_CAP, 3), np.int32), 0)
        img_nc = np.asarray(raster_debug_frame(mesh, pyr, cam, sun, 0.0,
                                               cfg))
    finally:
        raster_mod._clip_straddlers = real_clip
    gray = (img[..., 0] == img[..., 1]) & (img[..., 1] == img[..., 2])
    gray_nc = (img_nc[..., 0] == img_nc[..., 1]) \
        & (img_nc[..., 1] == img_nc[..., 2])
    assert gray.sum() > gray_nc.sum(), \
        "clipping did not add any covered pixels at a straddling camera"


@pytest.mark.full
def test_jump_traversal_frame_matches_pyramid(small_world, pyr):
    """traversal='jump' must produce the IDENTICAL frame: both kernels are
    oracle-bit-exact on hit/face/axis_coord, and shading consumes only
    those. (The flagship Renderer path uses the jump grid by default at
    bench scale — this pins frame-level equivalence.)"""
    from vvr_tpu.world.jumpgrid import build_jump_grid
    _, _, occ = small_world
    grid = build_jump_grid(occ)
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img_p, hdr_p = _render(pyr, cam)
    img_j, hdr_j = _render(grid, cam)
    np.testing.assert_array_equal(img_j, img_p)
    np.testing.assert_array_equal(hdr_j, hdr_p)


@pytest.mark.full
def test_jump2_traversal_frame_matches_pyramid(small_world, pyr):
    """traversal='jump2' (the two-tier grid, now selectable —
    VERDICT r3 #6) must also produce the IDENTICAL frame."""
    from vvr_tpu.world.jumpgrid import build_jump_grid2
    _, _, occ = small_world
    grid2 = build_jump_grid2(occ)
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img_p, hdr_p = _render(pyr, cam)
    img_j, hdr_j = _render(grid2, cam)
    np.testing.assert_array_equal(img_j, img_p)
    np.testing.assert_array_equal(hdr_j, hdr_p)


@pytest.mark.full
def test_paged_traversal_frame_matches_pyramid(small_world, pyr):
    """traversal='paged' (the two-level 1024^3-scale grid, ops/paged.py)
    must also produce the IDENTICAL frame — the kernel is oracle-bit-exact
    on hit/face/axis_coord (tests/test_jump.py) and shading consumes only
    those."""
    from vvr_tpu.world.paged import build_paged_grid
    _, _, occ = small_world
    pg = build_paged_grid(occ)
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img_p, hdr_p = _render(pyr, cam)
    img_j, hdr_j = _render(pg, cam)
    np.testing.assert_array_equal(img_j, img_p)
    np.testing.assert_array_equal(hdr_j, hdr_p)


@pytest.mark.full
def test_raster_primary_frame_matches_dda(small_world, pyr):
    """The rasterized-primary frame must be pixel-identical to the DDA
    frame: bounce-0 visibility is oracle-exact either way, and shading
    consumes only hit/face/axis_coord."""
    import jax.numpy as jnp2
    from vvr_tpu.ops.traverse import solid_at
    from vvr_tpu.world.faces import extract_merged_faces
    _, _, occ = small_world
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img_dda, hdr_dda = _render(pyr, cam)

    faces = extract_merged_faces(occ).device_tuple()
    right, up, forward = cam.basis()
    tan_half = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    rcam = (jnp2.asarray(cam.position, np.float32),
            jnp2.asarray(right, np.float32), jnp2.asarray(up, np.float32),
            jnp2.asarray(forward, np.float32), jnp2.float32(tan_half))
    probe = solid_at(pyr, jnp2.asarray(cam.position, np.float32))
    img_r, hdr_r = _render(pyr, cam, raster=(faces, rcam, probe))
    np.testing.assert_array_equal(img_r, img_dda)
    np.testing.assert_array_equal(hdr_r, hdr_dda)


@pytest.mark.full
def test_mirror_materials_bounce(pyr):
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "max_ray_iterations": 3})
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img, hdr = _render(pyr, cam, cfg, mirror_materials=True)
    assert np.isfinite(hdr).all()


@pytest.mark.full
def test_config4_shaped_bounce_caps_exact(small_world, pyr):
    """Config-4-shaped frame (mirrors + 4-sample soft shadows + classifier
    + AO) at wavefront scale (96x64 = 6144 >= 4096 lanes, so every packed
    path and bounce-scaled capacity ENGAGES). Two equality contracts:

    1. classifier+packed frame vs pure full-width DDA frame (sun_mask
       off) — the masked/packed machinery with per-bounce shrunken caps
       (render/frame.py bshrink) must not change the image beyond a
       HANDFUL of one-step pixels: the jittered sample directions are
       computed at the packed width in one program and at full width in
       the other, and XLA's batch-shape-dependent fusion can round the
       last ulp of that elementwise chain differently, flipping a
       grazing sample's hit (measured: 6-9 px off by one u8 step on CPU,
       hdr diffs <= 0.019 at those pixels; BIT-EXACT on TPU —
       tools/check_config4_wobble.py). Same accepted wobble class as
       test_parallel.py::test_sharded_frame_matches_single;
    2. a tiny soft_residue_cap (64) fires the extra-wave path at EVERY
       bounce — same count-bounded contract against the masked base.
    """
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import build_scene
    from vvr_tpu.world.svt import density_from_occupancy

    wcfg = WorldConfig(depth=3)
    _, _, occ = small_world
    dens = density_from_occupancy(occ)
    cam = Camera.look_at([32.0, 45.0, 6.0], [32.0, 10.0, 40.0], fov=85.0)
    base = dict(width=96, height=64, shadow_samples=4, max_ray_iterations=3,
                skybox_resolution=32, clouds_resolution=32,
                ambient_occlusion=True, traversal="jump")
    scene = build_scene(wcfg, with_density=False)
    r_mask = Renderer(wcfg, RenderConfig(**base, sun_mask="auto"),
                      scene=scene)
    r_dda = Renderer(wcfg, RenderConfig(**base, sun_mask="off"),
                     scene=scene)
    assert r_mask.use_sunmask and not r_dda.use_sunmask
    grid = scene.ensure_jumpgrid()
    o, d = camera_rays(cam, 96, 64)
    sun = jnp.asarray(r_mask.sun)
    sunmask = r_mask._sunmask()
    kw = dict(svt_density=dens, mirror_materials=True)
    img_m, _ = render_frame(grid, o, d, sun, jnp.float32(0.0),
                            r_mask.cfg, sunmask=sunmask, **kw)
    img_d, _ = render_frame(grid, o, d, sun, jnp.float32(0.0),
                            r_dda.cfg, **kw)

    def assert_wobble_only(a, b):
        diff = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
        assert diff.max() <= 1, f"max u8 diff {diff.max()}"
        bad = int((diff > 0).any(-1).sum())
        assert bad <= 32, f"{bad} pixels differ (wobble is a handful)"

    assert_wobble_only(img_m, img_d)
    img_of, _ = render_frame(grid, o, d, sun, jnp.float32(0.0),
                             r_mask.cfg, sunmask=sunmask,
                             soft_residue_cap=64, **kw)
    assert_wobble_only(img_of, img_m)
    # the packed bounce wave (trace AND shading at the continuation cap)
    # vs the full-width bounce loop (force_wide): the wave must not
    # change the image beyond the same fusion-wobble class — the body is
    # the same code at a different width, so any LOGIC slip (wrong
    # scatter mask, lost continuation, stale channel) shows up as large
    # diffs, not one-step wobble
    img_w, _ = render_frame(grid, o, d, sun, jnp.float32(0.0),
                            r_mask.cfg, sunmask=sunmask,
                            force_wide=True, **kw)
    assert_wobble_only(img_w, img_m)


@pytest.mark.full
def test_ambient_occlusion_darkens(small_world, pyr):
    from vvr_tpu.world.svt import density_from_occupancy
    _, _, occ = small_world
    dens = density_from_occupancy(occ)
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    cfg_ao = RenderConfig(**{**SMALL_CFG.__dict__, "ambient_occlusion": True,
                             "shadow_samples": 0})
    cfg_no = RenderConfig(**{**SMALL_CFG.__dict__, "ambient_occlusion": False,
                             "shadow_samples": 0})
    img_ao, hdr_ao = _render(pyr, cam, cfg_ao, svt_density=dens)
    img_no, _ = _render(pyr, cam, cfg_no)
    assert np.isfinite(hdr_ao).all()
    assert img_ao.astype(int).sum() < img_no.astype(int).sum()


@pytest.mark.full
def test_downscale_factor(pyr):
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "downscale_factor": 2})
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img, hdr = _render(pyr, cam, cfg)
    assert img.shape == (64, 96, 3)
    assert hdr.shape == (32, 48, 4)


def _golden_views(pyr, full: bool = False):
    cams = {
        "terrain": Camera.look_at([32, 28, 6], [32, 2, 45], fov=85),
        "sky": Camera.look_at([32, 40, 32], [32, 80, 90], fov=100),
    }
    n_snaps = 5 if full else 2
    for i, s in enumerate(load_snapshots()[:n_snaps]):
        cam = Camera.from_snapshot(s)
        cam.position = cam.position * (64 / 1024.0)
        cams[f"snap{i}"] = cam
    return cams


def _check_golden(name, img, regen):
    path = GOLDEN_DIR / f"{name}.npy"
    if regen:
        np.save(path, img)
        return
    # a missing golden is a hard failure (never silently re-baseline;
    # regenerate explicitly with VVR_REGEN_GOLDEN=1)
    assert path.exists(), f"golden {path} missing"
    golden = np.load(path)
    # u8 output must match almost exactly on the same backend; allow a
    # few LSBs for cross-platform float differences
    diff = np.abs(img.astype(int) - golden.astype(int))
    frac_off = (diff > 2).mean()
    assert frac_off < 0.005, f"{name}: {frac_off:.4%} pixels off"


def _regen():
    import os
    return os.environ.get("VVR_REGEN_GOLDEN") == "1"


def test_golden_images(pyr):
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, cam in _golden_views(pyr).items():
        img, _ = _render(pyr, cam)
        _check_golden(name, img, _regen())


@pytest.mark.full
def test_golden_images_all_snapshots(pyr):
    """All 5 reference snapshot poses (src/snapshots.json /
    src/movement.rs:124-151) as goldens — the smoke tier pins snap0/1;
    this covers the rest of the corpus (VERDICT r4 next #6)."""
    GOLDEN_DIR.mkdir(exist_ok=True)
    views = _golden_views(pyr, full=True)
    for name in ("snap2", "snap3", "snap4"):
        img, _ = _render(pyr, views[name])
        _check_golden(name, img, _regen())


@pytest.mark.full
def test_golden_config4_style(small_world, pyr):
    """Config-4-style golden: 4-bounce mirrors + AO + 4-sample soft
    shadows with cone sun grids (the BASELINE config-4 knobs at golden
    scale)."""
    from vvr_tpu.ops.sunshadow import CONE_TAN, build_sun_grids, sun_basis
    from vvr_tpu.world.faces import extract_merged_faces
    from vvr_tpu.world.svt import density_from_occupancy

    _, _, occ = small_world
    cfg = RenderConfig(**{**SMALL_CFG.__dict__, "shadow_samples": 4,
                          "max_ray_iterations": 4,
                          "ambient_occlusion": True})
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    sun = np.array([-0.28, 0.65, -0.71], np.float32)
    sun /= np.linalg.norm(sun)
    faces = extract_merged_faces(occ).device_tuple()
    e1, e2, s = sun_basis(sun)
    grids, gok = build_sun_grids(faces, jnp.asarray(e1), jnp.asarray(e2),
                                 jnp.asarray(s), occ.shape[0],
                                 cone_tan=CONE_TAN)
    assert bool(gok)
    img, _ = _render(pyr, cam, cfg, mirror_materials=True,
                     svt_density=density_from_occupancy(occ),
                     sunmask=(jnp.asarray(e1), jnp.asarray(e2), grids))
    GOLDEN_DIR.mkdir(exist_ok=True)
    _check_golden("config4", img, _regen())


@pytest.mark.full
def test_golden_paged(small_world):
    """Paged-grid golden: the 1024^3-scale two-level structure
    (ops/paged.py) rendering the golden world — pins the paged frame
    output against regression (frame parity vs the pyramid is asserted
    separately by test_paged_traversal_frame_matches_pyramid)."""
    from vvr_tpu.world.paged import build_paged_grid

    _, _, occ = small_world
    pg = build_paged_grid(occ)
    cam = Camera.look_at([32, 28, 6], [32, 2, 45], fov=85)
    img, _ = _render(pg, cam)
    GOLDEN_DIR.mkdir(exist_ok=True)
    _check_golden("paged", img, _regen())


if __name__ == "__main__":
    print("regenerate goldens with: VVR_REGEN_GOLDEN=1 pytest "
          "tests/test_render.py::test_golden_images")
