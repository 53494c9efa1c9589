"""Sun-space occlusion classifier: `certain` answers must agree with the
dense-DDA oracle for empty-space starts (the conservative anti-sun-face
grids may only claim what the exact trace confirms), the
classifier-accelerated frame must equal the pure-DDA frame bit-for-bit,
and the resolved fraction must stay high enough to be worth it."""

import jax.numpy as jnp
import numpy as np
import pytest

from vvr_tpu.ops.sunshadow import (BACK, SAFE, build_sun_grids, classify,
                                   masked_shadow_hits, sun_basis)
from vvr_tpu.render.oracle import trace_dense
from vvr_tpu.world.faces import extract_merged_faces


def _faces_dev(occ):
    return extract_merged_faces(occ).device_tuple()


def _grids(occ, sun):
    e1, e2, s = sun_basis(sun)
    g, ok = build_sun_grids(_faces_dev(occ), jnp.asarray(e1),
                            jnp.asarray(e2), jnp.asarray(s), occ.shape[0])
    assert bool(ok)
    return e1, e2, s, g


SUNS = [np.array(v, np.float32) / np.linalg.norm(v) for v in
        ([-0.28, 0.65, -0.71], [0.1, 0.95, 0.2], [0.6, 0.5, 0.6],
         [-0.3, 0.9, 0.3])]


@pytest.mark.parametrize("sun_i", range(len(SUNS)))
def test_classifier_agrees_with_oracle(small_world, sun_i):
    _, _, occ = small_world
    size = occ.shape[0]
    e1, e2, s, grids = _grids(occ, SUNS[sun_i])

    rng = np.random.default_rng(100 + sun_i)
    # surface-biased + uniform sample points, restricted to EMPTY space
    # (the classifier contract: shadow-ray starts are never buried; the
    # back-margin in masked_shadow_hits covers the lifted-start case)
    pts = np.concatenate([
        rng.uniform(0.2, size - 0.2, (6000, 3)),
        rng.uniform([0, 0, 0], [size, size * 0.6, size], (6000, 3)),
    ]).astype(np.float32)
    cell = np.clip(np.floor(pts).astype(np.int64), 0, size - 1)
    empty = ~occ[cell[:, 2], cell[:, 1], cell[:, 0]]
    pts = pts[empty]
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
    assert resolved > 0.6, f"classifier resolved only {resolved:.2%}"


@pytest.mark.full
def test_masked_shadow_matches_dda_from_surface_starts(small_world):
    """masked_shadow_hits at real shadow-ray starts (surface point + BACK
    along the sun — including starts that end up buried in tight corners)
    must equal the pure DDA-for-every-lane answer."""
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.world.jumpgrid import build_jump_grid
    _, _, occ = small_world
    size = occ.shape[0]
    sun = SUNS[0]
    e1, e2, s, grids = _grids(occ, sun)
    grid = build_jump_grid(occ)

    # surface starts: cast primary rays down/sideways, take the hit points
    rng = np.random.default_rng(11)
    o = rng.uniform(1.0, size - 1.0, (4000, 3)).astype(np.float32)
    d = rng.normal(size=(4000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pre = trace_dense(occ, o, d)
    hit = pre["hit"] & (pre["t"] > 0)
    world = (o + d * pre["t"][:, None])[hit]
    s_o = (world + sun[None, :] * BACK).astype(np.float32)

    def tr(ro, rd, active=None, pack_first=None, shadow=False,
           with_stats=False):
        return trace_jump(grid, ro, rd, max_steps=2048, active=active,
                          pack_first=pack_first)

    act = jnp.ones((len(s_o),), bool)
    got = np.asarray(masked_shadow_hits(
        tr, jnp.asarray(s_o), jnp.asarray(sun), jnp.asarray(e1),
        jnp.asarray(e2), grids, act, size, None))
    want = np.asarray(tr(jnp.asarray(s_o),
                         jnp.broadcast_to(jnp.asarray(sun),
                                          s_o.shape)).hit)
    np.testing.assert_array_equal(got, want)


@pytest.mark.full
def test_masked_shadow_equals_pure_dda_frame(small_world):
    """The classifier-accelerated shadow pass must produce the IDENTICAL
    frame to the pure-DDA shadow pass."""
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


@pytest.mark.full
def test_masked_shadow_equals_pure_dda_frame_pyramid(small_world):
    """Same equality with the PYRAMID tracer (round 3 decoupled the
    classifier from the jump grid; the residue runs the frame's tracer)."""
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import build_scene
    from vvr_tpu.utils.camera import Camera

    wcfg = WorldConfig(depth=3)
    cam = Camera.look_at([20.0, 50.0, 10.0], [40.0, 10.0, 50.0], fov=75.0)
    base = dict(width=96, height=64, shadow_samples=1, max_ray_iterations=2,
                skybox_resolution=32, clouds_resolution=32,
                traversal="pyramid")
    scene = build_scene(wcfg, with_density=False)
    r_mask = Renderer(wcfg, RenderConfig(**base, sun_mask="auto"),
                      scene=scene)
    r_dda = Renderer(wcfg, RenderConfig(**base, sun_mask="off"),
                     scene=scene)
    assert r_mask.use_sunmask and not r_dda.use_sunmask
    img_m = np.asarray(r_mask.render(cam, time=0.0))
    img_d = np.asarray(r_dda.render(cam, time=0.0))
    np.testing.assert_array_equal(img_m, img_d)


def test_build_overflow_flag(small_world):
    """A deliberately tiny cap must report ok=False (the renderer retries
    with a doubled cap — light-certainty needs every occluder seen)."""
    _, _, occ = small_world
    sun = SUNS[0]
    e1, e2, s = sun_basis(sun)
    _, ok = build_sun_grids(_faces_dev(occ), jnp.asarray(e1),
                            jnp.asarray(e2), jnp.asarray(s), occ.shape[0],
                            cap_entries=64)
    assert not bool(ok)


@pytest.mark.parametrize("sun_i", range(3))
@pytest.mark.full
def test_masked_packed_near_segment_matches_dda(small_world, sun_i):
    """The packed path (coarse gate -> packed fine classify -> near-segment
    walk + lifted re-classify -> packed DDA) must equal pure DDA at >= 4096
    frame-exact surface starts (n >= 4096 engages the packed machinery;
    accel engages the near segment)."""
    from vvr_tpu.ops.jump import trace_jump, SHADOW_PHASE1, SHADOW_CASCADE
    from vvr_tpu.world.jumpgrid import build_jump_grid
    _, _, occ = small_world
    size = occ.shape[0]
    sun = SUNS[sun_i]
    e1, e2, s, grids = _grids(occ, sun)
    grid = build_jump_grid(occ)

    # frame-exact surface reconstruction (render/frame.py formulas),
    # restricted to sun-facing faces like the frame's shadow_active
    rng = np.random.default_rng(13 + sun_i)
    o = rng.uniform(1.0, size - 1.0, (40000, 3)).astype(np.float32)
    d = rng.normal(size=(40000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pre = trace_dense(occ, o, d)
    hit = pre["hit"] & (pre["t"] > 0)
    face = pre["face"][hit]
    ax_c = pre["axis_coord"][hit]
    oh, dh = o[hit], d[hit]
    k = np.arange(len(face))
    sgn = np.where(dh >= 0, 1.0, -1.0)
    plane = ax_c.astype(np.float32) + np.where(sgn[k, face] < 0, 1.0, 0.0)
    df = dh[k, face]
    dist = (plane - oh[k, face]) / np.where(np.abs(df) < 1e-12, 1e-12, df)
    world = oh + dh * dist[:, None]
    world[k, face] = plane
    normal = np.zeros_like(dh)
    normal[k, face] = -sgn[k, face]
    s_o = (world + sun[None, :] * BACK)[(normal @ sun) > 0]
    assert len(s_o) >= 4096, "need enough surface starts to engage packing"
    s_o = jnp.asarray(s_o[:8192].astype(np.float32))
    n = s_o.shape[0]

    def tr(ro, rd, active=None, pack_first=None, shadow=False,
           with_stats=False):
        return trace_jump(grid, ro, rd, max_steps=2048, active=active,
                          pack_first=pack_first,
                          phase1_groups=SHADOW_PHASE1 if shadow else 6,
                          cascade=SHADOW_CASCADE if shadow else None)

    act = jnp.ones((n,), bool)
    got = np.asarray(masked_shadow_hits(
        tr, s_o, jnp.asarray(sun), jnp.asarray(e1), jnp.asarray(e2),
        grids, act, size, max(n // 10, 2048), accel=grid))
    want = np.asarray(trace_jump(
        grid, s_o, jnp.broadcast_to(jnp.asarray(sun), (n, 3)),
        max_steps=4096).hit)
    np.testing.assert_array_equal(got, want)


@pytest.mark.full
def test_masked_low_res_grids_still_exact(small_world):
    """The interactive-sun drag path builds 512^2 grids (renderer.
    set_sun_dragging); classification must stay conservative at ANY
    resolution — lower res only widens the DDA residue."""
    from vvr_tpu.ops.jump import trace_jump
    from vvr_tpu.world.jumpgrid import build_jump_grid
    _, _, occ = small_world
    size = occ.shape[0]
    sun = SUNS[0]
    e1, e2, s = sun_basis(sun)
    g512, ok = build_sun_grids(_faces_dev(occ), jnp.asarray(e1),
                               jnp.asarray(e2), jnp.asarray(s), size,
                               grid=512, cap_entries=1 << 17)
    assert bool(ok)
    grid = build_jump_grid(occ)
    rng = np.random.default_rng(21)
    pts = rng.uniform(0.5, size - 0.5, (9000, 3)).astype(np.float32)
    cell = np.clip(np.floor(pts).astype(np.int64), 0, size - 1)
    pts = pts[~occ[cell[:, 2], cell[:, 1], cell[:, 0]]][:8192]
    n = len(pts)

    def tr(ro, rd, active=None, pack_first=None, shadow=False,
           with_stats=False):
        return trace_jump(grid, ro, rd, max_steps=2048, active=active,
                          pack_first=pack_first)

    act = jnp.ones((n,), bool)
    got = np.asarray(masked_shadow_hits(
        tr, jnp.asarray(pts), jnp.asarray(sun), jnp.asarray(e1),
        jnp.asarray(e2), g512, act, size, max(n // 10, 2048), accel=grid))
    want = np.asarray(trace_jump(
        grid, jnp.asarray(pts),
        jnp.broadcast_to(jnp.asarray(sun), (n, 3)), max_steps=4096).hit)
    np.testing.assert_array_equal(got, want)


@pytest.mark.full
def test_soft_shadow_cone_equals_pure_dda_frame(small_world):
    """The CONE-classified soft-shadow pass (one classification shared by
    all N jittered samples, soft_shadow_gate) must produce the IDENTICAL
    frame to per-sample pure-DDA soft shadows."""
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import build_scene
    from vvr_tpu.utils.camera import Camera

    wcfg = WorldConfig(depth=3)
    cam = Camera.look_at([32.0, 45.0, 6.0], [32.0, 10.0, 40.0], fov=85.0)
    base = dict(width=96, height=64, shadow_samples=4, max_ray_iterations=2,
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


@pytest.mark.full
def test_soft_shadow_residue_overflow_net(small_world):
    """The batched soft-shadow residue pack has a cond-guarded full-width
    overflow net; force it to FIRE (cap 64 <<< the residue) and require
    the frame to stay identical to the default-cap frame."""
    import jax.numpy as jnp

    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.ops.raygen import camera_rays
    from vvr_tpu.render.frame import render_frame
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import build_scene
    from vvr_tpu.utils.camera import Camera

    wcfg = WorldConfig(depth=3)
    cam = Camera.look_at([32.0, 45.0, 6.0], [32.0, 10.0, 40.0], fov=85.0)
    cfg = RenderConfig(width=96, height=64, shadow_samples=4,
                       max_ray_iterations=2, skybox_resolution=32,
                       clouds_resolution=32, traversal="jump",
                       sun_mask="auto")
    scene = build_scene(wcfg, with_density=False)
    r = Renderer(wcfg, cfg, scene=scene)
    assert r.use_sunmask
    o, d = camera_rays(cam, cfg.render_width, cfg.render_height)
    grid = scene.ensure_jumpgrid()
    sunmask = r._sunmask()
    sun = jnp.asarray(r.sun)
    img_def, _ = render_frame(grid, o, d, sun, jnp.float32(0.0), cfg,
                              sunmask=sunmask)
    img_of, _ = render_frame(grid, o, d, sun, jnp.float32(0.0), cfg,
                             sunmask=sunmask, soft_residue_cap=64)
    np.testing.assert_array_equal(np.asarray(img_of), np.asarray(img_def))


@pytest.mark.full
def _surface_points(occ, s, rng, count):
    """Random points ON sun-facing exposed faces (normal.s > 0) — the
    gate's contract population: every real shadow query is a hit point,
    which lies on an exposed face (soft_shadow_gate docstring)."""
    size = occ.shape[0]
    pts = []
    pad = np.zeros_like(occ[:, :, :1])
    # occ is [z, y, x]; for each axis/sign collect exposed faces
    specs = [
        # (axis_vec(normal), plane offset, empty-neighbour slice builder)
        (np.array([1., 0, 0]), lambda z, y, x: (x + 1., y, z),
         np.concatenate([occ[:, :, 1:], pad], 2)),
        (np.array([-1., 0, 0]), lambda z, y, x: (x + 0., y, z),
         np.concatenate([pad, occ[:, :, :-1]], 2)),
        (np.array([0, 1., 0]), lambda z, y, x: (x, y + 1., z),
         np.concatenate([occ[:, 1:, :], pad.transpose(0, 2, 1)], 1)),
        (np.array([0, -1., 0]), lambda z, y, x: (x, y + 0., z),
         np.concatenate([pad.transpose(0, 2, 1), occ[:, :-1, :]], 1)),
        (np.array([0, 0, 1.]), lambda z, y, x: (x, y, z + 1.),
         np.concatenate([occ[1:, :, :], pad.transpose(2, 1, 0)], 0)),
        (np.array([0, 0, -1.]), lambda z, y, x: (x, y, z + 0.),
         np.concatenate([pad.transpose(2, 1, 0), occ[:-1, :, :]], 0)),
    ]
    for normal, plane, nb in specs:
        if float(normal @ s) <= 0.0:
            continue  # only sun-facing faces host shadow queries
        z, y, x = np.nonzero(occ & ~nb)
        if len(z) == 0:
            continue
        take = rng.choice(len(z), size=min(count, len(z)), replace=False)
        z, y, x = z[take], y[take], x[take]
        u = rng.uniform(0.05, 0.95, len(z))
        v = rng.uniform(0.05, 0.95, len(z))
        px, py, pz = plane(z.astype(np.float64), y.astype(np.float64),
                           x.astype(np.float64))
        if normal[0]:
            py, pz = py + u, pz + v
        elif normal[1]:
            px, pz = px + u, pz + v
        else:
            px, py = px + u, py + v
        pts.append(np.stack([px, py, pz], -1).astype(np.float32))
    return np.concatenate(pts, 0)


def test_cone_gate_agrees_with_per_sample_oracle(small_world):
    """Cone-grid certainty must agree with EVERY jittered direction's
    exact trace (the shared-classification soundness claim), over the
    gate's contract population: points ON sun-facing exposed faces (all
    real shadow queries are hit points; pixelated_shadows bypasses the
    classifier entirely — renderer.use_sunmask)."""
    from vvr_tpu.ops.sunshadow import CONE_TAN, soft_shadow_gate
    from vvr_tpu.utils.hash import hash33
    _, _, occ = small_world
    size = occ.shape[0]
    sun = SUNS[0]
    e1, e2, s = sun_basis(sun)
    grids, ok = build_sun_grids(_faces_dev(occ), jnp.asarray(e1),
                                jnp.asarray(e2), jnp.asarray(s), size,
                                cone_tan=CONE_TAN)
    assert bool(ok)
    rng = np.random.default_rng(31)
    base = _surface_points(occ, s, rng, 1500)
    for pts in (base,):
        n = len(pts)
        act = jnp.ones((n,), bool)
        kh, km = soft_shadow_gate(jnp.asarray(pts), jnp.asarray(sun),
                                  jnp.asarray(e1), jnp.asarray(e2), grids,
                                  act, size)
        kh = np.asarray(kh)
        km = np.asarray(km)
        assert kh.any(), "cone gate never certain-shadow on terrain " \
            "(the round-4 S-support erosion regressed to kh=0)"
        assert km.any()
        for samp in range(4):
            r = np.asarray(hash33(jnp.asarray(pts) * 23.12123545
                                  + samp * 30.43324)) * 2.0 - 1.0
            sd = sun[None, :] + r * 0.005
            sd = (sd / np.linalg.norm(sd, axis=1, keepdims=True)).astype(
                np.float32)
            s_o = (pts + sun[None, :] * 0.004 + sd * 0.05).astype(
                np.float32)
            hit = trace_dense(occ, s_o, sd, max_steps=100000)["hit"]
            assert not (kh & ~hit).any(), \
                "cone certain-shadow on a lit sample"
            assert not (km & hit).any(), \
                "cone certain-light on a hit sample"


@pytest.mark.full
def test_near_walk_classify_agrees_with_oracle(small_world):
    """The soft wave's sample-ray prefilter (near K-crossing walk + lift
    against the surface texel's cone gridC — ops/sunshadow.py
    near_walk_classify): walk-hit must imply the exact trace hits, and
    lift/exit-miss must imply it misses, for every jittered sample ray
    from real surface queries."""
    import math
    from vvr_tpu.ops.sunshadow import CONE_TAN, near_walk_classify
    from vvr_tpu.utils.hash import hash33
    from vvr_tpu.world.jumpgrid import build_jump_grid
    _, _, occ = small_world
    size = occ.shape[0]
    jg = build_jump_grid(occ)
    sun = SUNS[0]
    e1, e2, s = sun_basis(sun)
    grids, ok = build_sun_grids(_faces_dev(occ), jnp.asarray(e1),
                                jnp.asarray(e2), jnp.asarray(s), size,
                                cone_tan=CONE_TAN)
    assert bool(ok)
    gBC, _, a0, b0, ts = grids
    gres = int(math.isqrt(gBC.shape[0]))
    rng = np.random.default_rng(77)
    pts = _surface_points(occ, s, rng, 1500)
    qa = pts @ e1
    qb = pts @ e2
    gi = np.clip(np.floor((qa - float(a0)) / float(ts)), 0,
                 gres - 1).astype(np.int64)
    gj = np.clip(np.floor((qb - float(b0)) / float(ts)), 0,
                 gres - 1).astype(np.int64)
    rowC = np.asarray(gBC)[gj * gres + gi, 1]
    hits_any = False
    miss_any = False
    for samp in range(4):
        r = np.asarray(hash33(jnp.asarray(pts) * 23.12123545
                              + samp * 30.43324)) * 2.0 - 1.0
        sd = sun[None, :] + r * 0.005
        sd = (sd / np.linalg.norm(sd, axis=1, keepdims=True)).astype(
            np.float32)
        s_o = (pts + sun[None, :] * 0.004 + sd * 0.05).astype(np.float32)
        kh2, km2 = near_walk_classify(
            jg, jnp.asarray(s_o), jnp.asarray(sd), jnp.asarray(rowC),
            tuple(jnp.float32(c) for c in sun), size)
        kh2 = np.asarray(kh2)
        km2 = np.asarray(km2)
        hit = trace_dense(occ, s_o, sd, max_steps=100000)["hit"]
        assert not (kh2 & ~hit).any(), "walk-hit on a lit sample"
        assert not (km2 & hit).any(), "lift/exit-miss on a hit sample"
        hits_any |= bool(kh2.any())
        miss_any |= bool(km2.any())
    assert hits_any and miss_any, "prefilter never fired — dead code"
