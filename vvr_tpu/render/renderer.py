"""Renderer — the frame orchestrator (InternalApp analog).

Owns the scene + render config, drives per-frame state (camera, sun, time,
lights), times the main pass (the analog of the reference's GPU timestamp
pair around the megakernel, src/renderer.rs:795-797), and exposes the
key-triggered capture benchmark (L key -> Statistics, src/renderer.rs:442-444)
as a method."""

from __future__ import annotations

import logging
import time as _time

import jax
import numpy as np

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.render.frame import render_frame
from vvr_tpu.render.scene import Scene, build_scene
from vvr_tpu.utils.camera import Camera, Snapshot, load_snapshots
from vvr_tpu.utils.statistics import Statistics, mrays_per_sec

log = logging.getLogger(__name__)

DEFAULT_SUN = np.array([-0.28, 0.65, -0.71, 0.0], np.float32)

def _call_jit_selfhealing(fn, *args, **kwargs):
    """jax 0.9 workaround: after the raster-debug jits (render/raster.py)
    have run, the pjit fast path can serve a render_frame call with a
    STALE pruned-argument list from another function's cache entry
    ("Execution supplied 15 buffers but compiled program expected 25" —
    reproduced deterministically; the supplied count matches
    _shade_raster's leaf count). jax.clear_caches() + retry recovers; the
    recompile only happens when the bug actually fires.

    Returns (result, fired): `fired` marks that a recompile landed inside
    this call — the caller must taint any wall-clock sample it was timing
    (Statistics.push_timing drops and tallies it)."""
    try:
        return fn(*args, **kwargs), False
    except ValueError as e:
        if "buffers but compiled program expected" not in str(e):
            raise
        log.warning("pjit fast-path corruption detected (%s); clearing "
                    "jax caches and retrying", str(e)[:80])
        jax.clear_caches()
        return fn(*args, **kwargs), True


class Renderer:
    def __init__(self, world_cfg: WorldConfig, render_cfg: RenderConfig,
                 scene: Scene | None = None, force_regenerate: bool = False,
                 mirror_materials: bool = False, dynamic_world: bool = False):
        self.world_cfg = world_cfg
        self.cfg = render_cfg
        self.scene = scene or build_scene(
            world_cfg, force_regenerate=force_regenerate,
            with_density=render_cfg.ambient_occlusion,
            # at paged scale the pyramid is 260 MB the frame never reads
            # (the probe is a host lookup; the raster debug path / overlap
            # AO call ensure_pyramid on demand)
            with_pyramid=not render_cfg.use_paged(world_cfg.size))
        self.mirror_materials = mirror_materials
        self.dynamic_world = dynamic_world
        self.svt = None
        if dynamic_world:
            from vvr_tpu.world.bricks import build_svt
            self.svt = build_svt(self.scene.chunks, self.scene.size)
        self.use_jump = render_cfg.use_jump(self.scene.size)
        self.use_jump2 = render_cfg.traversal == "jump2"
        self.use_paged = render_cfg.use_paged(self.scene.size)
        if self.use_jump:
            self.scene.ensure_jumpgrid()
        elif self.use_jump2:
            self.scene.ensure_jumpgrid2()
        elif self.use_paged:
            self.scene.ensure_paged()
        # rasterized primary visibility: on for the main view (debug
        # heatmaps need the DDA's traversal counters)
        self.use_raster = (render_cfg.primary_raster == "on"
                           or (render_cfg.primary_raster == "auto"
                               and render_cfg.debug_type == 6))
        if self.use_raster:
            self.scene.ensure_faces()
        # sun-space occlusion classifier: hard shadows use the exact
        # grids; soft shadows (N jittered samples) use CONE grids — one
        # classification shared by all samples (ops/sunshadow.py).
        # pixelated_shadows floors the query point to a 1/4 grid
        # (raytracer.slang:328-330) which can bury it INSIDE solid, where
        # the classifier's certain-light claim is unsound (its own
        # contract) — that cosmetic knob rides the exact DDA path instead
        self.use_sunmask = (render_cfg.sun_mask != "off"
                            and render_cfg.shadow_samples >= 1
                            and not render_cfg.pixelated_shadows)
        self._sunmask_cache = None  # (sun_bytes, (e1, e2, grids))
        if self.use_sunmask:
            self.scene.ensure_faces()
        self.stats = Statistics()
        self.frame_count = 0
        self.elapsed = 0.0
        self.snapshots = load_snapshots()
        sun = DEFAULT_SUN[:3] / np.linalg.norm(DEFAULT_SUN[:3])
        self.sun = np.concatenate([sun, [0.0]]).astype(np.float32)

    def _raster_cap(self) -> int:
        """Adaptive tile-entry capacity for the primary rasterizer
        (ops/rastertrace.py trace_raster cap_entries, a static arg).

        Entry demand scales with the scene's VISIBLE face count (each
        on-screen face takes >=1 tile entry): at 1024^3 (763K faces) the
        old fixed 1<<20 overflowed and pushed thousands of faces through
        the full-screen safety net — measured ~5.1 s of config 5's 6.5 s
        frame (tools/profile_config5.py). Sized from the face count so
        the net only ever sees camera-plane straddlers; the per-chunk
        raster loop's trip count tracks the DYNAMIC entry total, so a
        roomy capacity costs only the allocation arrays, not loop work.
        Flagship scenes (256^3, ~200K faces) keep the tuned 1<<20."""
        f = int(self.scene.faces[0].shape[0])
        cap = 1 << 20
        while cap < 4 * f and cap < (1 << 24):
            cap *= 2
        return cap

    def camera_for_snapshot(self, index: int) -> Camera:
        snap = self.snapshots[index % len(self.snapshots)]
        cam = Camera.from_snapshot(snap)
        # snapshot poses are authored for the 1024^3 world; scale into range
        scale = self.scene.size / 1024.0
        cam.position = cam.position * scale
        return cam

    @property
    def rays_per_frame(self) -> int:
        """Primary + shadow rays per frame (the Mrays/s denominator)."""
        n = self.cfg.render_width * self.cfg.render_height
        return n * (1 + max(self.cfg.shadow_samples, 0))

    def render(self, camera: Camera, time: float | None = None,
               timed: bool = False, fetch: bool = False):
        """One frame -> (H, W, 3) u8, ON DEVICE by default (the analog of the
        reference's triple-buffered frames-in-flight, per_frame_data.rs:5:
        frames stay on the GPU; the host never reads pixels back). Pass
        fetch=True (or np.asarray the result) to materialize on the host.
        With timed=True, synchronizes on a single-pixel checksum (a ~3 B
        transfer that forces the whole frame — `block_until_ready` alone can
        return early through the remote-TPU tunnel) and records the pass
        time into Statistics."""
        t = self.elapsed if time is None else time
        if self.cfg.debug_type == 0:
            return self._render_raster(camera, t, timed=timed, fetch=fetch)
        # dynamic world: the per-frame SVT colorize/blur pass on one partial
        # brick, round-robin (renderer.rs:581-609 / voxel_interesting_compute)
        if self.svt is not None and self.svt.num_bricks > 0:
            from vvr_tpu.world.bricks import svt_update_brick
            slot = self.frame_count % self.svt.num_bricks
            self.svt.bricks = svt_update_brick(
                self.svt.bricks, jax.numpy.int32(slot), self.svt.origins[slot])
        # animated point lights (renderer.rs:494-505)
        self.scene.animate_lights(camera.position, t, 1.0 / 60.0)
        o, d = camera_rays(camera, self.cfg.render_width, self.cfg.render_height)
        accel = (self.scene.jumpgrid if self.use_jump
                 else self.scene.jumpgrid2 if self.use_jump2
                 else self.scene.paged if self.use_paged
                 else self.scene.ensure_pyramid())
        needs_overlap = (self.cfg.ambient_occlusion
                         and self.cfg.ao_mode == "overlap"
                         and (self.use_jump or self.use_jump2
                              or self.use_paged))
        raster = None
        if self.use_raster:
            right, up, forward = camera.basis()
            tan_half = np.float32(np.tan(np.radians(camera.fov) / 2.0))
            rcam = (jax.numpy.asarray(camera.position, np.float32),
                    jax.numpy.asarray(right, np.float32),
                    jax.numpy.asarray(up, np.float32),
                    jax.numpy.asarray(forward, np.float32),
                    jax.numpy.float32(tan_half))
            # camera-inside-solid probe: host chunk lookup (same clip
            # semantics as ops/traverse.solid_at) — no device structure
            # and no per-frame micro-dispatch through the tunnel
            probe = jax.numpy.asarray(
                self.scene.solid_at_host(camera.position))
            raster = (self.scene.faces, rcam, probe)
        raster_cap = self._raster_cap() if raster is not None else None
        sunmask = self._sunmask() if self.use_sunmask else None
        sky = self._sky(t)
        t0 = _time.monotonic()
        (img, _hdr), retried = _call_jit_selfhealing(
            render_frame,
            accel, o, d, jax.numpy.asarray(self.sun),
            jax.numpy.float32(t), self.cfg,
            svt_density=self.scene.density if self.cfg.ambient_occlusion else None,
            mirror_materials=self.mirror_materials,
            lights=jax.numpy.asarray(self.scene.lights)
            if self.cfg.point_lights else None,
            overlap_pyr=self.scene.ensure_pyramid() if needs_overlap
            else None,
            raster=raster, sunmask=sunmask, sky=sky,
            raster_cap=raster_cap)
        return self._finish_frame(img, t0, timed, fetch, tainted=retried)

    def _sky(self, t: float):
        """Cross-frame sky/cloud texture cache (cfg.sky_cache_quantum):
        the textures depend only on (sun, time); quantizing time means the
        ~28 ms of sky passes amortize across frames instead of riding every
        one. Quantum 0 disables (per-frame regeneration inside the jit,
        the reference's behavior minus its 1-frame latency)."""
        q = self.cfg.sky_cache_quantum
        if q <= 0.0:
            return None
        from vvr_tpu.ops import sky as sky_ops
        tq = float(int(t / q) * q)
        key = (self.sun[:3].tobytes(), tq)
        cache = getattr(self, "_sky_cache", None)
        if cache is None or cache[0] != key:
            sun = jax.numpy.asarray(self.sun[:3])
            tj = jax.numpy.float32(tq)
            sky = (sky_ops.write_skybox(sun, tj, self.cfg.skybox_resolution),
                   sky_ops.write_clouds(sun, tj, self.cfg.clouds_resolution))
            self._sky_cache = (key, sky)
        return self._sky_cache[1]

    def set_sun_dragging(self, dragging: bool):
        """Interactive sun control (middle-mouse drag, app.py): while held,
        _sunmask builds REDUCED-resolution grids (512^2 instead of 2048^2,
        ~10x cheaper per sun direction) so dragging stays interactive;
        the full-resolution grids are rebuilt on release. Classification
        stays conservative at any resolution — lower resolution only
        widens the ambiguous residue the exact DDA absorbs, so frames
        remain exact throughout the drag. (The reference's middle-mouse
        sun, src/renderer.rs:455-457, is instant because it has no
        sun-dependent structure at all.)"""
        self._sun_dragging = bool(dragging)

    def _sunmask(self):
        """Conservative sun-space occlusion grids, rebuilt when the sun
        direction OR the world changes (middle-mouse / --sun / edits —
        the scene epoch is part of the cache key; ops/sunshadow.py).
        On tile-entry overflow the build retries with a doubled cap
        (each cap is its own jit specialization) — gridC must see every
        occluder face or light-certainty would not be conservative."""
        lo = getattr(self, "_sun_dragging", False)
        cone = self.cfg.shadow_samples > 1
        key = (self.sun[:3].tobytes(), getattr(self.scene, "epoch", 0),
               lo, cone)
        if self._sunmask_cache is None or self._sunmask_cache[0] != key:
            from vvr_tpu.ops.sunshadow import (CONE_TAN, GRID,
                                               build_sun_grids, sun_basis)
            e1, e2, s = sun_basis(self.sun[:3])
            e1j = jax.numpy.asarray(e1)
            e2j = jax.numpy.asarray(e2)
            grid_res = 512 if lo else GRID
            cap = (1 << 17) if lo else (1 << 20)
            while True:
                grids, gok = build_sun_grids(
                    self.scene.ensure_faces(), e1j, e2j,
                    jax.numpy.asarray(s), self.scene.size,
                    grid=grid_res, cap_entries=cap,
                    cone_tan=CONE_TAN if cone else 0.0)
                if bool(gok) or cap >= (1 << 26):
                    break
                log.warning("sun-grid entry allocation overflowed at cap "
                            "%d; rebuilding with %d", cap, cap * 2)
                cap *= 2
            self._sunmask_cache = (key, (e1j, e2j, grids))
        return self._sunmask_cache[1]

    def apply_edits(self, editor, positions, solid: bool) -> dict:
        """Per-frame structural edits (BASELINE config 5). The reference's
        edit path is a disabled full tree rebuild (src/renderer.rs:362-369,
        FIXME src/voxel/sparse.rs:314-318); here the WorldEditor patches
        every attached structure incrementally (pyramid / jump grid /
        paged pool spans / per-region face slots) and the sun-grid cache
        is repaired CONSERVATIVELY — edited texels are marked ambiguous
        (ops/sunshadow.invalidate_sun_texels) so the exact DDA absorbs
        them, instead of paying the full grid rebuild per edit; the full
        rebuild happens lazily on the next sun move (cache key epoch).
        Returns {"patched_rows", "edit_ms"} (dispatch latency; the frame
        call that follows synchronizes)."""
        t0 = _time.monotonic()
        positions = np.atleast_2d(np.asarray(positions, np.int64))
        n = editor.set_voxels(positions, solid)
        t_sv = _time.monotonic()
        if editor.pyramid is not None:
            self.scene.pyramid = editor.pyramid
        if getattr(editor, "paged", None) is not None:
            self.scene.paged = editor.paged
        if editor.jumpgrid is not None:
            self.scene.jumpgrid = editor.jumpgrid
        if editor.faces is not None:
            self.scene.faces = editor.faces
        self.scene.epoch += 1
        self.scene._chunk_index = None     # edits may create chunks
        if self.use_sunmask and self._sunmask_cache is not None:
            from vvr_tpu.ops.sunshadow import (CONE_TAN,
                                               invalidate_sun_texels,
                                               sun_basis)
            e1j, e2j, grids = self._sunmask_cache[1]
            _, _, s = sun_basis(self.sun[:3])
            cone = self.cfg.shadow_samples > 1
            grids = invalidate_sun_texels(
                grids, np.asarray(e1j), np.asarray(e2j), s, positions,
                self.scene.size, CONE_TAN if cone else 0.0)
            lo = getattr(self, "_sun_dragging", False)
            key = (self.sun[:3].tobytes(), self.scene.epoch, lo, cone)
            self._sunmask_cache = (key, (e1j, e2j, grids))
        return {"patched_rows": int(n),
                "edit_ms": (_time.monotonic() - t0) * 1e3,
                "set_voxels_ms": round((t_sv - t0) * 1e3, 1),
                "invalidate_ms": round((_time.monotonic() - t_sv) * 1e3,
                                       1),
                **getattr(editor, "last_timings", {})}

    def _finish_frame(self, img, t0, timed: bool, fetch: bool,
                      tainted: bool = False):
        if timed:
            np.asarray(img[-1, -1])  # sync: forces the frame, transfers 3 B
            self.stats.push_timing((_time.monotonic() - t0) * 1e3,
                                   tainted=tainted)
        self.frame_count += 1
        res = self.stats.end_of_frame(self.frame_count)
        if res is not None:
            log.info("Sample Count: %d, Avg: %.3fms, StdDev: %.4f",
                     res["samples"], res["avg_ms"], res["stddev"])
        return np.asarray(img) if fetch else img

    @property
    def mesh(self):
        """Surface-nets world mesh for the raster path (built lazily;
        src/voxel/meshes.rs via world/mesher.py)."""
        if getattr(self, "_mesh", None) is None:
            from vvr_tpu.world.mesher import VoxelMeshBuffers
            self._mesh = VoxelMeshBuffers.build(self.scene.chunks)
        return self._mesh

    def _render_raster(self, camera: Camera, t: float, timed: bool,
                       fetch: bool):
        """The debug_type == 0 rasterization path (renderer.rs:694-771)."""
        from vvr_tpu.render.raster import raster_debug_frame
        t0 = _time.monotonic()
        img = raster_debug_frame(self.mesh, self.scene.ensure_pyramid(),
                                 camera, jax.numpy.asarray(self.sun), t,
                                 self.cfg)
        return self._finish_frame(img, t0, timed, fetch)

    def profile_frame(self, camera: Camera, trace_dir: str = "/tmp/vvr_trace"):
        """Capture one frame under jax.profiler (the timestamp-query
        analog on steroids; open with tensorboard/perfetto)."""
        self.render(camera, timed=True)  # ensure compiled outside the trace
        with jax.profiler.trace(trace_dir):
            img = self.render(camera, timed=True)
        log.info("profile written to %s", trace_dir)
        return img

    def memory_report(self) -> dict:
        """Device-buffer size report (the J-key gpu-allocator report analog,
        src/renderer.rs:451-454)."""
        rep = {}
        if self.scene.pyramid is not None:
            rep["pyramid_rows_mb"] = self.scene.pyramid.rows.nbytes / 2 ** 20
        if self.scene.jumpgrid is not None:
            rep["jumpgrid_rows_mb"] = self.scene.jumpgrid.rows.nbytes / 2 ** 20
        if getattr(self.scene, "paged", None) is not None:
            rep["paged_mb"] = self.scene.paged.memory_bytes() / 2 ** 20
        if self.scene.density is not None:
            rep["density_mb"] = self.scene.density.nbytes / 2 ** 20
        if self.svt is not None:
            rep["svt_bricks_mb"] = self.svt.bricks.nbytes / 2 ** 20
        rep["lights_kb"] = self.scene.lights.nbytes / 1024
        return rep

    def benchmark(self, camera: Camera, duration_s: float = 2.0,
                  warmup: int = 2) -> dict:
        """Timed capture (reference L-key benchmark, statistics.rs:43-64)."""
        for _ in range(warmup):
            self.render(camera, timed=True)
        self.stats.benchmark_duration_s = duration_s
        self.stats.start_benchmarking(self.frame_count)
        # terminal condition mirrors statistics.rs:43-64: end_of_frame
        # returns the result dict exactly once when the capture window (which
        # skips the first ROLLING frames) elapses; loop until that frame.
        result = None
        while self.stats.benchmark is not None:
            self.render(camera, timed=True)
            result = self.stats.last_result
        assert result is not None
        result = dict(result)
        result["mrays_per_s"] = mrays_per_sec(self.rays_per_frame,
                                              result["avg_ms"])
        result["fps"] = 1000.0 / result["avg_ms"]
        self.stats.last_result = None
        return result
