"""BASELINE configs 4 & 5 benchmarks (VERDICT r2 item #4).

Config 4: 256^3, 1080p, 4-bounce mirrors + AO + soft shadows (4 jittered
samples) + post — the reference's max-quality knobs (src/main.rs:37-47).
Config 5: dynamic world at 1080p at the LARGE scale. The tree is 4-ary
(sizes 4^depth: 64/256/1024), so the "512^3" staging config quantizes UP
to the reference's own flagship scale 1024^3 (src/voxel/util.rs:5-6).
Runs both the pyramid path (the previous default above 320^3) and the
forced jump grid (--traversal jump) to measure the large-world structure
choice.

Usage: python tools/bench_scale.py [4|5|both]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timed_frames(r, cam, n=4):
    r.render(cam, timed=True)          # compile
    r.render(cam, timed=True)          # warm
    t0 = time.monotonic()
    for i in range(n):
        r.render(cam, time=i / 60.0, timed=True)
    return (time.monotonic() - t0) / n * 1e3


def config4():
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=4,
                       max_ray_iterations=4, ambient_occlusion=True)
    t0 = time.monotonic()
    r = Renderer(WorldConfig(depth=4), cfg, mirror_materials=True)
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0],
                         fov=85.0)
    ms = timed_frames(r, cam)
    rays = r.rays_per_frame  # primary + 4 shadow samples per pixel
    print(json.dumps({
        "config": 4, "desc": "256^3 1080p 4-bounce+AO+soft-shadows(4)",
        "frame_ms": round(ms, 1), "fps": round(1e3 / ms, 2),
        "mrays": round(rays / ms / 1e3, 2),
        "setup_s": round(time.monotonic() - t0, 1)}), flush=True)


def _brush(ed, center, radius=3):
    """Voxel ball positions around integer center (the config-5 brush)."""
    import numpy as np
    r_ = int(radius)
    g = np.mgrid[-r_:r_ + 1, -r_:r_ + 1, -r_:r_ + 1].reshape(3, -1).T
    g = g[(g ** 2).sum(1) <= r_ * r_]
    return np.asarray(center, np.int64)[None] + g


def config5(traversal: str, edits: bool = True, frames: int = 8):
    """BASELINE config 5 — 1024^3 dynamic world at 1080p WITH per-frame
    structural edits (BASELINE.md: 'dynamic ... world with per-frame
    edits'): every frame a voxel-ball brush lands on / lifts off the
    terrain (alternating), the WorldEditor patches the paged pool spans +
    per-region face slots incrementally, the sun-grid cache is repaired by
    texel invalidation, and the frame renders from the patched structures
    (the reference's edit path is a disabled FULL rebuild —
    src/voxel/sparse.rs:314-318). Reports edit_ms (patch dispatch) and
    frame_ms (edit + render, synced)."""
    import numpy as np
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.utils.camera import Camera
    from vvr_tpu.world.edit import WorldEditor
    cfg = RenderConfig(width=1920, height=1080, shadow_samples=1,
                       max_ray_iterations=3, traversal=traversal)
    t0 = time.monotonic()
    r = Renderer(WorldConfig(depth=5), cfg, dynamic_world=True)
    ed = None
    if edits:
        ed = WorldEditor(r.scene.chunks, None, size=r.scene.size)
        if r.use_paged:
            r.scene.paged = ed.attach_paged()
        if r.use_jump:
            ed.attach_jump_grid(r.scene.ensure_jumpgrid())
        if r.use_raster or r.use_sunmask:
            r.scene.faces = ed.attach_faces_incremental()
    print(json.dumps({"config": 5, "stage": "setup",
                      "traversal": traversal, "edits": edits,
                      "use_jump": r.use_jump, "use_raster": r.use_raster,
                      "use_paged": r.use_paged,
                      "use_sunmask": r.use_sunmask,
                      "setup_s": round(time.monotonic() - t0, 1)}),
          flush=True)
    cam = Camera.look_at([512.0, 400.0, 80.0], [512.0, 80.0, 720.0],
                         fov=85.0)
    if not edits:
        ms = timed_frames(r, cam)
        rays = r.rays_per_frame
        print(json.dumps({
            "config": 5, "desc": f"1024^3 dynamic 1080p ({traversal})",
            "frame_ms": round(ms, 1), "fps": round(1e3 / ms, 2),
            "mrays": round(rays / ms / 1e3, 2),
            "mem": r.memory_report()}), flush=True)
        return
    # brush lands where the camera looks: a surface column mid-view
    occ = ed.occupancy()
    bx, bz = 512, 400
    col = np.nonzero(occ[:, :, bx][:, bz])[0]  # occ[z,y,x] -> y column
    by = (int(col.max()) if len(col) else 100) + 4
    import gc

    import jax

    r.render(cam, timed=True)   # compile
    r.render(cam, timed=True)   # warm
    # warm BOTH edit parities before measuring: the add and the remove
    # compile different patch-op sets (round-5 diag: 23 s / 53 s cold,
    # ~3 s warm), and the remove's new hole faces exercise the slot
    # rebase path once
    info = r.apply_edits(ed, _brush(ed, (bx, by, bz)), True)
    print(json.dumps({"config": 5, "warm_add": info}), flush=True)
    r.render(cam, timed=True)
    info = r.apply_edits(ed, _brush(ed, (bx, by, bz)), False)
    print(json.dumps({"config": 5, "warm_remove": info}), flush=True)
    r.render(cam, timed=True)
    # one more add: the remove's slot REBASE leaves the next add's
    # region re-extraction cold (measured 2.8 s first time, ~50 ms after)
    info = r.apply_edits(ed, _brush(ed, (bx, by, bz)), True)
    print(json.dumps({"config": 5, "warm_add2": info}), flush=True)
    r.render(cam, timed=True)
    edit_ms, frame_ms = [], []
    for i in range(frames):
        solid = (i % 2 == 0)
        gc.collect()    # edits re-create device structures each frame;
                        # stale buffers through the axon tunnel trip a
                        # transient `TPU backend error (InvalidArgument)`
                        # at paged scale (PROGRESS.md round-3 note)
        t1 = time.monotonic()
        info = r.apply_edits(ed, _brush(ed, (bx, by, bz)), solid)
        try:
            img = r.render(cam, time=i / 60.0, timed=True)
        except Exception as e:   # noqa: BLE001 — axon transient; retry
            print(json.dumps({"config": 5, "retry_frame": i,
                              "err": str(e)[:120]}), flush=True)
            jax.clear_caches()
            gc.collect()
            t1 = time.monotonic()
            info = r.apply_edits(ed, _brush(ed, (bx, by, bz)), solid)
            img = r.render(cam, time=i / 60.0, timed=True)
        frame_ms.append((time.monotonic() - t1) * 1e3)
        edit_ms.append(info["edit_ms"])
    frame_ms.sort()
    edit_ms.sort()
    rays = r.rays_per_frame
    med = frame_ms[len(frame_ms) // 2]
    print(json.dumps({
        "config": 5,
        "desc": f"1024^3 dynamic 1080p ({traversal}) + per-frame edits",
        "frame_ms": round(med, 1),
        "edit_ms": round(edit_ms[len(edit_ms) // 2], 1),
        "fps": round(1e3 / med, 2),
        "mrays": round(rays / med / 1e3, 2),
        "brush_voxels": int(len(_brush(ed, (bx, by, bz)))),
        "mem": r.memory_report()}), flush=True)


if __name__ == "__main__":
    # one variant per process: two flagship-scale specializations in one
    # process tripped transient TPU InvalidArgument errors on the second
    # (suspected device-buffer accumulation through the axon tunnel)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("4", "both"):
        config4()
    if which in ("5", "both"):
        config5("jump")
    if which in ("5p", "both-p"):
        config5("pyramid")
    if which.startswith("5:"):       # e.g. 5:paged, 5:auto
        config5(which[2:])
