"""Round-4 budget: profile the flagship frame + its two heaviest passes
(post, masked shadow) with jax.profiler and print per-scope / per-op sums.

Reuses measure_passes.py's exact pass constructions so the compile cache
from that run stays warm. Prints JSON lines; run on TPU.
"""
from __future__ import annotations

import sys, pathlib, time, json, glob, gzip, os, re, shutil
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.ops.raygen import camera_rays
from vvr_tpu.utils.camera import Camera
from vvr_tpu.world.generator import assemble_dense, generate_world
from vvr_tpu.world.jumpgrid import build_jump_grid
from vvr_tpu.world.pyramid import build_brick_pyramid
from vvr_tpu.world.faces import extract_merged_faces
from vvr_tpu.ops.traverse import solid_at
from vvr_tpu.ops.sunshadow import sun_basis, build_sun_grids
from vvr_tpu.ops import sky as sky_ops
from vvr_tpu.ops import post as post_ops
from vvr_tpu.render.frame import render_frame


def analyze(trace_dir: str, label: str, top: int = 30):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace under", trace_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    buckets = {}
    scopes = {}
    total = 0.0
    for e in events:
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        if "long_name" not in args and "hlo_op" not in args and \
                not re.match(r"^(fusion|copy|gather|scatter|while|"
                             r"dynamic|custom|convert|reduce|select|"
                             r"broadcast|iota|transpose|slice|concatenate|"
                             r"bitcast|add|multiply|compare|and|or|tuple|"
                             r"pad|reshape|rng|sort|cumsum|exp|log|power)",
                             name):
            continue
        dur = e["dur"] / 1e3
        total += dur
        key = re.sub(r"[.\d]+$", "", name)
        buckets[key] = buckets.get(key, 0.0) + dur
        sc = args.get("scope", "") or args.get("tf_op", "")
        if sc:
            scopes[sc] = scopes.get(sc, 0.0) + dur
    print(json.dumps({"label": label, "device_total_ms": round(total, 1)}),
          flush=True)
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:9.1f} ms  {k}", flush=True)
    if scopes:
        print(f"--- {label}: by scope ---", flush=True)
        for k, v in sorted(scopes.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {v:9.1f} ms  {k}", flush=True)
    # biggest single events with long names (shapes)
    singles = sorted(
        (e for e in events if (e.get("args") or {}).get("long_name")),
        key=lambda e: -e["dur"])[:12]
    print(f"--- {label}: biggest single ops ---", flush=True)
    for e in singles:
        ln = e["args"]["long_name"][:180]
        print(f"  {e['dur']/1e3:9.1f} ms  {e['name']}  {ln}", flush=True)


def prof(fn, label):
    r = fn(); jax.block_until_ready(r)
    t0 = time.monotonic()
    r = fn(); jax.block_until_ready(r)
    wall = (time.monotonic() - t0) * 1e3
    td = f"/tmp/jaxtrace_r4_{label}"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        r = fn(); jax.block_until_ready(r)
    print(json.dumps({"label": label, "wall_ms": round(wall, 1)}), flush=True)
    analyze(td, label)


def main():
    wcfg = WorldConfig(depth=4)
    occ = assemble_dense(generate_world(wcfg), wcfg.size)
    size = wcfg.size
    cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
    W, H = 1920, 1080
    o, d = camera_rays(cam, W, H)
    sun = np.array([-0.28, 0.65, -0.71], np.float32)
    sun /= np.linalg.norm(sun)
    sun_j = jnp.asarray(sun)

    fd = extract_merged_faces(occ)
    fdt = fd.device_tuple()
    grid = build_jump_grid(occ)
    pyr = build_brick_pyramid(occ)
    right, up, fwd = cam.basis()
    th = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    ct = (jnp.asarray(cam.position, jnp.float32),
          jnp.asarray(right, jnp.float32), jnp.asarray(up, jnp.float32),
          jnp.asarray(fwd, jnp.float32), jnp.float32(th))
    probe = solid_at(pyr, jnp.asarray(cam.position, jnp.float32))
    e1, e2, s = sun_basis(sun)
    e1j, e2j = jnp.asarray(e1), jnp.asarray(e2)
    grids, gok = build_sun_grids(fdt, e1j, e2j, jnp.asarray(s), size,
                                 cap_entries=1 << 20)
    clouds_tex = sky_ops.write_clouds(sun_j, 0.0, 512)
    skybox = sky_ops.write_skybox(sun_j, 0.0, 256)
    cfg = RenderConfig(width=W, height=H, shadow_samples=1,
                       max_ray_iterations=3)
    sun4 = jnp.concatenate([sun_j, jnp.zeros((1,), jnp.float32)])

    def full_frame():
        img, hdr = render_frame(grid, o, d, sun4, jnp.float32(0.0), cfg,
                                raster=(fdt, ct, probe),
                                sunmask=(e1j, e2j, grids),
                                sky=(skybox, clouds_tex))
        return img
    prof(jax.jit(full_frame), "full_frame")

    # post alone (planar, as the frame runs it)
    hdr_p = jnp.zeros((4, H, W), jnp.float32)

    @jax.jit
    def postp2(h_):
        bl = post_ops.bloom_pyramid_p(h_)
        return post_ops.composite_p(h_, bl, H, W, 0.05, True)
    prof(lambda: postp2(hdr_p), "post_planar")


if __name__ == "__main__":
    main()
