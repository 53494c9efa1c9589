"""Time each stage of the config-5 (1024^3 dynamic) Renderer setup —
the measured 1768 s setup (tools/bench_scale.py 5:paged, 2026-08-19) is
~27% of an hour per iteration and needs an owner.

Usage: python tools/time_setup.py [depth] [traversal]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax


def stage(name, t0):
    t1 = time.monotonic()
    print(f"{name}: {t1 - t0:.1f}s", flush=True)
    return t1


def main(depth: int, traversal: str):
    from vvr_tpu.config import WorldConfig
    from vvr_tpu.render.scene import build_scene
    from vvr_tpu.world.bricks import build_svt
    from vvr_tpu.world.generator import assemble_dense

    wcfg = WorldConfig(depth=depth)
    t0 = time.monotonic()
    scene = build_scene(wcfg, with_density=False, with_pyramid=False)
    t0 = stage("build_scene", t0)
    svt = build_svt(scene.chunks, scene.size)
    jax.block_until_ready(svt.bricks)
    t0 = stage("build_svt", t0)
    dense = assemble_dense(scene.chunks, scene.size)
    t0 = stage("assemble_dense", t0)
    if traversal == "paged":
        from vvr_tpu.world.paged import build_paged_grid
        g = build_paged_grid(dense)
        jax.block_until_ready(g.pool)
    else:
        from vvr_tpu.world.jumpgrid import build_jump_grid
        g = build_jump_grid(dense)
        jax.block_until_ready(g.cells)
    t0 = stage(f"build_{traversal}", t0)
    from vvr_tpu.world.faces import extract_merged_faces
    fs = extract_merged_faces(dense)
    t0 = stage("extract_merged_faces(host)", t0)
    faces = fs.device_tuple()
    jax.block_until_ready(faces[0])
    t0 = stage("faces_to_device", t0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5,
         sys.argv[2] if len(sys.argv) > 2 else "paged")
