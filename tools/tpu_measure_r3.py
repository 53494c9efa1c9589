import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, json
import numpy as np, jax, jax.numpy as jnp
from vvr_tpu.config import RenderConfig, WorldConfig
from vvr_tpu.render.renderer import Renderer
from vvr_tpu.utils.camera import Camera

world_cfg = WorldConfig(depth=4)
cfg = RenderConfig(width=1920, height=1080, shadow_samples=1, max_ray_iterations=3)
r = Renderer(world_cfg, cfg)
cam = Camera.look_at([128.0, 100.0, 20.0], [128.0, 20.0, 180.0], fov=85.0)
print("use_jump", r.use_jump, "use_raster", r.use_raster, "use_sunmask", r.use_sunmask, flush=True)
t0=time.monotonic(); r.render(cam, timed=True); print("first frame (compile):", round(time.monotonic()-t0,1), "s", flush=True)
r.render(cam, timed=True)
n=8; t0=time.monotonic()
for i in range(n):
    r.render(cam, time=i/60.0, timed=True)
dt=(time.monotonic()-t0)/n
rays=r.rays_per_frame
print(json.dumps({"frame_ms": round(dt*1e3,2), "mrays": round(rays/dt/1e6,2), "fps": round(1/dt,2)}), flush=True)
