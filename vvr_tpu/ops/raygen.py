"""Camera ray generation.

The reference reconstructs per-pixel rays in the megakernel from the pushed
inverse-projection/view matrix (shaders/raytracer.slang:110-119); here ray
generation is its own tiny jitted stage producing the wavefront's (o, d)
arrays from the camera basis — same pinhole geometry, expressed directly
(dir = normalize(fwd + u*tan(hfov/2)*right + v*tan(hfov/2)/aspect*up)).

Image convention: row 0 = top of image, +u right, +v up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vvr_tpu.utils.camera import Camera, horizontal_to_vertical

F32 = jnp.float32


def normalize_dirs(d):
    """Normalize (..., 3) directions with a FIXED op sequence.

    jnp.linalg.norm lowers shape-dependently (a (H,W,3) and a (N,3) norm
    differ by 1 ulp on ~5% of rows), which breaks the bit-equality contract
    between the wavefront's d array and per-fragment recomputation in
    ops/rastertrace.py. Every ray-direction producer must use THIS."""
    n = jnp.sqrt(d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]
                 + d[..., 2] * d[..., 2])
    return d / n[..., None]


@functools.partial(jax.jit, static_argnames=("width", "height"))
def generate_rays(position, right, up, forward, tan_half_h, width: int, height: int):
    """Returns (o, d): ((H*W, 3), (H*W, 3)) f32, row-major top-left first."""
    ratio = width / height
    u = (jnp.arange(width, dtype=F32) + 0.5) / width * 2.0 - 1.0
    v = 1.0 - (jnp.arange(height, dtype=F32) + 0.5) / height * 2.0  # top row v=+1
    tx = tan_half_h
    ty = tan_half_h / ratio
    du = u[None, :, None] * tx * right[None, None, :]
    dv = v[:, None, None] * ty * up[None, None, :]
    d = forward[None, None, :] + du + dv
    d = normalize_dirs(d)
    d = d.reshape(-1, 3)
    o = jnp.broadcast_to(position, d.shape)
    return o, d


def camera_rays(cam: Camera, width: int, height: int):
    right, up, forward = cam.basis()
    tan_half = np.float32(np.tan(np.radians(cam.fov) / 2.0))
    return generate_rays(jnp.asarray(cam.position, F32), jnp.asarray(right, F32),
                         jnp.asarray(up, F32), jnp.asarray(forward, F32),
                         tan_half, width, height)
