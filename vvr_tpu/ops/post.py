"""Post-processing: bloom mip chain + compositor (ACES, gamma, upscale).

Re-implements shaders/post_process_compute.slang as jitted passes:
  * bloom_downsample (:86-100): 9 bilinear taps at uv=((2i)+(dx,dy)+1)/prev_res
    over the previous mip, each tap kept only if length(rgba) > 0.6 (alpha
    participates — the reference's sky alpha of 10 is what makes the sky
    bloom), clamped to [0,1000], sum/9. Mip 1 is built from the rendered
    image itself (src/constant_data.rs:360-380).
  * bloom_upsample (:102-116): 4 bilinear taps at uv=((i)+(x,y))*0.5/prev_res,
    overwriting mips N-2..2 from the mip above (src/renderer.rs:965-1020) —
    the final bloom lives in mip 2 only, as in the reference.
  * write_swapchain_image (:22-75): integer upscale by the downscale factor,
    + bloom.Sample(uv, mip 2) * 0.05, ACES tonemap, gamma 1/2.2.

Mip count = ilog2(min(W,H)) - 2 (src/constant_data.rs:253).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vvr_tpu.ops.shade import aces

F32 = jnp.float32


def bilinear_sample(img, u, v):
    """Sample (H, W, C) at normalized uv with clamp-to-edge, texel centers at
    (k+0.5)/res — the reference's bloom sampler (src/samplers.rs:10-19)."""
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def bloom_mip_count(width: int, height: int) -> int:
    import math
    return max(int(math.log2(min(width, height))) - 2, 3)


def _mip_size(size: int, mip: int) -> int:
    return max(size >> mip, 1)


def bloom_downsample(prev, next_h: int, next_w: int):
    """One downsample pass: prev (h, w, 4) -> (next_h, next_w, 4)."""
    ph, pw = prev.shape[0], prev.shape[1]
    i = jnp.arange(next_w, dtype=F32)
    j = jnp.arange(next_h, dtype=F32)
    jx, ix = jnp.meshgrid(j, i, indexing="ij")
    acc = jnp.zeros((next_h, next_w, 4), F32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            u = (ix * 2 + dx + 1) / pw
            v = (jx * 2 + dy + 1) / ph
            tap = bilinear_sample(prev, u, v)
            keep = jnp.linalg.norm(tap, axis=-1, keepdims=True) > 0.6
            acc = acc + jnp.where(keep, jnp.clip(tap, 0.0, 1000.0), 0.0)
    return acc / 9.0


def bloom_upsample(prev, next_h: int, next_w: int):
    """One upsample pass: coarser mip `prev` -> (next_h, next_w, 4)."""
    ph, pw = prev.shape[0], prev.shape[1]
    i = jnp.arange(next_w, dtype=F32)
    j = jnp.arange(next_h, dtype=F32)
    jx, ix = jnp.meshgrid(j, i, indexing="ij")
    acc = jnp.zeros((next_h, next_w, 4), F32)
    for dy in (0, 1):
        for dx in (0, 1):
            u = (ix + dx) * 0.5 / pw
            v = (jx + dy) * 0.5 / ph
            acc = acc + bilinear_sample(prev, u, v)
    out = acc / 4.0
    return jnp.where(jnp.isnan(out), 0.0, out)  # NaN guard (slang :113)


def bloom_pyramid(rendered):
    """Full bloom chain; returns the mip-2 bloom image.

    rendered: (H, W, 4) f32 linear rgba (alpha = the reference's alpha
    channel: 10 on sky miss, ~0 otherwise)."""
    h, w = rendered.shape[0], rendered.shape[1]
    n_mips = bloom_mip_count(w, h)
    mips = [rendered]
    for m in range(1, n_mips):
        mips.append(bloom_downsample(mips[m - 1], _mip_size(h, m), _mip_size(w, m)))
    # upsample overwriting mips n-2 .. 2 (renderer.rs:973-1019)
    for m in range(n_mips - 2, 1, -1):
        mips[m] = bloom_upsample(mips[m + 1], _mip_size(h, m), _mip_size(w, m))
    return mips[2]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "bloom_strength",
                                             "bloom_enabled"))
def composite(rendered, bloom_mip2, out_h: int, out_w: int,
              bloom_strength: float = 0.05, bloom_enabled: bool = True):
    """Final frame: upscale + bloom + ACES + gamma -> (out_h, out_w, 3) u8."""
    rh, rw = rendered.shape[0], rendered.shape[1]
    sy = out_h // rh
    sx = out_w // rw
    ys = jnp.arange(out_h) // max(sy, 1)
    xs = jnp.arange(out_w) // max(sx, 1)
    src = rendered[jnp.clip(ys, 0, rh - 1)][:, jnp.clip(xs, 0, rw - 1)]
    colour = src[..., :3]
    if bloom_enabled:
        u = (jnp.arange(out_w, dtype=F32) // max(sx, 1)) / rw
        v = (jnp.arange(out_h, dtype=F32) // max(sy, 1)) / rh
        vv, uu = jnp.meshgrid(v, u, indexing="ij")
        bloom = bilinear_sample(bloom_mip2, uu, vv)[..., :3]
        colour = colour + bloom * bloom_strength
    ldr = jnp.power(aces(colour), 1.0 / 2.2)
    return (jnp.clip(ldr, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
