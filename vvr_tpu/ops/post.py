"""Post-processing: bloom mip chain + compositor (ACES, gamma, upscale).

Re-implements shaders/post_process_compute.slang as jitted passes. The
reference samples with a bilinear sampler at fixed sub-texel phases
(bloom_downsample :86-100 taps uv=((2i)+(dx,dy)+1)/prev_res — half-texel
coordinates; bloom_upsample :102-116 taps uv=((i)+(x,y))*0.5/prev_res). On
TPU, per-pixel `gather` is ~10 ns/element, so instead of emulating the
sampler with gathers, every tap is expressed as EDGE-PADDED STRIDED SLICING
(the phases are fixed, so each tap is an axis-shifted average of whole
arrays) — zero gathers, pure VPU.

Layout: all internal passes run PLANAR (C, H, W). TPU tiles the two minor
dims as (8 sublanes, 128 lanes); the natural (H, W, 4) image puts the
4-channel axis in the lanes — 4/128 utilization for every cross-channel
op (measured 72 ms for this file's passes at 1080p; planar ~7 ms). The
channel-minor public API is kept as thin transposing wrappers; per-element
arithmetic is identical, so outputs are bit-equal.

Semantics preserved from the reference:
  * downsample: 9 taps on the half-texel grid, each kept only when
    length(rgba) > 0.6 (alpha participates: the sky's alpha=10 is what makes
    the sky bloom), clamped to [0,1000], sum/9; mip 1 is built from the
    rendered image (src/constant_data.rs:360-380).
  * upsample: 4 tent taps, overwriting mips N-2..2 from the mip above
    (src/renderer.rs:965-1020) — the final bloom lives in mip 2.
  * compositor (:22-75): integer upscale by the downscale factor + bilinear
    bloom fetch from mip 2 (jax.image.resize-free — phase-interleaved
    slicing) * 0.05, ACES tonemap, gamma 1/2.2.

Mip count = ilog2(min(W,H)) - 2 (src/constant_data.rs:253).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from vvr_tpu.ops.shade import aces

F32 = jnp.float32


def bilinear_sample(img, u, v):
    """Gather-based bilinear sampler (clamp-to-edge, texel centers at
    (k+0.5)/res — src/samplers.rs:10-19). Kept for irregular lookups
    (tests, debug); the bloom passes below never call it."""
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
    return max(int(math.log2(min(width, height))) - 2, 3)


def _mip_size(size: int, mip: int) -> int:
    return max(size >> mip, 1)


def _half_grid(img):
    """Averages of adjacent texel pairs: the half-texel sample lattice.
    img (C, h, w) -> (C, h+1, w+1): H[a, b] = bilinear sample at texel
    coordinate (a - 0.5, b - 0.5) with clamp-to-edge."""
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="edge")
    hy = 0.5 * (p[:, :-1] + p[:, 1:])        # (C, h+1, w+2)
    return 0.5 * (hy[:, :, :-1] + hy[:, :, 1:])  # (C, h+1, w+1)


def _length4(t):
    """length(rgba) with the reduction order of the channel-minor original
    (left-to-right over channels) so wrappers stay bit-equal."""
    return jnp.sqrt(((t[0] * t[0] + t[1] * t[1]) + t[2] * t[2])
                    + t[3] * t[3])


def bloom_downsample(prev, next_h: int, next_w: int):
    """One downsample pass: prev (C, h, w) -> (C, next_h, next_w).
    Tap (dx, dy) in {-1,0,1}^2 samples texel coords (2j+dy+0.5, 2i+dx+0.5),
    i.e. half-grid entry (2j+dy+1, 2i+dx+1).

    The thresholded keep/clip is a PER-ENTRY property of the half-grid, so
    the 9-tap sum is a 3x3 stride-2 window sum over the thresholded grid —
    one reduce_window instead of 9 stride-2-phase slices (each such slice
    forced a full layout-relayout copy; the slice-based pass measured
    55 ms device at 1080p, the window sum ~1 ms — round-4 profile)."""
    hg = _half_grid(prev)                    # (C, h+1, w+1)
    keep = _length4(hg) > 0.6
    kept = jnp.where(keep[None], jnp.clip(hg, 0.0, 1000.0), 0.0)
    # out[j, i] = sum_{dy,dx in 0..2} kept[2j+dy, 2i+dx]: window origin
    # (2j, 2i) covers half-grid entries (2j+dy+1, 2i+dx+1) shifted by -1 —
    # exactly the 9 taps. Edge-pad so every window is full.
    pad_y = max(2 * next_h + 2 - kept.shape[1], 0)
    pad_x = max(2 * next_w + 2 - kept.shape[2], 0)
    if pad_y or pad_x:
        kept = jnp.pad(kept, ((0, 0), (0, pad_y), (0, pad_x)), mode="edge")
    s = jax.lax.reduce_window(kept, 0.0, jax.lax.add, (1, 3, 3), (1, 2, 2),
                              "valid")
    return s[:, :next_h, :next_w] / 9.0


def _up2_axis1(a_exact, a_mid):
    """Upsample 2x along axis 1 of (C, n, w): out[:, 2k] = 0.5*(mid[k] +
    exact[k]), out[:, 2k+1] = 0.5*(exact[k] + mid[k+1])."""
    c, n0 = a_exact.shape[0], a_exact.shape[1]
    even = 0.5 * (a_mid[:, :n0] + a_exact)
    odd = 0.5 * (a_exact + a_mid[:, 1:n0 + 1])
    return jnp.stack([even, odd], axis=2).reshape(
        (c, 2 * n0) + a_exact.shape[2:])


def bloom_upsample(prev, next_h: int, next_w: int):
    """One upsample pass: coarser mip `prev` (C, h, w) -> (C, nh, nw).
    Tap (x, y) in {0,1}^2 samples texel coords ((i+x)/2 - 0.5, ...): for even
    output index that is (k - 0.5, exact k); interleave the two phases."""
    py = jnp.pad(prev, ((0, 0), (1, 1), (0, 0)), mode="edge")
    my = 0.5 * (py[:, :-1] + py[:, 1:])      # (C, h+1, w): M rows
    uy = _up2_axis1(prev, my)                # (C, 2h, w)
    pux = jnp.pad(uy, ((0, 0), (0, 0), (1, 1)), mode="edge")
    mux = 0.5 * (pux[:, :, :-1] + pux[:, :, 1:])
    ux = _up2_axis1(uy.transpose(0, 2, 1),
                    mux.transpose(0, 2, 1)).transpose(0, 2, 1)
    out = ux[:, :next_h, :next_w]
    pad_y = max(0, next_h - out.shape[1])
    pad_x = max(0, next_w - out.shape[2])
    if pad_y or pad_x:
        out = jnp.pad(out, ((0, 0), (0, pad_y), (0, pad_x)), mode="edge")
    return jnp.where(jnp.isnan(out), 0.0, out)  # NaN guard (slang :113)


def bloom_pyramid_p(rendered):
    """Full bloom chain on a planar image; returns the mip-2 bloom image.

    rendered: (4, H, W) f32 linear rgba (alpha = the reference's alpha
    channel: 10 on sky miss, ~0 otherwise)."""
    h, w = rendered.shape[1], rendered.shape[2]
    n_mips = bloom_mip_count(w, h)
    mips = [rendered]
    for m in range(1, n_mips):
        mips.append(bloom_downsample(mips[m - 1], _mip_size(h, m),
                                     _mip_size(w, m)))
    for m in range(n_mips - 2, 1, -1):
        mips[m] = bloom_upsample(mips[m + 1], _mip_size(h, m),
                                 _mip_size(w, m))
    return mips[2]


def bloom_pyramid(rendered):
    """Channel-minor wrapper: (H, W, 4) -> (H/4, W/4, 4)."""
    return jnp.transpose(
        bloom_pyramid_p(jnp.transpose(rendered, (2, 0, 1))), (1, 2, 0))


def _up2_phases_axis1(a):
    """4x upsample along axis 1 of (C, n, ...) with bilinear texel-center
    phases: output j maps to input (j + 0.5)/4 - 0.5; phases j%4 = 0..3
    give weights (3/8,5/8) (1/8,7/8) (7/8,1/8) (5/8,3/8)."""
    n0 = a.shape[1]
    pa = jnp.pad(a, ((0, 0), (1, 1)) + ((0, 0),) * (a.ndim - 2),
                 mode="edge")
    prev = pa[:, :-2]
    cur = pa[:, 1:-1]
    nxt = pa[:, 2:]
    ph0 = 0.375 * prev + 0.625 * cur
    ph1 = 0.125 * prev + 0.875 * cur
    ph2 = 0.875 * cur + 0.125 * nxt
    ph3 = 0.625 * cur + 0.375 * nxt
    out = jnp.stack([ph0, ph1, ph2, ph3], axis=2)
    return out.reshape((a.shape[0], 4 * n0) + a.shape[2:])


def _upsample4_bilinear(img, out_h: int, out_w: int):
    """Exact 4x bilinear upsample (texel centers) of (C, h, w),
    phase-interleaved via pad/stack/reshape — jax.image.resize emits
    pathological scalar-loop index ops on TPU (~12 ms per 1-D iota fusion,
    measured)."""
    uy = _up2_phases_axis1(img)
    ux = _up2_phases_axis1(uy.transpose(0, 2, 1)).transpose(0, 2, 1)
    out = ux[:, :out_h, :out_w]
    pad_y = max(0, out_h - out.shape[1])
    pad_x = max(0, out_w - out.shape[2])
    if pad_y or pad_x:
        out = jnp.pad(out, ((0, 0), (0, pad_y), (0, pad_x)), mode="edge")
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "bloom_strength",
                                             "bloom_enabled"))
def composite_p(rendered, bloom_mip2, out_h: int, out_w: int,
                bloom_strength: float = 0.05, bloom_enabled: bool = True):
    """Final frame from planar inputs rendered (4, rh, rw) and bloom mip 2
    (4, rh/4, rw/4): upscale + bloom + ACES + gamma -> (out_h, out_w, 3)
    u8 (channel-minor only at the final 6 MB relayout)."""
    rh, rw = rendered.shape[1], rendered.shape[2]
    colour = rendered[:3]
    if bloom_enabled:
        bloom = _upsample4_bilinear(bloom_mip2[:3], rh, rw)
        colour = colour + bloom * bloom_strength
    ldr = jnp.power(aces(colour), 1.0 / 2.2)
    img = (jnp.clip(ldr, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    if (out_h, out_w) != (rh, rw):
        sy = max(out_h // rh, 1)
        sx = max(out_w // rw, 1)
        img = jnp.repeat(jnp.repeat(img, sy, axis=1), sx, axis=2)
        img = img[:, :out_h, :out_w]
        pad_y = max(0, out_h - img.shape[1])
        pad_x = max(0, out_w - img.shape[2])
        if pad_y or pad_x:
            img = jnp.pad(img, ((0, 0), (0, pad_y), (0, pad_x)),
                          mode="edge")
    return jnp.transpose(img, (1, 2, 0))


def composite(rendered, bloom_mip2, out_h: int, out_w: int,
              bloom_strength: float = 0.05, bloom_enabled: bool = True):
    """Channel-minor wrapper: rendered (rh, rw, 4), bloom (rh/4, rw/4, 4)
    -> (out_h, out_w, 3) u8."""
    return composite_p(jnp.transpose(rendered, (2, 0, 1)),
                       jnp.transpose(bloom_mip2, (2, 0, 1)),
                       out_h, out_w, bloom_strength, bloom_enabled)
