"""Post-processing: bloom mip chain + compositor (ACES, gamma, upscale).

Re-implements shaders/post_process_compute.slang as jitted passes. The
reference samples with a bilinear sampler at fixed sub-texel phases
(bloom_downsample :86-100 taps uv=((2i)+(dx,dy)+1)/prev_res — half-texel
coordinates; bloom_upsample :102-116 taps uv=((i)+(x,y))*0.5/prev_res). On
TPU, per-pixel `gather` is ~10 ns/element, so instead of emulating the
sampler with gathers, every tap is expressed as EDGE-PADDED STRIDED SLICING
(the phases are fixed, so each tap is an axis-shifted average of whole
arrays) — zero gathers, pure VPU.

Semantics preserved from the reference:
  * downsample: 9 taps on the half-texel grid, each kept only when
    length(rgba) > 0.6 (alpha participates: the sky's alpha=10 is what makes
    the sky bloom), clamped to [0,1000], sum/9; mip 1 is built from the
    rendered image (src/constant_data.rs:360-380).
  * upsample: 4 tent taps, overwriting mips N-2..2 from the mip above
    (src/renderer.rs:965-1020) — the final bloom lives in mip 2.
  * compositor (:22-75): integer upscale by the downscale factor + bilinear
    bloom fetch from mip 2 (here jax.image.resize — same filter up to border
    phase) * 0.05, ACES tonemap, gamma 1/2.2.

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
    Returns H of shape (h+1, w+1, C): H[a, b] = bilinear sample at texel
    coordinate (a - 0.5, b - 0.5) with clamp-to-edge."""
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    hy = 0.5 * (p[:-1] + p[1:])          # (h+1, w+2, C)
    return 0.5 * (hy[:, :-1] + hy[:, 1:])  # (h+1, w+1, C)


def bloom_downsample(prev, next_h: int, next_w: int):
    """One downsample pass: prev (h, w, 4) -> (next_h, next_w, 4).
    Tap (dx, dy) in {-1,0,1}^2 samples texel coords (2j+dy+0.5, 2i+dx+0.5),
    i.e. half-grid entry (2j+dy+1, 2i+dx+1)."""
    hg = _half_grid(prev)                # (h+1, w+1, 4)
    # pad to (2*next_h+2, 2*next_w+2) and view as (next_h+1, 2, next_w+1, 2):
    # element (2a+b) of a stride-2 pattern is view[a, b] — plain slices only
    # (stride-2 slicing on the sublane/lane dims is slow on TPU).
    pad_y = 2 * next_h + 2 - hg.shape[0]
    pad_x = 2 * next_w + 2 - hg.shape[1]
    hg = jnp.pad(hg, ((0, max(pad_y, 0)), (0, max(pad_x, 0)), (0, 0)),
                 mode="edge")
    v = hg[:2 * next_h + 2, :2 * next_w + 2].reshape(
        next_h + 1, 2, next_w + 1, 2, 4)

    def row_tap(dy):
        # rows r = 1+dy+2i for i in [0, next_h): dy=-1 -> v[i,0];
        # dy=0 -> v[i,1]; dy=1 -> v[i+1,0]
        if dy == -1:
            return v[:next_h, 0]
        if dy == 0:
            return v[:next_h, 1]
        return v[1:next_h + 1, 0]

    acc = jnp.zeros((next_h, next_w, 4), F32)
    for dy in (-1, 0, 1):
        rt = row_tap(dy)                 # (next_h, next_w+1, 2, 4)
        for dx in (-1, 0, 1):
            if dx == -1:
                tap = rt[:, :next_w, 0]
            elif dx == 0:
                tap = rt[:, :next_w, 1]
            else:
                tap = rt[:, 1:next_w + 1, 0]
            keep = jnp.linalg.norm(tap, axis=-1, keepdims=True) > 0.6
            acc = acc + jnp.where(keep, jnp.clip(tap, 0.0, 1000.0), 0.0)
    return acc / 9.0


def bloom_upsample(prev, next_h: int, next_w: int):
    """One upsample pass: coarser mip `prev` -> (next_h, next_w, 4).
    Tap (x, y) in {0,1}^2 samples texel coords ((i+x)/2 - 0.5, ...): for even
    output index that is (k - 0.5, exact k); interleave the two phases."""
    # phase arrays on the coarse grid: exact texels E[k] = prev[k] and
    # half-texels M[k] = 0.5*(prev[k-1] + prev[k]) (clamped)
    h, w = prev.shape[0], prev.shape[1]
    py = jnp.pad(prev, ((1, 1), (0, 0), (0, 0)), mode="edge")
    my = 0.5 * (py[:-1] + py[1:])        # (h+1, w, 4): M rows
    px = jnp.pad(prev, ((0, 0), (1, 1), (0, 0)), mode="edge")
    mx = 0.5 * (px[:, :-1] + px[:, 1:])  # (h, w+1, 4): M cols

    def up_axis0(a_exact, a_mid):
        """Upsample 2x along axis 0: out[2k] = 0.5*(mid[k] + exact[k]),
        out[2k+1] = 0.5*(exact[k] + mid[k+1])."""
        n0 = a_exact.shape[0]
        even = 0.5 * (a_mid[:n0] + a_exact)
        odd = 0.5 * (a_exact + a_mid[1:n0 + 1])
        out = jnp.stack([even, odd], axis=1).reshape((2 * n0,) + a_exact.shape[1:])
        return out

    # upsample along y using (prev, my), then along x using recomputed mids
    uy = up_axis0(prev, my)              # (2h, w, 4)
    pux = jnp.pad(uy, ((0, 0), (1, 1), (0, 0)), mode="edge")
    mux = 0.5 * (pux[:, :-1] + pux[:, 1:])
    ux = up_axis0(uy.transpose(1, 0, 2), mux.transpose(1, 0, 2)).transpose(1, 0, 2)
    out = ux[:next_h, :next_w]
    # pad if the next mip is more than 2x (odd-size chains)
    pad_y = max(0, next_h - out.shape[0])
    pad_x = max(0, next_w - out.shape[1])
    if pad_y or pad_x:
        out = jnp.pad(out, ((0, pad_y), (0, pad_x), (0, 0)), mode="edge")
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
    for m in range(n_mips - 2, 1, -1):
        mips[m] = bloom_upsample(mips[m + 1], _mip_size(h, m), _mip_size(w, m))
    return mips[2]


def _upsample4_bilinear(img, out_h: int, out_w: int):
    """Exact 4x bilinear upsample (texel centers), phase-interleaved via
    pad/stack/reshape — jax.image.resize emits pathological scalar-loop index
    ops on TPU (~12 ms per 1-D iota fusion, measured)."""
    h, w = img.shape[0], img.shape[1]

    def up_axis(a):
        # output texel j maps to input coord (j + 0.5)/4 - 0.5; phases
        # j%4 = 0..3 give weights (5/8,3/8) (7/8,1/8) (7/8,1/8 fwd) (5/8,3/8)
        n0 = a.shape[0]
        pa = jnp.pad(a, ((1, 1),) + ((0, 0),) * (a.ndim - 1), mode="edge")
        prev = pa[:-2]   # a[k-1]
        cur = pa[1:-1]   # a[k]
        nxt = pa[2:]     # a[k+1]
        ph0 = 0.375 * prev + 0.625 * cur
        ph1 = 0.125 * prev + 0.875 * cur
        ph2 = 0.875 * cur + 0.125 * nxt
        ph3 = 0.625 * cur + 0.375 * nxt
        out = jnp.stack([ph0, ph1, ph2, ph3], axis=1)
        return out.reshape((4 * n0,) + a.shape[1:])

    uy = up_axis(img)
    ux = up_axis(uy.transpose(1, 0, 2)).transpose(1, 0, 2)
    out = ux[:out_h, :out_w]
    pad_y = max(0, out_h - out.shape[0])
    pad_x = max(0, out_w - out.shape[1])
    if pad_y or pad_x:
        out = jnp.pad(out, ((0, pad_y), (0, pad_x), (0, 0)), mode="edge")
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "bloom_strength",
                                             "bloom_enabled"))
def composite(rendered, bloom_mip2, out_h: int, out_w: int,
              bloom_strength: float = 0.05, bloom_enabled: bool = True):
    """Final frame: upscale + bloom + ACES + gamma -> (out_h, out_w, 3) u8."""
    rh, rw = rendered.shape[0], rendered.shape[1]
    colour = rendered[..., :3]
    if bloom_enabled:
        bloom = _upsample4_bilinear(bloom_mip2[..., :3], rh, rw)
        colour = colour + bloom * bloom_strength
    ldr = jnp.power(aces(colour), 1.0 / 2.2)
    img = (jnp.clip(ldr, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    if (out_h, out_w) != (rh, rw):
        sy = max(out_h // rh, 1)
        sx = max(out_w // rw, 1)
        img = jnp.repeat(jnp.repeat(img, sy, axis=0), sx, axis=1)
        img = img[:out_h, :out_w]
        pad_y = max(0, out_h - img.shape[0])
        pad_x = max(0, out_w - img.shape[1])
        if pad_y or pad_x:
            img = jnp.pad(img, ((0, pad_y), (0, pad_x), (0, 0)), mode="edge")
    return img
