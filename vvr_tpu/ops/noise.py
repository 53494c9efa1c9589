"""Gradient/simplex noise — vectorized JAX, runs jitted on TPU.

Covers the reference's noise needs with TPU-native implementations:
  * Perlin FBM + Billow (worldgen, src/voxel.rs:60-91 — the reference uses the
    Rust `noise` crate; we provide our own deterministic lattice noise)
  * simplex 2D `snoise` and derivative-carrying `sdnoise` (cloud layer,
    shaders/sky_compute.slang:17-59, shaders/noises/psrdnoise2D.slang)
  * simplex 3D `snoise3` (wavy reflections, raytracer.slang:262)

All functions are elementwise over arbitrary leading batch dims and built from
uint32 integer hashing, so they are bit-stable across CPU/TPU backends.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32
U32 = jnp.uint32


def _hash_u32(x):
    """H. Schechter & R. Bridson uint hash (reference shaders/hash.slang:7-16)."""
    s = x.astype(U32)
    s = s ^ U32(2747636419)
    s = s * U32(2654435769)
    s = s ^ (s >> 16)
    s = s * U32(2654435769)
    s = s ^ (s >> 16)
    s = s * U32(2654435769)
    return s


def _lattice_hash2(ix, iy, seed: int):
    sk = (seed * 0x27D4EB2F + 0x165667B1) & 0xFFFFFFFF
    return _hash_u32(ix.astype(U32) * U32(0x9E3779B1) ^ iy.astype(U32) * U32(0x85EBCA77) ^ U32(sk))


def _lattice_hash3(ix, iy, iz, seed: int):
    sk = (seed * 0x27D4EB2F + 0x165667B1) & 0xFFFFFFFF
    return _hash_u32(
        ix.astype(U32) * U32(0x9E3779B1)
        ^ iy.astype(U32) * U32(0x85EBCA77)
        ^ iz.astype(U32) * U32(0xC2B2AE3D)
        ^ U32(sk)
    )


def _grad2(h):
    """Map hash -> unit gradient from 8 directions (cheap, no trig)."""
    idx = (h >> 28).astype(jnp.int32) & 7
    gx = jnp.array([1.0, -1.0, 1.0, -1.0, 0.70710678, -0.70710678, 0.70710678, -0.70710678], F32)
    gy = jnp.array([0.70710678, 0.70710678, -0.70710678, -0.70710678, 1.0, 1.0, -1.0, -1.0], F32)
    return gx[idx], gy[idx]


def _fade(t):
    return t * t * t * (t * (t * F32(6.0) - F32(15.0)) + F32(10.0))


def perlin2(x, y, seed: int = 0):
    """2D Perlin gradient noise, output approximately [-1, 1]."""
    x = x.astype(F32)
    y = y.astype(F32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)

    def dot_grad(ox, oy):
        h = _lattice_hash2(ix + ox, iy + oy, seed)
        gx, gy = _grad2(h)
        return gx * (fx - ox) + gy * (fy - oy)

    u = _fade(fx)
    v = _fade(fy)
    n00 = dot_grad(0, 0)
    n10 = dot_grad(1, 0)
    n01 = dot_grad(0, 1)
    n11 = dot_grad(1, 1)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return F32(1.41421356) * (nx0 + v * (nx1 - nx0))


def fbm2(x, y, octaves: int, frequency: float, seed: int = 0,
         lacunarity: float = 2.0, persistence: float = 0.5, billow: bool = False):
    """Fractal Brownian motion over perlin2. `billow=True` gives the Billow
    variant (per-octave abs()*2-1) the reference uses for terrain detail
    (src/voxel.rs:64-66)."""
    total = jnp.zeros_like(jnp.asarray(x, F32))
    amp = 1.0
    freq = frequency
    norm = 0.0
    for i in range(octaves):
        n = perlin2(jnp.asarray(x, F32) * F32(freq), jnp.asarray(y, F32) * F32(freq), seed + i)
        if billow:
            n = jnp.abs(n) * F32(2.0) - F32(1.0)
        total = total + n * F32(amp)
        norm += amp
        amp *= persistence
        freq *= lacunarity
    return total / F32(norm)


# ---------------------------------------------------------------------------
# Simplex 2D (value + analytic derivatives) — cloud layer
# ---------------------------------------------------------------------------

_F2 = 0.36602540378  # (sqrt(3)-1)/2
_G2 = 0.21132486540  # (3-sqrt(3))/6


def sdnoise2(x, y, seed: int = 0):
    """Simplex noise with analytic derivatives: returns (value, dx, dy).
    TPU-native stand-in for psrdnoise2D's `sdnoise`
    (shaders/noises/psrdnoise2D.slang), used by the cloud pass for
    silver-lining normals (sky_compute.slang:27-52)."""
    x = x.astype(F32)
    y = y.astype(F32)
    s = (x + y) * F32(_F2)
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    t = (i + j) * F32(_G2)
    x0 = x - (i - t)
    y0 = y - (j - t)

    i1 = (x0 > y0).astype(F32)
    j1 = F32(1.0) - i1

    x1 = x0 - i1 + F32(_G2)
    y1 = y0 - j1 + F32(_G2)
    x2 = x0 - F32(1.0) + F32(2.0 * _G2)
    y2 = y0 - F32(1.0) + F32(2.0 * _G2)

    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)

    val = jnp.zeros_like(x)
    dx = jnp.zeros_like(x)
    dy = jnp.zeros_like(x)
    corners = (
        (x0, y0, 0.0, 0.0),
        (x1, y1, i1, j1),
        (x2, y2, 1.0, 1.0),
    )
    for cx, cy, oi, oj in corners:
        tt = F32(0.5) - cx * cx - cy * cy
        tt = jnp.maximum(tt, F32(0.0))
        t2 = tt * tt
        t4 = t2 * t2
        oi_i = oi.astype(jnp.int32) if hasattr(oi, "astype") else jnp.int32(oi)
        oj_i = oj.astype(jnp.int32) if hasattr(oj, "astype") else jnp.int32(oj)
        h = _lattice_hash2(ii + oi_i, jj + oj_i, seed)
        gx, gy = _grad2(h)
        gdot = gx * cx + gy * cy
        val = val + t4 * gdot
        # d/dx [t^4 * (g.x*x+g.y*y)] = -8 t^3 x gdot + t^4 g.x
        t3 = t2 * tt
        dx = dx + (F32(-8.0) * t3 * cx * gdot + t4 * gx)
        dy = dy + (F32(-8.0) * t3 * cy * gdot + t4 * gy)
    k = F32(40.0)  # scale into ~[-1,1]
    return k * val, k * dx, k * dy


def snoise2(x, y, seed: int = 0):
    """Plain simplex value noise in ~[-1,1] (shader `snoise(float2)`)."""
    v, _, _ = sdnoise2(x, y, seed)
    return v


def snoise3(p, seed: int = 0):
    """3D simplex-style gradient noise in ~[-1,1] over (..., 3) points.
    Used for wavy mirror reflections (raytracer.slang:262). Implemented as
    3D Perlin (visually equivalent; our oracle defines semantics)."""
    x, y, z = p[..., 0].astype(F32), p[..., 1].astype(F32), p[..., 2].astype(F32)
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    ix, iy, iz = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)

    def dot_grad(ox, oy, oz):
        h = _lattice_hash3(ix + ox, iy + oy, iz + oz, seed)
        # gradient from 12 edge directions
        idx = (h >> 28).astype(jnp.int32) % 12
        gx = jnp.array([1, -1, 1, -1, 1, -1, 1, -1, 0, 0, 0, 0], F32)[idx]
        gy = jnp.array([1, 1, -1, -1, 0, 0, 0, 0, 1, -1, 1, -1], F32)[idx]
        gz = jnp.array([0, 0, 0, 0, 1, 1, -1, -1, 1, 1, -1, -1], F32)[idx]
        return gx * (fx - ox) + gy * (fy - oy) + gz * (fz - oz)

    u, v, w = _fade(fx), _fade(fy), _fade(fz)
    n000, n100 = dot_grad(0, 0, 0), dot_grad(1, 0, 0)
    n010, n110 = dot_grad(0, 1, 0), dot_grad(1, 1, 0)
    n001, n101 = dot_grad(0, 0, 1), dot_grad(1, 0, 1)
    n011, n111 = dot_grad(0, 1, 1), dot_grad(1, 1, 1)
    nx00 = n000 + u * (n100 - n000)
    nx10 = n010 + u * (n110 - n010)
    nx01 = n001 + u * (n101 - n001)
    nx11 = n011 + u * (n111 - n011)
    nxy0 = nx00 + v * (nx10 - nx00)
    nxy1 = nx01 + v * (nx11 - nx01)
    return F32(1.1547) * (nxy0 + w * (nxy1 - nxy0))
