"""Shadertoy float-hash family (Dave Hoskins) — vectorized in JAX.

The reference embeds the same family in shaders/hash.slang:17-156 and uses it
for per-block unique colours (other.slang:10-13), jittered soft shadows
(raytracer.slang:332-342), and night-sky stars (sky.slang:171-183). Implemented
from the published Shadertoy formulas, all float32 to match GPU semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def _fract(x):
    return x - jnp.floor(x)


def hash11(p):
    p = _fract(p * F32(0.1031))
    p = p * (p + F32(33.33))
    p = p * (p + p)
    return _fract(p)


def hash12(p):
    """p: (..., 2) -> (...)"""
    p3 = _fract(jnp.stack([p[..., 0], p[..., 1], p[..., 0]], -1) * F32(0.1031))
    d = jnp.sum(p3 * (p3[..., [1, 2, 0]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., 0] + p3[..., 1]) * p3[..., 2])


def hash13(p3):
    """p3: (..., 3) -> (...)"""
    p3 = _fract(p3 * F32(0.1031))
    d = jnp.sum(p3 * (p3[..., [2, 1, 0]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., 0] + p3[..., 1]) * p3[..., 2])


def hash22(p):
    """p: (..., 2) -> (..., 2)"""
    p3 = _fract(jnp.stack([p[..., 0], p[..., 1], p[..., 0]], -1) * jnp.array([0.1031, 0.1030, 0.0973], F32))
    d = jnp.sum(p3 * (p3[..., [1, 2, 0]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., [0, 0]] + p3[..., [1, 2]]) * p3[..., [2, 1]])


def hash33(p3):
    """p3: (..., 3) -> (..., 3). Matches shaders/hash.slang:102-108."""
    p3 = _fract(p3 * jnp.array([0.1031, 0.1030, 0.0973], F32))
    d = jnp.sum(p3 * (p3[..., [1, 0, 2]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., [0, 0, 1]] + p3[..., [1, 0, 0]]) * p3[..., [2, 1, 0]])


def per_block_unique_colour(block_pos):
    """normalize(hash33(block_pos * k)) (reference other.slang:10-13)."""
    k = jnp.array([23.231, -435.4354, 9412.1], F32)
    col = hash33(block_pos.astype(F32) * k)
    n = jnp.sqrt(jnp.sum(col * col, -1, keepdims=True))
    return col / jnp.maximum(n, F32(1e-12))


# ---- SoA variants (channels as separate flat arrays) ----
# Any (N, k)-shaped intermediate with a tiny minor axis runs at k/128 lane
# utilization on TPU (the round-4 frame profile caught three 25.6 ms
# select-tree fusions iterating over f32[2073600,1]); the full-width
# shading tail therefore computes per channel on (N,) arrays and only
# stacks at the planar image boundary. Same formulas value-for-value.

def hash33_soa(x, y, z):
    """hash33 on separate (N,) channels -> (r, g, b) flat arrays."""
    px = _fract(x * F32(0.1031))
    py = _fract(y * F32(0.1030))
    pz = _fract(z * F32(0.0973))
    d = (px * (py + F32(33.33)) + py * (px + F32(33.33))
         + pz * (pz + F32(33.33)))
    px = px + d
    py = py + d
    pz = pz + d
    return (_fract((px + py) * pz), _fract((px + px) * py),
            _fract((py + px) * px))


def hash13_soa(x, y, z):
    """hash13 on separate (N,) channels -> (N,)."""
    px = _fract(x * F32(0.1031))
    py = _fract(y * F32(0.1031))
    pz = _fract(z * F32(0.1031))
    d = (px * (pz + F32(33.33)) + py * (py + F32(33.33))
         + pz * (px + F32(33.33)))
    px = px + d
    py = py + d
    pz = pz + d
    return _fract((px + py) * pz)


def per_block_unique_colour_soa(bx, by, bz):
    """per_block_unique_colour on separate channels -> (r, g, b)."""
    r, g, b = hash33_soa(bx.astype(F32) * F32(23.231),
                         by.astype(F32) * F32(-435.4354),
                         bz.astype(F32) * F32(9412.1))
    n = jnp.maximum(jnp.sqrt(r * r + g * g + b * b), F32(1e-12))
    return r / n, g / n, b / n


def xorshift32(state):
    """The host-side PRNG the reference uses for light placement
    (src/utils.rs:1-10): x ^= x<<13; x ^= x>>7; x ^= x<<17."""
    import numpy as np
    x = np.uint32(state)
    x ^= np.uint32((int(x) << 13) & 0xFFFFFFFF)
    x ^= x >> np.uint32(7)
    x ^= np.uint32((int(x) << 17) & 0xFFFFFFFF)
    return x


def hash14(p4):
    """p4: (..., 4) -> (...)"""
    p4 = _fract(p4 * jnp.array([0.1031, 0.1030, 0.0973, 0.1099], F32))
    d = jnp.sum(p4 * (p4[..., [3, 2, 0, 1]] + F32(33.33)), -1, keepdims=True)
    p4 = p4 + d
    return _fract((p4[..., 0] + p4[..., 1]) * (p4[..., 2] + p4[..., 3]))


def hash21(p):
    """scalar (...) -> (..., 2)"""
    p3 = _fract(jnp.stack([p, p, p], -1) * jnp.array([0.1031, 0.1030, 0.0973], F32))
    d = jnp.sum(p3 * (p3[..., [1, 2, 0]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., [0, 0]] + p3[..., [1, 2]]) * p3[..., [2, 1]])


def hash23(p3):
    """(..., 3) -> (..., 2)"""
    p3 = _fract(p3 * jnp.array([0.1031, 0.1030, 0.0973], F32))
    d = jnp.sum(p3 * (p3[..., [2, 1, 0]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., [0, 0]] + p3[..., [1, 2]]) * p3[..., [2, 1]])


def hash31(p):
    """scalar (...) -> (..., 3)"""
    p3 = _fract(jnp.stack([p, p, p], -1) * jnp.array([0.1031, 0.1030, 0.0973], F32))
    d = jnp.sum(p3 * (p3[..., [1, 2, 0]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., [0, 0, 1]] + p3[..., [1, 2, 2]]) * p3[..., [2, 1, 0]])


def hash32(p):
    """(..., 2) -> (..., 3)"""
    p3 = _fract(jnp.stack([p[..., 0], p[..., 1], p[..., 0]], -1)
                * jnp.array([0.1031, 0.1030, 0.0973], F32))
    d = jnp.sum(p3 * (p3[..., [1, 0, 2]] + F32(33.33)), -1, keepdims=True)
    p3 = p3 + d
    return _fract((p3[..., [0, 0, 1]] + p3[..., [1, 2, 2]]) * p3[..., [2, 1, 0]])


def hash41(p):
    """scalar (...) -> (..., 4)"""
    p4 = _fract(jnp.stack([p, p, p, p], -1)
                * jnp.array([0.1031, 0.1030, 0.0973, 0.1099], F32))
    d = jnp.sum(p4 * (p4[..., [3, 2, 0, 1]] + F32(33.33)), -1, keepdims=True)
    p4 = p4 + d
    return _fract((p4[..., [0, 0, 1, 2]] + p4[..., [1, 2, 3, 3]])
                  * p4[..., [2, 1, 0, 1]])


def uint_hash(s):
    """The Schechter-Bridson uint32 hash (shaders/hash.slang:7-16) for jnp."""
    from vvr_tpu.ops.noise import _hash_u32
    return _hash_u32(s)
