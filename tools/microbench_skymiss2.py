"""A/B/C: miss-shader formulations at bench shape (2M lanes, full width).

A. blocked tables + one-hot row-reduce sub-texel select (current)
B. direct unblocked per-texel gathers: skybox (6*R*R, 3) 12 B rows,
   clouds (R*R, 4) 16 B rows — no sub-texel select at all; tables leave
   the <=64K-row fast regime (393216 / 262144 rows, ~13 ns measured in
   round 1) but skip the 3x23.9 ms select fusions
C. direct unblocked per-CHANNEL flat tables: 3+4 gathers of (N,) from
   f32 (rows,) tables — smallest rows, most gathers
D. blocked gather + slab-halving select (contiguous minor-axis slices
   24 -> 12 -> 6 -> 3 instead of one-hot reduces)

All variants must be bit-equal to A. Run on TPU.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from vvr_tpu.ops import sky as sky_ops

F32 = jnp.float32


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.monotonic() - t0) / reps * 1e3


def skybox_uv(dx, dy, dz, r):
    x = dx * F32(-1.0)
    y = dy
    z = dz * F32(-1.0)
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x >= 0, 1, 0),
                     jnp.where(is_y, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 5, 4)))
    m = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-12)
    xn, yn, zn = x / m, y / m, z / m
    u = jnp.where(face == 0, zn,
        jnp.where(face == 1, -zn,
        jnp.where(face == 2, -xn,
        jnp.where(face == 3, -xn,
        jnp.where(face == 4, -xn, xn)))))
    v = jnp.where(face == 2, -zn, jnp.where(face == 3, zn, -yn))
    iu = jnp.clip(((u * 0.5 + 0.5) * r).astype(jnp.int32), 0, r - 1)
    iv = jnp.clip(((v * 0.5 + 0.5) * r).astype(jnp.int32), 0, r - 1)
    return face, iu, iv


def clouds_uv(dx, dy, dz, px, py, pz, r):
    denom = -dy
    t = -(sky_ops.CLOUD_HEIGHT - py) / jnp.where(jnp.abs(denom) < 1e-4, 1.0,
                                                 denom)
    u = (px + t * dx) / sky_ops.CLOUD_EXTENT + 0.5
    v = (pz + t * dz) / sky_ops.CLOUD_EXTENT + 0.5
    valid = ((jnp.abs(denom) > 1e-4) & (t >= 0) & (u >= 0) & (u <= 1)
             & (v >= 0) & (v <= 1))
    iu = jnp.clip((u * r).astype(jnp.int32), 0, r - 1)
    iv = jnp.clip((v * r).astype(jnp.int32), 0, r - 1)
    return valid, iu, iv


def main():
    n = 1920 * 1080
    rng = np.random.default_rng(7)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dx, dy, dz = (jnp.asarray(d[:, i]) for i in range(3))
    pos = np.array([128.0, 100.0, 20.0], np.float32)
    px, py, pz = (jnp.float32(pos[i]) for i in range(3))
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71], np.float32))

    clouds = sky_ops.write_clouds(sun, jnp.float32(0.0), 512)
    skybox = sky_ops.write_skybox(sun, jnp.float32(0.0), 256)
    cb = sky_ops.block_clouds(clouds)
    sb = sky_ops.block_skybox(skybox)
    sky_flat = skybox.reshape(-1, 3)            # (393216, 3)
    cl_flat = clouds.reshape(-1, 4)             # (262144, 4)
    sky_ch = [sky_flat[:, c] for c in range(3)]
    cl_ch = [cl_flat[:, c] for c in range(4)]

    @jax.jit
    def var_a(dx, dy, dz):
        return sky_ops.sample_skybox_and_clouds_blocked_soa(
            sb, 256, cb, 512, (px, py, pz), dx, dy, dz)

    @jax.jit
    def var_b(dx, dy, dz):
        face, iu, iv = skybox_uv(dx, dy, dz, 256)
        srow = jnp.take(sky_flat, (face * 256 + iv) * 256 + iu, axis=0,
                        mode="clip")
        sr, sg, sb_ = srow[:, 0], srow[:, 1], srow[:, 2]
        valid, cu, cv = clouds_uv(dx, dy, dz, px, py, pz, 512)
        crow = jnp.take(cl_flat, cv * 512 + cu, axis=0, mode="clip")
        cr = jnp.where(valid, crow[:, 0], 0.0)
        cg = jnp.where(valid, crow[:, 1], 0.0)
        cb_ = jnp.where(valid, crow[:, 2], 0.0)
        ca = jnp.where(valid, crow[:, 3], 0.0)
        return (sr + (cr - sr) * ca, sg + (cg - sg) * ca,
                sb_ + (cb_ - sb_) * ca)

    @jax.jit
    def var_c(dx, dy, dz):
        face, iu, iv = skybox_uv(dx, dy, dz, 256)
        sidx = (face * 256 + iv) * 256 + iu
        sr, sg, sb_ = (jnp.take(sky_ch[c], sidx, mode="clip")
                       for c in range(3))
        valid, cu, cv = clouds_uv(dx, dy, dz, px, py, pz, 512)
        cidx = cv * 512 + cu
        cr, cg, cb_, ca = (jnp.where(valid,
                                     jnp.take(cl_ch[c], cidx, mode="clip"),
                                     0.0) for c in range(4))
        return (sr + (cr - sr) * ca, sg + (cg - sg) * ca,
                sb_ + (cb_ - sb_) * ca)

    def slab_sel(row, sub, stride, nch):
        # halve the minor axis by the top sub bit each step; exact
        k = row.shape[1]
        while k > nch:
            half = k // 2
            hi_bit = (sub * stride) >= half
            row = jnp.where(hi_bit[:, None], row[:, half:], row[:, :half])
            sub = jnp.where(hi_bit, sub - half // stride, sub)
            k = half
        return [row[:, c] for c in range(nch)]

    @jax.jit
    def var_d(dx, dy, dz):
        face, iu, iv = skybox_uv(dx, dy, dz, 256)
        rb = 256 // 4
        srow = jnp.take(sb, (face * rb + (iv >> 2)) * rb + (iu >> 2),
                        axis=0, mode="clip")
        ssub = ((iv & 3) << 2) | (iu & 3)
        sr, sg, sb_ = slab_sel(srow, ssub, 3, 3)
        valid, cu, cv = clouds_uv(dx, dy, dz, px, py, pz, 512)
        crow = jnp.take(cb, (cv >> 1) * 256 + (cu >> 1), axis=0,
                        mode="clip")
        csub = ((cv & 1) << 1) | (cu & 1)
        cr, cg, cb_, ca = (jnp.where(valid, ch, 0.0)
                           for ch in slab_sel(crow, csub, 4, 4))
        return (sr + (cr - sr) * ca, sg + (cg - sg) * ca,
                sb_ + (cb_ - sb_) * ca)

    out = {}
    ref = None
    for name, fn in (("a_blocked_onehot", var_a), ("b_unblocked_rows", var_b),
                     ("c_unblocked_flat", var_c), ("d_blocked_slab", var_d)):
        ms = timeit(fn, dx, dy, dz)
        r = fn(dx, dy, dz)
        if ref is None:
            ref = r
            eq = True
        else:
            eq = all(bool(jnp.array_equal(x, y)) for x, y in zip(ref, r))
        out[name] = {"ms": round(ms, 2), "bit_equal": eq}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
