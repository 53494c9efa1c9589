"""A/B the sub-texel select inside the blocked sky/cloud sampling.

Current (one-hot row-reduce): per channel, where(iota==sub*stride+c) over
the (N, K) gather result + sum(axis=1) — in-frame this shows up as
~12 ms select_reduce + ~12 ms reduce_sum fusions (round-4 profile).

Candidate (transpose + where-tree): transpose the (N, K) gather result
to (K, N) once (a tiled relayout), then select the sub-texel with a
log2(K/stride)-deep jnp.where tree over full-lane (N,) rows.

Both exact (select one element). Run on TPU.
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
from tools.microbench_skymiss2 import skybox_uv, clouds_uv

F32 = jnp.float32


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.monotonic() - t0) / reps * 1e3


def wheretree(rowT, sub, stride: int, nch: int):
    """rowT: (K, N); returns [rowT[sub*stride+c] for c in channels] via a
    binary select tree over full-lane (N,) rows."""
    k = rowT.shape[0]
    nsub = k // stride
    outs = []
    for c in range(nch):
        cand = [rowT[t * stride + c] for t in range(nsub)]
        b = sub
        bit = 1
        while len(cand) > 1:
            sel = (sub & bit) == 0
            cand = [jnp.where(sel, cand[2 * i], cand[2 * i + 1])
                    for i in range(len(cand) // 2)]
            bit <<= 1
        outs.append(cand[0])
    return outs


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

    @jax.jit
    def var_a(dx, dy, dz):
        return sky_ops.sample_skybox_and_clouds_blocked_soa(
            sb, 256, cb, 512, (px, py, pz), dx, dy, dz)

    @jax.jit
    def var_t(dx, dy, dz):
        face, iu, iv = skybox_uv(dx, dy, dz, 256)
        rb = 256 // 4
        srow = jnp.take(sb, (face * rb + (iv >> 2)) * rb + (iu >> 2),
                        axis=0, mode="clip")
        ssub = ((iv & 3) << 2) | (iu & 3)
        sr, sg, sb_ = wheretree(srow.T, ssub, 3, 3)
        valid, cu, cv = clouds_uv(dx, dy, dz, px, py, pz, 512)
        crow = jnp.take(cb, (cv >> 1) * 256 + (cu >> 1), axis=0,
                        mode="clip")
        csub = ((cv & 1) << 1) | (cu & 1)
        cr, cg, cb_, ca = (jnp.where(valid, ch, 0.0)
                           for ch in wheretree(crow.T, csub, 4, 4))
        return (sr + (cr - sr) * ca, sg + (cg - sg) * ca,
                sb_ + (cb_ - sb_) * ca)

    out = {}
    ref = None
    for name, fn in (("a_onehot", var_a), ("t_transpose_wheretree", var_t)):
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
