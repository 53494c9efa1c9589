"""Round-5 microbench: f16-packed sky-table gathers + select scans vs the
round-4 f32 blocked tables, and u16-packed sun-grid rows vs (G^2, 2) f32.

The round-5 profile of the REAL renderer frame (tools/profile_frame_r5.py;
the r4 script's closure-captured sky textures compiled to jit CONSTANTS
whose gathers cost 4x the traced-arg path — 33 vs 3.7 ms) shows the sky
sampling pipeline at ~19.5 ms device: clouds gather [2M,16]f32 3.7 +
skybox gather [2M,48]f32 3.8 + seven select_reduce scans at 1.71 each.
Row bytes drive BOTH the gather output write and every select scan, so
packing texels as f16 pairs in u32 (the reference's own texture precision
— RGBA16F, src/skybox.rs:43-45) should halve them.

Run on TPU: python tools/microbench_skypack.py
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
N = 2073600


K = 16   # pipeline repetitions inside one jit: the axon tunnel's
         # block_until_ready returns early (PROGRESS.md), so sync is a
         # 512 B fetch and the K-chain amortizes the ~30 ms RTT


def timeit(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(out[:128])
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn(*args)
        np.asarray(out[:128])
        best = min(best, time.monotonic() - t0)
    return best * 1e3 / K


def onehot_cols(row, sub, stride, nch):
    k = row.shape[1]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    base = (sub * stride)[:, None]
    z = row.dtype.type(0)
    return [jnp.where(j == (base + c), row, z).sum(axis=1)
            for c in range(nch)]


def main():
    rng = np.random.default_rng(0)
    idx_cl = jnp.asarray(rng.integers(0, 65536, N).astype(np.int32))
    idx_sk = jnp.asarray(rng.integers(0, 24576, N).astype(np.int32))
    idx_fg = jnp.asarray(rng.integers(0, 4194304, N).astype(np.int32))
    sub4 = jnp.asarray(rng.integers(0, 4, N).astype(np.int32))
    sub16 = jnp.asarray(rng.integers(0, 16, N).astype(np.int32))

    cl_f32 = jnp.asarray(rng.random((65536, 16), np.float32))
    sk_f32 = jnp.asarray(rng.random((24576, 48), np.float32))
    cl_u32 = jnp.asarray(rng.integers(0, 2**32, (65536, 8), np.uint64)
                         .astype(np.uint32))
    sk_u32 = jnp.asarray(rng.integers(0, 2**32, (24576, 24), np.uint64)
                         .astype(np.uint32))
    fg_f32 = jnp.asarray(rng.random((4194304, 2), np.float32))
    fg_u32 = jnp.asarray(rng.integers(0, 2**32, (4194304,), np.uint64)
                         .astype(np.uint32))

    def chain(body, rows):
        """Run `body` K times on perturbed indices, accumulate channel
        sums (keeps every gather live, same extra adds per variant)."""
        def run(tab, idx, sub=None):
            acc = jnp.zeros((N,), F32)
            for k in range(K):
                ik = (idx + k * 1327) % rows
                outs = body(tab, ik, sub)
                for o in outs:
                    acc = acc + o
            return acc
        return jax.jit(run)

    def clouds_cur(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")
        return onehot_cols(row, sub, 4, 4)

    def clouds_pk(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")   # (N, 8) u32
        # texel sub -> 2 u32 (rg, ba) at columns sub*2, sub*2+1
        pair = onehot_cols(row, sub, 2, 2)
        outs = []
        for p in pair:
            lo = (p & jnp.uint32(0xFFFF)).astype(jnp.uint16)
            hi = (p >> 16).astype(jnp.uint16)
            outs += [jax.lax.bitcast_convert_type(lo, jnp.float16)
                     .astype(F32),
                     jax.lax.bitcast_convert_type(hi, jnp.float16)
                     .astype(F32)]
        return outs

    def sky_cur(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")
        return onehot_cols(row, sub, 3, 3)

    def sky_pk(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")   # (N, 24) u32
        # texel sub channel c at f16 slot 3*sub + c -> u32 col (3*sub+c)>>1,
        # half (3*sub+c)&1. Select per channel with a column iota compare.
        k = row.shape[1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        outs = []
        for c in range(3):
            slot = sub * 3 + c
            col = (slot >> 1)[:, None]
            u = jnp.where(j == col, row, jnp.uint32(0)).sum(axis=1)
            u = u.astype(jnp.uint32)
            h = jnp.where((slot & 1) == 1, u >> 16, u & jnp.uint32(0xFFFF))
            outs.append(jax.lax.bitcast_convert_type(
                h.astype(jnp.uint16), jnp.float16).astype(F32))
        return outs

    def fine_cur(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")
        return row[:, 0], row[:, 1]

    def fine_pk(tab, idx, sub):
        u = jnp.take(tab, idx, mode="clip")
        b = (u & jnp.uint32(0xFFFF)).astype(F32)
        c = (u >> 16).astype(F32)
        return b, c

    clouds_cur = chain(clouds_cur, 65536)
    clouds_pk = chain(clouds_pk, 65536)
    sky_cur = chain(sky_cur, 24576)
    sky_pk = chain(sky_pk, 24576)
    fine_cur = chain(fine_cur, 4194304)
    fine_pk = chain(fine_pk, 4194304)

    print(f"clouds f32[65536,16]+4sel : "
          f"{timeit(clouds_cur, cl_f32, idx_cl, sub4):7.2f} ms", flush=True)
    print(f"clouds u32[65536,8]+2sel  : "
          f"{timeit(clouds_pk, cl_u32, idx_cl, sub4):7.2f} ms", flush=True)
    print(f"skybox f32[24576,48]+3sel : "
          f"{timeit(sky_cur, sk_f32, idx_sk, sub16):7.2f} ms", flush=True)
    print(f"skybox u32[24576,24]+3sel : "
          f"{timeit(sky_pk, sk_u32, idx_sk, sub16):7.2f} ms", flush=True)
    print(f"finegrid f32[4M,2]        : "
          f"{timeit(fine_cur, fg_f32, idx_fg):7.2f} ms", flush=True)
    print(f"finegrid u32[4M] packed   : "
          f"{timeit(fine_pk, fg_u32, idx_fg):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
