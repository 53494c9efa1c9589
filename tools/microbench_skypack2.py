"""Round-5 microbench #2: one-scan channel extraction for the sky tables
and a blocked fine sun-grid.

microbench_skypack.py verdicts: f16/u16 packing LOSES (unpack ALU beats
the bytes saved — VPU-op-count-bound, the round-2 lesson). Remaining
ideas, measured here:
  * one-scan: build the texel mask ONCE, multiply, segment-sum via
    reshape — XLA emitted one select_reduce fusion PER CHANNEL (each
    re-reading the [2M,16/48] gather from HBM, 1.7 ms apiece).
  * flat-channel extraction cost from the (N, C) one-scan result.
  * fine grid as 4x4-texel blocked [262144, 32] vs [4M, 2] (the 4M-row
    table is out of the u16-index fast gather path).

Run on TPU: python tools/microbench_skypack2.py
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
K = 16


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
    return [jnp.where(j == (base + c), row, F32(0.0)).sum(axis=1)
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
    fg_f32 = jnp.asarray(rng.random((4194304, 2), np.float32))
    fgb_f32 = jnp.asarray(rng.random((262144, 32), np.float32))

    def chain(body, rows):
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

    def clouds_1scan(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")      # (N, 16)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        w = (j == sub[:, None])                            # (N, 4) texel
        m = row.reshape(-1, 4, 4) * w[:, :, None]
        ch4 = m.sum(axis=1)                                # (N, 4)
        return [ch4[:, c] for c in range(4)]

    def sky_cur(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")
        return onehot_cols(row, sub, 3, 3)

    def sky_1scan(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")      # (N, 48)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        w = (j == sub[:, None])                            # (N, 16)
        m = row.reshape(-1, 16, 3) * w[:, :, None]
        ch3 = m.sum(axis=1)                                # (N, 3)
        return [ch3[:, c] for c in range(3)]

    def fine_cur(tab, idx, sub):
        row = jnp.take(tab, idx, axis=0, mode="clip")
        return row[:, 0], row[:, 1]

    def fine_blk(tab, idx, sub):
        # idx is a fine texel id over a 2048^2 grid; blocked row covers a
        # 4x4 texel block: row = idx16 = (j>>2)*512 + (i>>2); sub16 from
        # low bits. Here idx plays the flat texel id.
        i = idx & 2047
        jj = idx >> 11
        rowi = (jj >> 2) * 512 + (i >> 2)
        s16 = ((jj & 3) << 2) | (i & 3)
        row = jnp.take(tab, rowi, axis=0, mode="clip")     # (N, 32)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        w = (j == s16[:, None])
        m = row.reshape(-1, 16, 2) * w[:, :, None]
        ch2 = m.sum(axis=1)
        return ch2[:, 0], ch2[:, 1]

    tests = [
        ("clouds cur  (4 onehot scans)", chain(clouds_cur, 65536),
         (cl_f32, idx_cl, sub4)),
        ("clouds 1scan -> (N,4) slices", chain(clouds_1scan, 65536),
         (cl_f32, idx_cl, sub4)),
        ("skybox cur  (3 onehot scans)", chain(sky_cur, 24576),
         (sk_f32, idx_sk, sub16)),
        ("skybox 1scan -> (N,3) slices", chain(sky_1scan, 24576),
         (sk_f32, idx_sk, sub16)),
        ("fine cur   [4M,2]", chain(fine_cur, 4194304),
         (fg_f32, idx_fg, None)),
        ("fine blk   [262144,32]", chain(fine_blk, 4194304),
         (fgb_f32, idx_fg, None)),
    ]
    for name, fn, args in tests:
        print(f"{name:32s}: {timeit(fn, *args):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
