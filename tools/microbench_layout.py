"""Layout microbench: cost of minor-dim-3/16 arrays vs channel-split 1-D.

TPU T(8,128) tiling pads the minor dimension to 128, so an (N,3) f32 array
occupies 42x its logical bytes and every op touching it pays that bandwidth.
Measures: (N,3) elementwise vs 3x(N,); (N,16) state merge vs 16x(N,);
gather returning (N,32) vs transposed-table gather returning (32,N).
Run: python tools/microbench_layout.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def timeit(name, f, *args, iters=20):
    import jax
    r = f(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0][:1])
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        ts.append((time.monotonic() - t0) / iters)
    print(json.dumps({"case": name, "us": round(float(np.median(ts)) * 1e6, 1)}),
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = 2_073_600
    rng = np.random.default_rng(0)
    a3 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    b3 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    a1 = [a3[:, i] for i in range(3)]
    b1 = [b3[:, i] for i in range(3)]
    a1 = [jnp.asarray(np.asarray(x)) for x in a1]
    b1 = [jnp.asarray(np.asarray(x)) for x in b1]

    timeit("(N,3) fma", jax.jit(lambda x, y: x * y + x), a3, b3)
    timeit("3x(N,) fma", jax.jit(
        lambda xs, ys: [x * y + x for x, y in zip(xs, ys)]), a1, b1)

    g16 = jnp.asarray(rng.integers(0, 2**32, (n, 16), dtype=np.uint32))
    m = jnp.asarray(rng.random(n) < 0.5)
    r16 = jnp.asarray(rng.integers(0, 2**32, (n, 16), dtype=np.uint32))
    timeit("(N,16) masked merge", jax.jit(
        lambda g, r, mm: jnp.where(mm[:, None], r, g)), g16, r16, m)
    g1 = [jnp.asarray(np.asarray(g16[:, i])) for i in range(16)]
    r1 = [jnp.asarray(np.asarray(r16[:, i])) for i in range(16)]
    timeit("16x(N,) masked merge", jax.jit(
        lambda gs, rs, mm: [jnp.where(mm, r, g) for g, r in zip(gs, rs)]),
        g1, r1, m)

    tbl = jnp.asarray(rng.integers(0, 2**32, (32768, 32), dtype=np.uint32))
    tblT = jnp.asarray(np.asarray(tbl).T.copy())
    tbl_flat = jnp.asarray(np.asarray(tbl).ravel())
    idx = jnp.asarray(rng.integers(0, 32768, n, dtype=np.int32))

    timeit("gather (N,32) + split-sum", jax.jit(
        lambda t, i: sum(jnp.take(t, i, axis=0, mode="clip")[:, k]
                         for k in range(17))), tbl, idx)
    timeit("gather transposed (32,N) sum", jax.jit(
        lambda t, i: sum(jnp.take(t[k], i, mode="clip")
                         for k in range(17))), tblT, idx)
    timeit("gather flat 17x(N,)", jax.jit(
        lambda t, i: sum(jnp.take(t, i * 32 + k, mode="clip")
                         for k in range(17))), tbl_flat, idx)
    # dependent-chain versions (the loop is latency-bound on the gather)
    def dep(t, i):
        acc = i
        for _ in range(8):
            acc = jnp.take(t, acc, axis=0, mode="clip")[:, 0].astype(
                jnp.int32) % 32768
        return acc
    timeit("dep8 gather (N,32)", jax.jit(dep), tbl, idx)

    def depf(t, i):
        acc = i
        for _ in range(8):
            w = sum(jnp.take(t, acc * 32 + k, mode="clip").astype(jnp.int32)
                    for k in range(17))
            acc = w % 32768
        return acc
    timeit("dep8 gather flat 17 words", jax.jit(depf), tbl_flat, idx)


if __name__ == "__main__":
    main()
