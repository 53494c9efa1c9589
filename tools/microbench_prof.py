"""Profiler-based microbench: DEVICE time per op (immune to the ~28 ms
axon tunnel sync that floors wall-clock microbenches).

Measures the round-4 shadow-pass redesign candidates: one-shot full-width
gathers at growing table sizes (throughput- vs latency-bound question),
nonzero/pack machinery, and an MXU-matmul cumsum pack.

Run on TPU: python tools/microbench_prof.py
"""
from __future__ import annotations

import sys, pathlib, time, json, glob, gzip, os, shutil
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def device_ms(fn, *args, label=""):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    td = "/tmp/jaxtrace_mbp"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        r = f(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    paths = glob.glob(os.path.join(td, "plugins/profile/*/*.trace.json.gz"))
    total = 0.0
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {}) or {}
        if "long_name" in a or "hlo_op" in a:
            total += e["dur"] / 1e3
    print(json.dumps({"label": label, "device_ms": round(total, 2)}),
          flush=True)
    return total


def mxu_pack_positions(mask):
    """Exclusive positions of set lanes via MXU triangular-matmul cumsum.
    mask (N,) bool. Exact: 0/1 inputs and partial sums < 2^24."""
    n = mask.shape[0]
    c = 128
    npad = -(-n // (c * c)) * (c * c)
    if npad != n:
        mask = jnp.concatenate([mask, jnp.zeros((npad - n,), bool)])
    rows = npad // c
    m = mask.reshape(rows, c).astype(jnp.float32)
    tri_inc = jnp.tril(jnp.ones((c, c), jnp.float32)).T  # upper: inclusive
    row_cum = jax.lax.dot(m, tri_inc,
                          precision=jax.lax.Precision.HIGHEST)
    row_tot = row_cum[:, -1]
    r2 = rows // c
    rt = row_tot.reshape(r2, c)
    blk_cum = jax.lax.dot(rt, tri_inc,
                          precision=jax.lax.Precision.HIGHEST)
    blk_tot = blk_cum[:, -1]
    top = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                           jnp.cumsum(blk_tot)[:-1]])
    row_off = (blk_cum.reshape(-1) - row_tot
               + jnp.repeat(top, c))
    pos_inc = row_cum + row_off[:, None]
    return (pos_inc.reshape(-1) - m.reshape(-1)).astype(jnp.int32)[:n]


def main():
    n = 1920 * 1080
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 1 << 16, n, dtype=np.int32))

    # 1. one-shot full-width (N,2) gathers at growing table sizes
    for rows in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
        t2 = jnp.asarray(rng.random((rows, 2), dtype=np.float32))
        ix = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
        device_ms(lambda i, t=t2: jnp.take(t, i, axis=0, mode="clip"),
                  ix, label=f"take2col_{rows}")
        t1 = jnp.asarray(rng.random(rows, dtype=np.float32))
        device_ms(lambda i, t=t1: jnp.take(t, i, mode="clip"),
                  ix, label=f"take1d_{rows}")

    # 2. dependent 4-chain (the traversal's regime) for contrast
    t1 = jnp.asarray(rng.random(1 << 22, dtype=np.float32))

    def chain(i):
        v = i
        for _ in range(4):
            v = jnp.take(t1, v, mode="clip").astype(jnp.int32) \
                ^ (v >> 1)
            v = jnp.clip(v, 0, (1 << 22) - 1)
        return v
    ix = jnp.asarray(rng.integers(0, 1 << 22, n, dtype=np.int32))
    device_ms(chain, ix, label="dep4chain_4M")

    # 3. pack machinery at 2M
    mask = jnp.asarray(rng.random(n) < 0.06)
    for cap in (n // 4, n // 16):
        device_ms(lambda m, c=cap: jnp.nonzero(m, size=c, fill_value=n)[0],
                  mask, label=f"nonzero_cap{cap}")
    device_ms(lambda m: jnp.cumsum(m.astype(jnp.int32)), mask,
              label="cumsum_2M")
    device_ms(mxu_pack_positions, mask, label="mxu_pack_positions")

    def mxu_pack_full(m):
        pos = mxu_pack_positions(m)
        cap = n // 16
        tgt = jnp.where(m, jnp.minimum(pos, cap), cap)
        return jnp.full((cap + 1,), n, jnp.int32).at[tgt].min(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    device_ms(mxu_pack_full, mask, label="mxu_pack_full_cap131k")

    vals = jnp.asarray(rng.random((n,), dtype=np.float32))
    sidx = jnp.asarray(np.sort(rng.integers(0, n, n // 16, dtype=np.int32)))
    device_ms(lambda i: (jnp.take(vals, i, mode="clip"),
                         jnp.take(vals, jnp.minimum(i + 7, n - 1),
                                  mode="clip"),
                         jnp.take(vals, jnp.minimum(i + 13, n - 1),
                                  mode="clip")),
              sidx, label="payload3x_gather_131k_from_2M")
    device_ms(lambda i: jnp.zeros((n,), bool).at[i].set(True, mode="drop"),
              sidx, label="scatterback_bool_131k_to_2M")


if __name__ == "__main__":
    main()
