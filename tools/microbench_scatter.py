"""Scatter-min cost: element scatter vs ROW scatter (v5e, via axon).

The raster primary pass spends its floor (~78 ms) in a fragment-grained
u32 scatter-min over the 2M-pixel key buffer (ops/rastertrace.py
chunk_body). Gathers are INDEX-count-bound (row width free to 256 B —
PROGRESS.md round-2 microbench); if scatters behave the same way, binning
fragments into screen-tile ROWS and scatter-min'ing (N, K) row updates
with (N,) indices should cost ~K x less than scattering N*K elements.
This measures exactly that trade at raster-like sizes.

Run on the TPU host:  python tools/microbench_scatter.py
"""
from __future__ import annotations

import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def _force(r):
    """block_until_ready can return EARLY through the axon remote tunnel
    (repo memory / renderer.py sync note) — materialize one element of
    every output to actually fence the computation."""
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.ravel()[0])


def timeit(fn, *args, reps=6):
    r = fn(*args)
    _force(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args)
        _force(r)
    return (time.monotonic() - t0) / reps * 1e3


def main():
    n_pix = 1920 * 1080
    rng = np.random.default_rng(0)

    # --- element scatter-min (today's raster pattern) ---
    for n_frag in (1 << 21, 1 << 23):
        idx = jnp.asarray(rng.integers(0, n_pix, n_frag, dtype=np.int32))
        val = jnp.asarray(rng.integers(0, 1 << 30, n_frag,
                                       dtype=np.int64).astype(np.uint32))

        def elem(i, v):
            return jnp.full((n_pix + 1,), jnp.uint32(0xFFFFFFFF)).at[i].min(
                v, mode="drop")
        ms = timeit(jax.jit(elem), idx, val)
        print(json.dumps({"kind": "elem", "n": n_frag, "ms": round(ms, 2),
                          "ns_per_elem": round(ms * 1e6 / n_frag, 2)}),
              flush=True)

    # --- row scatter-min: (N,) indices, (N, K) updates ---
    for tk in (16, 64, 256):
        n_tiles = n_pix // tk
        for n_ent in (1 << 17, 1 << 19, 1 << 21):
            tid = jnp.asarray(rng.integers(0, n_tiles, n_ent,
                                           dtype=np.int32))
            upd = jnp.asarray(rng.integers(0, 1 << 30, (n_ent, tk),
                                           dtype=np.int64).astype(np.uint32))

            def row(i, v):
                return jnp.full((n_tiles + 1, tk),
                                jnp.uint32(0xFFFFFFFF)).at[i].min(
                    v, mode="drop")
            ms = timeit(jax.jit(row), tid, upd)
            print(json.dumps({"kind": "row", "K": tk, "n": n_ent,
                              "ms": round(ms, 2),
                              "ns_per_row": round(ms * 1e6 / n_ent, 2),
                              "ns_per_elem": round(ms * 1e6 / (n_ent * tk),
                                                   3)}), flush=True)

    # --- pack-machinery costs at wavefront width (the shadow path's real
    # wall: masked_shadow_hits runs nonzero+gather+scatter at 2M width
    # several times; PROGRESS round-2 put "pack stage at 2M" at ~100 ms) ---
    n = 1920 * 1080
    mask = jnp.asarray(rng.random(n) < 0.06)
    vals3 = jnp.asarray(rng.random((n, 3), dtype=np.float32))
    for cap in (n // 4, n // 16):
        def packfn(m):
            return jnp.nonzero(m, size=cap, fill_value=n)[0]
        ms = timeit(jax.jit(packfn), mask)
        print(json.dumps({"kind": "nonzero_2M", "cap": cap,
                          "ms": round(ms, 2)}), flush=True)

    def pack_gather(m):
        idx = jnp.nonzero(m, size=n // 16, fill_value=n)[0]
        safe = jnp.minimum(idx, n - 1)
        return vals3[safe], idx < n
    ms = timeit(jax.jit(pack_gather), mask)
    print(json.dumps({"kind": "pack_gather_2M_to_128K", "ms": round(ms, 2)}),
          flush=True)

    def cums(m):
        return jnp.cumsum(m.astype(jnp.int32))[-1]
    ms = timeit(jax.jit(cums), mask)
    print(json.dumps({"kind": "cumsum_2M", "ms": round(ms, 2)}), flush=True)

    def scat_back(m):
        idx = jnp.nonzero(m, size=n // 16, fill_value=n)[0]
        return jnp.zeros((n,), bool).at[idx].set(idx < n, mode="drop")
    ms = timeit(jax.jit(scat_back), mask)
    print(json.dumps({"kind": "pack+scatterback_2M", "ms": round(ms, 2)}),
          flush=True)

    # blocked two-level pack: block-any -> pack blocks -> gather rows
    for bs in (8, 16):
        nb = n // bs
        mb = mask[:nb * bs].reshape(nb, bs)
        vb = vals3[:nb * bs].reshape(nb, bs * 3)

        def blocked(mb_):
            anyb = jnp.any(mb_, axis=1)
            bidx = jnp.nonzero(anyb, size=nb // 3, fill_value=nb)[0]
            bsafe = jnp.minimum(bidx, nb - 1)
            return jnp.take(vb, bsafe, axis=0), jnp.take(mb_, bsafe, axis=0)
        ms = timeit(jax.jit(blocked), mb)
        print(json.dumps({"kind": f"blocked_pack_bs{bs}", "ms": round(ms, 2)}),
              flush=True)

    # --- gather+min fold alternative: sort-free segment emulation is the
    # row scatter above; also check an (N, K) gather for symmetry ---
    tbl = jnp.asarray(rng.integers(0, 1 << 30, (1 << 20, 16),
                                   dtype=np.int64).astype(np.uint32))
    gi = jnp.asarray(rng.integers(0, 1 << 20, 1 << 19, dtype=np.int32))

    def gat(i):
        return jnp.take(tbl, i, axis=0)
    ms = timeit(jax.jit(gat), gi)
    print(json.dumps({"kind": "gather_1M_64B", "n": 1 << 19,
                      "ms": round(ms, 2),
                      "ns_per_row": round(ms * 1e6 / (1 << 19), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
