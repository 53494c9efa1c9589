"""A/B pack primitives at bench width: front-pack the indices of ~7%
active lanes out of 2M into a fixed cap.

The round-4 bench profile shows jnp.nonzero(size=cap) at 2M lanes costs
~18 ms in its scatter-add alone (fusion.426). Candidates:
  a. jnp.nonzero(size=cap, fill_value=n)
  b. manual cumsum + scatter (what nonzero lowers to, minus extras)
  c. argsort of a where(mask, iota, INT_MAX) key, take [:cap]
  d. lax.sort of the same key (key-only), take [:cap]
  e. two-stage hierarchical: per-block counts (reshape (B, K).sum) ->
     exclusive block offsets -> per-block local cumsum + scatter into cap
     (all full-lane ops except one scatter at 2M)

Contract: returns idx (cap,) with the active lane ids in ANY order,
inactive slots >= n (callers using mode="drop" scatters + a validity
mask don't care about order or fill). a/b/c/d produce sorted ids;
e produces sorted ids too (block-major). Run on TPU.
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

I32 = jnp.int32


def timeit(fn, *args, reps=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.monotonic() - t0) / reps * 1e3


def main():
    n = 1920 * 1080
    cap = max(n // 12, 4096)
    rng = np.random.default_rng(11)
    mask_np = rng.random(n) < 0.07
    mask = jnp.asarray(mask_np)
    big = jnp.iinfo(jnp.int32).max

    @jax.jit
    def var_a(m):
        return jnp.nonzero(m, size=cap, fill_value=n)[0]

    @jax.jit
    def var_b(m):
        pos = jnp.cumsum(m.astype(I32)) - 1
        tgt = jnp.where(m & (pos < cap), pos, cap)
        return jnp.full((cap,), n, I32).at[tgt].set(
            jnp.arange(n, dtype=I32), mode="drop")

    @jax.jit
    def var_c(m):
        key = jnp.where(m, jnp.arange(n, dtype=I32), big)
        return jnp.argsort(key)[:cap]

    @jax.jit
    def var_d(m):
        key = jnp.where(m, jnp.arange(n, dtype=I32), big)
        return jax.lax.sort(key)[:cap]

    K = 1024   # lanes per block
    B = n // K

    @jax.jit
    def var_e(m):
        mb = m.reshape(B, K)
        cnt = mb.sum(axis=1, dtype=I32)                    # (B,)
        off = jnp.cumsum(cnt) - cnt                        # (B,) exclusive
        loc = jnp.cumsum(mb.astype(I32), axis=1) - 1       # (B, K)
        pos = (off[:, None] + loc).reshape(-1)
        tgt = jnp.where(m & (pos < cap), pos, cap)
        return jnp.full((cap,), n, I32).at[tgt].set(
            jnp.arange(n, dtype=I32), mode="drop")

    out = {}
    ref = np.asarray(var_a(mask))
    ref_set = set(ref[ref < n].tolist())
    for name, fn in (("a_nonzero", var_a), ("b_cumsum_scatter", var_b),
                     ("c_argsort", var_c), ("d_sort", var_d),
                     ("e_blocked", var_e)):
        ms = timeit(fn, mask)
        got = np.asarray(fn(mask))
        got_set = set(got[got < n].tolist())
        out[name] = {"ms": round(ms, 2), "same_set": got_set == ref_set}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
