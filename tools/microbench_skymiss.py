"""A/B: full-width blocked sky-miss gathers vs packed-miss-lane gathers.

Round 3 measured the PACKED variant worse in the AoS frame (the index
gathers + scatter at the pack cap exceeded the blocked full-width
gathers). The round-4 SoA tail changed the scatter side (flat channels),
so re-measure standalone at bench shape: 2M lanes, ~20% miss fraction.

Run on TPU: python tools/microbench_skymiss.py
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


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    return (time.monotonic() - t0) / reps * 1e3


def main():
    n = 1920 * 1080
    rng = np.random.default_rng(7)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dx, dy, dz = (jnp.asarray(d[:, i]) for i in range(3))
    miss = jnp.asarray(rng.random(n) < 0.2)
    pos = jnp.asarray(np.array([128.0, 100.0, 20.0], np.float32))
    sun = jnp.asarray(np.array([-0.28, 0.65, -0.71], np.float32))

    clouds = sky_ops.write_clouds(sun, jnp.float32(0.0), 512)
    skybox = sky_ops.write_skybox(sun, jnp.float32(0.0), 256)
    cb = sky_ops.block_clouds(clouds)
    sb = sky_ops.block_skybox(skybox)

    @jax.jit
    def full_width(dx, dy, dz, miss):
        r, g, b = sky_ops.sample_skybox_and_clouds_blocked_soa(
            sb, 256, cb, 512, pos, dx, dy, dz)
        z = jnp.zeros_like(r)
        return (jnp.where(miss, r, z), jnp.where(miss, g, z),
                jnp.where(miss, b, z))

    cap = max(n // 4, 4096)   # miss fraction head-room

    @jax.jit
    def packed(dx, dy, dz, miss):
        idx = jnp.nonzero(miss, size=cap, fill_value=n)[0]
        valid = idx < n
        safe = jnp.minimum(idx, n - 1)
        r, g, b = sky_ops.sample_skybox_and_clouds_blocked_soa(
            sb, 256, cb, 512, pos, dx[safe], dy[safe], dz[safe])
        z = jnp.zeros((n,), jnp.float32)
        return (z.at[idx].set(jnp.where(valid, r, 0.0), mode="drop"),
                z.at[idx].set(jnp.where(valid, g, 0.0), mode="drop"),
                z.at[idx].set(jnp.where(valid, b, 0.0), mode="drop"))

    ms_full = timeit(full_width, dx, dy, dz, miss)
    ms_pack = timeit(packed, dx, dy, dz, miss)
    a = full_width(dx, dy, dz, miss)
    b = packed(dx, dy, dz, miss)
    equal = all(bool(jnp.array_equal(x, y)) for x, y in zip(a, b))
    print(json.dumps({"full_width_ms": round(ms_full, 2),
                      "packed_ms": round(ms_pack, 2),
                      "miss_frac": 0.2, "cap": cap,
                      "bit_equal": equal}), flush=True)


if __name__ == "__main__":
    main()
