"""Layout microbenchmarks: channel-minor (N, 3)/(H, W, 4) vs planar.

TPU tiles the two minor dims as (8 sublanes, 128 lanes); a minor dim of
3 or 4 can leave cross-channel ops (axis=-1 reductions, [:, None]
broadcasts, channel stacks) at tiny lane utilization. This measures the
shapes the frame/post actually use so the round-3 layout decision is a
number, not a guess.
"""
from __future__ import annotations

import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = f(*args)
        jax.block_until_ready(r)
    ms = (time.monotonic() - t0) / reps * 1e3
    print(json.dumps({"case": name, "ms": round(ms, 3)}), flush=True)


def main():
    n = 1920 * 1080
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, 3), jnp.float32)
    b = jax.random.normal(key, (n, 3), jnp.float32)
    m = jax.random.uniform(key, (n,)) > 0.5
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]

    # --- wavefront shading shapes ---
    bench("dot_axis-1_(N,3)", lambda a, b: jnp.sum(a * b, -1), a, b)
    bench("dot_planar", lambda ax, ay, az, bx, by, bz:
          ax * bx + ay * by + az * bz, ax, ay, az, bx, by, bz)
    bench("where_bcast_(N,3)", lambda m, a, b: jnp.where(m[:, None], a, b),
          m, a, b)
    bench("where_planar", lambda m, ax, bx: jnp.where(m, ax, bx), m, ax, bx)
    bench("norm_(N,3)", lambda a: a / jnp.maximum(
        jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12), a)
    bench("elemwise_(N,3)", lambda a, b: a * 1.7 + b, a, b)
    bench("chain20_(N,3)", lambda a, b: _chain(a, b, 20), a, b)
    bench("chain20_flat", lambda a, b: _chain(a.reshape(-1), b.reshape(-1),
                                              20), a, b)

    # --- image shapes (post) ---
    H, W = 1080, 1920
    img = jax.random.normal(key, (H, W, 4), jnp.float32)
    imgp = jnp.transpose(img, (2, 0, 1))
    bench("img_norm_(H,W,4)",
          lambda x: jnp.linalg.norm(x, axis=-1, keepdims=True) > 0.6, img)
    bench("img_norm_planar(4,H,W)",
          lambda x: jnp.sqrt(x[0]**2 + x[1]**2 + x[2]**2 + x[3]**2) > 0.6,
          imgp)
    bench("img_pad_avg_(H,W,4)", lambda x: 0.5 * (
        jnp.pad(x, ((1, 1), (0, 0), (0, 0)), mode="edge")[:-1]
        + jnp.pad(x, ((1, 1), (0, 0), (0, 0)), mode="edge")[1:]), img)
    bench("img_pad_avg_planar", lambda x: 0.5 * (
        jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")[:, :-1]
        + jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")[:, 1:]), imgp)
    bench("transpose_to_planar", lambda x: jnp.transpose(x, (2, 0, 1)) * 1.0,
          img)
    bench("transpose_back", lambda x: jnp.transpose(x, (1, 2, 0)) * 1.0,
          imgp)

    # --- full post pipeline, current ---
    from vvr_tpu.ops import post as post_ops
    bench("bloom_pyramid_current", post_ops.bloom_pyramid, img, reps=4)
    bench("composite_current", lambda h, b: post_ops.composite(
        h, b, 1080, 1920, 0.05, True), img,
        jnp.zeros((270, 480, 4), jnp.float32), reps=4)


def _chain(a, b, k):
    x = a
    for _ in range(k):
        x = x * 1.0001 + b * 0.999
    return x


if __name__ == "__main__":
    main()
