"""Round-4 layout microbenches: gather output shapes, SoA vs AoS selects,
conv-based decimation — the measurements behind the shading-tail rewrite.

Run on TPU: python tools/microbench_layout3.py
"""
from __future__ import annotations

import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def _scalarize(fn):
    """One scalar output = ONE tunnel sync per rep (a per-leaf force pays
    ~28 ms round-trip PER LEAF through axon — the flaw that inflated the
    first run's multi-output variants)."""
    def wrapped(*args):
        r = fn(*args)
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(r):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot
    return wrapped


def timeit(fn, *args, reps=8):
    f = jax.jit(_scalarize(fn))
    r = f(*args)
    np.asarray(r)
    t0 = time.monotonic()
    for _ in range(reps):
        np.asarray(f(*args))
    return (time.monotonic() - t0) / reps * 1e3


def main():
    n = 1920 * 1080
    rng = np.random.default_rng(0)

    # --- gather: 1-D table vs 2-col vs 8-col rows, 64K/256K rows ---
    for rows in (1 << 16, 1 << 18, 1 << 20):
        idx = jnp.asarray(rng.integers(0, rows, n, dtype=np.int32))
        t1 = jnp.asarray(rng.random(rows, dtype=np.float32))
        t2 = jnp.asarray(rng.random((rows, 2), dtype=np.float32))
        t8 = jnp.asarray(rng.random((rows, 8), dtype=np.float32))

        ms = timeit((lambda i: jnp.take(t1, i, mode="clip") + 0.0), idx)
        print(json.dumps({"kind": "gather1d", "rows": rows, "ms": round(ms, 2),
                          "ns": round(ms * 1e6 / n, 2)}), flush=True)
        ms = timeit((
            lambda i: jnp.take(t1, i, mode="clip")
            + jnp.take(t1, jnp.minimum(i + 1, rows - 1), mode="clip")), idx)
        print(json.dumps({"kind": "gather1d_x2", "rows": rows,
                          "ms": round(ms, 2)}), flush=True)
        ms = timeit((
            lambda i: jnp.take(t2, i, axis=0, mode="clip").sum(-1)), idx)
        print(json.dumps({"kind": "gather2col", "rows": rows,
                          "ms": round(ms, 2)}), flush=True)
        ms = timeit((
            lambda i: jnp.take(t8, i, axis=0, mode="clip").sum(-1)), idx)
        print(json.dumps({"kind": "gather8col", "rows": rows,
                          "ms": round(ms, 2)}), flush=True)

    # --- select tree: SoA (N,) vs slicing an (N,48) row table ---
    row48 = jnp.asarray(rng.random((n, 48), dtype=np.float32))
    sub = jnp.asarray(rng.integers(0, 16, n, dtype=np.int32))

    def sel_soa(r48, s):
        cand = [r48[:, k * 3] for k in range(16)]
        b0, b1 = (s & 1) == 0, (s & 2) == 0
        b2, b3 = (s & 4) == 0, (s & 8) == 0
        a = [jnp.where(b0, cand[2 * k], cand[2 * k + 1]) for k in range(8)]
        b = [jnp.where(b1, a[2 * k], a[2 * k + 1]) for k in range(4)]
        c = [jnp.where(b2, b[2 * k], b[2 * k + 1]) for k in range(2)]
        return jnp.where(b3, c[0], c[1])

    ms = timeit((lambda r, s: sel_soa(r, s)), row48, sub)
    print(json.dumps({"kind": "sel16_1ch", "ms": round(ms, 2)}), flush=True)
    ms = timeit((lambda r, s: jnp.stack(
        [sel_soa(r[:, c:], s) for c in range(3)], -1)), row48, sub)
    print(json.dumps({"kind": "sel16_3ch_stackAoS", "ms": round(ms, 2)}),
          flush=True)
    ms = timeit((lambda r, s: tuple(
        sel_soa(r[:, c:], s) for c in range(3))), row48, sub)
    print(json.dumps({"kind": "sel16_3ch_SoA", "ms": round(ms, 2)}),
          flush=True)

    # --- the poison shape: select chain with (N,1) mask broadcast ---
    a3 = jnp.asarray(rng.random((n, 3), dtype=np.float32))
    b3_ = jnp.asarray(rng.random((n, 3), dtype=np.float32))
    m = jnp.asarray(rng.random(n) < 0.5)

    ms = timeit((lambda a, b, mm: jnp.where(mm[:, None], a, b) * 2.0
                        + 1.0), a3, b3_, m)
    print(json.dumps({"kind": "where_N1_mask_N3", "ms": round(ms, 2)}),
          flush=True)
    ms = timeit((lambda a, b, mm: tuple(
        jnp.where(mm, a[:, c], b[:, c]) * 2.0 + 1.0 for c in range(3))),
        a3, b3_, m)
    print(json.dumps({"kind": "where_SoA_3x", "ms": round(ms, 2)}),
          flush=True)

    # --- lighting-ish arithmetic: AoS (N,3) vs SoA 3x(N,) ---
    def aos(a, b):
        h = a + b
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        d = jnp.sum(h * a, -1)
        s = jnp.power(jnp.clip(1.0 - d, 0.0, 1.0), 5.0)
        return h * s[:, None] + a * d[:, None]

    ms = timeit((aos), a3, b3_)
    print(json.dumps({"kind": "lightish_AoS", "ms": round(ms, 2)}), flush=True)

    def soa(ax, ay, az, bx, by, bz):
        hx, hy, hz = ax + bx, ay + by, az + bz
        inv = 1.0 / jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-12)
        hx, hy, hz = hx * inv, hy * inv, hz * inv
        d = hx * ax + hy * ay + hz * az
        s = jnp.power(jnp.clip(1.0 - d, 0.0, 1.0), 5.0)
        return hx * s + ax * d, hy * s + ay * d, hz * s + az * d

    cols_a = tuple(a3[:, c] for c in range(3))
    cols_b = tuple(b3_[:, c] for c in range(3))
    ms = timeit((soa), *cols_a, *cols_b)
    print(json.dumps({"kind": "lightish_SoA", "ms": round(ms, 2)}), flush=True)

    # --- decimating 3x3 stride-2 conv vs the slice-based downsample ---
    img = jnp.asarray(rng.random((4, 1081, 1921), dtype=np.float32))

    def conv_ds(x):
        # depthwise 3x3 stride-2: feature_group_count = C, NCHW
        k = jnp.full((4, 1, 3, 3), 1.0 / 9.0, jnp.float32)
        return jax.lax.conv_general_dilated(
            x[None], k, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=4)[0]
    ms = timeit((conv_ds), img)
    print(json.dumps({"kind": "conv3x3s2_depthwise_4x1080p",
                      "ms": round(ms, 2)}), flush=True)

    def conv_ds_batch(x):
        # channels as batch, 1 feature: NCHW with C=1
        k = jnp.full((1, 1, 3, 3), 1.0 / 9.0, jnp.float32)
        return jax.lax.conv_general_dilated(
            x[:, None], k, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    ms = timeit((conv_ds_batch), img)
    print(json.dumps({"kind": "conv3x3s2_batch_4x1080p", "ms": round(ms, 2)}),
          flush=True)

    def rw_ds(x):
        # reduce_window sum 3x3 stride 2
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3), (1, 2, 2),
                                  "valid")
        return s / 9.0
    ms = timeit((rw_ds), img)
    print(json.dumps({"kind": "reduce_window3x3s2_4x1080p",
                      "ms": round(ms, 2)}), flush=True)

    # upsample 4x via conv_transpose-ish: phase stack (current) timing ref
    small = jnp.asarray(rng.random((4, 270, 480), dtype=np.float32))
    from vvr_tpu.ops.post import _upsample4_bilinear
    ms = timeit((lambda x: _upsample4_bilinear(x, 1080, 1920)), small)
    print(json.dumps({"kind": "upsample4_phases_current", "ms": round(ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
