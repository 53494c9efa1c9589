"""TPU gather microbenchmarks for the traversal redesign (round 2).

Measures the cost of the operation that bounds the raytracer: a per-lane
random row fetch from a node table, chained (each fetch's result feeds the
next index, like a real tree walk). Variants:

  xla:R{rows}xC{cols}        jnp.take row gather, dependent chain
  xla_sorted:...             same but indices sorted (locality effect)
  pallas_take:...            jnp.take inside a Pallas kernel, table in VMEM
  pallas_vreg:...            one-vreg (1024-elem) table gather in Pallas
  pallas_onehot:...          exact u32 gather via u8-plane one-hot bf16 matmul
  pallas_scalar:...          scalar-unit fori_loop gather in Pallas

Prints one JSON line per experiment: {"name", "ns_per_elem", ...} or
{"name", "error": ...} when a variant fails to compile/lower — the negative
result is the deliverable in that case (VERDICT.md round-1, next-round #1).

Run on the TPU:  python tools/microbench_gather.py
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 21          # lanes (~1080p ray count)
CHAIN = 8            # dependent gathers per measured call
REPS = 6


def timed(fn, *args) -> float:
    """Median wall seconds per call; materializes a tiny scalar output."""
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.monotonic()
        np.asarray(fn(*args))
        ts.append(time.monotonic() - t0)
    return float(np.median(ts))


def report(name: str, sec: float, **extra):
    ns = sec / (N * CHAIN) * 1e9
    print(json.dumps({"name": name, "ns_per_elem": round(ns, 3),
                      "ms_per_round": round(sec / CHAIN * 1e3, 3), **extra}),
          flush=True)


def fail(name: str, err: BaseException):
    print(json.dumps({"name": name,
                      "error": f"{type(err).__name__}: {err}"[:500]}),
          flush=True)


def make_table(rows: int, cols: int, key) -> jnp.ndarray:
    t = jax.random.randint(key, (rows, cols), 0, 1 << 30, dtype=jnp.int32)
    return t.astype(jnp.uint32)


# ---------------------------------------------------------------- XLA take
def xla_chain(rows: int, cols: int, sort: bool = False):
    name = f"xla{'_sorted' if sort else ''}:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(0)
        table = make_table(rows, cols, key)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)
        if sort:
            idx0 = jnp.sort(idx0)

        @jax.jit
        def run(table, idx):
            acc = jnp.uint32(0)
            for _ in range(CHAIN):
                r = jnp.take(table, idx, axis=0)
                acc = acc + r[:, 0].sum()
                idx = (r[:, 0].astype(jnp.int32) ^ idx) % rows
                if sort:
                    idx = jnp.sort(idx) if False else idx  # keep chain honest
            return acc
        report(name, timed(run, table, idx0))
    except Exception as e:  # noqa: BLE001
        fail(name, e)


# ------------------------------------------------------------- Pallas take
def pallas_take(rows: int, cols: int, chunk: int = 2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    name = f"pallas_take:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(1)
        table = make_table(rows, cols, key)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)

        def kernel(table_ref, idx_ref, out_ref):
            idx = idx_ref[:]
            acc = jnp.zeros((chunk,), jnp.uint32)
            for _ in range(CHAIN):
                r = jnp.take(table_ref[:], idx, axis=0)   # (chunk, cols)
                acc = acc + r[:, 0]
                idx = (r[:, 0].astype(jnp.int32) ^ idx) % rows
            out_ref[:] = acc

        @jax.jit
        def run(table, idx):
            out = pl.pallas_call(
                kernel,
                grid=(N // chunk,),
                in_specs=[
                    pl.BlockSpec((rows, cols), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((chunk,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
            )(table, idx)
            return out.sum()
        report(name, timed(run, table, idx0))
    except Exception as e:  # noqa: BLE001
        fail(name, e)


# -------------------------------------------------- Pallas one-vreg gather
def pallas_vreg(chunk: int = 2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = 1024
    name = f"pallas_vreg:R{rows}"
    try:
        key = jax.random.PRNGKey(2)
        table = jax.random.randint(key, (rows,), 0, 1 << 30, jnp.int32
                                   ).astype(jnp.uint32)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)

        def kernel(table_ref, idx_ref, out_ref):
            t = table_ref[:]
            idx = idx_ref[:]
            acc = jnp.zeros((chunk,), jnp.uint32)
            for _ in range(CHAIN):
                r = jnp.take(t, idx)
                acc = acc + r
                idx = (r.astype(jnp.int32) ^ idx) % rows
            out_ref[:] = acc

        @jax.jit
        def run(table, idx):
            out = pl.pallas_call(
                kernel,
                grid=(N // chunk,),
                in_specs=[
                    pl.BlockSpec((rows,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((chunk,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
            )(table, idx)
            return out.sum()
        report(name, timed(run, table, idx0))
    except Exception as e:  # noqa: BLE001
        fail(name, e)


# ---------------------------------------------- one-hot MXU gather (exact)
def pallas_onehot(rows: int, cols: int, chunk: int = 1024):
    """Exact u32 row gather as u8-plane bf16 one-hot matmul on the MXU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    name = f"pallas_onehot:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(3)
        table = make_table(rows, cols, key)
        # u8 planes, bf16 (0..255 exact in bf16)
        planes = jnp.stack([(table >> (8 * b)) & 0xFF for b in range(4)],
                           axis=-1).reshape(rows, cols * 4).astype(jnp.bfloat16)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)

        def kernel(planes_ref, idx_ref, out_ref):
            p = planes_ref[:]
            idx = idx_ref[:]
            acc = jnp.zeros((chunk,), jnp.uint32)
            rows_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
            for _ in range(CHAIN):
                onehot = (rows_iota == idx[:, None]).astype(jnp.bfloat16)
                g = jnp.dot(onehot, p, preferred_element_type=jnp.float32)
                gi = g.astype(jnp.uint32).reshape(chunk, cols, 4)
                r0 = (gi[:, 0, 0] | (gi[:, 0, 1] << 8) | (gi[:, 0, 2] << 16)
                      | (gi[:, 0, 3] << 24))
                acc = acc + r0
                idx = (r0.astype(jnp.int32) ^ idx) % rows
            out_ref[:] = acc

        @jax.jit
        def run(planes, idx):
            out = pl.pallas_call(
                kernel,
                grid=(N // chunk,),
                in_specs=[
                    pl.BlockSpec((rows, cols * 4), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((chunk,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
            )(planes, idx)
            return out.sum()
        report(name, timed(run, planes, idx0))
    except Exception as e:  # noqa: BLE001
        fail(name, e)


# ----------------------------------------------- Pallas scalar-loop gather
def pallas_scalar(rows: int, cols: int, chunk: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    name = f"pallas_scalar:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(4)
        table = make_table(rows, cols, key)
        idx0 = jax.random.randint(key, (N // 64,), 0, rows, dtype=jnp.int32)
        n_small = N // 64  # scalar path is slow; scale down, report per-elem

        def kernel(idx_ref, table_ref, out_ref):
            def body(i, _):
                j = idx_ref[i]
                out_ref[i, :] = table_ref[j, :]
                return 0
            jax.lax.fori_loop(0, chunk, body, 0)

        @jax.jit
        def run(table, idx):
            out = pl.pallas_call(
                kernel,
                grid=(n_small // chunk,),
                in_specs=[
                    pl.BlockSpec((chunk,), lambda i: (i,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((rows, cols), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((chunk, cols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_small, cols), jnp.uint32),
            )(idx, table)
            return out.sum()

        np.asarray(run(table, idx0))
        ts = []
        for _ in range(REPS):
            t0 = time.monotonic()
            np.asarray(run(table, idx0))
            ts.append(time.monotonic() - t0)
        sec = float(np.median(ts))
        ns = sec / n_small * 1e9
        print(json.dumps({"name": name, "ns_per_elem": round(ns, 3),
                          "note": "single un-chained gather, small N"}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        fail(name, e)


def main():
    print(json.dumps({"device": str(jax.devices()[0]),
                      "jax": jax.__version__}), flush=True)
    # --- XLA baselines: row-width curve at leaf-table size, superbrick size
    for rows, cols in [(266305, 2), (266305, 4), (266305, 16),
                       (32768, 16), (32768, 8), (4096, 2), (4096, 8),
                       (266305, 32)]:
        xla_chain(rows, cols)
    xla_chain(266305, 2, sort=True)
    # --- Pallas experiments (the VERDICT-mandated VMEM experiment)
    pallas_vreg()
    pallas_take(4096, 2)
    pallas_take(266305, 2)
    pallas_take(32768, 16)
    pallas_onehot(4096, 2)
    pallas_onehot(64, 2)
    pallas_scalar(266305, 2)
    pallas_scalar(32768, 16)


if __name__ == "__main__":
    main()
