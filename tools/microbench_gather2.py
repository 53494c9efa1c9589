"""Round-2 follow-ups to microbench_gather.py (see results in PROGRESS.md).

Questions:
  - does the ~4.9 ns floor hold for wider rows / tiny tables / huge tables?
  - does Mosaic support 2D gather (take_along_axis) from a VMEM table?
  - one-hot MXU gather with the f32->i32 cast fix.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 21
CHAIN = 8
REPS = 6


def timed(fn, *args) -> float:
    np.asarray(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.monotonic()
        np.asarray(fn(*args))
        ts.append(time.monotonic() - t0)
    return float(np.median(ts))


def report(name, sec, n=N, **extra):
    print(json.dumps({"name": name, "ns_per_elem": round(sec / (n * CHAIN) * 1e9, 3),
                      "ms_per_round": round(sec / CHAIN * 1e3, 3), **extra}),
          flush=True)


def fail(name, err):
    print(json.dumps({"name": name,
                      "error": f"{type(err).__name__}: {err}"[:300]}), flush=True)


def make_table(rows, cols, key):
    return jax.random.randint(key, (rows, cols), 0, 1 << 30,
                              dtype=jnp.int32).astype(jnp.uint32)


def xla_chain(rows, cols):
    name = f"xla:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(0)
        table = make_table(rows, cols, key)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)

        @jax.jit
        def run(table, idx):
            acc = jnp.uint32(0)
            for _ in range(CHAIN):
                r = jnp.take(table, idx, axis=0)
                acc = acc + r[:, 0].sum()
                idx = (r[:, 0].astype(jnp.int32) ^ idx) % rows
            return acc
        report(name, timed(run, table, idx0))
    except Exception as e:  # noqa: BLE001
        fail(name, e)


def pallas_tala(rows, cols, chunk=2048):
    """take_along_axis 2D gather inside Pallas, table in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    name = f"pallas_tala:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(1)
        table = make_table(rows, cols, key)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)

        def kernel(table_ref, idx_ref, out_ref):
            t = table_ref[:]
            idx = idx_ref[:]
            acc = jnp.zeros((chunk,), jnp.uint32)
            for _ in range(CHAIN):
                ix2 = jnp.broadcast_to(idx[:, None], (chunk, cols))
                r = jnp.take_along_axis(t, ix2, axis=0)
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


def pallas_onehot(rows, cols, chunk=1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    name = f"pallas_onehot:R{rows}xC{cols}"
    try:
        key = jax.random.PRNGKey(3)
        table = make_table(rows, cols, key)
        planes = jnp.stack([(table >> (8 * b)) & 0xFF for b in range(4)],
                           axis=-1).reshape(rows, cols * 4).astype(jnp.bfloat16)
        idx0 = jax.random.randint(key, (N,), 0, rows, dtype=jnp.int32)

        def kernel(planes_ref, idx_ref, out_ref):
            p = planes_ref[:]
            idx = idx_ref[:]
            acc = jnp.zeros((chunk,), jnp.int32)
            rows_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
            for _ in range(CHAIN):
                onehot = (rows_iota == idx[:, None]).astype(jnp.bfloat16)
                g = jnp.dot(onehot, p, preferred_element_type=jnp.float32)
                gi = g.astype(jnp.int32).reshape(chunk, cols, 4)
                r0 = (gi[:, 0, 0] | (gi[:, 0, 1] << 8) | (gi[:, 0, 2] << 16)
                      | (gi[:, 0, 3] << 24))
                acc = acc + r0
                idx = (r0 ^ idx) % rows
            out_ref[:] = acc.astype(jnp.int32)

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
                out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            )(planes, idx)
            return out.sum()
        report(name, timed(run, planes, idx0))
    except Exception as e:  # noqa: BLE001
        fail(name, e)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    # row-width / table-size curve completion
    xla_chain(512, 16)
    xla_chain(32768, 32)
    xla_chain(4096, 64)
    xla_chain(2097152, 16)   # 1024^3 leaf-group table (128 MB)
    xla_chain(65536, 16)
    xla_chain(131072, 16)
    # Pallas VMEM experiments
    pallas_tala(32768, 16)
    pallas_tala(1024, 8)
    pallas_onehot(4096, 2)
    pallas_onehot(512, 16)


if __name__ == "__main__":
    main()
