"""A/B cloud/skybox table layouts, K-chained inside one jit (round 5).

microbench_skymiss4.py's per-call sync pays the ~30 ms tunnel RTT per
rep — useless at this granularity. Here each variant runs K=16 dependent
iterations inside ONE jit (the next index perturbed by the previous
value's sign bit, never actually changing: val >= 0 everywhere), so one
sync amortizes and per-iteration cost = (t_K - t_1) / (K - 1).

Run on TPU: python tools/microbench_skymiss5.py
"""
from __future__ import annotations

import json, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from vvr_tpu.ops import sky as sky_ops

F32 = jnp.float32


def timed(fn, *args, reps=4):
    r = fn(*args); jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        r = fn(*args); jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        best = min(best, time.monotonic() - t0)
    return best * 1e3


def chain(make_body, idx0, K):
    """K dependent reps of body(idx) -> (val_sum, next-idx perturbation)."""
    @jax.jit
    def run(idx):
        acc = jnp.zeros((), F32)
        cur = idx
        for _ in range(K):
            s, pert = make_body(cur)
            acc = acc + s
            cur = cur + pert          # pert == 0 always, but data-dependent
        return acc
    return run


def main():
    W, H = 1920, 1080
    n = W * H
    R = 512
    rng = np.random.default_rng(7)
    clouds = rng.random((R, R, 4)).astype(np.float32)
    clouds_j = jnp.asarray(clouds)
    jj, ii = np.mgrid[0:H, 0:W]
    u = (ii / W + 0.05 * np.sin(jj / 37.0)).ravel()
    v = (jj / H + 0.05 * np.cos(ii / 53.0)).ravel()
    iu = np.clip((u * R).astype(np.int32), 0, R - 1)
    iv = np.clip((v * R).astype(np.int32), 0, R - 1)
    idx_tex = jnp.asarray(iv.astype(np.int64) * R + iu).astype(jnp.int32)
    sub = jnp.asarray((((iv & 1) << 1) | (iu & 1)).astype(np.int32))
    idx_blk = jnp.asarray(((iv >> 1) * (R // 2) + (iu >> 1)).astype(np.int32))

    blocked = sky_ops.block_clouds(clouds_j)
    flat4 = clouds_j.reshape(R * R, 4)
    flat_a = jnp.asarray(clouds[:, :, 3].reshape(-1))
    flat2 = clouds_j.reshape(R * R // 2, 8)   # 2-texel rows

    def body_blocked(idx):
        row = jnp.take(blocked, idx, axis=0, mode="clip")
        cs = sky_ops._onehot_cols(row, sub, 4, 4)
        s = sum(c.sum() for c in cs)
        return s, (s < -1.0).astype(jnp.int32)

    def body_gather_only(idx):
        row = jnp.take(blocked, idx, axis=0, mode="clip")
        s = row.sum()
        return s, (s < -1.0).astype(jnp.int32)

    def body_flat4(idx):
        row = jnp.take(flat4, idx, axis=0, mode="clip")
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        cs = [jnp.where(j == c, row, F32(0.0)).sum(axis=1) for c in range(4)]
        s = sum(c.sum() for c in cs)
        return s, (s < -1.0).astype(jnp.int32)

    def body_flat4_gather_only(idx):
        row = jnp.take(flat4, idx, axis=0, mode="clip")
        s = row.sum()
        return s, (s < -1.0).astype(jnp.int32)

    def body_alpha(idx):
        val = jnp.take(flat_a, idx, mode="clip")
        s = val.sum()
        return s, (s < -1.0).astype(jnp.int32)

    def body_flat2(idx):
        row = jnp.take(flat2, idx, axis=0, mode="clip")
        sub1 = sub & 1
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        base = (sub1 * 4)[:, None]
        cs = [jnp.where(j == base + c, row, F32(0.0)).sum(axis=1)
              for c in range(4)]
        s = sum(c.sum() for c in cs)
        return s, (s < -1.0).astype(jnp.int32)

    K = 16
    out = {}
    for name, body, idx in (
            ("blocked16_full", body_blocked, idx_blk),
            ("blocked16_gather_only", body_gather_only, idx_blk),
            ("flat4_full", body_flat4, idx_tex),
            ("flat4_gather_only", body_flat4_gather_only, idx_tex),
            ("alpha_flat1", body_alpha, idx_tex),
            ("flat2x8_full", body_flat2, idx_tex // 2)):
        t16 = timed(chain(body, idx, K), idx)
        t1 = timed(chain(body, idx, 1), idx)
        out[name] = round((t16 - t1) / (K - 1), 2)
    print(json.dumps({"bench": "clouds_chain_ms_per_iter", **out}),
          flush=True)


if __name__ == "__main__":
    main()
