"""A/B cloud/skybox table layouts at bench width (round 5).

The round-4 design gathers a 2x2-texel BLOCK row (64 B) from a 65536-row
table then one-hot-reduces the sub-texel out of (N, 16) — built when the
measured cost model said gathers were index-count-bound and row width
free. The round-5 full-frame profile contradicts that for one-shot
full-width gathers: the 8 B-row classify gather runs at 4.3 ns/lane
(fusion.101) while the 64 B-row clouds gather runs 16 ns/lane
(fusion.100) — i.e. ~row-BANDWIDTH-bound. If so, a flat per-texel
(R^2, 4) table (16 B rows, no sub-texel select at all) should beat the
blocked row + one-hot extraction.

Variants (all exact-equal outputs asserted on device):
  A. current: blocked (R^2/4, 16) gather + _onehot_cols stride 4
  B. flat (R^2, 4) texel rows + _onehot_cols over (N, 4)
  C. flat split: one (R^2,) table per channel, 4 gathers
  D. alpha-only flat (R^2,) + rgb flat (R^2, 4) (merged lookup only
     needs alpha on hit lanes)
Skybox variants:
  SA. current: blocked (6*(R/4)^2, 48) + onehot stride 3
  SB. flat (6*R^2, 4) rows (rgb + pad) + onehot over (N, 4)

Run on TPU: python tools/microbench_skymiss4.py
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

F32 = jnp.float32


def timeit(fn, *args, reps=6):
    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        best = min(best, time.monotonic() - t0)
    return best * 1e3


def main():
    W, H = 1920, 1080
    n = W * H
    R = 512
    rng = np.random.default_rng(7)
    clouds = rng.random((R, R, 4)).astype(np.float32)
    clouds_j = jnp.asarray(clouds)

    # bench-like index field: smooth texel coords over the screen (the
    # real field is a projection of surface points / directions — smooth
    # with a silhouette discontinuity band)
    jj, ii = np.mgrid[0:H, 0:W]
    u = (ii / W + 0.05 * np.sin(jj / 37.0)).ravel()
    v = (jj / H + 0.05 * np.cos(ii / 53.0)).ravel()
    iu = np.clip((u * R).astype(np.int32), 0, R - 1)
    iv = np.clip((v * R).astype(np.int32), 0, R - 1)
    iu_j = jnp.asarray(iu)
    iv_j = jnp.asarray(iv)

    blocked = sky_ops.block_clouds(clouds_j)          # (R^2/4, 16)
    flat4 = clouds_j.reshape(R * R, 4)                # (R^2, 4)
    flats = [jnp.asarray(clouds[:, :, c].reshape(-1)) for c in range(4)]

    # A: current blocked + onehot
    @jax.jit
    def var_a(iu_, iv_):
        row_idx = (iv_ >> 1) * (R // 2) + (iu_ >> 1)
        sub = ((iv_ & 1) << 1) | (iu_ & 1)
        row = jnp.take(blocked, row_idx, axis=0, mode="clip")
        return sky_ops._onehot_cols(row, sub, 4, 4)

    # B: flat texel rows + onehot over (N, 4)
    @jax.jit
    def var_b(iu_, iv_):
        row = jnp.take(flat4, iv_ * R + iu_, axis=0, mode="clip")
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        return [jnp.where(j == c, row, F32(0.0)).sum(axis=1)
                for c in range(4)]

    # C: per-channel flat tables, 4 gathers
    @jax.jit
    def var_c(iu_, iv_):
        idx = iv_ * R + iu_
        return [jnp.take(flats[c], idx, mode="clip") for c in range(4)]

    # D: alpha-only flat gather (the merged lookup's all-lane need)
    @jax.jit
    def var_d(iu_, iv_):
        return jnp.take(flats[3], iv_ * R + iu_, mode="clip")

    a = var_a(iu_j, iv_j)
    b = var_b(iu_j, iv_j)
    c = var_c(iu_j, iv_j)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(c[k]))
    print(json.dumps({"bench": "clouds", "n": n,
                      "A_blocked16_onehot_ms": round(timeit(var_a, iu_j, iv_j), 2),
                      "B_flat4_onehot_ms": round(timeit(var_b, iu_j, iv_j), 2),
                      "C_flat_per_chan_ms": round(timeit(var_c, iu_j, iv_j), 2),
                      "D_alpha_only_ms": round(timeit(var_d, iu_j, iv_j), 2)}),
          flush=True)

    # ---- skybox ----
    RS = 256
    sky = rng.random((6, RS, RS, 3)).astype(np.float32)
    sky_j = jnp.asarray(sky)
    face = jnp.asarray(rng.integers(0, 6, n).astype(np.int32))
    ius = jnp.asarray(np.clip((u * RS).astype(np.int32), 0, RS - 1))
    ivs = jnp.asarray(np.clip((v * RS).astype(np.int32), 0, RS - 1))
    # current blocked layout (ops/sky.py block_skybox): 4x4 blocks, 48 cols
    vblk = sky_j.reshape(6, RS // 4, 4, RS // 4, 4, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(6 * (RS // 4) ** 2, 48)
    flat_s = jnp.concatenate(
        [sky_j.reshape(6 * RS * RS, 3),
         jnp.zeros((6 * RS * RS, 1), F32)], axis=1)   # pad to 4 cols

    @jax.jit
    def var_sa(face_, iu_, iv_):
        rb = RS // 4
        row = jnp.take(vblk, (face_ * rb + (iv_ >> 2)) * rb + (iu_ >> 2),
                       axis=0, mode="clip")
        sub = ((iv_ & 3) << 2) | (iu_ & 3)
        return sky_ops._onehot_cols(row, sub, 3, 3)

    @jax.jit
    def var_sb(face_, iu_, iv_):
        row = jnp.take(flat_s, (face_ * RS + iv_) * RS + iu_, axis=0,
                       mode="clip")
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        return [jnp.where(j == c, row, F32(0.0)).sum(axis=1)
                for c in range(3)]

    sa = var_sa(face, ius, ivs)
    sb = var_sb(face, ius, ivs)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(sa[k]), np.asarray(sb[k]))
    print(json.dumps({"bench": "skybox", "n": n,
                      "SA_blocked48_onehot_ms": round(timeit(var_sa, face, ius, ivs), 2),
                      "SB_flat4_onehot_ms": round(timeit(var_sb, face, ius, ivs), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
