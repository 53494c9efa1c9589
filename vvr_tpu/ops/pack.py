"""Wavefront compaction helpers.

A full-width jnp.nonzero(size=cap) pack costs ~41 ms at 2M lanes on TPU
(tools/microbench_pack.py) — its internal scatter carries one index per
INPUT lane, so the cost scales with the wavefront, not the survivors.
Sparse lane sets in this renderer (ambiguous shadow texels, soft-shadow
cone residue, bounce continuations) cluster spatially in pixel order, so
a two-stage pack is ~3x cheaper: stage 1 packs GROUP ids of G adjacent
lanes at n/G width, stage 2 tightens the expanded groups to true lanes at
the (much narrower) expanded width. The index SET is identical to the
one-stage pack's wherever both fit their caps; lanes dropped by either
cap are simply left unpacked — callers already route unpacked lanes
through their full-width overflow nets, so exactness is unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32


def pack_indices_grouped(mask, cap: int, group: int = 8,
                         cap_groups: int | None = None):
    """Front-pack the indices of set lanes in `mask` (n,) bool.

    Returns (idx, valid): idx (cap,) i32 with packed lane ids (== n on
    unused slots), valid (cap,) bool. Lanes beyond either cap are NOT
    packed (callers' overflow masks catch them via their usual
    `mask & ~scattered_mark` check).

    cap_groups defaults to cap * 2 // group: double-lane headroom for the
    group expansion (a group counts once however many of its lanes are
    set, so group counts sit between count/group and count)."""
    n = mask.shape[0]
    if cap_groups is None:
        cap_groups = max(cap * 2 // group, 512)
    ng = -(-n // group)
    mask_pad = mask if ng * group == n else jnp.concatenate(
        [mask, jnp.zeros((ng * group - n,), bool)])
    g_any = mask_pad.reshape(ng, group).any(axis=1)
    gidx = jnp.nonzero(g_any, size=cap_groups, fill_value=ng)[0]
    lane = (gidx[:, None] * group
            + jnp.arange(group, dtype=I32)[None, :]).reshape(-1)
    lane_safe = jnp.minimum(lane, n - 1)
    lane_set = jnp.take(mask, lane_safe, mode="clip") & (lane < n)
    m = cap_groups * group
    sel2 = jnp.nonzero(lane_set, size=cap, fill_value=m)[0]
    valid = sel2 < m
    idx = jnp.where(valid,
                    jnp.take(lane_safe, jnp.minimum(sel2, m - 1),
                             mode="clip"), n)
    return idx, valid
