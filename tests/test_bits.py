"""Unit tests for bit/index helpers — includes the reference's only unit test,
the index<->offset round trip (src/voxel/util.rs:40-48), over all 64^3 cells."""

import jax.numpy as jnp
import numpy as np

from vvr_tpu.utils import bits


def test_index_offset_roundtrip_all_64():
    idx = np.arange(64 ** 3)
    off = bits.index_to_offset(idx, 64)
    back = bits.offset_to_index(off, 64)
    np.testing.assert_array_equal(back, idx)
    assert off.min() == 0 and off.max() == 63


def test_child_bit_index_layout():
    # x | y<<2 | z<<4 (src/voxel/util.rs:32-38)
    off = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 3, 3]])
    np.testing.assert_array_equal(bits.child_bit_index(off), [1, 4, 16, 63])


def test_popcount32_matches_python():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 2 ** 32, size=1000, dtype=np.uint32)
    expect = np.array([bin(int(x)).count("1") for x in v])
    np.testing.assert_array_equal(np.asarray(bits.popcount32(jnp.asarray(v))), expect)
    np.testing.assert_array_equal(bits.popcount32(v), expect)


def test_popcount_prefix_u64_matches_reference_rule():
    rng = np.random.default_rng(1)
    masks = rng.integers(0, 2 ** 64, size=500, dtype=np.uint64)
    bit = rng.integers(0, 64, size=500)
    lo, hi = bits.u64_split(masks)
    got = np.asarray(bits.popcount_prefix_u64(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(bit)))
    # reference rule: countbits(mask & ((1<<bit)-1)) (ray_stuff_other.slang:216-218)
    expect = np.array([bin(int(m) & ((1 << int(b)) - 1)).count("1")
                       for m, b in zip(masks, bit)])
    np.testing.assert_array_equal(got, expect)


def test_u64_get_bit():
    rng = np.random.default_rng(2)
    masks = rng.integers(0, 2 ** 64, size=200, dtype=np.uint64)
    bit = rng.integers(0, 64, size=200)
    lo, hi = bits.u64_split(masks)
    got = np.asarray(bits.u64_get_bit(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(bit)))
    expect = np.array([(int(m) >> int(b)) & 1 for m, b in zip(masks, bit)])
    np.testing.assert_array_equal(got, expect)


def test_base4_trailing_levels():
    v = np.array([0, 1, 4, 16, 64, 20, 256, 3], np.int32)
    got = bits.base4_trailing_levels(v, 4)
    np.testing.assert_array_equal(got, [4, 0, 1, 2, 3, 1, 4, 0])


def test_hash_family_shapes_and_range():
    from vvr_tpu.utils import hash as h
    rng = np.random.default_rng(0)
    p2 = jnp.asarray(rng.random((32, 2)), jnp.float32) * 100
    p3 = jnp.asarray(rng.random((32, 3)), jnp.float32) * 100
    p4 = jnp.asarray(rng.random((32, 4)), jnp.float32) * 100
    p1 = jnp.asarray(rng.random(32), jnp.float32) * 100
    outs = [(h.hash11(p1), ()), (h.hash12(p2), ()), (h.hash13(p3), ()),
            (h.hash14(p4), ()), (h.hash21(p1), (2,)), (h.hash22(p2), (2,)),
            (h.hash23(p3), (2,)), (h.hash31(p1), (3,)), (h.hash32(p2), (3,)),
            (h.hash33(p3), (3,)), (h.hash41(p1), (4,))]
    for out, tail in outs:
        assert out.shape == (32,) + tail
        a = np.asarray(out)
        assert (a >= 0).all() and (a < 1).all()
        assert a.std() > 0.1  # actually distributed
