"""SmallFloat port conformance (util/SmallFloat.java:103-168 semantics)."""

import numpy as np
import pytest

from lucene_ray.util.smallfloat import (
    LENGTH_TABLE_INT,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_array,
)

# golden values computed by hand from the Java algorithm
GOLDEN = {
    0: 0, 1: 1, 23: 23, 24: 24, 25: 25, 31: 31,
    # 32-24=8 -> numBits=4, shift=0 -> enc=(8>>0)&7 | 1<<3 = 8 -> 24+8=32
    32: 32,
    # 40-24=16 -> numBits=5, shift=1, enc=(16>>1)&7|(2<<3)=16+0? (16>>1)=8,&7=0,|16 =16 -> 40
    40: 40,
    # 121-24=97 -> numBits=7, shift=3, 97>>3=12, &7=4, |(4<<3)=36 -> 24+36=60
    121: 60,
    # 200-24=176 -> numBits=8, shift=4, 176>>4=11, &7=3, |(5<<3)=40 -> 43 -> 67
    200: 67,
    # 5000-24=4976 -> numBits=13, shift=9, 4976>>9=9, &7=1, |(10<<3)=80 -> 81 -> 105
    5000: 105,
}


def test_identity_below_free_values():
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_golden_values():
    for raw, enc in GOLDEN.items():
        assert int_to_byte4(raw) == enc, raw


def test_monotonic_and_lossy_floor():
    prev = -1
    for x in range(0, 100000, 7):
        b = int_to_byte4(x)
        assert b >= prev
        prev = b
        assert byte4_to_int(b) <= x


def test_roundtrip_exact_on_table():
    for b in range(256):
        assert int_to_byte4(byte4_to_int(b)) == b


def test_vectorized_matches_scalar():
    xs = np.array([0, 1, 7, 23, 24, 30, 31, 32, 100, 120, 121, 122, 200, 5000, 10**6, 2**31 - 1])
    got = int_to_byte4_array(xs)
    want = np.array([int_to_byte4(int(x)) for x in xs], dtype=np.uint8)
    assert (got == want).all()


def test_length_table():
    assert LENGTH_TABLE_INT[0] == 0
    assert LENGTH_TABLE_INT[23] == 23
    assert (np.diff(LENGTH_TABLE_INT) >= 0).all()


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
