"""Exact port of Lucene's SmallFloat norm encoding.

Reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-168
(longToInt4 / int4ToLong / intToByte4 / byte4ToInt).

Field-length norms are stored as one unsigned byte per (doc, field) via
``int_to_byte4(length)``; BM25 decodes them through a 256-entry table
(BM25Similarity.java LENGTH_TABLE). The encoding is identity below 24
(NUM_FREE_VALUES) and keeps 4 significant bits above, so it is monotonic
(order-preserving) — required for rank-identical scores.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """SmallFloat.longToInt4 — float-like order-preserving encoding, 4 sig bits."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    """SmallFloat.int4ToLong."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)  # 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24


def int_to_byte4(i: int) -> int:
    """SmallFloat.intToByte4 — returns the *unsigned* byte value 0..255."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def byte4_to_int(b: int) -> int:
    """SmallFloat.byte4ToInt — b is the unsigned byte value 0..255."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# 256-entry decode table (BM25Similarity.LENGTH_TABLE) as int64 and float32.
LENGTH_TABLE_INT = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)
LENGTH_TABLE_F32 = LENGTH_TABLE_INT.astype(np.float32)

# Vectorized encoder: lengths are bounded in practice, but build the encode
# path vectorized for arbitrary int arrays using the bit-twiddling directly.


def int_to_byte4_array(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over a non-negative int array -> uint8 array."""
    x = np.asarray(lengths, dtype=np.int64)
    if x.size and x.min() < 0:
        raise ValueError("Only supports positive values")
    out = np.empty(x.shape, dtype=np.int64)
    small = x < NUM_FREE_VALUES
    out[small] = x[small]
    big = ~small
    if big.any():
        i = x[big] - NUM_FREE_VALUES
        # bit_length via log2-free method: use np.frexp on float64 is exact
        # for ints < 2**53; lengths are way below that.
        nbits = np.zeros(i.shape, dtype=np.int64)
        nz = i > 0
        nbits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
        enc = i.copy()
        normal = nbits >= 4
        shift = nbits[normal] - 4
        e = (i[normal] >> shift) & 0x07
        e |= (shift + 1) << 3
        enc[normal] = e
        out[big] = NUM_FREE_VALUES + enc
    return out.astype(np.uint8)
