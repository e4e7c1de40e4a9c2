"""Vectorized FOR / PFor bit-packing for 256-integer postings blocks.

Semantics follow the reference's block codec — fixed 256-value blocks
bit-packed at the per-block minimal width (codecs/lucene104/ForUtil.java:34)
with PFor-style patching: up to 7 exceptions whose high bits are stored
out-of-band (codecs/lucene104/PForUtil.java:27,51-104). The byte layout is
our own (numpy ``unpackbits`` little-endian bit order), not Lucene's — the
on-disk format here is Arrow/numpy-native, only the semantics carry over.

All kernels are numpy-vectorized; no per-int Python loops.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 256  # Lucene104PostingsFormat block size (Lucene104PostingsFormat.java:120)
MAX_EXCEPTIONS = 7  # PForUtil.MAX_EXCEPTIONS


def bit_widths(values: np.ndarray) -> np.ndarray:
    """Bits needed per value (0 for value 0)."""
    v = values.astype(np.uint32)
    w = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # exact for values < 2**32 via float64 log2 of integers
    w[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    return w


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (any length, uint32, all < 2**width) at ``width`` bits.

    width == 0 -> empty payload (all zeros).
    """
    if width == 0:
        return b""
    v = values.astype(np.uint32)
    n = v.shape[0]
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint32)[None, :]) & 1).astype(
        np.uint8
    )
    flat = bits.reshape(n * width)
    return np.packbits(flat, bitorder="little").tobytes()


def unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; ``buf`` is a uint8 array view."""
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    bits = np.unpackbits(buf, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint32)
    shifts = np.arange(width, dtype=np.uint32)
    return (bits << shifts).sum(axis=1, dtype=np.uint32)


def packed_nbytes(n: int, width: int) -> int:
    return (n * width + 7) // 8


def encode_pfor_block(values: np.ndarray) -> bytes:
    """Encode one block (<= BLOCK_SIZE uint32 values) as PFor:

    ``[width u8][n_exc u8][packed values @ width][exc positions u8 * n][exc
    high-bits u32 * n]``. Exceptions are the values whose width exceeds the
    chosen base width; their low ``width`` bits stay in the packed area and
    the remaining high bits are patched back on decode (PForUtil.java:51-104).
    """
    v = values.astype(np.uint32)
    w = bit_widths(v)
    wmax = int(w.max()) if v.size else 0
    # minimal base width leaving <= MAX_EXCEPTIONS patched values
    if v.size > MAX_EXCEPTIONS:
        base = int(np.partition(w, v.size - MAX_EXCEPTIONS - 1)[v.size - MAX_EXCEPTIONS - 1])
    else:
        base = wmax
    if base >= wmax:
        base = wmax
        exc_idx = np.empty(0, dtype=np.int64)
    else:
        exc_idx = np.nonzero(w > base)[0]
        if exc_idx.size > MAX_EXCEPTIONS:  # defensive; partition guarantees <=7
            base = wmax
            exc_idx = np.empty(0, dtype=np.int64)
    if base == 0 and exc_idx.size == 0:
        return bytes([0, 0])
    mask = np.uint32((1 << base) - 1) if base else np.uint32(0)
    low = v & mask
    payload = pack_bits(low, base)
    high = (v[exc_idx] >> np.uint32(base)).astype(np.uint32)
    parts = [bytes([base, exc_idx.size]), payload]
    if exc_idx.size:
        parts.append(exc_idx.astype(np.uint8).tobytes())
        parts.append(high.tobytes())
    return b"".join(parts)


def decode_pfor_block(buf: np.ndarray, offset: int, n: int) -> tuple[np.ndarray, int]:
    """Decode a block of ``n`` values at ``offset``; returns (values, end_offset)."""
    base = int(buf[offset])
    n_exc = int(buf[offset + 1])
    p = offset + 2
    nb = packed_nbytes(n, base)
    vals = unpack_bits(buf[p : p + nb], n, base)
    p += nb
    if n_exc:
        pos = buf[p : p + n_exc].astype(np.int64)
        p += n_exc
        high = buf[p : p + 4 * n_exc].view(np.uint32)
        p += 4 * n_exc
        vals[pos] |= high << np.uint32(base)
    return vals, p
