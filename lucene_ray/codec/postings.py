"""Posting-list blob codec: 256-doc PFor blocks + skip table + per-block impacts.

Semantics carried over from the reference:

* block structure and sizes — Lucene104PostingsWriter.java:54,85-129 (256-doc
  FOR/PFor packed blocks, tail block for the remainder);
* skip data — one entry per block with the block's last docID and byte
  offset, so scoring can seek without decoding (Lucene104PostingsFormat.java:343-353);
  instead of Lucene's interleaved 2-level skip list we store the whole skip
  table as contiguous numpy arrays — on a memory-mapped blob this gives
  O(1) vectorized "skip to first block with lastDoc >= target" via
  ``searchsorted`` and lets block-max bounds be computed for *all* blocks in
  one vectorized call, which is the Arrow/numpy-idiomatic equivalent of
  ImpactsDISI+MaxScoreCache (search/ImpactsDISI.java, MaxScoreCache.java:74-140);
* per-block impacts — (max freq, min norm byte) per block, a conservative
  single-point relaxation of CompetitiveImpactAccumulator's pareto frontier
  (codecs/CompetitiveImpactAccumulator.java:26,64): score is monotone in
  freq and anti-monotone in norm, so (max_freq, min_norm) upper-bounds every
  (freq, norm) in the block. Pruning is therefore slightly weaker than the
  reference's but never changes results.

Blob layout (little-endian):
  [df u32][n_blocks u32]
  [last_doc i32  * n_blocks]   -- last docID of each block
  [end_off u32   * n_blocks]   -- end byte offset of each block, rel. to data start
  [max_freq u32  * n_blocks]
  [min_norm u8   * n_blocks]
  data: per block, PFor(doc deltas), PFor(freqs), PFor(norm bytes)

Doc IDs are partition-local int32, delta-encoded with prev = -1 at list
start (all deltas >= 1 since doc IDs are strictly increasing).

Departure from the reference (deliberate): each posting carries its doc's
norm byte inline (+<=1 byte/posting packed). Lucene reads norms from a
doc-indexed norms file (codecs/lucene90/Lucene90NormsFormat.java:83); inlining
them makes a posting list self-contained for BM25 scoring, so merged /
shuffled posting runs can be scored anywhere without co-locating a
doc-partitioned norms table — the right trade for a distributed engine.
"""

from __future__ import annotations

import numpy as np

from lucene_ray.codec.forutil import (
    BLOCK_SIZE,
    decode_pfor_block,
    encode_pfor_block,
)

_HEADER = np.dtype(np.uint32).itemsize * 2


def encode_postings(
    doc_ids: np.ndarray, freqs: np.ndarray, norm_bytes: np.ndarray
) -> bytes:
    """Encode one term's postings.

    ``doc_ids``: strictly-increasing int array (partition-local);
    ``freqs``: per-doc term frequency (>=1); ``norm_bytes``: the norm byte of
    each posting's doc (parallel array) used only for per-block impacts.
    """
    df = int(doc_ids.shape[0])
    assert df > 0
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.uint32)
    norm_bytes = np.asarray(norm_bytes, dtype=np.uint8)
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE

    deltas = np.empty(df, dtype=np.uint32)
    deltas[0] = doc_ids[0] + 1  # prev = -1
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:], casting="unsafe")

    last_doc = np.empty(n_blocks, dtype=np.int32)
    end_off = np.empty(n_blocks, dtype=np.uint32)
    max_freq = np.empty(n_blocks, dtype=np.uint32)
    min_norm = np.empty(n_blocks, dtype=np.uint8)

    chunks: list[bytes] = []
    off = 0
    for b in range(n_blocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, df)
        block = (
            encode_pfor_block(deltas[lo:hi])
            + encode_pfor_block(freqs[lo:hi])
            + encode_pfor_block(norm_bytes[lo:hi])
        )
        off += len(block)
        chunks.append(block)
        last_doc[b] = doc_ids[hi - 1]
        end_off[b] = off
        max_freq[b] = freqs[lo:hi].max()
        min_norm[b] = norm_bytes[lo:hi].min()

    header = np.array([df, n_blocks], dtype=np.uint32).tobytes()
    return b"".join(
        [
            header,
            last_doc.tobytes(),
            end_off.tobytes(),
            max_freq.tobytes(),
            min_norm.tobytes(),
            *chunks,
        ]
    )


class PostingsReader:
    """Zero-copy reader over an encoded postings blob (bytes / memmap slice).

    The skip/impact arrays are numpy views into the blob; block data decodes
    on demand. Works directly over ``np.memmap`` slices of a segment's
    ``postings.bin`` (the MMapDirectory-style query path,
    store/MMapDirectory.java:87).
    """

    __slots__ = (
        "buf",
        "df",
        "n_blocks",
        "last_doc",
        "end_off",
        "max_freq",
        "min_norm",
        "data_start",
    )

    def __init__(self, blob: bytes | np.ndarray) -> None:
        buf = np.frombuffer(blob, dtype=np.uint8) if isinstance(blob, (bytes, bytearray, memoryview)) else blob
        self.buf = buf
        hdr = buf[:_HEADER].view(np.uint32)
        self.df = int(hdr[0])
        nb = self.n_blocks = int(hdr[1])
        p = _HEADER
        self.last_doc = buf[p : p + 4 * nb].view(np.int32)
        p += 4 * nb
        self.end_off = buf[p : p + 4 * nb].view(np.uint32)
        p += 4 * nb
        self.max_freq = buf[p : p + 4 * nb].view(np.uint32)
        p += 4 * nb
        self.min_norm = buf[p : p + nb]
        p += nb
        self.data_start = p

    def _block_bounds(self, b: int) -> tuple[int, int, int]:
        start = self.data_start + (int(self.end_off[b - 1]) if b else 0)
        n = min(BLOCK_SIZE, self.df - b * BLOCK_SIZE)
        prev_last = int(self.last_doc[b - 1]) if b else -1
        return start, n, prev_last

    def decode_block(self, b: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode block ``b`` -> (doc_ids int64, freqs uint32, norms uint8)."""
        start, n, prev_last = self._block_bounds(b)
        deltas, p = decode_pfor_block(self.buf, start, n)
        freqs, p = decode_pfor_block(self.buf, p, n)
        norms, _ = decode_pfor_block(self.buf, p, n)
        docs = deltas.astype(np.int64).cumsum() + prev_last
        return docs, freqs, norms.astype(np.uint8)

    def decode_blocks(
        self, block_idx: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode a selected (sorted) subset of blocks, concatenated."""
        if block_idx.size == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.uint32),
                np.empty(0, dtype=np.uint8),
            )
        docs_parts, freq_parts, norm_parts = [], [], []
        for b in block_idx:
            d, f, nm = self.decode_block(int(b))
            docs_parts.append(d)
            freq_parts.append(f)
            norm_parts.append(nm)
        return (
            np.concatenate(docs_parts),
            np.concatenate(freq_parts),
            np.concatenate(norm_parts),
        )

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.decode_blocks(np.arange(self.n_blocks))
