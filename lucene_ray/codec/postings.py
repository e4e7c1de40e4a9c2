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
* per-block impacts — a fixed-width conservative relaxation of
  CompetitiveImpactAccumulator's pareto frontier
  (codecs/CompetitiveImpactAccumulator.java:26,64): each block stores
  ``IMPACT_BUCKETS`` (freq, norm) points, one per norm-range bucket —
  postings are bucketed by norm byte across the block's [min, max] norm
  range and each bucket keeps (its max freq, its min norm). Score is
  monotone in freq and anti-monotone in norm, so every posting is
  dominated by its bucket's point and ``max_j score(freq_j, norm_j)``
  upper-bounds the block — always at least as tight as the single
  (block max freq, block min norm) point (codec v2), and strictly
  tighter whenever the high-freq postings sit in long docs. Empty
  buckets store (0, 255): score(0, ·) = 0, never competitive.
  Bucket 0 always holds the block's true min norm (decode relies on it
  as the norm-offset base).

Blob layout (little-endian, codec v3):
  [df u32][n_blocks u32]
  [last_doc i32  * n_blocks]   -- last docID of each block
  [end_off u32   * n_blocks]   -- end byte offset of each block, rel. to data start
  [max_freq u32  * n_blocks * IMPACT_BUCKETS]   -- (n_blocks, B) row-major
  [min_norm u8   * n_blocks * IMPACT_BUCKETS]   -- (n_blocks, B) row-major
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

# bump on any on-disk layout change (index caches key on this)
CODEC_VERSION = 3

# per-block impact frontier points (norm-range buckets); fixed so the skip
# arrays stay fixed-width numpy views. Note on exactness vs the
# reference's CompetitiveImpactAccumulator (variable-length pareto
# pairs): any sound per-bucket upper bound must dominate EVERY posting
# in the bucket, so (bucket max freq, bucket min norm) is the tightest
# single dominating point — the relaxation lives only in the bucket
# granularity (B points per block vs up to 256 exact pairs), and score
# bounds only ever loosen, never tighten, so pruning stays safe.
IMPACT_BUCKETS = 4


def _impact_buckets(norms: np.ndarray, blk_min: np.ndarray, blk_max: np.ndarray,
                    val_block: np.ndarray) -> np.ndarray:
    """Bucket index (0..IMPACT_BUCKETS-1) of each posting: its norm byte's
    position within ITS block's [min, max] norm range. Bucket 0 always
    contains the block-min-norm posting."""
    rng = (blk_max.astype(np.int64) - blk_min.astype(np.int64))[val_block] + 1
    rel = norms.astype(np.int64) - blk_min.astype(np.int64)[val_block]
    return (rel * IMPACT_BUCKETS) // rng


def _impact_frontier(
    freqs: np.ndarray, norms: np.ndarray, val_block: np.ndarray,
    block_start: np.ndarray, total_blocks: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(max_freq (nb,B) u32, min_norm (nb,B) u8) — vectorized across all
    blocks: one mask + one ``reduceat`` pair per bucket (B passes total;
    ``val_block`` is sorted so per-bucket groups stay contiguous)."""
    B = IMPACT_BUCKETS
    blk_min = np.minimum.reduceat(norms, block_start)
    blk_max = np.maximum.reduceat(norms, block_start)
    bucket = _impact_buckets(norms, blk_min, blk_max, val_block)
    mf = np.zeros((total_blocks, B), dtype=np.uint32)
    mn = np.full((total_blocks, B), 255, dtype=np.uint8)
    for j in range(B):
        m = bucket == j
        if not m.any():
            continue
        vb = val_block[m]
        starts = np.flatnonzero(np.r_[True, np.diff(vb) != 0])
        blk = vb[starts]
        mf[blk, j] = np.maximum.reduceat(freqs[m].astype(np.uint32), starts)
        mn[blk, j] = np.minimum.reduceat(norms[m], starts)
    return mf, mn


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
    block_start = np.arange(n_blocks) * BLOCK_SIZE
    block_n = np.minimum(block_start + BLOCK_SIZE, df) - block_start
    val_block = np.repeat(np.arange(n_blocks), block_n)
    max_freq, min_norm = _impact_frontier(
        freqs, norm_bytes, val_block, block_start, n_blocks
    )

    chunks: list[bytes] = []
    off = 0
    for b in range(n_blocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, df)
        nm_min = min_norm[b, 0]  # bucket 0 = block's true min norm
        # freqs stored as freq-1 (freq >= 1 always: an all-ones block packs
        # to 0 bits); norms as offsets from the block's min_norm impact
        block = (
            encode_pfor_block(deltas[lo:hi])
            + encode_pfor_block(freqs[lo:hi] - 1)
            + encode_pfor_block((norm_bytes[lo:hi] - nm_min).astype(np.uint32))
        )
        off += len(block)
        chunks.append(block)
        last_doc[b] = doc_ids[hi - 1]
        end_off[b] = off

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


def encode_postings_many(
    p_docs: np.ndarray,
    freqs: np.ndarray,
    norms: np.ndarray,
    term_starts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode every term's postings in one vectorized pass.

    ``p_docs``/``freqs``/``norms`` are the partition's postings sorted by
    (term, doc); ``term_starts`` (int64, len n_terms+1) slices them per term.
    Returns ``(buffer, offsets, lengths)`` where ``buffer`` is the uint8
    concatenation of per-term blobs, byte-identical to calling
    :func:`encode_postings` per term — but with no per-term or per-block
    Python-loop work in the hot path (the SIMD-batch spirit of
    codecs/lucene104/ForUtil.java:34 applied across the whole segment).
    """
    from lucene_ray.codec.forutil import MAX_EXCEPTIONS, bit_widths

    term_starts = np.asarray(term_starts, dtype=np.int64)
    n_terms = term_starts.shape[0] - 1
    P = int(term_starts[-1])
    if n_terms == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64), np.empty(0, np.int64)
    p_docs = np.asarray(p_docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.uint32)
    norms = np.asarray(norms, dtype=np.uint8)

    df = np.diff(term_starts)
    assert (df > 0).all()
    nb = (df + BLOCK_SIZE - 1) // BLOCK_SIZE  # blocks per term
    total_blocks = int(nb.sum())
    term_first_block = np.cumsum(nb) - nb
    term_of_block = np.repeat(np.arange(n_terms), nb)
    blk_in_term = np.arange(total_blocks) - term_first_block[term_of_block]
    block_start = term_starts[:-1][term_of_block] + blk_in_term * BLOCK_SIZE
    block_end = np.minimum(block_start + BLOCK_SIZE, term_starts[1:][term_of_block])
    block_n = block_end - block_start

    # doc-id deltas (prev = -1 at each term's list start)
    deltas = np.empty(P, dtype=np.uint32)
    if P > 1:
        np.subtract(p_docs[1:], p_docs[:-1], out=deltas[1:], casting="unsafe")
    deltas[term_starts[:-1]] = p_docs[term_starts[:-1]] + 1

    # ---- per-stream processing (deltas, freqs, norms share block bounds;
    # sub-block s of block b sits at interleaved sub index 3b+s) ----
    # Working per stream keeps every pass at P elements instead of building
    # a 3P interleaved value array — this function is memory-bandwidth-bound
    # under full-machine concurrency, so passes and dtypes are minimized.
    block_first = np.cumsum(block_n) - block_n
    val_block = np.repeat(np.arange(total_blocks), block_n)
    pos_in_block = np.arange(P) - block_first[val_block]

    # freq-1 / norm-minus-block-min transforms (see encode_postings)
    blk_min_norm = np.minimum.reduceat(norms, block_start)
    streams = (
        deltas,
        (freqs - 1).astype(np.uint32),
        (norms - blk_min_norm[val_block]).astype(np.uint32),
    )
    bases = []  # per stream: base width per block
    widths = []
    for S in streams:
        w = bit_widths(S).astype(np.uint8)
        # (block, width) histogram via one bincount on a fused key —
        # np.add.at 2-D scatter is ~10x slower
        counts = np.bincount(
            val_block * 34 + w, minlength=total_blocks * 34
        ).reshape(total_blocks, 34)
        exceed = block_n[:, None] - counts.cumsum(axis=1)
        b_ = (exceed <= MAX_EXCEPTIONS).argmax(axis=1).astype(np.int64)
        wmax = np.maximum.reduceat(w, block_first).astype(np.int64)
        b_ = np.where((block_n <= MAX_EXCEPTIONS) | (b_ >= wmax), wmax, b_)
        bases.append(b_)
        widths.append(w)

    n_subs = 3 * total_blocks
    sub_n = np.repeat(block_n, 3)
    base = np.stack(bases, axis=1).ravel()  # per sub, interleaved d,f,n
    payload_bytes = (sub_n * base + 7) // 8
    payload_start = np.cumsum(payload_bytes) - payload_bytes
    total_payload = int(payload_bytes.sum())

    # ---- payload packing + exceptions, one stream at a time ----
    # Bit-position pass j touches only the width-desc prefix that still has
    # bit j (radix-sorted on the uint8 width key): total memory traffic is
    # O(total payload bits), not O(n_values * max_width).
    flat = np.zeros(total_payload * 8, dtype=np.uint8)
    # int32 bit offsets when the payload permits (halves index traffic in
    # the bandwidth-bound scatter below)
    idx_dtype = np.int32 if total_payload * 8 < 2**31 else np.int64
    n_exc_streams = []
    exc_data = []  # (stream, exc_block, exc_rank, exc_pos, exc_high)
    for s, S in enumerate(streams):
        b_ = bases[s]
        base_v = b_[val_block]
        vbs = (payload_start[3 * val_block + s] * 8 + pos_in_block * base_v).astype(
            idx_dtype
        )
        order = np.argsort((33 - base_v).astype(np.uint8), kind="stable")
        Vs = S[order]
        ss_ = vbs[order]
        n_above = P - np.cumsum(np.bincount(base_v, minlength=34))
        for j in range(int(b_.max()) if total_blocks else 0):
            k = int(n_above[j])
            if k == 0:
                break
            flat[ss_[:k] + j] = (Vs[:k] >> np.uint32(j)) & 1
        exc_mask = widths[s] > base_v
        exc_block = val_block[exc_mask]
        n_exc_s = np.bincount(exc_block, minlength=total_blocks).astype(np.int64)
        exc_rank = np.arange(exc_block.shape[0]) - (np.cumsum(n_exc_s) - n_exc_s)[exc_block]
        exc_high = (S[exc_mask] >> base_v[exc_mask].astype(np.uint32)).astype(np.uint32)
        n_exc_streams.append(n_exc_s)
        exc_data.append((exc_block, exc_rank, pos_in_block[exc_mask], exc_high))
    packed = np.packbits(flat, bitorder="little") if total_payload else np.empty(0, np.uint8)

    n_exc = np.stack(n_exc_streams, axis=1).ravel()  # per sub

    # ---- sub-block assembly into one data region ----
    sub_len = 2 + payload_bytes + 5 * n_exc
    sub_dst = np.cumsum(sub_len) - sub_len
    total_data = int(sub_len.sum())
    data = np.zeros(total_data, dtype=np.uint8)
    data[sub_dst] = base.astype(np.uint8)
    data[sub_dst + 1] = n_exc.astype(np.uint8)
    if total_payload:
        shift = np.repeat(sub_dst + 2 - payload_start, payload_bytes)
        data[shift + np.arange(total_payload)] = packed
    for s in range(3):
        exc_block, exc_rank, exc_pos, exc_high = exc_data[s]
        if exc_block.shape[0] == 0:
            continue
        sd = sub_dst[3 * exc_block + s]
        pb = payload_bytes[3 * exc_block + s]
        ne = n_exc[3 * exc_block + s]
        data[sd + 2 + pb + exc_rank] = exc_pos.astype(np.uint8)
        hi_dst = sd + 2 + pb + ne + 4 * exc_rank
        for k in range(4):
            data[hi_dst + k] = ((exc_high >> np.uint32(8 * k)) & 0xFF).astype(np.uint8)

    # ---- per-block skip/impact arrays ----
    block_len = sub_len.reshape(total_blocks, 3).sum(axis=1)
    cs = np.cumsum(block_len)
    prefix = (cs - block_len)[term_first_block]
    end_off_rel = (cs - prefix[term_of_block]).astype(np.uint32)
    last_doc = p_docs[block_end - 1].astype(np.int32)
    max_freq, min_norm = _impact_frontier(
        freqs, norms, val_block, block_start, total_blocks
    )

    # ---- final per-term blobs: header + skips + data slice ----
    # (fully scatter-assembled: the data region is already term-contiguous)
    B = IMPACT_BUCKETS
    header_len = _HEADER + (8 + 5 * B) * nb
    data_len = np.add.reduceat(block_len, term_first_block)
    blob_len = header_len + data_len
    offsets = np.cumsum(blob_len) - blob_len
    out = np.empty(int(blob_len.sum()), dtype=np.uint8)

    hdr_bytes = np.stack(
        [df.astype(np.uint32), nb.astype(np.uint32)], axis=1
    ).view(np.uint8).reshape(n_terms, 8)
    out[offsets[:, None] + np.arange(8)] = hdr_bytes

    o_term = offsets[term_of_block]
    nb_term = nb[term_of_block]
    b4 = np.arange(4)
    out[(o_term + 8 + 4 * blk_in_term)[:, None] + b4] = (
        last_doc.view(np.uint8).reshape(total_blocks, 4)
    )
    out[(o_term + 8 + 4 * nb_term + 4 * blk_in_term)[:, None] + b4] = (
        end_off_rel.view(np.uint8).reshape(total_blocks, 4)
    )
    out[(o_term + 8 + 8 * nb_term + 4 * B * blk_in_term)[:, None] + np.arange(4 * B)] = (
        max_freq.view(np.uint8).reshape(total_blocks, 4 * B)
    )
    out[
        (o_term + 8 + (8 + 4 * B) * nb_term + B * blk_in_term)[:, None]
        + np.arange(B)
    ] = min_norm

    total_data_bytes = int(data_len.sum())
    if total_data_bytes:
        term_data_dst = offsets + header_len
        term_data_src = (cs - block_len)[term_first_block]
        shift = np.repeat(term_data_dst - term_data_src, data_len)
        out[shift + np.arange(total_data_bytes)] = data
    return out, offsets, blob_len


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
        B = IMPACT_BUCKETS
        p = _HEADER
        self.last_doc = buf[p : p + 4 * nb].view(np.int32)
        p += 4 * nb
        self.end_off = buf[p : p + 4 * nb].view(np.uint32)
        p += 4 * nb
        # (n_blocks, B) impact frontier — scorer.max_score reduces axis -1
        self.max_freq = buf[p : p + 4 * B * nb].view(np.uint32).reshape(nb, B)
        p += 4 * B * nb
        self.min_norm = buf[p : p + B * nb].reshape(nb, B)
        p += B * nb
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
        return docs, freqs + 1, (norms + np.uint32(self.min_norm[b, 0])).astype(np.uint8)

    def decode_blocks(
        self, block_idx: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode a selected (sorted) subset of blocks, concatenated.

        Fully vectorized: all selected blocks' payload bytes are gathered
        into one contiguous buffer, bit-unpacked in a single pass per bit
        position (<= 32 iterations total per stream), and doc deltas are
        prefix-summed per block with one reduceat — no per-block Python.
        """
        if block_idx.size == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.uint32),
                np.empty(0, dtype=np.uint8),
            )
        block_idx = np.asarray(block_idx, dtype=np.int64)
        # copy the selected blocks' byte ranges out of the (possibly mmap'd)
        # blob once — everything after operates on a plain ndarray
        starts = np.where(
            block_idx > 0, self.end_off[block_idx - 1].astype(np.int64), 0
        ) + self.data_start
        ends = self.end_off[block_idx].astype(np.int64) + self.data_start
        lens = ends - starts
        total = int(lens.sum())
        gidx = np.repeat(starts - (np.cumsum(lens) - lens), lens) + np.arange(total)
        buf = np.asarray(self.buf[gidx])
        local_start = np.cumsum(lens) - lens  # block start within buf

        n_vals = np.minimum(
            BLOCK_SIZE, self.df - block_idx * BLOCK_SIZE
        ).astype(np.int64)
        deltas, freqs, norms = _decode_streams(buf, local_start, n_vals)

        val_block = np.repeat(np.arange(block_idx.shape[0]), n_vals)
        prev_last = np.where(
            block_idx > 0, self.last_doc[block_idx - 1].astype(np.int64), -1
        )
        docs = _docs_from_deltas(deltas, n_vals, prev_last, val_block)
        norms = norms + np.asarray(self.min_norm[block_idx, 0], dtype=np.uint32)[val_block]
        return docs, freqs + 1, norms.astype(np.uint8)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.decode_blocks(np.arange(self.n_blocks))


def _decode_streams(
    buf: np.ndarray, local_start: np.ndarray, n_vals: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the three packed streams (deltas, freqs-1, norm offsets) of a
    run of blocks laid out contiguously in ``buf`` (one entry of
    ``local_start``/``n_vals`` per block). Fully vectorized: one pass per
    bit position over the width-desc prefix, one exception scatter."""
    nb = local_start.shape[0]
    P = int(n_vals.sum())
    val_block = np.repeat(np.arange(nb), n_vals)
    pos_in_block = np.arange(P) - (np.cumsum(n_vals) - n_vals)[val_block]

    streams = []
    s = local_start
    for _ in range(3):
        base = buf[s].astype(np.int64)
        nexc = buf[s + 1].astype(np.int64)
        payload_nbytes = (n_vals * base + 7) // 8
        vals = np.zeros(P, dtype=np.uint32)
        base_v = base[val_block]
        if nb and int(base.max()):
            pbytes = int(payload_nbytes.sum())
            pidx = (
                np.repeat(
                    (s + 2) - (np.cumsum(payload_nbytes) - payload_nbytes),
                    payload_nbytes,
                )
                + np.arange(pbytes)
            )
            bits = np.unpackbits(buf[pidx], bitorder="little")
            pl_bit_start = (np.cumsum(payload_nbytes) - payload_nbytes)[
                val_block
            ] * 8 + pos_in_block * base_v
            # width-desc prefix trick (see encode): pass j touches only
            # values that still have bit j (radix sort on uint8 key)
            worder = np.argsort((33 - base_v).astype(np.uint8), kind="stable")
            starts_s = pl_bit_start[worder]
            whist = np.bincount(base_v, minlength=34)
            n_above = P - np.cumsum(whist)
            vals_s = np.zeros(P, dtype=np.uint32)
            for j in range(int(base.max())):
                k = int(n_above[j])
                if k == 0:
                    break
                vals_s[:k] |= bits[starts_s[:k] + j].astype(np.uint32) << np.uint32(j)
            vals[worder] = vals_s
        tot_exc = int(nexc.sum())
        if tot_exc:
            exc_block = np.repeat(np.arange(nb), nexc)
            exc_rank = np.arange(tot_exc) - (np.cumsum(nexc) - nexc)[exc_block]
            pos_base = s + 2 + payload_nbytes
            epos = buf[pos_base[exc_block] + exc_rank].astype(np.int64)
            hb = pos_base[exc_block] + nexc[exc_block] + 4 * exc_rank
            high = (
                buf[hb].astype(np.uint32)
                | (buf[hb + 1].astype(np.uint32) << 8)
                | (buf[hb + 2].astype(np.uint32) << 16)
                | (buf[hb + 3].astype(np.uint32) << 24)
            )
            tgt = (np.cumsum(n_vals) - n_vals)[exc_block] + epos
            vals[tgt] |= high << base[exc_block].astype(np.uint32)
        streams.append(vals)
        s = s + 2 + payload_nbytes + 5 * nexc
    return tuple(streams)


def _docs_from_deltas(
    deltas: np.ndarray, n_vals: np.ndarray, prev_last: np.ndarray,
    val_block: np.ndarray,
) -> np.ndarray:
    """Per-block prefix-sum of doc deltas with one global cumsum: subtract
    the running sum accumulated before each block, add its prev_last."""
    docs = deltas.astype(np.int64).cumsum()
    block_first = np.cumsum(n_vals) - n_vals
    correction = (prev_last - (docs[block_first] - deltas[block_first]))[val_block]
    return docs + correction


def decode_many(
    buf: np.ndarray, offsets: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY concatenated term blobs in one vectorized pass.

    ``buf`` is a uint8 array containing every blob; ``offsets``/``lengths``
    (int64, one per term) locate them. Returns
    ``(docs int64, freqs uint32, norms uint8, term_starts int64[n+1])``
    where postings are concatenated in term order — the bulk-merge
    primitive (SegmentMerger.java:122-174's bulk path): segment merges
    decode whole segments through this instead of a per-term Python loop.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = offsets.shape[0]
    if n == 0:
        return (
            np.empty(0, np.int64), np.empty(0, np.uint32),
            np.empty(0, np.uint8), np.zeros(1, np.int64),
        )
    buf = np.asarray(buf)

    hdr = buf[offsets[:, None] + np.arange(8)].reshape(-1).view(np.uint32)
    df = hdr[0::2].astype(np.int64)
    nbt = hdr[1::2].astype(np.int64)
    total_blocks = int(nbt.sum())
    first_block = np.cumsum(nbt) - nbt
    tob = np.repeat(np.arange(n), nbt)  # term of block
    bit = np.arange(total_blocks) - first_block[tob]  # block index in term

    skip_base = offsets + _HEADER
    b4 = np.arange(4)
    last_doc = buf[(skip_base[tob] + 4 * bit)[:, None] + b4].reshape(-1).view(np.int32)
    end_off = (
        buf[(skip_base[tob] + 4 * nbt[tob] + 4 * bit)[:, None] + b4]
        .reshape(-1).view(np.uint32).astype(np.int64)
    )
    B = IMPACT_BUCKETS
    # bucket 0's min norm is the block's true min (the norm-offset base)
    min_norm_blk = buf[skip_base[tob] + (8 + 4 * B) * nbt[tob] + B * bit]
    data_start = skip_base + (8 + 5 * B) * nbt

    # lengths cross-check: each blob's data must end exactly at
    # offset + length (catches a corrupt/misaligned (offset, length) table
    # before it silently mis-decodes)
    last_block = np.cumsum(nbt) - 1
    blob_end = data_start + end_off[last_block]
    if not np.array_equal(blob_end, offsets + lengths):
        raise ValueError("blob (offset, length) table disagrees with skip data")

    # block byte ranges (end_off is relative to the term's data start)
    prev_rel = np.concatenate(([0], end_off[:-1]))
    start_rel = np.where(bit > 0, prev_rel, 0)
    abs_start = data_start[tob] + start_rel
    lens_b = data_start[tob] + end_off - abs_start
    total = int(lens_b.sum())
    gidx = np.repeat(abs_start - (np.cumsum(lens_b) - lens_b), lens_b) + np.arange(total)
    data = np.ascontiguousarray(buf[gidx])
    local_start = np.cumsum(lens_b) - lens_b

    n_vals = np.minimum(BLOCK_SIZE, df[tob] - bit * BLOCK_SIZE)
    deltas, freqs, norms = _decode_streams(data, local_start, n_vals)

    val_block = np.repeat(np.arange(total_blocks), n_vals)
    prev_last_blk = np.concatenate(([-1], last_doc[:-1].astype(np.int64)))
    prev_last = np.where(bit > 0, prev_last_blk, -1)
    docs = _docs_from_deltas(deltas, n_vals, prev_last, val_block)
    norms = (norms + min_norm_blk.astype(np.uint32)[val_block]).astype(np.uint8)
    term_starts = np.concatenate(([0], np.cumsum(df)))
    return docs, freqs + 1, norms, term_starts
