"""Postings codec conformance — the RandomPostingsTester pattern
(test-framework/.../index/RandomPostingsTester.java:91): random lists at
sizes straddling block boundaries round-trip exactly; skip and impact
entries dominate their blocks."""

import numpy as np
import pytest

from lucene_ray.codec.forutil import (
    BLOCK_SIZE,
    decode_pfor_block,
    encode_pfor_block,
    pack_bits,
    unpack_bits,
)
from lucene_ray.codec.postings import PostingsReader, encode_postings

SIZES = [1, 2, 255, 256, 257, 511, 512, 8191, 8192, 8193, 100_000]


def _random_postings(rng, n, doc_space=None):
    doc_space = doc_space or max(n * 20, 1000)
    docs = np.sort(rng.choice(doc_space, size=n, replace=False)).astype(np.int64)
    # freqs include >2**7 outliers to force PFor exceptions
    freqs = rng.integers(1, 300, size=n).astype(np.uint32)
    freqs[rng.random(n) < 0.02] = rng.integers(1000, 100_000)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    return docs, freqs, norms


def test_pack_unpack_bits():
    rng = np.random.default_rng(1)
    for width in range(0, 33):
        vals = rng.integers(0, 2**width if width else 1, size=256, dtype=np.uint64).astype(np.uint32)
        buf = np.frombuffer(pack_bits(vals, width), dtype=np.uint8)
        out = unpack_bits(buf, 256, width)
        assert (out == vals).all(), width


def test_pfor_block_roundtrip_and_exceptions():
    rng = np.random.default_rng(2)
    for trial in range(50):
        n = int(rng.integers(1, 257))
        vals = rng.integers(0, 100, size=n).astype(np.uint32)
        k = int(rng.integers(0, min(8, n)))
        if k:
            vals[rng.choice(n, k, replace=False)] = rng.integers(2**20, 2**30)
        blob = np.frombuffer(encode_pfor_block(vals), dtype=np.uint8)
        out, end = decode_pfor_block(blob, 0, n)
        assert end == blob.shape[0]
        assert (out == vals).all()
        # exception count bounded (PForUtil.MAX_EXCEPTIONS)
        assert blob[1] <= 7


@pytest.mark.parametrize("n", SIZES)
def test_postings_roundtrip(n):
    rng = np.random.default_rng(n)
    docs, freqs, norms = _random_postings(rng, n)
    blob = encode_postings(docs, freqs, norms)
    r = PostingsReader(blob)
    assert r.df == n
    d, f, nm = r.decode_all()
    assert (d == docs).all()
    assert (f == freqs).all()
    assert (nm == norms).all()


def test_skip_and_impacts_dominate_blocks():
    rng = np.random.default_rng(99)
    docs, freqs, norms = _random_postings(rng, 5000)
    r = PostingsReader(encode_postings(docs, freqs, norms))
    for b in range(r.n_blocks):
        d, f, nm = r.decode_block(b)
        assert int(r.last_doc[b]) == int(d[-1])
        # frontier invariants (codec v3): bucket 0 holds the block's true
        # min norm; the frontier's max freq equals the block max; every
        # posting is dominated by SOME frontier point (freq <= mf, norm >= mn)
        assert int(r.min_norm[b, 0]) == int(nm.min())
        assert int(r.max_freq[b].max()) == int(f.max())
        dominated = (
            (f[:, None] <= r.max_freq[b][None, :])
            & (nm[:, None] >= r.min_norm[b][None, :])
        ).any(axis=1)
        assert dominated.all()
        lo = b * BLOCK_SIZE
        assert (d == docs[lo : lo + d.shape[0]]).all()


def test_impact_frontier_tightens_bound():
    """The multi-point bound is conservative (>= true block max score) and
    never looser than the single-point (block max freq, block min norm)
    bound; on anti-correlated freq/norm data it's strictly tighter."""
    from lucene_ray.search.similarity import BM25Scorer

    n = 1024
    docs = np.arange(n, dtype=np.int64) * 3
    # anti-correlated: high freq only in long docs (high norm byte)
    norms = np.sort(np.random.default_rng(7).integers(30, 120, n)).astype(np.uint8)
    freqs = (1 + (norms.astype(np.uint32) // 10)).astype(np.uint32)
    r = PostingsReader(encode_postings(docs, freqs, norms))
    scorer = BM25Scorer(50, 10_000, 2_000_000)
    ub = scorer.max_score(r.max_freq, r.min_norm)
    assert ub.shape == (r.n_blocks,)
    for b in range(r.n_blocks):
        d, f, nm = r.decode_block(b)
        true_max = float(scorer.score(f, nm).max())
        single = float(scorer.max_score(int(f.max()), int(nm.min())))
        assert true_max <= float(ub[b]) + 1e-7  # conservative
        assert float(ub[b]) <= single + 1e-7  # never looser
    # on this data at least one block must be strictly tighter
    singles = np.array([
        float(scorer.max_score(int(r.max_freq[b].max()), int(r.min_norm[b].min())))
        for b in range(r.n_blocks)
    ])
    assert (np.asarray(ub) < singles - 1e-9).any()


def test_targeted_block_decode():
    rng = np.random.default_rng(5)
    docs, freqs, norms = _random_postings(rng, 3000)
    r = PostingsReader(encode_postings(docs, freqs, norms))
    d, f, nm = r.decode_blocks(np.array([0, 5, r.n_blocks - 1]))
    want = np.concatenate(
        [docs[:256], docs[5 * 256 : 6 * 256], docs[(r.n_blocks - 1) * 256 :]]
    )
    assert (d == want).all()


def test_dense_docids_minimal_width():
    # dense 0..n-1 doc ids -> all deltas 1 -> 1 bit/doc
    n = 4096
    docs = np.arange(n, dtype=np.int64)
    freqs = np.ones(n, dtype=np.uint32)
    norms = np.full(n, 17, dtype=np.uint8)
    blob = encode_postings(docs, freqs, norms)
    # docs ~1 bit, freqs ~0 bits (all 1 -> width 1), norms constant width ~5
    assert len(blob) < n * 2


def test_encode_many_byte_identical_to_per_term():
    """Conformance (RandomPostingsTester pattern): the batched segment-wide
    encoder must emit byte-identical blobs to the per-term reference path,
    across sizes spanning block boundaries (1, 7, 8, 255, 256, 257, 511,
    512, 2000)."""
    from lucene_ray.codec.postings import encode_postings_many

    rng = np.random.default_rng(11)
    sizes = [1, 7, 8, 255, 256, 257, 511, 512, 2000]
    all_docs, all_freqs, all_norms, starts = [], [], [], [0]
    for n in sizes:
        d, f, nm = _random_postings(rng, n)
        all_docs.append(d)
        all_freqs.append(f)
        all_norms.append(nm)
        starts.append(starts[-1] + n)
    p_docs = np.concatenate(all_docs)
    freqs = np.concatenate(all_freqs)
    norms = np.concatenate(all_norms)
    buf, offsets, lengths = encode_postings_many(
        p_docs, freqs, norms, np.asarray(starts, dtype=np.int64)
    )
    assert int(offsets[0]) == 0
    assert int((offsets + lengths)[-1]) == buf.shape[0]
    for t, n in enumerate(sizes):
        want = encode_postings(all_docs[t], all_freqs[t], all_norms[t])
        got = buf[int(offsets[t]) : int(offsets[t] + lengths[t])].tobytes()
        assert got == want, f"term {t} (df={n}) blob mismatch"
