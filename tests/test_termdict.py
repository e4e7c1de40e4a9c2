"""Arrow-backed TermDict (segreader.py): behavior parity with the old
numpy-object-array dictionary, and the memory claim."""

import numpy as np
import pyarrow as pa

from lucene_ray.search.segreader import TermDict


def _ref_and_dict(terms):
    terms = sorted(terms)
    return np.asarray(terms, dtype=object), TermDict(pa.array(terms))


def test_searchsorted_parity_random():
    rng = np.random.default_rng(11)
    vocab = sorted({
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(1, 9)))
        for _ in range(500)
    })
    ref, td = _ref_and_dict(vocab)
    probes = list(vocab[::7]) + ["", "a", "zzzz", "\x02", "mzz", vocab[0], vocab[-1]]
    for p in probes:
        for side in ("left", "right"):
            assert td.searchsorted(p, side) == int(np.searchsorted(ref, p, side=side)), (p, side)


def test_getitem_iter_concat():
    ref, td = _ref_and_dict(["apple", "bee", "cat", "dog"])
    assert td[2] == "cat"
    assert td[np.array([0, 3])] == ["apple", "dog"]
    assert td[np.array([True, False, True, False])] == ["apple", "cat"]
    assert list(td) == list(ref)
    both = TermDict.concat([td, TermDict(pa.array(["x", "y"]))])
    assert len(both) == 6 and both[4] == "x"


def test_memory_is_compact():
    """The dictionary's resident footprint is the utf8 bytes + offsets,
    not per-term Python objects: for 100k 8-char terms that's ~1.2 MB of
    Arrow buffers vs ~8+ MB of PyUnicode objects."""
    terms = sorted(f"term{i:06d}" for i in range(100_000))
    td = TermDict(pa.array(terms))
    nbytes = sum(b.size for b in td.arr.buffers() if b is not None)
    assert nbytes < 2_000_000  # ~10 data bytes + 4 offset bytes per term
    # lookups still exact at this size
    assert td.searchsorted("term050000") == 50_000
    assert td[50_000] == "term050000"
