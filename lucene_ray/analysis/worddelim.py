"""WordDelimiterGraphFilter — intra-word splitting.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterGraphFilter.java:88-160 (and its factory
defaults WordDelimiterGraphFilterFactory.java:60): split tokens on
non-alphanumeric delimiters, case transitions (lower->upper) and
letter<->digit transitions; drop the English possessive ``'s``. The
factory defaults implemented here: GENERATE_WORD_PARTS +
GENERATE_NUMBER_PARTS + SPLIT_ON_CASE_CHANGE + SPLIT_ON_NUMERICS +
STEM_ENGLISH_POSSESSIVE (catenate/preserve-original off).

Intended pairing: a whitespace tokenizer (the reference's usual
WhitespaceTokenizer + WDGF stack — StandardTokenizer would already eat
the intra-word punctuation). Enabled via ``Analyzer(word_delimiter=True)``;
parts take consecutive positions (the flattened graph the index sees after
FlattenGraphFilter), tokens that dissolve entirely (pure punctuation)
leave NO position gap, and each part's offsets point at its own slice of
the original surface (..._AND_OFFSETS semantics).

Two implementations with identical semantics:
  * :func:`wdgf_parts` / :func:`wdgf_parts_offsets` — per-token Python,
    used by the query parser and the off-ASCII slow path;
  * :func:`expand_vocab` — whole-vocabulary vectorized RE2 chain used by
    the batch tokenizer (one pass over DISTINCT tokens, never per
    occurrence).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_POSSESSIVE = re.compile(r"'[sS]$")
_POSS_MID = re.compile(r"'[sS]([^A-Za-z0-9])")  # 's before a delimiter
_ACRO = re.compile(r"([A-Z]+)([A-Z][a-z])")     # XMLParser -> XML Parser
_CASE = re.compile(r"([a-z])([A-Z])")
_LET_DIG = re.compile(r"([A-Za-z])([0-9])")
_DIG_LET = re.compile(r"([0-9])([A-Za-z])")
_DELIM = re.compile(r"[^A-Za-z0-9]+")


def wdgf_parts(token: str) -> list[str]:
    """Sub-word parts of one raw token, in surface order (case kept —
    LowerCaseFilter runs after WDGF in the chain, as in the reference).
    Possessive ``'s`` drops wherever a sub-word ends (end of token or
    before a delimiter); acronym runs split before a trailing camel word
    (XMLParser -> XML, Parser)."""
    t = _POSS_MID.sub(r"\1", token)
    t = _POSSESSIVE.sub("", t)
    t = _ACRO.sub(r"\1 \2", t)
    t = _CASE.sub(r"\1 \2", t)
    t = _LET_DIG.sub(r"\1 \2", t)
    t = _DIG_LET.sub(r"\1 \2", t)
    return [p for p in _DELIM.split(t) if p]


def wdgf_parts_offsets(token: str) -> list[tuple[str, int, int]]:
    """(part, rel_start, rel_end) character offsets inside ``token``.
    Parts preserve the original characters, so a forward cursor scan
    recovers each part's slice exactly."""
    out = []
    cur = 0
    for p in wdgf_parts(token):
        i = token.find(p, cur)
        if i < 0:  # unreachable by construction; stay lenient
            i = cur
        out.append((p, i, i + len(p)))
        cur = i + len(p)
    return out


def expand_vocab(vocab: pa.Array, want_offsets: bool = False):
    """Vectorized WDGF over a DISTINCT-token array.

    Returns ``(parts_list, rel_starts, rel_ends)`` where ``parts_list`` is
    a ``ListArray`` row-aligned with ``vocab`` (each row = that token's
    parts, empties removed) and the rel arrays (or None) are flat int32
    offsets aligned with ``parts_list.values``.

    The rewrite chain is pure RE2 (`pc.replace_substring_regex`) over the
    vocabulary — O(distinct tokens), never per occurrence. Relative
    offsets, needed only for highlight-grade indexes, fall back to the
    cursor scan on the (usually small) subset of vocab entries whose parts
    differ from the whole token.
    """
    if isinstance(vocab, pa.ChunkedArray):
        vocab = vocab.combine_chunks()
    v = pc.replace_substring_regex(vocab, r"'[sS]([^A-Za-z0-9])", r"\1")
    v = pc.replace_substring_regex(v, r"'[sS]$", "")
    v = pc.replace_substring_regex(v, r"([A-Z]+)([A-Z][a-z])", r"\1 \2")
    v = pc.replace_substring_regex(v, r"([a-z])([A-Z])", r"\1 \2")
    v = pc.replace_substring_regex(v, r"([A-Za-z])([0-9])", r"\1 \2")
    v = pc.replace_substring_regex(v, r"([0-9])([A-Za-z])", r"\1 \2")
    v = pc.replace_substring_regex(v, r"[^A-Za-z0-9]+", " ")
    lists = pc.split_pattern(v, " ")
    flat = pc.list_flatten(lists)
    seg_len = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    seg_len = seg_len.astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # per-vocab part count after dropping empties
    seg_id = np.repeat(np.arange(seg_len.shape[0], dtype=np.int64), seg_len)
    counts = np.bincount(seg_id[keep], minlength=seg_len.shape[0])
    flat_clean = pc.filter(flat, pa.array(keep))
    if isinstance(flat_clean, pa.ChunkedArray):
        flat_clean = flat_clean.combine_chunks()
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    parts_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          flat_clean)
    if not want_offsets:
        return parts_list, None, None
    # relative offsets: identity for unchanged entries, cursor scan for the
    # rest (vocab-level only)
    n_parts = int(offsets[-1])
    rel_s = np.zeros(n_parts, dtype=np.int32)
    rel_e = np.empty(n_parts, dtype=np.int32)
    plen = pc.utf8_length(flat_clean).to_numpy(zero_copy_only=False)
    rel_e[:] = plen
    unchanged = np.zeros(len(vocab), dtype=bool)
    single = np.nonzero(counts == 1)[0]
    if single.size:
        fvals = flat_clean.take(pa.array(offsets[single].astype(np.int64)))
        eqs = pc.equal(fvals, vocab.take(pa.array(single)))
        unchanged[single] = pc.fill_null(eqs, False).to_numpy(
            zero_copy_only=False)
    for vi in np.nonzero(~unchanged)[0]:
        base = int(offsets[vi])
        for j, (_p, s, e) in enumerate(wdgf_parts_offsets(str(vocab[vi]))):
            rel_s[base + j] = s
            rel_e[base + j] = e
    return parts_list, rel_s, rel_e
