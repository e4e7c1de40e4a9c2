"""Batch-vectorized analysis for ``map_batches`` hot paths.

Turns an Arrow string column into flat (term, doc_index, position[,
start_offset, end_offset]) arrays without per-row Python work where
possible:

* **fast path** — printable-ASCII rows tokenize through a chain of RE2
  kernels that reproduces the UAX#29-approx tokenizer exactly:
  ``utf8_lower`` (LowerCaseFilter), joiner protection (``.``/``'`` between
  word chars, ``,`` between digits — MidNumLet/SingleQuote/MidNum), a
  LENGTH-PRESERVING separator sweep (each separator char becomes one
  space, so character offsets survive), then ``split_pattern`` +
  ``list_flatten``. Stop filtering is a vectorized ``is_in`` over the flat
  token array with position gaps preserved (StopFilter semantics); stem /
  fold filters map over the dictionary-encoded vocabulary. Zero Python
  loops.
* **slow path** — non-ASCII rows (ideographs, combining marks, typographic
  quotes) and rows with >max_token_length chain runs go through the full
  Python analyzer, preserving exact semantics.

Real web text with case and punctuation stays on the Arrow path — only
genuinely non-ASCII rows pay Python (round-1 finding: the old fast path
required ``^[a-z0-9_ ]*$`` and any stop set disabled it entirely).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
from lucene_ray.analysis.urlemail import URLEMAIL_HINT_RE2

# placeholders for protected joiner chars (excluded from the fast-path mask)
_P_DOT, _P_APOS, _P_COMMA, _P_TAPOS = "\x02", "\x03", "\x04", "\x05"

# fast-path rows: printable ASCII + whitespace only (no placeholders, no
# ideographs, no typographic quotes, no combining marks)
_ASCII_RE = r"^[\x20-\x7e\t\n\r]*$"

# RE2 Unicode classes for the vectorized non-ASCII path (round-4: a
# multilingual crawl must never fall to the per-row loop). Python's \w
# over str == letters + numerics + underscore; RE2 spells it \p-style.
_WU = r"\p{L}\p{N}_"
_EXTU = r"\p{Mn}\p{Mc}\p{Cf}"  # UAX#29 Extend + Format (absorbed, WB4)
# Han ranges carved to one token per char (StandardTokenizer IDEOGRAPHIC)
# — must mirror tokenizer._IDEO_RE exactly
_HANU = (r"\x{4E00}-\x{9FFF}\x{3400}-\x{4DBF}"
         r"\x{F900}-\x{FAFF}\x{20000}-\x{2A6DF}")

_EMPTY5 = (
    None,
    np.empty(0, np.int64),
    np.empty(0, np.int32),
    np.empty(0, np.int32),
    np.empty(0, np.int32),
)


def tokenize_column(
    texts: pa.ChunkedArray | pa.Array,
    analyzer: Analyzer = StandardAnalyzer,
    want_offsets: bool = False,
):
    """Tokenize a string column.

    Returns ``(flat_terms, doc_idx, positions)`` — or, with
    ``want_offsets``, ``(flat_terms, doc_idx, positions, starts, ends)``
    where starts/ends are character offsets of each token's surface form
    in its source row (offsets refer to the ORIGINAL text even when
    stem/fold filters rewrite the term — IndexOptions ..._AND_OFFSETS
    semantics). ``flat_terms`` is a pyarrow string array of every token
    occurrence in document order, ``doc_idx`` the row index of each
    occurrence, and ``positions`` the 0-based token position within its
    document (stop-filtered tokens leave gaps, matching StopFilter
    position increments).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        out = (pa.array([], type=pa.string()), *_EMPTY5[1:])
        return out if want_offsets else out[:3]
    if texts.null_count:
        # a null text is an empty document everywhere (the per-row
        # paths' `v or ""` contract); fixed here once so the mixed
        # ASCII/Unicode slow-row stitch never sees None
        texts = pc.fill_null(texts, "")

    if analyzer.mapping_char_filter:
        # MappingCharFilter (charfilter/MappingCharFilter.java:44): one
        # simultaneous longest-match pass. Only rows containing any
        # mapping source pay the per-row sub; the alternation regex and
        # table compile once per batch. Stripped from the analyzer so
        # per-row fallbacks don't re-apply (same contract as
        # char_filters below).
        import dataclasses

        rx, table = analyzer.mapping_regex
        hit = pc.fill_null(pc.match_substring_regex(
            texts, "|".join(__import__("re").escape(s)
                            for s, _ in analyzer.mapping_char_filter)),
            False).to_numpy(zero_copy_only=False)
        if hit.any():
            vals = texts.to_pylist()
            sub = rx.sub
            repl = lambda m: table[m.group(0)]  # noqa: E731
            for i in np.nonzero(hit)[0]:
                vals[i] = sub(repl, vals[i])
            texts = pa.array(vals, type=pa.string())
        analyzer = dataclasses.replace(analyzer, mapping_char_filter=())

    if analyzer.char_filters:
        # PatternReplaceCharFilter chain (pattern/PatternReplaceCharFilter
        # .java:40): whole-column RE2 rewrites before tokenization. The
        # analyzer used by any per-row fallback below must NOT re-apply
        # them (the column is already rewritten — review fix: a
        # non-idempotent pattern used to double-apply on slow-path rows)
        import dataclasses

        for _pat, _rep in analyzer.char_filters:
            texts = pc.replace_substring_regex(texts, _pat, _rep)
        analyzer = dataclasses.replace(analyzer, char_filters=())

    if analyzer.url_email:
        # UAX29URLEmailTokenizer (standard/UAX29URLEmailTokenizer.java:52):
        # only rows that can possibly hold a URL/EMAIL production pay the
        # per-row protected-span scan; the rest of the column tokenizes
        # through the ordinary vectorized chain (identical stream by
        # construction — no scheme/www./atext@ means no protected span).
        import dataclasses

        if texts.null_count:
            texts = pc.fill_null(texts, "")
        hint = pc.fill_null(
            pc.match_substring_regex(texts, URLEMAIL_HINT_RE2), False)
        hint_np = hint.to_numpy(zero_copy_only=False)
        plain = dataclasses.replace(analyzer, url_email=False)
        if not hint_np.any():
            return tokenize_column(texts, plain, want_offsets)
        if hint_np.all():
            parts = _tokenize_all_rows_python(texts, analyzer, want_offsets)
            return parts if want_offsets else parts[:3]
        rows_u = np.nonzero(hint_np)[0]
        rows_p = np.nonzero(~hint_np)[0]
        up = _pad5(_tokenize_all_rows_python(
            texts.take(pa.array(rows_u)), analyzer, want_offsets))
        pp = _pad5(tokenize_column(
            texts.take(pa.array(rows_p)), plain, want_offsets))
        flat = pa.concat_arrays([
            p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
            for p in (up[0], pp[0])])
        doc_idx = np.concatenate([rows_u[up[1]], rows_p[pp[1]]])
        positions = np.concatenate([up[2], pp[2]]).astype(np.int32)
        order = np.argsort(doc_idx, kind="stable")
        flat = flat.take(pa.array(order))
        doc_idx = doc_idx[order]
        positions = positions[order]
        if want_offsets:
            starts = np.concatenate([up[3], pp[3]]).astype(np.int32)[order]
            ends = np.concatenate([up[4], pp[4]]).astype(np.int32)[order]
            return flat, doc_idx, positions, starts, ends
        return flat, doc_idx, positions

    if analyzer.hyphenated_words:
        # token-merging changes positions over the whole stream; go
        # per-row (one shared implementation keeps batch parity)
        parts = _tokenize_all_rows_python(texts, analyzer, want_offsets)
        return parts if want_offsets else parts[:3]

    if analyzer.tokenizer:
        parts = _tokenize_alt(texts, analyzer, want_offsets)
        return parts if want_offsets else parts[:3]

    if analyzer.effective_segment_lang or analyzer.cjk_bigrams:
        # Viterbi morphological segmentation (analysis/japanese.py,
        # korean.py, chinese.py) is inherently per-string — the
        # reference's kuromoji/nori/smartcn are per-document too — and
        # the CJK bigram rewrite renumbers positions over the whole
        # stream. One shared implementation keeps batch/per-row parity
        # by construction.
        parts = _tokenize_all_rows_python(texts, analyzer, want_offsets)
        return parts if want_offsets else parts[:3]

    if analyzer.word_delimiter:
        parts = _tokenize_word_delimiter(texts, analyzer, want_offsets)
        return parts if want_offsets else parts[:3]

    # trivial shortcut: rows of lowercase word chars + spaces tokenize as a
    # plain whitespace split — no lowering, no joiner chain (the common
    # case for pre-cleaned corpora; keeps the clean-text build rate)
    trivial = pc.fill_null(pc.match_substring_regex(texts, r"^[a-z0-9_ ]*$"), False)
    trivial = pc.and_(
        trivial,
        pc.invert(pc.fill_null(pc.match_substring_regex(
            texts, "[a-z0-9_]{%d}" % (analyzer.max_token_length + 1)), False)),
    )
    if bool(pc.all(trivial).as_py()):
        parts = _split_ws(texts, want_offsets)
        parts = _stop_filter(parts, analyzer.stop_words)
        parts = _length_filter(parts, analyzer)
        parts = _post_filters(parts, analyzer)
        return parts if want_offsets else parts[:3]

    lower = analyzer.lowercase
    wc = "a-z0-9_" if lower else "A-Za-z0-9_"
    base = pc.utf8_lower(texts) if lower else texts

    fast = pc.fill_null(pc.match_substring_regex(texts, _ASCII_RE), False)
    # a chain run that long may need the reference's max-length chopping —
    # send the whole row to the exact Python path
    maxlen = analyzer.max_token_length
    long_run = pc.fill_null(
        pc.match_substring_regex(base, "[%s'.,]{%d}" % (wc, maxlen + 1)), False
    )
    fast = pc.and_(fast, pc.invert(long_run))
    mask_np = fast.to_numpy(zero_copy_only=False)

    if mask_np.all():
        parts = _tokenize_ascii(base, wc, want_offsets)
        parts = _stop_filter(parts, analyzer.stop_words)
        parts = _length_filter(parts, analyzer)
        parts = _post_filters(parts, analyzer)
        return parts if want_offsets else parts[:3]

    # Mixed batch: vectorize the fast (ASCII) rows, vectorize eligible
    # non-ASCII rows through the Unicode RE2 chain, Python only the
    # residue (unattached marks, control bytes, over-long runs), then
    # stitch back into doc-major order.
    term_parts: list[pa.Array] = []
    num_parts: list[tuple] = []  # (doc, pos, start, end) per part

    def _filtered(parts):
        k = 5 if want_offsets else 3
        parts = _stop_filter(parts[:k], analyzer.stop_words)
        parts = _length_filter(parts[:k], analyzer)
        return _pad5(_post_filters(parts[:k], analyzer))

    fast_rows = np.nonzero(mask_np)[0]
    if fast_rows.size:
        sub = base.take(pa.array(fast_rows))
        flat, doc_idx, positions, starts, ends = _filtered(
            _pad5(_tokenize_ascii(sub, wc, want_offsets)))
        term_parts.append(flat)
        num_parts.append((fast_rows[doc_idx], positions, starts, ends))

    other_rows = np.nonzero(~mask_np)[0]
    slow_rows = other_rows
    if other_rows.size:
        sub_orig = texts.take(pa.array(other_rows))
        uni_ok = _unicode_eligible(sub_orig, analyzer)
        uni_rows = other_rows[uni_ok]
        slow_rows = other_rows[~uni_ok]
        if uni_rows.size:
            usub = sub_orig.filter(pa.array(uni_ok))
            flat, doc_idx, positions, starts, ends = _filtered(
                _pad5(_tokenize_unicode(usub, analyzer, want_offsets)))
            term_parts.append(flat)
            num_parts.append((uni_rows[doc_idx], positions, starts, ends))

    if slow_rows.size:
        slow_terms: list[str] = []
        sd, sp, ss, se = [], [], [], []
        for row in slow_rows:
            tp = analyzer.tokens_with_offsets(texts[int(row)].as_py())
            slow_terms.extend(t for t, _p, _s, _e in tp)
            sd.append(np.full(len(tp), row, dtype=np.int64))
            sp.append(np.fromiter((p for _t, p, _s, _e in tp), dtype=np.int32, count=len(tp)))
            if want_offsets:
                ss.append(np.fromiter((s for _t, _p, s, _e in tp), dtype=np.int32, count=len(tp)))
                se.append(np.fromiter((e for _t, _p, _s, e in tp), dtype=np.int32, count=len(tp)))
        term_parts.append(pa.array(slow_terms, type=pa.string()))
        num_parts.append((
            np.concatenate(sd) if sd else np.empty(0, np.int64),
            np.concatenate(sp) if sp else np.empty(0, np.int32),
            np.concatenate(ss) if ss else None,
            np.concatenate(se) if se else None,
        ))

    flat = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                             for p in term_parts])
    doc_idx = np.concatenate([p[0] for p in num_parts])
    positions = np.concatenate([p[1] for p in num_parts]).astype(np.int32)
    if want_offsets:
        starts = np.concatenate([p[2] for p in num_parts]).astype(np.int32)
        ends = np.concatenate([p[3] for p in num_parts]).astype(np.int32)
    order = np.argsort(doc_idx, kind="stable")
    if not (np.diff(order) >= 0).all():
        flat = flat.take(pa.array(order))
        doc_idx = doc_idx[order]
        positions = positions[order]
        if want_offsets:
            starts, ends = starts[order], ends[order]
    if want_offsets:
        return flat, doc_idx, positions, starts, ends
    return flat, doc_idx, positions


def _pad5(parts):
    return parts if len(parts) == 5 else (*parts, None, None)


def _tokenize_ascii(texts: pa.Array, wc: str, want_offsets: bool = False):
    """UAX#29-approx tokenization of ASCII rows as pure RE2 kernels.

    Joiners (``.``/``'`` between word chars, ``,`` between digits) are
    protected with placeholder bytes before the separator sweep; two passes
    handle chains (``a.b.c``, ``1,000,000``) because RE2's GlobalReplace
    consumes the shared boundary character of adjacent pairs. All rewrites
    are one-char-for-one-char, so character offsets are preserved."""
    t = texts
    # every rewrite allocates a fresh string array — under full-machine
    # concurrency the chain is memory-bandwidth-bound, so each pass runs
    # only when a cheap scan finds its pattern (most batches have no
    # apostrophes, and joiner CHAINS like a.b.c are rare)
    def _any(pattern: str) -> bool:
        return bool(pc.any(pc.fill_null(
            pc.match_substring_regex(t, pattern), False)).as_py())

    protects = (
        ("([%s])\\.([%s])" % (wc, wc), _P_DOT, "."),
        ("([%s])'([%s])" % (wc, wc), _P_APOS, "'"),
        ("([0-9]),([0-9])", _P_COMMA, ","),
    )
    # NOTE: inputs can never contain the placeholder bytes themselves —
    # rows with control characters fail the printable-ASCII fast mask and
    # take the exact Python path, so gating restores on `used` is safe
    used = []
    for _ in range(2):
        changed = False
        for pat, ph, _orig in protects:
            if _any(pat):
                t = pc.replace_substring_regex(t, pat, "\\1%s\\2" % ph)
                changed = True
                if ph not in used:
                    used.append(ph)
        if not changed:
            break
    # spaces stay in the allowed class (they are already separators), so the
    # sweep touches only real punctuation; runs collapse when offsets are
    # not needed, chars map 1:1 (length-preserving) when they are
    sep = "[^%s%s%s%s ]" % (wc, _P_DOT, _P_APOS, _P_COMMA)
    t = pc.replace_substring_regex(t, sep if want_offsets else sep + "+", " ")
    for _pat, ph, orig in protects:
        if ph in used:
            t = pc.replace_substring(t, ph, orig)
    return _split_ws(t, want_offsets)


def _unicode_eligible(texts: pa.Array, analyzer: Analyzer) -> np.ndarray:
    """Rows the vectorized Unicode path handles exactly. Excluded (to the
    per-row analyzer): rows with C0 control bytes (they collide with the
    joiner placeholders), rows with UNATTACHED Extend/Format chars (a
    mark not preceded by a word chain is a separator, which the
    length-preserving sweep cannot express), and rows with a token-chain
    run longer than max_token_length (the reference's chunking needs the
    exact per-row loop)."""
    def m(pattern: str) -> np.ndarray:
        return pc.fill_null(
            pc.match_substring_regex(texts, pattern), False
        ).to_numpy(zero_copy_only=False)

    # ONE fused scan, three exclusions:
    # 1. C0 controls (collide with placeholders) and U+0130 İ — the one
    #    codepoint where utf8_lower disagrees with Python str.lower
    #    (İ → 'i' vs 'i̇');
    # 2. an Extend/Format char not preceded by a word chain (a separator
    #    the length-preserving sweep cannot express);
    # 3. a non-whitespace run longer than max_token_length — the
    #    conservative byte-class proxy for "needs the reference's token
    #    chunking" (a bounded repetition over the full property classes
    #    would cost ~100x: RE2 expands {n} into n class automata).
    bad = m(
        r"[\x00-\x08\x0b\x0c\x0e-\x1fİ]"
        r"|(?:^|[^%s%s])[%s]"
        r"|[^ \t\n\r]{%d}"
        % (_WU, _EXTU, _EXTU, analyzer.max_token_length + 1)
    )
    bad |= pc.is_null(texts).to_numpy(zero_copy_only=False)
    return ~bad


def _tokenize_unicode(texts: pa.Array, analyzer: Analyzer,
                      want_offsets: bool = False):
    """The ASCII RE2 chain generalized to full Unicode (round-4: on a
    multilingual crawl the ASCII fast path never fires, so every
    non-ASCII row used to pay the per-row Python loop).

    Same protect→sweep→split shape as :func:`_tokenize_ascii`, with RE2
    Unicode property classes standing in for the ASCII ranges, PLUS a
    typographic-apostrophe joiner and an ideograph carve (one token per
    Han char, the StandardTokenizer IDEOGRAPHIC type). Lowercasing is
    column-level ``utf8_lower``, which matches Python ``str.lower()``
    codepoint-for-codepoint everywhere except U+0130 — and İ rows were
    routed to the per-row path by :func:`_unicode_eligible` — and never
    changes string length, so offsets survive. Property-class passes are
    the expensive kernels here (~100-300 MB/s vs GB/s for byte classes),
    so each joiner protect is gated on a cheap LITERAL presence scan and
    the second (chain) round on a full-pattern scan. All rewrites are
    one-codepoint-for-one, so character offsets survive exactly as in
    the ASCII path."""
    t = pc.utf8_lower(texts) if analyzer.lowercase else texts

    def _any(pattern: str) -> bool:
        return bool(pc.any(pc.fill_null(
            pc.match_substring_regex(t, pattern), False)).as_py())

    def _has_lit(lit: str) -> bool:
        return bool(pc.any(pc.fill_null(
            pc.match_substring(t, lit), False)).as_py())

    # ONE property-class pass: every char that is not a word char, an
    # absorbed Extend/Format char, a joiner CANDIDATE or a space becomes
    # a space. After this sweep the alphabet is {word, extend, joiner,
    # space}, so the joiner protects below get away with tiny negated
    # context classes instead of the full property classes (the expensive
    # kernels) — in eligible rows an Extend char can only follow a word
    # chain, so "not space / not joiner / not placeholder" IS the valid
    # joiner context.
    sep = "[^%s%s.,'’ ]" % (_WU, _EXTU)
    t = pc.replace_substring_regex(t, sep if want_offsets else sep + "+", " ")

    ctx = "[^ .,'’\x02-\x05]"
    protects = tuple(
        p for p in (
            (r"(%s)\.(%s)" % (ctx, ctx), _P_DOT, "."),
            (r"(%s)'(%s)" % (ctx, ctx), _P_APOS, "'"),
            (r"(%s)’(%s)" % (ctx, ctx), _P_TAPOS, "’"),
            (r"(\p{Nd}),(\p{Nd})", _P_COMMA, ","),
        )
        if _has_lit(p[2])
    )
    used = []
    for rnd in range(2):
        changed = False
        for pat, ph, _orig in protects:
            # round 1: the literal gate above already paid off — replace
            # directly (the replace IS the scan); round 2 only fires for
            # chains (a.b.c — GlobalReplace consumes the shared context
            # char), which a full-pattern scan detects first
            if rnd == 0 or _any(pat):
                t = pc.replace_substring_regex(t, pat, "\\1%s\\2" % ph)
                changed = True
                if ph not in used:
                    used.append(ph)
        if not changed:
            break
    if protects:
        # joiners that earned no placeholder are separators
        t = pc.replace_substring_regex(
            t, "[.,'’]" if want_offsets else "[.,'’]+", " ")
    for _pat, ph, orig in protects:
        if ph in used:
            t = pc.replace_substring(t, ph, orig)
    if not want_offsets:
        # no offsets to preserve: pad ideographs at COLUMN level and let
        # the single split do the carving (the empty tokens it leaves are
        # filtered and positions re-numbered by _split_ws)
        if _any("[%s]" % _HANU):
            t = pc.replace_substring_regex(t, "([%s])" % _HANU, " \\1 ")
        return _split_ws(t, False)
    parts = _pad5(_split_ws(t, True))
    return _carve_ideographs(parts, True)[:5]


def _carve_ideographs(parts, want_offsets: bool):
    """Expand tokens containing Han chars so each ideograph is its own
    token (tokenizer._split_ideographic, StandardTokenizer IDEOGRAPHIC):
    ONE RE2 space-padding pass over the affected minority, then numpy
    index math re-threads pieces into the doc-major stream with exact
    positions and offsets."""
    flat, doc_idx, positions, starts, ends = parts
    if len(flat) == 0:
        return parts
    has = pc.fill_null(
        pc.match_substring_regex(flat, "[%s]" % _HANU), False)
    has_np = has.to_numpy(zero_copy_only=False)
    if not has_np.any():
        return parts
    sel = np.nonzero(has_np)[0]
    sub = flat.take(pa.array(sel))
    spaced = pc.replace_substring_regex(sub, "([%s])" % _HANU, " \\1 ")
    lists = pc.split_pattern(spaced, " ")
    pieces = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    parent = np.repeat(np.arange(sel.size, dtype=np.int64), counts)
    keep = pc.not_equal(pieces, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    pieces = pc.filter(pieces, keep)
    parent = parent[keep_np]
    if isinstance(pieces, pa.ChunkedArray):
        pieces = pieces.combine_chunks()
    plen = pc.utf8_length(pieces).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # pieces of one parent concatenate back to the parent's text, so the
    # relative start of each piece is the cumsum of its predecessors
    rel_g = np.cumsum(plen) - plen
    n_per = np.bincount(parent, minlength=sel.size)
    first = np.nonzero(np.diff(parent, prepend=-1))[0]
    rel = rel_g - np.repeat(rel_g[first], n_per)
    intra = np.arange(parent.shape[0], dtype=np.int64) - np.repeat(
        np.cumsum(n_per) - n_per, n_per)

    # interleave: non-carved tokens keep their slot, pieces expand theirs
    n_tok = len(flat)
    non = np.nonzero(~has_np)[0]
    tok_src = np.concatenate([non, sel[parent]])
    order_key = np.concatenate([np.zeros(non.size, np.int64), intra])
    order = np.lexsort((order_key, tok_src))
    flat2 = pa.concat_arrays([
        flat.filter(pc.invert(has)).combine_chunks()
        if isinstance(flat, pa.ChunkedArray) else flat.filter(pc.invert(has)),
        pieces,
    ]).take(pa.array(order))
    exp = np.ones(n_tok, dtype=np.int64)
    exp[sel] = n_per
    new_doc = np.repeat(doc_idx, exp)
    new_pos = _dense_positions(new_doc)
    new_starts = new_ends = None
    if want_offsets:
        all_rel = np.concatenate([np.zeros(non.size, np.int64), rel])[order]
        all_len = np.concatenate([
            pc.utf8_length(flat).to_numpy(zero_copy_only=False)[non],
            plen,
        ])[order]
        base_start = np.repeat(starts.astype(np.int64), exp)
        new_starts = (base_start + all_rel).astype(np.int32)
        new_ends = (new_starts + all_len).astype(np.int32)
    return flat2, new_doc, new_pos, new_starts, new_ends


def _post_filters(parts, analyzer: Analyzer):
    """Token filters (fold/stem) then index-side synonym injection,
    then compound subword injection (chain order mirrors the per-row
    analyzer exactly)."""
    if (analyzer.keyword_repeat and analyzer.has_token_filters
            and len(parts[0])):
        parts = _keyword_repeat(parts, analyzer)
    else:
        parts = (_apply_token_filters(parts[0], analyzer), *parts[1:])
    parts = _apply_common_grams(parts, analyzer)
    parts = _apply_captures(parts, analyzer)
    parts = _apply_synonyms(parts, analyzer)
    parts = _apply_compounds(parts, analyzer)
    return _remove_duplicates(parts, analyzer)


def _apply_common_grams(parts, analyzer: Analyzer):
    """CommonGramsFilter (commongrams/CommonGramsFilter.java:63):
    adjacent pairs with a common-word member inject a ``w1_w2`` gram at
    the first word's position (offsets spanning both). Runs over the
    filtered base stream, which is doc-major position-ordered, so
    consecutive positions are consecutive rows — the same adjacency
    shortcut the multi-word synonym matcher uses."""
    if not analyzer.common_grams or len(parts[0]) < 2:
        return parts
    flat = parts[0]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    doc_idx, pos = parts[1], parts[2]
    cs = pa.array(sorted(analyzer.common_set), type=pa.string())
    is_common = pc.is_in(flat, value_set=cs).to_numpy(zero_copy_only=False)
    adj = (doc_idx[1:] == doc_idx[:-1]) & (pos[1:] == pos[:-1] + 1)
    mask = adj & (is_common[:-1] | is_common[1:])
    idxs = np.nonzero(mask)[0]
    if idxs.size == 0:
        return parts
    w1 = flat.take(pa.array(idxs))
    w2 = flat.take(pa.array(idxs + 1))
    grams = pc.binary_join_element_wise(w1, w2, "_")
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    flat2 = pa.concat_arrays([flat, grams])
    others = []
    for i, arr in enumerate(parts[1:], start=1):
        if arr is None:
            others.append(None)
            continue
        src = idxs + 1 if i == 4 else idxs  # end offsets span to w2
        others.append(np.concatenate([arr, arr[src]]))
    order = np.argsort(others[0], kind="stable")
    if not (np.diff(order) >= 0).all():
        flat2 = flat2.take(pa.array(order))
        others = [a[order] if a is not None else None for a in others]
    return (flat2, *others)


def _apply_compounds(parts, analyzer: Analyzer):
    """DictionaryCompoundWordTokenFilter (compound/
    DictionaryCompoundWordTokenFilter.java:40): dictionary subwords of
    each token inject at the SAME position (and the compound's
    offsets)."""
    if not analyzer.compound_dict or len(parts[0]) == 0:
        return parts
    return _apply_injection(parts, analyzer.decompose_token)


def _apply_captures(parts, analyzer: Analyzer):
    """PatternCaptureGroupTokenFilter (pattern/
    PatternCaptureGroupTokenFilter.java:48): capture-group matches
    inject at the SAME position with the source token's offsets."""
    if not analyzer.pattern_capture or len(parts[0]) == 0:
        return parts
    return _apply_injection(parts, analyzer.capture_tokens)


def _apply_injection(parts, per_vocab_fn):
    """Shared same-position injector. Vocabulary-mapped like the
    synonym injector: Python expansion touches only unique terms;
    occurrence expansion is numpy repeat + one stable doc-major sort."""
    flat = parts[0]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary.to_pylist()
    subs = [per_vocab_fn(v) for v in vocab]
    n_sub = np.array([len(s) for s in subs], dtype=np.int64)
    occ = n_sub[codes]
    if occ.sum() == 0:
        return parts
    sel = np.nonzero(occ > 0)[0]
    rep = occ[sel]
    add_terms = pa.array(
        [t for i in sel for t in subs[codes[i]]], type=pa.string())
    first = np.repeat(sel, rep)
    flat2 = pa.concat_arrays([flat, add_terms])
    others = []
    for arr in parts[1:]:
        others.append(None if arr is None
                      else np.concatenate([arr, arr[first]]))
    order = np.argsort(others[0], kind="stable")
    if not (np.diff(order) >= 0).all():
        flat2 = flat2.take(pa.array(order))
        others = [a[order] if a is not None else None for a in others]
    return (flat2, *others)


def _keyword_repeat(parts, analyzer: Analyzer):
    """KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter
    (miscellaneous/KeywordRepeatFilter.java:30,
    RemoveDuplicatesTokenFilter.java:28): index BOTH the original surface
    token and its filtered (fold/stem) form at the SAME position, except
    when they are identical. Vocabulary-mapped like the other filters;
    injected originals append after the doc's in-place-filtered tokens
    (the same expansion order the synonym injector and the per-row
    analyzer use)."""
    flat = parts[0]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    vocab = d.dictionary.to_pylist()
    mapped = [analyzer.transform_token(v) for v in vocab]
    mapped_flat = pa.array(mapped, type=pa.string()).take(d.indices)
    changed = np.array([m != v for m, v in zip(mapped, vocab)], dtype=bool)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.nonzero(changed[codes])[0]
    if sel.size == 0:
        return (mapped_flat, *parts[1:])
    flat2 = pa.concat_arrays([
        mapped_flat.combine_chunks() if isinstance(mapped_flat, pa.ChunkedArray)
        else mapped_flat,
        flat.take(pa.array(sel)),
    ])
    others = []
    for arr in parts[1:]:
        others.append(None if arr is None
                      else np.concatenate([arr, arr[sel]]))
    order = np.argsort(others[0], kind="stable")
    if not (np.diff(order) >= 0).all():
        flat2 = flat2.take(pa.array(order))
        others = [a[order] if a is not None else None for a in others]
    return (flat2, *others)


def _apply_synonyms(parts, analyzer: Analyzer):
    """SynonymGraphFilter (index side): inject mapped terms at the SAME
    position (and source offsets). Vocabulary-mapped: Python only touches
    unique source terms; occurrence expansion is numpy repeat. Multi-word
    sources ("new york" -> nyc) match runs of CONSECUTIVE positions via a
    shifted-mask AND over the flat arrays (the base stream is doc-major
    position-sorted, so consecutive positions are consecutive rows); the
    target anchors at the run's first token (offsets span the whole run).
    Injected rows append after the doc\'s original tokens (doc-major
    stable sort), matching the per-row analyzer\'s expansion order."""
    if not analyzer.synonyms or len(parts[0]) == 0:
        return parts
    flat = parts[0]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    doc_idx = parts[1]
    pos = parts[2]

    # (terms, first_row, last_row) per add batch — last_row feeds the
    # end-offset column, everything else copies from first_row
    adds: list = []

    syn = analyzer.synonym_map
    if syn:
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary.to_pylist()
        extras = [syn.get(v, ()) for v in vocab]
        n_extra = np.array([len(x) for x in extras], dtype=np.int64)
        occ = n_extra[codes]
        if occ.sum():
            sel = np.nonzero(occ > 0)[0]
            rep = occ[sel]
            add_terms = pa.array(
                [t for i in sel for t in extras[codes[i]]], type=pa.string()
            )
            first = np.repeat(sel, rep)
            adds.append((add_terms, first, first))

    for words, dsts in analyzer.multi_synonym_rules:
        L = len(words)
        if n < L:
            continue
        match = pc.equal(flat, words[0]).to_numpy(zero_copy_only=False)[
            : n - L + 1
        ].copy()
        for j in range(1, L):
            mj = pc.equal(flat, words[j]).to_numpy(zero_copy_only=False)
            match &= mj[j : n - L + 1 + j]
            match &= doc_idx[j : n - L + 1 + j] == doc_idx[: n - L + 1]
            match &= pos[j : n - L + 1 + j] == pos[: n - L + 1] + j
        idxs = np.nonzero(match)[0]
        if idxs.size:
            terms = pa.array(
                [t for _i in idxs for t in dsts], type=pa.string()
            )
            first = np.repeat(idxs, len(dsts))
            adds.append((terms, first, first + L - 1))

    if not adds:
        return parts
    add_terms = pa.concat_arrays([a[0] for a in adds])
    all_first = np.concatenate([a[1] for a in adds])
    all_last = np.concatenate([a[2] for a in adds])
    flat2 = pa.concat_arrays([flat, add_terms])
    others = []
    for i, arr in enumerate(parts[1:], start=1):
        if arr is None:
            others.append(None)
            continue
        src = all_last if i == 4 else all_first  # index 4 = end offsets
        others.append(np.concatenate([arr, arr[src]]))
    order = np.argsort(others[0], kind="stable")
    if not (np.diff(order) >= 0).all():
        flat2 = flat2.take(pa.array(order))
        others = [a[order] if a is not None else None for a in others]
    return (flat2, *others)


def _tokenize_alt(texts: pa.Array, analyzer: Analyzer, want_offsets: bool):
    """Alternative raw tokenizers (Analyzer(tokenizer=...)).

    'keyword' vectorizes fully (offsets included: one token spanning the
    row). 'whitespace'/'letter' vectorize through one RE2 split kernel in
    the no-offsets case (variable-width separators make offsets
    non-prefix-summable — the offsets case and any row with an over-long
    run pay the per-row path). 'path_hierarchy'/'pattern' are per-row by
    nature (like the reference's char-at-a-time tokenizers); positions
    and term streams match the per-row analyzer by construction."""
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    kind = analyzer.tokenizer

    if kind == "keyword":
        if analyzer.lowercase and pc.any(pc.fill_null(
                pc.match_substring_regex(texts, "İ"), False)).as_py():
            # utf8_lower vs Python .lower() diverge on U+0130 (İ)
            return _tokenize_all_rows_python(texts, analyzer, want_offsets)
        keep = pc.not_equal(texts, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        rows = np.nonzero(keep_np)[0]
        flat = texts.filter(keep)
        if analyzer.lowercase:
            flat = pc.utf8_lower(flat)
        doc_idx = rows.astype(np.int64)
        positions = np.zeros(rows.shape[0], dtype=np.int32)
        parts = (flat, doc_idx, positions)
        if want_offsets:
            ends = pc.utf8_length(texts.filter(keep)) \
                .to_numpy(zero_copy_only=False).astype(np.int32)
            parts = (*parts, np.zeros_like(ends), ends)
        parts = _stop_filter(parts, analyzer.stop_words)
        parts = _length_filter(parts, analyzer)
        parts = _post_filters(parts, analyzer)
        return _pad5(parts) if want_offsets else parts

    if kind in ("whitespace", "letter") and not want_offsets:
        sep = r"\s+" if kind == "whitespace" else r"[^\p{L}]+"
        maxlen = analyzer.max_token_length
        # rows with an over-long run need the reference's chopping; rows
        # with U+0130 İ diverge between utf8_lower and Python .lower()
        # (İ → 'i' vs 'i̇') — both go per-row, like the main path
        runpat = (r"\S{%d}" % (maxlen + 1) if kind == "whitespace"
                  else r"\p{L}{%d}" % (maxlen + 1))
        slow = pc.any(pc.fill_null(pc.match_substring_regex(
            texts, runpat + ("|İ" if analyzer.lowercase else "")),
            False)).as_py()
        if not slow:
            lists = pc.split_pattern_regex(texts, sep)
            flat = pc.list_flatten(lists)
            lengths = pc.list_value_length(lists) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            doc_idx = np.repeat(
                np.arange(len(texts), dtype=np.int64), lengths)
            keep = pc.not_equal(flat, "")
            keep_np = keep.to_numpy(zero_copy_only=False)
            if not keep_np.all():
                flat = pc.filter(flat, keep)
                doc_idx = doc_idx[keep_np]
            if analyzer.lowercase:
                flat = pc.utf8_lower(flat)
            parts = (flat.combine_chunks()
                     if isinstance(flat, pa.ChunkedArray) else flat,
                     doc_idx, _dense_positions(doc_idx))
            parts = _stop_filter(parts, analyzer.stop_words)
            parts = _length_filter(parts, analyzer)
            return _post_filters(parts, analyzer)

    return _tokenize_all_rows_python(texts, analyzer, want_offsets)


def _tokenize_all_rows_python(texts: pa.Array, analyzer: Analyzer,
                              want_offsets: bool):
    """Every row through the per-row analyzer (the full filter chain
    runs inside tokens_with_offsets) — the path for tokenizers that
    cannot vectorize (ja_segment's Viterbi lattice)."""
    terms: list = []
    sd, sp, ss, se = [], [], [], []
    for row in range(len(texts)):
        v = texts[row].as_py()
        tp = analyzer.tokens_with_offsets(v if v is not None else "")
        terms.extend(t for t, _p, _s, _e in tp)
        sd.append(np.full(len(tp), row, dtype=np.int64))
        sp.append(np.fromiter((p for _t, p, _s, _e in tp),
                              dtype=np.int32, count=len(tp)))
        if want_offsets:
            ss.append(np.fromiter((s for _t, _p, s, _e in tp),
                                  dtype=np.int32, count=len(tp)))
            se.append(np.fromiter((e for _t, _p, _s, e in tp),
                                  dtype=np.int32, count=len(tp)))
    flat = pa.array(terms, type=pa.string())
    doc_idx = np.concatenate(sd) if sd else np.empty(0, np.int64)
    positions = (np.concatenate(sp) if sp else np.empty(0, np.int32))
    if want_offsets:
        starts = np.concatenate(ss) if ss else np.empty(0, np.int32)
        ends = np.concatenate(se) if se else np.empty(0, np.int32)
        return flat, doc_idx, positions.astype(np.int32), \
            starts.astype(np.int32), ends.astype(np.int32)
    return flat, doc_idx, positions.astype(np.int32)


def _apply_token_filters(flat: pa.Array, analyzer: Analyzer) -> pa.Array:
    """Per-token filters (fold/stem) mapped over the dictionary-encoded
    VOCABULARY, not per occurrence: Python cost is O(unique tokens)."""
    if not analyzer.has_token_filters or len(flat) == 0:
        return flat
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    vocab = d.dictionary.to_pylist()
    mapped = pa.array(
        [analyzer.transform_token(t) for t in vocab], type=pa.string()
    )
    return pc.take(mapped, d.indices)


def _stop_filter(parts, stop_words):
    """Vectorized StopFilter: drop stop tokens, keep position gaps (and
    offsets, when present)."""
    flat = parts[0]
    if not stop_words:
        return parts
    sw = pa.array(sorted(stop_words), type=pa.string())
    keep = pc.invert(pc.is_in(flat, value_set=sw))
    keep_np = keep.to_numpy(zero_copy_only=False)
    if keep_np.all():
        return parts
    out = [pc.filter(flat, keep)]
    for arr in parts[1:]:
        out.append(arr[keep_np] if arr is not None else None)
    return tuple(out)


def _remove_duplicates(parts, analyzer: Analyzer):
    """Standalone RemoveDuplicatesTokenFilter (miscellaneous/
    RemoveDuplicatesTokenFilter.java:28): drop repeated (doc, position,
    term) rows keeping the FIRST in stream order. One dictionary-encode
    + one fused-key np.unique — no Python over occurrences."""
    if (not analyzer.remove_duplicates or len(parts[0]) == 0
            or parts[2] is None):
        return parts
    flat = parts[0]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = parts[1].astype(np.int64)
    pos = parts[2].astype(np.int64)
    mp = int(pos.max()) + 1
    md = int(doc_idx.max()) + 1
    fused = (codes * md + doc_idx) * mp + pos
    _u, first = np.unique(fused, return_index=True)
    if first.shape[0] == len(flat):
        return parts
    mask = np.zeros(len(flat), dtype=bool)
    mask[first] = True
    out = [pc.filter(flat, pa.array(mask))]
    for arr in parts[1:]:
        out.append(arr[mask] if arr is not None else None)
    return tuple(out)


def _length_filter(parts, analyzer: Analyzer):
    """Vectorized LengthFilter + KeepWordFilter (miscellaneous/
    LengthFilter.java:31, KeepWordFilter.java:27): drop tokens with char
    length outside [length_min, length_max] or (when keep_words is set)
    outside the keep set, keeping position gaps like StopFilter. Runs
    after stop, before stem/fold."""
    if analyzer.limit_token_count is not None and len(parts[0]):
        # LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter
        # .java:29): positions here are still RAW token indices (stop
        # and length filters keep gaps), so a position mask equals
        # limiting the raw stream
        mask = parts[2] < analyzer.limit_token_count
        if not mask.all():
            parts = tuple(
                pc.filter(parts[0], pa.array(mask)) if i == 0
                else (arr[mask] if arr is not None else None)
                for i, arr in enumerate(parts))
    lo, hi = analyzer.length_min, analyzer.length_max
    if (lo <= 1 and hi is None and analyzer.keep_words is None
            and analyzer.date_recognizer is None):
        return parts
    flat = parts[0]
    ln = pc.utf8_length(flat)
    keep = pc.greater_equal(ln, lo)
    if hi is not None:
        keep = pc.and_(keep, pc.less_equal(ln, hi))
    if analyzer.keep_words is not None:
        keep = pc.and_(keep, pc.is_in(
            flat, value_set=pa.array(sorted(analyzer.keep_words),
                                     type=pa.string())))
    if analyzer.date_recognizer is not None:
        # DateRecognizerFilter: strptime only on unique terms
        from lucene_ray.analysis.analyzers import _is_date

        d = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        ok = np.array([_is_date(v, analyzer.date_recognizer)
                       for v in d.dictionary.to_pylist()], dtype=bool)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.and_(keep, pa.array(ok[codes]))
    keep_np = keep.to_numpy(zero_copy_only=False)
    if keep_np.all():
        return parts
    out = [pc.filter(flat, keep)]
    for arr in parts[1:]:
        out.append(arr[keep_np] if arr is not None else None)
    return tuple(out)


def tokenize_with_payloads(texts: pa.ChunkedArray | pa.Array,
                           analyzer: Analyzer):
    """DelimitedPayloadTokenFilter over a whitespace tokenizer — the
    reference pairing (analysis/common/.../payloads/
    DelimitedPayloadTokenFilter.java:30 + PayloadHelper FloatEncoder,
    typically chained after WhitespaceTokenizer): each token
    ``term<delim>payload`` splits at the LAST delimiter into the term
    and a float payload; tokens without a delimiter carry payload 0.0.
    Lowercase and stop filters apply AFTER the strip (the reference
    chains the payload filter right after the tokenizer); stop
    filtering keeps position gaps. Offsets span the original surface
    token INCLUDING the payload suffix, exactly as the reference's
    filter leaves offsets untouched.

    Tokens separate on single spaces (the corpus convention every
    vectorized path here shares), not the full Unicode-whitespace set of
    the reference's WhitespaceTokenizer — documented deviation. Null
    rows tokenize as empty documents.

    Returns (flat_terms, doc_idx, positions, starts, ends, payloads),
    payloads float32 row-aligned with flat_terms. All-Arrow kernels:
    one extract_regex + one utf8->float cast, no per-token Python."""
    import re as _re

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    flat, doc_idx, positions, starts, ends = _split_ws(texts, True)
    d = _re.escape(analyzer.payload_delimiter)
    ext = pc.extract_regex(flat, f"^(?P<t>.*){d}(?P<p>[^{d}]*)$")
    has = pc.is_valid(ext)
    terms = pc.if_else(has, pc.struct_field(ext, "t"), flat)
    pay = pc.if_else(
        has,
        pc.cast(pc.struct_field(ext, "p"), pa.float32()),
        pa.scalar(0.0, pa.float32()),
    ).to_numpy(zero_copy_only=False).astype(np.float32)
    if analyzer.lowercase:
        terms = pc.utf8_lower(terms)
    if analyzer.stop_words:
        keep = pc.invert(pc.is_in(
            terms, value_set=pa.array(sorted(analyzer.stop_words))))
        keep_np = keep.to_numpy(zero_copy_only=False)
        if not keep_np.all():
            terms = pc.filter(terms, keep)
            doc_idx = doc_idx[keep_np]
            positions = positions[keep_np]  # gaps preserved (StopFilter)
            starts, ends = starts[keep_np], ends[keep_np]
            pay = pay[keep_np]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    return terms, doc_idx, positions, starts, ends, pay


def _tokenize_word_delimiter(texts: pa.Array, analyzer: Analyzer,
                             want_offsets: bool = False):
    """WhitespaceTokenizer + WordDelimiterGraphFilter chain
    (miscellaneous/WordDelimiterGraphFilter.java:88 via
    analysis/worddelim.py): whitespace split, then every DISTINCT raw
    token expands through ONE vectorized RE2 vocab pass; occurrences pick
    up their parts by dictionary code (no per-occurrence Python).
    Positions re-number densely over the parts, offsets point at each
    part's own slice, and the usual lowercase/stop/post filters run on
    the expanded stream."""
    from lucene_ray.analysis.worddelim import expand_vocab

    base = _pad5(_split_ws(texts, want_offsets))
    flat_raw, doc_idx, _pos, starts0, _ends0 = base
    if len(flat_raw) == 0:
        out = (pa.array([], type=pa.string()), *_EMPTY5[1:])
        return out if want_offsets else out[:3]
    enc = flat_raw.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary
    parts_list, rel_s, rel_e = expand_vocab(vocab, want_offsets)
    occ_parts = parts_list.take(enc.indices)
    flat = pc.list_flatten(occ_parts)
    c = pc.list_value_length(occ_parts).to_numpy(
        zero_copy_only=False).astype(np.int64)
    new_doc = np.repeat(doc_idx, c)
    positions = _dense_positions(new_doc)
    starts = ends = None
    if want_offsets:
        voffs = parts_list.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        part_base = voffs[codes]  # first vocab-flat part index per occurrence
        cum = np.cumsum(c) - c
        intra = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(cum, c)
        pidx = np.repeat(part_base, c) + intra
        occ_start = np.repeat(starts0.astype(np.int64), c)
        starts = (occ_start + rel_s[pidx]).astype(np.int32)
        ends = (occ_start + rel_e[pidx]).astype(np.int32)
    if analyzer.lowercase:
        flat = pc.utf8_lower(flat)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parts = (flat, new_doc, positions, starts, ends)
    parts = parts[: (5 if want_offsets else 3)]
    parts = _stop_filter(parts, analyzer.stop_words)
    parts = _length_filter(parts, analyzer)
    return _post_filters(parts, analyzer)


def _split_ws(texts: pa.Array, want_offsets: bool = False):
    """Whitespace-split rows already reduced to space-separated tokens
    (separators all single spaces, so offsets are prefix sums)."""
    lists = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(lists)
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    # int32 doc index: a batch never holds 2^31 rows, and this array is
    # repeated per token — half the width is half the builder's gather
    # and bincount traffic (round-2 scaling item)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int32), lengths)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    positions = (np.arange(doc_idx.shape[0], dtype=np.int64) - offsets[doc_idx]).astype(
        np.int32
    )
    starts = ends = None
    if want_offsets:
        elem_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        gl = elem_len + 1  # token + following space
        cs = np.cumsum(gl) - gl
        row_first = offsets[:-1]  # first element index of each row
        starts = (cs - cs[row_first][doc_idx]).astype(np.int32)
        ends = (starts + elem_len).astype(np.int32)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        flat = pc.filter(flat, keep)
        doc_idx = doc_idx[keep_np]
        # re-number positions densely per doc (empty tokens are not tokens)
        positions = _dense_positions(doc_idx)
        if want_offsets:
            starts, ends = starts[keep_np], ends[keep_np]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if want_offsets:
        return flat, doc_idx, positions, starts, ends
    return flat, doc_idx, positions


# back-compat alias (round-1 name)
_tokenize_simple = _split_ws


def _dense_positions(doc_idx: np.ndarray) -> np.ndarray:
    """0-based running index within each doc for a doc-sorted index array."""
    if doc_idx.size == 0:
        return np.empty(0, np.int32)
    starts = np.nonzero(np.diff(doc_idx, prepend=doc_idx[0] - 1))[0]
    run_starts = np.zeros(doc_idx.shape[0], dtype=np.int64)
    run_starts[starts] = starts
    run_starts = np.maximum.accumulate(run_starts)
    return (np.arange(doc_idx.shape[0]) - run_starts).astype(np.int32)


def tokenize_with_tf(texts: "pa.ChunkedArray | pa.Array",
                     analyzer: Analyzer):
    """DelimitedTermFrequencyTokenFilter over a whitespace tokenizer
    (miscellaneous/DelimitedTermFrequencyTokenFilter.java:37): each
    token ``term<delim>N`` splits at the LAST delimiter into the term
    and an integer term frequency; tokens without a delimiter carry
    tf 1. Lowercase and stop filters apply after the strip. Returns
    (flat_terms, doc_idx, tfs) with tfs int64 row-aligned; all-Arrow
    kernels (one extract_regex + one cast), no per-token Python."""
    import re as _re

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    flat, doc_idx, _pos = _split_ws(texts, False)
    d = _re.escape(analyzer.tf_delimiter)
    ext = pc.extract_regex(flat, f"^(?P<t>.*){d}(?P<p>[0-9]+)$")
    has = pc.is_valid(ext)
    terms = pc.if_else(has, pc.struct_field(ext, "t"), flat)
    tfs = pc.if_else(
        has,
        pc.cast(pc.struct_field(ext, "p"), pa.int64()),
        pa.scalar(1, pa.int64()),
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    if analyzer.lowercase:
        terms = pc.utf8_lower(terms)
    if analyzer.stop_words:
        keep = pc.invert(pc.is_in(
            terms, value_set=pa.array(sorted(analyzer.stop_words)))) \
            .to_numpy(zero_copy_only=False)
        keep &= pc.not_equal(terms, "").to_numpy(zero_copy_only=False)
        terms = terms.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        tfs = tfs[keep]
    else:
        keep = pc.not_equal(terms, "").to_numpy(zero_copy_only=False)
        if not keep.all():
            terms = terms.filter(pa.array(keep))
            doc_idx = doc_idx[keep]
            tfs = tfs[keep]
    return terms, doc_idx, tfs
