"""Text-analysis pipelines: token counts, quality scoring, language ID,
document fingerprints — the training-data-pipeline operators layered on the
same analysis chain as the index build (SURVEY.md 'beyond the reference').

All are stateless vectorized ``map_batches`` stages except language ID,
which holds its profile tables in an actor pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.batch import tokenize_column
from lucene_ray.analysis.tokenizer import ENGLISH_STOP_WORDS
from lucene_ray.pipelines.dedup import _mix64, hash_strings


def token_stats(pages, text_col: str = "text"):
    """Per-doc token_count / distinct_terms / avg_token_len (whitespace+
    UAX#29 chain, same tokens the index sees)."""

    def stats(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, doc_idx, _pos = tokenize_column(texts)
        n = b.num_rows
        tc = np.zeros(n, dtype=np.int64)
        np.add.at(tc, doc_idx, 1)
        tl = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sl = np.zeros(n, dtype=np.int64)
        np.add.at(sl, doc_idx, tl)
        # distinct terms per doc
        th = hash_strings(flat)
        key = doc_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ th
        # count uniques per doc: sort (doc, hash) pairs
        order = np.lexsort((th, doc_idx))
        dsorted, hsorted = doc_idx[order], th[order]
        newgrp = np.ones(order.shape[0], dtype=bool)
        newgrp[1:] = (dsorted[1:] != dsorted[:-1]) | (hsorted[1:] != hsorted[:-1])
        dt = np.zeros(n, dtype=np.int64)
        np.add.at(dt, dsorted[newgrp], 1)
        avg = np.divide(sl, tc, out=np.zeros(n, dtype=np.float64), where=tc > 0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "token_count": tc,
                "distinct_terms": dt,
                "avg_token_len": avg,
            }
        )

    return pages.map_batches(stats, batch_format="pyarrow")


def shingle_counts(pages, n: int = 2, text_col: str = "text"):
    """Distinct word-n-gram count per doc (ShingleFilter analytics,
    analysis/common/shingle/ShingleFilter.java:43) — counts distinct
    shingles via 64-bit shingle hashes (collision odds negligible)."""
    from lucene_ray.pipelines.dedup import _shingle_hashes

    def count(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, sh = _shingle_hashes(texts, n)
        nrows = b.num_rows
        out = np.zeros(nrows, dtype=np.int64)
        if sh.shape[0]:
            key = np.stack([doc_idx, sh.astype(np.int64)], axis=1)
            uniq = np.unique(key, axis=0)
            np.add.at(out, uniq[:, 0], 1)
        return pa.table({"doc_id": b["doc_id"], "n_shingles": out})

    return pages.map_batches(count, batch_format="pyarrow")


def quality_scores(pages, text_col: str = "text"):
    """Heuristic quality features per doc: n_chars, token_count, stopword
    ratio (English 33-word set), type-token ratio, mean word length —
    the usual web-text quality filters, SQL-expressible for the oracle."""

    def score(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, doc_idx, _pos = tokenize_column(texts)
        n = b.num_rows
        tc = np.zeros(n, dtype=np.int64)
        np.add.at(tc, doc_idx, 1)
        import pyarrow.compute as _pc

        is_stop = _pc.is_in(
            flat, value_set=pa.array(sorted(ENGLISH_STOP_WORDS))
        ).to_numpy(zero_copy_only=False)
        sw = np.zeros(n, dtype=np.int64)
        np.add.at(sw, doc_idx, is_stop.astype(np.int64))
        nchars = _pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = np.divide(sw, tc, out=np.zeros(n, dtype=np.float64), where=tc > 0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": nchars,
                "token_count": tc,
                "stopword_count": sw,
                "stopword_ratio": ratio,
            }
        )

    return pages.map_batches(score, batch_format="pyarrow")


class LangId:
    """Character-n-gram language identifier (actor pool: profiles built once).

    Profiles are deterministic trigram frequency tables for a few languages,
    built from tiny built-in seed text (no external data). Returns the
    argmax-overlap language; 'und' when nothing matches.
    """

    SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and this is a test of "
              "the system that should work with english text and words",
        "de": "der schnelle braune fuchs springt über den faulen hund und dies ist "
              "ein test des systems das mit deutschem text funktionieren sollte",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci "
              "est un test du système qui devrait fonctionner avec le texte",
        "es": "el zorro marrón rápido salta sobre el perro perezoso y esta es una "
              "prueba del sistema que debería funcionar con texto en español",
    }

    def __init__(self) -> None:
        self.profiles = {}
        for lang, seed in self.SEEDS.items():
            grams = {}
            s = f"  {seed}  "
            for i in range(len(s) - 2):
                g = s[i : i + 3]
                grams[g] = grams.get(g, 0) + 1
            self.profiles[lang] = set(
                g for g, _ in sorted(grams.items(), key=lambda kv: -kv[1])[:200]
            )
        # vectorized ASCII path state (built once per actor): each pure-ASCII
        # profile trigram packs into a 24-bit code (b0<<16|b1<<8|b2); a
        # byte-trigram of an ASCII row equals its char-trigram, so overlap
        # counting becomes isin + bincount. Non-ASCII profile grams can
        # never occur in an ASCII row and drop from the tables.
        self.langs = list(self.SEEDS)  # tie-break priority = seed order
        self.ascii_codes = []
        for lang in self.langs:
            codes = [
                (ord(g[0]) << 16) | (ord(g[1]) << 8) | ord(g[2])
                for g in self.profiles[lang]
                if all(ord(c) < 128 for c in g)
            ]
            self.ascii_codes.append(np.array(sorted(codes), dtype=np.int64))

    # writing-system fast path (the CLD-style script prior): a row whose
    # letters are dominantly one non-Latin script routes by script alone —
    # Han+kana -> ja, Han -> zh, Hangul -> ko, Thai -> th, Greek -> el,
    # Arabic -> ar, Devanagari -> hi, Cyrillic -> ru — feeding the full
    # analyzer_for_lang registry (CJK lattices, Thai dictionary break,
    # light stemmers). Latin text (incl. accented de/fr/es) never enters
    # this path, so trigram behavior (and its SQL twin) is unchanged.
    _SCRIPTS = (
        ("han", ((0x4E00, 0x9FFF), (0x3400, 0x4DBF))),
        ("kana", ((0x3040, 0x30FF),)),
        ("hangul", ((0xAC00, 0xD7AF), (0x1100, 0x11FF))),
        ("thai", ((0x0E00, 0x0E7F),)),
        ("greek", ((0x0370, 0x03FF), (0x1F00, 0x1FFF))),
        ("arabic", ((0x0600, 0x06FF), (0x0750, 0x077F))),
        ("devanagari", ((0x0900, 0x097F),)),
        ("cyrillic", ((0x0400, 0x04FF),)),
    )
    _SCRIPT_LANG = {"han": "zh", "kana": "ja", "hangul": "ko",
                    "thai": "th", "greek": "el", "arabic": "ar",
                    "devanagari": "hi", "cyrillic": "ru"}

    def _script_route(self, text: str) -> "str | None":
        counts = dict.fromkeys(self._SCRIPT_LANG, 0)
        latin = 0
        for ch in text[:400]:
            o = ord(ch)
            if o < 0x80:
                if ch.isalpha():
                    latin += 1
                continue
            if o < 0x370 and ch.isalpha():   # Latin-1/Ext accents stay Latin
                latin += 1
                continue
            for name, ranges in self._SCRIPTS:
                if any(lo <= o <= hi for lo, hi in ranges):
                    counts[name] += 1
                    break
        top = max(counts, key=counts.get)
        if counts[top] == 0 or counts[top] <= latin:
            return None
        if counts["kana"] > 0 and (counts["kana"] + counts["han"]
                                   >= counts[top]):
            return "ja"          # Japanese mixes kanji + kana
        return self._SCRIPT_LANG[top]

    def classify(self, text: str) -> str:
        routed = self._script_route(text)
        if routed:
            return routed
        s = f"  {text[:400].lower()}  "
        grams = {s[i : i + 3] for i in range(len(s) - 2)}
        best, score = "und", 0
        for lang, prof in self.profiles.items():
            ov = len(grams & prof)
            if ov > score:
                best, score = lang, ov
        return best

    def _classify_ascii_batch(self, texts: pa.Array) -> np.ndarray:
        """Vectorized classify for pure-ASCII rows -> lang index (-1=und)."""
        import pyarrow.compute as pc

        padded = pc.binary_join_element_wise(
            "  ", pc.utf8_lower(pc.utf8_slice_codeunits(texts, 0, 400)), "  ", ""
        ).cast(pa.large_binary())
        buf = np.frombuffer(padded.buffers()[2], dtype=np.uint8) \
            if padded.buffers()[2] else np.empty(0, np.uint8)
        offs = np.frombuffer(padded.buffers()[1], dtype=np.int64)[
            padded.offset : padded.offset + len(padded) + 1
        ]
        n = len(padded)
        if buf.shape[0] < 3:
            return np.full(n, -1, dtype=np.int64)
        codes = (
            (buf[:-2].astype(np.int64) << 16)
            | (buf[1:-1].astype(np.int64) << 8)
            | buf[2:].astype(np.int64)
        )
        lens = offs[1:] - offs[:-1]
        cnt = np.maximum(lens - 2, 0)
        row_of = np.repeat(np.arange(n), cnt)
        starts = offs[:-1]
        cum = np.cumsum(cnt) - cnt
        win_idx = np.repeat(starts - cum, cnt) + np.arange(int(cnt.sum()))
        win_codes = codes[win_idx]
        # distinct (row, gram) pairs
        fused = row_of * (1 << 24) + win_codes
        ufused = np.unique(fused)
        urow = ufused >> 24
        ucode = ufused & ((1 << 24) - 1)
        best = np.full(n, -1, dtype=np.int64)
        best_ov = np.zeros(n, dtype=np.int64)
        for li, lcodes in enumerate(self.ascii_codes):
            hit = np.isin(ucode, lcodes, assume_unique=False)
            ov = np.bincount(urow[hit], minlength=n)
            better = ov > best_ov  # strict >: first lang in seed order wins ties
            best[better] = li
            best_ov[better] = ov[better]
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ascii_mask = pc.fill_null(
            pc.match_substring_regex(texts, r"^[\x00-\x7f]*$"), False
        ).to_numpy(zero_copy_only=False)
        langs = np.empty(batch.num_rows, dtype=object)
        a_rows = np.nonzero(ascii_mask)[0]
        if a_rows.size:
            li = self._classify_ascii_batch(texts.take(pa.array(a_rows)))
            langs[a_rows] = np.array(["und"] + self.langs, dtype=object)[li + 1]
        for row in np.nonzero(~ascii_mask)[0]:
            langs[row] = self.classify(texts[int(row)].as_py())
        return batch.append_column(
            "lang_pred", pa.array(langs.tolist(), type=pa.string())
        )


def lang_id(pages, concurrency: int = 4):
    return pages.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


def doc_fingerprints(pages, text_col: str = "text"):
    """64-bit rolling-hash document fingerprint (order-sensitive, unlike the
    content hash): h = mix(h * P + token_hash)."""

    def fp(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, doc_idx, pos = tokenize_column(texts)
        th = hash_strings(flat)
        n = b.num_rows
        out = np.zeros(n, dtype=np.uint64)
        # order-dependent combine, vectorized over positions:
        # h_doc = XOR_t mix(token_hash_t * (pos_t + 1))
        mixed = _mix64(th * (pos.astype(np.uint64) + np.uint64(1)))
        np.bitwise_xor.at(out, doc_idx, mixed)
        return pa.table(
            {"doc_id": b["doc_id"], "fingerprint": out.astype(np.int64)}
        )

    return pages.map_batches(fp, batch_format="pyarrow")


def bpe_ish_token_count(pages, text_col: str = "text"):
    """Sub-word-ish token counting with a GPT-2-style pre-tokenizer regex
    (contractions / letter runs / digit runs / punctuation runs) — the
    'token budget' estimator for LLM training pipelines.

    Vectorized: the count runs as ONE ``pc.count_substring_regex`` (RE2)
    kernel per batch. The Python-regex lookahead variant
    (``\\s+(?!\\S)|\\s+``) and the RE2-safe ``\\s+`` tail count
    identically except on whitespace runs of length ≥2 that contain a
    non-space whitespace char (the optional leading ``" ?"`` of the other
    alternatives absorbs a trailing plain space in both engines, but not
    a tab/newline); only rows matching that rare shape take the per-row
    Python path."""
    import re

    pat = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
    )
    re2_pat = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
    # any 2-whitespace window containing a non-space whitespace char
    suspect_pat = r"\s[^\S ]|[^\S ]\s"

    def count(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        counts = (
            pc.count_substring_regex(texts, re2_pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        suspect = pc.match_substring_regex(texts, suspect_pat).to_numpy(
            zero_copy_only=False
        )
        for i in np.nonzero(suspect)[0]:
            counts[i] = len(pat.findall(texts[i].as_py()))
        return pa.table({"doc_id": b["doc_id"], "bpe_tokens": counts})

    return pages.map_batches(count, batch_format="pyarrow")


def chunk_documents(pages, chunk_tokens: int = 512, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split documents into fixed-token-window chunks (optionally
    overlapping) — the pretraining-data shaping step between curation
    and tokenization: rows (doc_id, chunk_idx, n_tokens, text), chunk i
    covering tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk is the first one
    reaching the document end.

    Empty-text contract: documents with no tokens (empty or
    whitespace-only text) emit NO chunk rows — empty tokens are dropped
    before windowing, so there is no 0-token or ''-token chunk.

    Fully vectorized: tokens flatten once, each token expands to the
    chunks containing it (one repeat — at most ceil(chunk/stride)
    copies), and the per-(doc, chunk) strings rebuild through ONE Arrow
    ListArray + binary_join. No per-chunk Python."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunk(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
        flat = pc.list_flatten(lists)
        raw_n = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_row = np.repeat(np.arange(b.num_rows, dtype=np.int64), raw_n)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            doc_row = doc_row[keep]
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_tok = np.bincount(doc_row, minlength=b.num_rows).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(n_tok)))
        pos = np.arange(doc_row.shape[0], dtype=np.int64) - offs[doc_row]
        # chunks per doc: first chunk + one per stride past the window
        n_chunks = np.where(
            n_tok > 0,
            -(-np.maximum(n_tok - chunk_tokens, 0) // stride) + 1, 0)
        # token at pos p lives in chunks lo..hi
        lo = np.maximum(0, -(-(pos - chunk_tokens + 1) // stride))
        hi = np.minimum(pos // stride, n_chunks[doc_row] - 1)
        k = hi - lo + 1
        rep_tok = flat.take(pa.array(np.repeat(
            np.arange(doc_row.shape[0], dtype=np.int64), k)))
        rep_doc = np.repeat(doc_row, k)
        cum = np.cumsum(k) - k
        intra = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(cum, k)
        rep_chunk = np.repeat(lo, k) + intra
        # (doc, chunk, pos) order — pos order is preserved within each
        # (doc, chunk) by a stable sort on (doc, chunk)
        key = rep_doc * np.int64(1 << 32) + rep_chunk
        order = np.argsort(key, kind="stable")
        rep_tok = rep_tok.take(pa.array(order))
        key = key[order]
        starts = np.nonzero(np.diff(key, prepend=key[0] - 1))[0] \
            if key.shape[0] else np.empty(0, np.int64)
        bounds = np.concatenate((starts, [key.shape[0]])).astype(np.int32)
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()),
            rep_tok.combine_chunks() if isinstance(rep_tok, pa.ChunkedArray)
            else rep_tok)
        joined = pc.binary_join(chunk_lists, " ")
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[(key[starts] >> 32).astype(np.int64)]
                             if starts.shape[0] else
                             np.empty(0, dtype=ids.dtype)),
            "chunk_idx": pa.array(
                (key[starts] & ((1 << 32) - 1)).astype(np.int64)
                if starts.shape[0] else np.empty(0, np.int64)),
            "n_tokens": pa.array(np.diff(bounds).astype(np.int64)),
            "text": joined,
        })

    return pages.map_batches(chunk, batch_format="pyarrow")


def top_terms_per_doc(pages, k: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", min_df: int = 1):
    """Per-document TF-IDF keyword extraction — the doc-labeling /
    summarization helper every curation stack carries: for each doc the
    top-``k`` terms by tf·ln(N/df), ties (score, then term asc)
    deterministic. Returns rows (doc_id, rank, term, score).

    Scale shape: document frequencies reduce from per-batch DISTINCT
    (doc, term) partials (the shuffle moves vocab-sized rows, never the
    corpus) with an optional ``min_df`` prune bounding the broadcast
    df map; scoring is one vectorized pass per batch with a lexsort
    top-k — no per-doc Python."""
    import ray
    from ray.data.aggregate import Sum

    def df_partial(b: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens_col(b[text_col])
        if len(flat) == 0:
            # still emit the ('', 0, num_rows) sentinel — a batch whose
            # rows are all token-less must count toward N or idf inflates
            return pa.table({"term": pa.array([""], pa.string()),
                             "df": pa.array([0], pa.int64()),
                             "nd": pa.array([b.num_rows], pa.int64())})
        key = pa.table({"d": pa.array(doc_idx), "t": flat})
        dd = key.group_by(["d", "t"]).aggregate([])
        vc = pc.value_counts(dd["t"].combine_chunks()
                             if isinstance(dd["t"], pa.ChunkedArray)
                             else dd["t"])
        return pa.table({
            "term": pa.concat_arrays([vc.field("values"),
                                      pa.array([""], pa.string())]),
            "df": pa.concat_arrays([vc.field("counts").cast(pa.int64()),
                                    pa.array([0], pa.int64())]),
            "nd": pa.concat_arrays([
                pa.array([0] * len(vc), pa.int64()),
                pa.array([b.num_rows], pa.int64())]),
        })

    agg = (pages.map_batches(df_partial, batch_format="pyarrow")
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"), Sum("nd", alias_name="nd")))
    rows = pa.concat_tables(agg.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 16))
    terms = rows["term"].to_pylist()
    dfs = rows["df"].to_numpy()
    n_docs = int(rows["nd"].to_numpy().sum())
    dfmap = {t: int(d) for t, d, in zip(terms, dfs)
             if t and d >= min_df}
    sorted_terms = sorted(dfmap)
    import numpy as _np

    df_arr = _np.array([dfmap[t] for t in sorted_terms], dtype=_np.float64)
    vocab_arr = pa.array(sorted_terms, pa.string())
    ref = ray.put((vocab_arr, df_arr, float(n_docs)))

    def score(b: pa.Table) -> pa.Table:
        vocab, df_a, n = ray.get(ref)
        flat, doc_idx = _flat_tokens_col(b[text_col])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        code = pc.fill_null(pc.index_in(flat, value_set=vocab), -1)
        code_np = code.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = code_np >= 0
        code_np, doc_idx2 = code_np[keep], doc_idx[keep]
        # tf per (doc, term-code) via one unique over a fused key
        fused = doc_idx2.astype(np.int64) * np.int64(len(df_a)) + code_np
        uk, tf = np.unique(fused, return_counts=True)
        ud = (uk // len(df_a)).astype(np.int64)
        uc = (uk % len(df_a)).astype(np.int64)
        # round BEFORE ranking so the (score desc, term asc) tie-break
        # matches the SQL twin's ROUND(score, 4) ordering exactly (house
        # oracle-compare convention)
        scores = np.round(tf * np.log(n / df_a[uc]), 4)
        term_sort = np.asarray(
            [vocab[int(i)].as_py() for i in uc], dtype=object)
        order = np.lexsort((term_sort, -scores, ud))
        ud, uc, scores = ud[order], uc[order], scores[order]
        starts = np.nonzero(np.diff(ud, prepend=ud[0] - 1))[0] \
            if ud.shape[0] else np.empty(0, np.int64)
        run_start = np.zeros(ud.shape[0], dtype=np.int64)
        run_start[starts] = starts
        run_start = np.maximum.accumulate(run_start)
        rank = np.arange(ud.shape[0], dtype=np.int64) - run_start
        sel = rank < k
        return pa.table({
            id_col: pa.array(ids[ud[sel]].astype(np.int64)),
            "rank": pa.array(rank[sel] + 1),
            "term": vocab.take(pa.array(uc[sel])),
            "score": pa.array(scores[sel]),
        })

    return pages.map_batches(score, batch_format="pyarrow")


def _flat_tokens_col(texts):
    """(flat tokens, doc index) of a whitespace-split column, empties
    dropped."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
    flat = pc.list_flatten(lists)
    n_per = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_per)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        flat = pc.filter(flat, keep)
        doc_idx = doc_idx[keep_np]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, doc_idx
