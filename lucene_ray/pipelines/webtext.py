"""Web-text curation operators for LLM training-data pipelines: PII
redaction, repetition-based quality filters (the Gopher rules), per-domain
quota sampling, and Naive Bayes document classification.

These extend the reference's text-analysis surface (SURVEY.md 'beyond the
reference'): the classifier mirrors
``lucene/classification/src/java/org/apache/lucene/classification/SimpleNaiveBayesClassifier.java:46``
(multinomial NB with Laplace add-one smoothing over analyzed tokens); the
repetition filters follow the published Gopher data-quality rules (Rae et
al. 2021, arXiv:2112.11446 §A1.1); PII patterns are the usual RE2-safe
email/phone/IPv4 regexes (identical semantics in pyarrow and DuckDB, both
RE2-backed, which is what makes the oracle exact).

All stages are stateless vectorized ``map_batches`` over Arrow batches; the
NB model is trained with one tiny (|labels| x |vocab|)-row shuffle and
broadcast via ``ray.put`` — never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.batch import tokenize_column
from lucene_ray.pipelines.dedup import _shingle_hashes, hash_strings

# RE2-compatible (no lookaround/backrefs): pyarrow's and DuckDB's regex
# engines are both RE2, so engine and oracle redact identically.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact(pages, text_col: str = "text",
               patterns: tuple = PII_PATTERNS):
    """Redact PII spans from a text column; per-doc match counts plus the
    redacted text. Order matters (email before ipv4 so the host part of an
    address is consumed by <EMAIL> first); counts are taken on the text as
    it stands when that pattern runs, exactly like sequential
    ``regexp_replace`` calls in the oracle."""

    def redact(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        cols = {"doc_id": b["doc_id"]}
        cur = texts
        for name, pat, repl in patterns:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(cur, pat), pa.int64()
            )
            cur = pc.replace_substring_regex(cur, pat, repl)
        cols["redacted"] = cur
        return pa.table(cols)

    return pages.map_batches(redact, batch_format="pyarrow")


# query parameters that never affect content identity (tracking junk)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="
_URL_PARTS_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>.*)$"
)


def canonicalize_urls(pages, url_col: str = "url",
                      out_col: str = "canon_url"):
    """URL canonicalization for crawl dedup keys (the normalization a
    Common-Crawl-grade exact-dedup stage runs before hashing; the rule
    set is the conservative shared subset of the published URL-normal-
    ization forms, RFC 3986 §6.2.2-6.2.3 syntax-based normalization):

      1. drop the fragment (`#...`),
      2. lowercase scheme and host (ONLY those — path/query case is
         significant),
      3. strip default ports (:80 for http, :443 for https),
      4. drop tracking query params (utm_*, fbclid, gclid, ref),
         preserving the order of the survivors,
      5. drop an emptied query entirely.

    Vectorized: one `pc.extract_regex` split + a flatten/filter/rebuild
    over query params — no per-row Python. Rows that do not parse as
    `scheme://host...` pass through unchanged (lenient, like the
    fragment-only steps still applying). Appends ``out_col``.
    """

    def canon(batch: pa.Table) -> pa.Table:
        u = batch[url_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        u = pc.replace_substring_regex(u, r"#.*$", "")
        ex = pc.extract_regex(u, _URL_PARTS_RE)
        ok = pc.is_valid(ex)
        scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
        host = pc.utf8_lower(pc.struct_field(ex, "host"))
        host = pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, r":80$", ""),
            host)
        host = pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(host, r":443$", ""),
            host)
        rest = pc.struct_field(ex, "rest")
        rp = pc.extract_regex(rest, r"^(?P<path>[^?]*)(?P<q>.*)$")
        path = pc.struct_field(rp, "path")
        q = pc.struct_field(rp, "q")  # "" or "?k=v&..."
        qbody = pc.fill_null(pc.replace_substring_regex(q, r"^\?", ""), "")
        parts = pc.split_pattern(qbody, "&")
        flat = pc.list_flatten(parts)
        keep = pc.and_(
            pc.invert(pc.match_substring_regex(flat, TRACKING_PARAM_RE)),
            pc.not_equal(flat, ""),
        )
        keep_np = keep.to_numpy(zero_copy_only=False)
        seg_len = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        seg_id = np.repeat(np.arange(seg_len.shape[0]), seg_len)
        counts = np.bincount(seg_id[keep_np], minlength=seg_len.shape[0])
        kept = pc.filter(flat, keep)
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        new_q = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), kept),
            "&")
        new_q = pc.if_else(pc.equal(new_q, ""), new_q,
                           pc.binary_join_element_wise("?", new_q, ""))
        rebuilt = pc.binary_join_element_wise(
            scheme, "://", host, path, new_q, "")
        out = pc.if_else(ok, rebuilt, u)
        return batch.append_column(out_col, out)

    return pages.map_batches(canon, batch_format="pyarrow")


def gopher_repetition(pages, text_col: str = "text",
                      top_unigram_max: float = 0.20,
                      dup_bigram_max: float = 0.90):
    """Per-doc repetition features + keep/drop flag (Gopher rules §A1.1:
    'fraction of characters in the most common n-gram' / 'fraction of
    characters in duplicated n-grams' — token-count variants here since
    the corpus is single-byte-per-char synthetic text):

    * ``top_unigram_frac`` — occurrences of the doc's most frequent token
      / token count (ties don't matter: the max count is unique).
    * ``dup_bigram_frac`` — bigram occurrences whose bigram appears >= 2
      times in the doc / total bigram occurrences.
    * ``keep`` — both fractions under their thresholds.

    Vectorized: one tokenize, hashed unigram/bigram keys, per-doc grouped
    counts via lexsort + run scan (no Python loop over rows)."""

    def feats(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = b.num_rows
        flat, doc_idx, _pos = tokenize_column(texts)
        tc = np.zeros(n, dtype=np.int64)
        np.add.at(tc, doc_idx, 1)

        def _per_doc_dup_and_top(didx: np.ndarray, keys: np.ndarray):
            """(per-doc max key count, per-doc count of occurrences whose
            key occurs >=2x) via one lexsort over (doc, key)."""
            mx = np.zeros(n, dtype=np.int64)
            dup = np.zeros(n, dtype=np.int64)
            if didx.shape[0] == 0:
                return mx, dup
            order = np.lexsort((keys, didx))
            d_s, k_s = didx[order], keys[order]
            new = np.ones(d_s.shape[0], dtype=bool)
            new[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
            starts = np.nonzero(new)[0]
            cnt = np.diff(np.append(starts, d_s.shape[0]))
            gd = d_s[starts]
            np.maximum.at(mx, gd, cnt)
            np.add.at(dup, gd, np.where(cnt >= 2, cnt, 0))
            return mx, dup

        uh = hash_strings(flat)
        top1, _ = _per_doc_dup_and_top(doc_idx, uh)
        bdoc, bh = _shingle_hashes(texts, 2)
        bc = np.zeros(n, dtype=np.int64)
        np.add.at(bc, bdoc, 1)
        _, dup2 = _per_doc_dup_and_top(bdoc, bh)

        top_frac = np.divide(top1, tc, out=np.zeros(n, np.float64),
                             where=tc > 0)
        dup_frac = np.divide(dup2, bc, out=np.zeros(n, np.float64),
                             where=bc > 0)
        # a zero-token doc is degenerate: never keep it (a quality filter
        # that passes empty documents is worse than useless)
        keep = ((top_frac <= top_unigram_max)
                & (dup_frac <= dup_bigram_max) & (tc > 0))
        return pa.table({
            "doc_id": b["doc_id"],
            "token_count": tc,
            "top_unigram_frac": top_frac,
            "dup_bigram_frac": dup_frac,
            "keep": keep,
        })

    return pages.map_batches(feats, batch_format="pyarrow")


def quota_sample(pages, key_col: str, k: int, order_col: str,
                 descending: bool = True):
    """Per-domain quota sampling: keep the top ``k`` docs per ``key_col``
    ordered by ``order_col`` (tie-break doc_id asc) — the standard
    per-domain cap of web-crawl curation. One global sort, zero per-group
    UDFs (reuses the grouped-top-k run-scan shape)."""
    from lucene_ray.pipelines.facets import grouped_top_k

    return grouped_top_k(pages, key_col, order_col, k, descending=descending)


def nb_train(pages, label_col: str, text_col: str = "text",
             max_vocab: "int | None" = 1_000_000) -> dict:
    """Train a multinomial Naive Bayes model
    (classification/SimpleNaiveBayesClassifier.java:46 — word-frequency
    counts per class, add-one smoothing): per-(label, term) token counts
    via block-local partial counting fused into ONE small
    ``groupby().sum`` shuffle (only distinct (label, term) pairs move),
    then the model materializes. ``max_vocab`` BOUNDS the driver-side
    model on an open web-scale vocabulary: when the distinct-term count
    exceeds it, only the globally most frequent ``max_vocab`` terms are
    kept (one extra tiny term-total shuffle) — the same
    bounded-by-default contract as lm.train_bigram_lm's ``max_ngrams``.
    Pass ``None`` to disable the cap."""

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, doc_idx, _pos = tokenize_column(texts)
        labels = b[label_col].to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"label": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        tok_label = labels[doc_idx]
        key = pc.binary_join_element_wise(
            pa.array(tok_label, pa.string()), flat, "\x01")
        uniq, counts = np.unique(
            key.to_numpy(zero_copy_only=False), return_counts=True)
        lab, term = zip(*(u.split("\x01", 1) for u in uniq))
        return pa.table({"label": pa.array(lab, pa.string()),
                         "term": pa.array(term, pa.string()),
                         "cnt": pa.array(counts, pa.int64())})

    agg = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "term"]).sum("cnt"))
    if max_vocab is not None:
        col = "sum(cnt)"
        totals = (agg.groupby("term").sum(col)
                  .sort(f"sum({col})", descending=True)
                  .limit(max_vocab).select_columns(["term"]).take_all())
        if len(totals) >= max_vocab:  # cap actually binding
            import ray

            keep_ref = ray.put(frozenset(r["term"] for r in totals))

            def prune(b: pa.Table) -> pa.Table:
                keep = ray.get(keep_ref)
                mask = pa.array([t in keep for t in
                                 b["term"].to_pylist()])
                return b.filter(mask)

            agg = agg.map_batches(prune, batch_format="pyarrow")
    counts = agg.to_pandas()
    cnt_col = "sum(cnt)" if "sum(cnt)" in counts.columns else "cnt"

    doc_counts = (
        pages.groupby(label_col).count().to_pandas()
        .set_index(label_col)["count()"].to_dict()
    )
    n_docs = int(sum(doc_counts.values()))
    labels = sorted(doc_counts)
    vocab = np.array(sorted(counts["term"].unique()), dtype=object)
    v = vocab.shape[0]
    li = {l: i for i, l in enumerate(labels)}
    ti = {t: i for i, t in enumerate(vocab)}
    mat = np.zeros((v, len(labels)), dtype=np.float64)
    for lab, term, c in zip(counts["label"], counts["term"], counts[cnt_col]):
        mat[ti[term], li[lab]] = float(c)
    totals = mat.sum(axis=0)
    # log P(t|label) with add-one smoothing; OOV row = unseen term
    loglik = np.log((mat + 1.0) / (totals + v))
    log_oov = np.log(1.0 / (totals + v))
    log_prior = np.log(
        np.array([doc_counts[l] for l in labels], np.float64) / n_docs)
    return {"labels": labels, "vocab": vocab, "loglik": loglik,
            "log_oov": log_oov, "log_prior": log_prior}


def nb_classify(pages, model_ref, text_col: str = "text"):
    """Classify each doc with a broadcast NB model (``ray.put`` the dict
    from :func:`nb_train`, read once per task): per-batch token->vocab-row
    lookup via searchsorted on the sorted vocab, one ``np.add.at`` into an
    (n x |labels|) score matrix, argmax with label-asc tie-break (the
    reference's assignClass max scan keeps the first max,
    SimpleNaiveBayesClassifier.java:119-131)."""
    import ray

    resolved: list = []  # worker-local cache: one ray.get per task, not per batch

    def classify(b: pa.Table) -> pa.Table:
        if not resolved:
            resolved.append(ray.get(model_ref) if isinstance(
                model_ref, ray.ObjectRef) else model_ref)
        m = resolved[0]
        vocab, loglik, log_oov = m["vocab"], m["loglik"], m["log_oov"]
        labels, log_prior = m["labels"], m["log_prior"]
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = b.num_rows
        flat, doc_idx, _pos = tokenize_column(texts)
        scores = np.tile(log_prior, (n, 1))
        if len(flat):
            toks = flat.to_numpy(zero_copy_only=False)
            idx = np.searchsorted(vocab, toks)
            idx_c = np.minimum(idx, vocab.shape[0] - 1)
            known = vocab[idx_c] == toks
            contrib = np.where(known[:, None], loglik[idx_c],
                               log_oov[None, :])
            np.add.at(scores, doc_idx, contrib)
        best = np.argmax(scores, axis=1)  # first max = label-asc tie-break
        return pa.table({
            "doc_id": b["doc_id"],
            "pred": pa.array([labels[i] for i in best], pa.string()),
        })

    return pages.map_batches(classify, batch_format="pyarrow")
