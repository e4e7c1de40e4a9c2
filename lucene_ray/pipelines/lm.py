"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020: documents are ranked by the
perplexity of a reference-corpus LM; low-perplexity ≈ fluent prose,
high ≈ boilerplate/gibberish). The production pipelines use a KenLM
5-gram; this is the same signal as a bigram stupid-backoff model
(Brants et al., EMNLP 2007) whose training AND scoring are exact,
SQL-checkable, and fully distributed.

Scale shape:

* **Training** is one ``map_batches`` partial count (per-batch unique
  (w1, w2) and unigram rows — pre-aggregated, so the shuffle moves
  n-gram VOCAB, not the corpus) followed by a small groupby-sum.
  ``min_count`` / ``max_ngrams`` bound the collected model exactly like
  the free-text suggester (top-count truncation, logged); the model
  broadcasts once via ``ray.put``.
* **Scoring** is a stateful actor stage: the model's sorted key arrays
  build once per actor, each batch scores via two ``searchsorted``
  lookups — no Python per token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007, §3)


def _token_stream(texts: pa.Array):
    """(flat terms, doc index) of a whitespace-tokenized column."""
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


class BigramLM:
    """Broadcastable stupid-backoff bigram model: sorted numpy key
    arrays, O(log n) vectorized lookups."""

    def __init__(self, uni_terms: pa.Array, uni_counts: np.ndarray,
                 bi_w1: np.ndarray, bi_w2: np.ndarray,
                 bi_counts: np.ndarray, total: int):
        order = pc.array_sort_indices(uni_terms).to_numpy(
            zero_copy_only=False).astype(np.int64)
        self.vocab = uni_terms.take(pa.array(order))
        self.uni = uni_counts[order].astype(np.float64)
        self.total = float(total)
        v = len(self.vocab)
        # bigram ids reference the SORTED vocab positions
        fused = bi_w1.astype(np.int64) * v + bi_w2.astype(np.int64)
        o2 = np.argsort(fused)
        self.bi_keys = fused[o2]
        self.bi = bi_counts[o2].astype(np.float64)

    def term_ids(self, flat: pa.Array) -> np.ndarray:
        """Sorted-vocab position per token; -1 for OOV."""
        idx = pc.fill_null(pc.index_in(flat, value_set=self.vocab), -1)
        return idx.to_numpy(zero_copy_only=False).astype(np.int64)

    def logprob(self, id1: np.ndarray, id2: np.ndarray) -> np.ndarray:
        """ln P(w2 | w1) under stupid backoff: bigram MLE when the
        bigram was seen, else BACKOFF * unigram MLE; OOV w2 falls back
        to BACKOFF / total (an unseen-word floor)."""
        v = len(self.vocab)
        fused = id1 * v + id2
        if self.bi_keys.shape[0] == 0:
            # numpy & does not short-circuit — indexing an empty bi_keys
            # below would raise, and an empty bigram table is reachable
            # via train_bigram_lm(min_count>=2) on a corpus with no
            # repeated bigrams
            hit = np.zeros(id1.shape[0], dtype=bool)
            pos_c = np.zeros(id1.shape[0], dtype=np.int64)
        else:
            pos = np.searchsorted(self.bi_keys, fused)
            pos_c = np.clip(pos, 0, self.bi_keys.shape[0] - 1)
            hit = (self.bi_keys[pos_c] == fused) & (id1 >= 0) & (id2 >= 0)
        out = np.empty(id1.shape[0], dtype=np.float64)
        if len(self.uni) == 0:
            # min_count can empty the unigram table too (every token a
            # singleton) — every position is then OOV at the floor
            out[:] = np.log(BACKOFF / max(self.total, 1.0))
            return out
        c1 = self.uni[np.clip(id1, 0, len(self.uni) - 1)]
        out[hit] = np.log(self.bi[pos_c[hit]] / c1[hit])
        miss = ~hit
        u2 = np.where(id2[miss] >= 0,
                      self.uni[np.clip(id2[miss], 0, len(self.uni) - 1)],
                      1.0)
        out[miss] = np.log(BACKOFF * u2 / self.total)
        return out


def train_bigram_lm(pages, text_col: str = "text", min_count: int = 1,
                    max_ngrams: "int | None" = 2_000_000) -> BigramLM:
    """Distributed count + small reduce; bounded collection: min_count
    prune, then top-``max_ngrams`` by count per kind. The cap is ON by
    default (2M unigrams + 2M bigrams ≈ a few hundred MB of driver
    model — CCNet prunes its LM vocabulary the same way) so a 100-TB
    corpus cannot silently OOM the driver; pass ``max_ngrams=None`` for
    an exact unbounded model on corpora known to be small. The final
    model size is logged either way."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_idx = _token_stream(b[text_col])
        n = len(flat)
        kinds, w1s, w2s, counts = [], [], [], []
        if n:
            vc = pc.value_counts(flat)
            kinds += ["u"] * len(vc)
            w1s += vc.field("values").to_pylist()
            w2s += [""] * len(vc)
            counts += vc.field("counts").to_pylist()
            if n > 1:
                same = doc_idx[1:] == doc_idx[:-1]
                if same.any():
                    i = np.nonzero(same)[0]
                    pair_tbl = pa.table({
                        "a": flat.take(pa.array(i)),
                        "b": flat.take(pa.array(i + 1)),
                    })
                    g = pair_tbl.group_by(["a", "b"]).aggregate([([], "count_all")])
                    kinds += ["b"] * g.num_rows
                    w1s += g["a"].to_pylist()
                    w2s += g["b"].to_pylist()
                    counts += g["count_all"].to_pylist()
        kinds.append("t")
        w1s.append("")
        w2s.append("")
        counts.append(n)
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    agg = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby(["kind", "w1", "w2"])
           .aggregate(Sum("n", alias_name="n")))
    if min_count > 1:
        def prune(b: pa.Table) -> pa.Table:
            keep = pc.or_(pc.equal(b["kind"], "t"),
                          pc.greater_equal(b["n"], min_count))
            return b.filter(keep)
        agg = agg.map_batches(prune, batch_format="pyarrow")
    if max_ngrams is not None:
        from lucene_ray.pipelines.facets import grouped_top_k

        agg = grouped_top_k(agg, "kind", "n", max_ngrams)
    rows = pa.concat_tables(agg.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 16))
    import logging
    logging.getLogger(__name__).info(
        "train_bigram_lm: collected %d n-gram rows (%.1f MB) onto the "
        "driver (min_count=%d, max_ngrams=%s)",
        rows.num_rows, rows.nbytes / 1e6, min_count, max_ngrams)
    kind = rows["kind"].to_numpy(zero_copy_only=False)
    uni_mask = kind == "u"
    bi_mask = kind == "b"
    total = int(rows["n"].to_numpy()[kind == "t"].sum())
    uni_terms = rows["w1"].filter(pa.array(uni_mask)).combine_chunks() \
        if isinstance(rows["w1"], pa.ChunkedArray) \
        else rows["w1"].filter(pa.array(uni_mask))
    uni_counts = rows["n"].to_numpy()[uni_mask]

    # map bigram endpoints into sorted-vocab positions (drop bigrams
    # whose endpoint was pruned from the unigram table)
    tmp = BigramLM(uni_terms, uni_counts,
                   np.empty(0, np.int64), np.empty(0, np.int64),
                   np.empty(0, np.int64), total)
    b_w1 = tmp.term_ids(rows["w1"].filter(pa.array(bi_mask)))
    b_w2 = tmp.term_ids(rows["w2"].filter(pa.array(bi_mask)))
    b_n = rows["n"].to_numpy()[bi_mask]
    ok = (b_w1 >= 0) & (b_w2 >= 0)
    return BigramLM(uni_terms, uni_counts, b_w1[ok], b_w2[ok], b_n[ok],
                    total)


def score_perplexity(pages, model: BigramLM, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-doc mean transition log-prob + perplexity under ``model``
    (docs with < 2 tokens have no transitions and are dropped, like the
    SQL twin's group-by). The model ships ONCE via ``ray.put``; each
    batch scores with two vectorized searchsorted lookups."""
    import ray

    ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        m: BigramLM = ray.get(ref)
        flat, doc_idx = _token_stream(b[text_col])
        n = len(flat)
        ids_col = b[id_col].to_numpy(zero_copy_only=False)
        if n < 2:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "avg_logprob": pa.array([], pa.float64()),
                             "perplexity": pa.array([], pa.float64())})
        tid = m.term_ids(flat)
        same = doc_idx[1:] == doc_idx[:-1]
        i = np.nonzero(same)[0]
        lp = m.logprob(tid[i], tid[i + 1])
        d = doc_idx[i]
        nb = np.bincount(d, minlength=b.num_rows)
        sums = np.zeros(b.num_rows, dtype=np.float64)
        np.add.at(sums, d, lp)
        sel = nb > 0
        avg = sums[sel] / nb[sel]
        return pa.table({
            id_col: pa.array(ids_col[sel].astype(np.int64)),
            "avg_logprob": pa.array(avg),
            "perplexity": pa.array(np.exp(-avg)),
        })

    return pages.map_batches(score, batch_format="pyarrow")


def perplexity_buckets(scored, n_buckets: int = 3,
                       round_decimals: int = 4):
    """CCNet's head/middle/tail quality bucketing (Wenzek et al.,
    LREC 2020 §4.3 — documents split into equal-size groups by LM
    perplexity, lowest = head = highest quality): rank-partition the
    ``score_perplexity`` output into ``n_buckets`` NTILE-style groups
    (the first n % b buckets take the extra row) and report per-bucket
    count + mean perplexity.

    Distributed shape: ONE global sort of the tiny per-doc score table
    (doc_id, perplexity — never text), then ``split_at_indices`` (a
    metadata split, no driver materialization) and per-bucket streaming
    aggregates. Perplexities are rounded BEFORE ranking so the bucket
    boundaries are reproducible across float orderings."""
    import pyarrow.compute as pc

    def rounded(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("perplexity"), "perplexity",
            pc.round(b["perplexity"], ndigits=round_decimals))

    ds = scored.map_batches(rounded, batch_format="pyarrow")
    n = ds.count()
    base, extra = divmod(n, n_buckets)
    sizes = [base + (1 if i < extra else 0) for i in range(n_buckets)]
    cuts = list(np.cumsum(sizes[:-1]))
    parts = ds.sort(["perplexity", "doc_id"]).split_at_indices(cuts)
    labels = (["head", "middle", "tail"] if n_buckets == 3
              else [f"b{i + 1}" for i in range(n_buckets)])
    rows = {"bucket": [], "count": [], "avg_perplexity": []}
    for label, part, size in zip(labels, parts, sizes):
        s = part.sum("perplexity") if size else 0.0
        rows["bucket"].append(label)
        rows["count"].append(size)
        rows["avg_perplexity"].append((s / size) if size else 0.0)
    return pa.table({
        "bucket": pa.array(rows["bucket"], pa.string()),
        "count": pa.array(rows["count"], pa.int64()),
        "avg_perplexity": pa.array(rows["avg_perplexity"], pa.float64()),
    })
