"""Corpus-level suggesters — the FreeTextSuggester role
(suggest/analyzing/FreeTextSuggester.java:120).

The reference builds an n-gram language model (an FST of token
n-grams) and completes the user's current token conditioned on the
previous ones, scoring with "stupid backoff" (Brants et al. 2007,
the paper the reference cites): use the conditional n-gram frequency
when the history was seen, otherwise back off to the lower order
scaled by alpha (the reference's ALPHA = 0.4).

Ray-Data-first analog for the bigram case: ONE streaming pass over the
corpus emits per-batch partial counts (bigram continuations of the
context, prefix-matching unigrams, context occurrences, total tokens),
a tiny groupby-sum reduces them, and the driver scores the handful of
candidates:

    S(c | w) = count(w c) / count(w)        if the bigram was seen
             = alpha * count(c) / N         otherwise (backoff)

Everything per batch is Arrow kernels (split_pattern / value_counts);
the shuffle moves only candidate-term count rows, never text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(texts: pa.Array):
    """(flat token array, boundary mask) — mask[i] is True when token i
    and i+1 belong to the same document (valid bigram pair)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = pc.split_pattern(texts, " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    offs = lst.offsets.to_numpy()
    n = len(flat)
    same_doc = np.ones(max(n - 1, 0), dtype=bool)
    # positions just before a document boundary cannot pair forward
    ends = offs[1:-1] - 1  # last-token index of each doc except the final
    same_doc[ends[(ends >= 0) & (ends < n - 1)]] = False
    return flat, same_doc


def free_text_suggest(pages, context: str, prefix: str, k: int = 10,
                      alpha: float = 0.4, text_col: str = "text") -> pa.Table:
    """Next-token completion: candidates extending ``prefix`` after the
    token ``context``, stupid-backoff scored. Returns (rank, term,
    score) with score rounded to 6 decimals, ties broken term asc."""

    def partial(b: pa.Table) -> pa.Table:
        flat, same_doc = _flat_tokens(b[text_col])
        kinds, terms, counts = [], [], []
        n = len(flat)
        if n:
            is_pref = pc.starts_with(flat, prefix).to_numpy(
                zero_copy_only=False)
            is_ctx = pc.equal(flat, context).to_numpy(zero_copy_only=False)
            # bigram continuations: context at i, prefix-candidate at i+1
            if n > 1:
                sel = is_ctx[:-1] & is_pref[1:] & same_doc
                if sel.any():
                    vc = pc.value_counts(flat.take(
                        pa.array(np.nonzero(sel)[0] + 1)))
                    kinds += ["big"] * len(vc)
                    terms += vc.field("values").to_pylist()
                    counts += vc.field("counts").to_pylist()
            if is_pref.any():
                vc = pc.value_counts(flat.filter(pa.array(is_pref)))
                kinds += ["uni"] * len(vc)
                terms += vc.field("values").to_pylist()
                counts += vc.field("counts").to_pylist()
            kinds += ["ctx", "tot"]
            terms += ["", ""]
            counts += [int(is_ctx.sum()), n]
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "term": pa.array(terms, pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    rows = (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    big: dict = {}
    uni: dict = {}
    ctx_n = tot_n = 0
    for r in rows:
        if r["kind"] == "big":
            big[r["term"]] = r["n"]
        elif r["kind"] == "uni":
            uni[r["term"]] = r["n"]
        elif r["kind"] == "ctx":
            ctx_n = r["n"]
        else:
            tot_n = r["n"]
    terms = sorted(uni)
    scores = np.array([
        (big[t] / ctx_n) if t in big and ctx_n
        else (alpha * uni[t] / tot_n if tot_n else 0.0)
        for t in terms
    ], dtype=np.float64)
    r6 = np.sign(scores) * np.floor(np.abs(scores) * 1e6 + 0.5) / 1e6
    order = np.lexsort((np.asarray(terms, dtype=object), -r6))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, order.shape[0] + 1, dtype=np.int64)),
        "term": pa.array([terms[i] for i in order], pa.string()),
        "score": pa.array(r6[order], pa.float64()),
    })
