"""BM25 scoring — exact float32 port of Lucene's BM25Similarity.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java:139-286 — idf = (float) log(1 + (N - n + 0.5)/(n + 0.5))
computed in double then cast to float; a 256-entry float cache
``1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))``; and the score
``weight - weight / (1 + freq * invNorm)`` evaluated in float32 (op order
matters for rank-identity — BM25Similarity.java:265-274).

Two scorers:
  * :class:`BM25Scorer` — float32, bit-identical to Lucene; used by the
    engine's top-k path and the golden-rank tests.
  * :func:`bm25_score_f64` — float64 with a plain expression tree
    ``idf * freq / (freq + K)`` mirroring the DuckDB oracle SQL so the
    driver's value-hash comparison is deterministic.
"""

from __future__ import annotations

import numpy as np

from lucene_ray.util.smallfloat import LENGTH_TABLE_F32, LENGTH_TABLE_INT


def idf_f32(doc_freq: int, doc_count: int) -> np.float32:
    """BM25Similarity.idf — double log, cast to float32."""
    # exactly Math.log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5)):
    # the 1 + x addition happens in double before the log (NOT log1p).
    v = np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    return np.float32(v)


def avg_field_length_f32(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """BM25Similarity.avgFieldLength — double division, cast to float32."""
    return np.float32(sum_total_term_freq / float(doc_count))


class BM25Scorer:
    """Per-term scorer with Lucene's precomputed 256-entry invNorm cache.

    BM25Similarity.scorer (BM25Similarity.java:216-224) builds
    ``cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))`` in
    float32; score(freq, normByte) = weight - weight / (1 + freq * cache[b]).
    """

    __slots__ = ("k1", "b", "idf", "avgdl", "weight", "cache")

    def __init__(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        k1: float = 1.2,
        b: float = 0.75,
        boost: float = 1.0,
    ) -> None:
        k1f = np.float32(k1)
        bf = np.float32(b)
        self.k1 = k1f
        self.b = bf
        self.idf = idf_f32(doc_freq, doc_count)
        self.avgdl = avg_field_length_f32(sum_total_term_freq, doc_count)
        # float32 evaluation order identical to Java:
        # 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
        one = np.float32(1.0)
        with np.errstate(divide="ignore"):
            self.cache = one / (
                k1f * ((one - bf) + bf * LENGTH_TABLE_F32 / self.avgdl)
            )
        self.weight = np.float32(boost) * self.idf

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """Vectorized float32 score for parallel freq/norm arrays."""
        inv = self.cache[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(freqs).astype(np.float32)
        one = np.float32(1.0)
        return self.weight - self.weight / (one + f * inv)

    def max_score(self, max_freq: int | np.ndarray, min_norm: int | np.ndarray):
        """Per-block score upper bound from the impact frontier.

        Valid because score is monotone increasing in freq and in invNorm,
        and invNorm is monotone decreasing in encoded length (norm byte) —
        the MaxScoreCache premise (search/MaxScoreCache.java:74-140). With
        2-D (n_blocks, IMPACT_BUCKETS) frontier inputs (codec v3) the bound
        is the max over each block's conservative points — the
        CompetitiveImpactAccumulator relaxation (see codec/postings.py).
        """
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class BM25ScorerF64:
    """Float64 scorer with the plain ``idf * f/(f+K)`` expression tree —
    matches the DuckDB oracle SQL bit-for-bit (modulo libm ulp). Same
    interface as :class:`BM25Scorer` so the query engine is scorer-agnostic.
    """

    __slots__ = ("df", "doc_count", "sum_ttf", "k1", "b", "idf", "avgdl", "boost")

    def __init__(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        k1: float = 1.2,
        b: float = 0.75,
        boost: float = 1.0,
    ) -> None:
        self.df = doc_freq
        self.doc_count = doc_count
        self.sum_ttf = sum_total_term_freq
        self.k1 = k1
        self.b = b
        self.boost = boost
        self.avgdl = sum_total_term_freq / doc_count
        self.idf = np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(np.float64)
        f = np.asarray(freqs).astype(np.float64)
        return self.boost * (
            self.idf * f / (f + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class LMDirichletScorer:
    """LMDirichletSimilarity (similarities/LMDirichletSimilarity.java:76-82):
    ``boost * (ln(1 + f/(mu*p)) + ln(mu/(dl+mu)))`` clamped at 0, with the
    default collection model p = (ttf+1)/(sum_ttf+1)
    (LMSimilarity.java:150-151). Float64 like the oracle SQL. Monotone
    increasing in freq and decreasing in dl, so the impact-frontier bound
    at (max_freq, min_norm) is valid (min norm byte = min dl)."""

    __slots__ = ("mu", "p", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, mu: float = 2000.0, boost: float = 1.0) -> None:
        self.mu = float(mu)
        self.p = (ttf + 1.0) / (sum_total_term_freq + 1.0)
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        s = self.boost * (
            np.log(1.0 + f / (self.mu * self.p))
            + np.log(self.mu / (dl + self.mu))
        )
        return np.maximum(s, 0.0)

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class LMJelinekMercerScorer:
    """LMJelinekMercerSimilarity (LMJelinekMercerSimilarity.java:68-74):
    ``boost * ln(1 + ((1-lambda)*f/dl) / (lambda*p))`` with the same
    collection model as Dirichlet. Always >= 0 (log1p of a positive)."""

    __slots__ = ("lam", "p", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, lam: float = 0.1, boost: float = 1.0) -> None:
        self.lam = float(lam)
        self.p = (ttf + 1.0) / (sum_total_term_freq + 1.0)
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = ((1.0 - self.lam) * f / dl) / (self.lam * self.p)
        return self.boost * np.log(1.0 + np.where(np.isfinite(ratio), ratio, 0.0))

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class ClassicScorer:
    """ClassicSimilarity / TFIDFSimilarity (ClassicSimilarity.java:45-71,
    TFIDFSimilarity.java:451-472): ``boost * idf * sqrt(f) * 1/sqrt(dl)``
    with idf = ln((docCount+1)/(docFreq+1)) + 1; norm byte 0 maps to
    1/normTable[255] (TFIDFSimilarity.java:446). Float64 oracle-tree."""

    __slots__ = ("idf", "boost", "norm_table")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, boost: float = 1.0) -> None:
        self.idf = np.log((doc_count + 1) / (doc_freq + 1.0)) + 1.0
        self.boost = float(boost)
        with np.errstate(divide="ignore"):
            nt = 1.0 / np.sqrt(LENGTH_TABLE_INT.astype(np.float64))
        nt[0] = 1.0 / nt[255]
        self.norm_table = nt

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        nv = self.norm_table[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(freqs).astype(np.float64)
        return self.boost * self.idf * np.sqrt(f) * nv

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class BooleanSimScorer:
    """BooleanSimilarity (BooleanSimilarity.java:41-51): score == boost,
    norms and frequencies ignored."""

    __slots__ = ("boost",)

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, boost: float = 1.0) -> None:
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        return np.full(np.asarray(freqs).shape, self.boost, dtype=np.float64)

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class DFRInL2Scorer:
    """DFR InL2 (similarities/DFRSimilarity.java:36 with BasicModelIn.java:30,
    AfterEffectL.java:27, NormalizationH2.java:31 — the Amati/van Rijsbergen
    divergence-from-randomness framework, published in TOIS 2002):

    ``tfn = f * log2(1 + c * avgdl / dl)``  (H2 length normalization, c=1)
    ``score = boost * (tfn / (tfn + 1)) * log2((N + 1) / (df + 0.5))``
    (inverse-document-frequency basic model I(n) x Laplace after-effect).

    Float64 expression tree mirrors the DuckDB oracle. Monotone increasing
    in freq and decreasing in dl, so the impact-frontier bound is valid."""

    __slots__ = ("c", "df", "n", "avgdl", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, c: float = 1.0, boost: float = 1.0) -> None:
        self.c = float(c)
        self.df = float(doc_freq)
        self.n = float(doc_count)
        self.avgdl = sum_total_term_freq / doc_count
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            tfn = f * np.log2(1.0 + self.c * self.avgdl / dl)
        tfn = np.where(np.isfinite(tfn), tfn, 0.0)
        return self.boost * (tfn / (tfn + 1.0)) * np.log2(
            (self.n + 1.0) / (self.df + 0.5))

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class IBLLScorer:
    """IB similarity, log-logistic distribution, lambda = DF, H2 normalization
    (similarities/IBSimilarity.java:60 with DistributionLL.java:26,
    LambdaDF.java:25, NormalizationH2.java:31 — Clinchant & Gaussier,
    SIGIR 2010 "Information-based models for ad hoc IR"):

    ``lambda = (df + 1) / (N + 1)``
    ``tfn = f * log2(1 + c * avgdl / dl)``  (c=1)
    ``score = boost * ln(1 + tfn / lambda)``  (= -ln(lambda/(tfn+lambda)))."""

    __slots__ = ("c", "lam", "avgdl", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, c: float = 1.0, boost: float = 1.0) -> None:
        self.c = float(c)
        self.lam = (doc_freq + 1.0) / (doc_count + 1.0)
        self.avgdl = sum_total_term_freq / doc_count
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            tfn = f * np.log2(1.0 + self.c * self.avgdl / dl)
        tfn = np.where(np.isfinite(tfn), tfn, 0.0)
        return self.boost * np.log(1.0 + tfn / self.lam)

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class AxiomaticF2EXPScorer:
    """Axiomatic F2EXP (similarities/AxiomaticF2EXP.java:30 — Fang & Zhai,
    SIGIR 2005 "An exploration of axiomatic approaches to IR"):

    ``score = boost * ((N + 1) / df)^k * f / (f + s + s * dl / avgdl)``

    with defaults s = 0.5, k = 0.35. Same shape as BM25's saturation with a
    power-law idf; float64 oracle tree, frontier-bound valid."""

    __slots__ = ("s", "k", "idf", "avgdl", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, s: float = 0.5, k: float = 0.35,
                 boost: float = 1.0) -> None:
        self.s = float(s)
        self.k = float(k)
        self.idf = ((doc_count + 1.0) / max(doc_freq, 1)) ** float(k)
        self.avgdl = sum_total_term_freq / doc_count
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        return self.boost * self.idf * f / (
            f + self.s + self.s * dl / self.avgdl)

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class DFIScorer:
    """Divergence-from-Independence (similarities/DFISimilarity.java:54,
    Kocabas/Dincer/Karaoglan IRJ 2014): expected = (ttf+1) * dl /
    (sumTtf+1); score = boost * log2(measure(f, expected) + 1), zero when
    f <= expected. Measures (Independence{Standardized,Saturated,
    ChiSquared}.java): (f-e)/sqrt(e), (f-e)/e, (f-e)^2/e."""

    __slots__ = ("measure", "ttf", "sttf", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, measure: str = "chisquared",
                 boost: float = 1.0) -> None:
        self.measure = measure
        self.ttf = float(ttf)
        self.sttf = float(sum_total_term_freq)
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        e = (self.ttf + 1.0) * dl / (self.sttf + 1.0)
        if self.measure == "standardized":
            m = (f - e) / np.sqrt(e)
        elif self.measure == "saturated":
            m = (f - e) / e
        else:  # chisquared
            m = (f - e) * (f - e) / e
        return np.where(f <= e, 0.0, self.boost * np.log2(m + 1.0))

    def max_score(self, max_freq, min_norm):
        # monotone: increasing in f, decreasing in dl for every measure
        # on the scored branch (f > e)
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class IndriDirichletScorer:
    """IndriDirichletSimilarity (similarities/IndriDirichletSimilarity
    .java:38): ln((f + mu*p) / (dl + mu)) with p = (ttf+1)/(sumTtf+1),
    mu = 2000 — Indri's query-likelihood variant, which (unlike Lucene's
    LMDirichlet) keeps the NEGATIVE log-probability; no clamp."""

    __slots__ = ("mu", "p", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, mu: float = 2000.0, boost: float = 1.0) -> None:
        self.mu = float(mu)
        self.p = (ttf + 1.0) / (sum_total_term_freq + 1.0)
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        return self.boost * np.log((f + self.mu * self.p) / (dl + self.mu))

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class AxiomaticScorer:
    """The remaining Axiomatic family F1EXP/F1LOG/F2LOG/F3EXP/F3LOG
    (similarities/Axiomatic.java:104 score = tf*ln*tfln*idf - gamma,
    clamped at 0; subclasses fix the components, defaults s=0.25,
    k=0.35, queryLen=1). F2EXP lives in AxiomaticF2EXPScorer above."""

    __slots__ = ("variant", "s", "k", "qlen", "df", "n", "avgdl", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, variant: str = "f2log", s: float = 0.25,
                 k: float = 0.35, query_len: int = 1,
                 boost: float = 1.0) -> None:
        self.variant = variant
        self.s = float(s)
        self.k = float(k)
        self.qlen = float(query_len)
        self.df = float(max(doc_freq, 1))
        self.n = float(doc_count)
        self.avgdl = sum_total_term_freq / doc_count
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        v, s_, avg = self.variant, self.s, self.avgdl
        tf = 1.0 + np.log(1.0 + np.log(f + 1.0))
        if v == "f1exp":
            sc = (tf * ((avg + s_) / (avg + dl * s_))
                  * ((self.n + 1.0) / self.df) ** self.k)
        elif v == "f1log":
            sc = (tf * ((avg + s_) / (avg + dl * s_))
                  * np.log((self.n + 1.0) / self.df))
        elif v == "f2log":
            sc = (np.log((self.n + 1.0) / self.df)
                  * f / (f + s_ + s_ * dl / avg))
        elif v == "f3exp":
            sc = (tf * ((self.n + 1.0) / self.df) ** self.k
                  - (dl - self.qlen) * s_ * self.qlen / avg)
        else:  # f3log
            sc = (tf * np.log((self.n + 1.0) / self.df)
                  - (dl - self.qlen) * s_ * self.qlen / avg)
        return np.maximum(0.0, self.boost * sc)

    def max_score(self, max_freq, min_norm):
        # every component is non-decreasing in f and non-increasing in dl
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class DFRScorer:
    """Generic DFR (similarities/DFRSimilarity.java:77: boost *
    basicModel.score(stats, tfn, aeTimes1pTfn)) over the full component
    grid — BasicModel{In,Ine,G,IF}.java, AfterEffect{L,B}.java,
    Normalization{H1,H2,H3,Z}.java. The common InL2 pairing keeps its
    dedicated DFRInL2Scorer; this scorer serves the remaining combos via
    mode 'dfr_<model>_<ae>_<norm>[:c]' (c doubles as mu for H3 and z
    for Z, matching the reference's per-normalization parameter)."""

    __slots__ = ("model", "ae", "norm", "c", "df", "ttf", "n", "avgdl",
                 "p", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, model: str = "g", ae: str = "b",
                 norm: str = "h2", c: float | None = None,
                 boost: float = 1.0) -> None:
        self.model = model
        self.ae = ae
        self.norm = norm
        if c is None:
            c = {"h1": 1.0, "h2": 1.0, "h3": 800.0, "z": 0.30}[norm]
        self.c = float(c)
        self.df = float(doc_freq)
        self.ttf = float(ttf)
        self.n = float(doc_count)
        self.avgdl = sum_total_term_freq / doc_count
        self.p = (ttf + 1.0) / (sum_total_term_freq + 1.0)
        self.boost = float(boost)

    def _tfn(self, f: np.ndarray, dl: np.ndarray) -> np.ndarray:
        if self.norm == "h1":
            return f * self.c * (self.avgdl / dl)
        if self.norm == "h2":
            return f * np.log2(1.0 + self.c * self.avgdl / dl)
        if self.norm == "h3":
            return (f + self.c * self.p) / (dl + self.c) * self.c
        return f * (self.avgdl / dl) ** self.c  # z

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        tfn = self._tfn(f, dl)
        ae1p = 1.0 if self.ae == "l" else (self.ttf + 2.0) / (self.df + 1.0)
        if self.model == "g":
            F = self.ttf + 1.0
            lam = F / (self.n + F)
            A = np.log2(lam + 1.0)
            B = np.log2((1.0 + lam) / lam)
            sc = (B - (B - A) / (1.0 + tfn)) * ae1p
        else:
            if self.model == "in":
                A = np.log2((self.n + 1.0) / (self.df + 0.5))
            elif self.model == "ine":
                ne = self.n * (1.0 - ((self.n - 1.0) / self.n) ** self.ttf)
                A = np.log2((self.n + 1.0) / (ne + 0.5))
            else:  # if
                A = np.log2(1.0 + (self.n + 1.0) / (self.ttf + 0.5))
            sc = A * ae1p * (1.0 - 1.0 / (1.0 + tfn))
        return self.boost * sc

    def max_score(self, max_freq, min_norm):
        # tfn is increasing in f, decreasing in dl for every norm; the
        # model scores are non-decreasing in tfn by construction
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class IBSPLTTFScorer:
    """IB with the SPL distribution and total-term-frequency lambda
    (similarities/DistributionSPL.java:29, LambdaTTF.java:30,
    IBSimilarity.java:102): lambda = float32((ttf+1)/(N+1)), tfn via
    NormalizationH2, q = 1 - 1/(tfn+1),
    score = -ln((lambda^q - lambda)/(1 - lambda))."""

    __slots__ = ("lam", "c", "avgdl", "boost")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, c: float = 1.0, boost: float = 1.0) -> None:
        # the reference casts lambda to float (LambdaTTF.java:33)
        self.lam = float(np.float32((ttf + 1.0) / (doc_count + 1.0)))
        if self.lam == 1.0:
            self.lam = float(np.nextafter(np.float32(1.0), np.float32(2.0)))
        self.c = float(c)
        self.avgdl = sum_total_term_freq / doc_count
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64)
        f = np.asarray(freqs).astype(np.float64)
        tfn = f * np.log2(1.0 + self.c * self.avgdl / dl)
        q = 1.0 - 1.0 / (tfn + 1.0)
        q = np.minimum(q, np.nextafter(1.0, 0.0))
        pw = self.lam ** q
        # guard pow collapsing onto lambda (DistributionSPL.java:41-52)
        pw = np.where(pw == self.lam,
                      np.nextafter(self.lam, 2.0) if self.lam < 1
                      else np.nextafter(self.lam, 0.0), pw)
        return self.boost * -np.log((pw - self.lam) / (1.0 - self.lam))

    def max_score(self, max_freq, min_norm):
        s = self.score(np.asarray(max_freq), np.asarray(min_norm))
        return s.max(axis=-1) if s.ndim == 2 else s


class SweetSpotScorer:
    """SweetSpotSimilarity (misc/src/java/org/apache/lucene/misc/
    SweetSpotSimilarity.java:47): ClassicSimilarity with a plateau
    length normalization — documents whose length falls inside the
    [ln_min, ln_max] "sweet spot" are not penalized at all, outside it
    the penalty ramps with ``steepness``:

        lengthNorm(L) = 1/sqrt(steepness*(|L-min|+|L-max|-(max-min))+1)

    tf stays the baseline sqrt(freq) (baselineTf with base=0, min=0,
    the class default). With min=max=1, steepness=0.5 this reduces
    exactly to ClassicSimilarity's 1/sqrt(L) — tested invariant."""

    __slots__ = ("idf", "boost", "norm_table")

    def __init__(self, doc_freq: int, doc_count: int, sum_total_term_freq: int,
                 ttf: int = 0, boost: float = 1.0, ln_min: float = 1.0,
                 ln_max: float = 1.0, steepness: float = 0.5) -> None:
        self.idf = np.log((doc_count + 1) / (doc_freq + 1.0)) + 1.0
        self.boost = float(boost)
        L = LENGTH_TABLE_INT.astype(np.float64)
        raw = steepness * (np.abs(L - ln_min) + np.abs(L - ln_max)
                           - (ln_max - ln_min)) + 1.0
        nt = 1.0 / np.sqrt(raw)
        nt[0] = 1.0 / nt[255]  # byte 0 = missing norm, Classic convention
        self.norm_table = nt

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        nv = self.norm_table[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(freqs).astype(np.float64)
        return self.boost * self.idf * np.sqrt(f) * nv

    def max_score(self, max_freq, min_norm):
        # the plateau makes the table non-monotone in the norm byte, so
        # the per-block bound uses the table's global max (safe, loose)
        f = np.asarray(max_freq).astype(np.float64)
        s = self.boost * self.idf * np.sqrt(f) * self.norm_table[1:].max()
        return s.max(axis=-1) if s.ndim == 2 else s


class SumScorer:
    """MultiSimilarity.MultiSimScorer (similarities/MultiSimilarity.java:65):
    the sum of sub-scorers applied to the same (freq, norm) stream — how
    SimilarityBase scores a phrase (one per-term scorer each fed the
    phrase freq, summed)."""

    __slots__ = ("subs",)

    def __init__(self, subs) -> None:
        self.subs = list(subs)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        out = self.subs[0].score(freqs, norm_bytes)
        for s in self.subs[1:]:
            out = out + s.score(freqs, norm_bytes)
        return out

    def max_score(self, max_freq, min_norm):
        out = self.subs[0].max_score(max_freq, min_norm)
        for s in self.subs[1:]:
            out = out + s.max_score(max_freq, min_norm)
        return out


def _parse_mode(mode: str) -> tuple[str, float | None]:
    """``'lm_dirichlet:500'`` -> ('lm_dirichlet', 500.0); multi-arg
    modes (``'sweetspot:30:70'``) -> (name, None) — make_scorer parses
    those itself."""
    if ":" in mode:
        name, arg = mode.split(":", 1)
        return (name, None) if ":" in arg else (name, float(arg))
    return mode, None


def make_scorer(
    doc_freq: int,
    doc_count: int,
    sum_total_term_freq: int,
    mode: str = "f32",
    k1: float = 1.2,
    b: float = 0.75,
    boost: float = 1.0,
    ttf: int = 0,
):
    """Scorer factory — the Similarity extension point (SURVEY §2.12):
    ``'f32'`` = Lucene-exact BM25, ``'f64'`` = oracle-SQL-exact BM25,
    ``'lm_dirichlet[:mu]'``, ``'lm_jm[:lambda]'``, ``'classic'``,
    ``'boolean'`` = the similarities package ports above."""
    if mode.split(":", 1)[0] == "sweetspot":
        # 'sweetspot[:min[:max[:steepness]]]' — the one multi-arg mode
        parts = mode.split(":")[1:]
        ln_min = float(parts[0]) if len(parts) > 0 else 1.0
        ln_max = float(parts[1]) if len(parts) > 1 else ln_min
        steep = float(parts[2]) if len(parts) > 2 else 0.5
        return SweetSpotScorer(doc_freq, doc_count, sum_total_term_freq,
                               ttf=ttf, boost=boost, ln_min=ln_min,
                               ln_max=ln_max, steepness=steep)
    name, arg = _parse_mode(mode)
    if name == "f32":
        return BM25Scorer(doc_freq, doc_count, sum_total_term_freq,
                          k1=k1, b=b, boost=boost)
    if name == "f64":
        return BM25ScorerF64(doc_freq, doc_count, sum_total_term_freq,
                             k1=k1, b=b, boost=boost)
    if name == "lm_dirichlet":
        return LMDirichletScorer(doc_freq, doc_count, sum_total_term_freq,
                                 ttf=ttf, mu=arg if arg is not None else 2000.0,
                                 boost=boost)
    if name == "lm_jm":
        return LMJelinekMercerScorer(doc_freq, doc_count, sum_total_term_freq,
                                     ttf=ttf,
                                     lam=arg if arg is not None else 0.1,
                                     boost=boost)
    if name == "classic":
        return ClassicScorer(doc_freq, doc_count, sum_total_term_freq,
                             ttf=ttf, boost=boost)
    if name == "boolean":
        return BooleanSimScorer(doc_freq, doc_count, sum_total_term_freq,
                                ttf=ttf, boost=boost)
    if name == "dfr_inl2":
        return DFRInL2Scorer(doc_freq, doc_count, sum_total_term_freq,
                             ttf=ttf, c=arg if arg is not None else 1.0,
                             boost=boost)
    if name == "ib_ll":
        return IBLLScorer(doc_freq, doc_count, sum_total_term_freq,
                          ttf=ttf, c=arg if arg is not None else 1.0,
                          boost=boost)
    if name == "ax_f2exp":
        return AxiomaticF2EXPScorer(doc_freq, doc_count, sum_total_term_freq,
                                    ttf=ttf, k=arg if arg is not None else 0.35,
                                    boost=boost)
    if name in ("dfi_standardized", "dfi_saturated", "dfi_chisquared"):
        return DFIScorer(doc_freq, doc_count, sum_total_term_freq, ttf=ttf,
                         measure=name.split("_", 1)[1], boost=boost)
    if name == "indri_dirichlet":
        return IndriDirichletScorer(doc_freq, doc_count, sum_total_term_freq,
                                    ttf=ttf,
                                    mu=arg if arg is not None else 2000.0,
                                    boost=boost)
    if name in ("ax_f1exp", "ax_f1log", "ax_f2log", "ax_f3exp", "ax_f3log"):
        return AxiomaticScorer(doc_freq, doc_count, sum_total_term_freq,
                               ttf=ttf, variant=name.split("_", 1)[1],
                               s=arg if arg is not None else 0.25, boost=boost)
    if name.startswith("dfr_") and name.count("_") == 3:
        # 'dfr_<model>_<ae>_<norm>[:c]' over the full component grid
        _, model, ae, norm = name.split("_")
        return DFRScorer(doc_freq, doc_count, sum_total_term_freq, ttf=ttf,
                         model=model, ae=ae, norm=norm, c=arg, boost=boost)
    if name == "ib_spl_ttf":
        return IBSPLTTFScorer(doc_freq, doc_count, sum_total_term_freq,
                              ttf=ttf, c=arg if arg is not None else 1.0,
                              boost=boost)
    raise ValueError(f"unknown similarity mode {mode!r}")


def bm25_score_f64(
    freqs: np.ndarray,
    norm_bytes: np.ndarray,
    doc_freq: int,
    doc_count: int,
    sum_total_term_freq: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    """Float64 BM25 matching the DuckDB oracle expression exactly:

    ``ln(1 + (N - df + 0.5)/(df + 0.5)) * freq / (freq + k1*(1 - b + b*dl/avgdl))``

    with dl = smallfloat-decoded doc length and avgdl = sum_ttf/doc_count.
    Every op is IEEE double, same expression tree as the SQL.
    """
    dl = LENGTH_TABLE_INT[np.asarray(norm_bytes, dtype=np.uint8)].astype(np.float64)
    avgdl = sum_total_term_freq / doc_count
    idf = np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    f = np.asarray(freqs).astype(np.float64)
    return idf * f / (f + k1 * (1.0 - b + b * dl / avgdl))
