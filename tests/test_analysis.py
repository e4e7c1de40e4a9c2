"""Analyzer golden tests — the assertTokenStreamContents pattern
(test-framework/.../analysis/BaseTokenStreamTestCase.java:145) over the
FIXTURES.md edge-case corpus."""

import pyarrow as pa

from lucene_ray.analysis.analyzers import EnglishAnalyzer, StandardAnalyzer
from lucene_ray.analysis.batch import tokenize_column
from lucene_ray.analysis.tokenizer import tokenize, tokenize_with_offsets

GOLDEN = {
    "": [],
    "   ": [],
    "one": ["one"],
    "3.14 1,000,000 C++ O'Brien can't state-of-the-art a@b.com http://x.y/z": [
        "3.14", "1,000,000", "C", "O'Brien", "can't",
        "state", "of", "the", "art", "a", "b.com", "http", "x.y", "z",
    ],
    "naïve café 東京 한글 🚀 test": ["naïve", "café", "東", "京", "한글", "test"],
    "foo_bar under_score_chain": ["foo_bar", "under_score_chain"],
    "the and of to a in is it": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "trailing. dots. stay: out": ["trailing", "dots", "stay", "out"],
}


def test_golden_tokens():
    for text, want in GOLDEN.items():
        assert tokenize(text) == want, text


def test_max_token_length_chop():
    toks = tokenize("x" * 300)
    assert toks == ["x" * 255, "x" * 45]
    toks = tokenize("y" * 255)
    assert toks == ["y" * 255]


def test_offsets_and_positions():
    out = tokenize_with_offsets("ab cd  ef")
    assert out == [("ab", 0, 0, 2), ("cd", 1, 3, 5), ("ef", 2, 7, 9)]


def test_lowercase_and_stop():
    assert StandardAnalyzer.tokens("The Quick FOX") == ["the", "quick", "fox"]
    # StandardAnalyzer default stop set is EMPTY (StandardAnalyzer.java:34-96)
    assert StandardAnalyzer.tokens("the and of") == ["the", "and", "of"]
    assert EnglishAnalyzer.tokens("the quick fox") == ["quick", "fox"]


def test_stop_filter_keeps_position_gaps():
    # StopFilter keeps position increments (analysis/StopFilter.java:25)
    tp = EnglishAnalyzer.tokens_with_positions("the quick the fox")
    assert tp == [("quick", 1), ("fox", 3)]


def test_batch_fast_path_matches_python():
    texts = ["key agg row scan", "a  b  c", "", "hash part value"]
    flat, doc_idx, pos = tokenize_column(pa.array(texts))
    want = [StandardAnalyzer.tokens(t) for t in texts]
    got = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_idx):
        got[d].append(t)
    assert got == want


def test_batch_mixed_path_matches_python():
    texts = ["simple lower text", "Mixed CASE can't 3.14", "東京 test", ""]
    flat, doc_idx, pos = tokenize_column(pa.array(texts))
    want = [StandardAnalyzer.tokens(t) for t in texts]
    got = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_idx):
        got[d].append(t)
    assert got == want


def test_batch_positions_dense_per_doc():
    texts = ["a b c", "d e"]
    _flat, doc_idx, pos = tokenize_column(pa.array(texts))
    assert pos.tolist() == [0, 1, 2, 0, 1]


def test_html_extract_vectorized_matches_rowwise():
    """The Arrow-RE2 fast path must be byte-identical to the row-wise
    python extractor on edge-case HTML (entities, comments, scripts,
    missing body/title)."""
    import pyarrow as pa

    from lucene_ray.pipelines.html import HtmlTextExtractor

    pages = [
        b"<html><head><title>doc 1</title></head><body><p>plain text here</p></body></html>",
        b"<html><body><p>a &amp; b &lt;tag&gt; &#39;quoted&#39; &copy;</p></body></html>",
        b"<html><head><title>t &amp; u</title></head><body><!-- hidden --><p>vis</p></body></html>",
        b"<html><body><script type='x'>var a = '<p>no</p>';</script><p>yes</p></body></html>",
        b"<html><body><style>p { color: red }</style><p>styled</p></body></html>",
        b"<p>no body wrapper at all</p>",
        b"<html><body></body></html>",
        "<html><head><title>unicode éü</title></head><body><p>café 中文</p></body></html>".encode(),
    ]
    batch = pa.table({"html": pa.array(pages, type=pa.binary()),
                      "doc_id": pa.array(range(len(pages)), type=pa.int64())})
    ex = HtmlTextExtractor()
    fast = ex(batch)
    slow = ex._call_slow(batch)
    assert fast["extracted_text"].to_pylist() == slow["extracted_text"].to_pylist()
    assert fast["extracted_title"].to_pylist() == slow["extracted_title"].to_pylist()


def test_stem_and_fold_filters_batch_vs_python():
    """Vectorized vocab-mapped stem/fold must equal the per-row analyzer."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer, EnglishStemAnalyzer
    from lucene_ray.analysis.batch import tokenize_column

    texts = [
        "The running tables were valued by customers",
        "Café naïve relational conditional operators",
        "ponies ties caresses plastered motoring",
        "",
    ]
    for an in (EnglishStemAnalyzer, Analyzer(stem=True), Analyzer(ascii_fold=True)):
        flat, doc_idx, pos = tokenize_column(pa.array(texts), an)
        want = []
        for i, t in enumerate(texts):
            want.extend((tm, i, p) for tm, p in an.tokens_with_positions(t))
        got = list(zip(flat.to_pylist(), doc_idx.tolist(), pos.tolist()))
        assert got == want


def test_stemmed_index_end_to_end(tmp_path, ray_session):
    """Index built with EnglishStemAnalyzer: query-side normalize meets the
    stemmed dictionary ('value' and 'values' hit the same postings)."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import EnglishStemAnalyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array([
            "the value of values", "valued valuable", "no match here",
            "café cafe",
        ]),
    })
    idx = str(tmp_path / "stemidx")
    build_index(ray.data.from_arrow(t), idx, analyzer=EnglishStemAnalyzer,
                num_segments=1)
    s = Searcher(idx)
    a = s.search(s.parse("value"), k=10)
    b = s.search(s.parse("values"), k=10)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
    assert 0 in a.doc_ids.tolist() and 1 in a.doc_ids.tolist()
    # folding: café == cafe
    c = s.search(s.parse("café"), k=10)
    d = s.search(s.parse("cafe"), k=10)
    assert c.doc_ids.tolist() == d.doc_ids.tolist() == [3]


def test_synonym_injection_batch_vs_python():
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = Analyzer(synonyms=(("fast", ("quick", "rapid")), ("car", ("auto",))))
    texts = ["the fast car", "Fast, FAST cars!", "nothing here", ""]
    flat, di, pos = tokenize_column(pa.array(texts), an)
    want = []
    for i, t in enumerate(texts):
        want.extend((tm, i, p) for tm, p in an.tokens_with_positions(t))
    got = list(zip(flat.to_pylist(), di.tolist(), pos.tolist()))
    assert got == want
    # same position as source -> phrase semantics hold
    d0 = [(t, p) for t, d, p in got if d == 0]
    assert ("quick", 1) in d0 and ("rapid", 1) in d0 and ("auto", 2) in d0


def test_multiword_synonym_batch_vs_python():
    """Multi-word graph rule ("new york" -> nyc): injects at the run's
    FIRST position only for CONSECUTIVE positions (a stop-word gap breaks
    the run); batch path == per-row analyzer, offsets span the run."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = Analyzer(
        stop_words=frozenset({"the"}),
        synonyms=(("new york", ("nyc",)), ("fast", ("quick",))),
    )
    texts = [
        "i love new york pizza",      # adjacent -> inject at pos 2
        "new the york",               # gap (stopword at pos 1) -> NO inject
        "new york new york",          # two runs -> two injections
        "york new",                   # wrong order -> no inject
        "fast new york",              # both rule kinds in one doc
        "",
    ]
    flat, di, pos, st, en = tokenize_column(pa.array(texts), an, want_offsets=True)
    want = []
    for i, t in enumerate(texts):
        want.extend((tm, i, p, s, e) for tm, p, s, e in an.tokens_with_offsets(t))
    got = list(zip(flat.to_pylist(), di.tolist(), pos.tolist(),
                   st.tolist(), en.tolist()))
    assert got == want
    d0 = [(t, p) for t, d, p, _s, _e in got if d == 0]
    assert ("nyc", 2) in d0
    d1 = [t for t, d, *_ in got if d == 1]
    assert "nyc" not in d1
    d2 = [(t, p) for t, d, p, *_ in got if d == 2]
    assert ("nyc", 0) in d2 and ("nyc", 2) in d2
    assert "nyc" not in [t for t, d, *_ in got if d == 3]
    # offsets of the injected token span the whole surface run
    nyc0 = [(s, e) for t, d, p, s, e in got if d == 0 and t == "nyc"]
    assert nyc0 == [(7, 15)]  # "new york" inside "i love new york pizza"


def test_synonym_index_end_to_end(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    an = Analyzer(synonyms=(("fast", ("quick",)),))
    t = pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": pa.array(["a fast scan", "a quick scan", "slow scan"]),
    })
    idx = str(tmp_path / "syn")
    build_index(ray.data.from_arrow(t), idx, analyzer=an, num_segments=1,
                with_positions=True)
    s = Searcher(idx)
    docs, _ = s.search_all(TermQuery("quick"))
    assert set(docs.tolist()) == {0, 1}  # synonym injected for doc 0
    # phrase across the injected position
    pdocs, _ = s.search_all(PhraseQuery(("quick", "scan")))
    assert set(pdocs.tolist()) == {0, 1}


def test_edge_ngram_expansion():
    import pyarrow as pa

    from lucene_ray.analysis.ngram import expand_ngrams, token_ngrams

    assert token_ngrams("spark", 2, 4, edge=True) == ["sp", "spa", "spar"]
    assert token_ngrams("abc", 2, 3) == ["ab", "bc", "abc"]
    flat = pa.array(["spark", "go", "spark"])
    import numpy as np

    grams, gdoc = expand_ngrams(flat, np.array([0, 0, 1]), 2, 3, edge=True)
    assert grams.to_pylist() == ["sp", "spa", "go", "sp", "spa"]
    assert gdoc.tolist() == [0, 0, 0, 1, 1]


def test_query_side_parse_skips_synonym_injection(tmp_path, ray_session):
    """Index-side synonyms must NOT be injected during query analysis: a
    multi-token query stays the user's phrase, and a plain term query for
    the SOURCE term still matches (review finding r2)."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    an = Analyzer(synonyms=(("world", ("earth",)),))
    t = pa.table({
        "doc_id": pa.array(range(2), type=pa.int64()),
        "text": pa.array(["hello world", "hello earth"]),
    })
    idx = str(tmp_path / "synq")
    build_index(ray.data.from_arrow(t), idx, analyzer=an, num_segments=1,
                with_positions=True)
    s = Searcher(idx)
    q = s.parse("world")
    assert isinstance(q, TermQuery) and q.term == "world"
    assert set(s.search("world", k=10).doc_ids.tolist()) == {0}
    qp = s.parse('"hello world"')
    assert isinstance(qp, PhraseQuery) and qp.terms == ("hello", "world")
    assert set(s.search('"hello world"', k=10).doc_ids.tolist()) == {0}
    # synonym matching still works via the INDEX-side injection
    assert set(s.search("earth", k=10).doc_ids.tolist()) == {0, 1}


def test_word_delimiter_graph_filter():
    """WordDelimiterGraphFilter (miscellaneous/WordDelimiterGraphFilter
    .java:88, factory defaults): delimiter/case/letter-digit splits,
    possessive 's dropped, parts at consecutive positions, offsets point
    at each part's own slice; batch path == Python path."""
    import numpy as np
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.analysis.worddelim import wdgf_parts, wdgf_parts_offsets

    assert wdgf_parts("Wi-Fi") == ["Wi", "Fi"]
    assert wdgf_parts("PowerShot") == ["Power", "Shot"]
    assert wdgf_parts("j2se") == ["j", "2", "se"]
    assert wdgf_parts("O'Neil's") == ["O", "Neil"]
    assert wdgf_parts("500-42") == ["500", "42"]
    assert wdgf_parts("--") == []
    assert wdgf_parts("plain") == ["plain"]
    # acronym run before a camel word splits at the run boundary
    assert wdgf_parts("XMLParser") == ["XML", "Parser"]
    assert wdgf_parts("USAToday") == ["USA", "Today"]
    # possessive drops before a delimiter too, not just at token end
    assert wdgf_parts("O'Neil's-law") == ["O", "Neil", "law"]
    assert wdgf_parts_offsets("Wi-Fi") == [("Wi", 0, 2), ("Fi", 3, 5)]

    an = Analyzer(word_delimiter=True)
    texts = pa.array([
        "Wi-Fi PowerShot j2se", "O'Neil's -- plain", "", "don't STOP-now",
        "A4B x 'quoted'",
    ])
    flat, di, pos, st, en = tokenize_column(texts, an, want_offsets=True)
    got = list(zip(flat.to_pylist(), di.tolist(), pos.tolist(),
                   st.tolist(), en.tolist()))
    want = []
    for row, t in enumerate(texts.to_pylist()):
        for term, p, s, e in an.tokens_with_offsets(t):
            want.append((term, row, p, s, e))
    assert got == want
    # pure-punctuation token leaves NO gap; offsets slice the original
    oneil = [g for g in got if g[1] == 1]
    assert [g[0] for g in oneil] == ["o", "neil", "plain"]
    assert [g[2] for g in oneil] == [0, 1, 2]
    assert texts[1].as_py()[oneil[1][3]:oneil[1][4]] == "Neil"
    # stop/stem compose after the split
    an2 = Analyzer(word_delimiter=True, stop_words=frozenset({"fi"}),
                   stem=True)
    f2, _d2, p2 = tokenize_column(pa.array(["Wi-Fi Connected"]), an2)
    assert f2.to_pylist() == ["wi", "connect"]
    assert p2.tolist() == [0, 2]  # stop gap preserved
    assert [t for t, _ in an2.tokens_with_positions("Wi-Fi Connected")] \
        == ["wi", "connect"]


def test_word_delimiter_index_end_to_end(ray_session, tmp_path_factory):
    """Indexing with word_delimiter: parts are searchable terms and field
    length counts parts (norms)."""
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["Wi-Fi router setup", "wifi RouterSetup",
                          "plain words only"]),
    })
    idx = str(tmp_path_factory.mktemp("wd") / "index")
    m = build_index(ray.data.from_arrow(t), idx,
                    analyzer=Analyzer(word_delimiter=True), num_segments=1)
    # doc0 -> wi fi router setup (4), doc1 -> wifi router setup (3)
    assert m["sum_total_term_freq"] == 4 + 3 + 3
    s = Searcher(idx)
    d, _ = s.search_all(Q.TermQuery("router"))
    assert set(d.tolist()) == {0, 1}
    d2, _ = s.search_all(Q.TermQuery("wi"))
    assert set(d2.tolist()) == {0}
    # manifest round-trips the analyzer flag
    from lucene_ray.index.build import analyzer_from_manifest, load_manifest

    assert analyzer_from_manifest(load_manifest(idx)).word_delimiter


def test_length_filter():
    """LengthFilter (miscellaneous/LengthFilter.java:31): tokens outside
    [length_min, length_max] drop with position gaps, on both the batch
    and Python paths; composes with stop + stem."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = Analyzer(length_min=3, length_max=5)
    texts = pa.array(["a bb ccc dddd eeeee ffffff", "to be or not"])
    flat, di, pos = tokenize_column(texts, an)
    assert flat.to_pylist() == ["ccc", "dddd", "eeeee", "not"]
    assert pos.tolist() == [2, 3, 4, 3]  # gaps where short/long tokens sat
    assert [t for t in an.tokens("a bb ccc dddd eeeee ffffff")] \
        == ["ccc", "dddd", "eeeee"]
    assert an.tokens_with_positions("a bb ccc") == [("ccc", 2)]
    # applies BEFORE stem (the chain order documented on the field)
    an2 = Analyzer(length_min=4, stem=True)
    f2, _d, _p = tokenize_column(pa.array(["cat running"]), an2)
    assert f2.to_pylist() == ["run"]  # 'cat' dropped pre-stem; 'running' stems


def test_keyword_repeat_filter():
    """KeywordRepeatFilter + RemoveDuplicates (miscellaneous/
    KeywordRepeatFilter.java:30): original + stem at the SAME position
    when they differ, nothing doubled when identical; batch == Python."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = Analyzer(stem=True, keyword_repeat=True)
    texts = pa.array(["the running tables value", "cafe naive", ""])
    flat, di, pos = tokenize_column(texts, an)
    got = list(zip(flat.to_pylist(), di.tolist(), pos.tolist()))
    want = []
    for i, t in enumerate(texts.to_pylist()):
        want.extend((tm, i, p) for tm, p in an.tokens_with_positions(t))
    assert got == want
    d0 = [(t, p) for t, d, p in got if d == 0]
    # stem in place, original injected at the same position
    assert ("run", 1) in d0 and ("running", 1) in d0
    assert ("tabl", 2) in d0 and ("tables", 2) in d0
    # unchanged token NOT doubled ('the' stems to itself)
    assert sum(1 for t, _p in d0 if t == "the") == 1
    # flag off -> no repeats
    f2, _d, _p = tokenize_column(pa.array(["running"]), Analyzer(stem=True))
    assert f2.to_pylist() == ["run"]


def test_pattern_replace_char_filter_and_match_none():
    """PatternReplaceCharFilter (pattern/PatternReplaceCharFilter.java:40):
    pre-tokenize RE2 rewrites on both paths, chained in order; offsets
    refer to the FILTERED text (documented deviation). MatchNoDocsQuery
    matches nothing."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = Analyzer(char_filters=(
        (r"([a-z])\+\+", r"\1pp"),   # c++ -> cpp
        ("-", " "),                  # split hyphens pre-tokenize
    ))
    texts = pa.array(["use c++ now", "wi-fi setup", ""])
    flat, di, pos = tokenize_column(texts, an)
    got = list(zip(flat.to_pylist(), di.tolist(), pos.tolist()))
    want = []
    for i, t in enumerate(texts.to_pylist()):
        want.extend((tm, i, p) for tm, p in an.tokens_with_positions(t))
    assert got == want
    assert [t for t, d, _p in got if d == 0] == ["use", "cpp", "now"]
    assert [t for t, d, _p in got if d == 1] == ["wi", "fi", "setup"]
    # manifest round-trip
    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    assert analyzer_from_dict(analyzer_dict(an)) == an


def test_char_filter_slow_path_single_application():
    """Review fix: a non-idempotent char filter must apply exactly ONCE
    even for rows routed to the per-row fallback (non-ASCII)."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    an = Analyzer(char_filters=(("c", "cc"),))
    texts = pa.array(["café c", "plain c"])  # row 0 takes the slow path
    flat, di, _pos = tokenize_column(texts, an)
    got = [[] for _ in range(2)]
    for t, d in zip(flat.to_pylist(), di.tolist()):
        got[d].append(t)
    assert got[0] == [t for t, _p in an.tokens_with_positions("café c")]
    assert got[0] == ["ccafé", "cc"]
    assert got[1] == ["plain", "cc"]


def test_discount_overlaps_norms(ray_session, tmp_path_factory):
    """discountOverlaps=true (Similarity.java:151): field length counts
    unique positions, so keyword-repeat/synonym injections don't inflate
    norms; off by default the length counts every token."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index

    t = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["running tables fast"]),
    })
    idx1 = str(tmp_path_factory.mktemp("do") / "on")
    m1 = build_index(ray.data.from_arrow(t), idx1,
                     analyzer=Analyzer(stem=True, keyword_repeat=True,
                                       discount_overlaps=True),
                     num_segments=1)
    idx2 = str(tmp_path_factory.mktemp("do") / "off")
    m2 = build_index(ray.data.from_arrow(t), idx2,
                     analyzer=Analyzer(stem=True, keyword_repeat=True),
                     num_segments=1)
    # 3 base tokens; 'running'->run and 'tables'->tabl inject 2 repeats
    assert m1["sum_total_term_freq"] == 3
    assert m2["sum_total_term_freq"] == 5


def test_unicode_batch_path_matches_python():
    """Round-4: non-ASCII rows vectorize through the Unicode RE2 chain
    (batch._tokenize_unicode) instead of the per-row loop; the two paths
    must stay token/position/offset IDENTICAL (house parity pattern)."""
    import pyarrow as pa

    from lucene_ray.analysis import batch as B
    from lucene_ray.analysis.analyzers import StandardAnalyzer

    rows = [
        "Müller straße Grüße",
        "café in NFD form",                    # combining mark absorbed
        "中文处理 very good",                    # Han carve
        "don’t stop l'amour a.b.c 1,000,000",  # joiner chains
        "שלום עולם Привет мир",                # RTL + Cyrillic
        "ZWNJ‍joined so­ft",                   # format chars absorbed
        "İstanbul lowering",                   # U+0130 → per-row path
        "a ́ lone mark",                       # unattached → per-row path
        "mixed 漢字kanji text",
        "Straße. D’été, voilà!",
    ]
    col = pa.array(rows)

    # the vectorized path must actually fire for the eligible rows
    handled = {"n": 0}
    orig = B._tokenize_unicode

    def spy(texts, an, wo=False):
        handled["n"] += len(texts)
        return orig(texts, an, wo)

    B._tokenize_unicode = spy
    try:
        flat, doc, pos, st, en = B.tokenize_column(
            col, StandardAnalyzer, want_offsets=True)
    finally:
        B._tokenize_unicode = orig
    assert handled["n"] == len(rows) - 2  # İ + unattached mark go per-row

    got = {}
    for t, d, p, s, e in zip(flat.to_pylist(), doc, pos, st, en):
        got.setdefault(int(d), []).append((t, int(p), int(s), int(e)))
    for i, txt in enumerate(rows):
        want = [tuple(w) for w in StandardAnalyzer.tokens_with_offsets(txt)]
        assert got.get(i, []) == want, txt


def test_unicode_batch_path_fuzz_parity():
    """Fuzzed Unicode parity (house pattern): random mixtures of CJK,
    combining marks, format chars, joiners and RTL across batch sizes."""
    import random

    import pyarrow as pa

    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.analysis.analyzers import StandardAnalyzer as SA

    random.seed(20260818)
    pools = [
        "abc déf ü ñ 中 文 ́ ‌ ­ . , ' ’ 1 2 ÷ € § カ タ ",
        "á eु x‍ 鿿 㐀 \U00020000 İ ǅ ",
        "a . b ' c ’ , 1 2 . . ' ",
    ]
    for _trial in range(120):
        rows = ["".join(random.choice(random.choice(pools))
                        for _ in range(random.randint(0, 40)))
                for _ in range(random.randint(1, 5))]
        col = pa.array(rows)
        flat, doc, pos, st, en = tokenize_column(col, SA, want_offsets=True)
        got = {}
        for t, d, p, s, e in zip(flat.to_pylist(), doc, pos, st, en):
            got.setdefault(int(d), []).append((t, int(p), int(s), int(e)))
        for i, txt in enumerate(rows):
            want = [tuple(w) for w in SA.tokens_with_offsets(txt)]
            assert got.get(i, []) == want, repr(txt)


def test_phonetic_encoders_golden():
    """Soundex (Russell/Odell, commons-codec vectors incl. the
    transparent-H/W cases) and NYSIIS (Taft 1970) golden vectors."""
    from lucene_ray.analysis.phonetic import encode, nysiis, soundex

    for w, want in {"robert": "R163", "rupert": "R163",
                    "ashcraft": "A261", "ashcroft": "A261",
                    "tymczak": "T522", "pfister": "P236",
                    "honeyman": "H555", "smith": "S530", "smyth": "S530",
                    "lee": "L000", "jackson": "J250"}.items():
        assert soundex(w) == want, (w, soundex(w))
    for w, want in {"bridgewater": "BRADGATAR", "brown": "BRAN",
                    "macdonald": "MCDANALD", "knight": "NAGT",
                    "smith": "SNAT", "schmidt": "SNAD",
                    "phillipson": "FALAPSAN", "mitchell": "MATCAL"}.items():
        assert nysiis(w) == want, (w, nysiis(w))
    assert soundex("123") == "123"  # non-alpha passes through
    import pytest

    with pytest.raises(ValueError):
        encode("x", "beidermorse")  # not implemented


def test_phonetic_and_icu_fold_analyzer_plumbing():
    """PhoneticFilter inject via keyword_repeat; ICU fold folds
    accents/case/width; both round-trip the manifest and keep batch ==
    per-row parity (house pattern)."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    ph = Analyzer(phonetic="soundex", keyword_repeat=True)
    toks = ph.tokens("smith smyth")
    assert toks == ["S530", "S530", "smith", "smyth"]  # codes + surfaces
    assert analyzer_from_dict(analyzer_dict(ph)).phonetic == "soundex"

    icu = Analyzer(icu_fold=True)
    assert icu.transform_token("Café") == "cafe"
    assert icu.transform_token("ＣＡＦＥ") == "cafe"  # NFKC width fold
    assert icu.transform_token("straße") == "strasse"  # ß casefold
    assert analyzer_from_dict(analyzer_dict(icu)).icu_fold

    for an in (ph, icu):
        rows = ["smith called café", "Smyth STRAßE here"]
        flat, doc, _p = tokenize_column(pa.array(rows), an)
        got = {}
        for t, d in zip(flat.to_pylist(), doc):
            got.setdefault(int(d), []).append(t)
        for i, txt in enumerate(rows):
            assert got.get(i, []) == an.tokens(txt), (an, txt)


def test_compound_word_decomposition():
    """DictionaryCompoundWordTokenFilter (compound/
    DictionaryCompoundWordTokenFilter.java:40): subwords inject at the
    compound's position; min/max sizes, only-longest mode, manifest
    round-trip and batch parity."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.analysis.compound import decompose
    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    d = frozenset({"dampf", "schiff", "fahrt", "wein", "schwein"})
    assert decompose("dampfschifffahrt", d) == ["dampf", "schiff", "fahrt"]
    assert decompose("kurz", d) == []  # below min_word
    # 'schwein' contains 'wein': all matches vs only-longest per start
    assert decompose("hausschwein", d) == ["schwein", "wein"]
    assert decompose("hausschwein", d, only_longest=True) == \
        ["schwein", "wein"]  # longest per START offset; wein starts later

    an = Analyzer(compound_dict=tuple(sorted(d)))
    toks = an.tokens("die dampfschifffahrt beginnt")
    assert toks == ["die", "dampfschifffahrt", "beginnt",
                    "dampf", "schiff", "fahrt"]
    tp = an.tokens_with_positions("die dampfschifffahrt")
    assert ("dampf", 1) in tp and ("schiff", 1) in tp  # same position

    b = analyzer_from_dict(analyzer_dict(an))
    assert b.compound_dict == an.compound_dict

    rows = ["die dampfschifffahrt beginnt", "ein hausschwein hier",
            "la dampfschifffahrt arrivée"]  # non-ASCII row: unicode path
    flat, doc, pos = tokenize_column(pa.array(rows), an)
    got = {}
    for t, dd, p in zip(flat.to_pylist(), doc, pos):
        got.setdefault(int(dd), []).append((t, int(p)))
    for i, txt in enumerate(rows):
        assert got.get(i, []) == an.tokens_with_positions(txt), txt


def test_common_grams_filter_and_query_rewrite():
    """CommonGramsFilter + CommonGramsQueryFilter (commongrams/
    CommonGramsFilter.java:63, CommonGramsQueryFilter.java:64): grams
    inject beside unigrams at index time; the query rewrite outputs
    bigrams whenever possible (the javadoc example, order included);
    batch == per-row parity."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import (Analyzer,
                                               common_grams_query)
    from lucene_ray.analysis.batch import tokenize_column

    common = ("the", "in", "of")
    an = Analyzer(common_grams=common)
    tp = an.tokens_with_positions("the rain in spain falls")
    assert ("the_rain", 0) in tp and ("rain_in", 1) in tp \
        and ("in_spain", 2) in tp
    assert ("rain", 1) in tp and ("falls", 4) in tp  # unigrams kept

    # the reference javadoc example, including order
    toks = "the rain in spain falls mainly".split()
    assert common_grams_query(toks, frozenset(common)) == [
        "the_rain", "rain_in", "in_spain", "falls", "mainly"]

    rows = ["the rain in spain falls", "no common words here",
            "thé rain in späin"]  # non-ASCII row exercises unicode path
    flat, doc, pos, st, en = tokenize_column(pa.array(rows), an,
                                             want_offsets=True)
    got = {}
    for t, d, p, s, e in zip(flat.to_pylist(), doc, pos, st, en):
        got.setdefault(int(d), []).append((t, int(p), int(s), int(e)))
    for i, txt in enumerate(rows):
        assert got.get(i, []) == an.tokens_with_offsets(txt), txt

    import pytest

    with pytest.raises(ValueError):
        Analyzer(common_grams=common, keyword_repeat=True)


def test_icu_normalize_filter_parity_and_semantics():
    """ICUNormalizer2Filter role (Analyzer.icu_normalize): fuzzed
    combining sequences normalize identically through the per-row
    Analyzer and the vocabulary-mapped batch path, and nfkc_cf unifies
    compatibility variants + case WITHOUT stripping marks."""
    import random
    import unicodedata

    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    a_cf = Analyzer(icu_normalize="nfkc_cf")
    # compatibility + case unification, marks kept
    assert a_cf.tokens("Ｔａｂｌｅ") == ["table"]
    assert a_cf.tokens("ﬁre") == ["fire"]            # ligature
    assert a_cf.tokens("café") == ["café"]  # NFD -> NFC, accent kept
    a_nfc = Analyzer(icu_normalize="nfc")
    assert a_nfc.tokens("café") == ["café"]  # NFD input composes
    # idempotence (a closed normalizer)
    for w in ("İstanbul", "ΣΊΣΥΦΟΣ", "ǅungla", "ẛ"):
        once = a_cf.transform_token(w)
        assert a_cf.transform_token(once) == once

    random.seed(20260818)
    pool = "é å ﬁ Ｋ 中 ½ é Å x ' ."
    toks_pool = pool.split(" ")
    for _ in range(60):
        rows = [" ".join(random.choice(toks_pool)
                         for _ in range(random.randint(0, 12)))
                for _ in range(random.randint(1, 4))]
        col = pa.array(rows)
        flat, doc, pos = tokenize_column(col, a_cf)[:3]
        got = {}
        for t, d, p in zip(flat.to_pylist(), doc, pos):
            got.setdefault(int(d), []).append((t, int(p)))
        for i, txt in enumerate(rows):
            want = [tuple(w) for w in a_cf.tokens_with_positions(txt)]
            assert got.get(i, []) == want, repr(txt)
        for t in flat.to_pylist():
            assert unicodedata.is_normalized("NFKC", t), repr(t)


def test_japanese_segmentation():
    """Kuromoji JapaneseTokenizer role (analysis/japanese.py): Viterbi
    lattice golden vectors, char-class unknown grouping, offsets,
    analyzer routing, manifest round-trip and batch/per-row parity."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import analyzer_for_lang
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.analysis.japanese import (ja_tokenize,
                                              ja_tokenize_with_offsets)

    assert ja_tokenize("東京都に住んでいます") == \
        ["東京", "都", "に", "住んで", "います"]
    assert ja_tokenize("日本語の検索エンジンを作った") == \
        ["日本", "語", "の", "検索", "エンジン", "を", "作った"]
    assert ja_tokenize("京都府と大阪市") == ["京都", "府", "と", "大阪", "市"]
    # unknown-word runs: katakana, latin and digits group; punctuation
    # and whitespace drop
    assert ja_tokenize("カタカナとABC123の混在") == \
        ["カタカナ", "と", "ABC", "123", "の", "混在"]
    assert ja_tokenize("") == []
    assert ja_tokenize("。、！") == []
    # offsets span the surface forms
    assert ja_tokenize_with_offsets("東京都に 住む。") == \
        [("東京", 0, 2), ("都", 2, 3), ("に", 3, 4), ("住む", 5, 7)]

    a = analyzer_for_lang("ja")
    assert a.ja_segment
    # lowercase still applies to embedded latin
    assert a.tokens("東京のABC") == ["東京", "の", "abc"]

    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    assert analyzer_from_dict(analyzer_dict(a)).ja_segment

    texts = ["東京都に住んでいます", "日本語の検索エンジン",
             "Hello 世界 ABC", "", "私は毎日電車で会社に行きます"]
    flat, d, p, s, e = tokenize_column(pa.array(texts), a,
                                       want_offsets=True)
    got = {}
    for t, dd, pp, ss, ee in zip(flat.to_pylist(), d, p, s, e):
        got.setdefault(int(dd), []).append((t, int(pp), int(ss), int(ee)))
    for i, txt in enumerate(texts):
        want = [tuple(w) for w in a.tokens_with_offsets(txt)]
        assert got.get(i, []) == want, (i, txt)


def test_korean_segmentation():
    """Nori KoreanTokenizer + KoreanPartOfSpeechStopFilter roles
    (analysis/korean.py): lattice golden vectors, josa/eomi POS drop,
    offsets, analyzer routing, manifest round-trip, batch parity."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import analyzer_for_lang
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.analysis.korean import (ko_tokenize,
                                            ko_tokenize_with_offsets)

    # particles (josa) and verb endings (eomi) are consumed by the
    # lattice and dropped — the default POS stop set
    assert ko_tokenize("학교에서 학생이 공부합니다") == ["학교", "학생", "공부"]
    assert ko_tokenize("한국의 검색 엔진") == ["한국", "검색", "엔진"]
    # 있습니다 = 있 (existence-verb stem, kept) + 습니다 (ending, dropped)
    assert ko_tokenize("서울에 살고 있습니다") == ["서울", "살", "있"]
    # latin/digit runs group whole; punctuation/whitespace drop
    assert ko_tokenize("ABC 123 서울!") == ["ABC", "123", "서울"]
    assert ko_tokenize("") == []
    # offsets span the SURFACE of surviving morphemes
    assert ko_tokenize_with_offsets("학교에서 일") == \
        [("학교", 0, 2), ("일", 5, 6)]
    # an eojeol-initial josa surface prefers the content reading
    assert "은" not in set("".join(ko_tokenize("은행에 갔다"))) or \
        ko_tokenize("은행에 갔다")[0].startswith("은")

    a = analyzer_for_lang("ko")
    assert a.segment_lang == "ko" and a.effective_segment_lang == "ko"
    assert a.tokens("서울의 ABC") == ["서울", "abc"]

    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    assert analyzer_from_dict(analyzer_dict(a)).segment_lang == "ko"

    texts = ["학교에서 학생이 공부합니다", "한국의 검색 엔진",
             "Hello 세계 ABC", "", "회사원은 매일 지하철로 출근합니다"]
    flat, d, p, s, e = tokenize_column(pa.array(texts), a, want_offsets=True)
    got = {}
    for t, dd, pp, ss, ee in zip(flat.to_pylist(), d, p, s, e):
        got.setdefault(int(dd), []).append((t, int(pp), int(ss), int(ee)))
    for i, txt in enumerate(texts):
        want = [tuple(w) for w in a.tokens_with_offsets(txt)]
        assert got.get(i, []) == want, (i, txt)


def test_chinese_segmentation():
    """Smartcn HMMChineseTokenizer role (analysis/chinese.py): lattice
    golden vectors, per-Hanzi OOV fallback, offsets, analyzer routing,
    manifest round-trip, batch parity."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import analyzer_for_lang
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.analysis.chinese import (zh_tokenize,
                                             zh_tokenize_with_offsets)

    assert zh_tokenize("中文处理和搜索引擎") == \
        ["中文", "处理", "和", "搜索", "引擎"]
    assert zh_tokenize("我们在北京工作") == ["我们", "在", "北京", "工作"]
    # unknown Hanzi fall out per character (smartcn OOV behavior)
    assert zh_tokenize("氢氦锂铍") == ["氢", "氦", "锂", "铍"]
    assert zh_tokenize("ABC 123 中国!") == ["ABC", "123", "中国"]
    assert zh_tokenize("") == []
    assert zh_tokenize_with_offsets("中文处理") == \
        [("中文", 0, 2), ("处理", 2, 4)]

    a = analyzer_for_lang("zh")
    assert a.segment_lang == "zh"
    assert a.tokens("中国的ABC") == ["中国", "的", "abc"]

    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    assert analyzer_from_dict(analyzer_dict(a)).segment_lang == "zh"

    texts = ["中文处理和搜索引擎技术", "我们在北京工作",
             "Hello 世界 ABC", "", "机器学习模型的开发"]
    flat, d, p, s, e = tokenize_column(pa.array(texts), a, want_offsets=True)
    got = {}
    for t, dd, pp, ss, ee in zip(flat.to_pylist(), d, p, s, e):
        got.setdefault(int(dd), []).append((t, int(pp), int(ss), int(ee)))
    for i, txt in enumerate(texts):
        want = [tuple(w) for w in a.tokens_with_offsets(txt)]
        assert got.get(i, []) == want, (i, txt)


def test_cjk_bigram_filter():
    """CJKBigramFilter role (cjk/CJKBigramFilter.java:66): Han unigram
    runs re-emit as overlapping bigrams replacing the unigrams
    (outputUnigrams=false default); lone Han chars stay unigrams;
    positions renumber sequentially; batch parity; config validation."""
    import pyarrow as pa
    import pytest

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    a = Analyzer(cjk_bigrams=True)
    assert a.tokens("一二三") == ["一二", "二三"]
    assert a.tokens("一") == ["一"]
    # non-Han tokens break runs and pass through; positions compact
    assert a.tokens_with_positions("一二三 x 四五") == \
        [("一二", 0), ("二三", 1), ("x", 2), ("四五", 3)]
    # offsets span both chars of the bigram
    assert a.tokens_with_offsets("中文处理")[:2] == \
        [("中文", 0, 0, 2), ("文处", 1, 1, 3)]
    # punctuation emits no token and no position gap in the tokenizer,
    # so the bigram DOES form across it (the reference stream behaves
    # the same way — 中 and 文 are consecutive HAN tokens)
    assert a.tokens("中、文") == ["中文"]
    # latin mixed in
    assert a.tokens("hello 世界") == ["hello", "世界"]

    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    assert analyzer_from_dict(analyzer_dict(a)).cjk_bigrams

    with pytest.raises(ValueError):
        Analyzer(cjk_bigrams=True, ja_segment=True)
    with pytest.raises(ValueError):
        Analyzer(cjk_bigrams=True, word_delimiter=True)
    with pytest.raises(ValueError):
        Analyzer(ja_segment=True, segment_lang="ko")

    texts = ["中文处理和搜索", "一二三 x 四五", "hello 世界", "", "中、文"]
    flat, d, p, s, e = tokenize_column(pa.array(texts), a, want_offsets=True)
    got = {}
    for t, dd, pp, ss, ee in zip(flat.to_pylist(), d, p, s, e):
        got.setdefault(int(dd), []).append((t, int(pp), int(ss), int(ee)))
    for i, txt in enumerate(texts):
        want = [tuple(w) for w in a.tokens_with_offsets(txt)]
        assert got.get(i, []) == want, (i, txt)


def test_uax29_urlemail_tokenizer_golden():
    """UAX29URLEmailTokenizer role (standard/UAX29URLEmailTokenizer
    .java:52): URL and EMAIL productions emit as single tokens; gaps run
    the standard UAX#29 chain; trailing sentence punctuation trims off a
    URL; matches anchor at word-break boundaries."""
    from lucene_ray.analysis.analyzers import Analyzer

    a = Analyzer(url_email=True)
    assert a.tokens(
        "Visit https://Site3.Example.com/p1 contact "
        "User2@Mail.example.org ok") == [
        "visit", "https://site3.example.com/p1", "contact",
        "user2@mail.example.org", "ok"]
    # scheme-less www. authority; query+fragment swallowed; trailing
    # punctuation excluded
    assert a.tokens("see www.foo-bar.com. and http://a.com/x?q=1#frag, "
                    "done") == [
        "see", "www.foo-bar.com", "and", "http://a.com/x?q=1#frag", "done"]
    assert a.tokens("trailing http://a.com/x.") == [
        "trailing", "http://a.com/x"]
    # RFC 5321 dot-atom local parts with atext specials
    assert a.tokens("email first.last+tag@sub.domain.co.uk!") == [
        "email", "first.last+tag@sub.domain.co.uk"]
    # word-boundary anchoring: a letter glued to the scheme keeps the
    # word-chain reading
    assert a.tokens("xhttps://a.com but ftp://h.io/z ok") == [
        "xhttps", "a.com", "but", "ftp://h.io/z", "ok"]
    # port survives; bare 'www.' is not a URL
    assert a.tokens("port http://h.example:8080/p and www. dot") == [
        "port", "http://h.example:8080/p", "and", "www", "dot"]
    # offsets span the original (pre-lowercase) surface form
    assert a.tokens_with_offsets("At Http://A.com/Z end") == [
        ("at", 0, 0, 2), ("http://a.com/z", 1, 3, 17), ("end", 2, 18, 21)]


def test_uax29_urlemail_batch_parity_and_routing():
    """Batch path: rows without a scheme/www./atext@ hint go down the
    ordinary vectorized chain; candidate rows pay the per-row scan; the
    stitched stream matches the per-row analyzer exactly (including
    stop/stem filters, nulls and unicode rows)."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    a = Analyzer(url_email=True, stop_words=frozenset({"and"}), stem=True)
    rows = [
        "Visit https://Site3.Example.com/p1 contact User2@Mail.example.org",
        "plain running words only here",
        None,
        "see www.foo-bar.com. and http://a.com/x?q=1#frag, done",
        "",
        "café résumé naïve",
        "unicode café at http://cafe-host.com nope but admin@x.org yes",
        "numbers 1,000.5 and b.com style",
    ]
    texts = pa.array(rows, type=pa.string())
    flat, doc, pos, st, en = tokenize_column(texts, a, want_offsets=True)
    exp = [(i, t, p, s, e) for i, r in enumerate(rows)
           for t, p, s, e in a.tokens_with_offsets(r or "")]
    got = list(zip(doc.tolist(), flat.to_pylist(), pos.tolist(),
                   st.tolist(), en.tolist()))
    assert got == exp
    # all-plain batch short-circuits to the vectorized path and still
    # agrees with the per-row stream
    plain = pa.array(["plain words", "more words here"] * 50)
    f2, d2, p2 = tokenize_column(plain, a)
    exp2 = [(i, t, p) for i in range(len(plain))
            for t, p in a.tokens_with_positions(plain[i].as_py())]
    assert list(zip(d2.tolist(), f2.to_pylist(), p2.tolist())) == exp2


def test_uax29_urlemail_conflicts():
    import pytest

    from lucene_ray.analysis.analyzers import Analyzer

    with pytest.raises(ValueError):
        Analyzer(url_email=True, word_delimiter=True)
    with pytest.raises(ValueError):
        Analyzer(url_email=True, segment_lang="ja")


def test_reverse_string_filter_and_leading_wildcard_rewrite():
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java:44)
    + the reversed-wildcard serving rewrite: a pure leading wildcard
    becomes a PrefixQuery over the reversed field; anything else falls
    back to WildcardQuery."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.search import query as Q

    a = Analyzer(reverse_tokens=True)
    assert a.tokens("Table stable BLEND") == ["elbat", "elbats", "dnelb"]
    # filter chain order: reverse runs LAST (after stem)
    s = Analyzer(reverse_tokens=True, stem=True)
    assert s.tokens("running") == ["nur"]
    # batch path parity (vocabulary-mapped like every token filter)
    flat, _d, _p = tokenize_column(
        pa.array(["Table stable", "BLEND go"]), a)
    assert flat.to_pylist() == ["elbat", "elbats", "dnelb", "og"]

    rq = Q.rewrite_leading_wildcard("*ble", "rev")
    assert isinstance(rq, Q.PrefixQuery)
    assert rq.prefix == "elb" and rq.field == "rev"
    for pat in ("s?ow", "*b?e", "ta*le", "*"):
        fq = Q.rewrite_leading_wildcard(pat, "rev")
        assert isinstance(fq, Q.WildcardQuery) and fq.pattern == pat


def test_alternative_tokenizers_golden():
    """core/WhitespaceTokenizer.java:28, core/LetterTokenizer.java:29,
    core/KeywordTokenizer.java:28, path/PathHierarchyTokenizer.java:40,
    pattern/PatternTokenizer.java:53 — golden streams, matching the
    reference's published test vectors where cited."""
    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.tokenizer import \
        path_hierarchy_tokenize_with_offsets as path_tok

    assert Analyzer(tokenizer="whitespace").tokens("Foo  bar-Baz q9x") == [
        "foo", "bar-baz", "q9x"]
    assert Analyzer(tokenizer="letter").tokens("foo2Bar x_y café") == [
        "foo", "bar", "x", "y", "café"]
    assert Analyzer(tokenizer="keyword").tokens("One Whole Token") == [
        "one whole token"]
    # PathHierarchyTokenizer reference vectors
    # (TestPathHierarchyTokenizer: testBasicPath / testEndOfDelimiter /
    # testBasicSkip): all prefixes, trailing delimiter kept, skip drops
    # leading components
    assert [t for t, *_ in path_tok("/a/b/c")] == ["/a", "/a/b", "/a/b/c"]
    assert [t for t, *_ in path_tok("/a/b/c/")] == [
        "/a", "/a/b", "/a/b/c", "/a/b/c/"]
    assert [t for t, *_ in path_tok("/a/b/c", skip=1)] == ["/b", "/b/c"]
    assert [t for t, *_ in path_tok("/a/b", replacement="-")] == [
        "-a", "-a-b"]
    # every prefix shares position 0 (posInc 0 after the first)
    assert [p for _t, p, *_ in path_tok("/a/b/c")] == [0, 0, 0]
    # PatternTokenizer: split mode and group mode
    pat = Analyzer(tokenizer="pattern", tokenizer_pattern=(";", -1))
    assert pat.tokens("a;b;;c") == ["a", "b", "c"]
    grp = Analyzer(tokenizer="pattern",
                   tokenizer_pattern=(r"'([^']*)'", 1))
    assert grp.tokens("'quoted' and 'more'") == ["quoted", "more"]


def test_alternative_tokenizers_batch_parity():
    """Batch path parity for every alt tokenizer, offsets and not —
    incl. nulls, empties, over-long runs (chopping) and İ rows (the
    utf8_lower divergence routes per-row)."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    cases = {
        "whitespace": (Analyzer(tokenizer="whitespace",
                                stop_words=frozenset({"and"})),
                       ["Foo  bar-Baz and Q", None, "",
                        "İstanbul tricky ẞ case", "a " * 300, "x" * 300]),
        "letter": (Analyzer(tokenizer="letter", stem=True),
                   ["foo2Bar running café x_y", "", None, "İstanbul",
                    "y" * 300]),
        "keyword": (Analyzer(tokenizer="keyword"),
                    ["One Whole Token", "", None, "another doc"]),
        "keyword_i": (Analyzer(tokenizer="keyword"),
                      ["İstanbul doc", "plain"]),
        "path": (Analyzer(tokenizer="path_hierarchy", lowercase=False),
                 ["/a/b/c", "a/b/c/", "", None, "/x"]),
        "pattern": (Analyzer(tokenizer="pattern",
                             tokenizer_pattern=(";", -1)),
                    ["a;b;;c", "", None, "xx;yy"]),
    }
    for name, (a, rows) in cases.items():
        texts = pa.array(rows, type=pa.string())
        for wo in (False, True):
            res = tokenize_column(texts, a, want_offsets=wo)
            exp = [(i, t, p, s, e) if wo else (i, t, p)
                   for i, r in enumerate(rows)
                   for t, p, s, e in a.tokens_with_offsets(r or "")]
            if wo:
                got = list(zip(res[1].tolist(), res[0].to_pylist(),
                               res[2].tolist(), res[3].tolist(),
                               res[4].tolist()))
            else:
                got = list(zip(res[1].tolist(), res[0].to_pylist(),
                               res[2].tolist()))
            assert got == exp, (name, wo)


def test_alternative_tokenizer_conflicts():
    import pytest

    from lucene_ray.analysis.analyzers import Analyzer

    with pytest.raises(ValueError):
        Analyzer(tokenizer="nope")
    with pytest.raises(ValueError):
        Analyzer(tokenizer="pattern")  # needs tokenizer_pattern
    with pytest.raises(ValueError):
        Analyzer(tokenizer="keyword", word_delimiter=True)


def test_phonetic_round5_encoders_golden():
    """Metaphone (Philips 1990), Refined Soundex and Caverphone 2.0
    (Hood 2004) against published test vectors."""
    from lucene_ray.analysis.phonetic import (caverphone2, encode,
                                              metaphone, refined_soundex)

    # the commons-codec Metaphone doc sentence
    sent = {"The": "0", "quick": "KK", "brown": "BRN", "fox": "FKS",
            "jumped": "JMPT", "over": "OFR", "lazy": "LS", "dogs": "TKS"}
    for w, c in sent.items():
        assert metaphone(w) == c, w
    assert metaphone("knight") == metaphone("night") == "NT"
    assert metaphone("phone") == "FN"
    assert metaphone("school") == "SKL"   # SCH hard K
    assert metaphone("tough") == "T"      # final GH silent
    assert metaphone("xavier") == "SFR"   # initial X -> S
    assert metaphone("she") == "X"
    assert metaphone("judge") == "JJ"
    assert metaphone("testing") == "TSTN"  # 4-char cap

    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    # adjacent equal codes collapse, vowels keep their 0
    assert refined_soundex("smith") == refined_soundex("smyth")

    # Caverphone 2.0 spec examples (Hood 2004)
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Thompson") == "TMPSN11111"
    assert caverphone2("Stephenson") == caverphone2("Stevenson")
    # all three are reachable through the analyzer chain
    from lucene_ray.analysis.analyzers import Analyzer

    a = Analyzer(phonetic="metaphone")
    assert a.tokens("quick brown") == ["KK", "BRN"]
    assert encode("tabel", "caverphone2") == caverphone2("tabel")


def test_mapping_char_filter():
    """MappingCharFilter (charfilter/MappingCharFilter.java:44): one
    simultaneous longest-match pass, no re-scan of replacement output;
    batch path matches per-row; nulls tokenize as empty docs."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer, StandardAnalyzer
    from lucene_ray.analysis.batch import tokenize_column

    a = Analyzer(mapping_char_filter=(
        ("table", "tbl"), ("tab", "x"), ("ß", "ss")))
    # longest match wins at each position
    assert a.tokens("tab tabs tables") == ["x", "xs", "tbls"]
    assert a.tokens("straße") == ["strasse"]
    # no re-scan: a replacement output never re-matches
    b = Analyzer(mapping_char_filter=(("ab", "ba"),))
    assert b.tokens("aab") == ["aba"]
    rows = ["the table is set", "tab and tabs", None, "",
            "straße table", "plain words"]
    texts = pa.array(rows, type=pa.string())
    res = tokenize_column(texts, a)
    exp = [(i, t, p) for i, r in enumerate(rows)
           for t, p in a.tokens_with_positions(r or "")]
    assert list(zip(res[1].tolist(), res[0].to_pylist(),
                    res[2].tolist())) == exp
    # regression: nulls through the mixed ASCII/Unicode stitch path
    res2 = tokenize_column(pa.array(["straße café", None, "plain"]),
                           StandardAnalyzer)
    assert res2[0].to_pylist() == ["straße", "café", "plain"]
    # mapping + regex char filters chain in order (mapping first)
    c = Analyzer(mapping_char_filter=(("q", "k"),),
                 char_filters=((r"k+", "k"),))
    assert c.tokens("qk qq") == ["k", "k"]


def test_solr_synonym_parser():
    """SolrSynonymParser.java:33: equivalence classes (expand on/off),
    explicit mappings, comments, escapes, multi-word rules."""
    from lucene_ray.analysis.synparse import parse_solr_synonyms

    t = parse_solr_synonyms(
        "# comment line\n"
        "\n"
        "fast, quick, rapid\n"
        "new york => nyc\n"
        "a\\, b => c\n")
    d = dict(t)
    assert d["fast"] == ("quick", "rapid")
    assert d["quick"] == ("fast", "rapid")
    assert d["new york"] == ("nyc",)
    assert d["a, b"] == ("c",)
    ne = parse_solr_synonyms("fast, quick, rapid\n", expand=False)
    assert dict(ne) == {"quick": ("fast",), "rapid": ("fast",)}
    # single-member class is a no-op, like the reference
    assert parse_solr_synonyms("alone\n") == ()


def test_wordnet_synonym_parser():
    from lucene_ray.analysis.synparse import parse_wordnet_synonyms

    w = parse_wordnet_synonyms(
        "s(100001,1,'fast',a,1,0).\n"
        "s(100001,2,'quick',a,1,0).\n"
        "s(100002,1,'it''s',n,1,0).\n"
        "s(100003,1,'new_york',n,1,0).\n"
        "s(100003,2,'nyc',n,1,0).\n"
        "junk line\n")
    d = dict(w)
    assert d["fast"] == ("quick",) and d["quick"] == ("fast",)
    assert d["new york"] == ("nyc",) and d["nyc"] == ("new york",)
    assert "it's" not in d  # single-member synset drops


def test_parsed_synonyms_drive_analyzer():
    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.synparse import parse_solr_synonyms

    an = Analyzer(synonyms=parse_solr_synonyms("fast => quick\n"))
    assert "quick" in an.tokens("a fast scan")
