"""Round-5 token-filter wave: ElisionFilter, DecimalDigitFilter,
ScandinavianNormalization/FoldingFilter, TruncateTokenFilter,
KeepWordFilter (analysis/analyzers.py flags + analysis/stem.py kernels)
and the FingerprintFilter dedup pipeline (pipelines/dedup.py) — golden
vectors from the reference filter javadocs, batch/per-row parity, the
manifest round-trip, and the fingerprint grouping semantics."""

import pyarrow as pa
import pytest

from lucene_ray.analysis.analyzers import Analyzer, analyzer_for_lang
from lucene_ray.analysis.batch import tokenize_column
from lucene_ray.analysis.stem import (decimal_digit_fold, elide,
                                      scandinavian_fold_token,
                                      scandinavian_normalize_token)

FR_ARTICLES = frozenset(
    ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"))


class TestElision:
    def test_golden(self):
        # ElisionFilter.java:35 — strip "article'" prefixes
        assert elide("l'avion", FR_ARTICLES) == "avion"
        assert elide("qu'elle", FR_ARTICLES) == "elle"
        assert elide("jusqu'au", FR_ARTICLES) == "au"
        # typographic apostrophe U+2019 counts too
        assert elide("l’école", FR_ARTICLES) == "école"
        # non-article prefix keeps the token whole
        assert elide("aujourd'hui", FR_ARTICLES) == "aujourd'hui"
        # no apostrophe: unchanged
        assert elide("avion", FR_ARTICLES) == "avion"
        # only the FIRST apostrophe is considered
        assert elide("l'an'vieux", FR_ARTICLES) == "an'vieux"

    def test_french_route(self):
        an = analyzer_for_lang("fr")
        # l'école -> école -> Snowball(fr) stem; the stream must equal
        # the elided surface form fed through the same chain
        assert an.tokens("l'école est grande") == an.tokens(
            "école est grande")
        assert an.tokens("l'avion") == an.tokens("avion")
        # and differ from the unelided token
        assert Analyzer(stem_lang="fr").tokens("l'avion") != an.tokens(
            "l'avion")

    def test_italian_route(self):
        an = analyzer_for_lang("it")
        assert an.tokens("dell'arte moderna") == an.tokens("arte moderna")


class TestDecimalDigit:
    def test_golden(self):
        # DecimalDigitFilter.java:31 — every Nd digit folds to ASCII
        assert decimal_digit_fold("٣٤٥") == "345"        # Arabic-Indic
        assert decimal_digit_fold("३४५") == "345"        # Devanagari
        assert decimal_digit_fold("７７") == "77"         # fullwidth
        assert decimal_digit_fold("৯৯") == "99"          # Bengali
        assert decimal_digit_fold("room٥a") == "room5a"  # mixed in place
        assert decimal_digit_fold("abc123") == "abc123"  # ASCII fast path
        assert decimal_digit_fold("Ⅻ") == "Ⅻ"            # Roman: No, not Nd

    def test_analyzer_meets_at_one_term(self):
        an = Analyzer(decimal_digit=True)
        assert (an.tokens("room ٣٤٥") == an.tokens("room 345")
                == an.tokens("room ３４５") == ["room", "345"])


class TestScandinavian:
    def test_normalize_golden(self):
        # ScandinavianNormalizer.java:28 ALL_FOLDINGS
        assert scandinavian_normalize_token("blåbärsyltetöj") \
            == "blåbærsyltetøj"
        assert scandinavian_normalize_token("blaabaersyltetoej") \
            == "blåbærsyltetøj"
        assert scandinavian_normalize_token("smoergaas") == "smørgås"
        assert scandinavian_normalize_token("aokande") == "åkande"  # ao
        assert scandinavian_normalize_token("roo") == "rø"          # oo
        # case preserved
        assert scandinavian_normalize_token("Äpple") == "Æpple"
        assert scandinavian_normalize_token("AEble") == "Æble"
        # untouched letters stay
        assert scandinavian_normalize_token("bord") == "bord"

    def test_fold_golden(self):
        # ScandinavianFoldingFilter.java:38 — normalize then flatten
        assert scandinavian_fold_token("räksmörgås") == "raksmorgas"
        assert scandinavian_fold_token("blåbær") == "blabar"
        assert scandinavian_fold_token("blaabaer") == "blabar"
        assert scandinavian_fold_token("Østergade") == "Ostergade"

    def test_analyzer_meets_at_one_term(self):
        an = Analyzer(scandinavian="normalize")
        assert (an.tokens("blåbær") == an.tokens("blåbär")
                == an.tokens("blaabaer") == ["blåbær"])
        af = Analyzer(scandinavian="fold")
        assert af.tokens("räksmörgås") == af.tokens("raksmorgas") \
            == ["raksmorgas"]


class TestTruncateAndKeep:
    def test_truncate(self):
        # TruncateTokenFilter.java:28 — prefix-only crude stemmer
        an = Analyzer(truncate_length=4)
        assert an.tokens("information informing inform in") \
            == ["info", "info", "info", "in"]

    def test_truncate_runs_after_stem(self):
        an = Analyzer(stem=True, truncate_length=3)
        # porter: "running" -> "run"; truncate leaves it; "coordinates"
        # -> "coordin" -> "coo"
        assert an.tokens("running coordinates") == ["run", "coo"]

    def test_keep_words_with_position_gaps(self):
        # KeepWordFilter.java:27 — inverse StopFilter, gaps like stop
        an = Analyzer(keep_words=frozenset({"quick", "fox"}))
        assert an.tokens("the quick brown fox jumps") == ["quick", "fox"]
        wp = an.tokens_with_positions("the quick brown fox jumps")
        assert wp == [("quick", 1), ("fox", 3)]

    def test_keep_words_batch_parity(self):
        an = Analyzer(keep_words=frozenset({"quick", "fox", "345"}),
                      decimal_digit=True)
        texts = ["the quick brown fox", "room ٣٤٥ is open", "", "no hits"]
        flat, doc_idx, pos = tokenize_column(pa.array(texts), an)
        got = {}
        for t, d, p in zip(flat.to_pylist(), doc_idx, pos):
            got.setdefault(int(d), []).append((t, int(p)))
        for i, txt in enumerate(texts):
            assert got.get(i, []) == an.tokens_with_positions(txt), txt


@pytest.mark.parametrize("an", [
    Analyzer(elision=tuple(sorted(FR_ARTICLES)), stem_lang="fr"),
    Analyzer(decimal_digit=True),
    Analyzer(scandinavian="normalize"),
    Analyzer(scandinavian="fold"),
    Analyzer(truncate_length=4),
    Analyzer(keep_words=frozenset({"blåbær", "345", "l", "école"}),
             decimal_digit=True, scandinavian="normalize"),
])
def test_batch_per_row_parity(an):
    """House parity pattern: the vectorized tokenize_column stream must
    equal the per-row Analyzer.tokens stream for every new flag."""
    texts = [
        "l'école est grande",
        "qu'elle écrit d'autres leçons",
        "room ٣٤٥ and ３４５ and 345",
        "blåbær blåbär blaabaer räksmörgås",
        "the quick brown fox information",
        "",
        "aujourd'hui l’avion",
    ]
    flat, doc_idx, _ = tokenize_column(pa.array(texts), an)
    got = {}
    for t, d in zip(flat.to_pylist(), doc_idx):
        got.setdefault(int(d), []).append(t)
    for i, txt in enumerate(texts):
        assert got.get(i, []) == an.tokens(txt), (an, txt)


def test_manifest_round_trip():
    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    an = Analyzer(elision=("l", "d"), decimal_digit=True,
                  scandinavian="fold", truncate_length=5,
                  keep_words=frozenset({"a", "b"}))
    rt = analyzer_from_dict(analyzer_dict(an))
    assert rt.elision_set == an.elision_set
    assert rt.decimal_digit and rt.scandinavian == "fold"
    assert rt.truncate_length == 5
    assert rt.keep_words == an.keep_words
    for txt in ("l'avion ٣٤٥ blåbär informations", "d'une maison"):
        assert rt.tokens(txt) == an.tokens(txt)


class TestFingerprint:
    def _ds(self):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "text": pa.array([
                "b a c",            # {a,b,c}
                "c c b a a",        # same set, other order/reps
                "a b c d",          # superset: different
                "",                 # token-less
                "d c b a",          # = doc 3's set
                " ".join(f"w{i}" for i in range(10)),  # oversize -> NULL
            ]),
        }))

    def test_token_fingerprints(self, ray_session):
        from lucene_ray.pipelines.dedup import token_fingerprints

        t = pa.concat_tables(token_fingerprints(
            self._ds(), max_output_size=16).iter_batches(
                batch_format="pyarrow", batch_size=1 << 10))
        fp = dict(zip(t["doc_id"].to_pylist(),
                      t["fingerprint"].to_pylist()))
        assert fp[1] == fp[2] == "a b c"
        assert fp[3] == fp[5] == "a b c d"
        assert fp[4] == ""            # token-less -> empty string
        assert fp[6] is None          # > max_output_size -> NULL

    def test_fingerprint_dedup_groups(self, ray_session):
        from lucene_ray.pipelines.dedup import fingerprint_dedup

        t = pa.concat_tables(fingerprint_dedup(
            self._ds(), max_output_size=16).iter_batches(
                batch_format="pyarrow", batch_size=1 << 10)
        ).sort_by("fingerprint")
        assert t["fingerprint"].to_pylist() == ["a b c", "a b c d"]
        assert t["n_docs"].to_pylist() == [2, 2]
        assert t["keeper"].to_pylist() == [1, 3]

    def test_custom_separator_and_analyzer(self, ray_session):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.pipelines.dedup import token_fingerprints

        an = Analyzer(stem=True)
        import ray.data

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["running runs run"]),
        }))
        t = pa.concat_tables(token_fingerprints(
            ds, separator="_", analyzer=an).iter_batches(
                batch_format="pyarrow", batch_size=4))
        assert t["fingerprint"].to_pylist() == ["run"]


def test_hyphenated_words_filter():
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter
    .java:57): join line-break-hyphenated parts; chains join fully;
    a trailing unpaired part keeps its hyphen."""
    from lucene_ray.analysis.analyzers import Analyzer

    a = Analyzer(tokenizer="whitespace", hyphenated_words=True)
    assert a.tokens("hyphen- ated word") == ["hyphenated", "word"]
    assert a.tokens("one- two- three") == ["onetwothree"]
    assert a.tokens("trail-") == ["trail-"]
    # positions renumber sequentially after merges
    assert a.tokens_with_positions("a hy- phen b") == [
        ("a", 0), ("hyphen", 1), ("b", 2)]


def test_hyphenated_words_batch_parity():
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    a = Analyzer(tokenizer="whitespace", hyphenated_words=True)
    rows = ["hyphen- ated word", "plain text", "one- two- three", ""]
    flat, d, p = tokenize_column(pa.array(rows), a)
    got = list(zip(flat.to_pylist(), d.tolist(), p.tolist()))
    want = []
    for i, r in enumerate(rows):
        want += [(t, i, pos) for t, pos in a.tokens_with_positions(r)]
    assert got == want


def test_analyzer_manifest_round_trip_new_flags():
    """Every Analyzer field must survive the manifest round-trip
    (index/build.py analyzer_dict/analyzer_from_dict)."""
    import dataclasses
    import json

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    persisted = set(analyzer_dict(Analyzer()).keys())
    fields = {f.name for f in dataclasses.fields(Analyzer)}
    missing = fields - persisted
    assert not missing, f"analyzer fields not persisted: {missing}"

    a = Analyzer(tokenizer="whitespace", hyphenated_words=True,
                 apostrophe=True, limit_token_count=7,
                 stem=True, stem_overrides=(("table", "tbl0"),),
                 keyword_set=frozenset({"values"}),
                 reverse_tokens=True,
                 mapping_char_filter=(("table", "tbl"),))
    b = analyzer_from_dict(json.loads(json.dumps(analyzer_dict(a))))
    for f in dataclasses.fields(Analyzer):
        assert getattr(a, f.name) == getattr(b, f.name), f.name


def test_delimited_tf_filter(tmp_path, ray_session):
    """DelimitedTermFrequencyTokenFilter: 'term|N' indexes with freq N
    and the field length accumulates N (custom-term-frequency rule)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.search import query as Q
    from lucene_ray.search.searcher import Searcher

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["cat|5 dog", "cat dog dog"])})
    idx = str(tmp_path / "dtf")
    build_index(ray.data.from_arrow(t), idx,
                analyzer=Analyzer(tf_delimiter="|"), num_segments=1,
                with_positions=False)
    s = Searcher(idx, mode="f64")
    # tf(cat, doc0) = 5 -> doc0 outranks doc1 despite one occurrence
    d, sc = s.search_all(Q.TermQuery("cat"))
    by = dict(zip(d.tolist(), sc.tolist()))
    assert by[0] > by[1]
    # doc lengths: doc0 = 5 + 1 = 6, doc1 = 3
    stats = s.readers[0]
    assert int(np.asarray(s.manifest["segments"][0]["doc_count"])) == 2
    # positions are rejected with custom frequencies (the ValueError
    # surfaces wrapped in RayTaskError from the map_batches worker)
    with pytest.raises(Exception, match="tf_delimiter requires"):
        build_index(ray.data.from_arrow(t), str(tmp_path / "bad"),
                    analyzer=Analyzer(tf_delimiter="|"), num_segments=1,
                    with_positions=True)


def test_trim_and_pattern_replace_filters():
    """TrimFilter (miscellaneous/TrimFilter.java:26) + token-level
    PatternReplaceFilter (pattern/PatternReplaceFilter.java:34):
    per-token semantics and batch/per-row parity."""
    from lucene_ray.analysis.analyzers import Analyzer

    a = Analyzer(trim=True)
    assert a.transform_token("  spaced\t") == "spaced"
    assert a.has_token_filters
    b = Analyzer(pattern_replace=(r"\d+", "#"))
    assert b.transform_token("abc123def45") == "abc#def#"
    # replace runs before the stemmer sees the token
    c = Analyzer(pattern_replace=("^tables$", "chairs"), stem=True)
    assert c.transform_token("tables") == "chair"
    # tokenizer='pattern' + trim: comma stream with stray spaces
    d = Analyzer(tokenizer="pattern", tokenizer_pattern=(",", -1),
                 trim=True)
    assert d.tokens(" a , b ,c ") == ["a", "b", "c"]


def test_protected_term_filter():
    """ProtectedTermFilter (miscellaneous/ProtectedTermFilter.java:31):
    protected terms bypass the WHOLE per-token chain, not just the
    stemmers (contrast keyword_set)."""
    from lucene_ray.analysis.analyzers import Analyzer

    a = Analyzer(stem=True, ascii_fold=True,
                 protected_words=frozenset({"tables", "café"}))
    assert a.transform_token("tables") == "tables"
    assert a.transform_token("café") == "café"     # fold skipped too
    assert a.transform_token("chairs") == "chair"  # others still stem
    # keyword_set only guards the stemmer — the fold still applies
    b = Analyzer(stem=True, ascii_fold=True,
                 keyword_set=frozenset({"café"}))
    assert b.transform_token("café") == "cafe"


def test_pattern_capture_group_filter(ray_session, tmp_path):
    """PatternCaptureGroupTokenFilter (pattern/
    PatternCaptureGroupTokenFilter.java:48): capture groups inject at
    the source position (original preserved, duplicates collapse);
    per-row positions/offsets and the batch indexing path agree."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import Searcher
    from lucene_ray.search import query as Q

    a = Analyzer(tokenizer="whitespace",
                 pattern_capture=(r"^(\w+)-(\w+)$", r"(\d+)"))
    assert a.tokens("x") == ["x"]
    assert sorted(a.tokens("foo-bar")) == ["bar", "foo", "foo-bar"]
    # duplicate captures collapse; original never re-injects
    assert sorted(a.tokens("a7-a7")) == ["7", "a7", "a7-a7"]
    tp = a.tokens_with_positions("zz foo-bar")
    assert ("foo", 1) in tp and ("bar", 1) in tp and ("foo-bar", 1) in tp
    off = {t: (s, e) for t, _p, s, e in a.tokens_with_offsets("foo-bar")}
    assert off["foo"] == off["foo-bar"]  # captures carry source offsets

    # batch path parity: index via tokenizer whitespace keeps '-'
    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["alpha foo-bar baz", "plain words here"]),
    })
    idx = str(tmp_path / "pcg")
    build_index(ray.data.from_arrow(docs), idx,
                analyzer=Analyzer(tokenizer="whitespace",
                                  pattern_capture=(r"^(\w+)-(\w+)$",)),
                num_segments=1, with_positions=True)
    s = Searcher(idx)
    d, _ = s.search_all(Q.TermQuery("foo"))
    assert d.tolist() == [0]
    # phrase across the injected position: 'alpha foo' adjacency holds
    d2, _ = s.search_all(Q.PhraseQuery(("alpha", "foo")))
    assert d2.tolist() == [0]


def test_remove_duplicates_and_date_recognizer():
    """Standalone RemoveDuplicatesTokenFilter + DateRecognizerFilter
    (miscellaneous/RemoveDuplicatesTokenFilter.java:28,
    DateRecognizerFilter.java:28)."""
    from lucene_ray.analysis.analyzers import Analyzer

    # capture and synonym both inject 'tab' at table's position
    a = Analyzer(pattern_capture=(r"^(tab)le$",),
                 synonyms=(("table", ("tab",)),),
                 remove_duplicates=True)
    tp = a.tokens_with_positions("my table here")
    assert tp.count(("tab", 1)) == 1        # duplicate collapsed
    assert ("table", 1) in tp
    a0 = Analyzer(pattern_capture=(r"^(tab)le$",),
                  synonyms=(("table", ("tab",)),))
    assert a0.tokens_with_positions("my table here").count(("tab", 1)) == 2
    # duplicates at DIFFERENT positions survive
    assert a.tokens("tab tab").count("tab") == 2

    d = Analyzer(tokenizer="whitespace", date_recognizer="%Y-%m-%d")
    assert d.tokens("on 2024-05-17 and 2024-13-40 x") == ["2024-05-17"]
    # position gaps like StopFilter
    tp2 = d.tokens_with_positions("word 2024-05-17")
    assert tp2 == [("2024-05-17", 1)]


def test_remove_duplicates_batch_parity(ray_session):
    """Batch tokenizer applies the same (doc, pos, term) dedupe."""
    import pyarrow as pa

    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column

    a = Analyzer(pattern_capture=(r"^(tab)le$",),
                 synonyms=(("table", ("tab",)),),
                 remove_duplicates=True)
    texts = pa.array(["my table here", "tab tab table"])
    flat, doc_idx, pos = tokenize_column(texts, a)[:3]
    got = sorted(zip(doc_idx.tolist(), pos.tolist(), flat.to_pylist()))
    want = sorted(
        [(i, p, t) for i, txt in enumerate(texts.to_pylist())
         for t, p in a.tokens_with_positions(txt)])
    assert got == want


def test_english_possessive_and_minimal_stem():
    """EnglishPossessiveFilter + Harman S-stemmer
    (en/EnglishPossessiveFilter.java:30, EnglishMinimalStemmer.java:33)."""
    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.stem import (english_minimal_stem,
                                          english_possessive_strip)

    assert english_possessive_strip("table's") == "table"
    assert english_possessive_strip("john’s") == "john"
    assert english_possessive_strip("its") == "its"      # no apostrophe
    assert english_possessive_strip("'s") == ""
    # S-stemmer table (Harman 1991)
    cases = {"tables": "table", "queries": "query", "pass": "pass",
             "corpus": "corpus", "ties": "ty", "toes": "toes",
             "axes": "axe", "dogs": "dog", "as": "as", "is": "is"}
    for w, want in cases.items():
        assert english_minimal_stem(w) == want, w
    a = Analyzer(english_possessive=True, minimal_stem=True)
    assert a.tokens("the table's legs") == ["the", "table", "leg"]
