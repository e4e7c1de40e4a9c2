"""Hunspell dictionary stemming (analysis/hunspell.py — the
Hunspell.java / Dictionary.java / Stemmer.java / HunspellStemFilter
roles): .aff/.dic parsing, affix stripping with conditions, flag modes,
cross-product, analyzer plumbing and the per-process cache."""

import pyarrow as pa

from lucene_ray.analysis.hunspell import HunspellDictionary

AFF = """\
SET UTF-8
TRY esianrtolcd

PFX U Y 1
PFX U 0 un .

SFX S Y 1
SFX S 0 s .

SFX D Y 3
SFX D 0 ed [^ey]
SFX D 0 d e
SFX D y ied [^aeiou]y

SFX G N 2
SFX G 0 ing [^e]
SFX G e ing e
"""

DIC = """\
5
cat/S
walk/DSG
tie/DG
try/DS
lock/USG
"""


def _dic():
    return HunspellDictionary.parse(AFF, DIC)


def test_basic_suffix_stripping():
    d = _dic()
    assert d.stem("cats") == ["cat"]
    assert d.stem("walked") == ["walk"]
    assert d.stem("walks") == ["walk"]
    assert d.stem("walking") == ["walk"]


def test_strip_and_condition_rules():
    d = _dic()
    # 'tied' = tie + d (strip 0, affix d, cond 'e'); NOT tie+ed (cond [^ey])
    assert d.stem("tied") == ["tie"]
    # 'tried' = try - y + ied (cond [^aeiou]y on the base)
    assert d.stem("tried") == ["try"]
    # 'tying' would need ICONV two-level rules; 'tieing' = tie + ing? cond
    # [^e] fails on the e-form; 'tiing' via strip e + ing:
    assert d.stem("tiing") == ["tie"]


def test_dictionary_word_is_its_own_stem():
    d = _dic()
    assert d.stem("walk") == ["walk"]
    assert d.stem("zebra") == []
    assert d.stem_one("zebra") == "zebra"  # no analysis -> surface form


def test_prefix_and_cross_product():
    d = _dic()
    assert d.stem("unlock") == ["lock"]
    # cross product: un + lock + s — PFX U and SFX S both declare Y
    assert "lock" in d.stem("unlocks")
    # SFX G declares N (no cross): plain 'locking' stems, the
    # prefix+G combination does not
    assert "lock" in d.stem("locking")
    assert d.stem("unlocking") == []
    # 'walk' lacks the U prefix flag entirely
    assert d.stem("unwalking") == []


def test_condition_blocks_wrong_base():
    d = _dic()
    # 'walkied' would need base 'walky' (not in dic): no stem
    assert d.stem("walkied") == []


def test_flag_modes():
    aff_long = "FLAG long\nSFX Aa Y 1\nSFX Aa 0 s .\n"
    d = HunspellDictionary.parse(aff_long, "1\ndog/Aa\n")
    assert d.stem("dogs") == ["dog"]
    aff_num = "FLAG num\nSFX 501 Y 1\nSFX 501 0 s .\n"
    d2 = HunspellDictionary.parse(aff_num, "1\ndog/501,502\n")
    assert d2.stem("dogs") == ["dog"]


def test_analyzer_plumbing_and_manifest_round_trip(tmp_path):
    from lucene_ray.analysis.analyzers import Analyzer
    from lucene_ray.analysis.batch import tokenize_column
    from lucene_ray.index.build import analyzer_dict, analyzer_from_dict

    aff = tmp_path / "en.aff"
    dic = tmp_path / "en.dic"
    aff.write_text(AFF)
    dic.write_text(DIC)
    an = Analyzer(hunspell=(str(aff), str(dic)))
    assert an.transform_token("walked") == "walk"
    assert an.transform_token("unknownword") == "unknownword"

    b = analyzer_from_dict(analyzer_dict(an))
    assert b.hunspell == (str(aff), str(dic))
    assert b.has_token_filters

    # batch vocabulary-mapped path == per-row (house parity pattern)
    rows = ["cats walked home", "unlocking tied doors"]
    flat, docidx, _pos = tokenize_column(pa.array(rows), an)
    got = {}
    for t, dd in zip(flat.to_pylist(), docidx):
        got.setdefault(int(dd), []).append(t)
    for i, txt in enumerate(rows):
        assert got.get(i, []) == an.tokens(txt), txt


def test_continuation_classes_two_level_suffix():
    """affix/Flags continuation: 'walkables' = walk + able (rule A,
    carrying continuation B) + s (rule B) — neither single strip reaches
    the dictionary, the two-level chain does."""
    aff = """\
SFX A Y 1
SFX A 0 able/B .

SFX B Y 1
SFX B 0 s .
"""
    d = HunspellDictionary.parse(aff, "1\nwalk/A\n")
    assert d.stem("walkable") == ["walk"]      # single level via A
    assert d.stem("walkables") == ["walk"]     # two-level via A→B
    assert d.stem("walks") == []               # B alone never licensed
    assert d.stem_one("walkables") == "walk"
