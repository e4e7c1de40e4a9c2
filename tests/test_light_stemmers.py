"""Light (non-Snowball) per-language stemmers + the Thai dictionary
tokenizer (analysis/light_stemmers.py, analysis/thai.py) — golden
vectors traced through the published algorithms (Larkey light10 for
Arabic, Ramanathan & Rao for Hindi, Tala for Indonesian, Ntais for
Greek), plumbing round-trips (stem_lang dispatch, analyzer_for_lang
routing), and vocabulary-mapped batch/per-row parity."""

import pyarrow as pa
import pytest

from lucene_ray.analysis.analyzers import analyzer_for_lang
from lucene_ray.analysis.light_stemmers import (arabic_normalize,
                                                arabic_stem, greek_fold,
                                                greek_stem,
                                                hindi_normalize,
                                                hindi_stem,
                                                indonesian_stem)
from lucene_ray.analysis.snowball import snowball_stem
from lucene_ray.analysis.thai import th_tokenize


class TestArabic:
    def test_normalize(self):
        assert arabic_normalize("أحمد") == "احمد"        # hamza-alef fold
        assert arabic_normalize("إسلام") == "اسلام"
        assert arabic_normalize("آخر") == "اخر"
        assert arabic_normalize("مصطفى") == "مصطفي"      # maksura -> yeh
        assert arabic_normalize("مدرسة") == "مدرسه"      # teh marbuta -> heh
        assert arabic_normalize("كـتاب") == "كتاب"        # tatweel dropped
        assert arabic_normalize("مُدَرِّس") == "مدرس"     # harakat dropped

    def test_light10_prefix(self):
        assert arabic_stem("الكتاب") == "كتاب"            # al-
        assert arabic_stem("والطلاب") == "طلاب"        # wal-
        assert arabic_stem("للبيت") == "بيت"              # lil-
        # bare waw needs >= 4 chars
        assert arabic_stem("ود") == "ود"
        # one prefix strip only: و then ال does NOT also strip
        assert arabic_stem("وال") == "وال"               # too short anyway

    def test_light10_suffix(self):
        assert arabic_stem("كتابها") == "كتاب"            # -ha
        assert arabic_stem("مسلمون") == "مسلم"        # -wn
        assert arabic_stem("مسلمين") == "مسلم"        # -yn
        # leave >= 2 chars guard
        assert arabic_stem("ما") == "ما"


class TestPersian:
    def test_normalize(self):
        from lucene_ray.analysis.light_stemmers import persian_normalize

        assert persian_normalize("کتاب") == "كتاب"   # keheh -> kaf
        assert persian_normalize("می") == "مي"         # farsi yeh -> yeh
        assert persian_normalize("ۀ") == "ه"           # heh+yeh -> heh

    def test_analyzer_chain_zwnj_split(self):
        from lucene_ray.analysis.analyzers import analyzer_for_lang

        an = analyzer_for_lang("fa")
        # ZWNJ inside می‌خواند splits (PersianCharFilter role)
        assert an.tokens("دانش‌آموز می‌خواند") == [
            "دانش", "اموز", "مي", "خواند"]


class TestHindi:
    def test_normalize(self):
        assert hindi_normalize("लड़का") == "लडका"        # nukta composite
        assert hindi_normalize("ज़रा") == "जरा"
        assert hindi_normalize("हँस") == "हंस"            # chandrabindu

    def test_stem_longest_suffix(self):
        assert hindi_stem("लडकियों") == "लडक"            # 4-char -iyon
        assert hindi_stem("खाएंगी") == "खा"              # 4-char future
        assert hindi_stem("होता") == "हो"                  # 2-char -ta
        assert hindi_stem("लडका") == "लडक"              # 1-char matra
        # >= 2 chars must remain
        assert hindi_stem("का") == "का"

    def test_chain(self):
        assert snowball_stem("लड़के", "hi") == "लडक"


class TestIndonesian:
    @pytest.mark.parametrize("word,stem", [
        ("bukunya", "buku"),          # possessive -nya
        ("bajumu", "baju"),           # possessive -mu
        ("siapakah", "siapa"),        # particle -kah
        ("mengambil", "ambil"),       # meng-
        ("menyapu", "sapu"),          # meny- -> s recode
        ("memilih", "pilih"),         # mem+vowel -> p recode
        ("membaca", "baca"),          # mem+consonant
        ("kebijakan", "bijak"),       # ke- blocks -kan, strips -an
        ("pembangunan", "bangun"),    # pem- + -an
        ("berlari", "lari"),          # ber- blocks -i
        ("perbaikan", "baik"),        # per- blocks -kan, strips -an
        ("belajar", "ajar"),          # lexical bel-
        ("dimakan", "makan"),         # di- blocks -an
        ("terbaik", "baik"),          # ter-
    ])
    def test_tala(self, word, stem):
        assert indonesian_stem(word) == stem

    def test_syllable_guard(self):
        # < 3 syllables: affix stripping refused
        assert indonesian_stem("main") == "main"


class TestGreek:
    def test_fold(self):
        assert greek_fold("Καλός") == "καλοσ"   # tonos + final sigma
        assert greek_fold("ΐϊΰϋ") == "ιιυυ"

    @pytest.mark.parametrize("word,stem", [
        ("ΚΑΛΟΣ", "καλ"), ("καλη", "καλ"), ("καλων", "καλ"),
        ("καλοι", "καλ"),
        ("πολεως", "πολ"),            # -εως rule
        ("τραγουδια", "τραγουδ"),     # -ια after consonant
        ("φαγια", "φα"),              # lexicalized recode
        ("γραφω", "γραφ"), ("γραφουμε", "γραφ"),
        ("εγραψαν", "εγραψ"),         # aorist -αν
    ])
    def test_ntais(self, word, stem):
        assert greek_stem(word) == stem

    def test_non_greek_identity(self):
        assert greek_stem("table") == "table"

    def test_short_word_guard(self):
        assert greek_stem("και") == "και"


class TestThai:
    def test_dictionary_words(self):
        assert th_tokenize("ประเทศไทยมีภาษาไทย") == [
            "ประเทศ", "ไทย", "มี", "ภาษา", "ไทย"]

    def test_mixed_scripts(self):
        assert th_tokenize("นักเรียนอ่านหนังสือ abc 123") == [
            "นักเรียน", "อ่าน", "หนังสือ", "abc", "123"]

    def test_unknown_clusters_never_strand_marks(self):
        # OOV Thai falls out as orthographic clusters: no token may
        # START with a dependent sign
        from lucene_ray.analysis.thai import _TH_DEPENDENT

        for tok in th_tokenize("ฦๅชๆฮะฟั่"):
            assert tok[0] not in _TH_DEPENDENT

    def test_empty(self):
        assert th_tokenize("") == []


class TestCJKWidth:
    """CJKWidthFilter role (analysis/stem.cjk_width_fold)."""

    @pytest.mark.parametrize("raw,folded", [
        ("ﾃﾞｰﾀ", "データ"),     # halfwidth + voiced mark composes
        ("ﾊﾟﾝ", "パン"),           # semi-voiced
        ("ｼｽﾃﾑ", "システム"),
        ("ＡＢＣ", "ABC"),         # fullwidth ASCII -> Basic Latin
        ("ﾞ", "゙"),            # leading mark: standalone combining
        ("データabc", "データabc"),  # canonical text is a no-op
    ])
    def test_fold(self, raw, folded):
        from lucene_ray.analysis.stem import cjk_width_fold

        assert cjk_width_fold(raw) == folded

    def test_not_general_nfkc(self):
        # compatibility chars OUTSIDE the filter's scope stay put
        from lucene_ray.analysis.stem import cjk_width_fold

        assert cjk_width_fold("㈱ﬁ") == "㈱ﬁ"

    def test_analyzer_unifies_widths(self):
        from lucene_ray.analysis.analyzers import Analyzer

        an = Analyzer(cjk_width=True)
        assert an.tokens("ﾃﾞｰﾀ") == an.tokens("データ")
        assert an.normalize("ＡＢＣ") == "abc"

    def test_ja_chain_includes_width(self):
        from lucene_ray.analysis.analyzers import analyzer_for_lang

        assert analyzer_for_lang("ja").cjk_width


class TestScriptRouting:
    """LangId's writing-system prior (pipelines/textstats.py
    _script_route) — feeds the 23-language analyzer registry."""

    @pytest.mark.parametrize("text,lang", [
        ("我们在北京工作搜索引擎技术", "zh"),
        ("東京都に住んでいます日本語の検索", "ja"),   # kanji+kana -> ja
        ("학교에서 학생이 공부합니다", "ko"),
        ("นักเรียนอ่านหนังสือในโรงเรียน", "th"),
        ("ο καλος ανθρωπος γραφει τραγουδια", "el"),
        ("الطالب يقرأ الكتاب في المدرسة", "ar"),
        ("लड़के किताब पढ़ते हैं", "hi"),
        ("быстрая коричневая лиса прыгает", "ru"),
    ])
    def test_scripts(self, text, lang):
        from lucene_ray.pipelines.textstats import LangId

        assert LangId().classify(text) == lang

    def test_latin_accents_stay_on_trigram_path(self):
        from lucene_ray.pipelines.textstats import LangId

        lid = LangId()
        # German umlauts must NOT trip the script prior
        assert lid._script_route(
            "der schnelle braune fuchs springt über den faulen hund") is None
        assert lid.classify(
            "der schnelle braune fuchs springt über den faulen hund") == "de"


class TestAnalyzerRouting:
    @pytest.mark.parametrize("lang", ["el", "ar", "hi", "id"])
    def test_stem_lang_routes(self, lang):
        an = analyzer_for_lang(lang)
        assert an.stem_lang == lang

    def test_thai_segments(self):
        an = analyzer_for_lang("th")
        assert an.effective_segment_lang == "th"
        assert an.tokens("ครูเขียนหนังสือ") == ["ครู", "เขียน", "หนังสือ"]

    @pytest.mark.parametrize("lang,texts", [
        ("el", ["Καλός καλή γράφω τραγούδια", "πόλεως ΚΑΛΩΝ"]),
        ("ar", ["الكتاب والطلاب مدرسة", "كتابها مسلمون"]),
        ("hi", ["लड़के लड़कियों खाएंगी", "होता कर"]),
        ("id", ["bukunya mengambil kebijakan", "perbaikan berlari"]),
        ("th", ["ประเทศไทยมีภาษาไทย", "ครูเขียนหนังสือ"]),
    ])
    def test_batch_row_parity(self, lang, texts):
        from lucene_ray.analysis.batch import tokenize_column

        an = analyzer_for_lang(lang)
        terms, docidx, _pos = tokenize_column(pa.array(texts), an)[:3]
        terms = pa.array(terms).to_pylist()
        got = [[], []]
        for t, d in zip(terms, list(docidx)):
            got[int(d)].append(t)
        assert got == [an.tokens(t) for t in texts]
