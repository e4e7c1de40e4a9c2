"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (index build + BM25 top-k query set)
on sf0.001. ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2 inventory + the training-data-pipeline extras); each takes
``sf_dir`` and returns a table the driver hashes against ``oracle_sql()``'s
DuckDB result on the same parquet views.

Scoring entries use the engine's float64 oracle mode (same IEEE expression
tree as the SQL — see lucene_ray/search/similarity.py); the Lucene-exact
float32 path is covered by the pytest rank-identity suite and by the
rows-only ``bm25_topk_f32`` entry. Floats are rounded to 4 decimals on BOTH
sides; top-k ranking uses the ROUNDED score (desc) then doc_id so selection
is deterministic across numpy/DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

K1, B = 1.2, 0.75

# quality_eval topics (benchmark/quality harness): qid -> terms; the
# ranked list is a SHOULD-disjunction, qrels = docs containing ALL terms
QUALITY_TOPICS = (
    ("t1", ("table",)),
    ("t2", ("key", "value")),
    ("t3", ("spark", "window")),
)

# ---------------------------------------------------------------------------
# shared index cache (one build per sf_dir per process, resumable on disk)
# ---------------------------------------------------------------------------

_CACHE_ROOT = "/tmp/lucene_ray_idx"

# deterministic synthetic Japanese corpus for the kuromoji-role entry:
# every sentence segments to <= 7 tokens so dl * 3 stays under the
# smallfloat-norm identity region (dl < 24 — no dlq quantization needed
# in the SQL twin)
_JA_SENTENCES = (
    "東京都に住んでいます",
    "日本語の検索エンジン",
    "新しい技術の研究です",
    "京都府と大阪市",
    "私は東京が良い",
    "映画と音楽が良い",
    "学生は学校で学習する",
    "東京の天気は良い",
)

# deterministic synthetic Korean corpus (nori-role entry): every
# sentence segments to <= 5 surviving morphemes, so dl * 3 < 24 keeps
# the smallfloat norm identity (same budget as _JA_SENTENCES)
_KO_SENTENCES = (
    "학교에서 학생이 공부합니다",
    "한국의 검색 엔진 기술",
    "서울에서 회사원이 일합니다",
    "친구와 영화를 보고 음악을 듣습니다",
    "오늘 날씨가 좋습니다",
    "컴퓨터와 기계 학습 연구",
    "학생은 학교에서 책을 읽습니다",
    "서울의 지하철과 기차",
)

# deterministic synthetic Chinese corpus (smartcn-role entry, <= 5
# words per sentence) — also reused by the CJKBigramFilter entry, where
# each sentence's <= 9 Han chars yield <= 8 bigrams (reps = 1 there:
# repetition joined by spaces would chain bigrams across the seam,
# since the tokenizer leaves no position gap at whitespace)
_ZH_SENTENCES = (
    "我们在北京工作",
    "中文处理和搜索引擎",
    "机器学习模型的开发",
    "今天天气很好",
    "学生在学校学习中文",
    "上海的地铁和火车",
    "搜索引擎使用索引技术",
    "我们研究计算机科学",
)

# round-5 language-analyzer corpora (same deterministic doc i =
# sentence[i%8] × (i%3+1) scheme, <= 7 analyzed tokens per sentence so
# dl*3 < 24 keeps the smallfloat norm identity): Thai (dictionary
# word-break — no inter-word spaces), Greek / Arabic / Hindi /
# Indonesian (light-stemmer chains, analysis/light_stemmers.py)
_TH_SENTENCES = (
    "นักเรียนอ่านหนังสือในโรงเรียน",
    "ครูเขียนหนังสือใหม่",
    "ประเทศไทยมีภาษาไทย",
    "เราไปตลาดซื้ออาหาร",
    "พ่อและแม่รักลูก",
    "นักเรียนเรียนในโรงเรียนใหญ่",
    "เราอ่านหนังสือวันนี้",
    "ระบบค้นหาข้อมูลคอมพิวเตอร์",
)
_EL_SENTENCES = (
    "ο καλος ανθρωπος γραφει τραγουδια",
    "η πολη εχει καλα σπιτια",
    "το παιδι διαβαζει βιβλια",
    "οι καλοι φιλοι ταξιδευουν μαζι",
    "η θαλασσα ειναι μεγαλη",
    "ο δασκαλος γραφει στον πινακα",
    "τα τραγουδια της πολης",
    "το βιβλιο ειναι μικρο",
)
_AR_SENTENCES = (
    "الطالب يقرأ الكتاب في المدرسة",
    "الكتاب الجديد على الطاولة",
    "المعلم يكتب الدرس",
    "الطلاب يذهبون الى المدرسة",
    "هذا كتابها المفضل",
    "المدينة كبيرة وجميلة",
    "نقرأ الكتب في المكتبة",
    "الولد يلعب في الحديقة",
)
_HI_SENTENCES = (
    "लड़के किताब पढ़ते हैं",
    "लड़कियों ने खाना खाया",
    "वह स्कूल जाता है",
    "लड़का घर में सोता है",
    "हम बाजार जाते हैं",
    "अध्यापक पाठ पढ़ाते हैं",
    "बच्चे बगीचे में खेलते हैं",
    "माता पिता बच्चों से प्यार करते हैं",
)
_FA_SENTENCES = (
    "دانش‌آموز کتاب می‌خواند",
    "کتاب جدید روی میز است",
    "معلم درس می‌دهد",
    "ما به مدرسه می‌رویم",
    "این کتاب اوست",
    "شهر بزرگ و زیباست",
    "ما در کتابخانه هستیم",
    "پدر و مادر فرزند را دوست دارند",
)
_ID_SENTENCES = (
    "dia mengambil bukunya di sekolah",
    "guru menulis buku baru",
    "mereka belajar bahasa indonesia",
    "anak itu membaca buku di rumah",
    "kami pergi ke pasar pagi",
    "pemerintah membangun jalan baru",
    "perbaikan jalan itu selesai",
    "teman saya bekerja di kota",
)

# round-5 second-wave light-stemmer corpora (same scheme): Bulgarian /
# Czech / Latvian / Galician / Bengali / Sorani / Telugu light stems,
# Serbian dual-script normalization (Cyrillic and Latin rows meet at
# the same bald-Latin terms)
_BG_SENTENCES = (
    "ученикът чете книгата в училището",
    "новата книга е на масата",
    "учителят пише урока",
    "учениците отиват на училище",
    "градът е голям и красив",
    "четем книгите в библиотеката",
    "момчето играе в градината",
    "хубавите книги са тук",
)
_CS_SENTENCES = (
    "student čte knihu ve škole",
    "nová kniha je na stole",
    "učitel píše lekci",
    "studenti jdou do školy",
    "město je velké a krásné",
    "čteme knihy v knihovně",
    "chlapec hraje na zahradě",
    "pěkné knihy jsou tady",
)
_LV_SENTENCES = (
    "skolēns lasa grāmatu skolā",
    "jaunā grāmata ir uz galda",
    "skolotājs raksta stundu",
    "skolēni iet uz skolu",
    "pilsēta ir liela un skaista",
    "mēs lasām grāmatas bibliotēkā",
    "zēns spēlējas dārzā",
    "labas grāmatas ir šeit",
)
_GL_SENTENCES = (
    "o estudante le libros na escola",
    "os libros novos están na mesa",
    "o profesor escribe a lección",
    "os estudantes van á escola",
    "a cidade é grande e fermosa",
    "lemos os libros na biblioteca",
    "o neno xoga no xardín",
    "as palabras son importantes",
)
_BN_SENTENCES = (
    "ছাত্র স্কুলে বই পড়ে",
    "নতুন বইটা টেবিলে আছে",
    "শিক্ষক পাঠ লেখেন",
    "ছাত্ররা স্কুলে যায়",
    "শহরটা বড় এবং সুন্দর",
    "আমরা বইগুলো পড়ি",
    "ছেলেটা বাগানে খেলে",
    "ভালো বইগুলি এখানে আছে",
)
_CKB_SENTENCES = (
    "قوتابی کتێب دەخوێنێتەوە",
    "کتێبەکە لەسەر مێزە",
    "مامۆستا وانەکە دەنووسێت",
    "قوتابییەکان دەچنە قوتابخانە",
    "شارەکە گەورە و جوانە",
    "ئێمە کتێبەکان دەخوێنین",
    "منداڵەکە لە باخچە یاری دەکات",
    "کتێبە باشەکان لێرەن",
)
_TE_SENTENCES = (
    "విద్యార్థి పుస్తకము చదువుతాడు",
    "కొత్త పుస్తకము బల్లపై ఉంది",
    "గురువు పాఠము వ్రాస్తాడు",
    "విద్యార్థులు పాఠశాలకు వెళతారు",
    "నగరము పెద్దది మరియు అందమైనది",
    "మేము పుస్తకములు చదువుతాము",
    "బాలుడు తోటలో ఆడతాడు",
    "మంచి పుస్తకములు ఇక్కడ ఉన్నాయి",
)
_SR_SENTENCES = (
    "студент чита књигу у школи",
    "student čita knjigu u školi",
    "нова књига је на столу",
    "nova knjiga je na stolu",
    "учитељ пише лекцију",
    "grad je velik i lep",
    "читамо књиге у библиотеци",
    "dobre knjige su ovde",
)

# (lang, sentences, query surface form, reference role) for the
# generic per-language corpus entries below
# width-mixed corpus for the CJKWidthFilter entry: halfwidth katakana
# (with voiced marks), fullwidth ASCII, and canonical forms that must
# all meet at the same folded terms
_WIDTH_SENTENCES = (
    "ﾃﾞｰﾀ 処理 ｼｽﾃﾑ",
    "データ 解析 ツール",
    "ＡＢＣ ｶﾞｲﾄﾞ 123",
    "ﾊﾟﾝ と ﾐﾙｸ",
    "system data ＴＥＳＴ",
    "ツール の ガイド",
    "ﾃﾞｰﾀ ﾍﾞｰｽ 設計",
    "テスト データ 管理",
)

# deterministic 10-script corpus for the lang_id_script entry: the SQL
# twin knows each row's language BY CONSTRUCTION (doc_id % 10)
_SCRIPT_ROUTE_ROWS = (
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("de", "der schnelle braune fuchs springt über den faulen hund"),
    ("zh", _ZH_SENTENCES[1]),
    ("ja", _JA_SENTENCES[1]),
    ("ko", _KO_SENTENCES[0]),
    ("th", _TH_SENTENCES[0]),
    ("el", _EL_SENTENCES[0]),
    ("ar", _AR_SENTENCES[0]),
    ("hi", _HI_SENTENCES[0]),
    ("ru", "быстрая коричневая лиса прыгает через ленивую собаку"),
)

# deterministic accented-German vocabulary for the ICU-collation
# entry + its DuckDB COLLATE de twin (word = vocab[doc_id % 17])
_COLLATE_VOCAB = ("zebra", "Äpfel", "apfel", "östlich", "ångström",
                  "Ober", "oben", "uber", "über", "schon", "schön",
                  "Haus", "hause", "häuser", "bar", "bär", "baren")

# round-5 token-filter corpora: (analyzer kwargs, sentences, query
# surface form, reference role) — entries/oracles generate like
# _LANG_CORPORA but with an explicit Analyzer config instead of a
# language route
_FR_EL_SENTENCES = (
    "l'étudiant lit le livre",
    "l'école est grande",
    "il va à l'école",
    "d'autres livres sont ici",
    "qu'elle écrit la leçon",
    "l'avion vole vite",
    "c'est un bon livre",
    "j'aime l'école",
)
_DD_SENTENCES = (
    "room ٣٤٥ is open",
    "room 345 is open",
    "room ३४५ is open",
    "block ７７ east wing",
    "block 77 east wing",
    "room ৯৯ is closed",
    "room 99 is closed",
    "gate ٥ north side",
)
_SCAND_SENTENCES = (
    "blåbær syltetøj på bordet",
    "blåbär syltetöj på bordet",
    "blaabaer syltetoej paa bordet",
    "vi køber blåbær i dag",
    "vi köper blåbär i dag",
    "smörgås med ost og brød",
    "smoergaas med ost og broed",
    "en grøn ø i havet",
)
_FLAG_CORPORA = {
    "french_elision": (
        {"stem_lang": "fr",
         "elision": ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
                     "jusqu", "quoiqu", "lorsqu", "puisqu")},
        _FR_EL_SENTENCES, "l'école",
        "ElisionFilter in the FrenchAnalyzer chain (analysis/util/"
        "ElisionFilter.java:35, fr/FrenchAnalyzer.java:56,131: "
        "l'école -> école before the Snowball stemmer; "
        "analysis/stem.elide)"),
    "decimal_digit": (
        {"decimal_digit": True},
        _DD_SENTENCES, "٣٤٥",
        "DecimalDigitFilter (analysis/core/DecimalDigitFilter.java:31: "
        "every Unicode Nd digit folds to ASCII, so ٣٤٥ / 345 / ३४५ "
        "meet at one term; analysis/stem.decimal_digit_fold)"),
    "scandinavian_normalize": (
        {"scandinavian": "normalize"},
        _SCAND_SENTENCES, "blåbär",
        "ScandinavianNormalizationFilter (miscellaneous/"
        "ScandinavianNormalizationFilter.java:38 + "
        "ScandinavianNormalizer.java:28 ALL_FOLDINGS: ä->æ, ö->ø, "
        "aa->å, ae->æ, oe/oo->ø; "
        "analysis/stem.scandinavian_normalize_token)"),
}

_LANG_CORPORA = {
    "thai": ("th", _TH_SENTENCES, "หนังสือ",
             "ThaiTokenizer dictionary word-break (analysis/common/"
             "th/ThaiTokenizer.java:38 and the ICU dictionary "
             "segmentation role icu/segmentation/ICUTokenizer.java:48; "
             "analysis/thai.py min-cost lattice)"),
    "greek": ("el", _EL_SENTENCES, "καλος",
              "GreekLowerCaseFilter + GreekStemmer roles (analysis/el/"
              "GreekLowerCaseFilter.java:30, GreekStemmer.java:39; "
              "Ntais's algorithm, analysis/light_stemmers.py)"),
    "arabic": ("ar", _AR_SENTENCES, "الكتاب",
               "ArabicNormalizer + ArabicStemmer roles (analysis/ar/"
               "ArabicNormalizer.java:30, ArabicStemmer.java:33; "
               "Larkey's light10, analysis/light_stemmers.py)"),
    "hindi": ("hi", _HI_SENTENCES, "लड़के",
              "HindiNormalizer + HindiStemmer roles (analysis/hi/"
              "HindiNormalizer.java:34, HindiStemmer.java:27; "
              "Ramanathan & Rao, analysis/light_stemmers.py)"),
    "indonesian": ("id", _ID_SENTENCES, "bukunya",
                   "IndonesianStemmer role (analysis/id/"
                   "IndonesianStemmer.java:27; Tala's algorithm, "
                   "analysis/light_stemmers.py)"),
    "persian": ("fa", _FA_SENTENCES, "کتاب",
                "PersianAnalyzer chain roles (analysis/fa/"
                "PersianAnalyzer.java:41, PersianNormalizer.java:31, "
                "PersianCharFilter.java:26 ZWNJ split; "
                "analysis/light_stemmers.py)"),
    # round-5 second wave
    "bulgarian": ("bg", _BG_SENTENCES, "книгата",
                  "BulgarianStemmer role (analysis/bg/"
                  "BulgarianStemmer.java:36; Savoy's light stemmer, "
                  "analysis/light_stemmers.py)"),
    "czech": ("cs", _CS_SENTENCES, "knihu",
              "CzechStemmer role (analysis/cz/CzechStemmer.java:36; "
              "Dolamic & Savoy's light stemmer, "
              "analysis/light_stemmers.py)"),
    "latvian": ("lv", _LV_SENTENCES, "grāmatu",
                "LatvianStemmer role (analysis/lv/LatvianStemmer.java:36; "
                "Kreslins' light declension strip, "
                "analysis/light_stemmers.py)"),
    "galician": ("gl", _GL_SENTENCES, "libros",
                 "GalicianMinimalStemmer role (analysis/gl/"
                 "GalicianMinimalStemmer.java:29; RSLP-S plural step, "
                 "analysis/light_stemmers.py)"),
    "bengali": ("bn", _BN_SENTENCES, "বইটা",
                "BengaliNormalizer + BengaliStemmer roles (analysis/bn/"
                "BengaliNormalizer.java:28, BengaliStemmer.java:30; "
                "UzZaman & Khan folding + Sengupta & Chaudhuri "
                "suffixes, analysis/light_stemmers.py)"),
    "sorani": ("ckb", _CKB_SENTENCES, "کتێبەکە",
               "SoraniNormalizer + SoraniStemmer roles (analysis/ckb/"
               "SoraniNormalizer.java:37, SoraniStemmer.java:22; "
               "analysis/light_stemmers.py)"),
    "telugu": ("te", _TE_SENTENCES, "పుస్తకము",
               "TeluguNormalizer + TeluguStemmer roles (analysis/te/"
               "TeluguNormalizer.java:29, TeluguStemmer.java:27; "
               "analysis/light_stemmers.py)"),
    "serbian": ("sr", _SR_SENTENCES, "књигу",
                "SerbianNormalizationFilter role (analysis/sr/"
                "SerbianNormalizationFilter.java:32: Cyrillic and "
                "diacritic Latin fold to one bald-Latin term space; "
                "analysis/light_stemmers.py)"),
}


def _index_dir(sf_dir: str) -> str:
    """Multi-field index (default body field + derived ``title`` field =
    first 4 body tokens) over documents.parquet, cached per corpus."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:mf4".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import ray.data

        from lucene_ray.data.webpages import with_title_column
        from lucene_ray.index.build import build_index

        def _with_mm(b: pa.Table) -> pa.Table:
            # per-doc CoveringQuery minimumNumberMatch fixture: 1 + n_chars%3
            mm = 1 + (b["n_chars"].to_numpy() % 3)
            b = b.append_column("mm", pa.array(mm, type=pa.int64()))
            # sparse `kw` field (FieldExistsQuery fixture): first body token
            # on 2/3 of docs, empty (= field absent, 0 tokens) on doc_id%3==0
            import pyarrow.compute as pc

            first = pc.binary_join(
                pc.list_slice(pc.split_pattern(b["text"], " "), 0, 1), " ")
            has = pa.array(b["doc_id"].to_numpy() % 3 != 0)
            return b.append_column(
                "kw", pc.if_else(has, first, pa.scalar("", type=pa.string())))

        ds = ray.data.read_parquet(
            docs, columns=["doc_id", "text", "n_chars"]
        ).map_batches(with_title_column, batch_format="pyarrow") \
         .map_batches(_with_mm, batch_format="pyarrow")
        build_index(ds, idx, num_segments=4, with_positions=True,
                    extra_fields={"title": "title", "kw": "kw"},
                    stored_source=docs,
                    features={"chars": "n_chars", "mm": "mm"})
    return idx


def _hnsw_index_dir(sf_dir: str) -> str:
    """Persisted HNSW vector index over embeddings.parquet, cached per
    corpus — built ONCE; queries serve from the saved graphs."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"{emb}:{os.path.getsize(emb)}:{os.path.getmtime(emb)}:hnsw1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "vector_manifest.json")):
        from lucene_ray.index.vector import build_vector_index

        build_vector_index(emb, idx, n_shards=2, m=8, ef_construction=64)
    return idx


def _ivf_index_dir(sf_dir: str) -> str:
    """Persisted bucket-partitioned IVF index over embeddings.parquet,
    cached per corpus."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"{emb}:{os.path.getsize(emb)}:{os.path.getmtime(emb)}:ivf1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "vector_manifest.json")):
        from lucene_ray.index.vector import build_ivf_index

        build_ivf_index(emb, idx, n_centroids=8)
    return idx


def _wd_index_dir(sf_dir: str) -> str:
    """WordDelimiterGraphFilter index: derived column
    ``wdtext = t1-t2 t39t4`` (first four body tokens; one hyphenated pair +
    one letter-digit-letter compound) analyzed with
    Analyzer(word_delimiter=True) -> parts [t1, t2, t3, '9', t4], dl=5
    (< 24, smallfloat identity)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:wd1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import pyarrow.compute as pc
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        def _mk(b: pa.Table) -> pa.Table:
            ls = pc.split_pattern(b["text"], " ")
            t1, t2 = pc.list_element(ls, 0), pc.list_element(ls, 1)
            t3, t4 = pc.list_element(ls, 2), pc.list_element(ls, 3)
            pair = pc.binary_join_element_wise(t1, t2, "-")
            comp = pc.binary_join_element_wise(t3, t4, "9")
            wd = pc.binary_join_element_wise(pair, comp, " ")
            return b.select(["doc_id"]).append_column("wdtext", wd)

        ds = ray.data.read_parquet(docs, columns=["doc_id", "text"]) \
            .map_batches(_mk, batch_format="pyarrow")
        build_index(ds, idx, analyzer=Analyzer(word_delimiter=True),
                    text_col="wdtext", num_segments=4)
    return idx


def _ue_index_dir(sf_dir: str) -> str:
    """UAX29URLEmailTokenizer index (standard/UAX29URLEmailTokenizer
    .java:52, analysis/urlemail.py): derived column
    ``uetext = 'Visit https://site<k7>.example.com/p<k3> contact
    user<k5>@mail.example.org ok'`` (k_m = doc_id % m) analyzed with
    Analyzer(url_email=True) -> the URL and the email each index as ONE
    token, dl=5 for every doc."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:ue1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import pyarrow.compute as pc
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        def _mk(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False)
            ue = pa.array([
                f"Visit https://site{d % 7}.example.com/p{d % 3} "
                f"contact user{d % 5}@mail.example.org ok"
                for d in did])
            return b.select(["doc_id"]).append_column("uetext", ue)

        ds = ray.data.read_parquet(docs, columns=["doc_id"]) \
            .map_batches(_mk, batch_format="pyarrow")
        build_index(ds, idx, analyzer=Analyzer(url_email=True),
                    text_col="uetext", num_segments=4)
    return idx


def _rev_index_dir(sf_dir: str) -> str:
    """Reversed-token companion field (ReverseStringFilter,
    analysis/reverse/ReverseStringFilter.java:44): the documents text
    indexes twice — default field through StandardAnalyzer, field 'rev'
    through Analyzer(reverse_tokens=True) — so leading wildcards serve
    as prefix range scans (query.rewrite_leading_wildcard)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:rev1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        ds = ray.data.read_parquet(docs, columns=["doc_id", "text"]) \
            .map_batches(lambda b: b.append_column("rtext", b["text"]),
                         batch_format="pyarrow")
        build_index(ds, idx, num_segments=4,
                    extra_fields={"rev": "rtext"},
                    field_analyzers={"rev": Analyzer(reverse_tokens=True)})
    return idx


def _alt_tok_index_dir(sf_dir: str) -> str:
    """One index exercising the alternative raw tokenizers as extra
    fields (core/WhitespaceTokenizer-family, path/PathHierarchyTokenizer
    .java:40, pattern/PatternTokenizer.java:53): derived columns
    ``upath = '/cat<k4>/sub<k3>/page<k5>'`` (path_hierarchy field),
    ``kw = 'cat <k10>'`` (keyword field — the KeywordAnalyzer exact-match
    role; the space proves no splitting), ``csvc = 'a<k3>;b<k4>;c<k5>'``
    (pattern field split on ';'), with k_m = doc_id % m."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:alttok1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        def _mk(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False)
            return (b.select(["doc_id", "text"])
                    .append_column("upath", pa.array(
                        [f"/cat{d % 4}/sub{d % 3}/page{d % 5}"
                         for d in did]))
                    .append_column("kw", pa.array(
                        [f"cat {d % 10}" for d in did]))
                    .append_column("csvc", pa.array(
                        [f"a{d % 3};b{d % 4};c{d % 5}" for d in did])))

        ds = ray.data.read_parquet(docs, columns=["doc_id", "text"]) \
            .map_batches(_mk, batch_format="pyarrow")
        build_index(
            ds, idx, num_segments=4,
            extra_fields={"upath": "upath", "kw": "kw", "csvc": "csvc"},
            field_analyzers={
                "upath": Analyzer(tokenizer="path_hierarchy"),
                "kw": Analyzer(tokenizer="keyword"),
                "csvc": Analyzer(tokenizer="pattern",
                                 tokenizer_pattern=(";", -1)),
            })
    return idx


def _sq_index_dir(sf_dir: str) -> str:
    """Scalar-quantized (int8) vector index, cached per corpus."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"{emb}:{os.path.getsize(emb)}:{os.path.getmtime(emb)}:sq1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "sq_manifest.json")):
        from lucene_ray.index.vector import build_sq_index

        build_sq_index(emb, idx)
    return idx


def _ivfpq_index_dir(sf_dir: str) -> str:
    """IVFADC index (coarse quantizer + PQ residual codes), cached."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"{emb}:{os.path.getsize(emb)}:{os.path.getmtime(emb)}:ivfpq1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "ivfpq_manifest.json")):
        from lucene_ray.index.vector import build_ivfpq_index

        build_ivfpq_index(emb, idx, n_centroids=8, m=16, nbits=8)
    return idx


def _dvu_index_dir(sf_dir: str) -> str:
    """Numeric doc-values update fixture (IndexWriter.updateNumericDocValue,
    index/docvalues.py): feat_chars re-pointed to 1000 for doc_id%7==0 in
    TWO generations (the second overwrites half of the first with 2000 —
    later generations win)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:dvu1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.index.build import build_index

        build_index(docs, idx, num_segments=4,
                    features={"chars": "n_chars"})
    if not os.path.isdir(os.path.join(idx, "dv_updates")):
        import pyarrow.parquet as pq

        from lucene_ray.index.docvalues import update_doc_values

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"].to_numpy()
        g1 = ids[ids % 7 == 0]
        update_doc_values(idx, "chars", g1, np.full(g1.shape[0], 1000.0))
        g2 = ids[ids % 14 == 0]
        update_doc_values(idx, "chars", g2, np.full(g2.shape[0], 2000.0))
    return idx


def _sdvu_index_dir(sf_dir: str) -> str:
    """String doc-values update fixture (IndexWriter.updateBinaryDocValue,
    IndexWriter.java:1940; index/docvalues.update_string_doc_values): the
    'source' column indexes as string DV 'src'; gen0 re-points
    doc_id%7==0 to 'updated-a', gen1 re-points doc_id%14==0 to
    'updated-b' — later generations win."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:sdvu1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.index.build import build_index

        build_index(docs, idx, num_segments=4,
                    string_values={"src": "source"})
    if not os.path.isdir(os.path.join(idx, "dv_updates")):
        import pyarrow.parquet as pq

        from lucene_ray.index.docvalues import update_string_doc_values

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"].to_numpy()
        g1 = ids[ids % 7 == 0]
        update_string_doc_values(idx, "src", g1, ["updated-a"] * g1.shape[0])
        g2 = ids[ids % 14 == 0]
        update_string_doc_values(idx, "src", g2, ["updated-b"] * g2.shape[0])
    return idx


def _split_index_dirs(sf_dir: str) -> tuple:
    """PKIndexSplitter fixture (misc/index/PKIndexSplitter.java:42): the
    main index split by TermQuery('table') — side A = docs containing
    'table', side B = the rest; both physically materialized (stats and
    positions recomputed per side)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:split1".encode()
    ).hexdigest()[:12]
    root = os.path.join(_CACHE_ROOT, tag)
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    if not os.path.exists(os.path.join(b, "manifest.json")):
        from lucene_ray.index.split import split_index
        from lucene_ray.search import query as Q

        split_index(_index_dir(sf_dir), a, b, Q.TermQuery("table"))
    return a, b


def _iodv_index_dir(sf_dir: str) -> str:
    """IndexOrDocValuesQuery fixture (search/IndexOrDocValuesQuery.java:68):
    the SAME 'source' predicate is available through TWO plans — indexed
    as terms in field 'srcf' (extra_fields) AND as string doc values
    'src' (string_values) — mirroring the reference's usual pairing of a
    points/terms index query with its newSlowSetQuery DV twin."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:iodv1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.index.build import build_index

        build_index(docs, idx, num_segments=4,
                    extra_fields={"srcf": "source"},
                    string_values={"src": "source"})
    return idx


# Hunspell fixture dictionary: every corpus token is a dictionary word
# carrying the plural flag, so surface plurals analyze to their bases —
# deterministic from the corpus alone (no external dictionary files).
_HUNSPELL_AFF = "SET UTF-8\nSFX S Y 1\nSFX S 0 s .\n"


def _hunspell_vocab() -> list:
    """The UNION vocabulary across every sf dir — the oracle's smap is
    built from the same union, so index-side and SQL-side stem maps
    agree at whichever sf the driver evaluates (Hunspell stems depend on
    the dictionary contents, unlike the corpus-independent Porter)."""
    import glob as _glob

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    vocab: set = set()
    for d in sorted(_glob.glob("/root/testdata/sf*/documents.parquet")):
        t = _pq.read_table(d, columns=["text"])
        flat = _pc.list_flatten(
            _pc.split_pattern(t["text"].combine_chunks(), " "))
        vocab.update(_pc.unique(flat).to_pylist())
    return sorted(v for v in vocab if v)


def _hunspell_paths(sf_dir: str) -> tuple:
    """Write the deterministic .aff/.dic derived from the union corpus
    vocabulary (cached by content tag; sf-independent by design)."""
    vocab = _hunspell_vocab()
    tag = hashlib.sha1(
        ("hsdict1|" + "|".join(vocab[:1000]) + f"|{len(vocab)}").encode()
    ).hexdigest()[:12]
    d = os.path.join(_CACHE_ROOT, f"hs_{tag}")
    aff, dic = os.path.join(d, "corpus.aff"), os.path.join(d, "corpus.dic")
    if not (os.path.exists(aff) and os.path.exists(dic)):
        os.makedirs(d, exist_ok=True)
        with open(aff + ".tmp", "w") as f:
            f.write(_HUNSPELL_AFF)
        with open(dic + ".tmp", "w") as f:
            f.write(f"{len(vocab)}\n")
            f.writelines(f"{w}/S\n" for w in vocab)
        os.replace(aff + ".tmp", aff)
        os.replace(dic + ".tmp", dic)
    return aff, dic


def _hunspell_index_dir(sf_dir: str) -> str:
    """Index analyzed through HunspellStemFilter
    (analysis/hunspell/HunspellStemFilter.java:43; analysis/hunspell.py)
    over the corpus-derived dictionary."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    aff, dic = _hunspell_paths(sf_dir)
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
        f":c{CODEC_VERSION}:hs1".encode()).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx, analyzer=Analyzer(hunspell=(aff, dic)),
                    num_segments=4, stored_source=docs)
    return idx


def _pfo_index_dir(sf_dir: str) -> str:
    """Per-field postings format fixture (PerFieldPostingsFormat.java:71
    + IndexOptions.java:28): body field keeps positions, the title field
    registers as DOCS — no positions rows, term freqs flattened to 1
    (BM25 scores tf=1 per match, the IndexOptions.DOCS contract)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:pfo1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import ray.data

        from lucene_ray.data.webpages import with_title_column
        from lucene_ray.index.build import build_index

        ds = ray.data.read_parquet(
            docs, columns=["doc_id", "text"]
        ).map_batches(with_title_column, batch_format="pyarrow")
        build_index(ds, idx, num_segments=4, with_positions=True,
                    extra_fields={"title": "title"},
                    field_options={"title": "docs"},
                    stored_source=docs)
    return idx


def _do_index_dir(sf_dir: str) -> str:
    """KeywordRepeat + Porter with discountOverlaps=true (the reference's
    DEFAULT norm behavior, Similarity.java:151): repeats share positions,
    so field length = the ORIGINAL token count."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:do1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx,
                    analyzer=Analyzer(stem=True, keyword_repeat=True,
                                      discount_overlaps=True),
                    num_segments=4)
    return idx


def _cf_index_dir(sf_dir: str) -> str:
    """PatternReplaceCharFilter index (pattern/PatternReplaceCharFilter
    .java:40): the rule table->tbl rewrites the raw text pre-tokenize."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:cf1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx,
                    analyzer=Analyzer(char_filters=(("table", "tbl"),)),
                    num_segments=4)
    return idx


def _kr_index_dir(sf_dir: str) -> str:
    """KeywordRepeat + Porter index (miscellaneous/KeywordRepeatFilter
    .java:30): original AND stemmed token at the same position whenever
    they differ."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:kr1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx,
                    analyzer=Analyzer(stem=True, keyword_repeat=True),
                    num_segments=4)
    return idx


def _pq_index_dir(sf_dir: str) -> str:
    """Product-quantization index over embeddings.parquet (Jégou et al.
    TPAMI 2011), cached per corpus: m=16 subspaces x 256 codes."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"{emb}:{os.path.getsize(emb)}:{os.path.getmtime(emb)}:pq1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "pq_manifest.json")):
        from lucene_ray.index.vector import build_pq_index

        build_pq_index(emb, idx, m=16, nbits=8)
    return idx


def _len_index_dir(sf_dir: str) -> str:
    """LengthFilter index (miscellaneous/LengthFilter.java:31): tokens of
    char length in [4, 5] only; field length = surviving tokens."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:len1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx, analyzer=Analyzer(length_min=4, length_max=5),
                    num_segments=4)
    return idx


def _stem_index_dir(sf_dir: str) -> str:
    """EnglishStemAnalyzer index (stop words + Porter stem + ASCII fold)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}:c{CODEC_VERSION}:stem1".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import EnglishStemAnalyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx, analyzer=EnglishStemAnalyzer, num_segments=4,
                    stored_source=docs)
    return idx


_SNOWBALL_LANGS = {"german": "de", "french": "fr", "spanish": "es",
                   "portuguese": "pt", "italian": "it", "dutch": "nl",
                   "russian": "ru", "swedish": "sv", "norwegian": "no",
                   "danish": "da", "porter2": "en",
                   # round 5 (VERDICT #6)
                   "romanian": "ro", "finnish": "fi", "hungarian": "hu",
                   "turkish": "tr",
                   # round 5 second wave (analysis/snowball_more.py)
                   "armenian": "hy", "irish": "ga", "lithuanian": "lt",
                   "basque": "eu", "catalan": "ca", "estonian": "et",
                   "nepali": "ne", "tamil": "ta", "polish": "pl",
                   # round 5 third wave: the last two of the reference's
                   # snowball/ext directory (EsperantoStemmer.java,
                   # YiddishStemmer.java)
                   "esperanto": "eo", "yiddish": "yi"}


def _snowball_index_dir(sf_dir: str, lang: str) -> str:
    """Index analyzed with the language's Snowball stemmer
    (snowball/SnowballFilter.java:48 role; analysis/snowball.py)."""
    from lucene_ray.codec.postings import CODEC_VERSION

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
        f":c{CODEC_VERSION}:sb_{lang}2".encode()
    ).hexdigest()[:12]
    idx = os.path.join(_CACHE_ROOT, tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import build_index

        build_index(docs, idx, analyzer=Analyzer(stem_lang=lang),
                    num_segments=4, stored_source=docs)
    return idx


_SEARCHERS: dict[tuple[str, str], Any] = {}


def _searcher(sf_dir: str, mode: str = "f64"):
    key = (sf_dir, mode)
    if key not in _SEARCHERS:
        from lucene_ray.search.searcher import Searcher

        _SEARCHERS[key] = Searcher(_index_dir(sf_dir), mode=mode)
    return _SEARCHERS[key]


def _round6(x: float) -> float:
    """DuckDB-equivalent ROUND(x, 6) for a scalar (half away from zero)."""
    return float(np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6)


def _round4(x: np.ndarray) -> np.ndarray:
    """DuckDB-equivalent ROUND(x, 4): half away from zero on x*1e4 —
    numpy's np.round is half-to-even and disagrees at exact .5 boundaries
    (e.g. 1/32 -> 0.0313 vs 0.0312)."""
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4


def _all_hits_table(sf_dir: str, query) -> pa.Table:
    s = _searcher(sf_dir)
    docs, scores = s.search_all(query)
    order = np.argsort(docs)
    return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})


def _topk_table(sf_dir: str, query, k: int) -> pa.Table:
    """Top-k by (round4(score) desc, doc_id asc) — deterministic vs SQL."""
    s = _searcher(sf_dir)
    docs, scores = s.search_all(query)
    r = _round4(scores)
    order = np.lexsort((docs, -r))[:k]
    return pa.table(
        {
            "rank": np.arange(1, order.shape[0] + 1, dtype=np.int64),
            "doc_id": docs[order],
            "score": r[order],
        }
    )


def _query_head(emb_path: str, n: int = 3):
    """(query matrix, vec_ids) from the first ``n`` embedding rows —
    reads ONE row group, never the whole table."""
    import pyarrow.parquet as pq

    batch = next(pq.ParquetFile(emb_path).iter_batches(batch_size=n))
    head = pa.Table.from_batches([batch]).slice(0, n)
    return (np.stack(head["embedding"].to_pylist()),
            head["vec_id"].to_numpy())


def _pages_ds(sf_dir: str):
    from lucene_ray.data.webpages import webpages_dataset

    return webpages_dataset(sf_dir)


# ---------------------------------------------------------------------------
# entry: flagship pipeline
# ---------------------------------------------------------------------------

FLAGSHIP_QUERIES = [
    "table",
    "key value",
    "+table -key",
    '"key value"',
    "spark window customer",
]


def entry() -> Any:
    """Build the inverted index over sf0.001 web text and run the flagship
    BM25 top-10 query set (float32 Lucene-exact path, block-max pruning)."""
    sf_dir = "/root/testdata/sf0.001"
    s = _searcher(sf_dir, mode="f32")
    out = {"qid": [], "rank": [], "doc_id": [], "score": []}
    for qid, qtext in enumerate(FLAGSHIP_QUERIES):
        td = s.search(qtext, k=10)
        n = td.doc_ids.shape[0]
        out["qid"].extend([qid] * n)
        out["rank"].extend(range(1, n + 1))
        out["doc_id"].extend(int(d) for d in td.doc_ids)
        out["score"].extend(float(x) for x in td.scores)
    return pa.table(
        {
            "qid": pa.array(out["qid"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_ray.search import query as Q

    q: dict[str, Callable[[str], Any]] = {}

    # ---- BM25 / boolean / positional search (engine over real index) ----
    q["term_query"] = lambda sf: _all_hits_table(sf, Q.TermQuery("table"))
    q["term_query_topk"] = lambda sf: _topk_table(sf, Q.TermQuery("window"), 10)
    q["boolean_and"] = lambda sf: _all_hits_table(
        sf, Q.BooleanQuery(must=(Q.TermQuery("key"), Q.TermQuery("table")))
    )
    q["boolean_or_topk"] = lambda sf: _topk_table(
        sf,
        Q.BooleanQuery(
            should=(Q.TermQuery("spark"), Q.TermQuery("window"), Q.TermQuery("customer"))
        ),
        20,
    )
    q["boolean_must_not"] = lambda sf: _all_hits_table(
        sf, Q.BooleanQuery(must=(Q.TermQuery("table"),), must_not=(Q.TermQuery("key"),))
    )
    q["boolean_msm"] = lambda sf: _all_hits_table(
        sf,
        Q.BooleanQuery(
            should=(Q.TermQuery("spark"), Q.TermQuery("window"), Q.TermQuery("customer")),
            minimum_should_match=2,
        ),
    )
    q["boolean_filter"] = lambda sf: _all_hits_table(
        sf, Q.BooleanQuery(must=(Q.TermQuery("table"),), filter=(Q.TermQuery("window"),))
    )

    def _sim_topk(sf, mode, query, k=10):
        """Alternative Similarity search (similarities/ package ports):
        same index, scorer swapped via Searcher(mode=...)."""
        s = _searcher(sf, mode=mode)
        docs, scores = s.search_all(query)
        r = _round4(scores)
        order = np.lexsort((docs, -r))[:k]
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(r[order], type=pa.float64()),
        })

    q["lm_dirichlet_topk"] = lambda sf: _sim_topk(
        sf, "lm_dirichlet", Q.TermQuery("table"))
    q["lm_jm_topk"] = lambda sf: _sim_topk(sf, "lm_jm", Q.TermQuery("table"))
    q["classic_tfidf_topk"] = lambda sf: _sim_topk(
        sf, "classic", Q.TermQuery("table"))
    # DFR InL2 (DFRSimilarity.java:36 + BasicModelIn/AfterEffectL/NormalizationH2)
    q["dfr_inl2_topk"] = lambda sf: _sim_topk(
        sf, "dfr_inl2", Q.TermQuery("table"))
    # IB log-logistic/DF/H2 (IBSimilarity.java:60)
    q["ib_ll_topk"] = lambda sf: _sim_topk(sf, "ib_ll", Q.TermQuery("table"))
    # Axiomatic F2EXP (AxiomaticF2EXP.java:30)
    q["ax_f2exp_topk"] = lambda sf: _sim_topk(
        sf, "ax_f2exp", Q.TermQuery("table"))
    # SweetSpotSimilarity (misc/SweetSpotSimilarity.java:47): Classic tf/idf
    # with a plateau length norm — no penalty inside [30, 70] tokens.
    q["sweetspot_topk"] = lambda sf: _sim_topk(
        sf, "sweetspot:30:70", Q.TermQuery("table"))
    # DFI (DFISimilarity.java:54) with ChiSquared / Standardized measures
    q["dfi_chisquared_topk"] = lambda sf: _sim_topk(
        sf, "dfi_chisquared", Q.TermQuery("table"))
    q["dfi_standardized_topk"] = lambda sf: _sim_topk(
        sf, "dfi_standardized", Q.TermQuery("table"))
    # IndriDirichlet (IndriDirichletSimilarity.java:38) — negative logprobs
    q["indri_dirichlet_topk"] = lambda sf: _sim_topk(
        sf, "indri_dirichlet", Q.TermQuery("table"))
    # Axiomatic F1EXP / F2LOG / F3EXP (AxiomaticF1EXP.java:28 et al.)
    q["ax_f1exp_topk"] = lambda sf: _sim_topk(
        sf, "ax_f1exp", Q.TermQuery("table"))
    q["ax_f2log_topk"] = lambda sf: _sim_topk(
        sf, "ax_f2log", Q.TermQuery("table"))
    q["ax_f3exp_topk"] = lambda sf: _sim_topk(
        sf, "ax_f3exp", Q.TermQuery("table"))
    q["ax_f1log_topk"] = lambda sf: _sim_topk(
        sf, "ax_f1log", Q.TermQuery("table"))
    q["ax_f3log_topk"] = lambda sf: _sim_topk(
        sf, "ax_f3log", Q.TermQuery("table"))
    q["dfi_saturated_topk"] = lambda sf: _sim_topk(
        sf, "dfi_saturated", Q.TermQuery("table"))
    # DFR GB2 (BasicModelG + AfterEffectB + NormalizationH2)
    q["dfr_gb2_topk"] = lambda sf: _sim_topk(
        sf, "dfr_g_b_h2", Q.TermQuery("table"))
    # DFR I(ne)L2 (BasicModelIne + AfterEffectL + NormalizationH2)
    q["dfr_ine_l2_topk"] = lambda sf: _sim_topk(
        sf, "dfr_ine_l_h2", Q.TermQuery("table"))
    # IB SPL distribution + LambdaTTF (DistributionSPL.java:29)
    q["ib_spl_topk"] = lambda sf: _sim_topk(
        sf, "ib_spl_ttf", Q.TermQuery("table"))

    def _char_filter(sf):
        """PatternReplaceCharFilter (pattern/PatternReplaceCharFilter
        .java:40): 'table' rewrites to 'tbl' before tokenization, so the
        dictionary holds 'tbl' with identical stats."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_cf_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery("tbl"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["char_filter_query"] = _char_filter

    def _keyword_repeat(sf):
        """KeywordRepeatFilter (miscellaneous/KeywordRepeatFilter.java:30):
        the EXACT surface 'table' is only indexed because the repeat kept
        it alongside its stem 'tabl'; field length counts both."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_kr_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["keyword_repeat_query"] = _keyword_repeat

    def _discount_overlaps(sf):
        """discountOverlaps=true (Similarity.java:151, the reference
        default): keyword-repeat originals share their stem's position,
        so dl = the base token count — scores differ from
        keyword_repeat_query exactly by the norm."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_do_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["discount_overlaps_query"] = _discount_overlaps

    def _surround(sf):
        """Surround parser (queryparser/surround): `3w(spark, window) and
        customer` — ordered within-3 proximity (constant score 1) AND a
        BM25 term."""
        from lucene_ray.search.surround import parse_surround

        s = _searcher(sf)
        docs, scores = s.search_all(
            parse_surround("3w(spark, window) and customer"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["surround_query"] = _surround

    def _length_filter(sf):
        """LengthFilter (miscellaneous/LengthFilter.java:31): index keeps
        only tokens of length 4-5; BM25 over the filtered field lengths."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_len_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["length_filter_query"] = _length_filter

    def _complex_phrase(sf):
        """ComplexPhraseQueryParser -> PhraseWildcardQuery: the quoted
        phrase `"table s*"` (concrete slot + prefix slot) parses to a
        segment-expanded wildcard phrase, scored with the concrete slot's
        idf over the phrase freq."""
        from lucene_ray.search.parser import parse_query

        s = _searcher(sf)
        docs, scores = s.search_all(parse_query('"table s*"'))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["complex_phrase_query"] = _complex_phrase

    def _source_files(sf):
        """Deterministic line-doc + TREC fixture files derived from the
        documents table (cached per corpus)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from lucene_ray.data.sources import write_line_docs, write_trec

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:src1".encode()).hexdigest()[:12]
        d = os.path.join(_CACHE_ROOT, tag)
        os.makedirs(d, exist_ok=True)
        line_path = os.path.join(d, "docs.tsv")
        trec_path = os.path.join(d, "docs.trec")
        if not (os.path.exists(line_path) and os.path.exists(trec_path)):
            t = pq.read_table(docs, columns=["doc_id", "text"])
            title = pc.binary_join(
                pc.list_slice(pc.split_pattern(t["text"], " "), 0, 2), " ")
            write_line_docs(t.append_column("title", title), line_path,
                            title_col="title")
            write_trec(t, trec_path)
        return line_path, trec_path

    def _linedoc(sf):
        """LineDocSource (benchmark/byTask/feeds/LineDocSource.java:47):
        one-doc-per-line TSV round-trip — doc ids are line numbers, which
        equal the source doc_ids because the writer preserves order."""
        from lucene_ray.data.sources import read_line_docs

        line_path, _ = _source_files(sf)
        ds = read_line_docs(line_path)

        def stats(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = pc.list_value_length(pc.split_pattern(b["text"], " "))
            return pa.table({
                "doc_id": b["doc_id"],
                "title": b["title"],
                "n_tokens": n.cast(pa.int64()),
            })

        t = pa.concat_tables(
            ds.map_batches(stats, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        return t.sort_by([("doc_id", "ascending")])

    q["linedoc_source_stats"] = _linedoc

    def _trec(sf):
        """TrecContentSource (feeds/TrecContentSource.java:63): SGML <DOC>
        block round-trip with DOCNO = doc_id."""
        from lucene_ray.data.sources import read_trec

        _, trec_path = _source_files(sf)
        ds = read_trec(trec_path)

        def stats(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = pc.list_value_length(pc.split_pattern(b["text"], " "))
            return pa.table({"doc_id": b["doc_id"],
                             "n_tokens": n.cast(pa.int64())})

        t = pa.concat_tables(
            ds.map_batches(stats, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        return t.sort_by([("doc_id", "ascending")])

    q["trec_source_stats"] = _trec

    def _bench_alg(sf):
        """Benchmark .alg task algebra (benchmark/byTask/Benchmark
        .java:48, utils/Algorithm.java, tasks/TaskSequence.java;
        pipelines/taskalg.py): the indexing-multithreaded.alg shape —
        2 rounds of (erase -> populate with a 4-worker parallel AddDoc
        group until the content source drains -> ForceMerge(2) ->
        CloseIndex builds the REAL index -> 10 searches) — then
        RepSumByName's per-task counts. Counts are deterministic in
        the table size (the SQL twin derives them from count(*));
        elapsed is dropped from the oracle-checked output."""
        import pyarrow.parquet as pq

        from lucene_ray.pipelines.taskalg import engine_tasks, run_alg

        docs = os.path.join(sf, "documents.parquet")
        tbl = pq.read_table(docs, columns=["doc_id", "text"])
        idx = os.path.join(_CACHE_ROOT, "alg_run_idx")
        script = """
log.step=2000
{ "Rounds"
    ResetSystemErase
    { "Populate" CreateIndex [ { AddDoc } : * ] : 4 ForceMerge(2) CloseIndex }
    OpenReader
    { "Searching" Search } : 10
    NewRound
} : 2
RepSumByName
"""
        rows, _ctx = run_alg(script, engine_tasks(
            tbl, idx, queries=("table", "key", "value")))
        return pa.table({
            "task": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
        })

    q["bench_alg_report"] = _bench_alg

    def _collation_sort(sf):
        """ICUCollationKeyAnalyzer / ICUCollationDocValuesField roles
        (collation/ICUCollationKeyAnalyzer.java:43,
        ICUCollationDocValuesField.java:34; analysis/collation.py UCA
        three-level keys): a deterministic accented-German word column
        (word = vocab[doc_id % 17]) gets a binary collation key as a
        Dataset stage, a plain ds.sort on the key column is then the
        locale-collated sort. Top-40 (key, doc_id) with ranks; the SQL
        twin is DuckDB's INDEPENDENT ICU collation (ORDER BY word
        COLLATE de)."""
        import ray.data

        from lucene_ray.analysis.collation import add_collation_key

        docs = os.path.join(sf, "documents.parquet")
        ds = ray.data.read_parquet(docs, columns=["doc_id"])
        vocab = np.array(_COLLATE_VOCAB)

        def add_word(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "word", pa.array(vocab[ids % len(vocab)]))

        ds = add_collation_key(
            ds.map_batches(add_word, batch_format="pyarrow"),
            "word", locale="de")
        top = pa.Table.from_pylist(
            ds.sort(["sort_key", "doc_id"]).limit(40).take_all())
        return pa.table({
            "rank": np.arange(1, top.num_rows + 1, dtype=np.int64),
            "doc_id": top["doc_id"],
            "word": top["word"],
        })

    q["collation_sort_query"] = _collation_sort

    def _lang_id_script(sf):
        """Writing-system routing prior of the language identifier
        (pipelines/textstats.LangId._script_route — the CLD-style
        script heuristic feeding analyzer_for_lang's 23-language
        registry): a deterministic 10-script corpus (row i = sample
        text of script[i%10]) classifies per row; the SQL twin knows
        each row's script by construction (VALUES join on doc_id % 10
        — fully independent of the classifier)."""
        import ray.data

        from lucene_ray.pipelines.textstats import lang_id

        docs = os.path.join(sf, "documents.parquet")
        ds = ray.data.read_parquet(docs, columns=["doc_id"])
        texts = np.array([t for _lg, t in _SCRIPT_ROUTE_ROWS])

        def add_text(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "text", pa.array(texts[ids % len(texts)]))

        out = lang_id(ds.map_batches(add_text, batch_format="pyarrow"),
                      concurrency=2).select_columns(["doc_id", "lang_pred"])
        t = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                              batch_size=1 << 16))
        return t.sort_by([("doc_id", "ascending")])

    q["lang_id_script"] = _lang_id_script

    def _curation(sf):
        """End-to-end curation composition — ONE streaming Dataset
        pipeline chaining the training-data ops: crawl (with re-crawls)
        -> latest-wins URL dedup -> quality filter (>= 20 tokens) ->
        language routing (en/de) -> per-lang corpus stats. Every stage is
        the library operator, not a bespoke re-implementation."""
        import pyarrow.compute as pc
        from ray.data.aggregate import Count, Sum

        from lucene_ray.analysis.batch import tokenize_column
        from lucene_ray.pipelines.dedup import dedup_exact

        ds = dedup_exact(_pages_ds(sf), key="url")

        def qfilter(b: pa.Table) -> pa.Table:
            # cheap lang routing FIRST so only kept rows pay tokenization
            b = b.filter(pc.is_in(b["lang"],
                                  value_set=pa.array(["en", "de"])))
            texts = b["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            _flat, di, _pos = tokenize_column(texts)
            tc = np.zeros(b.num_rows, dtype=np.int64)
            np.add.at(tc, di, 1)
            b = b.append_column("token_count", pa.array(tc))
            return b.filter(pa.array(tc >= 20)).select(
                ["lang", "token_count"])

        agg = (
            ds.map_batches(qfilter, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(), Sum("token_count", alias_name="sum_tokens"))
        )
        t = pa.concat_tables(
            agg.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        t = pa.table({
            "lang": t["lang"],
            "n_docs": t["count()"].cast(pa.int64()),
            "sum_tokens": t["sum_tokens"].cast(pa.int64()),
        })
        return t.sort_by([("lang", "ascending")])

    q["curation_pipeline"] = _curation

    def _curation_multilingual(sf):
        """Multilingual curation end-to-end (VERDICT r4 #8): crawl with
        re-crawls -> latest-wins URL dedup (pipelines/dedup.dedup_exact)
        -> quality filter (>= 20 tokens) -> language routing
        (analyzers.analyzer_for_lang: en Porter+stop chain, de/es/fr
        Snowball chains, zh StandardAnalyzer fallback) -> one STEMMED
        index per language -> per-language BM25 TermQuery('table'
        through each chain's own normalize). Rows (lang, doc_id,
        score)."""
        import pyarrow.compute as pc

        from lucene_ray.analysis.analyzers import analyzer_for_lang
        from lucene_ray.analysis.batch import tokenize_column
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.pipelines.dedup import dedup_exact
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        langs = ("de", "en", "es", "fr", "zh")

        def qfilter(b: pa.Table) -> pa.Table:
            b = b.select(["doc_id", "text", "lang"])
            texts = b["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            _flat, di, _pos = tokenize_column(texts)
            tc = np.zeros(b.num_rows, dtype=np.int64)
            np.add.at(tc, di, 1)
            return b.filter(pa.array(tc >= 20))

        out_lang, out_doc, out_score = [], [], []
        curated = None
        for lang in langs:
            tag = hashlib.sha1(
                f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
                f":c{CODEC_VERSION}:curml1:{lang}".encode()
            ).hexdigest()[:12]
            idx = os.path.join(_CACHE_ROOT, tag)
            if not os.path.exists(os.path.join(idx, "manifest.json")):
                if curated is None:
                    # ONE streaming pass: dedup + quality, reused by
                    # every per-language build
                    curated = dedup_exact(_pages_ds(sf), key="url") \
                        .map_batches(qfilter, batch_format="pyarrow") \
                        .materialize()
                ds_lang = curated.filter(
                    expr=f"lang == '{lang}'").select_columns(
                    ["doc_id", "text"])
                build_index(ds_lang, idx,
                            analyzer=analyzer_for_lang(lang),
                            num_segments=2)
            s = Searcher(idx, mode="f64")
            d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize("table")))
            order = np.argsort(d)
            out_lang += [lang] * d.shape[0]
            out_doc.append(d[order])
            out_score.append(_round4(sc[order]))
        return pa.table({
            "lang": pa.array(out_lang, pa.string()),
            "doc_id": pa.array(np.concatenate(out_doc)
                               if out_doc else np.empty(0, np.int64)),
            "score": pa.array(np.concatenate(out_score)
                              if out_score else np.empty(0, np.float64)),
        })

    q["curation_multilingual"] = _curation_multilingual

    def _url_canon(sf):
        """URL canonicalization (RFC 3986 syntax-based normalization +
        tracking-param strip): messy URLs synthesized deterministically
        from (doc_id, source), then canonicalized vectorized."""
        import pyarrow.compute as pc
        import ray.data

        from lucene_ray.pipelines.webtext import canonicalize_urls

        def _mk(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            src = b["source"].to_pylist()
            urls = [
                (f"HTTPS://WWW.{s}.Example.COM:443/Path/{i}/"
                 f"?utm_source=feed&id={i % 7}&fbclid=abc#frag")
                if i % 2 == 0 else
                f"http://{s}.example.com:80/p?id={i % 7}&utm_medium=x"
                for i, s in zip(ids, src)
            ]
            return pa.table({"doc_id": b["doc_id"],
                             "url": pa.array(urls, type=pa.string())})

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "source"]).map_batches(
                _mk, batch_format="pyarrow")
        t = pa.concat_tables(
            canonicalize_urls(ds).iter_batches(batch_format="pyarrow",
                                               batch_size=1 << 16)
        ).select(["doc_id", "canon_url"])
        return t.sort_by([("doc_id", "ascending")])

    q["url_canonicalize"] = _url_canon

    def _shared_windows(sf):
        """Exact-substring dedup (Lee et al. ACL 2022, windowed-hash
        variant): doc pairs sharing >= 1 exact 6-token run, with the
        count of distinct shared windows."""
        import ray.data

        from lucene_ray.pipelines.dedup import shared_window_pairs

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"])
        batches = list(
            shared_window_pairs(ds, k=6)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        if not batches:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n_windows": pa.array([], pa.int64())})
        t = pa.concat_tables(batches)
        return t.sort_by([("a", "ascending"), ("b", "ascending")])

    q["shared_window_pairs"] = _shared_windows

    def _dedup_clusters(sf):
        """Near-dup CLUSTERING (Kiveris et al. SoCC 2014 label
        propagation): connected components over the shared-window pair
        edges; cluster id = component min doc id (the survivor rule)."""
        import ray.data

        from lucene_ray.pipelines.dedup import (dedup_clusters,
                                                shared_window_pairs)

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"])
        pairs = shared_window_pairs(ds, k=6)
        labels = dedup_clusters(pairs)
        t = pa.concat_tables(
            labels.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        t = pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                      "cluster": t["cluster"].cast(pa.int64())})
        return t.sort_by([("doc_id", "ascending")])

    q["dedup_clusters"] = _dedup_clusters

    def _word_delim(sf):
        """WordDelimiterGraphFilter (miscellaneous/
        WordDelimiterGraphFilter.java:88): the `wdtext = t1-t2 t39t4`
        column indexes as parts [t1, t2, t3, '9', t4]; BM25 term query
        over the part vocabulary."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_wd_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["word_delimiter_query"] = _word_delim

    def _uax29_urlemail(sf):
        """UAX29URLEmailTokenizer (standard/UAX29URLEmailTokenizer
        .java:52; analysis/urlemail.py): URL and EMAIL productions index
        as single tokens. BM25 term queries for one full URL token and
        one full email token over the derived uetext corpus."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_ue_index_dir(sf), mode="f64")
        parts = []
        for tag, term in (("url", "https://site3.example.com/p1"),
                          ("email", "user2@mail.example.org")):
            docs, scores = s.search_all(Q.TermQuery(term))
            order = np.argsort(docs)
            parts.append(pa.table({
                "q": pa.array([tag] * len(docs)),
                "doc_id": pa.array(docs[order], type=pa.int64()),
                "score": pa.array(_round4(scores[order]),
                                  type=pa.float64()),
            }))
        return pa.concat_tables(parts).sort_by(
            [("q", "ascending"), ("doc_id", "ascending")])

    q["uax29_urlemail_query"] = _uax29_urlemail

    def _mk_alt_tok_query(fieldname, term, doc):
        def _alt_q(sf):
            from lucene_ray.search.searcher import Searcher

            s = Searcher(_alt_tok_index_dir(sf), mode="f64")
            docs, scores = s.search_all(
                Q.TermQuery(term, field=fieldname))
            order = np.argsort(docs)
            return pa.table({
                "doc_id": pa.array(docs[order], type=pa.int64()),
                "score": pa.array(_round4(scores[order]),
                                  type=pa.float64())})
        _alt_q.__doc__ = doc
        return _alt_q

    q["path_hierarchy_query"] = _mk_alt_tok_query(
        "upath", "/cat2/sub1",
        "PathHierarchyTokenizer (path/PathHierarchyTokenizer.java:40): "
        "every path prefix of '/cat<k4>/sub<k3>/page<k5>' indexes at "
        "position 0; BM25 TermQuery for the two-component prefix "
        "'/cat2/sub1' (dl=3 per doc).")
    q["keyword_analyzer_query"] = _mk_alt_tok_query(
        "kw", "cat 7",
        "KeywordTokenizer (core/KeywordTokenizer.java:28 — the "
        "KeywordAnalyzer exact-match role): 'cat <k10>' indexes as ONE "
        "token, space included; BM25 TermQuery for the exact value.")
    q["pattern_tokenizer_query"] = _mk_alt_tok_query(
        "csvc", "b2",
        "PatternTokenizer split mode (pattern/PatternTokenizer.java:53): "
        "'a<k3>;b<k4>;c<k5>' splits on ';' into three tokens; BM25 "
        "TermQuery for 'b2'.")

    def _quality(sf):
        """Relevance-quality harness (benchmark/quality/QualityBenchmark
        .java:37): three deterministic topics, qrels = docs containing ALL
        topic terms (computed by the engine's own verified conjunction),
        ranked list = disjunctive BM25 top-10; per-topic P@10 / AP / nDCG /
        recall."""
        from lucene_ray.pipelines.quality import evaluate_topics

        s = _searcher(sf)
        qrels = {
            qid: set(s.search_all(Q.BooleanQuery(
                must=tuple(Q.TermQuery(t) for t in terms)))[0].tolist())
            for qid, terms in QUALITY_TOPICS
        }
        return evaluate_topics(s, QUALITY_TOPICS, qrels, k=10)

    q["quality_eval"] = _quality

    def _simple_parser(sf):
        """SimpleQueryParser (queryparser/simple/SimpleQueryParser.java:33):
        lenient end-user syntax `table + wind* | customer -key` -> BM25-
        scored boolean (AND binds tighter; `-` = MUST_NOT; `*` = prefix,
        constant score 1.0)."""
        from lucene_ray.search.simpleparser import parse_simple_query

        s = _searcher(sf)
        docs, scores = s.search_all(
            parse_simple_query("table + wind* | customer -key"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["simple_query_parser"] = _simple_parser

    def _boolean_sim(sf):
        """BooleanSimilarity: every match scores exactly the boost."""
        s = _searcher(sf, mode="boolean")
        docs, scores = s.search_all(Q.BoostQuery(Q.TermQuery("table"), 2.5))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["boolean_sim_scores"] = _boolean_sim

    def _covering(sf):
        """CoveringQuery (sandbox/search/CoveringQuery.java:56): docs where
        at least minMatch(doc) of the three term queries match, minMatch
        read per-doc from the feat_mm column (1 + n_chars%3); score = sum
        of the matching subs' BM25 scores."""
        s = _searcher(sf)
        docs, scores = s.search_all(Q.CoveringQuery(
            (Q.TermQuery("spark"), Q.TermQuery("window"),
             Q.TermQuery("customer")),
            min_match_feature="mm",
        ))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(_round4(scores[order]), type=pa.float64()),
        })

    q["covering_query"] = _covering

    def _dv_stats(sf):
        """DocValuesStats (misc/search/DocValuesStats.java:29): numeric
        field stats (feat_chars = n_chars) over docs matching 'table'."""
        st = _searcher(sf).doc_values_stats(Q.TermQuery("table"), "chars")
        return pa.table({
            "count": pa.array([st["count"]], type=pa.int64()),
            "vmin": pa.array([st["vmin"]], type=pa.float64()),
            "vmax": pa.array([st["vmax"]], type=pa.float64()),
            "vsum": pa.array([st["vsum"]], type=pa.float64()),
            "mean": pa.array([_round6(st["mean"])], type=pa.float64()),
            "variance": pa.array([_round6(st["variance"])],
                                 type=pa.float64()),
        })

    q["doc_values_stats"] = _dv_stats

    def _dv_update_stats(sf):
        """Numeric doc-values UPDATES (IndexWriter.updateNumericDocValue,
        IndexWriter.java:1892): same DocValuesStats over feat_chars after
        two committed update generations (1000 for doc_id%7==0, then 2000
        for doc_id%14==0 — later generation wins)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_dvu_index_dir(sf), mode="f64")
        st = s.doc_values_stats(Q.TermQuery("table"), "chars")
        return pa.table({
            "count": pa.array([st["count"]], type=pa.int64()),
            "vmin": pa.array([st["vmin"]], type=pa.float64()),
            "vmax": pa.array([st["vmax"]], type=pa.float64()),
            "vsum": pa.array([st["vsum"]], type=pa.float64()),
        })

    q["doc_values_update_stats"] = _dv_update_stats

    def _dv_binary_update(sf):
        """String/binary doc-values UPDATES
        (IndexWriter.updateBinaryDocValue, IndexWriter.java:1940): value
        counts of the 'src' string DV over docs matching 'table' AFTER
        two committed update generations (doc_id%7==0 -> 'updated-a',
        then doc_id%14==0 -> 'updated-b' — later generation wins)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_sdvu_index_dir(sf), mode="f64")
        return s.string_doc_values_counts(Q.TermQuery("table"), "src")

    q["doc_values_binary_update"] = _dv_binary_update

    def _dv_range(sf):
        """Slow numeric doc-values range query
        (document/SortedNumericDocValuesField.java:108 newSlowRangeQuery,
        executor SortedNumericDocValuesRangeQuery.java:48) used in its
        intended role — the verification side of a conjunction: docs
        matching 'table' whose feat_chars DV (with the two committed
        numeric update generations overlaid: doc_id%7 -> 1000, then
        doc_id%14 -> 2000) lies in [150, 1500]. The engine's filter loop
        probes ONLY the term candidates (scoring._dv_mask_at)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_dvu_index_dir(sf), mode="f64")
        docs, _ = s.search_all(Q.BooleanQuery(filter=(
            Q.TermQuery("table"),
            Q.DocValuesRangeQuery("chars", 150.0, 1500.0),
        )))
        return pa.table({"doc_id": np.sort(docs)})

    q["dv_range_query"] = _dv_range

    def _dv_set(sf):
        """Slow string doc-values set query
        (document/SortedDocValuesField.java:126 newSlowSetQuery): docs
        matching 'table' whose 'src' string DV (update generations
        overlaid: doc_id%7 -> 'updated-a', then doc_id%14 ->
        'updated-b') is in {'updated-a', 'src3'}."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_sdvu_index_dir(sf), mode="f64")
        docs, _ = s.search_all(Q.BooleanQuery(filter=(
            Q.TermQuery("table"),
            Q.DocValuesSetQuery("src", ("updated-a", "src3")),
        )))
        return pa.table({"doc_id": np.sort(docs)})

    q["dv_set_query"] = _dv_set

    def _dv_multi_range(sf):
        """Multi-range doc-values query
        (sandbox/search/SortedNumericDocValuesMultiRangeQuery.java:49,
        DocValuesMultiRangeQuery.java builders): docs matching 'table'
        whose overlaid feat_chars DV falls in ANY of [150,400], [380,700]
        (overlapping — the engine merges them to [150,700] first, like
        the reference) or [1900,2100] (catches the gen-1 2000 updates)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_dvu_index_dir(sf), mode="f64")
        docs, _ = s.search_all(Q.BooleanQuery(filter=(
            Q.TermQuery("table"),
            Q.DocValuesMultiRangeQuery(
                "chars", ((150.0, 400.0), (380.0, 700.0), (1900.0, 2100.0))),
        )))
        return pa.table({"doc_id": np.sort(docs)})

    q["dv_multi_range_query"] = _dv_multi_range

    def _index_or_dv(sf):
        """IndexOrDocValuesQuery (search/IndexOrDocValuesQuery.java:68):
        one predicate, two plans — 'source in {src3, src5}' indexed as
        terms in field 'srcf' AND as string DV 'src'. As a FILTER clause
        of a conjunction the engine verifies the term candidates through
        the DV column; standalone it runs the index plan (pytest asserts
        both plans agree)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_iodv_index_dir(sf), mode="f64")
        iodv = Q.IndexOrDocValuesQuery(
            Q.TermInSetQuery(("src3", "src5"), field="srcf"),
            Q.DocValuesSetQuery("src", ("src3", "src5")),
        )
        docs, _ = s.search_all(Q.BooleanQuery(filter=(
            Q.TermQuery("table"), iodv)))
        return pa.table({"doc_id": np.sort(docs)})

    q["index_or_dv_query"] = _index_or_dv

    def _matches_api(sf):
        """Matches API (search/Matches.java:33, MatchesIterator.java:38,
        Weight#matches): every exact-phrase occurrence of "key value" —
        start/end positions AND offsets — in the 3 lowest-id matching
        docs. Offsets come from the positional index rows, no
        re-analysis (ExactPhraseMatcher span shape: first token start ..
        last token end)."""
        s = _searcher(sf)
        docs, _ = s.search_all(Q.PhraseQuery(("key", "value")))
        rows = {"doc_id": [], "start_pos": [], "end_pos": [],
                "start_off": [], "end_off": []}
        for d in sorted(int(x) for x in docs)[:3]:
            for _f, _label, sp, ep, so, eo in s.matches(
                    Q.PhraseQuery(("key", "value")), d):
                rows["doc_id"].append(d)
                rows["start_pos"].append(sp)
                rows["end_pos"].append(ep)
                rows["start_off"].append(so)
                rows["end_off"].append(eo)
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in rows.items()})

    q["matches_api"] = _matches_api

    def _function_range(sf):
        """FunctionRangeQuery (queries/function/FunctionRangeQuery.java:44
        + ValueSourceScorer.java:39): docs where the computed function
        sqrt(chars) + mm of two numeric DVs lies in [14, 22]; the score
        IS the function value, like the reference's range scorer."""
        s = _searcher(sf)
        docs, scores = s.search_all(Q.FunctionRangeQuery(
            "sqrt(chars) + mm", ("chars", "mm"), 14.0, 22.0))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order],
                         "fval": _round4(scores[order])})

    q["function_range_query"] = _function_range

    def _multi_field_parser(sf):
        """MultiFieldQueryParser (queryparser/classic/
        MultiFieldQueryParser.java:42,118): 'table window' parsed across
        (body, title) — each unfielded term expands to a SHOULD
        disjunction of per-field copies; scores sum per BM25 over each
        field's own stats (title = first 4 body tokens)."""
        from lucene_ray.search.parser import parse_multi_field

        s = _searcher(sf)
        docs, scores = s.search_all(
            parse_multi_field("table window", (None, "title")))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order],
                         "score": _round4(scores[order])})

    q["multi_field_parser_query"] = _multi_field_parser

    def _index_split(sf):
        """PKIndexSplitter (misc/index/PKIndexSplitter.java:42,105): the
        corpus index split by TermQuery('table'); querying 'window' over
        side A returns exactly the docs containing BOTH terms (side A =
        the 'table' docs, physically materialized via the tombstone-
        squeezing tiered merge — DocIDMerger role), and sides A+B
        partition the corpus."""
        from lucene_ray.search.searcher import Searcher

        a, b = _split_index_dirs(sf)
        sa, sb = Searcher(a, mode="f64"), Searcher(b, mode="f64")
        w, _ = sa.search_all(Q.TermQuery("window"))
        na, _ = sa.search_all(Q.MatchAllDocsQuery())
        nb, _ = sb.search_all(Q.MatchAllDocsQuery())
        return pa.table({
            "doc_id": np.sort(w),
            "n_first": pa.array([int(na.shape[0])] * w.shape[0],
                                type=pa.int64()),
            "n_second": pa.array([int(nb.shape[0])] * w.shape[0],
                                 type=pa.int64()),
        })

    q["index_split_query"] = _index_split

    def _quality_bench(sf):
        """Search-quality evaluation (benchmark/quality/
        QualityBenchmark.java:44 + QualityStats.java:27 + Judge.java:26):
        P@10 / recall@10 / truncated AP / MRR per query term against a
        deterministic tf>=2 Judge, ranked by (round4(BM25) desc, doc_id)."""
        from lucene_ray.pipelines.quality_eval import quality_benchmark

        s = _searcher(sf)
        rows = quality_benchmark(s, sorted(["table", "window", "spark"]),
                                 k=10, min_tf=2)
        return pa.table({
            "query": pa.array([r["query"] for r in rows]),
            "p_at_k": pa.array([round(r["p_at_k"], 6) for r in rows],
                               type=pa.float64()),
            "recall_at_k": pa.array(
                [round(r["recall_at_k"], 6) for r in rows],
                type=pa.float64()),
            "avg_precision": pa.array(
                [round(r["avg_precision"], 6) for r in rows],
                type=pa.float64()),
            "reciprocal_rank": pa.array(
                [round(r["reciprocal_rank"], 6) for r in rows],
                type=pa.float64()),
        })

    q["quality_benchmark"] = _quality_bench

    def _top_passages(sf):
        """Scored multi-passage highlighting (UnifiedHighlighter
        PassageScorer role, highlighter/uhighlight/PassageScorer.java:42):
        for the 3 lowest docs containing both 'scan' and 'column', the
        top-3 fixed 10-token windows ranked by summed tf*idf of the
        query terms (ties -> earliest window)."""
        from lucene_ray.search.highlight import top_passages

        s = _searcher(sf)
        docs, _ = s.search_all(Q.BooleanQuery(
            must=(Q.TermQuery("scan"), Q.TermQuery("column"))))
        sel = sorted(int(x) for x in docs)[:3]
        t = top_passages(s, sel, {"scan", "column"},
                         max_passages=3, window=10)
        return pa.table({
            "doc_id": t["doc_id"],
            "win_start": t["win_start"],
            "score": pa.array(
                _round4(t["score"].to_numpy(zero_copy_only=False)),
                type=pa.float64()),
        })

    q["top_passages"] = _top_passages

    def _sort_string_dv(sf):
        """Sort-by-SortedDocValues (TopFieldCollector + Sort.STRING role,
        through the public collector hook): top-10 docs matching 'table'
        ordered by the 'src' string DV — with the committed update
        generations overlaid, so the sort keys include 'updated-*'."""
        from lucene_ray.search.collectors import \
            TopFieldStringDVCollectorManager
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_sdvu_index_dir(sf), mode="f64")
        pairs = s.search_with_collector(
            Q.TermQuery("table"),
            TopFieldStringDVCollectorManager("src", k=10))
        return pa.table({
            "rank": pa.array(range(1, len(pairs) + 1), pa.int64()),
            "value": pa.array([p[0] for p in pairs], pa.string()),
            "doc_id": pa.array([p[1] for p in pairs], pa.int64()),
        })

    q["sort_by_string_dv"] = _sort_string_dv

    def _sort_expression(sf):
        """Sort by a computed expression of numeric DVs (the expressions
        sort binding, expressions/Expression.getSortField +
        ExpressionValueSource, through the public collector hook):
        top-10 docs matching 'table' by chars - 2*mm descending."""
        from lucene_ray.search.collectors import \
            TopFieldExpressionCollectorManager

        s = _searcher(sf)
        pairs = s.search_with_collector(
            Q.TermQuery("table"),
            TopFieldExpressionCollectorManager(
                "chars - 2*mm", ("chars", "mm"), k=10))
        return pa.table({
            "rank": pa.array(range(1, len(pairs) + 1), pa.int64()),
            "value": pa.array([p[0] for p in pairs], pa.float64()),
            "doc_id": pa.array([p[1] for p in pairs], pa.int64()),
        })

    q["sort_by_expression"] = _sort_expression

    def _scoring_rewrite(sf):
        """MultiTermQuery.SCORING_BOOLEAN_QUERY_REWRITE
        (search/MultiTermQuery.java:86, ScoringRewrite.java:39): the
        prefix 's*' rewrites against the top-level dictionary into a
        SHOULD BooleanQuery of TermQueries — every doc scores the SUM of
        its matched expanded terms' BM25 (vs the default constant-score
        union)."""
        s = _searcher(sf)
        docs, scores = s.search_all(
            Q.ScoringRewriteQuery(Q.PrefixQuery("s")))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order],
                         "score": _round4(scores[order])})

    q["scoring_rewrite_prefix"] = _scoring_rewrite

    def _flexible_parser(sf):
        """Flexible/precedence parser (queryparser/flexible/standard/
        StandardQueryParser.java:71): 'table AND key OR window' parses
        with AND binding tighter — match set (table∧key)∨window. The
        classic parser's modifier rewrite yields +table +key window,
        which EXCLUDES window-only docs; the differing doc set is the
        precedence case the flexible pipeline exists to fix."""
        from lucene_ray.search.flexible import parse_flexible

        s = _searcher(sf)
        docs, _sc = s.search_all(parse_flexible("table AND key OR window"))
        return pa.table({"doc_id": np.sort(docs)})

    q["flexible_parser_query"] = _flexible_parser

    def _per_field_codec(sf):
        """Per-field postings format (PerFieldPostingsFormat.java:71):
        the title field registered as IndexOptions.DOCS — BM25 over
        title:table scores tf=1 for every matching doc (freqs flattened
        at write; the codec's freq-1 stream carries no freq payload)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_pfo_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery("table", field="title"))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order],
                         "score": _round4(scores[order])})

    q["per_field_codec_query"] = _per_field_codec

    def _hunspell_query(sf):
        """HunspellStemFilter (hunspell/HunspellStemFilter.java:43;
        Dictionary.java/Stemmer.java roles in analysis/hunspell.py): BM25
        over a Hunspell-analyzed index — 'tables' analyzes to base
        'table' through the corpus-derived .aff/.dic, the query term
        through the same chain."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_hunspell_index_dir(sf), mode="f64")
        docs, scores = s.search_all(
            Q.TermQuery(s.analyzer.normalize("tables")))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order],
                         "score": _round4(scores[order])})

    q["hunspell_analyzer_query"] = _hunspell_query

    def _xml_parser(sf):
        """XML query parser (queryparser/xml/CoreParser.java:48 + the
        builders/ registry): a BooleanQuery document with occurs
        modifiers, a RangeQuery and minimumNumberShouldMatch — match set
        = table ∧ (range[scan..sort] ∨ window) ∧ ¬key."""
        from lucene_ray.search.xmlparser import parse_xml_query

        s = _searcher(sf)
        xml = """
        <BooleanQuery minimumNumberShouldMatch="1">
          <Clause occurs="must"><TermQuery>table</TermQuery></Clause>
          <Clause occurs="should">
            <RangeQuery lowerTerm="scan" upperTerm="sort"/>
          </Clause>
          <Clause occurs="should"><TermQuery>window</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>key</TermQuery></Clause>
        </BooleanQuery>"""
        docs, _sc = s.search_all(parse_xml_query(xml))
        return pa.table({"doc_id": np.sort(docs)})

    q["xml_parser_query"] = _xml_parser

    def _custom_collector(sf):
        """Public Collector/CollectorManager hook
        (search/CollectorManager.java:42; search/collectors.py): a
        custom per-segment histogram collector over feat_chars for the
        docs matching 'table', reduced on the driver — the
        user-extension path the internal collectors share."""
        from lucene_ray.search.collectors import HistogramCollectorManager

        s = _searcher(sf)
        hist = s.search_with_collector(
            Q.TermQuery("table"), HistogramCollectorManager("chars", 100.0))
        return pa.table({
            "bucket": pa.array(list(hist.keys()), pa.int64()),
            "count": pa.array(list(hist.values()), pa.int64()),
        })

    q["custom_collector_query"] = _custom_collector

    def _lm_perplexity(sf):
        """CCNet-style LM quality signal (Wenzek et al. LREC 2020;
        pipelines/lm.py): bigram stupid-backoff model (Brants et al.
        2007) trained distributed on the corpus with min_count=2 (so
        singleton n-grams back off), then every doc scored by mean
        transition log-prob + perplexity."""
        import ray.data

        from lucene_ray.pipelines.lm import (score_perplexity,
                                             train_bigram_lm)

        docs = os.path.join(sf, "documents.parquet")
        ds = ray.data.read_parquet(docs, columns=["doc_id", "text"])
        model = train_bigram_lm(ds, min_count=2)
        out = score_perplexity(
            ray.data.read_parquet(docs, columns=["doc_id", "text"]), model)
        t = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                              batch_size=1 << 16))
        t = pa.table({
            "doc_id": t["doc_id"],
            "avg_logprob": _round4(t["avg_logprob"].to_numpy()),
            "perplexity": _round4(t["perplexity"].to_numpy()),
        })
        return t.sort_by("doc_id")

    q["lm_perplexity"] = _lm_perplexity

    def _ppl_buckets(sf):
        """CCNet head/middle/tail bucketing (Wenzek et al. LREC 2020
        §4.3): the per-doc perplexities rank-partition into three
        NTILE-style groups (lowest perplexity = head); per-bucket count
        and mean perplexity."""
        import ray.data

        from lucene_ray.pipelines.lm import (perplexity_buckets,
                                             score_perplexity,
                                             train_bigram_lm)

        docs = os.path.join(sf, "documents.parquet")
        ds = ray.data.read_parquet(docs, columns=["doc_id", "text"])
        model = train_bigram_lm(ds, min_count=2)
        scored = score_perplexity(
            ray.data.read_parquet(docs, columns=["doc_id", "text"]), model)
        t = perplexity_buckets(scored)
        return pa.table({
            "bucket": t["bucket"],
            "count": t["count"],
            "avg_perplexity": pa.array(
                [_round4(float(x)) for x in
                 t["avg_perplexity"].to_numpy(zero_copy_only=False)],
                type=pa.float64()),
        })

    q["perplexity_buckets"] = _ppl_buckets

    def _range_field(sf):
        """Range FIELDS (document/RangeFieldQuery.java:73, DoubleRange):
        each doc carries [rmin, rmax] = [n_chars, n_chars + 200 +
        doc_id % 300]; the query range [300, 600] evaluated under all
        four relations (crosses = intersects and not within,
        RangeFieldQuery.java:260). Per relation: match count + doc-id
        sum."""
        import ray.data

        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:rngf1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            def derive(b: pa.Table) -> pa.Table:
                ids = b["doc_id"].to_numpy()
                nc = b["n_chars"].to_numpy()
                return (b.append_column("rmin", pa.array(
                            nc.astype(np.int64), pa.int64()))
                         .append_column("rmax", pa.array(
                            nc + 200 + ids % 300, pa.int64())))

            ds = ray.data.read_parquet(
                docs, columns=["doc_id", "text", "n_chars"]
            ).map_batches(derive, batch_format="pyarrow")
            build_index(ds, idx, num_segments=3,
                        features={"rmin": "rmin", "rmax": "rmax"})
        s = Searcher(idx, mode="f64")
        rows = {"relation": [], "n_docs": [], "sum_doc_id": []}
        for rel in ("contains", "crosses", "intersects", "within"):
            d, _ = s.search_all(Q.RangeFieldQuery(
                "rmin", "rmax", 300.0, 600.0, relation=rel))
            rows["relation"].append(rel)
            rows["n_docs"].append(int(d.shape[0]))
            rows["sum_doc_id"].append(int(d.sum()))
        return pa.table({
            "relation": pa.array(rows["relation"], pa.string()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "sum_doc_id": pa.array(rows["sum_doc_id"], pa.int64()),
        })

    q["range_field_query"] = _range_field

    def _range_on_range(sf):
        """Range-on-range facets (facet/rangeonrange/
        RangeOnRangeFacetCounts.java:38): the same per-doc
        [n_chars, n_chars + 200 + doc_id % 300] ranges counted against
        three facet ranges by INTERSECTS."""
        import ray.data

        from lucene_ray.pipelines.facets import range_on_range_counts

        def derive(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy()
            nc = b["n_chars"].to_numpy()
            return pa.table({
                "rmin": pa.array(nc.astype(np.int64), pa.int64()),
                "rmax": pa.array(nc + 200 + ids % 300, pa.int64()),
            })

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "n_chars"]
        ).map_batches(derive, batch_format="pyarrow")
        t = range_on_range_counts(ds, "rmin", "rmax", [
            {"label": "short", "lower": 0, "upper": 300},
            {"label": "mid", "lower": 301, "upper": 700},
            {"label": "long", "lower": 701, "upper": 10_000},
        ])
        rows = t.take_all()
        return pa.table({
            "label": [r["label"] for r in rows],
            "count": pa.array([r["count"] for r in rows], pa.int64()),
        })

    q["range_on_range_facets"] = _range_on_range

    def _phonetic_query(sf):
        """PhoneticFilter inject=true (phonetic/PhoneticFilter.java:33 +
        Soundex; analysis/phonetic.py): the index carries every surface
        token AND its Soundex code at the same position; querying the
        code of a MISSPELLED word ('tabel') reaches the docs containing
        the sound-alike 'table'/'tabel'-coded tokens."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.analysis.phonetic import soundex
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:ph1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx,
                        analyzer=Analyzer(phonetic="soundex",
                                          keyword_repeat=True),
                        num_segments=4, stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, _sc = s.search_all(Q.TermQuery(soundex("tabel")))
        return pa.table({"doc_id": np.sort(d)})

    q["phonetic_search_query"] = _phonetic_query

    def _mk_phonetic_query(encoder, tag):
        def _phon_q(sf):
            from lucene_ray.analysis.analyzers import Analyzer
            from lucene_ray.analysis.phonetic import encode
            from lucene_ray.codec.postings import CODEC_VERSION
            from lucene_ray.index.build import build_index
            from lucene_ray.search.searcher import Searcher

            docs = os.path.join(sf, "documents.parquet")
            t = hashlib.sha1(
                f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
                f":c{CODEC_VERSION}:{tag}".encode()).hexdigest()[:12]
            idx = os.path.join(_CACHE_ROOT, t)
            if not os.path.exists(os.path.join(idx, "manifest.json")):
                build_index(docs, idx,
                            analyzer=Analyzer(phonetic=encoder,
                                              keyword_repeat=True),
                            num_segments=4, stored_source=docs)
            s = Searcher(idx, mode="f64")
            d, _sc = s.search_all(Q.TermQuery(encode("tabel", encoder)))
            return pa.table({"doc_id": np.sort(d)})
        _phon_q.__doc__ = (
            "PhoneticFilter inject=true (phonetic/PhoneticFilter.java:33) "
            "with the %s encoder (analysis/phonetic.py — fresh "
            "implementation of the published algorithm): querying the "
            "code of the misspelled 'tabel' reaches its sound-alikes."
            % encoder)
        return _phon_q

    def _mapping_char_filter_query(sf):
        """MappingCharFilter (charfilter/MappingCharFilter.java:44 +
        NormalizeCharMap): raw text rewrites {'table'->'tbl',
        'tab'->'x'} in one greedy longest-match pass BEFORE
        tokenization ('tables'->'tbls', never 'xles'); BM25 TermQuery
        for the mapped 'tbl'."""
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        t = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:mcf1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, t)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx,
                        analyzer=Analyzer(mapping_char_filter=(
                            ("table", "tbl"), ("tab", "x"))),
                        num_segments=4, stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery("tbl"))
        order = np.argsort(d)
        return pa.table({"doc_id": pa.array(d[order], type=pa.int64()),
                         "score": pa.array(_round4(sc[order]),
                                           type=pa.float64())})

    q["mapping_char_filter_query"] = _mapping_char_filter_query

    def _scored_filter_index(sf, tag, analyzer_kw, term, text_expr=None):
        """Shared helper: cached index over documents (optionally a
        derived text column) with the given analyzer kwargs; BM25
        TermQuery(term) -> (doc_id, score)."""
        import pyarrow.compute as _pcc
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        t = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:{tag}".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, t)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            src = docs
            kw = {}
            if text_expr is not None:
                def _mk(b: pa.Table) -> pa.Table:
                    return (b.select(["doc_id"])
                            .append_column("ftext", text_expr(b, _pcc)))
                src = ray.data.read_parquet(
                    docs, columns=["doc_id", "text"]) \
                    .map_batches(_mk, batch_format="pyarrow")
                kw["text_col"] = "ftext"
            build_index(src, idx, analyzer=Analyzer(**analyzer_kw),
                        num_segments=4, **kw)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery(term))
        order = np.argsort(d)
        return pa.table({"doc_id": pa.array(d[order], type=pa.int64()),
                         "score": pa.array(_round4(sc[order]),
                                           type=pa.float64())})

    def _apostrophe_q(sf):
        """ApostropheFilter (tr/ApostropheFilter.java:30): every token
        except the last carries a Turkish-possessive-style 'x suffix
        (derived column); the filter strips at the apostrophe, so the
        stream — and the BM25 scores for 'table' — equal the plain
        corpus exactly."""
        return _scored_filter_index(
            sf, "apf1", {"apostrophe": True}, "table",
            text_expr=lambda b, pcc: pcc.replace_substring(
                b["text"], " ", "'x "))

    q["apostrophe_filter_query"] = _apostrophe_q

    def _trim_q(sf):
        """TrimFilter (miscellaneous/TrimFilter.java:26) over a
        PatternTokenizer(',') stream: text re-joined with ' , ' so
        every token carries stray spaces; trim restores the plain
        terms, so BM25 for 'table' equals the standard chain exactly."""
        return _scored_filter_index(
            sf, "trim1",
            {"tokenizer": "pattern", "tokenizer_pattern": (",", -1),
             "trim": True},
            "table",
            text_expr=lambda b, pcc: pcc.replace_substring(
                pcc.fill_null(b["text"], ""), " ", " , "))

    q["trim_filter_query"] = _trim_q

    def _pattern_replace_q(sf):
        """PatternReplaceFilter (pattern/PatternReplaceFilter.java:34,
        replaceAll) — the token-level sibling of the char filter:
        '^table$' -> 'tbl' inside the filter chain; 'tbl' then scores
        exactly like 'table' on the plain chain (df/tf/dl unchanged)."""
        return _scored_filter_index(
            sf, "prf1", {"pattern_replace": ("^table$", "tbl")}, "tbl")

    q["pattern_replace_query"] = _pattern_replace_q

    def _protected_term_q(sf):
        """ProtectedTermFilter (miscellaneous/ProtectedTermFilter
        .java:31): Porter stemming with 'table' protected from the
        WHOLE chain — its postings stay the surface form, so BM25 for
        'table' equals the plain (unstemmed) chain exactly."""
        return _scored_filter_index(
            sf, "prot1",
            {"stem": True, "protected_words": frozenset({"table"})},
            "table")

    q["protected_term_query"] = _protected_term_q

    def _pattern_capture_q(sf):
        """PatternCaptureGroupTokenFilter (pattern/
        PatternCaptureGroupTokenFilter.java:48, preserveOriginal):
        '^(ta)ble$' injects capture 'ta' at 'table''s position; BM25
        for 'ta' over the expanded stream (injections count toward dl,
        the house discount_overlaps=False default)."""
        return _scored_filter_index(
            sf, "pcg1", {"pattern_capture": (r"^(ta)ble$",)}, "ta")

    q["pattern_capture_query"] = _pattern_capture_q

    def _remove_duplicates_q(sf):
        """Standalone RemoveDuplicatesTokenFilter (miscellaneous/
        RemoveDuplicatesTokenFilter.java:28): capture '^(tab)le$' AND
        synonym table->tab both inject 'tab' at table's position — the
        duplicate collapses, so exactly ONE extra 'tab' per occurrence
        survives (the oracle counts one)."""
        return _scored_filter_index(
            sf, "rdup1",
            {"pattern_capture": (r"^(tab)le$",),
             "synonyms": (("table", ("tab",)),),
             "remove_duplicates": True},
            "tab")

    q["remove_duplicates_query"] = _remove_duplicates_q

    def _date_recognizer_q(sf):
        """DateRecognizerFilter (miscellaneous/DateRecognizerFilter
        .java:28): 'table' rewrites to an ISO date (derived column);
        only strptime-valid '%Y-%m-%d' tokens survive (with gaps), so
        dl = per-doc date count and BM25 scores over the date-only
        stream."""
        return _scored_filter_index(
            sf, "dater2",
            {"tokenizer": "whitespace", "date_recognizer": "%Y-%m-%d"},
            "2024-05-17",
            text_expr=lambda b, pcc: pcc.replace_substring(
                pcc.fill_null(b["text"], ""), "table", "2024-05-17"))

    q["date_recognizer_query"] = _date_recognizer_q

    def _english_possessive_q(sf):
        """EnglishPossessiveFilter (en/EnglishPossessiveFilter.java:30):
        'table' rewrites to \"table's\" (derived column); the filter
        strips the possessive so BM25 for 'table' matches the oracle's
        explicit strip (embedded 'table' inside longer words becomes
        \"table'sX\" and is untouched on both sides)."""
        return _scored_filter_index(
            sf, "engp1", {"english_possessive": True}, "table",
            text_expr=lambda b, pcc: pcc.replace_substring(
                pcc.fill_null(b["text"], ""), "table", "table's"))

    q["english_possessive_query"] = _english_possessive_q

    def _minimal_stem_q(sf):
        """EnglishMinimalStemFilter (en/EnglishMinimalStemmer.java:33 —
        Harman's S-stemmer): plural-folded index, vocabulary-mapped
        oracle (the smap VALUES embed the same published algorithm run
        over the corpus vocabulary)."""
        return _scored_filter_index(
            sf, "mins1", {"minimal_stem": True}, "table")

    q["minimal_stem_query"] = _minimal_stem_q

    def _blended_infix_q(sf):
        """BlendedInfixSuggester (suggest/analyzing/
        BlendedInfixSuggester.java:60, POSITION_LINEAR): suggestions
        with a token starting 'tab', scored weight * (1 - 0.10 * first
        match position) with weight = doc_id % 97 + 1."""
        import ray.data

        from lucene_ray.pipelines.suggest import blended_infix_suggest

        def w(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            return b.append_column(
                "sweight", pa.array((ids % 97 + 1).astype(np.float64)))

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "text"]).map_batches(
                w, batch_format="pyarrow")
        t = blended_infix_suggest(ds, "tab", k=10, blender="linear",
                                  weight_col="sweight")
        return pa.table({
            "doc_id": t["doc_id"],
            "score": pa.array(_round4(
                t["score"].to_numpy(zero_copy_only=False)),
                type=pa.float64()),
        })

    q["blended_infix_suggest"] = _blended_infix_q

    def _analyzing_suggest_q(sf):
        """AnalyzingSuggester (suggest/analyzing/AnalyzingSuggester
        .java:100, default EXACT_FIRST | PRESERVE_SEP): surfaces = each
        doc's leading unigram and bigram, weight = sharing-doc count,
        completion of the analyzed query 'key' over a minimal FST
        (util/fst/FSTCompiler.java:44, Daciuk et al. 2000 construction
        with Mihov-Maurel output pushing) — exact analyzed matches
        first, then weight desc, surface asc."""
        import ray.data

        from lucene_ray.pipelines.suggest import (AnalyzingSuggester,
                                                  corpus_prefix_surfaces)

        pages = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["text"])
        sug = AnalyzingSuggester(corpus_prefix_surfaces(pages,
                                                        max_tokens=2))
        return sug.lookup("key", k=10)

    q["analyzing_suggest"] = _analyzing_suggest_q

    def _context_suggest_q(sf):
        """ContextQuery over ContextSuggestField (suggest/document/
        ContextQuery.java:63, ContextSuggestField.java:46): completions
        of 'key' restricted to contexts src0 (boost 2) and src2
        (boost 1) — context = the doc's source column, surfaces = each
        doc's leading unigram/bigram, score = weight × context boost."""
        import ray.data

        from lucene_ray.pipelines.suggest import (ContextSuggester,
                                                  corpus_context_surfaces)

        pages = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["text", "source"])
        sug = ContextSuggester(corpus_context_surfaces(pages, "source"))
        return sug.lookup("key", contexts={"src0": 2.0, "src2": 1.0}, k=10)

    q["context_suggest"] = _context_suggest_q

    def _document_dictionary_q(sf):
        """DocumentDictionary (suggest/DocumentDictionary.java:47):
        suggester input from stored FIELDS — surface = the doc's source
        value, weight = sum of n_chars over docs sharing it; completions
        of 'src1' through the AnalyzingSuggester (exact-first, then
        weight desc, surface asc)."""
        import ray.data

        from lucene_ray.pipelines.suggest import (
            AnalyzingSuggester, document_dictionary_surfaces)

        pages = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["source", "n_chars"])
        surf = document_dictionary_surfaces(pages, "source", "n_chars")
        return AnalyzingSuggester(surf).lookup("src1", k=10)

    q["document_dictionary_suggest"] = _document_dictionary_q

    def _fuzzy_completion_q(sf):
        """FuzzyCompletionQuery (suggest/document/FuzzyCompletionQuery
        .java:63 / FuzzySuggester.java:80): completions of the TYPO'd
        prefix 'kye' (1 edit from 'key'; nonFuzzyPrefix = 1, so the
        first byte must match) over the corpus unigram/bigram surfaces,
        ranked (edits asc, weight desc, surface asc)."""
        import ray.data

        from lucene_ray.pipelines.suggest import (AnalyzingSuggester,
                                                  FuzzySuggesterLookup,
                                                  corpus_prefix_surfaces)

        pages = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["text"])
        sug = AnalyzingSuggester(corpus_prefix_surfaces(pages,
                                                        max_tokens=2))
        return FuzzySuggesterLookup(sug).lookup("kye", k=10, max_edits=1)

    q["fuzzy_completion_suggest"] = _fuzzy_completion_q

    def _regex_completion_q(sf):
        """RegexCompletionQuery (suggest/document/RegexCompletionQuery
        .java:47): completions whose analyzed form starts with a match
        of 'k[ey]+', ranked (weight desc, surface asc)."""
        import ray.data

        from lucene_ray.pipelines.suggest import (AnalyzingSuggester,
                                                  RegexSuggesterLookup,
                                                  corpus_prefix_surfaces)

        pages = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["text"])
        sug = AnalyzingSuggester(corpus_prefix_surfaces(pages,
                                                        max_tokens=2))
        return RegexSuggesterLookup(sug).lookup("k[ey]+", k=10)

    q["regex_completion_suggest"] = _regex_completion_q

    def _capitalization_q(sf):
        """CapitalizationFilter (miscellaneous/CapitalizationFilter
        .java:41): lowercase off, every token Title-cased; querying
        'Table' scores exactly like 'table' over the plain chain."""
        return _scored_filter_index(
            sf, "capf1", {"capitalization": True, "lowercase": False},
            "Table")

    q["capitalization_query"] = _capitalization_q

    def _limit_count_q(sf):
        """LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter
        .java:29): only each document's first 5 tokens index; BM25 for
        'table' (dl=5, df/tf over the truncated streams)."""
        return _scored_filter_index(
            sf, "ltc1", {"limit_token_count": 5}, "table")

    q["limit_token_count_query"] = _limit_count_q

    def _stemmer_override_q(sf):
        """StemmerOverrideFilter + SetKeywordMarkerFilter
        (miscellaneous/StemmerOverrideFilter.java:37,
        SetKeywordMarkerFilter.java:27) over PorterStemFilter:
        'table'->'tbl0' by dictionary (stemmer skipped), 'values'
        protected from stemming (stays 'values' instead of 'valu');
        BM25 for both, tagged."""
        import pyarrow.compute as _pcc  # noqa: F401

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        t = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:sov1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, t)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx,
                        analyzer=Analyzer(
                            stem=True,
                            stem_overrides=(("table", "tbl0"),),
                            keyword_set=frozenset({"values"})),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        parts = []
        for tag2, term in (("keyword", "values"), ("override", "tbl0")):
            d, sc = s.search_all(Q.TermQuery(term))
            order = np.argsort(d)
            parts.append(pa.table({
                "q": pa.array([tag2] * len(d), type=pa.string()),
                "doc_id": pa.array(d[order], type=pa.int64()),
                "score": pa.array(_round4(sc[order]), type=pa.float64())}))
        return pa.concat_tables(parts).sort_by(
            [("q", "ascending"), ("doc_id", "ascending")])

    q["stemmer_override_query"] = _stemmer_override_q

    def _word_break_q(sf):
        """WordBreakSpellChecker (suggest/spell/WordBreakSpellChecker
        .java:74 suggestWordBreaks, :148 suggestWordCombinations) over
        an index whose docs carry ' win dow' fragments: break
        'keyvalue' (one bisect), break 'bigdatascan' (two changes via
        the recursive right-side split), combine win+dow -> 'window'."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        t = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:wbs1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, t)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            import pyarrow.compute as _pcc

            def _mk(b: pa.Table) -> pa.Table:
                return (b.select(["doc_id"]).append_column(
                    "ftext", _pcc.binary_join_element_wise(
                        b["text"].cast(pa.string()), "win dow", " ")))
            src = ray.data.read_parquet(
                docs, columns=["doc_id", "text"]).map_batches(
                _mk, batch_format="pyarrow")
            build_index(src, idx, analyzer=Analyzer(), num_segments=4,
                        text_col="ftext")
        s = Searcher(idx, mode="f64")
        rows = []
        for parts, changes, freq in s.suggest_word_breaks("keyvalue"):
            rows.append(("break1", " ".join(parts), changes, freq))
        for parts, changes, freq in s.suggest_word_breaks(
                "bigdatascan", max_changes=2):
            rows.append(("break2", " ".join(parts), changes, freq))
        for comb, i, j, freq in s.suggest_word_combinations(
                ["win", "dow"], mode="always"):
            rows.append(("combine", comb, j - i, freq))
        rows.sort(key=lambda r: (r[0], r[2], -r[3], r[1]))
        return pa.table({
            "kind": pa.array([r[0] for r in rows], type=pa.string()),
            "suggestion": pa.array([r[1] for r in rows],
                                   type=pa.string()),
            "changes": pa.array([r[2] for r in rows], type=pa.int64()),
            "freq": pa.array([r[3] for r in rows], type=pa.int64())})

    q["word_break_suggest"] = _word_break_q

    def _hyphenated_q(sf):
        """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter
        .java:57) over WhitespaceTokenizer: every 'table' is line-break
        hyphenated to 'ta- ble' in the derived corpus; the filter joins
        the parts back, so BM25('table') equals the plain corpus."""
        return _scored_filter_index(
            sf, "hyw1", {"tokenizer": "whitespace",
                         "hyphenated_words": True}, "table",
            text_expr=lambda b, pcc: pcc.replace_substring(
                b["text"], "table", "ta- ble"))

    q["hyphenated_words_query"] = _hyphenated_q

    def _delimited_tf_q(sf):
        """DelimitedTermFrequencyTokenFilter (miscellaneous/
        DelimitedTermFrequencyTokenFilter.java:37): every 'table' in the
        derived corpus carries '|3' — the custom term frequency both
        triples f(table, doc) and extends the field length, exactly the
        reference's TermFrequencyAttribute accounting (DOCS_AND_FREQS
        index; BM25 over the adjusted stats)."""
        import pyarrow.compute as _pcc
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        t = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:dtf1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, t)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            def _mk(b: pa.Table) -> pa.Table:
                return (b.select(["doc_id"]).append_column(
                    "ftext", _pcc.replace_substring(
                        b["text"], "table", "table|3")))
            src = ray.data.read_parquet(
                docs, columns=["doc_id", "text"]).map_batches(
                _mk, batch_format="pyarrow")
            build_index(src, idx, analyzer=Analyzer(tf_delimiter="|"),
                        num_segments=4, text_col="ftext",
                        with_positions=False)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery("table"))
        order = np.argsort(d)
        return pa.table({"doc_id": pa.array(d[order], type=pa.int64()),
                         "score": pa.array(_round4(sc[order]),
                                           type=pa.float64())})

    q["delimited_tf_query"] = _delimited_tf_q

    q["metaphone_search_query"] = _mk_phonetic_query(
        "metaphone", "phm1")
    q["caverphone_search_query"] = _mk_phonetic_query(
        "caverphone2", "phc1")
    q["refined_soundex_search_query"] = _mk_phonetic_query(
        "refined_soundex", "phr1")

    def _icu_fold_query(sf):
        """ICUFoldingFilter role (icu/ICUFoldingFilter.java:51): the
        text column's accents/case fold to a canonical form at index AND
        query time — querying the folded form of an accented variant
        ('tablé') meets plain 'table'."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:icu1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx, analyzer=Analyzer(icu_fold=True),
                        num_segments=4, stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize("tablé")))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["icu_fold_query"] = _icu_fold_query

    def _icu_normalizer_query(sf):
        """ICUNormalizer2Filter role (icu/ICUNormalizer2Filter.java:40;
        analyzers.Analyzer.icu_normalize): nfkc_cf normalization at
        index AND query time — unlike the fold it keeps combining marks
        but unifies compatibility variants + case, so a fullwidth
        'Ｔａｂｌｅ' query meets plain 'table'."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:icun1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx,
                        analyzer=Analyzer(icu_normalize="nfkc_cf"),
                        num_segments=4, stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(
            Q.TermQuery(s.analyzer.normalize("Ｔａｂｌｅ")))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["icu_normalizer_query"] = _icu_normalizer_query

    def _chunk_documents(sf):
        """Token-window chunking (pipelines/textstats.chunk_documents):
        the pretraining-data shaping step — 32-token windows with
        8-token overlap, one row per (doc, chunk), exact slice
        semantics."""
        import ray.data

        from lucene_ray.pipelines.textstats import chunk_documents

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "text"])
        t = pa.concat_tables(
            chunk_documents(ds, chunk_tokens=32, overlap=8)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        return t.sort_by([("doc_id", "ascending"),
                          ("chunk_idx", "ascending")])

    q["chunk_documents"] = _chunk_documents

    def _pack_sequences(sf):
        """Sequence packing (pipelines/packing.pack_sequences): concat
        the corpus token stream in doc_id order, cut every 256 tokens;
        one (pack_id, doc_id, begin_tok, end_tok) segment per overlap.
        Distributed two-level prefix sum (bucketed partial sums +
        driver cumsum of the tiny bucket table)."""
        import ray.data

        from lucene_ray.pipelines.packing import pack_sequences

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "text"])
        t = pa.concat_tables(
            pack_sequences(ds, budget=256, bucket_docs=512)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        return t.sort_by([("pack_id", "ascending"),
                          ("doc_id", "ascending")])

    q["pack_sequences"] = _pack_sequences

    def _profile(sf):
        """Query profiler (sandbox/search/QueryProfilerIndexSearcher
        .java:36, ProfilerCollector.java:31 — search/profiler.py):
        per-node breakdown of '+table +window -key'; deterministic
        columns only (time_ns is wall time, projected out)."""
        from lucene_ray.search.profiler import profile_query

        s = _searcher(sf)
        t = profile_query(
            s, Q.BooleanQuery(must=(Q.TermQuery("table"),
                                    Q.TermQuery("window")),
                              must_not=(Q.TermQuery("key"),)))
        return t.select(["node", "kind", "clause", "description", "docs"])

    q["query_profiler"] = _profile

    def _tfidf_top_terms(sf):
        """Per-doc TF-IDF keyword extraction
        (pipelines/textstats.top_terms_per_doc): top-3 terms per doc by
        tf*ln(N/df), ties (score desc, term asc) — df reduced from
        per-batch DISTINCT partials, scored in one vectorized pass."""
        import ray.data

        from lucene_ray.pipelines.textstats import top_terms_per_doc

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "text"])
        t = pa.concat_tables(
            top_terms_per_doc(ds, k=3)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        return t.sort_by([("doc_id", "ascending"), ("rank", "ascending")])

    q["tfidf_top_terms"] = _tfidf_top_terms

    def _compound_query(sf):
        """DictionaryCompoundWordTokenFilter (compound/
        DictionaryCompoundWordTokenFilter.java:40): compounds inject
        their dictionary subwords at the same position — querying 'wind'
        reaches every 'window' occurrence; BM25 doclens include the
        injected subwords (the filter's keepOriginal+inject shape)."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:cw1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(
                docs, idx,
                analyzer=Analyzer(compound_dict=("custom", "ream", "wind"),
                                  compound_min_word=5, compound_min_sub=4,
                                  compound_max_sub=6),
                num_segments=4, stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery("wind"))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["compound_word_query"] = _compound_query

    def _common_grams(sf):
        """CommonGramsFilter (commongrams/CommonGramsFilter.java:63):
        'key' registers as a common word, so every adjacent pair
        touching it indexes a gram beside the unigrams; the phrase-speed
        query hits ONE gram posting ('key_value') instead of
        intersecting two positional lists."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:{os.path.getmtime(docs)}"
            f":c{CODEC_VERSION}:cg1".encode()).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx,
                        analyzer=Analyzer(common_grams=("key",)),
                        num_segments=4, stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery("key_value"))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["common_grams_phrase"] = _common_grams

    def _phrase(sf):
        s = _searcher(sf)
        docs, freqs = s.phrase_freqs(("key", "value"))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "phrase_freq": freqs[order]})

    q["phrase_query"] = _phrase

    def _term_automaton(sf):
        """TermAutomatonQuery (sandbox/src/java/org/apache/lucene/search/
        TermAutomatonQuery.java:59): 'key value' OR 'key ? value' — an
        optional middle token, i.e. accepted paths of two DIFFERENT
        lengths, which no MultiPhraseQuery can express. Freq counts
        distinct accepted end positions per doc."""
        s = _searcher(sf)
        docs, freqs = s.term_automaton_freqs(
            4, ((0, 1, "key"), (1, 3, "value"),
                (1, 2, None), (2, 3, "value")), (3,))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "ta_freq": freqs[order]})

    q["term_automaton_query"] = _term_automaton

    def _docs_only(sf, query):
        s = _searcher(sf)
        docs, _sc = s.search_all(query)
        return pa.table({"doc_id": np.sort(docs)})

    q["prefix_query"] = lambda sf: _docs_only(sf, Q.PrefixQuery("s"))
    q["wildcard_query"] = lambda sf: _docs_only(sf, Q.WildcardQuery("s?ow"))
    q["regexp_query"] = lambda sf: _docs_only(sf, Q.RegexpQuery("s.*k"))
    q["fuzzy_query"] = lambda sf: _docs_only(
        sf, Q.FuzzyQuery("tble", max_edits=1, transpositions=False)
    )
    def _reverse_wildcard(sf):
        """Leading wildcard *ble served as a PREFIX range scan over a
        ReverseStringFilter companion field (analysis/reverse/
        ReverseStringFilter.java:44; the reversed-wildcard serving
        pattern) — rank-identical to the full-dictionary wildcard scan
        but O(log |dict|) at the term dictionary."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_rev_index_dir(sf), mode="f64")
        rq = Q.rewrite_leading_wildcard("*ble", "rev")
        assert isinstance(rq, Q.PrefixQuery) and rq.field == "rev"
        docs, _sc = s.search_all(rq)
        return pa.table({"doc_id": np.sort(docs)})

    q["reverse_wildcard_query"] = _reverse_wildcard

    q["term_range_query"] = lambda sf: _docs_only(sf, Q.TermRangeQuery("scan", "sort"))
    q["term_in_set"] = lambda sf: _docs_only(sf, Q.TermInSetQuery(("spark", "window")))
    q["synonym_query"] = lambda sf: _all_hits_table(
        sf, Q.SynonymQuery(("spark", "stream"))
    )
    q["dis_max_query"] = lambda sf: _all_hits_table(
        sf,
        Q.DisjunctionMaxQuery(
            (Q.TermQuery("spark"), Q.TermQuery("window")), tie_breaker=0.3
        ),
    )
    q["boost_query"] = lambda sf: _all_hits_table(
        sf, Q.BoostQuery(Q.TermQuery("table"), 2.5)
    )
    q["blended_term_query"] = lambda sf: _all_hits_table(
        sf, Q.BlendedTermQuery(("spark", "customer"), tie_breaker=0.01)
    )

    def _phrase_wild(sf):
        s = _searcher(sf)
        docs, freqs = s.phrase_wildcard_freqs(("table", "s*"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "freq": pa.array(freqs[order], type=pa.int64()),
        })

    q["phrase_wildcard_freqs"] = _phrase_wild

    def _diversified(sf):
        s = _searcher(sf)
        docs, scores, keys = s.diversified_topk(
            Q.TermQuery("table"), "source", k=10, max_per_key=1)
        return pa.table({
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(_round4(scores), type=pa.float64()),
            "source": pa.array(keys.tolist(), type=pa.string()),
        })

    q["diversified_topk"] = _diversified

    def _multi_range(sf):
        """MultiRangeQuery (sandbox/search/MultiRangeQuery.java:54) — union
        of point ranges, adapted per the SURVEY BKD mapping to predicate-
        pushdown reads (only matching row groups leave storage)."""
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        )
        t = ds.filter(
            expr="(n_chars >= 150 and n_chars < 250) "
                 "or (n_chars >= 600 and n_chars < 700)"
        ).select_columns(["doc_id"]).to_pandas()
        return pa.Table.from_pandas(
            t.sort_values("doc_id").reset_index(drop=True),
            preserve_index=False)

    q["multi_range_query"] = _multi_range

    def _dyn_ranges(sf):
        import ray.data

        from lucene_ray.pipelines.facets import dynamic_range_facets

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["n_chars"])
        t = dynamic_range_facets(ds, "n_chars", 5)
        return pa.table({
            "bucket": t["bucket"],
            "count": t["count"],
            "vmin": t["vmin"],
            "vmax": t["vmax"],
            "vsum": _round4(t["vsum"].to_numpy()),
        })

    q["dynamic_range_facets"] = _dyn_ranges

    def _search_after(sf):
        s = _searcher(sf)
        qq = Q.TermQuery("window")
        page1 = s.search(qq, k=10)
        td = s.search_after(qq, 10, float(page1.scores[-1]), int(page1.doc_ids[-1]))
        return pa.table(
            {
                "rank": np.arange(11, 11 + td.doc_ids.shape[0], dtype=np.int64),
                "doc_id": td.doc_ids,
                "score": _round4(td.scores),
            }
        )

    q["search_after_page2"] = _search_after

    def _multi_phrase(sf):
        s = _searcher(sf)
        docs, freqs = s.multi_phrase_freqs((("key", "agg"), ("value",)))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "phrase_freq": freqs[order]})

    q["multi_phrase_query"] = _multi_phrase

    def _span_near(sf):
        """Unordered proximity: 'value' within 3 positions of 'key' in
        either direction (SpanNearQuery, in_order=False, slop=2)."""
        s = _searcher(sf)
        docs, scores = s.search_all(
            Q.SpanNearQuery(("key", "value"), slop=2, in_order=False)
        )
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})

    q["span_near_unordered"] = _span_near

    def _intervals_ordered(sf):
        """Intervals.ordered + maxgaps (queries/intervals/Intervals.java:56):
        docs with 'scan' before 'column' and at most 3 tokens between."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(
            IV.Ordered((IV.Term("scan"), IV.Term("column")), maxgaps=3)
        ))

    q["intervals_ordered_maxgaps"] = _intervals_ordered

    def _intervals_prefix(sf):
        """Intervals.prefix (Intervals.java:180) inside ordered: 'key'
        followed by any 'val*' dictionary term within 2 gaps."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(
            IV.Ordered((IV.Term("key"), IV.Prefix("val")), maxgaps=2)
        ))

    q["intervals_prefix_near"] = _intervals_prefix

    def _intervals_at_least(sf):
        """Intervals.atLeast (Intervals.java:89,
        MinimumShouldMatchIntervalsSource): docs with a window of width
        <= 8 containing at least 2 of {scan, column, window} — minimal
        m-subset unordered windows, minimality-filtered."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(IV.MaxWidth(
            IV.AtLeast(2, (IV.Term("scan"), IV.Term("column"),
                           IV.Term("window"))), 8)))

    q["intervals_at_least"] = _intervals_at_least

    def _intervals_range(sf):
        """Intervals.range (Intervals.java:222): 'key' followed within 2
        gaps by any dictionary term in ['val', 'valz'] — the term-range
        multi-term interval leaf."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(IV.Ordered(
            (IV.Term("key"), IV.Range("val", "valz")), maxgaps=2)))

    q["intervals_range_leaf"] = _intervals_range

    def _intervals_unordered3(sf):
        """Exact 3-way unordered (UnorderedIntervalsSource sweep): docs
        with a window of width <= 8 holding 'scan', 'column' and 'table'
        in any order."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(IV.MaxWidth(
            IV.Unordered((IV.Term("scan"), IV.Term("column"),
                          IV.Term("table"))), 8)))

    q["intervals_unordered3_width"] = _intervals_unordered3

    def _span_first(sf):
        """SpanFirstQuery (queries/spans/SpanFirstQuery.java:38): 'table'
        within the first 10 tokens of the document."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(
            IV.First(IV.Term("table"), 10)
        ))

    q["span_first_query"] = _span_first

    def _span_position_range(sf):
        """SpanPositionRangeQuery (queries/spans/SpanPositionRangeQuery
        .java:29): 'table' at positions [5, 20) of the document."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(
            IV.PositionRange(IV.Term("table"), 5, 20)
        ))

    q["span_position_range_query"] = _span_position_range

    def _intervals_non_overlapping(sf):
        """Intervals.nonOverlapping (search/intervals/Intervals.java:189,
        SpanNotQuery role): unordered (scan, column) windows (<= 6 gaps)
        that do not OVERLAP any 'key value' phrase occurrence — edge
        straddles count as overlap (stricter than notContaining)."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(IV.NonOverlapping(
            IV.Unordered((IV.Term("scan"), IV.Term("column")), maxgaps=6),
            IV.phrase("key", "value"),
        )))

    q["intervals_non_overlapping"] = _intervals_non_overlapping

    def _intervals_before_after(sf):
        """Intervals.before / after (queries/intervals/Intervals
        .java:579,585): docs where some 'scan' precedes a 'column' AND
        some 'table' follows a 'key value' phrase — two relative-order
        constraints conjoined."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.BooleanQuery(must=(
            Q.IntervalQuery(IV.Before(IV.Term("scan"), IV.Term("column"))),
            Q.IntervalQuery(IV.After(IV.Term("table"),
                                     IV.phrase("key", "value"))),
        )))

    q["intervals_before_after"] = _intervals_before_after

    def _intervals_wildcard(sf):
        """Intervals.wildcard leaf (queries/intervals/Intervals
        .java:139): terms matching 'sc?n' ordered before 'column' with
        <= 3 gaps — the multi-term leaf expands per segment like
        Prefix."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(IV.Ordered(
            (IV.Wildcard("sc?n"), IV.Term("column")), maxgaps=3)))

    q["intervals_wildcard"] = _intervals_wildcard

    def _intervals_fuzzy_overlap(sf):
        """Intervals.fuzzyTerm + overlapping (queries/intervals/
        Intervals.java:155,196): 'key value' phrases overlapping an
        occurrence of a term within edit distance 1 of 'valu' (no
        transpositions, the house Levenshtein contract)."""
        from lucene_ray.search import intervals as IV

        return _docs_only(sf, Q.IntervalQuery(IV.Overlapping(
            IV.Unordered((IV.Term("scan"), IV.Term("column")), maxgaps=6),
            IV.FuzzyTerm("windoq", max_edits=1),
        )))

    q["intervals_fuzzy_overlap"] = _intervals_fuzzy_overlap

    def _intervals_containing(sf):
        """Intervals.containing(big, small): candidate unordered windows
        of (scan, column) with <= 6 gap tokens that contain a 'window'
        occurrence. Candidate windows are each scan-anchor's nearest
        column neighbour in either direction (the engine's documented
        minimal-candidate rule; the oracle mirrors it exactly)."""
        from lucene_ray.search import intervals as IV

        src = IV.Containing(
            IV.Unordered((IV.Term("scan"), IV.Term("column")), maxgaps=6),
            IV.Term("window"),
        )
        return _docs_only(sf, Q.IntervalQuery(src))

    q["intervals_containing"] = _intervals_containing

    def _intervals_contained_by(sf):
        """Intervals.containedBy(small, big) — 'window' occurrences lying
        inside a qualifying (scan, column) window; doc-level equal to
        containing by construction, but exercises the prefix-max container
        path instead of the suffix-min containee path."""
        from lucene_ray.search import intervals as IV

        src = IV.ContainedBy(
            IV.Term("window"),
            IV.Unordered((IV.Term("scan"), IV.Term("column")), maxgaps=6),
        )
        return _docs_only(sf, Q.IntervalQuery(src))

    q["intervals_contained_by"] = _intervals_contained_by

    def _intervals_not_containing(sf):
        """Intervals.notContaining: candidate (scan, column) windows with
        <= 6 gap tokens that contain NO 'window' occurrence."""
        from lucene_ray.search import intervals as IV

        src = IV.NotContaining(
            IV.Unordered((IV.Term("scan"), IV.Term("column")), maxgaps=6),
            IV.Term("window"),
        )
        return _docs_only(sf, Q.IntervalQuery(src))

    q["intervals_not_containing"] = _intervals_not_containing

    def _intervals_maxwidth(sf):
        """Intervals.maxwidth over an ordered pair: ordered (scan, column)
        windows spanning at most 4 positions (width filter on top of the
        same greedy-minimal candidates the oracle mirrors: for each scan,
        the EARLIEST following column)."""
        from lucene_ray.search import intervals as IV

        src = IV.MaxWidth(
            IV.Ordered((IV.Term("scan"), IV.Term("column"))), width=4
        )
        return _docs_only(sf, Q.IntervalQuery(src))

    q["intervals_maxwidth"] = _intervals_maxwidth

    def _intervals_scored(sf):
        """Interval saturation scoring (IntervalScorer.java:60-68 +
        IntervalScoreFunction.saturationFunction): per doc,
        freq = sum over ordered (scan, column) candidate windows of
        1/max(width - 1, 1) (minExtent 2); score = freq/(freq + 1)."""
        from lucene_ray.search import intervals as IV

        s = _searcher(sf)
        qv = Q.IntervalQuery(
            IV.Ordered((IV.Term("scan"), IV.Term("column"))),
            score_mode="saturation", pivot=1.0,
        )
        docs, scores = s.search_all(qv)
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})

    q["intervals_scored_saturation"] = _intervals_scored

    def _join_query(sf):
        """Query-time join (JoinUtil.createJoinQuery, join/JoinUtil.java:56):
        from side = documents with lang='de', fromField = the doc's first
        token; to side = docs whose text contains any gathered value.
        The gather is a distributed groupby of distinct values only."""
        import pyarrow.compute as pc
        import ray.data

        from lucene_ray.search.join import create_join_query

        def first_token(b):
            texts = b["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            return pa.table(
                {"t0": pc.list_element(pc.split_pattern(texts, " "), 0)}
            )

        from_ds = (
            ray.data.read_parquet(
                os.path.join(sf, "documents.parquet"),
                columns=["lang", "n_chars", "text"],
            )
            .filter(expr="lang == 'de' and n_chars < 150")
            .map_batches(first_token, batch_format="pyarrow")
        )
        return _docs_only(sf, create_join_query(from_ds, "t0"))

    q["join_query_terms"] = _join_query

    def _check_index(sf):
        """Offline CheckIndex (index/CheckIndex.java:113): re-decode every
        blob, recompute df/ttf/norms, verify dictionary sort + manifest
        stats. The surfaced stats are RECOMPUTED from the postings, so
        the oracle (raw-corpus SQL) proves the whole index round-trips."""
        from lucene_ray.index.check import check_index

        rep = check_index(_index_dir(sf))
        return pa.table({
            "doc_count": pa.array([rep["doc_count"]], pa.int64()),
            "sum_ttf": pa.array([rep["sum_total_term_freq"]], pa.int64()),
        })

    q["check_index_stats"] = _check_index

    def _join_query_scored(sf):
        """JoinUtil ScoreMode.Max (join/JoinUtil.java:91): each gathered
        value carries the MAX from-side score (n_chars/100 of the de
        docs); a matching to-side doc scores the max over its matched
        values — TermsWithScoreQuery semantics, to-side tf ignored."""
        import pyarrow.compute as pc
        import ray.data

        from lucene_ray.search.join import create_join_query

        def with_score(b):
            texts = b["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            return pa.table({
                "t0": pc.list_element(pc.split_pattern(texts, " "), 0),
                "w": pc.divide(pc.cast(b["n_chars"], pa.float64()), 100.0),
            })

        from_ds = (
            ray.data.read_parquet(
                os.path.join(sf, "documents.parquet"),
                columns=["lang", "n_chars", "text"],
            )
            .filter(expr="lang == 'de' and n_chars < 150")
            .map_batches(with_score, batch_format="pyarrow")
        )
        qj = create_join_query(from_ds, "t0", score_mode="max", score_col="w")
        s = _searcher(sf)
        docs, scores = s.search_all(qj)
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})

    q["join_query_scored"] = _join_query_scored

    def _date_facets(sf):
        """DateTools (document/DateTools.java): timestamps truncated to
        sortable yyyyMMddHH strings (hour resolution), faceted — one
        vectorized strftime + one groupby."""
        import ray.data

        from lucene_ray.util.datetools import date_facet_counts

        ds = ray.data.read_parquet(
            os.path.join(sf, "events.parquet"), columns=["ts"]
        )
        t = date_facet_counts(ds, resolution="hour").to_pandas()
        return pa.table({"date": t["date"], "n": t["count()"].astype("int64")})

    q["date_tools_facets"] = _date_facets
    q["common_terms_query"] = lambda sf: _all_hits_table(
        sf, Q.CommonTermsQuery(("dup", "batch", "scan"), max_doc_freq=100)
    )

    def _mlt(sf):
        import pyarrow.dataset as pads

        s = _searcher(sf)
        doc = pads.dataset(os.path.join(sf, "documents.parquet")).to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id") == 42,
        )
        return _all_hits_table(sf, s.more_like_this(doc["text"][0].as_py(), 10))

    q["more_like_this"] = _mlt

    def _classify(sf):
        """KNN classification: doc 42's text classified by lang votes of
        its 10 MoreLikeThis neighbors."""
        import pyarrow.dataset as pads

        s = _searcher(sf)
        doc = pads.dataset(os.path.join(sf, "documents.parquet")).to_table(
            columns=["text"], filter=pads.field("doc_id") == 42
        )
        return s.classify_knn(doc["text"][0].as_py(), "lang", k=10)

    q["knn_classify_votes"] = _classify

    def _function_score(sf):
        """Expression rescoring: relevance x log(1 + n_chars) (the
        FunctionScoreQuery / expressions-module role)."""
        from lucene_ray.search.expressions import function_score

        s = _searcher(sf)
        docs, scores = function_score(
            s, Q.TermQuery("table"), "score * log(1 + n_chars)", ["n_chars"]
        )
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})

    q["function_score_query"] = _function_score

    # ---- static feature scoring (document/FeatureField.java:96) ----
    q["feature_saturation_topk"] = lambda sf: _topk_table(
        sf, Q.FeatureQuery("chars", "saturation", pivot=1000.0, boost=2.0), 50
    )
    q["feature_sigmoid_all"] = lambda sf: _all_hits_table(
        sf, Q.FeatureQuery("chars", "sigmoid", pivot=800.0, a=2.0)
    )
    # the reference's recommended ranking pattern: relevance FILTER +
    # feature SHOULD (FeatureField.java class javadoc example)
    q["feature_log_filtered"] = lambda sf: _all_hits_table(
        sf,
        Q.BooleanQuery(
            filter=(Q.TermQuery("table"),),
            should=(Q.FeatureQuery("chars", "log", a=1.0, boost=0.5),),
        ),
    )

    # ---- distance-decay feature (document/LongPoint.java:187) ----
    q["distance_feature_topk"] = lambda sf: _topk_table(
        sf, Q.DistanceFeatureQuery("chars", origin=2000.0, pivot=500.0,
                                   boost=3.0), 50
    )
    # recency-boost ranking pattern: relevance MUST + proximity SHOULD
    # (LongDistanceFeatureQuery class javadoc)
    q["distance_feature_boosted"] = lambda sf: _all_hits_table(
        sf,
        Q.BooleanQuery(
            must=(Q.TermQuery("table"),),
            should=(Q.DistanceFeatureQuery("chars", origin=2000.0,
                                           pivot=500.0),),
        ),
    )

    def _payload_searcher(sf):
        """Index with per-position payloads: token i carries (i % 5) + 1
        via the DelimitedPayloadTokenFilter build path (payload_delimiter)."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.index.build import CODEC_VERSION, build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:pay1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            def derive(b: pa.Table) -> pa.Table:
                out = []
                for t in b["text"].to_pylist():
                    out.append(" ".join(
                        f"{w}|{(i % 5) + 1}"
                        for i, w in enumerate(t.split(" "))))
                return pa.table({"doc_id": b["doc_id"],
                                 "text": pa.array(out)})

            ds = ray.data.read_parquet(
                docs, columns=["doc_id", "text"]
            ).map_batches(derive, batch_format="pyarrow")
            build_index(ds, idx, num_segments=3, with_positions=True,
                        analyzer=Analyzer(payload_delimiter="|"))
        return Searcher(idx, mode="f64")

    def _payload_sum(sf):
        """PayloadScoreQuery sum (queries/payloads/PayloadScoreQuery.java:47)."""
        s = _payload_searcher(sf)
        d, sc = s.search_all(Q.PayloadScoreQuery("table", "sum"))
        o = np.argsort(d)
        return pa.table({"doc_id": d[o], "score": _round4(sc[o])})

    q["payload_sum_scores"] = _payload_sum

    def _payload_span_max(sf):
        """includeSpanScore=true: BM25(term) * max payload per doc."""
        s = _payload_searcher(sf)
        d, sc = s.search_all(
            Q.PayloadScoreQuery("table", "max", include_span_score=True))
        o = np.argsort(d)
        return pa.table({"doc_id": d[o], "score": _round4(sc[o])})

    q["payload_span_max"] = _payload_span_max

    def _payload_check(sf):
        """SpanPayloadCheckQuery (queries/payloads/
        SpanPayloadCheckQuery.java:54): 'key value' spans accepted only
        where the payloads are exactly (2, 3) — with the fixture's
        payload = (position % 5) + 1 that is spans anchored at
        p % 5 == 1; per-doc accepted-span counts."""
        s = _payload_searcher(sf)
        d, f = s.payload_check_freqs(("key", "value"), (2.0, 3.0))
        o = np.argsort(d)
        return pa.table({"doc_id": d[o],
                         "span_freq": pa.array(f[o], type=pa.int64())})

    q["payload_check_query"] = _payload_check

    def _string_dv_stats(sf):
        """SortedDocValuesStats (misc/search/DocValuesStats.java:479):
        count / lexicographic min / max / distinct of the 'src' string
        DV over docs matching 'table' — with the committed update
        generations (doc_id%7 -> 'updated-a', then %14 -> 'updated-b')
        overlaid."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_sdvu_index_dir(sf), mode="f64")
        st = s.string_doc_values_stats(Q.TermQuery("table"), "src")
        return pa.table({
            "count": pa.array([st["count"]], type=pa.int64()),
            "vmin": pa.array([st["vmin"]], type=pa.string()),
            "vmax": pa.array([st["vmax"]], type=pa.string()),
            "distinct": pa.array([st["distinct"]], type=pa.int64()),
        })

    q["string_dv_stats"] = _string_dv_stats

    def _rescore(sf):
        """QueryRescorer (search/QueryRescorer.java:46): term-query first
        pass re-ranked by a weighted exact-phrase second pass; k_first
        exceeds the hit count so candidate selection is boundary-free and
        the SQL oracle can mirror it exactly."""
        s = _searcher(sf)
        td = s.rescore(Q.TermQuery("table"), Q.PhraseQuery(("key", "value")),
                       k_first=1_000_000, k=1_000_000, weight=2.0)
        r = _round4(td.scores)
        order = np.lexsort((td.doc_ids, -r))[:20]
        return pa.table({
            "rank": np.arange(1, order.shape[0] + 1, dtype=np.int64),
            "doc_id": td.doc_ids[order],
            "score": r[order],
        })

    q["rescore_phrase_topk"] = _rescore

    def _geo_distance_feature(sf):
        """LatLonPoint.newDistanceFeatureQuery (LatLonPoint.java:260):
        top-20 by boost * pivot / (pivot + haversine) proximity decay."""
        from lucene_ray.pipelines.geo import distance_feature

        t = distance_feature(_geo_points(sf), 48.8566, 2.3522,
                             pivot_m=500_000.0, k=20, boost=2.0)
        return pa.table({"rank": t["rank"], "doc_id": t["doc_id"],
                         "score": _round4(t["score"].to_numpy())})

    q["geo_distance_feature_topk"] = _geo_distance_feature

    def _chunk_index_dir(sf):
        """Nested-doc (child-chunk) index fixture shared by the block-join
        entries."""
        import ray.data

        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.data.webpages import child_chunks
        from lucene_ray.index.build import build_index

        docs_pq = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs_pq}:{os.path.getsize(docs_pq)}:c{CODEC_VERSION}:blk1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.read_parquet(
                docs_pq, columns=["doc_id", "text"]
            ).map_batches(child_chunks, batch_format="pyarrow")
            build_index(
                ds.select_columns(["doc_id", "text"]), idx, num_segments=4
            )
        return idx

    def _block_join(sf):
        """ToParentBlockJoinQuery: child docs = 4-token chunks of each
        parent; a child-level query joins up to parents with
        ScoreMode.Max (join/ToParentBlockJoinQuery.java)."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_chunk_index_dir(sf), mode="f64")
        cdocs, cscores = s.search_all(Q.TermQuery("value"))
        from lucene_ray.data.webpages import CHILD_ID_BASE

        parents = cdocs // CHILD_ID_BASE
        r = _round4(cscores)
        up, inv = np.unique(parents, return_inverse=True)
        best = np.full(up.shape[0], -np.inf)
        np.maximum.at(best, inv, r)
        return pa.table({"parent_id": up, "score": best})

    q["block_join_parents"] = _block_join

    def _block_join_avg(sf):
        """ToParentBlockJoin ScoreMode.Avg (join/ScoreMode.java:25): mean
        of the matching children's scores per parent."""
        from lucene_ray.data.webpages import CHILD_ID_BASE
        from lucene_ray.search.join import to_parent_block_join
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_chunk_index_dir(sf), mode="f64")
        cdocs, cscores = s.search_all(Q.TermQuery("value"))
        up, sc = to_parent_block_join(cdocs, _round4(cscores),
                                      CHILD_ID_BASE, score_mode="avg")
        return pa.table({
            "parent_id": pa.array(up, type=pa.int64()),
            "score": pa.array(_round4(sc), type=pa.float64()),
        })

    q["block_join_parents_avg"] = _block_join_avg

    def _block_join_children(sf):
        """ToChildBlockJoinQuery (join/ToChildBlockJoinQuery.java:41): a
        PARENT-level query ('table' over the documents index) propagates
        its score to every child chunk of each matching parent."""
        from lucene_ray.data.webpages import CHILD_ID_BASE
        from lucene_ray.search.join import to_child_block_join
        from lucene_ray.search.searcher import Searcher

        pdocs, pscores = _searcher(sf).search_all(Q.TermQuery("table"))
        cs = Searcher(_chunk_index_dir(sf), mode="f64")
        cdocs, cscores = to_child_block_join(cs, pdocs, pscores,
                                             CHILD_ID_BASE)
        return pa.table({
            "child_id": pa.array(cdocs, type=pa.int64()),
            "score": pa.array(_round4(cscores), type=pa.float64()),
        })

    q["block_join_children"] = _block_join_children

    def _sloppy(sf):
        s = _searcher(sf)
        docs, freqs = s.phrase_freqs(("key", "value"), slop=2)
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "phrase_freq": freqs[order]})

    q["sloppy_phrase_query"] = _sloppy

    def _drill_down(sf):
        import ray.data as rd

        s = _searcher(sf)
        docs, _sc = s.search_all(Q.TermQuery("table"))
        from lucene_ray.pipelines.facets import drill_down_counts

        ds = rd.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "lang"]
        )
        t = drill_down_counts(ds, docs, "lang").to_pandas()
        return pa.table(
            {"lang": t["lang"], "n": t["count()"].astype("int64")}
        )

    q["drill_down_facet"] = _drill_down

    def _suggest(sf):
        s = _searcher(sf)
        t = s.suggest("s", k=8)
        return pa.table(
            {
                "rank": np.arange(1, t.num_rows + 1, dtype=np.int64),
                "term": t["term"],
                "df": t["df"].to_numpy().astype(np.int64),
            }
        )

    q["suggest_prefix"] = _suggest

    def _suggest_fuzzy(sf):
        """FuzzySuggester (suggest/analyzing/FuzzySuggester.java:60):
        completions whose prefix is within 1 edit of the typo 'winow'
        (first char exact), df-ranked."""
        t = _searcher(sf).suggest_fuzzy("winow", k=8, max_edits=1)
        return pa.table({"rank": t["rank"], "term": t["term"], "df": t["df"]})

    q["suggest_fuzzy"] = _suggest_fuzzy

    def _free_text(sf):
        """FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java:120):
        complete 'v...' after the token 'key', stupid-backoff bigram LM
        over the corpus (alpha=0.4)."""
        import ray.data

        from lucene_ray.pipelines.suggest import free_text_suggest

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["text"]
        )
        return free_text_suggest(ds, "key", "v", k=8)

    q["free_text_suggest"] = _free_text

    def _free_text_backoff(sf):
        """FreeTextSuggester with a 2-token history: complete 's...'
        after 'sort merge'; stupid backoff chains trigram -> bigram ->
        unigram with alpha=0.4 per step (FreeTextSuggester.java:120,
        Brants et al. 2007)."""
        import ray.data

        from lucene_ray.pipelines.suggest import free_text_suggest

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["text"]
        )
        return free_text_suggest(ds, "sort merge", "s", k=8)

    q["free_text_backoff"] = _free_text_backoff

    def _suggest_infix(sf):
        """Infix suggester: terms containing 'a' anywhere, df-ranked."""
        s = _searcher(sf)
        t = s.suggest_infix("a", k=8)
        return pa.table(
            {
                "rank": np.arange(1, t.num_rows + 1, dtype=np.int64),
                "term": t["term"],
                "df": t["df"].to_numpy().astype(np.int64),
            }
        )

    q["suggest_infix"] = _suggest_infix

    def _term_vector(sf):
        """Per-doc term vector (TermVectorsReader role): every (term,
        position) of doc 42 from the persisted positions columns."""
        s = _searcher(sf)
        t = s.term_vector(42)
        return pa.table({
            "term": t["term"],
            "pos": t["pos"].to_numpy(zero_copy_only=False).astype(np.int64),
        })

    q["term_vector_doc"] = _term_vector

    def _spell(sf):
        s = _searcher(sf)
        return s.spell_correct("kye", max_edits=2, k=5)

    q["spell_correct"] = _spell

    def _highlight(sf):
        import pyarrow.dataset as pads

        from lucene_ray.analysis.analyzers import StandardAnalyzer
        from lucene_ray.search.highlight import highlight_batch

        docs = pads.dataset(os.path.join(sf, "documents.parquet")).to_table(
            columns=["doc_id", "text"], filter=pads.field("doc_id") < 50
        )
        return highlight_batch(docs, {"key", "value"}, StandardAnalyzer, window=10)

    q["highlight_passages"] = _highlight

    def _highlight_index(sf):
        """Same passages, but per-token (pos, offsets) read from the
        positional index instead of re-analyzing text."""
        from lucene_ray.search.highlight import highlight_from_index

        s = _searcher(sf)
        return highlight_from_index(s, list(range(50)), {"key", "value"}, window=10)

    q["highlight_index_passages"] = _highlight_index

    # ---- multi-field: field-scoped term query + BM25F ----
    q["field_term_query"] = lambda sf: _all_hits_table(
        sf, Q.TermQuery("table", field="title")
    )

    def _field_exists(sf):
        """FieldExistsQuery (search/FieldExistsQuery.java:63): docs whose
        sparse `kw` field produced >= 1 token; constant score = boost."""
        s = _searcher(sf)
        docs, scores = s.search_all(Q.FieldExistsQuery("kw"))
        order = np.argsort(docs)
        return pa.table({
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(scores[order], type=pa.float64()),
        })

    q["field_exists_query"] = _field_exists

    def _combined_field(sf):
        return _all_hits_table(
            sf,
            Q.CombinedFieldQuery(
                ("table", "key"), ((None, 1.0), ("title", 2.0))
            ),
        )

    q["combined_field_query"] = _combined_field

    def _stored_fetch(sf):
        """Top-5 hits for a term query with their stored fields fetched
        back from the source Parquet (storedFields().document(docid))."""
        s = _searcher(sf)
        docs, scores = s.search_all(Q.TermQuery("window"))
        r = _round4(scores)
        order = np.lexsort((docs, -r))[:5]
        top = docs[order]
        t = s.fetch_docs(top.tolist(), columns=["doc_id", "lang", "n_chars", "text"])
        import pyarrow.compute as pc

        return pa.table(
            {
                "rank": np.arange(1, top.shape[0] + 1, dtype=np.int64),
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "text_prefix": pc.utf8_slice_codeunits(
                    t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"],
                    0, 40,
                ),
            }
        )

    q["stored_fields_fetch"] = _stored_fetch

    def _english_analyzer(sf):
        """BM25 over an EnglishStemAnalyzer index: the query term stems to
        meet the index's stemmed dictionary ('value' -> 'valu')."""
        from lucene_ray.search.searcher import Searcher

        s = Searcher(_stem_index_dir(sf), mode="f64")
        docs, scores = s.search_all(Q.TermQuery(s.analyzer.normalize("value")))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})

    q["english_analyzer_query"] = _english_analyzer

    def _mk_snowball_query(lang: str):
        def _snowball_q(sf):
            from lucene_ray.search.searcher import Searcher

            s = Searcher(_snowball_index_dir(sf, lang), mode="f64")
            docs, scores = s.search_all(
                Q.TermQuery(s.analyzer.normalize("table")))
            order = np.argsort(docs)
            return pa.table({"doc_id": docs[order],
                             "score": _round4(scores[order])})
        _snowball_q.__doc__ = (
            "BM25 over a SnowballFilter(%s) index (snowball/"
            "SnowballFilter.java:48; fresh implementation of the published "
            "Snowball algorithm in analysis/snowball.py): the query term "
            "stems through the same language chain to meet the index's "
            "stemmed dictionary." % lang)
        return _snowball_q

    for _name, _lang in _SNOWBALL_LANGS.items():
        q[f"{_name}_analyzer_query"] = _mk_snowball_query(_lang)

    def _japanese_analyzer_query(sf):
        """Kuromoji JapaneseTokenizer role (kuromoji/JapaneseTokenizer
        .java:63; analysis/japanese.py Viterbi lattice over the reduced
        built-in lexicon): a deterministic synthetic Japanese corpus
        (doc i = sentence[i%8] repeated i%3+1 times) indexes through
        analyzer_for_lang('ja') and BM25-scores TermQuery('東京'); the
        SQL twin reconstructs the same token streams from the engine's
        segmenter output (house compound_word_query pattern)."""
        import ray.data

        from lucene_ray.analysis.analyzers import analyzer_for_lang
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        import pyarrow.parquet as pq

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        texts = [" ".join([_JA_SENTENCES[int(i) % len(_JA_SENTENCES)]]
                          * (int(i) % 3 + 1)) for i in ids_np]
        tag = hashlib.sha1(
            f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:ja1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.from_arrow(pa.table({
                "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
            build_index(ds, idx, analyzer=analyzer_for_lang("ja"),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize("東京")))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["japanese_analyzer_query"] = _japanese_analyzer_query

    def _korean_analyzer_query(sf):
        """Nori KoreanTokenizer + KoreanPartOfSpeechStopFilter roles
        (nori/KoreanTokenizer.java:69, ko/KoreanPartOfSpeechStopFilter
        .java:34; analysis/korean.py eojeol lattice with josa/eomi POS
        drop): a deterministic synthetic Korean corpus (doc i =
        sentence[i%8] repeated i%3+1 times) indexes through
        analyzer_for_lang('ko') and BM25-scores TermQuery('학교'); the
        SQL twin reconstructs the token streams from the engine
        segmenter's output (japanese_analyzer_query pattern)."""
        import ray.data

        from lucene_ray.analysis.analyzers import analyzer_for_lang
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        import pyarrow.parquet as pq

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        texts = [" ".join([_KO_SENTENCES[int(i) % len(_KO_SENTENCES)]]
                          * (int(i) % 3 + 1)) for i in ids_np]
        tag = hashlib.sha1(
            f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:ko1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.from_arrow(pa.table({
                "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
            build_index(ds, idx, analyzer=analyzer_for_lang("ko"),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize("학교")))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["korean_analyzer_query"] = _korean_analyzer_query

    def _chinese_analyzer_query(sf):
        """Smartcn HMMChineseTokenizer role (smartcn/HMMChineseTokenizer
        .java:33, hhmm/HHMMSegmenter.java:39; analysis/chinese.py
        minimum-cost lattice with per-Hanzi OOV): synthetic Chinese
        corpus (doc i = sentence[i%8] repeated i%3+1 times) indexes
        through analyzer_for_lang('zh') and BM25-scores
        TermQuery('搜索'); SQL twin from the engine segmenter's own
        token streams (japanese_analyzer_query pattern)."""
        import ray.data

        from lucene_ray.analysis.analyzers import analyzer_for_lang
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        import pyarrow.parquet as pq

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        texts = [" ".join([_ZH_SENTENCES[int(i) % len(_ZH_SENTENCES)]]
                          * (int(i) % 3 + 1)) for i in ids_np]
        tag = hashlib.sha1(
            f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:zh1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.from_arrow(pa.table({
                "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
            build_index(ds, idx, analyzer=analyzer_for_lang("zh"),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize("搜索")))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["chinese_analyzer_query"] = _chinese_analyzer_query

    def _cjk_bigram_query(sf):
        """CJKBigramFilter / CJKAnalyzer roles (cjk/CJKBigramFilter
        .java:66, cjk/CJKAnalyzer.java:41; analyzers.py
        _cjk_bigram_stream): the Chinese corpus (reps = 1 — see
        _ZH_SENTENCES note) indexes through Analyzer(cjk_bigrams=True),
        so Han runs become overlapping character bigrams, and
        BM25-scores TermQuery('索引') — tf = 2 in sentence 6 ('使用索引'
        and '搜索引擎' both contain the 索引 char pair)."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        import pyarrow.parquet as pq

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        texts = [_ZH_SENTENCES[int(i) % len(_ZH_SENTENCES)]
                 for i in ids_np]
        tag = hashlib.sha1(
            f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:cjkb1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.from_arrow(pa.table({
                "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
            build_index(ds, idx, analyzer=Analyzer(cjk_bigrams=True),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery("索引"))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["cjk_bigram_query"] = _cjk_bigram_query

    def _cjk_width_query(sf):
        """CJKWidthFilter role (cjk/CJKWidthFilter.java:36;
        analysis/stem.cjk_width_fold): a width-mixed corpus (halfwidth
        katakana with voiced marks, fullwidth ASCII) indexes through
        Analyzer(cjk_width=True), so ﾃﾞｰﾀ / データ meet at one folded
        term; BM25-scores TermQuery(normalize('ﾃﾞｰﾀ')). SQL twin from
        the analyzer's own token streams (japanese_analyzer_query
        pattern)."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        import pyarrow.parquet as pq

        ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        texts = [" ".join([_WIDTH_SENTENCES[int(i) % len(_WIDTH_SENTENCES)]]
                          * (int(i) % 3 + 1)) for i in ids_np]
        tag = hashlib.sha1(
            f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:cjkw1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.from_arrow(pa.table({
                "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
            build_index(ds, idx, analyzer=Analyzer(cjk_width=True),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize("ﾃﾞｰﾀ")))
        order = np.argsort(d)
        return pa.table({"doc_id": d[order], "score": _round4(sc[order])})

    q["cjk_width_query"] = _cjk_width_query

    def _mk_lang_corpus_query(name: str, lang: str, sentences, term: str,
                              role: str):
        def _lq(sf):
            import ray.data

            from lucene_ray.analysis.analyzers import analyzer_for_lang
            from lucene_ray.codec.postings import CODEC_VERSION
            from lucene_ray.index.build import build_index
            from lucene_ray.search.searcher import Searcher

            docs = os.path.join(sf, "documents.parquet")
            import pyarrow.parquet as pq

            ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
            ids_np = ids.to_numpy(zero_copy_only=False)
            texts = [" ".join([sentences[int(i) % len(sentences)]]
                              * (int(i) % 3 + 1)) for i in ids_np]
            tag = hashlib.sha1(
                f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:{lang}1".encode()
            ).hexdigest()[:12]
            idx = os.path.join(_CACHE_ROOT, tag)
            if not os.path.exists(os.path.join(idx, "manifest.json")):
                ds = ray.data.from_arrow(pa.table({
                    "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
                build_index(ds, idx, analyzer=analyzer_for_lang(lang),
                            num_segments=4)
            s = Searcher(idx, mode="f64")
            d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize(term)))
            order = np.argsort(d)
            return pa.table({"doc_id": d[order],
                             "score": _round4(sc[order])})

        _lq.__doc__ = (
            f"{role}: deterministic synthetic {name} corpus (doc i = "
            f"sentence[i%8] repeated i%3+1 times) indexes through "
            f"analyzer_for_lang({lang!r}) and BM25-scores "
            f"TermQuery(normalize({term!r})); the SQL twin reconstructs "
            f"the token streams from the engine analyzer's own output "
            f"(japanese_analyzer_query pattern).")
        return _lq

    for _nm, (_lg, _sents, _term, _role) in _LANG_CORPORA.items():
        q[f"{_nm}_analyzer_query"] = _mk_lang_corpus_query(
            _nm, _lg, _sents, _term, _role)

    def _mk_flag_corpus_query(name: str, an_kwargs: dict, sentences,
                              term: str, role: str):
        """Like _mk_lang_corpus_query but with an explicit Analyzer
        config (token-filter entries) instead of a language route."""
        def _fq(sf):
            import ray.data

            from lucene_ray.analysis.analyzers import Analyzer
            from lucene_ray.codec.postings import CODEC_VERSION
            from lucene_ray.index.build import build_index
            from lucene_ray.search.searcher import Searcher

            docs = os.path.join(sf, "documents.parquet")
            import pyarrow.parquet as pq

            ids = pq.read_table(docs, columns=["doc_id"])["doc_id"]
            ids_np = ids.to_numpy(zero_copy_only=False)
            texts = [" ".join([sentences[int(i) % len(sentences)]]
                              * (int(i) % 3 + 1)) for i in ids_np]
            tag = hashlib.sha1(
                f"{docs}:{len(ids_np)}:c{CODEC_VERSION}:{name}1".encode()
            ).hexdigest()[:12]
            idx = os.path.join(_CACHE_ROOT, tag)
            if not os.path.exists(os.path.join(idx, "manifest.json")):
                ds = ray.data.from_arrow(pa.table({
                    "doc_id": pa.array(ids_np), "text": pa.array(texts)}))
                build_index(ds, idx, analyzer=Analyzer(**an_kwargs),
                            num_segments=4)
            s = Searcher(idx, mode="f64")
            d, sc = s.search_all(Q.TermQuery(s.analyzer.normalize(term)))
            order = np.argsort(d)
            return pa.table({"doc_id": d[order],
                             "score": _round4(sc[order])})

        _fq.__doc__ = (
            f"{role}: deterministic synthetic corpus (doc i = "
            f"sentence[i%8] repeated i%3+1 times) indexes through "
            f"Analyzer({an_kwargs!r}) and BM25-scores "
            f"TermQuery(normalize({term!r})); the SQL twin reconstructs "
            f"the token streams from the engine analyzer's own output "
            f"(japanese_analyzer_query pattern).")
        return _fq

    for _nm, (_kw, _sents, _term, _role) in _FLAG_CORPORA.items():
        q[f"{_nm}_query"] = _mk_flag_corpus_query(
            _nm, _kw, _sents, _term, _role)

    def _per_field_analyzer(sf):
        """PerFieldAnalyzerWrapper (analysis/miscellaneous/
        PerFieldAnalyzerWrapper.java:51): the title field indexes AND
        parses with a Porter-stemming analyzer while the body stays
        standard — parse('title:valued') stems to 'valu' and scores over
        the stemmed title section."""
        import ray.data

        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.data.webpages import with_title_column
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:pf1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            ds = ray.data.read_parquet(
                docs, columns=["doc_id", "text"]
            ).map_batches(with_title_column, batch_format="pyarrow")
            build_index(ds, idx, num_segments=4,
                        extra_fields={"title": "title"},
                        field_analyzers={"title": Analyzer(stem=True)},
                        stored_source=docs)
        s = Searcher(idx, mode="f64")
        d, sc = s.search_all(s.parse("title:valued"))
        o = np.argsort(d)
        return pa.table({"doc_id": d[o], "score": _round4(sc[o])})

    q["per_field_analyzer_query"] = _per_field_analyzer

    def _synonym_index(sf):
        """Index built with index-side synonym injection: a single-token
        rule (fast -> quick, same position) AND a multi-word graph rule
        ("key value" -> kv: the target injects at the run's first
        position wherever 'key','value' occur at consecutive positions —
        SynonymGraphFilter.java:78 posLength flattening). Querying each
        injected term matches source docs; rows labeled per query."""
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:syn2".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(
                docs, idx,
                analyzer=Analyzer(synonyms=(("fast", ("quick",)),
                                            ("key value", ("kv",)))),
                num_segments=4,
            )
        s = Searcher(idx, mode="f64")
        parts = []
        for label in ("quick", "kv"):
            d, sc = s.search_all(Q.TermQuery(label))
            order = np.argsort(d)
            parts.append(pa.table({
                "q": pa.array([label] * d.shape[0]),
                "doc_id": d[order],
                "score": _round4(sc[order]),
            }))
        return pa.concat_tables(parts)

    q["synonym_index_query"] = _synonym_index

    def _solr_synonyms(sf):
        """SolrSynonymParser (analysis/synonym/SolrSynonymParser.java:33):
        the analyzer's synonym rules come from parsing a synonyms.txt in
        Solr syntax — explicit mappings 'fast => quick' and the
        multi-word 'key value => kv'. The parsed tuple equals the
        synonym_index_query fixture's config exactly, so the index cache
        and the SQL twin are shared."""
        from lucene_ray.analysis.analyzers import Analyzer
        from lucene_ray.analysis.synparse import parse_solr_synonyms
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.build import build_index
        from lucene_ray.search.searcher import Searcher

        syns = parse_solr_synonyms(
            "# fixture synonyms.txt\n"
            "fast => quick\n"
            "key value => kv\n")
        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:syn2".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(docs, idx, analyzer=Analyzer(synonyms=syns),
                        num_segments=4)
        s = Searcher(idx, mode="f64")
        parts = []
        for label in ("quick", "kv"):
            d, sc = s.search_all(Q.TermQuery(label))
            order = np.argsort(d)
            parts.append(pa.table({
                "q": pa.array([label] * d.shape[0]),
                "doc_id": d[order],
                "score": _round4(sc[order]),
            }))
        return pa.concat_tables(parts)

    q["solr_synonyms_query"] = _solr_synonyms

    def _edge_ngrams(sf):
        import ray.data

        from lucene_ray.analysis.ngram import edge_ngram_counts

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
        )
        return pa.concat_tables(
            edge_ngram_counts(ds, min_n=2, max_n=4)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")

    q["edge_ngram_counts"] = _edge_ngrams

    def _index_sorted(sf):
        """setIndexSort: corpus resequenced by (n_chars desc, doc_id) with
        dense new ids; sorted top-k = first k docs, no scoring."""
        from lucene_ray.codec.postings import CODEC_VERSION
        from lucene_ray.index.sorted import build_sorted_index, sorted_topk
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:sort1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_sorted_index(docs, idx, by="n_chars", descending=True,
                               num_segments=4)
        s = Searcher(idx)
        t = sorted_topk(s, 10, columns=["doc_id", "orig_doc_id", "n_chars"])
        return pa.table(
            {
                "rank": t["doc_id"],  # new ids ARE the global sort ranks
                "doc_id": t["orig_doc_id"],
                "n_chars": t["n_chars"],
            }
        )

    q["index_sorted_topk"] = _index_sorted

    def _index_sorted_range(sf):
        """IndexSortSortedNumericDocValuesRangeQuery (sandbox): a range on
        the index-sort key is two binary searches over parquet footer
        stats + one/two boundary files — everything between matches."""
        import hashlib

        from lucene_ray.index.build import CODEC_VERSION
        from lucene_ray.index.sorted import build_sorted_index, sorted_range_count
        from lucene_ray.search.searcher import Searcher

        docs = os.path.join(sf, "documents.parquet")
        tag = hashlib.sha1(
            f"{docs}:{os.path.getsize(docs)}:c{CODEC_VERSION}:sort1".encode()
        ).hexdigest()[:12]
        idx = os.path.join(_CACHE_ROOT, tag)
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_sorted_index(docs, idx, by="n_chars", descending=True,
                               num_segments=4)
        n = sorted_range_count(Searcher(idx), lower=200, upper=400)
        return pa.table({"n": pa.array([n], pa.int64())})

    q["index_sorted_range_count"] = _index_sorted_range

    # ---- index statistics (global aggregates off the index) ----
    def _term_stats(sf):
        import pyarrow.compute as pc

        from lucene_ray.index.build import read_global_term_stats
        from lucene_ray.index.fields import FIELD_MARK

        t = read_global_term_stats(_index_dir(sf)).sort_by("term")
        # default field only: drop \x01-prefixed field-section keys
        t = t.filter(pc.invert(pc.starts_with(t["term"], FIELD_MARK)))
        return t.select(["term", "df", "ttf"])

    q["term_stats"] = _term_stats

    def _field_stats(sf):
        s = _searcher(sf)
        return pa.table(
            {
                "doc_count": pa.array([s.doc_count], type=pa.int64()),
                "sum_ttf": pa.array([s.sum_ttf], type=pa.int64()),
                "avgdl": pa.array([round(s.sum_ttf / s.doc_count, 4)]),
            }
        )

    q["field_stats"] = _field_stats

    def _hft(sf):
        from lucene_ray.pipelines.facets import high_freq_terms

        return high_freq_terms(_index_dir(sf), k=10, by="df").select(["term", "df"])

    q["high_freq_terms"] = _hft

    def _doc_norms(sf):
        import pyarrow.parquet as pq

        from lucene_ray.index.build import load_manifest
        from lucene_ray.util.smallfloat import LENGTH_TABLE_INT

        m = load_manifest(_index_dir(sf))
        tbls = [
            pq.read_table(os.path.join(s["path"], "docs.parquet"))
            for s in m["segments"]
        ]
        t = pa.concat_tables(tbls).sort_by("doc_id")
        quant = LENGTH_TABLE_INT[t["norm"].to_numpy()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "doc_len": t["doc_len"],
                "quantized_len": quant,
            }
        )

    q["doc_norms"] = _doc_norms

    def _match_all_count(sf):
        s = _searcher(sf)
        return pa.table({"n": pa.array([s.count(Q.MatchAllDocsQuery())], type=pa.int64())})

    q["match_all_count"] = _match_all_count

    # ---- analysis pipelines over the webpage corpus ----
    def _token_stats(sf):
        from lucene_ray.pipelines.textstats import token_stats

        t = pa.concat_tables(
            token_stats(_pages_ds(sf)).iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")
        return t.select(["doc_id", "token_count", "distinct_terms"])

    q["token_stats"] = _token_stats

    def _quality(sf):
        from lucene_ray.pipelines.textstats import quality_scores

        t = pa.concat_tables(
            quality_scores(_pages_ds(sf)).iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "token_count": t["token_count"],
                "stopword_count": t["stopword_count"],
                "stopword_ratio": _round4(t["stopword_ratio"].to_numpy()),
            }
        )

    q["quality_scores"] = _quality

    def _shingles(sf):
        from lucene_ray.pipelines.textstats import shingle_counts

        return pa.concat_tables(
            shingle_counts(_pages_ds(sf), n=2).iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")

    q["shingle_counts"] = _shingles

    # ---- web-text curation (pipelines/webtext.py) ----
    def _docs_ds(sf, columns):
        import ray.data

        return ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=columns
        )

    def _pii(sf):
        """PII redaction over deterministically injected emails / phones /
        IPv4s (the raw corpus has none); injection is replicated verbatim
        in the oracle's CASE/concat chain."""
        import pyarrow.compute as pc

        from lucene_ray.pipelines.webtext import pii_redact

        def inject(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy()
            email = pc.binary_join_element_wise(
                pa.array(np.full(b.num_rows, " contact "), pa.string()),
                b["source"].combine_chunks() if isinstance(
                    b["source"], pa.ChunkedArray) else b["source"],
                pa.array(np.full(b.num_rows, "@example.com"), pa.string()),
                "")
            ip = pa.array([f" from 10.0.{d % 256}.{(d * 7) % 256}"
                           for d in did.tolist()], pa.string())
            t = b["text"]
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            empty = pa.array(np.full(b.num_rows, ""), pa.string())
            t = pc.binary_join_element_wise(
                t,
                pc.if_else(pa.array(did % 3 == 0), email, empty),
                pc.if_else(pa.array(did % 5 == 0),
                           pa.array(np.full(b.num_rows, " call 555-123-4567"),
                                    pa.string()), empty),
                pc.if_else(pa.array(did % 7 == 0), ip, empty),
                "")
            return pa.table({"doc_id": b["doc_id"], "text": t})

        ds = _docs_ds(sf, ["doc_id", "source", "text"]).map_batches(
            inject, batch_format="pyarrow")
        return pa.concat_tables(
            pii_redact(ds).iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 16)
        ).sort_by("doc_id")

    q["pii_redact"] = _pii

    def _gopher(sf):
        from lucene_ray.pipelines.webtext import gopher_repetition

        t = pa.concat_tables(
            gopher_repetition(_docs_ds(sf, ["doc_id", "text"]))
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")
        return pa.table({
            "doc_id": t["doc_id"],
            "token_count": t["token_count"],
            "top_unigram_frac": _round4(t["top_unigram_frac"].to_numpy()),
            "dup_bigram_frac": _round4(t["dup_bigram_frac"].to_numpy()),
            "keep": t["keep"],
        })

    q["gopher_repetition"] = _gopher

    def _quota(sf):
        from lucene_ray.pipelines.webtext import quota_sample

        t = quota_sample(
            _docs_ds(sf, ["doc_id", "source", "n_chars"]),
            "source", 3, "n_chars", descending=True,
        ).to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
        return pa.Table.from_pandas(
            t[["source", "doc_id", "n_chars"]], preserve_index=False)

    q["domain_quota_sample"] = _quota

    def _nb(sf):
        import ray

        from lucene_ray.pipelines.webtext import nb_classify, nb_train

        ds = _docs_ds(sf, ["doc_id", "lang", "text"])
        model_ref = ray.put(nb_train(ds, "lang"))
        return pa.concat_tables(
            nb_classify(ds, model_ref)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")

    q["nb_classify_lang"] = _nb

    # ---- webpage corpus / HTML extraction / dedup ----
    def _html_extract(sf):
        from lucene_ray.pipelines.html import extract_text

        t = pa.concat_tables(
            extract_text(_pages_ds(sf), concurrency=2)
            .select_columns(["doc_id", "url", "extracted_title", "extracted_text"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("doc_id")

    q["html_extract"] = _html_extract

    def _dedup(sf):
        from lucene_ray.pipelines.dedup import dedup_exact

        t = pa.concat_tables(
            dedup_exact(_pages_ds(sf))
            .select_columns(["doc_id", "url"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("doc_id")

    q["dedup_exact"] = _dedup

    def _dedup_content(sf):
        from lucene_ray.pipelines.dedup import dedup_exact_content

        t = pa.concat_tables(
            dedup_exact_content(_pages_ds(sf))
            .select_columns(["doc_id"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("doc_id")

    q["dedup_exact_content"] = _dedup_content

    def _fingerprint_dedup(sf):
        """FingerprintFilter duplicate groups (miscellaneous/
        FingerprintFilter.java:44 — one sorted de-duplicated token-set
        key per doc; pipelines/dedup.token_fingerprints): docs with
        equal token SETS (any order/repetition) group; returns
        (fingerprint, n_docs, keeper) for groups of 2+. Key-only
        groupby shuffle, vectorized fingerprint map."""
        from lucene_ray.pipelines.dedup import fingerprint_dedup

        t = pa.concat_tables(
            fingerprint_dedup(_pages_ds(sf))
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("fingerprint")

    q["fingerprint_dedup"] = _fingerprint_dedup

    def _jaccard(sf):
        from lucene_ray.pipelines.dedup import jaccard_pairs

        t = pa.concat_tables(
            jaccard_pairs(_pages_ds(sf), shingle_n=2, threshold=0.8)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        t = t.sort_by([("a", "ascending"), ("b", "ascending")])
        return pa.table(
            {"a": t["a"], "b": t["b"], "jaccard": _round4(t["jaccard"].to_numpy())}
        )

    q["jaccard_pairs"] = _jaccard

    # ---- facets / grouping / sorting over documents ----
    def _facet(sf, field):
        import ray.data

        from lucene_ray.pipelines.facets import facet_counts

        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"), columns=[field])
        t = facet_counts(ds, field).to_pandas()
        return pa.table({field: t[field], "n": t["count()"].astype("int64")})

    q["facet_lang_counts"] = lambda sf: _facet(sf, "lang")
    q["facet_source_counts"] = lambda sf: _facet(sf, "source")

    def _taxonomy(sf):
        """Hierarchical source/lang taxonomy: every node (source and
        source/lang) counted in one exploded groupby
        (FastTaxonomyFacetCounts.java:40)."""
        import ray.data

        from lucene_ray.pipelines.facets import taxonomy_counts

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["source", "lang"]
        )
        t = taxonomy_counts(ds, ["source", "lang"]).to_pandas()
        return pa.table({"path": t["path"], "n": t["count()"].astype("int64")})

    q["taxonomy_counts"] = _taxonomy

    def _taxonomy_assoc(sf):
        """Association facets (TaxonomyFacetSumFloatAssociations.java:31):
        per-node SUM of n_chars over the source/lang taxonomy."""
        import ray.data

        from lucene_ray.pipelines.facets import taxonomy_sum_associations

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["source", "lang", "n_chars"],
        )
        t = taxonomy_sum_associations(ds, ["source", "lang"], "n_chars")
        import pyarrow as _pa

        rows = t.take_all()
        return _pa.table({
            "path": [r["path"] for r in rows],
            "sum_value": _pa.array([r["sum_value"] for r in rows],
                                   _pa.float64()),
        })

    q["taxonomy_sum_assoc"] = _taxonomy_assoc

    def _taxonomy_max_assoc(sf):
        """MAX association facets (AssociationAggregationFunction.MAX,
        facet/taxonomy/AssociationAggregationFunction.java:31): per-node
        MAX of n_chars over the source/lang taxonomy."""
        import ray.data

        from lucene_ray.pipelines.facets import taxonomy_max_associations

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["source", "lang", "n_chars"],
        )
        t = taxonomy_max_associations(ds, ["source", "lang"], "n_chars")
        import pyarrow as _pa

        rows = t.take_all()
        return _pa.table({
            "path": [r["path"] for r in rows],
            "max_value": _pa.array([r["max_value"] for r in rows],
                                   _pa.float64()),
        })

    q["taxonomy_max_assoc"] = _taxonomy_max_assoc

    def _facet_sets(sf):
        """FacetSets (facet/facetset/MatchingFacetSetsCounts.java:40 +
        Exact/RangeFacetSetMatcher): each doc's (lang, source, n_chars)
        point counted against one exact matcher and two range matchers
        (None = unconstrained dim)."""
        import ray.data

        from lucene_ray.pipelines.facets import facet_set_counts

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["lang", "source", "n_chars"])
        t = facet_set_counts(ds, ["lang", "source", "n_chars"], [
            {"label": "exact_en_src3_any",
             "ranges": (("en", "en"), ("src3", "src3"), None)},
            {"label": "en_chars_small",
             "ranges": (("en", "en"), None, (None, 400))},
            {"label": "src1_to_3_big",
             "ranges": (None, ("src1", "src3"), (250, None))},
        ])
        rows = t.take_all()
        return pa.table({
            "label": [r["label"] for r in rows],
            "count": pa.array([r["count"] for r in rows], pa.int64()),
        })

    q["facet_set_counts"] = _facet_sets

    def _all_groups(sf):
        """AllGroupsCollector (grouping/AllGroupsCollector.java:33): the
        set of DISTINCT group values (source) among docs matching
        'table' — group count plus the sorted group list head."""
        import pyarrow.compute as pc

        s = _searcher(sf)
        docs, _ = s.search_all(Q.TermQuery("table"))
        t = s.fetch_docs(docs.tolist(), columns=["doc_id", "source"])
        groups = sorted(set(pc.unique(
            t["source"].combine_chunks()
            if isinstance(t["source"], pa.ChunkedArray)
            else t["source"]).to_pylist()))
        return pa.table({
            "group": pa.array(groups, pa.string()),
            "n_groups": pa.array([len(groups)] * len(groups), pa.int64()),
        })

    q["all_groups_query"] = _all_groups

    def _spell_jw(sf):
        """SpellChecker + JaroWinklerDistance (suggest/spell/
        JaroWinklerDistance.java:32, setStringDistance/setAccuracy):
        did-you-mean for 'costumer' — dictionary terms with JW
        similarity >= 0.7 ranked (similarity desc, df desc, term asc).
        DuckDB's built-in jaro_winkler_similarity is the exact twin."""
        s = _searcher(sf)
        t = s.spell_correct_jaro_winkler("costumer",
                                         min_similarity=0.7, k=5)
        return pa.table({
            "rank": t["rank"],
            "term": t["term"],
            "similarity": pa.array(
                [_round6(float(x)) for x in
                 t["similarity"].to_numpy(zero_copy_only=False)],
                type=pa.float64()),
            "df": t["df"],
        })

    q["spell_jaro_winkler"] = _spell_jw

    def _long_value_facet(sf):
        """LongValueFacetCounts (facet/LongValueFacetCounts.java:48):
        top-10 n_chars values by doc count (count desc, value asc)."""
        import ray.data

        from lucene_ray.pipelines.facets import long_value_counts

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["n_chars"])
        t = long_value_counts(ds, "n_chars", k=10)
        return pa.table({"n_chars": t["n_chars"],
                         "n": t["n"].cast(pa.int64())})

    q["long_value_facet_counts"] = _long_value_facet

    def _decontaminate(sf):
        """Benchmark decontamination: corpus docs sharing >= 2 distinct
        word trigrams with the doc_id<20 'benchmark' set; the benchmark
        shingle set broadcasts once, the corpus never shuffles."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data

        from lucene_ray.pipelines.dedup import decontaminate

        docs = os.path.join(sf, "documents.parquet")
        bench = pq.read_table(docs, columns=["doc_id", "text"])
        bench = bench.filter(pc.less(bench["doc_id"], 20))
        corpus = ray.data.read_parquet(docs, columns=["doc_id", "text"])
        t = pa.concat_tables(
            decontaminate(corpus, bench, shingle_n=3, min_hits=2)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        order = np.argsort(t["doc_id"].to_numpy())
        return t.take(pa.array(order))

    q["decontaminate_trigram"] = _decontaminate

    def _drill_sideways(sf):
        """DrillSideways (facet/DrillSideways.java:71): drill-down on
        lang='de' AND source='src3'; each dim's counts computed with its
        own selection removed, the other applied."""
        import ray.data

        from lucene_ray.pipelines.facets import drill_sideways_counts

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["source", "lang"]
        )
        t = drill_sideways_counts(
            ds, {"lang": "de", "source": "src3"}
        ).to_pandas()
        return pa.table({
            "dim": t["dim"], "value": t["value"],
            "n": t["count()"].astype("int64"),
        })

    q["drill_sideways_facet"] = _drill_sideways

    # -- geo (pipelines/geo.py — LatLonPoint.java:67-68) ----------------

    def _geo_points(sf):
        """documents with deterministic derived (lat, lon): the corpus
        ships no geo columns, so both sides derive the same integer-exact
        columns (the oracle repeats the formula in SQL)."""
        import ray.data

        def derive(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "doc_id": ids,
                "lat": (ids * 9973 % 18000) / 100.0 - 90.0,
                "lon": (ids * 7919 % 36000) / 100.0 - 180.0,
            })

        return ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id"]
        ).map_batches(derive, batch_format="pyarrow")

    def _geo_box(sf):
        """LatLonPoint.newBoxQuery (LatLonPoint.java:220): points inside
        [10,60] x [-30,40]."""
        from lucene_ray.pipelines.geo import geo_box

        t = geo_box(_geo_points(sf), 10.0, 60.0, -30.0, 40.0).to_pandas()
        t = t.sort_values("doc_id")
        return pa.table({"doc_id": t["doc_id"].to_numpy(np.int64),
                         "lat": t["lat"].to_numpy(),
                         "lon": t["lon"].to_numpy()})

    q["geo_box_query"] = _geo_box

    def _geo_distance(sf):
        """LatLonPoint.newDistanceQuery: points within 3,000 km of Paris
        (48.8566, 2.3522) — bounding-box prune + exact haversine refine
        (SloppyMath.java:47 with TO_METERS = 6_371_008.7714)."""
        from lucene_ray.pipelines.geo import geo_distance

        t = geo_distance(_geo_points(sf), 48.8566, 2.3522,
                         3_000_000.0).to_pandas()
        return pa.table({"doc_id": np.sort(t["doc_id"].to_numpy(np.int64))})

    q["geo_distance_query"] = _geo_distance

    def _geo_nearest(sf):
        """Sandbox LatLonPointPrototypeQueries.nearest: the 20 points
        closest to (40.7, -74.0), tie-broken by doc_id (distance column
        omitted so the hash compares integer ranks, not trig ulps)."""
        from lucene_ray.pipelines.geo import geo_nearest

        t = geo_nearest(_geo_points(sf), 40.7, -74.0, k=20)
        return pa.table({"rank": t["rank"], "doc_id": t["doc_id"]})

    q["geo_nearest_topk"] = _geo_nearest

    def _geo_heatmap(sf):
        """HeatmapFacetCounter (spatial-extras/.../prefix/
        HeatmapFacetCounter.java:63): 10x12 grid counts over
        [0.005, 50.005) x [-60.005, 59.995) — bounds sit off the
        derived 0.01-degree lattice so no point lands on a cell edge."""
        from lucene_ray.pipelines.geo import geo_heatmap

        return geo_heatmap(_geo_points(sf), 0.005, 50.005, -60.005,
                           59.995, grid_lat=10, grid_lon=12)

    q["geo_heatmap_facets"] = _geo_heatmap

    _GEO_PATH = ((40.005, 45.005, 35.005), (-70.005, 0.005, 40.005))
    _GEO_PATH_R = 1_500_000.0

    def _geo_path(sf):
        """Path-corridor query (LatLonShape LINE distance role,
        document/LatLonShape.java; spatial3d/geom/GeoStandardPath
        .java:42): points within 1,500 km of a 2-segment great-circle
        route — exact cross-track distance clamped to each arc, engine
        and SQL twin sharing the same per-segment constants."""
        from lucene_ray.pipelines.geo import geo_path_distance

        t = pa.concat_tables(
            geo_path_distance(_geo_points(sf), *_GEO_PATH, _GEO_PATH_R)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        return pa.table({"doc_id": pa.array(
            np.sort(t["doc_id"].to_numpy(zero_copy_only=False)),
            type=pa.int64())})

    q["geo_path_query"] = _geo_path

    def _geo_polygon(sf):
        """LatLonPoint.newPolygonQuery (LatLonPoint.java:239,
        LatLonPointInPolygonQuery; geo/Polygon.java shell+holes model):
        points inside a convex pentagon shell and outside a rectangular
        hole. Vertices sit off the derived 0.01-degree lattice so no
        point lands exactly on an edge (the oracle's half-plane SQL and
        the even-odd kernel then agree on every row)."""
        from lucene_ray.pipelines.geo import geo_polygon

        shell = ([10.005, 40.005, 60.005, 40.005, 10.005],
                 [-20.005, -40.005, 0.005, 40.005, 20.005])
        hole = ([30.005, 40.005, 40.005, 30.005],
                [-10.005, -10.005, 10.005, 10.005])
        t = geo_polygon(_geo_points(sf), shell[0], shell[1],
                        holes=[hole]).to_pandas().sort_values("doc_id")
        return pa.table({"doc_id": t["doc_id"].to_numpy(np.int64),
                         "lat": t["lat"].to_numpy(),
                         "lon": t["lon"].to_numpy()})

    q["geo_polygon_query"] = _geo_polygon

    def _distinct(sf):
        import ray.data

        from lucene_ray.pipelines.facets import distinct_values

        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"), columns=["source"])
        return distinct_values(ds, "source")

    q["distinct_sources"] = _distinct

    def _sort_topk(sf):
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "n_chars"]
        )
        t = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10).to_pandas()
        return pa.Table.from_pandas(t, preserve_index=False)

    q["sort_by_field_topk"] = _sort_topk

    def _grouped_topk(sf):
        import ray.data

        from lucene_ray.pipelines.facets import grouped_top_k

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
        )
        t = grouped_top_k(ds, "lang", "n_chars", 2).to_pandas()
        t = t.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        return pa.Table.from_pandas(t[["lang", "doc_id", "n_chars"]], preserve_index=False)

    q["grouped_topk"] = _grouped_topk

    def _range_facet(sf):
        import ray.data

        from lucene_ray.pipelines.facets import range_facets

        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"), columns=["n_chars"])
        t = range_facets(ds, "n_chars", [0, 200, 400, 100000]).to_pandas()
        return pa.table({"bucket": t["bucket"].astype("int64"), "n": t["count()"].astype("int64")})

    q["range_facet_nchars"] = _range_facet

    def _numeric_range(sf):
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "n_chars"]
        )
        t = ds.filter(expr="n_chars >= 200 and n_chars < 400").select_columns(["doc_id"]).to_pandas()
        return pa.Table.from_pandas(t.sort_values("doc_id").reset_index(drop=True), preserve_index=False)

    q["point_range_query"] = _numeric_range

    # ---- ANN over embeddings ----
    def _knn(sf):
        import pyarrow.parquet as pq
        import ray.data

        from lucene_ray.pipelines.ann import knn_brute_cosine

        emb_path = os.path.join(sf, "embeddings.parquet")
        head = pq.read_table(emb_path).slice(0, 3)
        Qm = np.stack(head["embedding"].to_pylist())
        n = pq.ParquetFile(emb_path).metadata.num_rows
        full = knn_brute_cosine(ray.data.read_parquet(emb_path), Qm, k=n)
        qid = full["query_id"].to_numpy()
        nid = full["neighbor_id"].to_numpy()
        cos = _round4(full["cosine"].to_numpy())
        out = {"query_id": [], "rank": [], "neighbor_id": [], "cosine": []}
        for j in range(3):
            sel = qid == j
            order = np.lexsort((nid[sel], -cos[sel]))[:10]
            out["query_id"].append(np.full(10, j, dtype=np.int64))
            out["rank"].append(np.arange(1, 11, dtype=np.int64))
            out["neighbor_id"].append(nid[sel][order])
            out["cosine"].append(cos[sel][order])
        # query ids are vec_ids 0,1,2 (head rows)
        vec_ids = head["vec_id"].to_numpy()
        out["query_id"] = [vec_ids[a] for a in out["query_id"]]
        return pa.table({k: np.concatenate(v) for k, v in out.items()})

    q["knn_cosine_topk"] = _knn

    # ---- events (streaming-shaped) ----
    def _events_window(sf):
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf, "events.parquet"), columns=["ts", "event_type", "value"]
        )

        def bucket(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hour = pc.floor_temporal(b["ts"], unit="hour")
            hour_epoch = pc.divide(hour.cast(pa.int64()), 1_000_000)
            return pa.table(
                {"hour_epoch": hour_epoch, "event_type": b["event_type"], "value": b["value"]}
            )

        from ray.data.aggregate import Count, Sum

        t = (
            ds.map_batches(bucket, batch_format="pyarrow")
            .groupby(["hour_epoch", "event_type"])
            .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
            .to_pandas()
        )
        t = t.sort_values(["hour_epoch", "event_type"]).reset_index(drop=True)
        t["sum_value"] = _round4(t["sum_value"].to_numpy())
        t["n"] = t["n"].astype("int64")
        return pa.Table.from_pandas(t, preserve_index=False)

    q["events_tumbling_window"] = _events_window

    def _events_sliding(sf):
        """1-hour windows sliding every 30 min: each event lands in the two
        windows covering it (assignment fan-out in map_batches, then one
        groupby — the standard distributed sliding-window shape)."""
        import ray.data
        from ray.data.aggregate import Count, Sum

        ds = ray.data.read_parquet(
            os.path.join(sf, "events.parquet"), columns=["ts", "event_type", "value"]
        )
        S = 1800  # slide (s); window = 2 * S

        def assign(b: pa.Table) -> pa.Table:
            sec = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
            w1 = (sec // S) * S
            parts = []
            for w in (w1 - S, w1):
                parts.append(
                    pa.table(
                        {
                            "window_epoch": pa.array(w, type=pa.int64()),
                            "event_type": b["event_type"],
                            "value": b["value"],
                        }
                    )
                )
            return pa.concat_tables(parts)

        t = (
            ds.map_batches(assign, batch_format="pyarrow")
            .groupby(["window_epoch", "event_type"])
            .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
            .to_pandas()
        )
        t = t.sort_values(["window_epoch", "event_type"]).reset_index(drop=True)
        t["sum_value"] = _round4(t["sum_value"].to_numpy())
        t["n"] = t["n"].astype("int64")
        return pa.Table.from_pandas(t, preserve_index=False)

    q["events_sliding_window"] = _events_sliding

    def _events_sessions(sf):
        """Gap-based per-user sessionization (streaming session windows):
        one sort, vectorized per-block scan, tiny boundary pass."""
        import ray.data

        from lucene_ray.pipelines.events import sessionize

        ds = ray.data.read_parquet(
            os.path.join(sf, "events.parquet"),
            columns=["user_id", "ts", "value"],
        )
        t = pa.concat_tables(
            sessionize(ds, gap_s=1800)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        t = t.sort_by([("user_id", "ascending"), ("session_start", "ascending")])
        return pa.table({
            "user_id": t["user_id"],
            "session_start": t["session_start"],
            "n_events": t["n_events"],
            "sum_value": _round4(t["sum_value"].to_numpy()),
        })

    q["events_sessionization"] = _events_sessions

    def _events_asof(sf):
        """AS-OF join (pipelines/events.asof_join — the temporal join Ray
        Data lacks): every purchase matched to the same user's LATEST
        signup at or before it; one co-location shuffle, per-key
        searchsorted probe."""
        import pyarrow.compute as pc
        import ray.data

        from lucene_ray.pipelines.events import asof_join

        cols = ["event_id", "ts", "user_id", "event_type", "value"]
        ev = os.path.join(sf, "events.parquet")
        left = ray.data.read_parquet(ev, columns=cols).filter(
            lambda r: r["event_type"] == "purchase")
        right = ray.data.read_parquet(ev, columns=cols).filter(
            lambda r: r["event_type"] == "signup")
        t = pa.concat_tables(
            asof_join(left, right)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        t = pa.table({
            "user_id": t["user_id"],
            "left_id": t["left_id"],
            "right_ts_us": pc.coalesce(t["right_ts_us"],
                                       pa.scalar(0, pa.int64())),
            "right_value": _round4(pc.coalesce(
                t["right_value"], pa.scalar(0.0)).to_numpy(
                zero_copy_only=False)),
        })
        return t.sort_by("left_id")

    q["asof_join_events"] = _events_asof

    def _events_range_join(sf):
        """RANGE join (pipelines/events.range_join): per purchase, count
        + value-sum of the same user's error events in the preceding 10
        minutes — two searchsorted bounds + a prefix-sum difference per
        key, never per-pair work."""
        import ray.data

        from lucene_ray.pipelines.events import range_join

        cols = ["event_id", "ts", "user_id", "event_type", "value"]
        ev = os.path.join(sf, "events.parquet")
        left = ray.data.read_parquet(ev, columns=cols).filter(
            lambda r: r["event_type"] == "purchase")
        right = ray.data.read_parquet(ev, columns=cols).filter(
            lambda r: r["event_type"] == "error")
        t = pa.concat_tables(
            range_join(left, right, lo_s=-600, hi_s=0)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        t = pa.table({
            "user_id": t["user_id"],
            "left_id": t["left_id"],
            "n_right": t["n_right"],
            "sum_right": _round4(t["sum_right"].to_numpy()),
        })
        return t.sort_by("left_id")

    q["range_join_events"] = _events_range_join

    def _events_json(sf):
        """Vectorized JSON field extraction from the events props column
        (RE2 kernel, no per-row json.loads) + aggregate by extracted key."""
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf, "events.parquet"), columns=["event_type", "props"]
        )

        def extract(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            k = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
            kv = pc.struct_field(k, "k").cast(pa.int64())
            return pa.table({"event_type": b["event_type"], "k": kv})

        from ray.data.aggregate import Count, Sum

        t = (
            ds.map_batches(extract, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
            .to_pandas()
        )
        t = t.sort_values("event_type").reset_index(drop=True)
        t["n"] = t["n"].astype("int64")
        t["sum_k"] = t["sum_k"].astype("int64")
        return pa.Table.from_pandas(t, preserve_index=False)

    q["events_json_extract"] = _events_json

    def _monitor(sf):
        """Percolator: 4 registered queries matched against the streamed
        corpus (per-batch MemoryIndex + standard query evaluation)."""
        import ray.data

        from lucene_ray.pipelines.monitor import monitor_matches

        ds = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
        )
        queries = ["table", "+key -value", '"key value"', "sp*"]
        t = pa.concat_tables(
            monitor_matches(ds, queries, concurrency=2)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])

    q["monitor_matches"] = _monitor

    # ---- rows-only entries (non-SQL-expressible; driver does a weaker check) ----
    def _bm25_f32(sf):
        s = _searcher(sf, mode="f32")
        td = s.search("spark window customer", k=10)
        return pa.table(
            {
                "rank": np.arange(1, td.doc_ids.shape[0] + 1, dtype=np.int64),
                "doc_id": td.doc_ids,
                "score": td.scores.astype(np.float64),
            }
        )

    q["bm25_topk_f32"] = _bm25_f32

    def _minhash(sf):
        from lucene_ray.pipelines.dedup import minhash_lsh_candidates

        t = pa.concat_tables(
            minhash_lsh_candidates(_pages_ds(sf))
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by([("a", "ascending"), ("b", "ascending")])

    q["minhash_lsh_candidates"] = _minhash

    def _simhash(sf):
        from lucene_ray.pipelines.dedup import simhash_fingerprints

        return pa.concat_tables(
            simhash_fingerprints(_pages_ds(sf))
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")

    q["simhash_fingerprints"] = _simhash

    def _langid(sf):
        from lucene_ray.pipelines.textstats import lang_id

        t = pa.concat_tables(
            lang_id(_pages_ds(sf), concurrency=2)
            .select_columns(["doc_id", "lang", "lang_pred"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("doc_id")

    q["lang_id"] = _langid

    def _fps(sf):
        from lucene_ray.pipelines.textstats import doc_fingerprints

        return pa.concat_tables(
            doc_fingerprints(_pages_ds(sf))
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")

    q["doc_fingerprints"] = _fps

    def _bpe(sf):
        from lucene_ray.pipelines.textstats import bpe_ish_token_count

        return pa.concat_tables(
            bpe_ish_token_count(_pages_ds(sf))
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        ).sort_by("doc_id")

    q["bpe_token_count"] = _bpe

    def _ivf(sf):
        import pyarrow.parquet as pq
        import ray.data

        from lucene_ray.pipelines.ann import knn_ivf_cosine

        emb_path = os.path.join(sf, "embeddings.parquet")
        Qm = np.stack(pq.read_table(emb_path).slice(0, 3)["embedding"].to_pylist())
        t = knn_ivf_cosine(ray.data.read_parquet(emb_path), Qm, k=10, n_centroids=8, nprobe=4)
        return pa.table(
            {
                "query_id": t["query_id"],
                "rank": t["rank"],
                "neighbor_id": t["neighbor_id"],
                "cosine": _round4(t["cosine"].to_numpy()),
            }
        )

    q["knn_ivf_cosine"] = _ivf

    def _ivf_full(sf):
        """IVF with nprobe = n_centroids probes every bucket, so the result
        must EQUAL brute-force cosine top-k — the oracle-checkable proof
        that the IVF machinery (centroid assign, bucket shuffle, probe,
        merge) is correct; recall at nprobe < n_centroids is pytest-checked."""
        import pyarrow.parquet as pq
        import ray.data

        from lucene_ray.pipelines.ann import knn_ivf_cosine

        emb_path = os.path.join(sf, "embeddings.parquet")
        head = pq.read_table(emb_path).slice(0, 3)
        Qm = np.stack(head["embedding"].to_pylist())
        n = pq.ParquetFile(emb_path).metadata.num_rows
        nc = 8
        t = knn_ivf_cosine(
            ray.data.read_parquet(emb_path), Qm, k=n, n_centroids=nc, nprobe=nc
        )
        qid = t["query_id"].to_numpy()
        nid = t["neighbor_id"].to_numpy()
        cos = _round4(t["cosine"].to_numpy())
        vec_ids = head["vec_id"].to_numpy()
        out = {"query_id": [], "rank": [], "neighbor_id": [], "cosine": []}
        for j in range(3):
            sel = qid == j
            order = np.lexsort((nid[sel], -cos[sel]))[:10]
            out["query_id"].append(np.full(10, vec_ids[j], dtype=np.int64))
            out["rank"].append(np.arange(1, 11, dtype=np.int64))
            out["neighbor_id"].append(nid[sel][order])
            out["cosine"].append(cos[sel][order])
        return pa.table({k: np.concatenate(v) for k, v in out.items()})

    q["knn_ivf_full_probe"] = _ivf_full

    def _emb_near_dup(sf):
        import ray.data

        from lucene_ray.pipelines.ann import embedding_near_dup

        t = embedding_near_dup(
            ray.data.read_parquet(os.path.join(sf, "embeddings.parquet")),
            threshold=0.42, method="exact",
        )
        return pa.table(
            {"a": t["a"], "b": t["b"], "cosine": _round4(t["cosine"].to_numpy())}
        )

    q["embedding_near_dup"] = _emb_near_dup

    def _hnsw(sf):
        """PERSISTED per-shard HNSW graphs (Lucene99HnswVectorsFormat
        write-once model): the index builds once into the /tmp cache and
        every call serves from the saved CSR graphs via VectorSearcher —
        no graph build on the query path (pytest-asserted). Deterministic
        levels, rows-only (approximate by nature — recall vs brute is
        pytest-asserted >= 0.9)."""
        import pyarrow.parquet as pq

        from lucene_ray.index.vector import VectorSearcher

        emb_path = os.path.join(sf, "embeddings.parquet")
        Qm = np.stack(pq.read_table(emb_path).slice(0, 3)["embedding"].to_pylist())
        vs = VectorSearcher(_hnsw_index_dir(sf), num_executors=2)
        t = vs.search(Qm, k=10, ef=64)
        return pa.table({
            "query_id": t["query_id"],
            "rank": t["rank"],
            "neighbor_id": t["neighbor_id"],
            "cosine": _round4(t["cosine"].to_numpy()),
        })

    q["knn_hnsw_cosine"] = _hnsw

    def _knn_pq(sf):
        """PQ + exact refine (Jégou et al. TPAMI 2011): ADC scan over
        16x-compressed codes proposes candidates, one pruned exact pass
        re-ranks. Approximate by nature -> rows-only entry; recall
        thresholds are pytest-guaranteed (tests/test_vector_index.py)."""
        from lucene_ray.index.vector import pq_search

        emb_path = os.path.join(sf, "embeddings.parquet")
        Qm, vec_ids = _query_head(emb_path, 3)
        t = pq_search(_pq_index_dir(sf), Qm, k=10, refine=40)
        qid = np.asarray([vec_ids[j] for j in t["query_id"].to_numpy()])
        return pa.table({
            "query_id": pa.array(qid, type=pa.int64()),
            "rank": t["rank"],
            "neighbor_id": t["neighbor_id"],
            "cosine": pa.array(_round4(t["cosine"].to_numpy()),
                               type=pa.float64()),
        })

    q["knn_pq_cosine"] = _knn_pq

    def _knn_ivfpq(sf):
        """IVFADC (Jégou et al. TPAMI 2011 §IV): probe 4/8 buckets
        (filesystem-pruned), ADC-scan residual codes, exact-refine.
        Approximate -> rows-only; recall pytest-guaranteed."""
        from lucene_ray.index.vector import ivfpq_search

        emb_path = os.path.join(sf, "embeddings.parquet")
        Qm, vec_ids = _query_head(emb_path, 3)
        t = ivfpq_search(_ivfpq_index_dir(sf), Qm, k=10, nprobe=4, refine=40)
        qid = np.asarray([vec_ids[j] for j in t["query_id"].to_numpy()])
        return pa.table({
            "query_id": pa.array(qid, type=pa.int64()),
            "rank": t["rank"],
            "neighbor_id": t["neighbor_id"],
            "cosine": pa.array(_round4(t["cosine"].to_numpy()),
                               type=pa.float64()),
        })

    q["knn_ivfpq_cosine"] = _knn_ivfpq

    def _knn_sq(sf):
        """Scalar-quantized int8 scan (Lucene99ScalarQuantizedVectors
        Format.java:41 role) + exact refine. Approximate -> rows-only;
        recall pytest-guaranteed."""
        from lucene_ray.index.vector import sq_search

        emb_path = os.path.join(sf, "embeddings.parquet")
        Qm, vec_ids = _query_head(emb_path, 3)
        t = sq_search(_sq_index_dir(sf), Qm, k=10, refine=20)
        qid = np.asarray([vec_ids[j] for j in t["query_id"].to_numpy()])
        return pa.table({
            "query_id": pa.array(qid, type=pa.int64()),
            "rank": t["rank"],
            "neighbor_id": t["neighbor_id"],
            "cosine": pa.array(_round4(t["cosine"].to_numpy()),
                               type=pa.float64()),
        })

    q["knn_sq_cosine"] = _knn_sq

    def _quant_full_refine(sf, searcher_fn):
        """Shared exactness anchor for the quantized families: with
        ``refine >= corpus size`` every row becomes a candidate and the
        exact re-rank IS brute force — oracle-checkable proof that the
        quantized scan + refine machinery loses nothing (the
        knn_ivf_full_probe pattern)."""
        import pyarrow.parquet as pq

        emb_path = os.path.join(sf, "embeddings.parquet")
        n = pq.ParquetFile(emb_path).metadata.num_rows
        Qm, vec_ids = _query_head(emb_path, 3)
        t = searcher_fn(sf, Qm, n)
        qid = t["query_id"].to_numpy()
        nid = t["neighbor_id"].to_numpy()
        cos = _round4(t["cosine"].to_numpy())
        out = {"query_id": [], "rank": [], "neighbor_id": [], "cosine": []}
        for j in range(3):
            sel = qid == j
            order = np.lexsort((nid[sel], -cos[sel]))[:10]
            out["query_id"].append(np.full(10, vec_ids[j], dtype=np.int64))
            out["rank"].append(np.arange(1, 11, dtype=np.int64))
            out["neighbor_id"].append(nid[sel][order])
            out["cosine"].append(cos[sel][order])
        return pa.table({k: np.concatenate(v) for k, v in out.items()})

    def _pq_full(sf, Qm, n):
        from lucene_ray.index.vector import pq_search

        return pq_search(_pq_index_dir(sf), Qm, k=10, refine=n)

    def _sq_full(sf, Qm, n):
        from lucene_ray.index.vector import sq_search

        return sq_search(_sq_index_dir(sf), Qm, k=10, refine=n)

    def _ivfpq_full(sf, Qm, n):
        from lucene_ray.index.vector import ivfpq_search

        return ivfpq_search(_ivfpq_index_dir(sf), Qm, k=10, nprobe=8,
                            refine=n)

    q["knn_pq_full_refine"] = lambda sf: _quant_full_refine(sf, _pq_full)
    q["knn_sq_full_refine"] = lambda sf: _quant_full_refine(sf, _sq_full)
    q["knn_ivfpq_full_refine"] = lambda sf: _quant_full_refine(
        sf, _ivfpq_full)

    def _ivf_indexed_full(sf):
        """Full-probe search over the PERSISTED bucket-partitioned IVF
        index: nprobe = n_centroids reads every bucket partition, so the
        result must EQUAL brute-force cosine top-k — the oracle-checkable
        proof that the partitioned layout loses nothing; the pruned-read
        IO fraction is pytest-checked."""
        import pyarrow.parquet as pq

        from lucene_ray.index.vector import ivf_search

        emb_path = os.path.join(sf, "embeddings.parquet")
        head = pq.read_table(emb_path).slice(0, 3)
        Qm = np.stack(head["embedding"].to_pylist())
        n = pq.ParquetFile(emb_path).metadata.num_rows
        t = ivf_search(_ivf_index_dir(sf), Qm, k=n, nprobe=8, verbose=False)
        qid = t["query_id"].to_numpy()
        nid = t["neighbor_id"].to_numpy()
        cos = _round4(t["cosine"].to_numpy())
        vec_ids = head["vec_id"].to_numpy()
        out = {"query_id": [], "rank": [], "neighbor_id": [], "cosine": []}
        for j in range(3):
            sel = qid == j
            order = np.lexsort((nid[sel], -cos[sel]))[:10]
            out["query_id"].append(np.full(10, vec_ids[j], dtype=np.int64))
            out["rank"].append(np.arange(1, 11, dtype=np.int64))
            out["neighbor_id"].append(nid[sel][order])
            out["cosine"].append(cos[sel][order])
        return pa.table({k: np.concatenate(v) for k, v in out.items()})

    q["knn_ivf_indexed_full_probe"] = _ivf_indexed_full

    def _ivf_indexed(sf):
        """Pruned probe over the persisted IVF index — reads ONLY the
        probed buckets' files (IO pruning; fraction pytest-checked and
        logged). Approximate, rows-only; equality with the transient IVF
        pipeline at identical centroids/probes is pytest-asserted."""
        import pyarrow.parquet as pq

        from lucene_ray.index.vector import ivf_search

        emb_path = os.path.join(sf, "embeddings.parquet")
        Qm = np.stack(pq.read_table(emb_path).slice(0, 3)["embedding"].to_pylist())
        t = ivf_search(_ivf_index_dir(sf), Qm, k=10, nprobe=4, verbose=False)
        return pa.table({
            "query_id": t["query_id"],
            "rank": t["rank"],
            "neighbor_id": t["neighbor_id"],
            "cosine": _round4(t["cosine"].to_numpy()),
        })

    q["knn_ivf_indexed"] = _ivf_indexed

    def _knn_filtered(sf):
        """Filtered kNN (KnnFloatVectorQuery with a filter,
        search/KnnFloatVectorQuery.java): exact cosine top-k over only
        the vectors whose id % 3 == 0 — the allowed set broadcasts once
        and masks every batch."""
        import pyarrow.parquet as pq
        import ray.data

        from lucene_ray.pipelines.ann import knn_brute_cosine

        emb_path = os.path.join(sf, "embeddings.parquet")
        t = pq.read_table(emb_path, columns=["vec_id"])
        all_ids = t["vec_id"].to_numpy()
        Qm = np.stack(
            pq.read_table(emb_path).slice(0, 3)["embedding"].to_pylist()
        )
        res = knn_brute_cosine(
            ray.data.read_parquet(emb_path), Qm, k=10,
            allowed_ids=all_ids[all_ids % 3 == 0],
        )
        return pa.table({
            "query_id": res["query_id"],
            "rank": res["rank"],
            "neighbor_id": res["neighbor_id"],
            "cosine": _round4(res["cosine"].to_numpy()),
        })

    q["knn_filtered_cosine"] = _knn_filtered

    def _merged(sf):
        import shutil

        from lucene_ray.index.merge import force_merge
        from lucene_ray.search.searcher import Searcher

        idx = _index_dir(sf)
        midx = idx + "-merged"
        if not os.path.exists(os.path.join(midx, "manifest.json")):
            force_merge(idx, midx, hot_term_df=50, salt_buckets=4)
        s = Searcher(midx, mode="f64")
        from lucene_ray.search import query as Q2

        docs, scores = s.search_all(Q2.TermQuery("table"))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order], "score": _round4(scores[order])})

    q["force_merge_term_query"] = _merged

    def _replicated(sf):
        """Replicator roles (replicator/nrt/PrimaryNode.java:52,
        ReplicaNode.java:63, CopyState.java): one ReplicaNode sync of
        the cached primary index into a replica directory (delta copy
        by file identity, manifest-last activation, stale-file delete
        — index/replicator.py), then the reference term query served
        FROM THE REPLICA; scores must equal the primary's, so the SQL
        twin is term_query's."""
        from lucene_ray.index.replicator import replicate
        from lucene_ray.search.searcher import Searcher

        idx = _index_dir(sf)
        replica = idx + "-replica"
        replicate(idx, replica)
        s = Searcher(replica, mode="f64")
        docs, scores = s.search_all(Q.TermQuery("table"))
        order = np.argsort(docs)
        return pa.table({"doc_id": docs[order],
                         "score": _round4(scores[order])})

    q["replicated_search_query"] = _replicated

    def _media(sf):
        import ray.data

        from lucene_ray.pipelines.multimodal import decode_features, synth_media_table

        media = ray.data.from_arrow(synth_media_table(200))
        t = pa.concat_tables(
            decode_features(media, concurrency=2)
            .select_columns(["media_id", "mime", "width", "height"])
            .iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        )
        return t.sort_by("media_id")

    q["media_decode_meta"] = _media

    return q


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

# shared CTE prelude: tokenization, doc lengths, smallfloat-quantized
# lengths (intToByte4 roundtrip — identity < 24, else 4 significant bits),
# field stats. Mirrors the engine bit-for-bit in float64.
_PRELUDE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf
)
"""


def _term_cte(name: str, term: str) -> str:
    """Per-doc BM25 score CTE for one term (f64, engine-identical tree)."""
    return f"""
, tf_{name} AS (
  SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = '{term}' GROUP BY doc_id
), df_{name} AS (SELECT count(*)::DOUBLE AS df FROM tf_{name})
, sc_{name} AS (
  SELECT t.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
  FROM tf_{name} t
  CROSS JOIN df_{name} d CROSS JOIN stats s
  JOIN dlq q ON t.doc_id = q.doc_id
)"""


_POS_CTE = """
, toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
, pos AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p FROM toklist)
"""

_STOPWORDS_SQL = (
    "'a','an','and','are','as','at','be','but','by','for','if','in','into','is',"
    "'it','no','not','of','on','or','such','that','the','their','then','there',"
    "'these','they','this','to','was','will','with'"
)


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["term_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t ORDER BY doc_id"
    )
    o["term_query_topk"] = (
        _PRELUDE + _term_cte("t", "window")
        + """ SELECT row_number() OVER (ORDER BY ROUND(score,4) DESC, doc_id) AS rank,
                     doc_id, ROUND(score, 4) AS score
              FROM sc_t ORDER BY ROUND(score,4) DESC, doc_id LIMIT 10"""
    )
    o["boolean_and"] = (
        _PRELUDE + _term_cte("a", "key") + _term_cte("b", "table")
        + """ SELECT a.doc_id, ROUND(a.score + b.score, 4) AS score
              FROM sc_a a JOIN sc_b b ON a.doc_id = b.doc_id ORDER BY a.doc_id"""
    )
    o["boolean_or_topk"] = (
        _PRELUDE + _term_cte("a", "spark") + _term_cte("b", "window") + _term_cte("c", "customer")
        + """ , uni AS (
                SELECT doc_id, sum(score) AS score FROM (
                  SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b UNION ALL SELECT * FROM sc_c
                ) GROUP BY doc_id)
              SELECT row_number() OVER (ORDER BY ROUND(score,4) DESC, doc_id) AS rank,
                     doc_id, ROUND(score,4) AS score
              FROM uni ORDER BY ROUND(score,4) DESC, doc_id LIMIT 20"""
    )
    o["boolean_must_not"] = (
        _PRELUDE + _term_cte("a", "table") + _term_cte("b", "key")
        + """ SELECT a.doc_id, ROUND(a.score, 4) AS score FROM sc_a a
              WHERE a.doc_id NOT IN (SELECT doc_id FROM sc_b) ORDER BY a.doc_id"""
    )
    o["boolean_msm"] = (
        _PRELUDE + _term_cte("a", "spark") + _term_cte("b", "window") + _term_cte("c", "customer")
        + """ , uni AS (
                SELECT doc_id, sum(score) AS score, count(*) AS m FROM (
                  SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b UNION ALL SELECT * FROM sc_c
                ) GROUP BY doc_id)
              SELECT doc_id, ROUND(score,4) AS score FROM uni WHERE m >= 2 ORDER BY doc_id"""
    )
    o["boolean_filter"] = (
        _PRELUDE + _term_cte("a", "table") + _term_cte("b", "window")
        + """ SELECT a.doc_id, ROUND(a.score, 4) AS score
              FROM sc_a a JOIN sc_b b ON a.doc_id = b.doc_id ORDER BY a.doc_id"""
    )
    o["lm_dirichlet_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df, sum(f)::DOUBLE AS ttf FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       GREATEST(
                         ln(1 + t.f / (2000.0 * ((x.ttf + 1) / (s.sttf + 1))))
                         + ln(2000.0 / (q.dlq + 2000.0)), 0) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    o["lm_jm_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df, sum(f)::DOUBLE AS ttf FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       ln(1 + ((1 - 0.1) * t.f / q.dlq)
                              / (0.1 * ((x.ttf + 1) / (s.sttf + 1)))) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    o["classic_tfidf_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       (ln((s.n + 1) / (x.df + 1)) + 1) * sqrt(t.f)
                         / sqrt(q.dlq) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    o["dfr_inl2_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       (t.f * log2(1 + (s.sttf / s.n) / q.dlq))
                         / (t.f * log2(1 + (s.sttf / s.n) / q.dlq) + 1)
                         * log2((s.n + 1) / (x.df + 0.5)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    o["ib_ll_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       ln(1 + (t.f * log2(1 + (s.sttf / s.n) / q.dlq))
                              / ((x.df + 1) / (s.n + 1))) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    o["ax_f2exp_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       pow((s.n + 1) / x.df, 0.35) * t.f
                         / (t.f + 0.5 + 0.5 * q.dlq / (s.sttf / s.n)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    o["sweetspot_topk"] = (
        _PRELUDE
        + """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                       WHERE term = 'table' GROUP BY doc_id)
              , ts AS (SELECT count(*)::DOUBLE AS df FROM tf)
              , sc AS (
                SELECT t.doc_id,
                       (ln((s.n + 1) / (x.df + 1)) + 1) * sqrt(t.f)
                         / sqrt(0.5 * (abs(q.dlq - 30) + abs(q.dlq - 70)
                                       - 40) + 1) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM sc
              ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    )
    _TF_TS = """ , tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
                          WHERE term = 'table' GROUP BY doc_id)
                 , ts AS (SELECT count(*)::DOUBLE AS df,
                                 sum(f)::DOUBLE AS ttf FROM tf)"""
    _TOPK_TAIL = """ SELECT doc_id, ROUND(score, 4) AS score FROM sc
                     ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10"""
    o["dfi_chisquared_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       CASE WHEN t.f <= (x.ttf + 1) * q.dlq / (s.sttf + 1)
                            THEN 0.0
                            ELSE log2((t.f - (x.ttf + 1) * q.dlq / (s.sttf + 1))
                                      * (t.f - (x.ttf + 1) * q.dlq / (s.sttf + 1))
                                      / ((x.ttf + 1) * q.dlq / (s.sttf + 1)) + 1)
                       END AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["dfi_standardized_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       CASE WHEN t.f <= (x.ttf + 1) * q.dlq / (s.sttf + 1)
                            THEN 0.0
                            ELSE log2((t.f - (x.ttf + 1) * q.dlq / (s.sttf + 1))
                                      / sqrt((x.ttf + 1) * q.dlq / (s.sttf + 1))
                                      + 1)
                       END AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["indri_dirichlet_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       ln((t.f + 2000 * ((x.ttf + 1) / (s.sttf + 1)))
                          / (q.dlq + 2000)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["ax_f1exp_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       (1 + ln(1 + ln(t.f + 1)))
                       * ((s.sttf / s.n + 0.25)
                          / (s.sttf / s.n + q.dlq * 0.25))
                       * pow((s.n + 1) / x.df, 0.35) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["ax_f2log_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       ln((s.n + 1) / x.df) * t.f
                       / (t.f + 0.25 + 0.25 * q.dlq / (s.sttf / s.n)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["ax_f3exp_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       GREATEST(0, (1 + ln(1 + ln(t.f + 1)))
                                   * pow((s.n + 1) / x.df, 0.35)
                                   - (q.dlq - 1) * 0.25 * 1.0
                                     / (s.sttf / s.n)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["ax_f1log_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       (1 + ln(1 + ln(t.f + 1)))
                       * ((s.sttf / s.n + 0.25)
                          / (s.sttf / s.n + q.dlq * 0.25))
                       * ln((s.n + 1) / x.df) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["ax_f3log_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       GREATEST(0, (1 + ln(1 + ln(t.f + 1)))
                                   * ln((s.n + 1) / x.df)
                                   - (q.dlq - 1) * 0.25 * 1.0
                                     / (s.sttf / s.n)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["dfi_saturated_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       CASE WHEN t.f <= (x.ttf + 1) * q.dlq / (s.sttf + 1)
                            THEN 0.0
                            ELSE log2((t.f - (x.ttf + 1) * q.dlq / (s.sttf + 1))
                                      / ((x.ttf + 1) * q.dlq / (s.sttf + 1))
                                      + 1)
                       END AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["dfr_ine_l2_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       log2((s.n + 1)
                            / (s.n * (1 - pow((s.n - 1) / s.n, x.ttf))
                               + 0.5))
                       * (1 - 1 / (1 + t.f * log2(1 + (s.sttf / s.n)
                                                  / q.dlq))) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["dfr_gb2_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       (log2((1 + (x.ttf + 1) / (s.n + (x.ttf + 1)))
                             / ((x.ttf + 1) / (s.n + (x.ttf + 1))))
                        - (log2((1 + (x.ttf + 1) / (s.n + (x.ttf + 1)))
                                / ((x.ttf + 1) / (s.n + (x.ttf + 1))))
                           - log2((x.ttf + 1) / (s.n + (x.ttf + 1)) + 1))
                          / (1 + t.f * log2(1 + (s.sttf / s.n) / q.dlq)))
                       * ((x.ttf + 2) / (x.df + 1)) AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["ib_spl_topk"] = (
        _PRELUDE + _TF_TS
        + """ , sc AS (
                SELECT t.doc_id,
                       -ln((pow(CAST((x.ttf + 1) / (s.n + 1) AS REAL),
                                1 - 1 / (t.f * log2(1 + (s.sttf / s.n) / q.dlq)
                                         + 1))
                            - CAST((x.ttf + 1) / (s.n + 1) AS REAL))
                           / (1 - CAST((x.ttf + 1) / (s.n + 1) AS REAL)))
                         AS score
                FROM tf t CROSS JOIN ts x CROSS JOIN stats s
                JOIN dlq q ON t.doc_id = q.doc_id)"""
        + _TOPK_TAIL
    )
    o["boolean_sim_scores"] = (
        _PRELUDE
        + """ SELECT DISTINCT doc_id, 2.5 AS score FROM tok
              WHERE term = 'table' ORDER BY doc_id"""
    )
    o["surround_query"] = (
        _PRELUDE + _POS_CTE + _term_cte("c", "customer")
        + """
, iv AS (SELECT DISTINCT a.doc_id
         FROM pos a JOIN pos b
           ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 3
         WHERE a.term = 'spark' AND b.term = 'window')
SELECT c.doc_id, ROUND(c.score + 1.0, 4) AS score
FROM sc_c c JOIN iv ON c.doc_id = iv.doc_id ORDER BY c.doc_id"""
    )

    o["length_filter_query"] = (
        f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
ftok AS (SELECT * FROM tok WHERE length(term) BETWEEN 4 AND 5),
doclen AS (SELECT doc_id, count(*) AS dl FROM ftok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
fstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM ftok
       WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN fstats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    o["complex_phrase_query"] = (
        _PRELUDE + _POS_CTE
        + f"""
, pf AS (SELECT a.doc_id, count(*)::DOUBLE AS f
         FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
         WHERE a.term = 'table' AND b.term LIKE 's%'
         GROUP BY a.doc_id)
, dft AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM tok
          WHERE term = 'table')
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM pf t CROSS JOIN dft d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    o["linedoc_source_stats"] = (
        """SELECT doc_id,
                  array_to_string(string_split(text, ' ')[1:2], ' ') AS title,
                  len(string_split(text, ' '))::BIGINT AS n_tokens
           FROM documents ORDER BY doc_id"""
    )
    o["trec_source_stats"] = (
        """SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
           FROM documents ORDER BY doc_id"""
    )

    # per-task counts of the fixed 2-round .alg script: AddDoc drains
    # the shared content cursor once per round (= count(*) each), every
    # other task count is a script constant
    o["bench_alg_report"] = (
        """SELECT task, n FROM (
             SELECT 'AddDoc' AS task, 2 * count(*)::BIGINT AS n FROM documents
             UNION ALL SELECT 'CloseIndex', 2
             UNION ALL SELECT 'CreateIndex', 2
             UNION ALL SELECT 'ForceMerge', 2
             UNION ALL SELECT 'NewRound', 2
             UNION ALL SELECT 'OpenReader', 2
             UNION ALL SELECT 'RepSumByName', 1
             UNION ALL SELECT 'ResetSystemErase', 2
             UNION ALL SELECT 'Search', 20
           ) ORDER BY task"""
    )

    # the INDEPENDENT ICU collation check: DuckDB's own COLLATE de
    # orders the same synthetic word column; rank pins the ORDER into
    # the value hash (the compare canonicalizes row order)
    _cv = ", ".join(f"({i}, '{w}')" for i, w in enumerate(_COLLATE_VOCAB))
    o["collation_sort_query"] = (
        f"""WITH w(i, word) AS (VALUES {_cv}),
d AS (SELECT doc_id, word FROM documents JOIN w ON doc_id % 17 = w.i)
SELECT row_number() OVER (ORDER BY word COLLATE de, doc_id) AS rank,
       doc_id, word
FROM d ORDER BY word COLLATE de, doc_id LIMIT 40"""
    )

    # the twin knows each row's language by construction — no
    # classifier logic reproduced, a genuinely independent check
    _sr = ", ".join(f"({i}, '{lg}')"
                    for i, (lg, _t) in enumerate(_SCRIPT_ROUTE_ROWS))
    o["lang_id_script"] = (
        f"""WITH m(i, lang_pred) AS (VALUES {_sr})
SELECT doc_id, lang_pred FROM documents JOIN m ON doc_id % 10 = m.i
ORDER BY doc_id"""
    )

    o["curation_pipeline"] = (
        _pages_prelude()
        + """
, win AS (SELECT * FROM (
    SELECT doc_id, text, lang,
           row_number() OVER (PARTITION BY url
                              ORDER BY warc_ts DESC, doc_id DESC) AS rn
    FROM pages) WHERE rn = 1)
, tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM win)
, tc AS (SELECT w.doc_id, w.lang, count(*) AS n
         FROM win w JOIN tok t ON w.doc_id = t.doc_id
         GROUP BY w.doc_id, w.lang)
SELECT lang, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS sum_tokens
FROM tc WHERE n >= 20 AND lang IN ('en', 'de')
GROUP BY lang ORDER BY lang"""
    )

    o["url_canonicalize"] = (
        """
WITH raw AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0
      THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/' || doc_id
           || '/?utm_source=feed&id=' || (doc_id % 7) || '&fbclid=abc#frag'
      ELSE 'http://' || source || '.example.com:80/p?id=' || (doc_id % 7)
           || '&utm_medium=x'
    END AS url
  FROM documents),
s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
p AS (SELECT doc_id,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
        regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1) AS path,
        CASE WHEN strpos(u, '?') > 0 THEN substr(u, strpos(u, '?') + 1)
             ELSE NULL END AS query
      FROM s1),
p2 AS (SELECT doc_id, scheme,
        CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
             ELSE host END AS host,
        path,
        CASE WHEN query IS NULL THEN ''
             ELSE array_to_string(list_filter(string_split(query, '&'),
                    x -> NOT regexp_matches(x,
                      '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=')), '&')
        END AS q
       FROM p)
SELECT doc_id,
       scheme || '://' || host || path ||
       CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canon_url
FROM p2 ORDER BY doc_id"""
    )

    o["shared_window_pairs"] = (
        """
WITH ts AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
g0 AS (SELECT DISTINCT doc_id, array_to_string(l[x+1:x+6], ' ') AS gram
       FROM ts, unnest(range(len(l) - 5)) AS t(x)),
ok AS (SELECT gram FROM g0 GROUP BY gram
       HAVING count(*) BETWEEN 2 AND 64),
g AS (SELECT g0.* FROM g0 JOIN ok USING (gram))
SELECT g1.doc_id AS a, g2.doc_id AS b, count(*)::BIGINT AS n_windows
FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
GROUP BY 1, 2 ORDER BY a, b"""
    )

    o["dedup_clusters"] = (
        """
WITH RECURSIVE
ts AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
g0 AS (SELECT DISTINCT doc_id, array_to_string(l[x+1:x+6], ' ') AS gram
       FROM ts, unnest(range(len(l) - 5)) AS t(x)),
ok AS (SELECT gram FROM g0 GROUP BY gram HAVING count(*) BETWEEN 2 AND 64),
g AS (SELECT g0.* FROM g0 JOIN ok USING (gram)),
e0 AS (SELECT DISTINCT g1.doc_id AS a, g2.doc_id AS b
       FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id),
edges AS (SELECT a AS src, b AS dst FROM e0
          UNION ALL SELECT b, a FROM e0),
cc(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
)
SELECT node AS doc_id, min(label)::BIGINT AS cluster
FROM cc GROUP BY node ORDER BY doc_id"""
    )

    # alt-tokenizer fields: dl is CONSTANT per field (3 / 1 / 3), so
    # dl=avgdl and the BM25 length term collapses to 1/(1+K1); f=1.
    _ALT_TOK_SCORE = (
        "ROUND(ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5)) / (1 + %s), 4)"
        % K1)
    o["path_hierarchy_query"] = f"""
WITH n AS (SELECT count(*)::DOUBLE AS n FROM documents),
m AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 2 AND doc_id % 3 = 1),
d AS (SELECT count(*)::DOUBLE AS df FROM m)
SELECT doc_id::BIGINT AS doc_id, {_ALT_TOK_SCORE} AS score
FROM m CROSS JOIN n CROSS JOIN d ORDER BY doc_id"""
    o["keyword_analyzer_query"] = f"""
WITH n AS (SELECT count(*)::DOUBLE AS n FROM documents),
m AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
d AS (SELECT count(*)::DOUBLE AS df FROM m)
SELECT doc_id::BIGINT AS doc_id, {_ALT_TOK_SCORE} AS score
FROM m CROSS JOIN n CROSS JOIN d ORDER BY doc_id"""
    o["pattern_tokenizer_query"] = f"""
WITH n AS (SELECT count(*)::DOUBLE AS n FROM documents),
m AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 2),
d AS (SELECT count(*)::DOUBLE AS df FROM m)
SELECT doc_id::BIGINT AS doc_id, {_ALT_TOK_SCORE} AS score
FROM m CROSS JOIN n CROSS JOIN d ORDER BY doc_id"""

    # uax29_urlemail_query: uetext tokens are exactly
    # ['visit', 'https://site<k7>.example.com/p<k3>', 'contact',
    #  'user<k5>@mail.example.org', 'ok'] with dl=5 for every doc, so
    # avgdl=5 and the BM25 length term collapses to 1/(1+K1); f=1.
    o["uax29_urlemail_query"] = (
        f"""
WITH n AS (SELECT count(*)::DOUBLE AS n FROM documents),
u AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3 AND doc_id % 3 = 1),
e AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 2),
du AS (SELECT count(*)::DOUBLE AS df FROM u),
de AS (SELECT count(*)::DOUBLE AS df FROM e)
SELECT * FROM (
  SELECT 'email' AS q, doc_id::BIGINT AS doc_id,
         ROUND(ln(1 + (n.n - de.df + 0.5) / (de.df + 0.5)) / (1 + {K1}), 4)
           AS score
  FROM e CROSS JOIN n CROSS JOIN de
  UNION ALL
  SELECT 'url', doc_id::BIGINT,
         ROUND(ln(1 + (n.n - du.df + 0.5) / (du.df + 0.5)) / (1 + {K1}), 4)
  FROM u CROSS JOIN n CROSS JOIN du)
ORDER BY q, doc_id"""
    )

    o["word_delimiter_query"] = (
        f"""
WITH ts AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
wtok AS (SELECT doc_id, unnest([l[1], l[2], l[3], '9', l[4]]) AS term FROM ts),
wdl AS (SELECT doc_id, count(*) AS dl FROM wtok GROUP BY doc_id),
wstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM wdl)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM wtok
       WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN wstats s JOIN wdl q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # quality_eval: per-topic P@10 / AP / nDCG / recall computed in SQL
    # against the same f64 BM25 ranking (rounded-score ordering) and the
    # same conjunctive-containment qrels
    _qblocks, _qselects = [], []
    for _qid, _terms in QUALITY_TOPICS:
        ctes = "".join(_term_cte(f"{_qid}_{j}", t)
                       for j, t in enumerate(_terms))
        uni = " UNION ALL ".join(
            f"SELECT * FROM sc_{_qid}_{j}" for j in range(len(_terms)))
        inlist = ", ".join(f"'{t}'" for t in _terms)
        _qblocks.append(ctes + f"""
, uni_{_qid} AS (SELECT doc_id, sum(score) AS score FROM ({uni}) GROUP BY doc_id)
, top_{_qid} AS (SELECT doc_id,
                 row_number() OVER (ORDER BY ROUND(score,4) DESC, doc_id) AS r
                 FROM uni_{_qid} QUALIFY r <= 10)
, rel_{_qid} AS (SELECT doc_id FROM tok WHERE term IN ({inlist})
                 GROUP BY doc_id HAVING count(DISTINCT term) = {len(_terms)})
, hits_{_qid} AS (SELECT r FROM top_{_qid} JOIN rel_{_qid} USING (doc_id))""")
        _qselects.append(f"""
SELECT '{_qid}' AS qid,
  (SELECT count(*) FROM rel_{_qid})::BIGINT AS num_rel,
  ROUND((SELECT count(*) FROM hits_{_qid})::DOUBLE / 10, 4) AS p_at_k,
  ROUND(coalesce((SELECT sum(cnt / r) FROM (
      SELECT r, (SELECT count(*)::DOUBLE FROM hits_{_qid} h2
                 WHERE h2.r <= h1.r) AS cnt FROM hits_{_qid} h1)), 0)
    / greatest((SELECT count(*) FROM rel_{_qid}), 1), 4) AS ap,
  ROUND(CASE WHEN (SELECT coalesce(sum(1.0/log2(x+2)), 0) FROM range(10) t(x)
                   WHERE x < least((SELECT count(*) FROM rel_{_qid}), 10)) > 0
             THEN (SELECT coalesce(sum(1.0/log2(r+1)), 0) FROM hits_{_qid})
                  / (SELECT sum(1.0/log2(x+2)) FROM range(10) t(x)
                     WHERE x < least((SELECT count(*) FROM rel_{_qid}), 10))
             ELSE 0 END, 4) AS ndcg,
  ROUND((SELECT count(*) FROM hits_{_qid})::DOUBLE
    / greatest((SELECT count(*) FROM rel_{_qid}), 1), 4) AS recall""")
    o["quality_eval"] = (
        _PRELUDE + "".join(_qblocks)
        + " UNION ALL ".join(_qselects) + " ORDER BY qid"
    )

    o["simple_query_parser"] = (
        _PRELUDE + _term_cte("t", "table") + _term_cte("c", "customer")
        + """ , pw AS (SELECT DISTINCT doc_id FROM tok WHERE term LIKE 'wind%')
              , andg AS (SELECT t.doc_id, t.score + 1.0 AS score
                         FROM sc_t t JOIN pw ON t.doc_id = pw.doc_id)
              , uni AS (SELECT doc_id, sum(score) AS score FROM (
                          SELECT * FROM andg UNION ALL SELECT * FROM sc_c
                        ) GROUP BY doc_id)
              SELECT doc_id, ROUND(score, 4) AS score FROM uni
              WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tok
                                   WHERE term = 'key')
              ORDER BY doc_id"""
    )
    o["covering_query"] = (
        _PRELUDE + _term_cte("a", "spark") + _term_cte("b", "window")
        + _term_cte("c", "customer")
        + """ , uni AS (
                SELECT doc_id, sum(score) AS score, count(*) AS m FROM (
                  SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b
                  UNION ALL SELECT * FROM sc_c
                ) GROUP BY doc_id)
              SELECT u.doc_id, ROUND(u.score, 4) AS score
              FROM uni u JOIN documents d ON u.doc_id = d.doc_id
              WHERE u.m >= GREATEST(1, 1 + d.n_chars % 3)
              ORDER BY u.doc_id"""
    )
    o["doc_values_update_stats"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 2000.0
                            WHEN doc_id % 7 = 0 THEN 1000.0
                            ELSE n_chars END AS val
                      FROM documents)
              SELECT count(*)::BIGINT AS count,
                     min(v.val)::DOUBLE AS vmin,
                     max(v.val)::DOUBLE AS vmax,
                     sum(v.val)::DOUBLE AS vsum
              FROM m JOIN v ON m.doc_id = v.doc_id"""
    )
    o["tfidf_top_terms"] = (
        """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
sc AS (SELECT t.doc_id, t.term,
              ROUND(t.tf * ln(n.n / d.df), 4) AS score
       FROM tf t JOIN df d USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM sc)
SELECT doc_id, rank, term, score FROM r WHERE rank <= 3
ORDER BY doc_id, rank"""
    )
    o["query_profiler"] = (
        _PRELUDE
        + """ , d AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term)
              SELECT * FROM (
                SELECT '0' AS node, 'BooleanQuery' AS kind,
                       'ROOT' AS clause,
                       'must=2 should=0 filter=0 must_not=1' AS description,
                       (SELECT count(*) FROM (
                          SELECT doc_id FROM d WHERE term = 'table'
                          INTERSECT
                          SELECT doc_id FROM d WHERE term = 'window'
                          EXCEPT
                          SELECT doc_id FROM d WHERE term = 'key'))::BIGINT
                         AS docs
                UNION ALL
                SELECT '0.0', 'TermQuery', 'MUST', 'table',
                       (SELECT count(*) FROM d WHERE term = 'table')::BIGINT
                UNION ALL
                SELECT '0.1', 'TermQuery', 'MUST', 'window',
                       (SELECT count(*) FROM d WHERE term = 'window')::BIGINT
                UNION ALL
                SELECT '0.2', 'TermQuery', 'MUST_NOT', 'key',
                       (SELECT count(*) FROM d WHERE term = 'key')::BIGINT
              ) ORDER BY node"""
    )
    o["pack_sequences"] = """
WITH doclen AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
o AS (
  SELECT doc_id, dl,
         CAST(COALESCE(sum(dl) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM doclen
),
seg AS (
  SELECT doc_id, dl, off,
         unnest(generate_series(off // 256, (off + dl - 1) // 256)) AS pack_id
  FROM o
)
SELECT pack_id, doc_id,
       GREATEST(off, pack_id * 256) - off AS begin_tok,
       LEAST(off + dl, (pack_id + 1) * 256) - off AS end_tok
FROM seg ORDER BY pack_id, doc_id"""
    o["chunk_documents"] = (
        """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
           FROM documents WHERE text <> ''),
n AS (SELECT doc_id, l, len(l) AS n FROM t WHERE len(l) > 0),
c AS (SELECT doc_id, l, n,
             unnest(range(CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) + 1))
               AS ci
      FROM n)
SELECT doc_id, ci AS chunk_idx,
       (least(ci * 24 + 32, n) - ci * 24)::BIGINT AS n_tokens,
       array_to_string(l[ci * 24 + 1 : least(ci * 24 + 32, n)], ' ') AS text
FROM c ORDER BY doc_id, ci"""
    )
    o["lm_perplexity"] = (
        """
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
pos AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p
        FROM toklist),
uni AS (SELECT term, count(*)::DOUBLE AS c FROM pos GROUP BY term),
unip AS (SELECT * FROM uni WHERE c >= 2),
tot AS (SELECT count(*)::DOUBLE AS t FROM pos),
big AS (SELECT a.term AS w1, b.term AS w2, count(*)::DOUBLE AS c
        FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        GROUP BY 1, 2),
bigp AS (SELECT bg.* FROM big bg
         JOIN unip u1 ON bg.w1 = u1.term
         JOIN unip u2 ON bg.w2 = u2.term
         WHERE bg.c >= 2),
trans AS (SELECT a.doc_id, a.term AS w1, b.term AS w2
          FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
lps AS (SELECT t.doc_id,
          CASE WHEN bg.c IS NOT NULL AND u1.c IS NOT NULL
               THEN ln(bg.c / u1.c)
               ELSE ln(0.4 * coalesce(u2.c, 1.0) / tot.t) END AS lp
        FROM trans t
        LEFT JOIN bigp bg ON t.w1 = bg.w1 AND t.w2 = bg.w2
        LEFT JOIN unip u1 ON t.w1 = u1.term
        LEFT JOIN unip u2 ON t.w2 = u2.term
        CROSS JOIN tot)
SELECT doc_id, ROUND(avg(lp), 4) AS avg_logprob,
       ROUND(exp(-avg(lp)), 4) AS perplexity
FROM lps GROUP BY doc_id ORDER BY doc_id"""
    )
    o["perplexity_buckets"] = (
        o["lm_perplexity"].rsplit("SELECT doc_id, ROUND(avg(lp), 4)", 1)[0]
        + """
, scored AS (SELECT doc_id, ROUND(exp(-avg(lp)), 4) AS ppl
             FROM lps GROUP BY doc_id)
, ranked AS (SELECT ppl,
    ntile(3) OVER (ORDER BY ppl, doc_id) AS nt FROM scored)
SELECT CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket,
       count(*)::BIGINT AS count,
       ROUND(avg(ppl), 4) AS avg_perplexity
FROM ranked GROUP BY nt ORDER BY nt"""
    )
    o["custom_collector_query"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              SELECT CAST(floor(d.n_chars / 100.0) AS BIGINT) AS bucket,
                     count(*)::BIGINT AS count
              FROM m JOIN documents d ON m.doc_id = d.doc_id
              GROUP BY 1 ORDER BY 1"""
    )
    o["xml_parser_query"] = (
        _PRELUDE
        + """ SELECT DISTINCT doc_id FROM tok
              WHERE doc_id IN (SELECT doc_id FROM tok WHERE term = 'table')
                AND doc_id IN (SELECT doc_id FROM tok
                               WHERE (term >= 'scan' AND term <= 'sort')
                                  OR term = 'window')
                AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'key')
              ORDER BY doc_id"""
    )
    o["per_field_codec_query"] = (
        f"""
WITH ttok AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:4]) AS term FROM documents
),
tdl AS (SELECT doc_id, count(*) AS dl FROM ttok GROUP BY doc_id),
tstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM tdl)::DOUBLE AS sttf
)
, tf AS (SELECT DISTINCT doc_id, 1.0 AS f FROM ttok WHERE term = 'table')
, df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN tstats s JOIN tdl q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )
    o["flexible_parser_query"] = (
        _PRELUDE
        + """ SELECT DISTINCT doc_id FROM tok
              WHERE term = 'window'
                 OR (doc_id IN (SELECT doc_id FROM tok WHERE term = 'table')
                     AND doc_id IN (SELECT doc_id FROM tok WHERE term = 'key'))
              ORDER BY doc_id"""
    )
    o["sort_by_string_dv"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 'updated-b'
                            WHEN doc_id % 7 = 0 THEN 'updated-a'
                            ELSE source END AS value
                      FROM documents)
              SELECT row_number() OVER (ORDER BY v.value, v.doc_id) AS rank,
                     v.value, v.doc_id
              FROM m JOIN v ON m.doc_id = v.doc_id
              ORDER BY v.value, v.doc_id LIMIT 10"""
    )
    o["sort_by_expression"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       (n_chars - 2 * (1 + n_chars % 3))::DOUBLE AS value
                      FROM documents)
              SELECT row_number() OVER (ORDER BY v.value DESC, v.doc_id)
                       AS rank,
                     v.value, v.doc_id
              FROM m JOIN v ON m.doc_id = v.doc_id
              ORDER BY v.value DESC, v.doc_id LIMIT 10"""
    )
    o["doc_values_binary_update"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 'updated-b'
                            WHEN doc_id % 7 = 0 THEN 'updated-a'
                            ELSE source END AS value
                      FROM documents)
              SELECT v.value, count(*)::BIGINT AS count
              FROM m JOIN v ON m.doc_id = v.doc_id
              GROUP BY v.value ORDER BY v.value"""
    )
    o["string_dv_stats"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 'updated-b'
                            WHEN doc_id % 7 = 0 THEN 'updated-a'
                            ELSE source END AS value
                      FROM documents)
              SELECT count(*)::BIGINT AS count,
                     min(v.value) AS vmin, max(v.value) AS vmax,
                     count(DISTINCT v.value)::BIGINT AS distinct
              FROM m JOIN v ON m.doc_id = v.doc_id"""
    )
    o["dv_range_query"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 2000.0
                            WHEN doc_id % 7 = 0 THEN 1000.0
                            ELSE n_chars END AS val
                      FROM documents)
              SELECT m.doc_id FROM m JOIN v ON m.doc_id = v.doc_id
              WHERE v.val >= 150 AND v.val <= 1500 ORDER BY m.doc_id"""
    )
    o["dv_multi_range_query"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 2000.0
                            WHEN doc_id % 7 = 0 THEN 1000.0
                            ELSE n_chars END AS val
                      FROM documents)
              SELECT m.doc_id FROM m JOIN v ON m.doc_id = v.doc_id
              WHERE (v.val BETWEEN 150 AND 400)
                 OR (v.val BETWEEN 380 AND 700)
                 OR (v.val BETWEEN 1900 AND 2100)
              ORDER BY m.doc_id"""
    )
    o["dv_set_query"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , v AS (SELECT doc_id,
                       CASE WHEN doc_id % 14 = 0 THEN 'updated-b'
                            WHEN doc_id % 7 = 0 THEN 'updated-a'
                            ELSE source END AS value
                      FROM documents)
              SELECT m.doc_id FROM m JOIN v ON m.doc_id = v.doc_id
              WHERE v.value IN ('updated-a', 'src3') ORDER BY m.doc_id"""
    )
    o["index_or_dv_query"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              SELECT m.doc_id FROM m JOIN documents d ON m.doc_id = d.doc_id
              WHERE d.source IN ('src3', 'src5') ORDER BY m.doc_id"""
    )
    o["matches_api"] = (
        """
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
pos AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p FROM toklist),
ph AS (SELECT a.doc_id, a.p FROM pos a
       JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
       WHERE a.term = 'key' AND b.term = 'value'),
sel AS (SELECT DISTINCT doc_id FROM ph ORDER BY doc_id LIMIT 3)
SELECT ph.doc_id,
       ph.p::BIGINT AS start_pos,
       (ph.p + 1)::BIGINT AS end_pos,
       (CASE WHEN ph.p = 0 THEN 0
             ELSE length(array_to_string(t.ts[1:ph.p], ' ')) + 1 END)::BIGINT
         AS start_off,
       (length(array_to_string(t.ts[1:ph.p + 1], ' ')) + 1
        + length(t.ts[ph.p + 2]))::BIGINT AS end_off
FROM ph JOIN sel USING (doc_id) JOIN toklist t ON ph.doc_id = t.doc_id
ORDER BY ph.doc_id, start_pos"""
    )
    o["function_range_query"] = (
        """
WITH v AS (SELECT doc_id,
                  sqrt(n_chars) + (1 + n_chars % 3) AS fval
           FROM documents)
SELECT doc_id, ROUND(fval, 4) AS fval FROM v
WHERE fval >= 14 AND fval <= 22 ORDER BY doc_id"""
    )
    o["multi_field_parser_query"] = (
        _PRELUDE + _term_cte("a", "table") + _term_cte("b", "window")
        + f"""
, ttok AS (SELECT doc_id, unnest(string_split(text, ' ')[1:4]) AS term FROM documents)
, tdl AS (SELECT doc_id, count(*) AS dl FROM ttok GROUP BY doc_id)
, tstats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                    (SELECT sum(dl) FROM tdl)::DOUBLE AS sttf)
, ttf_a AS (SELECT doc_id, count(*)::DOUBLE AS f FROM ttok WHERE term = 'table' GROUP BY doc_id)
, tdf_a AS (SELECT count(*)::DOUBLE AS df FROM ttf_a)
, tsc_a AS (SELECT t.doc_id,
              ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
                (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))) AS score
            FROM ttf_a t CROSS JOIN tdf_a d CROSS JOIN tstats s
            JOIN tdl q ON t.doc_id = q.doc_id)
, ttf_b AS (SELECT doc_id, count(*)::DOUBLE AS f FROM ttok WHERE term = 'window' GROUP BY doc_id)
, tdf_b AS (SELECT count(*)::DOUBLE AS df FROM ttf_b)
, tsc_b AS (SELECT t.doc_id,
              ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
                (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))) AS score
            FROM ttf_b t CROSS JOIN tdf_b d CROSS JOIN tstats s
            JOIN tdl q ON t.doc_id = q.doc_id)
, uni AS (SELECT doc_id, sum(score) AS score FROM (
    SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b
    UNION ALL SELECT * FROM tsc_a UNION ALL SELECT * FROM tsc_b)
  GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM uni ORDER BY doc_id"""
    )
    def _quality_block(name: str, term: str) -> str:
        """QualityStats metrics for one query term in SQL: rank by the
        engine's deterministic (round4 desc, doc_id) order, judge by
        tf >= 2 (tf_<name> comes from the matching _term_cte)."""
        return f"""
, ranked_{name} AS (SELECT doc_id,
    row_number() OVER (ORDER BY ROUND(score, 4) DESC, doc_id) AS r
  FROM sc_{name})
, rel_{name} AS (SELECT doc_id FROM tf_{name} WHERE f >= 2)
, top_{name} AS (SELECT r.r,
    CASE WHEN x.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
  FROM ranked_{name} r LEFT JOIN rel_{name} x ON r.doc_id = x.doc_id
  WHERE r.r <= 10)
, prec_{name} AS (SELECT r, is_rel,
    sum(is_rel) OVER (ORDER BY r) * 1.0 / r AS p_r FROM top_{name})
, agg_{name} AS (SELECT '{term}' AS query,
    ROUND(sum(is_rel) / 10.0, 6) AS p_at_k,
    COALESCE(ROUND(sum(is_rel) * 1.0
      / nullif((SELECT count(*) FROM rel_{name}), 0), 6), 0.0) AS recall_at_k,
    COALESCE(ROUND(COALESCE(sum(CASE WHEN is_rel = 1 THEN p_r END), 0)
      / nullif((SELECT count(*) FROM rel_{name}), 0), 6), 0.0)
      AS avg_precision,
    COALESCE(ROUND(1.0 / min(CASE WHEN is_rel = 1 THEN r END), 6), 0.0)
      AS reciprocal_rank
  FROM prec_{name})"""

    o["top_passages"] = (
        _PRELUDE + _term_cte("a", "scan") + _term_cte("b", "column")
        + _POS_CTE
        + """
, sel AS (SELECT tf_a.doc_id FROM tf_a JOIN tf_b USING (doc_id)
          ORDER BY tf_a.doc_id LIMIT 3)
, hits AS (SELECT p.doc_id, (p.p // 10) * 10 AS ws,
    CASE WHEN p.term = 'scan'
         THEN (SELECT ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               FROM df_a d, stats s)
         ELSE (SELECT ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               FROM df_b d, stats s) END AS w
  FROM pos p JOIN sel USING (doc_id)
  WHERE p.term IN ('scan', 'column'))
, wins AS (SELECT doc_id, ws, sum(w) AS score FROM hits GROUP BY 1, 2)
, ranked AS (SELECT doc_id, ws, score,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, ws) AS r
  FROM wins)
SELECT doc_id, ws::BIGINT AS win_start, ROUND(score, 4) AS score
FROM ranked WHERE r <= 3 ORDER BY doc_id, score DESC, win_start"""
    )
    o["quality_benchmark"] = (
        _PRELUDE + _term_cte("a", "spark") + _term_cte("b", "table")
        + _term_cte("c", "window")
        + _quality_block("a", "spark") + _quality_block("b", "table")
        + _quality_block("c", "window")
        + """
SELECT * FROM agg_a UNION ALL SELECT * FROM agg_b
UNION ALL SELECT * FROM agg_c ORDER BY query"""
    )
    o["index_split_query"] = (
        _PRELUDE
        + """ , t AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , w AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window')
              , nn AS (SELECT (SELECT count(*) FROM t)::BIGINT AS n_first,
                              ((SELECT count(*) FROM documents)
                               - (SELECT count(*) FROM t))::BIGINT AS n_second)
              SELECT t.doc_id, nn.n_first, nn.n_second
              FROM t JOIN w ON t.doc_id = w.doc_id CROSS JOIN nn
              ORDER BY t.doc_id"""
    )
    o["doc_values_stats"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              SELECT count(*)::BIGINT AS count,
                     min(d.n_chars)::DOUBLE AS vmin,
                     max(d.n_chars)::DOUBLE AS vmax,
                     sum(d.n_chars)::DOUBLE AS vsum,
                     ROUND(avg(d.n_chars), 6) AS mean,
                     ROUND(var_pop(d.n_chars), 6) AS variance
              FROM m JOIN documents d ON m.doc_id = d.doc_id"""
    )
    o["dis_max_query"] = (
        _PRELUDE + _term_cte("a", "spark") + _term_cte("b", "window")
        + """ , uni AS (
                SELECT doc_id, max(score) AS m, sum(score) AS s FROM (
                  SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b
                ) GROUP BY doc_id)
              SELECT doc_id, ROUND(m + 0.3 * (s - m), 4) AS score
              FROM uni ORDER BY doc_id"""
    )
    # BlendedTermQuery: every term scored with df = max of the two dfs,
    # then DisjunctionMax(tie=0.01) over the per-doc term scores
    o["blended_term_query"] = (
        _PRELUDE
        + f"""
, tf_a AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
           WHERE term = 'spark' GROUP BY doc_id)
, tf_b AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
           WHERE term = 'customer' GROUP BY doc_id)
, dfb AS (SELECT greatest((SELECT count(*) FROM tf_a),
                          (SELECT count(*) FROM tf_b))::DOUBLE AS df)
, sc_a AS (SELECT t.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
  FROM tf_a t CROSS JOIN dfb d CROSS JOIN stats s
  JOIN dlq q ON t.doc_id = q.doc_id)
, sc_b AS (SELECT t.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
  FROM tf_b t CROSS JOIN dfb d CROSS JOIN stats s
  JOIN dlq q ON t.doc_id = q.doc_id)
, uni AS (
    SELECT doc_id, max(score) AS m, sum(score) AS s FROM (
      SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b
    ) GROUP BY doc_id)
SELECT doc_id, ROUND(m + 0.01 * (s - m), 4) AS score
FROM uni ORDER BY doc_id"""
    )
    o["phrase_wildcard_freqs"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT a.doc_id, count(*)::BIGINT AS freq
FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
WHERE a.term = 'table' AND b.term LIKE 's%'
GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    # diversified top-k: <=1 hit per source, ranked by the raw f64 score
    # (engine-identical tree), displayed rounded
    o["diversified_topk"] = (
        _PRELUDE + _term_cte("t", "table")
        + """
, keyed AS (
    SELECT s.doc_id, s.score, d.source,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY s.score DESC, s.doc_id) AS rn
    FROM sc_t s JOIN documents d ON s.doc_id = d.doc_id)
, capped AS (
    SELECT doc_id, score, source FROM keyed WHERE rn = 1
    ORDER BY score DESC, doc_id LIMIT 10)
SELECT doc_id, ROUND(score, 4) AS score, source FROM capped"""
    )
    o["multi_range_query"] = """
SELECT doc_id FROM documents
WHERE (n_chars >= 150 AND n_chars < 250)
   OR (n_chars >= 600 AND n_chars < 700)
ORDER BY doc_id"""
    o["dynamic_range_facets"] = """
WITH t AS (SELECT n_chars::DOUBLE AS v,
                  ntile(5) OVER (ORDER BY n_chars) AS b FROM documents)
SELECT b::BIGINT AS bucket, count(*)::BIGINT AS count,
       min(v) AS vmin, max(v) AS vmax, ROUND(sum(v), 4) AS vsum
FROM t GROUP BY b ORDER BY b"""
    o["function_score_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + """ SELECT s.doc_id, ROUND(s.score * ln(1 + d.n_chars), 4) AS score
              FROM sc_t s JOIN documents d ON s.doc_id = d.doc_id
              ORDER BY s.doc_id"""
    )
    o["feature_saturation_topk"] = (
        """SELECT row_number() OVER (
                 ORDER BY ROUND(2.0 * n_chars / (n_chars + 1000.0), 4) DESC, doc_id
               ) AS rank,
               doc_id, ROUND(2.0 * n_chars / (n_chars + 1000.0), 4) AS score
           FROM documents WHERE n_chars > 0
           ORDER BY ROUND(2.0 * n_chars / (n_chars + 1000.0), 4) DESC, doc_id
           LIMIT 50"""
    )
    o["feature_sigmoid_all"] = (
        """SELECT doc_id,
               ROUND(pow(n_chars, 2.0) / (pow(n_chars, 2.0) + pow(800.0, 2.0)), 4)
                 AS score
           FROM documents WHERE n_chars > 0 ORDER BY doc_id"""
    )
    o["feature_log_filtered"] = (
        _PRELUDE + _term_cte("t", "table")
        + """ SELECT s.doc_id, ROUND(0.5 * ln(1.0 + d.n_chars), 4) AS score
              FROM sc_t s JOIN documents d ON s.doc_id = d.doc_id
              ORDER BY s.doc_id"""
    )
    o["payload_sum_scores"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ SELECT doc_id, ROUND(sum((p % 5) + 1)::DOUBLE, 4) AS score
              FROM pos WHERE term = 'table'
              GROUP BY doc_id ORDER BY doc_id"""
    )
    o["payload_span_max"] = (
        _PRELUDE + _term_cte("t", "table") + _POS_CTE
        + """
, mp AS (SELECT doc_id, max((p % 5) + 1)::DOUBLE AS m
         FROM pos WHERE term = 'table' GROUP BY doc_id)
SELECT s.doc_id, ROUND(s.score * m.m, 4) AS score
FROM sc_t s JOIN mp m ON s.doc_id = m.doc_id
ORDER BY s.doc_id"""
    )
    o["rescore_phrase_topk"] = (
        _PRELUDE + _term_cte("t", "table") + _POS_CTE
        + f"""
, pf AS (
    SELECT a.doc_id, count(*)::DOUBLE AS f
    FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
    WHERE a.term = 'key' AND b.term = 'value'
    GROUP BY a.doc_id)
, pidf AS (
    SELECT (SELECT ln(1 + (s.n - count(DISTINCT doc_id) + 0.5) /
                         (count(DISTINCT doc_id) + 0.5))
            FROM tok WHERE term = 'key') +
           (SELECT ln(1 + (s.n - count(DISTINCT doc_id) + 0.5) /
                         (count(DISTINCT doc_id) + 0.5))
            FROM tok WHERE term = 'value') AS idf
    FROM stats s)
, psc AS (
    SELECT t.doc_id,
           i.idf * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
    FROM pf t CROSS JOIN pidf i CROSS JOIN stats s
    JOIN dlq q ON t.doc_id = q.doc_id)
SELECT row_number() OVER (
         ORDER BY ROUND(s.score + coalesce(2.0 * p.score, 0.0), 4) DESC,
                  s.doc_id) AS rank,
       s.doc_id,
       ROUND(s.score + coalesce(2.0 * p.score, 0.0), 4) AS score
FROM sc_t s LEFT JOIN psc p ON s.doc_id = p.doc_id
ORDER BY ROUND(s.score + coalesce(2.0 * p.score, 0.0), 4) DESC, s.doc_id
LIMIT 20"""
    )
    o["distance_feature_topk"] = (
        """SELECT row_number() OVER (
                 ORDER BY ROUND(3.0 * 500.0 / (500.0 + abs(n_chars - 2000.0)), 4)
                   DESC, doc_id
               ) AS rank,
               doc_id,
               ROUND(3.0 * 500.0 / (500.0 + abs(n_chars - 2000.0)), 4) AS score
           FROM documents
           ORDER BY ROUND(3.0 * 500.0 / (500.0 + abs(n_chars - 2000.0)), 4)
             DESC, doc_id
           LIMIT 50"""
    )
    o["distance_feature_boosted"] = (
        _PRELUDE + _term_cte("t", "table")
        + """ SELECT s.doc_id,
                ROUND(s.score + 500.0 / (500.0 + abs(d.n_chars - 2000.0)), 4)
                  AS score
              FROM sc_t s JOIN documents d ON s.doc_id = d.doc_id
              ORDER BY s.doc_id"""
    )
    o["block_join_parents"] = (
        f"""
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
chunks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS ci,
         ts[CAST(4 * i + 1 AS INT) : CAST(4 * i + 4 AS INT)] AS ctoks
  FROM toklist, unnest(range(CAST(ceil(len(ts) / 4.0) AS BIGINT))) AS t(i)),
ctok AS (SELECT doc_id, ci, unnest(ctoks) AS term FROM chunks),
cdl AS (SELECT doc_id, ci, count(*) AS dl FROM ctok GROUP BY 1, 2),
cstats AS (
  SELECT (SELECT count(*) FROM chunks)::DOUBLE AS n,
         (SELECT sum(dl) FROM cdl)::DOUBLE AS sttf),
tf AS (SELECT doc_id, ci, count(*)::DOUBLE AS f FROM ctok
       WHERE term = 'value' GROUP BY 1, 2),
df AS (SELECT count(*)::DOUBLE AS df FROM tf),
sc AS (
  SELECT t.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))) AS score
  FROM tf t CROSS JOIN df d CROSS JOIN cstats s
  JOIN cdl q ON t.doc_id = q.doc_id AND t.ci = q.ci)
SELECT doc_id AS parent_id, ROUND(max(score), 4) AS score
FROM sc GROUP BY doc_id ORDER BY parent_id"""
    )
    # ScoreMode.Avg variant: mean of the per-child scores (both sides
    # round each child's score to 4 before averaging)
    o["block_join_parents_avg"] = (
        o["block_join_parents"].replace(
            "SELECT doc_id AS parent_id, ROUND(max(score), 4) AS score",
            "SELECT doc_id AS parent_id, ROUND(avg(ROUND(score, 4)), 4) AS score",
        )
    )
    o["block_join_children"] = (
        _PRELUDE + _term_cte("p", "table")
        + """
, toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
, chunks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS ci
  FROM toklist, unnest(range(CAST(ceil(len(ts) / 4.0) AS BIGINT))) AS t(i))
SELECT c.doc_id * 100 + c.ci AS child_id, ROUND(p.score, 4) AS score
FROM chunks c JOIN sc_p p ON c.doc_id = p.doc_id
ORDER BY child_id"""
    )
    o["boost_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score * 2.5, 4) AS score FROM sc_t ORDER BY doc_id"
    )
    o["search_after_page2"] = (
        _PRELUDE + _term_cte("t", "window")
        + """ SELECT * FROM (
                SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
                       doc_id, ROUND(score, 4) AS score
                FROM sc_t ORDER BY score DESC, doc_id
              ) WHERE rank BETWEEN 11 AND 20"""
    )
    o["phrase_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ SELECT a.doc_id, count(*)::BIGINT AS phrase_freq
              FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
              WHERE a.term = 'key' AND b.term = 'value'
              GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    # automaton 'key value' | 'key ? value': ends at b.p+1; DISTINCT folds
    # the two path lengths converging on one end (e.g. 'key key value')
    o["payload_check_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ SELECT a.doc_id, count(*)::BIGINT AS span_freq
              FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
              WHERE a.term = 'key' AND b.term = 'value'
                AND (a.p % 5) + 1 = 2 AND (b.p % 5) + 1 = 3
              GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    o["term_automaton_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ SELECT a.doc_id, count(DISTINCT b.p)::BIGINT AS ta_freq
              FROM pos a JOIN pos b ON a.doc_id = b.doc_id
                   AND (b.p = a.p + 1 OR b.p = a.p + 2)
              WHERE a.term = 'key' AND b.term = 'value'
              GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    o["multi_phrase_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ SELECT a.doc_id, count(*)::BIGINT AS phrase_freq
              FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
              WHERE a.term IN ('key', 'agg') AND b.term = 'value'
              GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    # unordered span-near (k=2, slop=2 -> window len+slop-1 = 3 either
    # direction), scored like a phrase (summed idf, freq = anchors with a
    # partner in window); dlq via the shared smallfloat CTE
    o["span_near_unordered"] = (
        _PRELUDE + _POS_CTE
        + f"""
, anchors AS (
    SELECT a.doc_id, count(*)::DOUBLE AS f
    FROM pos a
    WHERE a.term = 'key' AND EXISTS (
      SELECT 1 FROM pos b
      WHERE b.doc_id = a.doc_id AND b.term = 'value'
        AND abs(b.p - a.p) <= 3)
    GROUP BY a.doc_id)
, idfs AS (
    SELECT (SELECT ln(1 + (s.n - count(DISTINCT doc_id) + 0.5) /
                         (count(DISTINCT doc_id) + 0.5))
            FROM tok WHERE term = 'key') +
           (SELECT ln(1 + (s.n - count(DISTINCT doc_id) + 0.5) /
                         (count(DISTINCT doc_id) + 0.5))
            FROM tok WHERE term = 'value') AS idf
    FROM stats s)
SELECT t.doc_id,
       ROUND(i.idf * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM anchors t CROSS JOIN idfs i CROSS JOIN stats s
JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    o["intervals_prefix_near"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id FROM pos a JOIN pos b ON a.doc_id = b.doc_id
WHERE a.term = 'key' AND b.term LIKE 'val%'
  AND b.p > a.p AND b.p - a.p - 1 <= 2
ORDER BY a.doc_id"""
    )
    o["intervals_at_least"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, tp AS (SELECT doc_id, term, p FROM pos
         WHERE term IN ('scan', 'column', 'window'))
SELECT DISTINCT a.doc_id FROM tp a JOIN tp b
  ON a.doc_id = b.doc_id AND a.term < b.term
WHERE abs(a.p - b.p) <= 7
ORDER BY a.doc_id"""
    )
    o["intervals_range_leaf"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id FROM pos a JOIN pos b ON a.doc_id = b.doc_id
WHERE a.term = 'key' AND b.term >= 'val' AND b.term <= 'valz'
  AND b.p > a.p AND b.p - a.p - 1 <= 2
ORDER BY a.doc_id"""
    )
    o["intervals_unordered3_width"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id
FROM pos a JOIN pos b ON a.doc_id = b.doc_id
JOIN pos c ON a.doc_id = c.doc_id
WHERE a.term = 'scan' AND b.term = 'column' AND c.term = 'table'
  AND greatest(a.p, b.p, c.p) - least(a.p, b.p, c.p) + 1 <= 8
ORDER BY a.doc_id"""
    )
    o["span_first_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT doc_id FROM pos
WHERE term = 'table' AND p < 10 ORDER BY doc_id"""
    )
    o["span_position_range_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT doc_id FROM pos
WHERE term = 'table' AND p >= 5 AND p < 20 ORDER BY doc_id"""
    )
    # intervals: ordered with maxgaps — exists p(scan) < p(column) with
    # at most 3 tokens between (gaps = p2 - p1 - 1)
    o["intervals_ordered_maxgaps"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id FROM pos a JOIN pos b ON a.doc_id = b.doc_id
WHERE a.term = 'scan' AND b.term = 'column'
  AND b.p > a.p AND b.p - a.p - 1 <= 3
ORDER BY a.doc_id"""
    )

    # intervals: containing/containedBy over candidate unordered windows —
    # for each 'scan' anchor, its nearest 'column' in either direction
    # forms a window; windows with <= 6 gap tokens that contain a
    # 'window' occurrence match (mirrors the engine's pred/succ
    # candidate-window rule exactly)
    _IV_CONTAIN_SQL = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, t1p AS (SELECT doc_id, p FROM pos WHERE term = 'scan')
, t2p AS (SELECT doc_id, p FROM pos WHERE term = 'column')
, cand AS (SELECT a.doc_id, a.p AS ap,
    (SELECT max(b.p) FROM t2p b WHERE b.doc_id = a.doc_id AND b.p < a.p) AS bprev,
    (SELECT min(b.p) FROM t2p b WHERE b.doc_id = a.doc_id AND b.p > a.p) AS bnext
  FROM t1p a)
, wins AS (
  SELECT doc_id, least(ap, bp) AS lo, greatest(ap, bp) AS hi FROM (
    SELECT doc_id, ap, bprev AS bp FROM cand WHERE bprev IS NOT NULL
    UNION ALL
    SELECT doc_id, ap, bnext AS bp FROM cand WHERE bnext IS NOT NULL))
SELECT DISTINCT w.doc_id FROM wins w
WHERE w.hi - w.lo - 1 <= 6
  AND EXISTS (SELECT 1 FROM pos c
              WHERE c.doc_id = w.doc_id AND c.term = 'window'
                AND c.p BETWEEN w.lo AND w.hi)
ORDER BY doc_id"""
    )
    o["intervals_containing"] = _IV_CONTAIN_SQL
    o["intervals_contained_by"] = _IV_CONTAIN_SQL
    # notContaining: same candidate windows, NOT EXISTS the small term
    o["intervals_not_containing"] = _IV_CONTAIN_SQL.replace(
        "AND EXISTS", "AND NOT EXISTS"
    )
    o["intervals_wildcard"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id FROM pos a JOIN pos b
  ON b.doc_id = a.doc_id AND b.p > a.p AND b.p - a.p - 1 <= 3
WHERE a.term LIKE 'sc_n' AND b.term = 'column'
ORDER BY a.doc_id"""
    )
    # fuzzyTerm + overlapping: width-1 reference -> overlap ==
    # containment, so the candidate-window SQL applies with a
    # levenshtein leaf (DuckDB's levenshtein has no transpositions,
    # matching the house fuzzy contract)
    o["intervals_fuzzy_overlap"] = _IV_CONTAIN_SQL.replace(
        "AND c.term = 'window'", "AND levenshtein(c.term, 'windoq') <= 1"
    )
    o["intervals_before_after"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id FROM pos a
WHERE a.term = 'scan'
  AND EXISTS (SELECT 1 FROM pos b WHERE b.doc_id = a.doc_id
              AND b.term = 'column' AND b.p > a.p)
  AND EXISTS (SELECT 1 FROM pos t
              JOIN pos k ON k.doc_id = t.doc_id
              JOIN pos v ON v.doc_id = k.doc_id AND v.p = k.p + 1
              WHERE t.doc_id = a.doc_id AND t.term = 'table'
                AND k.term = 'key' AND v.term = 'value'
                AND t.p > k.p + 1)
ORDER BY a.doc_id"""
    )
    # nonOverlapping: same candidate windows; a 'key value' phrase
    # interval [kp, kp+1] overlaps [lo, hi] iff kp <= hi AND kp+1 >= lo
    o["intervals_non_overlapping"] = _IV_CONTAIN_SQL.replace(
        """AND EXISTS (SELECT 1 FROM pos c
              WHERE c.doc_id = w.doc_id AND c.term = 'window'
                AND c.p BETWEEN w.lo AND w.hi)""",
        """AND NOT EXISTS (SELECT 1 FROM pos k JOIN pos v
                ON v.doc_id = k.doc_id AND v.p = k.p + 1
              WHERE k.doc_id = w.doc_id AND k.term = 'key'
                AND v.term = 'value'
                AND k.p <= w.hi AND k.p + 1 >= w.lo)""",
    )
    # interval saturation scoring: per scan anchor, the earliest following
    # column forms the candidate window; freq = sum of 1/max(width-1, 1),
    # score = freq/(freq+1)
    o["intervals_scored_saturation"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, t1p AS (SELECT doc_id, p FROM pos WHERE term = 'scan')
, t2p AS (SELECT doc_id, p FROM pos WHERE term = 'column')
, anchors AS (SELECT a.doc_id, a.p AS ap,
    (SELECT min(b.p) FROM t2p b WHERE b.doc_id = a.doc_id AND b.p > a.p) AS bp
  FROM t1p a)
, freqs AS (SELECT doc_id, sum(1.0 / greatest(bp - ap, 1)) AS f
            FROM anchors WHERE bp IS NOT NULL GROUP BY doc_id)
SELECT doc_id, ROUND(f / (f + 1.0), 4) AS score
FROM freqs ORDER BY doc_id"""
    )

    # maxwidth(4) over ordered(scan, column) == the earliest following
    # column within 3 positions of a scan (greedy-minimal candidates)
    o["intervals_maxwidth"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT DISTINCT a.doc_id FROM pos a JOIN pos b ON a.doc_id = b.doc_id
WHERE a.term = 'scan' AND b.term = 'column'
  AND b.p > a.p AND b.p - a.p <= 3
ORDER BY a.doc_id"""
    )

    # offline validator: its recomputed doc_count/sum_ttf must equal the
    # raw corpus's
    o["check_index_stats"] = (
        """SELECT count(*)::BIGINT AS doc_count,
                  sum(len(string_split(text, ' ')))::BIGINT AS sum_ttf
           FROM documents"""
    )

    # query-time join: distinct first tokens of lang='de' docs -> docs
    # containing any of them (two-table shape: from-side selection feeds
    # the to-side IN filter)
    o["join_query_terms"] = (
        _PRELUDE
        + """
, vals AS (SELECT DISTINCT string_split(text, ' ')[1] AS v
           FROM documents WHERE lang = 'de' AND n_chars < 150)
SELECT DISTINCT doc_id FROM tok WHERE term IN (SELECT v FROM vals)
ORDER BY doc_id"""
    )

    # DateTools hour-resolution strings faceted
    o["date_tools_facets"] = (
        """SELECT strftime(ts, '%Y%m%d%H') AS date, count(*)::BIGINT AS n
           FROM events GROUP BY date ORDER BY date"""
    )

    # scored join (ScoreMode.Max): per-value max from-side score; to-side
    # doc score = max over its matched values (tf-independent)
    o["join_query_scored"] = (
        _PRELUDE
        + """
, vals AS (SELECT string_split(text, ' ')[1] AS v,
                  max(n_chars / 100.0) AS w
           FROM documents WHERE lang = 'de' AND n_chars < 150 GROUP BY v)
SELECT t.doc_id, ROUND(max(vals.w), 4) AS score
FROM (SELECT DISTINCT doc_id, term FROM tok) t
JOIN vals ON t.term = vals.v
GROUP BY t.doc_id ORDER BY t.doc_id"""
    )

    # df-split scoring: docs must match a low-df term (df <= 100); high-df
    # terms add score where they co-occur — same classification the engine
    # derives from global term stats
    o["common_terms_query"] = (
        _PRELUDE + _term_cte("a", "dup") + _term_cte("b", "batch") + _term_cte("c", "scan")
        + """ , low AS (
                SELECT doc_id, score FROM sc_a WHERE (SELECT df FROM df_a) <= 100
                UNION ALL SELECT doc_id, score FROM sc_b WHERE (SELECT df FROM df_b) <= 100
                UNION ALL SELECT doc_id, score FROM sc_c WHERE (SELECT df FROM df_c) <= 100)
            , high AS (
                SELECT doc_id, score FROM sc_a WHERE (SELECT df FROM df_a) > 100
                UNION ALL SELECT doc_id, score FROM sc_b WHERE (SELECT df FROM df_b) > 100
                UNION ALL SELECT doc_id, score FROM sc_c WHERE (SELECT df FROM df_c) > 100)
              SELECT doc_id, ROUND(sum(score), 4) AS score FROM (
                SELECT * FROM low UNION ALL
                SELECT * FROM high
                WHERE doc_id IN (SELECT doc_id FROM low)
                   OR (SELECT count(*) FROM low) = 0
              ) GROUP BY doc_id ORDER BY doc_id"""
    )
    # best window of 10 tokens by query-term count, ties -> earliest start;
    # character offsets computed arithmetically over the single-spaced
    # token list, snippet = exact substr of the original text
    o["highlight_passages"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ , lens AS (
                SELECT doc_id, len(string_split(text, ' ')) AS n,
                       string_split(text, ' ') AS ts, text
                FROM documents WHERE doc_id < 50)
            , m AS (SELECT doc_id, p FROM pos
                    WHERE term IN ('key', 'value') AND doc_id < 50)
            , starts AS (
                SELECT doc_id, unnest(range(0, greatest(n - 10, 0) + 1)) AS s
                FROM lens)
            , scored AS (
                SELECT st.doc_id, st.s,
                       (SELECT count(*) FROM m
                        WHERE m.doc_id = st.doc_id AND m.p >= st.s AND m.p < st.s + 10) AS c
                FROM starts st)
            , best AS (
                SELECT doc_id, s FROM (
                  SELECT doc_id, s, c,
                         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, s) AS rn
                  FROM scored) WHERE rn = 1 AND c > 0)
            , off AS (
                SELECT b.doc_id, b.s,
                       CASE WHEN b.s = 0 THEN 0
                            ELSE length(array_to_string(l.ts[1 : b.s], ' ')) + 1
                       END AS so,
                       length(array_to_string(l.ts[1 : least(b.s + 10, l.n)], ' ')) AS eo,
                       l.text AS text
                FROM best b JOIN lens l ON b.doc_id = l.doc_id)
            SELECT doc_id, s AS start, so AS start_offset, eo AS end_offset,
                   substr(text, so + 1, eo - so) AS snippet
            FROM off ORDER BY doc_id"""
    )
    o["highlight_index_passages"] = o["highlight_passages"]
    o["suggest_prefix"] = (
        _PRELUDE
        + """ , dfs AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
                WHERE term LIKE 's%' GROUP BY term)
              SELECT row_number() OVER (ORDER BY df DESC, term) AS rank, term, df
              FROM dfs ORDER BY df DESC, term LIMIT 8"""
    )
    o["suggest_fuzzy"] = (
        _PRELUDE
        + """ , dfs AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
                WHERE substr(term, 1, 1) = 'w' GROUP BY term)
              , js AS (SELECT unnest(range(0, 7)) AS j)
              , ped AS (
                SELECT term, df,
                       min(levenshtein('winow', substr(term, 1, j::INT))) AS d
                FROM dfs CROSS JOIN js
                WHERE j <= least(len(term), 6)
                GROUP BY term, df)
              SELECT row_number() OVER (ORDER BY df DESC, term) AS rank,
                     term, df
              FROM ped WHERE d <= 1 ORDER BY df DESC, term LIMIT 8"""
    )
    o["free_text_suggest"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, tot AS (SELECT count(*)::DOUBLE AS n FROM pos)
, ctx AS (SELECT count(*)::DOUBLE AS n FROM pos WHERE term = 'key')
, big AS (
    SELECT b.term, count(*)::DOUBLE AS c
    FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
    WHERE a.term = 'key' AND b.term LIKE 'v%' GROUP BY b.term)
, uni AS (SELECT term, count(*)::DOUBLE AS c FROM pos
          WHERE term LIKE 'v%' GROUP BY term)
, sc AS (
    SELECT u.term,
           CASE WHEN bg.c IS NOT NULL THEN bg.c / (SELECT n FROM ctx)
                ELSE 0.4 * u.c / (SELECT n FROM tot) END AS s
    FROM uni u LEFT JOIN big bg ON u.term = bg.term)
SELECT row_number() OVER (ORDER BY ROUND(s, 6) DESC, term) AS rank,
       term, ROUND(s, 6) AS score
FROM sc ORDER BY ROUND(s, 6) DESC, term LIMIT 8"""
    )
    o["free_text_backoff"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, tot AS (SELECT count(*)::DOUBLE AS n FROM pos)
, h1 AS (SELECT count(*)::DOUBLE AS n FROM pos WHERE term = 'merge')
, h2 AS (SELECT count(*)::DOUBLE AS n FROM pos a
         JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
         WHERE a.term = 'sort' AND b.term = 'merge')
, tri AS (
    SELECT c.term, count(*)::DOUBLE AS c
    FROM pos a
    JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
    JOIN pos c ON a.doc_id = c.doc_id AND c.p = a.p + 2
    WHERE a.term = 'sort' AND b.term = 'merge' AND c.term LIKE 's%'
    GROUP BY c.term)
, big AS (
    SELECT b.term, count(*)::DOUBLE AS c
    FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
    WHERE a.term = 'merge' AND b.term LIKE 's%' GROUP BY b.term)
, uni AS (SELECT term, count(*)::DOUBLE AS c FROM pos
          WHERE term LIKE 's%' GROUP BY term)
, sc AS (
    SELECT u.term,
           CASE WHEN t3.c IS NOT NULL AND (SELECT n FROM h2) > 0
                     THEN t3.c / (SELECT n FROM h2)
                WHEN b2.c IS NOT NULL AND (SELECT n FROM h1) > 0
                     THEN 0.4 * b2.c / (SELECT n FROM h1)
                ELSE 0.4 * 0.4 * u.c / (SELECT n FROM tot) END AS s
    FROM uni u
    LEFT JOIN tri t3 ON u.term = t3.term
    LEFT JOIN big b2 ON u.term = b2.term)
SELECT row_number() OVER (ORDER BY ROUND(s, 6) DESC, term) AS rank,
       term, ROUND(s, 6) AS score
FROM sc ORDER BY ROUND(s, 6) DESC, term LIMIT 8"""
    )
    o["term_vector_doc"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
SELECT term, p AS pos FROM pos WHERE doc_id = 42 ORDER BY term, pos"""
    )
    o["suggest_infix"] = (
        _PRELUDE
        + """ , dfs AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
                WHERE term LIKE '%a%' GROUP BY term)
              SELECT row_number() OVER (ORDER BY df DESC, term) AS rank, term, df
              FROM dfs ORDER BY df DESC, term LIMIT 8"""
    )
    o["spell_correct"] = (
        _PRELUDE
        + """ , dfs AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term)
            , cand AS (
                SELECT term, df, levenshtein(term, 'kye')::BIGINT AS distance
                FROM dfs WHERE levenshtein(term, 'kye') <= 2)
            SELECT row_number() OVER (ORDER BY distance, df DESC, term) AS rank,
                   term, distance, df
            FROM cand ORDER BY distance, df DESC, term LIMIT 5"""
    )
    o["drill_down_facet"] = (
        _PRELUDE
        + """ SELECT lang, count(*)::BIGINT AS n FROM documents
              WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              GROUP BY lang ORDER BY lang"""
    )
    # 2-term sloppy phrase: greedy next-occurrence == exists-within-window
    o["sloppy_phrase_query"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """ SELECT a.doc_id, count(*)::BIGINT AS phrase_freq
              FROM pos a
              WHERE a.term = 'key' AND EXISTS (
                SELECT 1 FROM pos b
                WHERE b.doc_id = a.doc_id AND b.term = 'value'
                  AND b.p > a.p AND b.p <= a.p + 3)
              GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    o["more_like_this"] = (
        _PRELUDE
        + f"""
, src AS (SELECT term, count(*)::DOUBLE AS f FROM tok WHERE doc_id = 42 GROUP BY term)
, dfs AS (SELECT t.term, count(DISTINCT t.doc_id)::DOUBLE AS df
          FROM tok t JOIN src s ON t.term = s.term GROUP BY t.term)
, sel AS (SELECT s.term FROM src s JOIN dfs d ON s.term = d.term CROSS JOIN stats
          ORDER BY s.f * ln(stats.n / d.df) DESC, s.term LIMIT 10)
, tfq AS (SELECT t.term, t.doc_id, count(*)::DOUBLE AS f FROM tok t
          WHERE t.term IN (SELECT term FROM sel) GROUP BY 1, 2)
, per AS (SELECT tf.doc_id,
            ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * tf.f /
              (tf.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
          FROM tfq tf JOIN dfs d ON tf.term = d.term
          CROSS JOIN stats s JOIN dlq q ON tf.doc_id = q.doc_id)
SELECT doc_id, ROUND(sum(score), 4) AS score FROM per GROUP BY doc_id ORDER BY doc_id"""
    )
    o["knn_classify_votes"] = o["more_like_this"].replace(
        "SELECT doc_id, ROUND(sum(score), 4) AS score FROM per GROUP BY doc_id ORDER BY doc_id",
        """, agg AS (SELECT doc_id, ROUND(sum(score), 4) AS score FROM per GROUP BY doc_id)
, topk AS (SELECT doc_id FROM agg ORDER BY score DESC, doc_id LIMIT 10)
SELECT d.lang AS label, count(*)::BIGINT AS votes
FROM topk t JOIN documents d ON t.doc_id = d.doc_id
GROUP BY d.lang ORDER BY votes DESC, label""",
    )
    o["prefix_query"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE term LIKE 's%' ORDER BY doc_id"
    )
    o["wildcard_query"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE regexp_matches(term, '^s.ow$') ORDER BY doc_id"
    )
    o["regexp_query"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE regexp_matches(term, '^(?:s.*k)$') ORDER BY doc_id"
    )
    o["reverse_wildcard_query"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE term LIKE '%ble' ORDER BY doc_id"
    )
    o["fuzzy_query"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE levenshtein(term, 'tble') <= 1 ORDER BY doc_id"
    )
    o["term_range_query"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE term BETWEEN 'scan' AND 'sort' ORDER BY doc_id"
    )
    o["term_in_set"] = (
        _PRELUDE
        + " SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark','window') ORDER BY doc_id"
    )
    # synonym: df = max over variants, ttf = sum; freq summed then scored once
    o["synonym_query"] = (
        _PRELUDE
        + """
, vf AS (
  SELECT doc_id, count(*)::DOUBLE AS f FROM tok
  WHERE term IN ('spark','stream') GROUP BY doc_id
), vdf AS (
  SELECT greatest(
    (SELECT count(DISTINCT doc_id) FROM tok WHERE term='spark'),
    (SELECT count(DISTINCT doc_id) FROM tok WHERE term='stream'))::DOUBLE AS df
)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + 1.2 * (1 - 0.75 + 0.75 * q.dlq / (s.sttf / s.n))), 4) AS score
FROM vf t CROSS JOIN vdf d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    o["term_stats"] = (
        _PRELUDE
        + """ SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
              FROM tok GROUP BY term ORDER BY term"""
    )
    o["field_stats"] = (
        _PRELUDE
        + """ SELECT CAST(n AS BIGINT) AS doc_count, CAST(sttf AS BIGINT) AS sum_ttf,
                     ROUND(sttf / n, 4) AS avgdl FROM stats"""
    )
    o["high_freq_terms"] = (
        _PRELUDE
        + """ SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term
              ORDER BY df DESC, term LIMIT 10"""
    )
    o["doc_norms"] = (
        _PRELUDE
        + """ SELECT doc_id, dl::BIGINT AS doc_len, dlq::BIGINT AS quantized_len
              FROM dlq ORDER BY doc_id"""
    )
    o["match_all_count"] = "SELECT count(*)::BIGINT AS n FROM documents"

    o["token_stats"] = (
        _pages_prelude()
        + """
, tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM pages)
SELECT doc_id, count(*)::BIGINT AS token_count,
       count(DISTINCT term)::BIGINT AS distinct_terms
FROM tok GROUP BY doc_id ORDER BY doc_id"""
    )
    o["quality_scores"] = (
        _pages_prelude()
        + f"""
, tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM pages)
, agg AS (
  SELECT doc_id, count(*) AS token_count,
         sum(CASE WHEN term IN ({_STOPWORDS_SQL}) THEN 1 ELSE 0 END) AS stopword_count
  FROM tok GROUP BY doc_id)
SELECT p.doc_id, length(p.text)::BIGINT AS n_chars, a.token_count::BIGINT AS token_count,
       a.stopword_count::BIGINT AS stopword_count,
       ROUND(a.stopword_count::DOUBLE / a.token_count, 4) AS stopword_ratio
FROM pages p JOIN agg a ON p.doc_id = a.doc_id ORDER BY p.doc_id"""
    )
    o["shingle_counts"] = (
        _pages_prelude()
        + """
, toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM pages)
, pos AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p FROM toklist)
SELECT a.doc_id, count(DISTINCT a.term || ' ' || b.term)::BIGINT AS n_shingles
FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
GROUP BY a.doc_id ORDER BY a.doc_id"""
    )
    # web-text curation: both regex engines are RE2, so sequential
    # regexp_replace chains redact identically to the engine's
    # pc.replace_substring_regex chain
    o["pii_redact"] = """
WITH inj AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact ' || source || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.'
                      || ((doc_id * 7) % 256)::VARCHAR ELSE '' END AS t
  FROM documents),
s1 AS (SELECT doc_id, t,
        len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
        regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM inj),
s2 AS (SELECT doc_id, n_email,
        len(regexp_extract_all(t1, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b'))::BIGINT AS n_phone,
        regexp_replace(t1, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g') AS t2
  FROM s1),
s3 AS (SELECT doc_id, n_email, n_phone,
        len(regexp_extract_all(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ipv4,
        regexp_replace(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS redacted
  FROM s2)
SELECT doc_id, n_email, n_phone, n_ipv4, redacted FROM s3 ORDER BY doc_id"""
    o["gopher_repetition"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, uni AS (SELECT doc_id, term, count(*) AS c FROM pos GROUP BY doc_id, term)
, tcnt AS (SELECT doc_id, sum(c)::BIGINT AS tc, max(c)::BIGINT AS mx
           FROM uni GROUP BY doc_id)
, big AS (SELECT a.doc_id, a.term || ' ' || b.term AS bg
          FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1)
, bgc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg)
, bstat AS (SELECT doc_id, sum(c)::BIGINT AS bc,
                   sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS dup
            FROM bgc GROUP BY doc_id)
SELECT t.doc_id, t.tc AS token_count,
       ROUND(t.mx::DOUBLE / t.tc, 4) AS top_unigram_frac,
       ROUND(coalesce(b.dup::DOUBLE / b.bc, 0.0), 4) AS dup_bigram_frac,
       (t.mx::DOUBLE / t.tc <= 0.20
        AND coalesce(b.dup::DOUBLE / b.bc, 0.0) <= 0.90) AS keep
FROM tcnt t LEFT JOIN bstat b ON t.doc_id = b.doc_id ORDER BY t.doc_id"""
    )
    o["domain_quota_sample"] = """
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 3 ORDER BY source, doc_id"""
    # multinomial NB with add-one smoothing (the engine trains and
    # classifies on the same corpus, so every token is in-vocabulary and
    # only per-label-absent counts hit the smoothed 1/(tot+V) floor)
    o["nb_classify_lang"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
cnt AS (SELECT d.lang, t.term, count(*)::DOUBLE AS c
        FROM tok t JOIN documents d ON t.doc_id = d.doc_id
        GROUP BY d.lang, t.term),
tot AS (SELECT lang, sum(c) AS tot FROM cnt GROUP BY lang),
voc AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM tok),
langs AS (SELECT lang, count(*)::DOUBLE AS nd FROM documents GROUP BY lang),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
dt AS (SELECT doc_id, term, count(*)::DOUBLE AS k FROM tok
       GROUP BY doc_id, term),
scored AS (
  SELECT dt.doc_id, l.lang,
         sum(dt.k * ln(coalesce((c.c + 1) / (t.tot + voc.v),
                                1.0 / (t.tot + voc.v)))) AS s
  FROM dt CROSS JOIN langs l
  JOIN tot t ON t.lang = l.lang CROSS JOIN voc
  LEFT JOIN cnt c ON c.lang = l.lang AND c.term = dt.term
  GROUP BY dt.doc_id, l.lang),
final AS (
  SELECT s.doc_id, s.lang, s.s + ln(l.nd / nd.n) AS sc
  FROM scored s JOIN langs l ON s.lang = l.lang CROSS JOIN nd)
SELECT doc_id, lang AS pred FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sc DESC, lang) AS rn
  FROM final) WHERE rn = 1 ORDER BY doc_id"""
    o["html_extract"] = (
        _pages_prelude()
        + """
SELECT doc_id, url, 'doc ' || CAST(CASE WHEN doc_id >= 1000000 THEN doc_id - 1000000
                                        ELSE doc_id END AS VARCHAR) AS extracted_title,
       text AS extracted_text
FROM pages ORDER BY doc_id"""
    )
    o["dedup_exact"] = (
        _pages_prelude()
        + """
SELECT doc_id, url FROM (
  SELECT doc_id, url,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, doc_id DESC) AS rn
  FROM pages) WHERE rn = 1 ORDER BY doc_id"""
    )
    o["dedup_exact_content"] = (
        _pages_prelude()
        + """
SELECT doc_id FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY text ORDER BY warc_ts DESC, doc_id DESC) AS rn
  FROM pages) WHERE rn = 1 ORDER BY doc_id"""
    )
    o["fingerprint_dedup"] = (
        _pages_prelude()
        + """
, fp AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
           AS fingerprint
  FROM pages)
SELECT fingerprint, count(*)::BIGINT AS n_docs, min(doc_id) AS keeper
FROM fp GROUP BY fingerprint HAVING count(*) >= 2 ORDER BY fingerprint"""
    )
    o["jaccard_pairs"] = (
        _pages_prelude()
        + """
, toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM pages)
, pos AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p FROM toklist)
, sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term AS shingle
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1)
, sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
, inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id)
SELECT i.a, i.b, ROUND(i.c::DOUBLE / (sa.sz + sb.sz - i.c), 4) AS jaccard
FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
WHERE i.c::DOUBLE / (sa.sz + sb.sz - i.c) >= 0.8
ORDER BY i.a, i.b"""
    )

    o["taxonomy_counts"] = (
        """SELECT path, count(*)::BIGINT AS n FROM (
             SELECT source AS path FROM documents
             UNION ALL
             SELECT source || '/' || lang AS path FROM documents)
           GROUP BY path ORDER BY path"""
    )
    o["taxonomy_sum_assoc"] = (
        """SELECT path, sum(n_chars)::DOUBLE AS sum_value FROM (
             SELECT source AS path, n_chars FROM documents
             UNION ALL
             SELECT source || '/' || lang AS path, n_chars FROM documents)
           GROUP BY path ORDER BY path"""
    )
    o["range_field_query"] = (
        """
WITH r AS (SELECT doc_id, n_chars AS rmin,
                  n_chars + 200 + doc_id % 300 AS rmax FROM documents),
f AS (SELECT doc_id,
             (rmax >= 300 AND rmin <= 600) AS inter,
             (rmin >= 300 AND rmax <= 600) AS within,
             (rmin <= 300 AND rmax >= 600) AS contains_q
      FROM r)
SELECT * FROM (
  SELECT 'contains' AS relation, count(*) FILTER (contains_q)::BIGINT AS n_docs,
         coalesce(sum(doc_id) FILTER (contains_q), 0)::BIGINT AS sum_doc_id FROM f
  UNION ALL
  SELECT 'crosses', count(*) FILTER (inter AND NOT within)::BIGINT,
         coalesce(sum(doc_id) FILTER (inter AND NOT within), 0)::BIGINT FROM f
  UNION ALL
  SELECT 'intersects', count(*) FILTER (inter)::BIGINT,
         coalesce(sum(doc_id) FILTER (inter), 0)::BIGINT FROM f
  UNION ALL
  SELECT 'within', count(*) FILTER (within)::BIGINT,
         coalesce(sum(doc_id) FILTER (within), 0)::BIGINT FROM f
) ORDER BY relation"""
    )
    o["range_on_range_facets"] = (
        """
WITH r AS (SELECT n_chars AS rmin,
                  n_chars + 200 + doc_id % 300 AS rmax FROM documents)
SELECT * FROM (
  SELECT 'long' AS label,
         count(*) FILTER (rmax >= 701 AND rmin <= 10000)::BIGINT AS count FROM r
  UNION ALL
  SELECT 'mid', count(*) FILTER (rmax >= 301 AND rmin <= 700)::BIGINT FROM r
  UNION ALL
  SELECT 'short', count(*) FILTER (rmax >= 0 AND rmin <= 300)::BIGINT FROM r
) ORDER BY label"""
    )
    o["all_groups_query"] = (
        _PRELUDE
        + """ , m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
              , g AS (SELECT DISTINCT d.source AS grp FROM m
                      JOIN documents d ON m.doc_id = d.doc_id)
              SELECT grp AS "group",
                     (SELECT count(*) FROM g)::BIGINT AS n_groups
              FROM g ORDER BY grp"""
    )
    o["facet_set_counts"] = (
        """SELECT * FROM (
             SELECT 'en_chars_small' AS label,
                    count(*) FILTER (lang = 'en' AND n_chars <= 400)::BIGINT AS count
             FROM documents
             UNION ALL
             SELECT 'exact_en_src3_any',
                    count(*) FILTER (lang = 'en' AND source = 'src3')::BIGINT
             FROM documents
             UNION ALL
             SELECT 'src1_to_3_big',
                    count(*) FILTER (source >= 'src1' AND source <= 'src3'
                                     AND n_chars >= 250)::BIGINT
             FROM documents) ORDER BY label"""
    )
    o["spell_jaro_winkler"] = (
        _PRELUDE
        + """ , v AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                      FROM tok GROUP BY term)
              , c AS (SELECT term, df,
                       jaro_winkler_similarity(term, 'costumer') AS sim
                      FROM v WHERE jaro_winkler_similarity(term, 'costumer') >= 0.7)
              SELECT row_number() OVER (ORDER BY sim DESC, df DESC, term) AS rank,
                     term, ROUND(sim, 6) AS similarity, df
              FROM c ORDER BY sim DESC, df DESC, term LIMIT 5"""
    )
    o["taxonomy_max_assoc"] = (
        """SELECT path, max(n_chars)::DOUBLE AS max_value FROM (
             SELECT source AS path, n_chars FROM documents
             UNION ALL
             SELECT source || '/' || lang AS path, n_chars FROM documents)
           GROUP BY path ORDER BY path"""
    )
    o["decontaminate_trigram"] = (
        "WITH x AS (SELECT 1)" + _POS_CTE
        + """
, sh AS (
    SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS g
    FROM pos a
    JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
    JOIN pos c ON a.doc_id = c.doc_id AND c.p = a.p + 2)
, bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 20)
SELECT s.doc_id, count(*)::BIGINT AS n_hits
FROM sh s JOIN bench b ON s.g = b.g
GROUP BY s.doc_id HAVING count(*) >= 2 ORDER BY s.doc_id"""
    )
    o["long_value_facet_counts"] = (
        """SELECT n_chars, count(*)::BIGINT AS n FROM documents
           GROUP BY n_chars ORDER BY n DESC, n_chars LIMIT 10"""
    )
    o["drill_sideways_facet"] = (
        """SELECT dim, value, count(*)::BIGINT AS n FROM (
             SELECT 'lang' AS dim, lang AS value FROM documents
             WHERE source = 'src3'
             UNION ALL
             SELECT 'source' AS dim, source AS value FROM documents
             WHERE lang = 'de')
           GROUP BY dim, value ORDER BY dim, value"""
    )
    # geo: both sides derive the same integer-exact lat/lon from doc_id;
    # the haversine mirrors pipelines/geo.py term for term
    # (SloppyMath.java:47,209 — R = 6371008.7714)
    _GEO_PTS = """
WITH pts AS (
  SELECT doc_id,
         (doc_id * 9973 % 18000) / 100.0 - 90.0 AS lat,
         (doc_id * 7919 % 36000) / 100.0 - 180.0 AS lon
  FROM documents)
"""

    from lucene_ray.pipelines.geo import path_distance_sql as _pd_sql

    o["geo_path_query"] = (
        _GEO_PTS
        + "SELECT doc_id FROM pts WHERE "
        + _pd_sql((40.005, 45.005, 35.005), (-70.005, 0.005, 40.005),
                  1_500_000.0)
        + " ORDER BY doc_id"
    )
    o["geo_heatmap_facets"] = _GEO_PTS + """
SELECT CAST(floor((lat - 0.005) / ((50.005 - 0.005) / 10)) AS BIGINT)
         AS cell_lat,
       CAST(floor((lon - (-60.005)) / ((59.995 - (-60.005)) / 12))
            AS BIGINT) AS cell_lon,
       count(*)::BIGINT AS n
FROM pts
WHERE lat >= 0.005 AND lat < 50.005
  AND lon >= -60.005 AND lon < 59.995
GROUP BY 1, 2 ORDER BY 1, 2"""

    def _geo_hav(clat: float, clon: float) -> str:
        return (
            f"6371008.7714 * 2 * asin(least(1.0, sqrt(("
            f"(1 - cos(radians(lat - ({clat}))))"
            f" + cos(radians(lat)) * cos(radians({clat}))"
            f" * (1 - cos(radians(lon - ({clon}))))) * 0.5)))"
        )

    o["geo_box_query"] = (
        _GEO_PTS
        + """SELECT doc_id, lat, lon FROM pts
WHERE lat BETWEEN 10 AND 60 AND lon BETWEEN -30 AND 40
ORDER BY doc_id"""
    )
    o["geo_distance_query"] = (
        _GEO_PTS
        + f"""SELECT doc_id FROM pts
WHERE {_geo_hav(48.8566, 2.3522)} <= 3000000.0
ORDER BY doc_id"""
    )
    o["geo_nearest_topk"] = (
        _GEO_PTS
        + f"""SELECT row_number() OVER (ORDER BY d, doc_id) AS rank, doc_id
FROM (SELECT doc_id, {_geo_hav(40.7, -74.0)} AS d FROM pts)
ORDER BY d, doc_id LIMIT 20"""
    )
    # convex ring -> inside = strictly the same side of every edge
    # (cross product sign; ring below is clockwise so inside is < 0).
    # Mirrors the geo_polygon_query entry's pentagon + rectangular hole.
    def _geo_halfplanes(lats, lons) -> str:
        terms = []
        n = len(lats)
        for j in range(n):
            y1, x1 = lats[j], lons[j]
            y2, x2 = lats[(j + 1) % n], lons[(j + 1) % n]
            terms.append(
                f"(({x2} - ({x1})) * (lat - ({y1}))"
                f" - ({y2} - ({y1})) * (lon - ({x1}))) < 0"
            )
        return "(" + " AND ".join(terms) + ")"

    _poly_shell = _geo_halfplanes(
        [10.005, 40.005, 60.005, 40.005, 10.005],
        [-20.005, -40.005, 0.005, 40.005, 20.005])
    _poly_hole = _geo_halfplanes(
        [30.005, 40.005, 40.005, 30.005],
        [-10.005, -10.005, 10.005, 10.005])
    o["geo_polygon_query"] = (
        _GEO_PTS
        + f"""SELECT doc_id, lat, lon FROM pts
WHERE {_poly_shell} AND NOT {_poly_hole}
ORDER BY doc_id"""
    )
    o["geo_distance_feature_topk"] = (
        _GEO_PTS
        + f"""SELECT row_number() OVER (ORDER BY d, doc_id) AS rank, doc_id,
       ROUND(2.0 * 500000.0 / (500000.0 + d), 4) AS score
FROM (SELECT doc_id, {_geo_hav(48.8566, 2.3522)} AS d FROM pts)
ORDER BY d, doc_id LIMIT 20"""
    )
    o["facet_lang_counts"] = (
        "SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang ORDER BY lang"
    )
    o["facet_source_counts"] = (
        "SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source ORDER BY source"
    )
    o["distinct_sources"] = "SELECT DISTINCT source FROM documents ORDER BY source"
    o["sort_by_field_topk"] = (
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10"
    )
    o["grouped_topk"] = (
        """SELECT lang, doc_id, n_chars FROM (
             SELECT lang, doc_id, n_chars,
                    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
             FROM documents) WHERE rn <= 2 ORDER BY lang, doc_id"""
    )
    o["range_facet_nchars"] = (
        """SELECT bucket, count(*)::BIGINT AS n FROM (
             SELECT CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS bucket
             FROM documents) GROUP BY bucket ORDER BY bucket"""
    )
    o["point_range_query"] = (
        "SELECT doc_id FROM documents WHERE n_chars >= 200 AND n_chars < 400 ORDER BY doc_id"
    )
    o["knn_cosine_topk"] = (
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                      FROM embeddings ORDER BY vec_id LIMIT 3)
           SELECT query_id, rank, neighbor_id, cosine FROM (
             SELECT q.query_id, e.vec_id AS neighbor_id,
                    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS cosine,
                    row_number() OVER (
                      PARTITION BY q.query_id
                      ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) DESC,
                               e.vec_id) AS rank
             FROM embeddings e CROSS JOIN q)
           WHERE rank <= 10 ORDER BY query_id, rank"""
    )
    o["events_tumbling_window"] = (
        """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
                  count(*)::BIGINT AS n, ROUND(sum(value), 4) AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    o["events_sliding_window"] = (
        """WITH e AS (
             SELECT epoch_us(ts) // 1000000 AS t, event_type, value FROM events)
           , w AS (
             SELECT (t // 1800) * 1800 AS window_epoch, event_type, value FROM e
             UNION ALL
             SELECT (t // 1800) * 1800 - 1800 AS window_epoch, event_type, value FROM e)
           SELECT window_epoch, event_type, count(*)::BIGINT AS n,
                  ROUND(sum(value), 4) AS sum_value
           FROM w GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    o["monitor_matches"] = (
        _PRELUDE + _POS_CTE
        + """
SELECT doc_id, query_id FROM (
  SELECT DISTINCT doc_id, 0::BIGINT AS query_id FROM tok WHERE term = 'table'
  UNION ALL
  SELECT doc_id, 1 FROM (
    SELECT DISTINCT doc_id FROM tok WHERE term = 'key') k
  WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'value')
  UNION ALL
  SELECT DISTINCT a.doc_id, 2 FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.term = 'key' AND b.term = 'value'
  UNION ALL
  SELECT DISTINCT doc_id, 3 FROM tok WHERE term LIKE 'sp%'
) ORDER BY query_id, doc_id"""
    )
    o["events_json_extract"] = (
        """SELECT event_type,
                  count(*)::BIGINT AS n,
                  sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k
           FROM events GROUP BY event_type ORDER BY event_type"""
    )
    o["asof_join_events"] = (
        """
WITH r0 AS (SELECT user_id, ts, max(value) AS value FROM events
            WHERE event_type = 'signup' GROUP BY user_id, ts),
l AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
SELECT l.user_id, l.event_id AS left_id,
       coalesce(epoch_us(r.ts), 0)::BIGINT AS right_ts_us,
       ROUND(coalesce(r.value, 0), 4) AS right_value
FROM l ASOF LEFT JOIN r0 r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY left_id"""
    )
    o["range_join_events"] = (
        """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
SELECT l.user_id, l.event_id AS left_id,
       count(r.ts)::BIGINT AS n_right,
       ROUND(coalesce(sum(r.value), 0), 4) AS sum_right
FROM l LEFT JOIN r ON l.user_id = r.user_id
   AND r.ts >= l.ts - INTERVAL 600 SECONDS AND r.ts <= l.ts
GROUP BY l.user_id, l.event_id
ORDER BY left_id"""
    )
    o["events_sessionization"] = (
        """WITH e AS (
             SELECT user_id, epoch_us(ts) // 1000000 AS t, value FROM events),
           o AS (
             SELECT user_id, t, value,
                    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
                         THEN 1 ELSE 0 END AS new
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
           s AS (
             SELECT user_id, t, value,
                    SUM(new) OVER (PARTITION BY user_id ORDER BY t) AS sid
             FROM o)
           SELECT user_id, min(t)::BIGINT AS session_start,
                  count(*)::BIGINT AS n_events, ROUND(sum(value), 4) AS sum_value
           FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""
    )
    o["force_merge_term_query"] = o["term_query"]
    o["replicated_search_query"] = o["term_query"]
    o["knn_ivf_full_probe"] = o["knn_cosine_topk"]
    # the persisted bucket-partitioned IVF index at full probe must also
    # equal brute-force cosine top-k (proves the partitioned layout +
    # pruned-read machinery loses nothing)
    o["knn_ivf_indexed_full_probe"] = o["knn_cosine_topk"]
    # quantized families at refine >= corpus: candidates = everything, the
    # exact re-rank IS brute force — the same anchor as full-probe IVF
    o["knn_pq_full_refine"] = o["knn_cosine_topk"]
    o["knn_sq_full_refine"] = o["knn_cosine_topk"]
    o["knn_ivfpq_full_refine"] = o["knn_cosine_topk"]
    # filtered kNN: same brute top-k restricted to vec_id % 3 == 0
    o["knn_filtered_cosine"] = o["knn_cosine_topk"].replace(
        "FROM embeddings e CROSS JOIN q",
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id % 3 = 0",
    )
    o["embedding_near_dup"] = (
        """SELECT x.vec_id AS a, y.vec_id AS b,
                  ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                               CAST(y.embedding AS DOUBLE[])), 4) AS cosine
           FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
           WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                        CAST(y.embedding AS DOUBLE[])) >= 0.42
           ORDER BY a, b"""
    )
    o["stored_fields_fetch"] = (
        _PRELUDE + _term_cte("t", "window")
        + """
, top5 AS (
    SELECT doc_id, row_number() OVER (ORDER BY ROUND(score,4) DESC, doc_id) AS rank
    FROM sc_t ORDER BY ROUND(score,4) DESC, doc_id LIMIT 5)
SELECT t5.rank, d.doc_id, d.lang, d.n_chars, substr(d.text, 1, 40) AS text_prefix
FROM top5 t5 JOIN documents d ON t5.doc_id = d.doc_id ORDER BY t5.rank"""
    )

    # bpe-ish token count: the engine's GPT-2-style pre-tokenizer regex
    # (textstats.py) uses a lookahead only to split trailing whitespace;
    # on the single-spaced corpus this RE2-safe variant counts identically
    o["bpe_token_count"] = (
        _pages_prelude()
        + r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))::BIGINT
         AS bpe_tokens
FROM pages ORDER BY doc_id"""
    )

    # language ID: the engine's trigram-profile heuristic re-expressed in
    # SQL — profiles are embedded as literals computed by the SAME seed
    # logic (textstats.LangId), argmax with seed-order tie-break, 'und'
    # when no profile overlaps
    from lucene_ray.pipelines.textstats import LangId

    lid = LangId()
    prof_rows = []
    for prio, lang in enumerate(LangId.SEEDS):
        for g in sorted(lid.profiles[lang]):
            prof_rows.append(f"('{lang}', '{g}', {prio})")
    o["lang_id"] = (
        _pages_prelude()
        + f"""
, s4 AS (SELECT doc_id, lang,
                '  ' || lower(substr(text, 1, 400)) || '  ' AS s FROM pages)
, grams AS (
    SELECT DISTINCT doc_id, substr(s, CAST(i AS INT) + 1, 3) AS g
    FROM s4, unnest(range(length(s) - 2)) AS t(i))
, prof(plang, g, prio) AS (VALUES {', '.join(prof_rows)})
, ov AS (
    SELECT gr.doc_id, p.plang, p.prio, count(*) AS ov
    FROM grams gr JOIN prof p ON gr.g = p.g GROUP BY 1, 2, 3)
, best AS (
    SELECT doc_id, plang FROM (
      SELECT doc_id, plang,
             row_number() OVER (PARTITION BY doc_id ORDER BY ov DESC, prio) AS rn
      FROM ov WHERE ov > 0) WHERE rn = 1)
SELECT s4.doc_id, s4.lang, coalesce(b.plang, 'und') AS lang_pred
FROM s4 LEFT JOIN best b ON s4.doc_id = b.doc_id
ORDER BY s4.doc_id"""
    )

    # english analyzer (stop + Porter stem): the stem mapping for the
    # corpus vocabulary is embedded as literals computed by the SAME
    # porter_stem used in the engine (only tokens whose stem differs)
    import glob as _glob

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from lucene_ray.analysis.stem import porter_stem as _ps

    vocab: set = set()
    for d in sorted(_glob.glob("/root/testdata/sf*/documents.parquet")):
        t = _pq.read_table(d, columns=["text"])
        flat = _pc.list_flatten(_pc.split_pattern(t["text"].combine_chunks(), " "))
        vocab.update(_pc.unique(flat).to_pylist())
    smap_rows = [
        f"('{w}', '{_ps(w)}')" for w in sorted(vocab) if w and _ps(w) != w
    ]
    smap_values = ", ".join(smap_rows) if smap_rows else "('', '')"
    # SCORING_BOOLEAN_QUERY_REWRITE twin: one BM25 CTE per vocab term
    # with the 's' prefix (the same union-vocabulary expansion the
    # engine's top-level rewrite produces), scores summed per doc
    _sr_terms = sorted(w for w in vocab if w and w.startswith("s"))
    o["scoring_rewrite_prefix"] = (
        _PRELUDE
        + "".join(_term_cte(f"sr{i}", t) for i, t in enumerate(_sr_terms))
        + ", uni AS (SELECT doc_id, sum(score) AS score FROM ("
        + " UNION ALL ".join(
            f"SELECT * FROM sc_sr{i}" for i in range(len(_sr_terms)))
        + """) GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM uni ORDER BY doc_id"""
    )
    # char filter: the SQL twin rewrites the raw text the same way
    o["char_filter_query"] = (
        f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(replace(text, 'table', 'tbl'), ' ')) AS term
  FROM documents
),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
cstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'tbl' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN cstats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # keyword-repeat: stemmed stream UNION ALL the originals that differ
    o["keyword_repeat_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, stem) AS (VALUES {smap_values}),
tok AS (
  SELECT t.doc_id, coalesce(s.stem, t.term) AS term
  FROM tok0 t LEFT JOIN smap s ON t.term = s.sterm
  UNION ALL
  SELECT t.doc_id, t.term FROM tok0 t JOIN smap s ON t.term = s.sterm
),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
kstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN kstats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )
    # discountOverlaps: tf/df over the EXPANDED stream, dl/sttf over the
    # base tokens (repeats share positions and are discounted)
    o["discount_overlaps_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, stem) AS (VALUES {smap_values}),
tok AS (
  SELECT t.doc_id, coalesce(s.stem, t.term) AS term
  FROM tok0 t LEFT JOIN smap s ON t.term = s.sterm
  UNION ALL
  SELECT t.doc_id, t.term FROM tok0 t JOIN smap s ON t.term = s.sterm
),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok0 GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
dstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN dstats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )
    # phonetic inject (Soundex): docs holding any token whose code
    # equals soundex('tabel') — codes computed by the same encoder
    from lucene_ray.analysis.phonetic import soundex as _sx

    _sx_rows = [f"('{w}', '{_sx(w)}')" for w in sorted(vocab) if w]
    _sx_vals = ", ".join(_sx_rows) if _sx_rows else "('', '')"
    o["phonetic_search_query"] = (
        f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, code) AS (VALUES {_sx_vals})
SELECT DISTINCT t.doc_id FROM tok t JOIN smap s ON t.term = s.sterm
WHERE s.code = '{_sx("tabel")}' ORDER BY t.doc_id"""
    )
    # mapping char filter: the SQL twin applies the same longest-match
    # rewrite at the char level ('table' before 'tab' — sequential
    # longest-source-first replace equals the simultaneous pass when no
    # replacement output re-matches a source, as here)
    o["mapping_char_filter_query"] = (
        _PRELUDE.replace(
            "string_split(text, ' ')",
            "string_split(replace(replace(text, 'table', 'tbl'), "
            "'tab', 'x'), ' ')", 1)
        + _term_cte("t", "tbl")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )

    # hyphenated-words filter: joining 'ta- ble' back restores the
    # plain stream exactly, so the twin is the standard BM25
    o["hyphenated_words_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )
    # delimited term frequency: f(table) triples and the field length
    # grows by 2 per occurrence; every other term's f is unchanged but
    # its norms shift through the adjusted doc lengths
    o["delimited_tf_query"] = (
        f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
base AS (SELECT doc_id,
                count(*) + 2 * count(*) FILTER (term = 'table') AS dl,
                3 * count(*) FILTER (term = 'table') AS f
         FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl, f,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM base),
tstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM base)::DOUBLE AS sttf),
df AS (SELECT count(*)::DOUBLE AS df FROM base WHERE f > 0)
SELECT q.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * q.f /
             (q.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM dlq q CROSS JOIN df d CROSS JOIN tstats s
WHERE q.f > 0 ORDER BY q.doc_id"""
    )

    # apostrophe filter: the derived corpus suffixes every token with
    # 'x (replace ' '->"'x "); stripping at the apostrophe restores the
    # plain stream exactly, so the twin is the standard BM25
    o["apostrophe_filter_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )
    # trim filter over the comma-pattern stream restores the plain
    # terms; pattern_replace maps ^table$->tbl bijectively — both score
    # exactly like the plain chain's 'table'
    o["trim_filter_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )
    o["pattern_replace_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )
    # protected 'table' skips the Porter chain: surface-form postings,
    # dl/df/tf identical to the plain chain
    o["protected_term_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )
    o["pattern_capture_query"] = f"""
WITH tok0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tok AS (SELECT * FROM tok0
        UNION ALL SELECT doc_id, 'ta' FROM tok0 WHERE term = 'table'),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'ta' GROUP BY doc_id),
ts AS (SELECT count(*)::DOUBLE AS df FROM tf),
sc AS (
  SELECT t.doc_id,
         ln(1 + (s.n - x.df + 0.5) / (x.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
  FROM tf t CROSS JOIN ts x CROSS JOIN stats s
  JOIN dlq q ON t.doc_id = q.doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM sc ORDER BY doc_id"""
    # remove_duplicates: capture + synonym both inject 'tab' at the same
    # position; dedupe keeps one, so the stream gains exactly ONE 'tab'
    # per 'table' occurrence — same expanded-stream shape as the capture
    # oracle, scored for 'tab'
    o["remove_duplicates_query"] = f"""
WITH tok0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tok AS (SELECT * FROM tok0
        UNION ALL SELECT doc_id, 'tab' FROM tok0 WHERE term = 'table'),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'tab' GROUP BY doc_id),
ts AS (SELECT count(*)::DOUBLE AS df FROM tf),
sc AS (
  SELECT t.doc_id,
         ln(1 + (s.n - x.df + 0.5) / (x.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
  FROM tf t CROSS JOIN ts x CROSS JOIN stats s
  JOIN dlq q ON t.doc_id = q.doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM sc ORDER BY doc_id"""
    o["date_recognizer_query"] = f"""
WITH tok0 AS (
  SELECT doc_id,
         unnest(string_split(replace(text, 'table', '2024-05-17'), ' '))
           AS term
  FROM documents
),
tok AS (SELECT * FROM tok0
        WHERE try_strptime(term, '%Y-%m-%d') IS NOT NULL),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT COALESCE(sum(dl), 0) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = '2024-05-17' GROUP BY doc_id),
ts AS (SELECT count(*)::DOUBLE AS df FROM tf),
sc AS (
  SELECT t.doc_id,
         ln(1 + (s.n - x.df + 0.5) / (x.df + 0.5)) * t.f /
           (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))) AS score
  FROM tf t CROSS JOIN ts x CROSS JOIN stats s
  JOIN dlq q ON t.doc_id = q.doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM sc ORDER BY doc_id"""
    # capitalization filter (lowercase off): Title-casing the all-lower
    # ASCII corpus then querying 'Table' is term-for-term the plain
    # lowercase chain scoring 'table'
    o["capitalization_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t"
          " ORDER BY doc_id"
    )
    # limit-token-count: only the first 5 raw tokens of each doc index;
    # doclen/norms computed over the truncated streams, N over all docs
    o["limit_token_count_query"] = (
        f"""
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
tok AS (SELECT doc_id, term FROM (
  SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p FROM toklist)
  WHERE p < 5),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
lstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN lstats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )
    # stemmer override + keyword marker: porter map over the vocab but
    # 'table' -> 'tbl0' (dictionary override) and 'values' removed from
    # the map (keyword-protected, stemmer skipped); two tagged queries
    _sov_rows = []
    for _w in sorted(vocab):
        if not _w:
            continue
        if _w == "table":
            _sov_rows.append("('table', 'tbl0')")
        elif _w == "values":
            continue
        elif _ps(_w) != _w:
            _sov_rows.append(f"('{_w}', '{_ps(_w)}')")
    _sov_vals = ", ".join(_sov_rows) if _sov_rows else "('', '')"
    o["stemmer_override_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, stem) AS (VALUES {_sov_vals}),
tok AS (SELECT t.doc_id, coalesce(s.stem, t.term) AS term
        FROM tok0 t LEFT JOIN smap s ON t.term = s.sterm),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok0 GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
ostats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
qt(q, term) AS (VALUES ('keyword', 'values'), ('override', 'tbl0')),
tf AS (SELECT qt.q, t.doc_id, count(*)::DOUBLE AS f
       FROM tok t JOIN qt ON t.term = qt.term GROUP BY qt.q, t.doc_id),
df AS (SELECT q, count(*)::DOUBLE AS df FROM tf GROUP BY q)
SELECT t.q, t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t JOIN df d ON t.q = d.q CROSS JOIN ostats s
JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.q, t.doc_id"""
    )

    # word-break spell checker: the twin enumerates split positions
    # against the derived dictionary (docs carry ' win dow' fragments)
    o["word_break_suggest"] = (
        """
WITH tok AS (SELECT doc_id, unnest(string_split(text || ' win dow', ' ')) AS term
             FROM documents),
dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term),
b1 AS (
  SELECT 'break1' AS kind, l.term || ' ' || r.term AS suggestion,
         1::BIGINT AS changes, greatest(l.df, r.df) AS freq
  FROM range(1, 8) t(i)
  JOIN dict l ON l.term = substr('keyvalue', 1, i::INT)
  JOIN dict r ON r.term = substr('keyvalue', i::INT + 1)),
b2a AS (
  SELECT 'break2' AS kind, l.term || ' ' || r.term AS suggestion,
         1::BIGINT AS changes, greatest(l.df, r.df) AS freq
  FROM range(1, 11) t(i)
  JOIN dict l ON l.term = substr('bigdatascan', 1, i::INT)
  JOIN dict r ON r.term = substr('bigdatascan', i::INT + 1)),
b2b AS (
  SELECT 'break2' AS kind,
         l.term || ' ' || m.term || ' ' || r.term AS suggestion,
         2::BIGINT AS changes, greatest(l.df, m.df, r.df) AS freq
  FROM range(1, 11) t(i) CROSS JOIN range(1, 11) u(j)
  JOIN dict l ON t.i < u.j AND l.term = substr('bigdatascan', 1, i::INT)
  JOIN dict m ON m.term = substr('bigdatascan', i::INT + 1, (j - i)::INT)
  JOIN dict r ON r.term = substr('bigdatascan', j::INT + 1)),
comb AS (
  SELECT 'combine' AS kind, d.term AS suggestion, 1::BIGINT AS changes,
         d.df AS freq
  FROM dict d WHERE d.term = 'window')
SELECT * FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2a
               UNION ALL SELECT * FROM b2b UNION ALL SELECT * FROM comb)
ORDER BY kind, changes, freq DESC, suggestion"""
    )

    # same vocabulary-mapped pattern for the round-5 encoders
    from lucene_ray.analysis.phonetic import encode as _ph_enc

    for _enc, _ename in (("metaphone", "metaphone_search_query"),
                         ("caverphone2", "caverphone_search_query"),
                         ("refined_soundex",
                          "refined_soundex_search_query")):
        _rows = [f"('{w}', '{_ph_enc(w, _enc)}')"
                 for w in sorted(vocab) if w]
        _vals = ", ".join(_rows) if _rows else "('', '')"
        o[_ename] = (
            f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, code) AS (VALUES {_vals})
SELECT DISTINCT t.doc_id FROM tok t JOIN smap s ON t.term = s.sterm
WHERE s.code = '{_ph_enc("tabel", _enc)}' ORDER BY t.doc_id"""
        )
    # ICU fold: identity on the (ASCII, lowercase) corpus, so the folded
    # query term 'tablé' -> 'table' scores exactly the standard BM25
    o["icu_fold_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t ORDER BY doc_id"
    )
    # ICU nfkc_cf normalization: identity on the (ASCII, lowercase)
    # corpus, so the normalized fullwidth query term 'Ｔａｂｌｅ' ->
    # 'table' scores exactly the standard BM25
    o["icu_normalizer_query"] = (
        _PRELUDE + _term_cte("t", "table")
        + " SELECT doc_id, ROUND(score, 4) AS score FROM sc_t ORDER BY doc_id"
    )

    # compound decomposition: tok stream = base tokens UNION their
    # injected subwords (same decomposer as the engine over the vocab);
    # doclens include injections
    from lucene_ray.analysis.compound import decompose as _dc

    _cw_rows = [
        f"('{w}', '{s}')" for w in sorted(vocab) if w
        for s in _dc(w, frozenset(("custom", "ream", "wind")),
                     min_word=5, min_sub=4, max_sub=6)
    ]
    _cw_vals = ", ".join(_cw_rows) if _cw_rows else "('', '')"
    o["compound_word_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
inj(sterm, sub) AS (VALUES {_cw_vals}),
tok AS (SELECT doc_id, term FROM tok0
        UNION ALL
        SELECT t.doc_id, i.sub FROM tok0 t JOIN inj i ON t.term = i.sterm),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = 'wind' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    o["common_grams_phrase"] = (
        f"""
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
posn AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p
         FROM toklist),
grams AS (SELECT a.doc_id, a.term || '_' || b.term AS term
          FROM posn a JOIN posn b
            ON a.doc_id = b.doc_id AND b.p = a.p + 1
          WHERE a.term = 'key' OR b.term = 'key'),
tok AS (SELECT doc_id, term FROM posn
        UNION ALL SELECT doc_id, term FROM grams),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok
       WHERE term = 'key_value' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # Hunspell analyzer: smap from the SAME corpus-derived dictionary the
    # fixture indexes with (union vocab — see _hunspell_vocab), query
    # term through the same chain
    from lucene_ray.analysis.hunspell import HunspellDictionary as _HD

    _hd = _HD.parse(_HUNSPELL_AFF,
                    "\n".join(f"{w}/S" for w in sorted(vocab) if w))
    _hs_rows = [f"('{w}', '{_hd.stem_one(w)}')" for w in sorted(vocab)
                if w and _hd.stem_one(w) != w]
    _hs_vals = ", ".join(_hs_rows) if _hs_rows else "('', '')"
    _hs_qt = _hd.stem_one("tables")
    o["hunspell_analyzer_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, stem) AS (VALUES {_hs_vals}),
tok AS (SELECT t.doc_id, coalesce(s.stem, t.term) AS term
        FROM tok0 t LEFT JOIN smap s ON t.term = s.sterm),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = '{_hs_qt}' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # Snowball per-language analyzers: same template, no stop set, smap
    # computed by each language's stemmer over the same vocabulary, the
    # query term stemmed through the same chain
    from lucene_ray.analysis.snowball import STEMMERS as _SB

    for _nm, _lg in _SNOWBALL_LANGS.items():
        _fn = _SB[_lg]
        _rows = [f"('{w}', '{_fn(w)}')" for w in sorted(vocab)
                 if w and _fn(w) != w]
        _vals = ", ".join(_rows) if _rows else "('', '')"
        _qt = _fn("table")
        o[f"{_nm}_analyzer_query"] = (
            f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, stem) AS (VALUES {_vals}),
tok AS (SELECT t.doc_id, coalesce(s.stem, t.term) AS term
        FROM tok0 t LEFT JOIN smap s ON t.term = s.sterm),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = '{_qt}' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
        )

    o["blended_infix_suggest"] = """
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
posn AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p
         FROM toklist),
m AS (SELECT doc_id, min(p) AS mp FROM posn
      WHERE term LIKE 'tab%' GROUP BY doc_id),
sc AS (SELECT doc_id,
              ((doc_id % 97) + 1)
              * (1 - CAST(0.10 AS DOUBLE) * mp) AS score FROM m)
SELECT doc_id, ROUND(sc.score, 4) AS score FROM sc
ORDER BY sc.score DESC, doc_id LIMIT 10"""

    # AnalyzingSuggester: analyzed == surface on this all-lowercase
    # space-tokenized corpus, so the FST completion's contract reduces
    # to LIKE 'key%' with the EXACT_FIRST tie layered on top
    o["analyzing_suggest"] = """
WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
s AS (SELECT ts[1] AS surface FROM t WHERE len(ts) >= 1 AND ts[1] <> ''
      UNION ALL
      SELECT ts[1] || ' ' || ts[2] FROM t WHERE len(ts) >= 2),
w AS (SELECT surface, count(*) AS weight FROM s GROUP BY surface)
SELECT surface, weight FROM w
WHERE surface LIKE 'key%'
ORDER BY (surface = 'key') DESC, weight DESC, surface ASC
LIMIT 10"""

    o["regex_completion_suggest"] = """
WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
s AS (SELECT ts[1] AS surface FROM t WHERE len(ts) >= 1 AND ts[1] <> ''
      UNION ALL
      SELECT ts[1] || ' ' || ts[2] FROM t WHERE len(ts) >= 2),
w AS (SELECT surface, count(*) AS weight FROM s GROUP BY surface)
SELECT surface, weight::BIGINT AS weight FROM w
WHERE regexp_matches(surface, '^k[ey]+')
ORDER BY weight DESC, surface LIMIT 10"""

    o["fuzzy_completion_suggest"] = """
WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
s AS (SELECT ts[1] AS surface FROM t WHERE len(ts) >= 1 AND ts[1] <> ''
      UNION ALL
      SELECT ts[1] || ' ' || ts[2] FROM t WHERE len(ts) >= 2),
w AS (SELECT surface, count(*) AS weight FROM s GROUP BY surface),
f AS (SELECT surface, weight,
             list_min([levenshtein('kye', surface[1:x])
                       for x in range(1, length(surface) + 1)]) AS edits
      FROM w WHERE surface LIKE 'k%')
SELECT surface, edits::BIGINT AS edits, weight::BIGINT AS weight
FROM f WHERE edits <= 1
ORDER BY edits, weight DESC, surface LIMIT 10"""

    o["document_dictionary_suggest"] = """
WITH w AS (SELECT source AS surface, sum(n_chars)::BIGINT AS weight
           FROM documents GROUP BY source)
SELECT surface, weight FROM w WHERE surface LIKE 'src1%'
ORDER BY (surface = 'src1') DESC, weight DESC, surface ASC LIMIT 10"""

    # ContextSuggester: analyzed == surface on this corpus (see above);
    # contexts filter + per-context boost, ties (surface asc, context asc)
    o["context_suggest"] = """
WITH t AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
s AS (SELECT source AS context, ts[1] AS surface FROM t
      WHERE len(ts) >= 1 AND ts[1] <> ''
      UNION ALL
      SELECT source, ts[1] || ' ' || ts[2] FROM t WHERE len(ts) >= 2),
w AS (SELECT context, surface, count(*) AS weight FROM s GROUP BY 1, 2),
b AS (SELECT surface, context,
             weight * CASE context WHEN 'src0' THEN CAST(2.0 AS DOUBLE)
                                   ELSE CAST(1.0 AS DOUBLE) END AS score
      FROM w WHERE context IN ('src0', 'src2') AND surface LIKE 'key%')
SELECT surface, context, score FROM b
ORDER BY score DESC, surface ASC, context ASC LIMIT 10"""

    # EnglishMinimalStemFilter: Harman S-stemmer smap over the corpus
    # vocabulary (same generator pattern as the Snowball entries)
    from lucene_ray.analysis.stem import english_minimal_stem as _ems

    _ems_rows = [f"('{w}', '{_ems(w)}')" for w in sorted(vocab)
                 if w and _ems(w) != w]
    _ems_vals = ", ".join(_ems_rows) if _ems_rows else "('', '')"
    o["minimal_stem_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
smap(sterm, stem) AS (VALUES {_ems_vals}),
tok AS (SELECT t.doc_id, coalesce(s.stem, t.term) AS term
        FROM tok0 t LEFT JOIN smap s ON t.term = s.sterm),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )
    # english possessive: the twin rewrites the raw text then strips the
    # exact token "table's" back to 'table' (embedded forms untouched)
    o["english_possessive_query"] = (
        f"""
WITH tok0 AS (
  SELECT doc_id,
         unnest(string_split(replace(text, 'table', 'table''s'), ' ')) AS term
  FROM documents
),
tok AS (SELECT doc_id,
               CASE WHEN term = 'table''s' THEN 'table' ELSE term END AS term
        FROM tok0),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = 'table' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # multilingual curation: dedup+quality base, then one BM25 block per
    # language over that language's routed token stream (en = stop +
    # Porter smap, de/es/fr = Snowball smaps, zh = StandardAnalyzer
    # passthrough), each with ITS OWN index stats and dlq quantization
    _ml_dlq = """
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq"""
    _ml_parts = []
    _ml_sel = []
    for _lg in ("de", "en", "es", "fr", "zh"):
        if _lg == "en":
            from lucene_ray.analysis.stem import porter_stem as _pstem

            _base = (f"base_{_lg} AS (SELECT doc_id, term FROM base0_{_lg} "
                     f"WHERE term NOT IN ({_STOPWORDS_SQL}))")
            _smap = f"smap_{_lg}(sterm, stem) AS (VALUES {smap_values})"
            _qt = _pstem("table")
        elif _lg == "zh":
            _base = f"base_{_lg} AS (SELECT doc_id, term FROM base0_{_lg})"
            _smap = None
            _qt = "table"
        else:
            _fn = _SB[_lg]
            _rows = [f"('{w}', '{_fn(w)}')" for w in sorted(vocab)
                     if w and _fn(w) != w]
            _smap = (f"smap_{_lg}(sterm, stem) AS "
                     f"(VALUES {', '.join(_rows) if _rows else chr(39)*2})")
            _base = f"base_{_lg} AS (SELECT doc_id, term FROM base0_{_lg})"
            _qt = _fn("table")
        _tok = (f"tok_{_lg} AS (SELECT b.doc_id, coalesce(s.stem, b.term) "
                f"AS term FROM base_{_lg} b LEFT JOIN smap_{_lg} s "
                f"ON b.term = s.sterm)") if _smap else \
               (f"tok_{_lg} AS (SELECT doc_id, term FROM base_{_lg})")
        _ml_parts.append(f"""
base0_{_lg} AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM kept WHERE lang = '{_lg}'),
{_base},
{(_smap + ',') if _smap else ''}
{_tok},
dl_{_lg} AS (SELECT doc_id, count(*) AS dl FROM tok_{_lg} GROUP BY doc_id),
dlq_{_lg} AS ({_ml_dlq} FROM dl_{_lg}),
st_{_lg} AS (SELECT (SELECT count(*) FROM dl_{_lg})::DOUBLE AS n,
                    (SELECT sum(dl) FROM dl_{_lg})::DOUBLE AS sttf),
tf_{_lg} AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok_{_lg}
             WHERE term = '{_qt}' GROUP BY doc_id),
dfc_{_lg} AS (SELECT count(*)::DOUBLE AS df FROM tf_{_lg})""")
        _ml_sel.append(f"""
SELECT '{_lg}' AS lang, t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4)
         AS score
FROM tf_{_lg} t CROSS JOIN dfc_{_lg} d CROSS JOIN st_{_lg} s
JOIN dlq_{_lg} q ON t.doc_id = q.doc_id""")
    o["curation_multilingual"] = (
        _pages_prelude()
        + """
, win AS (SELECT * FROM (
    SELECT doc_id, text, lang,
           row_number() OVER (PARTITION BY url
                              ORDER BY warc_ts DESC, doc_id DESC) AS rn
    FROM pages) WHERE rn = 1)
, tokall AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM win)
, tcnt AS (SELECT doc_id, count(*) AS n FROM tokall GROUP BY doc_id)
, kept AS (SELECT w.doc_id, w.lang, w.text FROM win w
           JOIN tcnt c USING (doc_id) WHERE c.n >= 20),
"""
        + ",".join(_ml_parts)
        + "\n" + "\nUNION ALL".join(_ml_sel)
        + "\nORDER BY lang, doc_id"
    )

    # Japanese (kuromoji role): the SQL twin reconstructs the synthetic
    # corpus's token streams from the engine segmenter's own output over
    # the 8 fixed sentences (compound_word_query precedent); dl < 24
    # throughout, so smallfloat norm quantization is the identity
    from lucene_ray.analysis.japanese import ja_tokenize as _ja_tok

    _ja_rows = [f"({pid}, '{t}')"
                for pid, sent in enumerate(_JA_SENTENCES)
                for t in _ja_tok(sent)]
    o["japanese_analyzer_query"] = (
        f"""
WITH pat(pid, term) AS (VALUES {', '.join(_ja_rows)}),
d AS (SELECT doc_id, doc_id % {len(_JA_SENTENCES)} AS pid,
             doc_id % 3 + 1 AS reps FROM documents),
plen AS (SELECT pid, count(*) AS sl FROM pat GROUP BY pid),
doclen AS (SELECT d.doc_id, p.sl * d.reps AS dl
           FROM d JOIN plen p USING (pid)),
stats AS (SELECT (SELECT count(*) FROM d)::DOUBLE AS n,
                 (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT d.doc_id, (cnt.c * d.reps)::DOUBLE AS f
       FROM d JOIN (SELECT pid, count(*) AS c FROM pat
                    WHERE term = '東京' GROUP BY pid) cnt USING (pid)),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))), 4)
         AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s
JOIN doclen q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # Korean (nori role), Chinese (smartcn role) and CJK-bigram
    # (CJKBigramFilter role) twins share the Japanese template: the
    # fixed 8-sentence corpora reconstruct from the engine segmenter's
    # own token streams; dl < 24 throughout keeps smallfloat norms the
    # identity. reps_sql parameterizes the repetition factor (1 for the
    # bigram corpus — see _ZH_SENTENCES note).
    def _cjk_oracle(sentences, tok, term, reps_sql):
        rows = [f"({pid}, '{t}')"
                for pid, sent in enumerate(sentences)
                for t in tok(sent)]
        return f"""
WITH pat(pid, term) AS (VALUES {', '.join(rows)}),
d AS (SELECT doc_id, doc_id % {len(sentences)} AS pid,
             {reps_sql} AS reps FROM documents),
plen AS (SELECT pid, count(*) AS sl FROM pat GROUP BY pid),
doclen AS (SELECT d.doc_id, p.sl * d.reps AS dl
           FROM d JOIN plen p USING (pid)),
stats AS (SELECT (SELECT count(*) FROM d)::DOUBLE AS n,
                 (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT d.doc_id, (cnt.c * d.reps)::DOUBLE AS f
       FROM d JOIN (SELECT pid, count(*) AS c FROM pat
                    WHERE term = '{term}' GROUP BY pid) cnt USING (pid)),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))), 4)
         AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s
JOIN doclen q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""

    from lucene_ray.analysis.analyzers import Analyzer as _An
    from lucene_ray.analysis.chinese import zh_tokenize as _zh_tok
    from lucene_ray.analysis.korean import ko_tokenize as _ko_tok

    o["korean_analyzer_query"] = _cjk_oracle(
        _KO_SENTENCES, _ko_tok, "학교", "doc_id % 3 + 1")
    o["chinese_analyzer_query"] = _cjk_oracle(
        _ZH_SENTENCES, _zh_tok, "搜索", "doc_id % 3 + 1")
    o["cjk_bigram_query"] = _cjk_oracle(
        _ZH_SENTENCES, _An(cjk_bigrams=True).tokens, "索引", "1")

    # round-5 language-analyzer twins (Thai dictionary break; Greek /
    # Arabic / Hindi / Indonesian light-stemmer chains): same template —
    # token streams reconstruct from the engine analyzer's own output,
    # the BM25 math is DuckDB's
    from lucene_ray.analysis.analyzers import analyzer_for_lang as _afl

    for _nm, (_lg, _sents, _term, _role) in _LANG_CORPORA.items():
        _an5 = _afl(_lg)
        o[f"{_nm}_analyzer_query"] = _cjk_oracle(
            _sents, _an5.tokens, _an5.normalize(_term), "doc_id % 3 + 1")

    _wan = _An(cjk_width=True)
    o["cjk_width_query"] = _cjk_oracle(
        _WIDTH_SENTENCES, _wan.tokens, _wan.normalize("ﾃﾞｰﾀ"),
        "doc_id % 3 + 1")

    # round-5 token-filter twins (elision / decimal-digit /
    # scandinavian-normalization): same engine-reconstructed template
    for _nm, (_kw, _sents, _term, _role) in _FLAG_CORPORA.items():
        _fan = _An(**_kw)
        o[f"{_nm}_query"] = _cjk_oracle(
            _sents, _fan.tokens, _fan.normalize(_term), "doc_id % 3 + 1")

    o["english_analyzer_query"] = (
        f"""
WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tok1 AS (SELECT doc_id, term FROM tok0 WHERE term NOT IN ({_STOPWORDS_SQL})),
smap(sterm, stem) AS (VALUES {smap_values}),
tok AS (SELECT t.doc_id, coalesce(s.stem, t.term) AS term
        FROM tok1 t LEFT JOIN smap s ON t.term = s.sterm),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = 'valu' GROUP BY doc_id),
df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # index-side synonym injection: 'quick' rides at 'fast' positions;
    # the multi-word rule injects 'kv' at every consecutive 'key','value'
    # run; both count toward field length
    o["synonym_index_query"] = (
        f"""
WITH toklist AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
posn AS (SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS p FROM toklist),
tok0 AS (SELECT doc_id, term FROM posn),
tok AS (SELECT * FROM tok0
        UNION ALL SELECT doc_id, 'quick' FROM tok0 WHERE term = 'fast'
        UNION ALL SELECT a.doc_id, 'kv'
                  FROM posn a JOIN posn b
                    ON a.doc_id = b.doc_id AND b.p = a.p + 1
                  WHERE a.term = 'key' AND b.term = 'value'),
doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (
  SELECT doc_id, dl,
    CASE WHEN dl < 24 THEN dl
         WHEN dl - 24 < 8 THEN dl
         ELSE 24 + (((dl-24) >> (CAST(floor(log2(dl-24)) AS INT)-3))
                    << (CAST(floor(log2(dl-24)) AS INT)-3))
    END AS dlq
  FROM doclen),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM doclen)::DOUBLE AS sttf),
tf_quick AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = 'quick' GROUP BY doc_id),
df_quick AS (SELECT count(*)::DOUBLE AS df FROM tf_quick),
tf_kv AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok WHERE term = 'kv' GROUP BY doc_id),
df_kv AS (SELECT count(*)::DOUBLE AS df FROM tf_kv)
SELECT 'quick' AS q, t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf_quick t CROSS JOIN df_quick d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
UNION ALL
SELECT 'kv' AS q, t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dlq / (s.sttf / s.n))), 4) AS score
FROM tf_kv t CROSS JOIN df_kv d CROSS JOIN stats s JOIN dlq q ON t.doc_id = q.doc_id
ORDER BY q, doc_id"""
    )
    o["solr_synonyms_query"] = o["synonym_index_query"]

    o["index_sorted_topk"] = (
        """SELECT (row_number() OVER (ORDER BY n_chars DESC, doc_id)) - 1 AS rank,
                  doc_id, n_chars
           FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10"""
    )

    o["index_sorted_range_count"] = (
        "SELECT count(*)::BIGINT AS n FROM documents "
        "WHERE n_chars BETWEEN 200 AND 400"
    )

    o["edge_ngram_counts"] = (
        """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
grams AS (
  SELECT DISTINCT doc_id, substr(term, 1, CAST(k AS INT)) AS g
  FROM tok, unnest(range(2, least(4, length(term)) + 1)) AS t(k))
SELECT d.doc_id, coalesce(g.n, 0)::BIGINT AS n_edge_ngrams
FROM documents d
LEFT JOIN (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id) g
       ON d.doc_id = g.doc_id
ORDER BY d.doc_id"""
    )

    # ---- multi-field ----
    # title = first 4 body tokens (data/webpages.py TITLE_SQL); title dl < 24
    # so the smallfloat norm quantization is the identity — exact dl is the
    # engine's quantized length bit-for-bit
    _TITLE_PRELUDE = """
WITH ttok AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:4]) AS term FROM documents
),
tdl AS (SELECT doc_id, count(*) AS dl FROM ttok GROUP BY doc_id),
tstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM tdl)::DOUBLE AS sttf
)
"""
    o["field_term_query"] = (
        _TITLE_PRELUDE
        + f"""
, tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM ttok WHERE term = 'table' GROUP BY doc_id)
, df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN tstats s JOIN tdl q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    o["field_exists_query"] = (
        """SELECT doc_id, 1.0 AS score FROM documents
           WHERE doc_id % 3 <> 0 AND length(text) > 0 ORDER BY doc_id"""
    )

    o["per_field_analyzer_query"] = (
        f"""
WITH ttok0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:4]) AS term FROM documents
),
smap(sterm, stem) AS (VALUES {smap_values}),
ttok AS (SELECT t.doc_id, coalesce(s.stem, t.term) AS term
         FROM ttok0 t LEFT JOIN smap s ON t.term = s.sterm),
tdl AS (SELECT doc_id, count(*) AS dl FROM ttok GROUP BY doc_id),
tstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM tdl)::DOUBLE AS sttf
)
, tf AS (SELECT doc_id, count(*)::DOUBLE AS f FROM ttok WHERE term = 'valu' GROUP BY doc_id)
, df AS (SELECT count(*)::DOUBLE AS df FROM tf)
SELECT t.doc_id,
       ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.f /
             (t.f + {K1} * (1 - {B} + {B} * q.dl / (s.sttf / s.n))), 4) AS score
FROM tf t CROSS JOIN df d CROSS JOIN tstats s JOIN tdl q ON t.doc_id = q.doc_id
ORDER BY t.doc_id"""
    )

    # BM25F (CombinedFieldQuery): tf~ = 1.0*tf_body + 2.0*tf_title,
    # dl~ = 1.0*len_body + 2.0*len_title (exact), avgdl~ = weighted sums / N,
    # df~ = greatest(df_body, df_title), summed over terms (table, key)
    def _cfq_term(name: str, term: str) -> str:
        return f"""
, bt_{name} AS (SELECT doc_id, count(*)::DOUBLE AS f FROM tok  WHERE term = '{term}' GROUP BY doc_id)
, tt_{name} AS (SELECT doc_id, count(*)::DOUBLE AS f FROM ttok WHERE term = '{term}' GROUP BY doc_id)
, df_{name} AS (SELECT greatest((SELECT count(*) FROM bt_{name}),
                                (SELECT count(*) FROM tt_{name}))::DOUBLE AS df)
, cf_{name} AS (
  SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
         coalesce(b.f, 0) * 1.0 + coalesce(t.f, 0) * 2.0 AS tf
  FROM bt_{name} b FULL OUTER JOIN tt_{name} t ON b.doc_id = t.doc_id)
, sc_{name} AS (
  SELECT c.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * c.tf /
           (c.tf + {K1} * (1 - {B} + {B} * (bl.dl * 1.0 + tl.dl * 2.0) / s.avgdl)) AS score
  FROM cf_{name} c CROSS JOIN df_{name} d CROSS JOIN cstats s
  JOIN bl ON c.doc_id = bl.doc_id JOIN tdl tl ON c.doc_id = tl.doc_id)"""

    o["combined_field_query"] = (
        """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
ttok AS (SELECT doc_id, unnest(string_split(text, ' ')[1:4]) AS term FROM documents),
bl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
tdl AS (SELECT doc_id, count(*) AS dl FROM ttok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         ((SELECT sum(dl) FROM bl) * 1.0 + (SELECT sum(dl) FROM tdl) * 2.0)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
)"""
        + _cfq_term("a", "table")
        + _cfq_term("b", "key")
        + """
SELECT doc_id, ROUND(sum(score), 4) AS score FROM (
  SELECT * FROM sc_a UNION ALL SELECT * FROM sc_b
) GROUP BY doc_id ORDER BY doc_id"""
    )
    return o


def _pages_prelude() -> str:
    from lucene_ray.data.webpages import WEBPAGES_SQL

    return WEBPAGES_SQL
