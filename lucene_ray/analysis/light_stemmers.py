"""Light (non-Snowball) per-language stemmers + normalizers — the roles
of the reference's hand-written stemmer classes in analysis/common:

* Arabic — ``ArabicNormalizer`` + ``ArabicStemmer``
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/ar/
  ArabicNormalizer.java:30, ArabicStemmer.java:33): Larkey, Ballesteros
  & Connell's *light10* algorithm ("Light Stemming for Arabic
  Information Retrieval", 2007) — orthographic normalization, one
  definite-article/conjunction prefix strip, iterated suffix strips.
* Hindi — ``HindiNormalizer`` + ``HindiStemmer``
  (analysis/hi/HindiNormalizer.java:34, HindiStemmer.java:27): Dolamic
  & Savoy-style Devanagari normalization plus Ramanathan & Rao's
  "A Lightweight Stemmer for Hindi" (2003) longest-suffix strip.
* Indonesian — ``IndonesianStemmer``
  (analysis/id/IndonesianStemmer.java:27): Tala's stemmer ("A Study of
  Stemming Effects on Information Retrieval in Bahasa Indonesia",
  2003) — particle / possessive / derivational affix removal with
  prefix-suffix compatibility flags.
* Greek — ``GreekLowerCaseFilter`` + ``GreekStemmer``
  (analysis/el/GreekLowerCaseFilter.java:30, GreekStemmer.java:39):
  Ntais's algorithm ("Development of a Stemmer for the Greek
  Language", 2006). Documented reduction (the smartcn/japanese
  lexicon precedent): the suffix RULE TABLES are implemented in full;
  the reference's per-rule protected-word exception lists (hundreds of
  lexicalized forms) are carried for the most common entries only, so
  a handful of lexicalized words over-stem relative to the reference.
  The behavior is deterministic and both index and query sides share
  it, so scoring parity holds for any corpus.

Second wave (round 5): Bulgarian (analysis/bg/BulgarianStemmer.java:36,
Savoy 2007), Czech (analysis/cz/CzechStemmer.java:36, Dolamic & Savoy
2009), Latvian (analysis/lv/LatvianStemmer.java:36, Kreslins), Galician
(analysis/gl/GalicianMinimalStemmer.java:29, RSLP-S plural step),
Bengali (analysis/bn/BengaliNormalizer.java:28 + BengaliStemmer.java:30,
UzZaman & Khan + Sengupta & Chaudhuri), Sorani Kurdish
(analysis/ckb/SoraniNormalizer.java:37 + SoraniStemmer.java:22), Telugu
(analysis/te/TeluguNormalizer.java:29 + TeluguStemmer.java:27), and the
Serbian dual-script normalization
(analysis/sr/SerbianNormalizationFilter.java:32).

All functions are pure ``str -> str`` and plug into the analyzer's
vocabulary-mapped filter path (analysis/batch.py): per-token Python
only ever touches the batch's UNIQUE terms, so per-call cost is
amortized exactly like the Snowball stemmers (analysis/snowball.py).

Fresh implementations of the published algorithms — no reference code.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Arabic (light10)
# ---------------------------------------------------------------------------

_AR_DIACRITICS = set("ًٌٍَُِّْ")
_AR_TATWEEL = "ـ"
_AR_ALEF_FORMS = {"آ": "ا", "أ": "ا", "إ": "ا"}

# strip order matters: longest composites before the bare conjunction
_AR_PREFIXES = ("ال",          # al-   (definite article)
                "وال",    # wal-
                "بال",    # bal-
                "كال",    # kal-
                "فال",    # fal-
                "لل",          # lil-
                "و")                # wa-   (bare conjunction)
_AR_SUFFIXES = ("ها",          # -ha
                "ان",          # -an
                "ات",          # -at
                "ون",          # -wn
                "ين",          # -yn
                "يه",          # -yh
                "ية",          # -yah
                "ه",                # -h
                "ة",                # -ta marbuta
                "ي")                # -y


def arabic_normalize(word: str) -> str:
    """ArabicNormalizer role: drop tatweel + harakat diacritics, unify
    hamza'd alefs to bare alef, alef maksura -> yeh, teh marbuta -> heh."""
    out = []
    for ch in word:
        if ch in _AR_DIACRITICS or ch == _AR_TATWEEL:
            continue
        ch = _AR_ALEF_FORMS.get(ch, ch)
        if ch == "ى":          # alef maksura -> yeh
            ch = "ي"
        elif ch == "ة":        # teh marbuta -> heh
            ch = "ه"
        out.append(ch)
    return "".join(out)


def arabic_stem(word: str) -> str:
    """ArabicStemmer role (light10): ONE prefix strip (first match, with
    the length guards — a 1-char prefix needs >=4 chars, longer prefixes
    must leave >=2 chars), then EVERY matching suffix strips in table
    order (each at most once), same leave->=2 guard per strip."""
    w = word
    for p in _AR_PREFIXES:
        if w.startswith(p):
            if len(p) == 1 and len(w) < 4:
                continue
            if len(w) < len(p) + 2:
                continue
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) >= len(s) + 2:
            w = w[: -len(s)]
    return w


# ---------------------------------------------------------------------------
# Persian
# ---------------------------------------------------------------------------

_FA_MAP = {
    "ی": "ي",   # farsi yeh -> arabic yeh
    "ے": "ي",   # yeh barree -> arabic yeh
    "ک": "ك",   # keheh -> kaf
    "ۀ": "ه",   # heh + yeh above -> heh
    "ہ": "ه",   # heh goal -> heh
}


def persian_normalize(word: str) -> str:
    """PersianNormalizer role (analysis/fa/PersianNormalizer.java:31):
    farsi yeh / yeh barree -> yeh, keheh -> kaf, heh variants -> heh,
    hamza-above removed — composed AFTER arabic_normalize, mirroring
    the PersianAnalyzer chain (fa/PersianAnalyzer.java:41: Arabic then
    Persian normalization, NO stemmer). The chain's ZWNJ -> space
    rewrite (PersianCharFilter.java:26) lives in the analyzer's
    char_filters, not here."""
    return "".join(_FA_MAP.get(c, c) for c in word if c != "ٔ")


# ---------------------------------------------------------------------------
# Hindi
# ---------------------------------------------------------------------------

_HI_MAP = {
    "ँ": "ं",  # chandrabindu -> anusvara
    "ऩ": "न",  # nnna -> na
    "ऱ": "र",  # rra -> ra
    "ऴ": "ळ",  # llla -> lla
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",  # nukta consonants -> base
    # candra / short vowel signs fold onto the standard sign
    "ॅ": "े", "ॆ": "े",  # candra/short e matra -> e
    "ॉ": "ो", "ॊ": "ो",  # candra/short o matra -> o
    "ऍ": "ए", "ऎ": "ए",  # candra/short E -> E
    "ऑ": "ओ", "ऒ": "ओ",  # candra/short O -> O
    "ॲ": "अ",                      # candra A -> A
}
_HI_DROP = {"़",          # nukta
            "्",          # virama
            "‌", "‍"}  # ZWNJ / ZWJ

# Ramanathan & Rao suffix tables, keyed by strip length; a strip of
# length L requires len(word) > L + 1 (at least 2 chars must remain)
_HI_SUFFIXES = {
    5: ("ाएंगी", "ाएंगे",
        "ाऊंगी", "ाऊंगा",
        "ाइयाँ", "ाइयों",
        "ाइयां"),
    4: ("ाएगी", "ाएगा",
        "ाओगी", "ाओगे",
        "एंगी", "ेंगी",
        "एंगे", "ेंगे",
        "ूंगी", "ूंगा",
        "ातीं", "नाओं",
        "नाएं", "ताओं",
        "ताएं", "ियाँ",
        "ियों", "ियां"),
    3: ("ाकर", "ाइए", "ाईं",
        "ाया", "ेगी", "ेगा",
        "ोगी", "ोगे", "ाने",
        "ाना", "ाते", "ाती",
        "ाता", "तीं", "ाओं",
        "ाएं", "ुओं", "ुएं",
        "ुआं"),
    2: ("कर", "ाओ", "िए", "ाई",
        "ाए", "ने", "नी", "ना",
        "ते", "ीं", "ती", "ता",
        "ाँ", "ां", "ों", "ें"),
    1: ("ा", "ि", "ी", "ु", "ू", "ृ",
        "े", "ै", "ो", "ौ", "ं", "ँ"),
}


def hindi_normalize(word: str) -> str:
    """HindiNormalizer role: nukta-composite folding, candra/short vowel
    unification, virama/ZW(N)J removal, dead-n (n + virama) -> anusvara."""
    out = []
    i, n = 0, len(word)
    while i < n:
        ch = word[i]
        if ch == "न" and i + 1 < n and word[i + 1] == "्":
            out.append("ं")     # dead n -> bindu
            i += 2
            continue
        if ch in _HI_DROP:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


def hindi_stem(word: str) -> str:
    """HindiStemmer role: strip the LONGEST matching suffix (5 -> 1
    chars), at most one strip, requiring >=2 chars to remain."""
    for L in (5, 4, 3, 2, 1):
        if len(word) > L + 1:
            for s in _HI_SUFFIXES[L]:
                if word.endswith(s):
                    return word[:-L]
    return word


# ---------------------------------------------------------------------------
# Indonesian (Tala)
# ---------------------------------------------------------------------------

_ID_VOWELS = "aeiou"

_REMOVED_KE = 1
_REMOVED_PENG = 2
_REMOVED_DI = 4
_REMOVED_MENG = 8
_REMOVED_TER = 16
_REMOVED_BER = 32
_REMOVED_PE = 64


def _id_syllables(w: str) -> int:
    return sum(1 for c in w if c in _ID_VOWELS)


def indonesian_stem(word: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer role (Tala's algorithm): drop inflectional
    particles (-kah/-lah/-pun/-tah) and possessives (-ku/-mu/-nya),
    then derivational prefixes and suffixes with the published
    prefix/suffix compatibility flags (e.g. a word that lost ke- or
    peng- may not lose -kan), always keeping >=2 syllables. The
    meny-/peny- (-> s) and mem-/pem-/pen- (-> p/t) sandhi
    recodings restore the root's initial consonant."""
    w = word
    syl = _id_syllables(w)
    flags = 0

    # inflectional particle
    if syl > 2 and (w.endswith("kah") or w.endswith("lah")
                    or w.endswith("pun") or w.endswith("tah")):
        w = w[:-3]
        syl -= 1
    # possessive pronoun
    if syl > 2:
        if w.endswith("nya"):
            w = w[:-3]
            syl -= 1
        elif w.endswith("ku") or w.endswith("mu"):
            w = w[:-2]
            syl -= 1
    if not stem_derivational:
        return w

    def first_order(w, syl, flags):
        if w.startswith("meng"):
            return w[4:], syl - 1, flags | _REMOVED_MENG
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], syl - 1, flags | _REMOVED_MENG
        if w.startswith("men"):
            return w[3:], syl - 1, flags | _REMOVED_MENG
        if w.startswith("mem") and len(w) > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], syl - 1, flags | _REMOVED_MENG
        if w.startswith("mem"):
            return w[3:], syl - 1, flags | _REMOVED_MENG
        if w.startswith("me"):
            return w[2:], syl - 1, flags | _REMOVED_MENG
        if w.startswith("peng"):
            return w[4:], syl - 1, flags | _REMOVED_PENG
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], syl - 1, flags | _REMOVED_PENG
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            return "t" + w[3:], syl - 1, flags | _REMOVED_PENG
        if w.startswith("pen"):
            return w[3:], syl - 1, flags | _REMOVED_PENG
        if w.startswith("pem") and len(w) > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], syl - 1, flags | _REMOVED_PENG
        if w.startswith("pem"):
            return w[3:], syl - 1, flags | _REMOVED_PENG
        if w.startswith("di"):
            return w[2:], syl - 1, flags | _REMOVED_DI
        if w.startswith("ter"):
            return w[3:], syl - 1, flags | _REMOVED_TER
        if w.startswith("ke"):
            return w[2:], syl - 1, flags | _REMOVED_KE
        return w, syl, flags

    def second_order(w, syl, flags):
        if w.startswith("ber"):
            return w[3:], syl - 1, flags | _REMOVED_BER
        if w == "belajar":
            return w[3:], syl - 1, flags | _REMOVED_BER
        if (w.startswith("be") and len(w) > 4
                and w[2] not in _ID_VOWELS and w[3:5] == "er"):
            return w[2:], syl - 1, flags | _REMOVED_BER
        if w.startswith("per"):
            # per- blocks a later -kan strip (perbaikan -> baik via -an,
            # never -kan), hence the PE flag here as on the pe- branch
            return w[3:], syl - 1, flags | _REMOVED_PE
        if w == "pelajar":
            return w[3:], syl - 1, flags | _REMOVED_PE
        if w.startswith("pe"):
            return w[2:], syl - 1, flags | _REMOVED_PE
        return w, syl, flags

    def suffix(w, syl, flags):
        if (w.endswith("kan") and len(w) > 3
                and not flags & (_REMOVED_KE | _REMOVED_PENG | _REMOVED_PE)):
            return w[:-3], syl - 1, flags
        if (w.endswith("an") and len(w) > 2
                and not flags & (_REMOVED_DI | _REMOVED_MENG | _REMOVED_TER)):
            return w[:-2], syl - 1, flags
        if (w.endswith("i") and len(w) > 1 and not w.endswith("si")
                and not flags & (_REMOVED_BER | _REMOVED_KE | _REMOVED_PENG)):
            return w[:-1], syl - 1, flags
        return w, syl, flags

    if syl > 2:
        w2, syl2, flags2 = first_order(w, syl, flags)
        if len(w2) != len(w):                    # a first-order rule fired
            w, syl, flags = w2, syl2, flags2
            before = len(w)
            if syl > 2:
                w, syl, flags = suffix(w, syl, flags)
            if len(w) != before and syl > 2:     # suffix fired too
                w, syl, flags = second_order(w, syl, flags)
        else:                                    # no first-order prefix
            if syl > 2:
                w, syl, flags = second_order(w, syl, flags)
            if syl > 2:
                w, syl, flags = suffix(w, syl, flags)
    return w


# ---------------------------------------------------------------------------
# Greek (Ntais)
# ---------------------------------------------------------------------------

_EL_FOLD = {
    "ά": "α", "έ": "ε", "ή": "η",
    "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "ό": "ο", "ύ": "υ", "ϋ": "υ",
    "ΰ": "υ", "ώ": "ω", "ς": "σ",
}

_EL_VOWELS = set("αεηιουω")


def greek_fold(word: str) -> str:
    """GreekLowerCaseFilter role: lowercase (done upstream by the
    chain), strip tonos/dialytika accents, final sigma -> sigma."""
    return "".join(_EL_FOLD.get(c, c) for c in word.lower())


def _el_ends(w: str, *sufs: str) -> "str | None":
    for s in sufs:
        if w.endswith(s):
            return s
    return None


# rule-4 exceptions that keep a final -αγ/-ολογ theme vowel
_EL_S1_KEEP = frozenset(("φαγ", "σκαγ", "ολογ", "σογ", "τατογ", "κρεασ",
                         "περασ", "τερασ"))
_EL_S6_KEEP = frozenset(("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ",
                         "ανηθ", "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ",
                         "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
                         "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ",
                         "συνομηλ", "πετσ", "πιτσ", "πικαντ", "πλιατσ",
                         "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
                         "υποδ", "φιλον", "φυλοδ", "χασ"))


def greek_stem(word: str) -> str:
    """GreekStemmer role — Ntais's rule cascade over the folded
    (accent-free, lowercase) form. The full suffix tables run in
    published order: lexicalized plural/diminutive recodings first,
    then the big noun/adjective case-ending table, then verb endings,
    then the final-vowel strip. Protected-stem exception lists are
    reduced (module docstring)."""
    w = greek_fold(word)
    if len(w) < 4 or any(c not in _EL_VOWELS and not ("α" <= c <= "ω")
                         for c in w):
        return w

    # step 1: lexicalized plurals (-ιασματα -> -ιασμα family)
    s = _el_ends(w, "φαγια", "φαγιου", "φαγιων")
    if s:
        return w[: -len(s)] + "φα"
    s = _el_ends(w, "σκαγια", "σκαγιου", "σκαγιων")
    if s:
        return w[: -len(s)] + "σκα"
    s = _el_ends(w, "ολογιου", "ολογια", "ολογιων")
    if s:
        return w[: -len(s)] + "ολο"
    s = _el_ends(w, "σογιου", "σογια", "σογιων")
    if s:
        return w[: -len(s)] + "σο"
    s = _el_ends(w, "τατογια", "τατογιου", "τατογιων")
    if s:
        return w[: -len(s)] + "τατο"
    s = _el_ends(w, "κρεατοσ", "κρεατα", "κρεατων")
    if s:
        return w[: -len(s)] + "κρε"
    s = _el_ends(w, "περατοσ", "περατα", "περατων")
    if s:
        return w[: -len(s)] + "περ"
    s = _el_ends(w, "τεριατοσ", "τεριατα", "τεριατων")
    if s:
        return w[: -len(s)] + "τερ"

    # step 2: -αδες/-αδων (mama-type plurals)
    s = _el_ends(w, "αδεσ", "αδων")
    if s:
        stem = w[: -len(s)]
        if not _el_ends(stem, "οκ", "μαμ", "μαν", "μπαμπ", "πατερ",
                        "γιαγι", "νταντ", "κυρ", "θει", "πεθερ"):
            stem += "αδ"
        return stem
    s = _el_ends(w, "εδεσ", "εδων")
    if s:
        stem = w[: -len(s)]
        if _el_ends(stem, "οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                    "μιλ"):
            stem += "εδ"
        return stem
    s = _el_ends(w, "ουδεσ", "ουδων")
    if s:
        stem = w[: -len(s)]
        if _el_ends(stem, "αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
                    "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ",
                    "φε"):
            stem += "ουδ"
        return stem

    # step 3: -εως/-εων (πολεως -> πολ)
    s = _el_ends(w, "εωσ", "εων")
    if s and len(w) - len(s) >= 2:
        return w[: -len(s)]

    # step 4: -ια/-ιου/-ιων after a vowel stem
    s = _el_ends(w, "ια", "ιου", "ιων")
    if s:
        stem = w[: -len(s)]
        if stem and stem[-1] in _EL_VOWELS:
            return stem + "ι"
        if stem not in _EL_S1_KEEP:
            return stem

    # step 5: -ικα/-ικο/-ικου/-ικων adjectives
    s = _el_ends(w, "ικα", "ικο", "ικου", "ικων", "ικοσ", "ικη", "ικησ",
                 "ικεσ", "ικοι", "ικουσ")
    if s:
        stem = w[: -len(s)]
        if (stem and stem[-1] in _EL_VOWELS) or stem in _EL_S6_KEEP:
            return stem + "ικ"
        return stem

    # step 6: common verb endings (present/aorist/passive), longest first
    for suf in ("ιουμαστε", "ιομασταν", "ουμαστε", "ομασταν",
                "ιεμαστε", "ιεσαστε", "ουσαμε", "ουσατε", "ομαστε",
                "οσαστε", "ιομουν", "ιοσουν", "ιοταν", "ηθηκα",
                "ηθηκε", "ηθηκαμε", "ηθηκατε", "ηθηκαν", "ησαμε",
                "ησατε", "ηκαμε", "ηκατε", "ουσαν", "ονταν", "ομουν",
                "οσουν", "ηθεισ", "ηθει", "ησαν", "ησεσ", "ηκαν",
                "οταν", "ουμε", "ετε", "ουν", "αμε", "ατε", "ανε",
                "εισ", "ει", "ησα", "ησε", "ηκα", "ηκε", "αν", "ω"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    else:
        # step 7: noun case endings, longest first
        for suf in ("ωτατουσ", "ωτατων", "ωτατοσ", "ωτατη", "ουσεσ",
                    "ατων", "ατοσ", "ουσα", "ατα", "ουσ", "εισ", "εσ",
                    "ασ", "ησ", "οσ", "ουσ", "ου", "ων", "οι", "αι",
                    "α", "η", "ο", "ε", "ι", "υ"):
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                w = w[: -len(suf)]
                break
    return w


# ---------------------------------------------------------------------------
# Bulgarian (Savoy) — BulgarianStemmer role
# (analysis/bg/BulgarianStemmer.java:36; "Searching Strategies for the
# Bulgarian Language", Savoy 2007)
# ---------------------------------------------------------------------------


def _bg_article(w: str) -> str:
    """Strip the postfixed definite article (-ът/-ят/-та/-то/-те and the
    long-form -ият/-ия)."""
    if len(w) > 6 and w.endswith("ият"):
        return w[:-3]
    if len(w) > 5 and w[-2:] in ("ът", "то", "те", "та", "ия"):
        return w[:-2]
    if len(w) > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_plural(w: str) -> str:
    """Undo plural formation, restoring the singular's final consonant
    where pluralization mutated it (к↔ц, г↔з, х↔с, я↔е ablaut)."""
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:-3]           # -овци -> -о
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"     # -еве -> -й
    if n > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"     # ц -> к before the dropped -и
        if w.endswith("зи"):
            return w[:-2] + "г"     # з -> г
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]   # е..и -> я.. (ablaut)
    if n > 4:
        if w.endswith("си"):
            return w[:-2] + "х"     # с -> х
        if w.endswith("и"):
            return w[:-1]
    return w


def bulgarian_stem(word: str) -> str:
    """Savoy's light stemmer for Bulgarian: no stem under 4 chars; the
    -ища suffix wins outright; otherwise article strip, plural undo,
    final-vowel (-я/-а/-о/-е) strip, -ен -> -н recoding, and the
    fleeting-ъ (ъN -> N) contraction."""
    w = word
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_article(w)
    w = _bg_plural(w)
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w and w[-1] in "аое":
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Czech (Dolamic & Savoy) — CzechStemmer role
# (analysis/cz/CzechStemmer.java:36; "Indexing and stemming approaches
# for the Czech language", Dolamic & Savoy 2009)
# ---------------------------------------------------------------------------

_CS_CASE_4 = ("ětem", "etem", "atům")
_CS_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte",
              "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
              "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi",
              "ými")
_CS_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us",
              "ým", "mi", "ou")
_CS_CASE_1 = "aeiouůyáéíýě"


def _cs_case(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith("atech"):
        return w[:-5]
    if n > 6 and w[-4:] in _CS_CASE_4:
        return w[:-4]
    if n > 5 and w[-3:] in _CS_CASE_3:
        return w[:-3]
    if n > 4 and w[-2:] in _CS_CASE_2:
        return w[:-2]
    if n > 3 and w[-1] in _CS_CASE_1:
        return w[:-1]
    return w


def _cs_normalize(w: str) -> str:
    """Palatalization undo on the exposed stem end: čt->ck, št->sk,
    c/č->k, z/ž->h, trailing e-infix elision, ů->o shortening."""
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


def czech_stem(word: str) -> str:
    """Dolamic & Savoy's light stemmer for Czech: longest case ending
    (noun/adjective declension), then possessive -ov/-in/-ův, then the
    palatalization normalization. Expects lowercased input WITH
    diacritics (the analyzer chain lowercases first)."""
    w = _cs_case(word)
    if len(w) > 5 and w[-2:] in ("ov", "in", "ův"):
        w = w[:-2]
    return _cs_normalize(w) if w else w


# ---------------------------------------------------------------------------
# Latvian (Kreslins) — LatvianStemmer role
# (analysis/lv/LatvianStemmer.java:36; light version of Karlis Kreslins'
# PhD thesis "A stemming algorithm for Latvian": noun + adjective
# declension only, with palatalization undo on declension II/V/VI strips)
# ---------------------------------------------------------------------------

_LV_VOWELS = frozenset("aeiouāēīū")

# (suffix, vowels the suffix itself contributes, fires palatalization)
# — a strip is accepted only if the word has MORE vowels than the
# suffix (>=1 vowel stays in the stem) and >=3 chars remain.
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    """Undo stem-final palatalization exposed by a declension II/V/VI
    strip. The genitive-plural -u strips additionally restore kš->kst
    and ņņ->nn; the ambiguous s/t/d mutations (s->š, t->š, d->ž, z->ž)
    are left alone, as in the thesis's light variant."""
    if removed_first == "u":
        if stem.endswith("kš"):
            return stem[:-2] + "kst"
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem[-2:] in ("pj", "bj", "mj", "vj"):    # labial + j: drop j
        return stem[:-1]
    for pal, plain in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                       ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if stem.endswith(pal):
            return stem[:-2] + plain
    if stem.endswith("č"):
        return stem[:-1] + "c"
    if stem.endswith("ļ"):
        return stem[:-1] + "l"
    if stem.endswith("ņ"):
        return stem[:-1] + "n"
    return stem


def latvian_stem(word: str) -> str:
    """Strip the single longest matching declension ending (the affix
    table is ordered longest-first), requiring >=3 chars and >=1 vowel
    in the remaining stem; undo palatalization where flagged."""
    nv = sum(1 for c in word if c in _LV_VOWELS)
    for suf, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(word) >= len(suf) + 3 and word.endswith(suf):
            stem = word[: -len(suf)]
            return _lv_unpalatalize(stem, suf[0]) if palatalizes else stem
    return word


# ---------------------------------------------------------------------------
# Galician (RSLP-S) — GalicianMinimalStemmer role
# (analysis/gl/GalicianMinimalStemmer.java:29: the plural-reduction step
# of "Regras do lematizador para o galego", the RSLP-S variant of
# Orengo & Huyck's "A stemming algorithm for the Portuguese language")
# ---------------------------------------------------------------------------

# (suffix, min stem chars that must precede it, replacement,
#  whole-word exceptions). First match wins, one strip only.
# Documented reduction (greek_stem precedent): the published rule set's
# proper-noun/loan-word exception lists are carried for the most common
# entries only.
_GL_PLURAL_RULES = (
    ("ns", 1, "n", ("luns",)),
    ("ós", 3, "ón", ()),
    ("ões", 3, "ón", ()),
    ("ães", 1, "ão", ("mães",)),
    ("ais", 2, "al", ("cais", "tais", "mais", "pais", "ademais")),
    ("áis", 2, "al", ("máis",)),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ()),
    ("ois", 2, "ol", ()),
    ("ís", 2, "il", ("país",)),
    ("is", 2, "il", ("pais",)),
    ("les", 2, "l", ("ingles",)),
    ("res", 3, "r", ("venres", "mércores")),
    ("ces", 2, "z", ()),
    ("zes", 2, "z", ()),
    ("ises", 3, "z", ()),
    ("ás", 1, "al", ("más",)),
    ("ses", 2, "s", ()),
    ("s", 2, "", ("xoves", "martes", "menos", "atenas", "mas",
                  "óculos", "país", "francés", "lápis")),
)


def galician_minimal_stem(word: str) -> str:
    """RSLP-S plural step for Galician: only words of >=3 chars ending
    in -s are candidates; apply the first matching suffix rule whose
    stem keeps the required minimum length and whose word is not a
    listed exception (bons->bon, normais->normal, luces->luz,
    casas->casa)."""
    if len(word) < 3 or not word.endswith("s"):
        return word
    for suf, min_stem, repl, exceptions in _GL_PLURAL_RULES:
        if word.endswith(suf) and len(word) - len(suf) >= min_stem \
                and word not in exceptions:
            return word[: -len(suf)] + repl
    return word


# ---------------------------------------------------------------------------
# Bengali — BengaliNormalizer + BengaliStemmer roles
# (analysis/bn/BengaliNormalizer.java:28: "A Double Metaphone encoding
# for Bangla and its application in spelling checker", UzZaman & Khan;
# analysis/bn/BengaliStemmer.java:30: Sengupta & Chaudhuri's verb-phrase
# suffix analysis with Savoy's light-stemmer criteria)
# ---------------------------------------------------------------------------

_BN_HOSONTO = "্"


def bengali_normalize(word: str) -> str:
    """Spelling-variant folding for Bengali: chandrabindu drop, long
    i/u-kar -> short, khanda-ta -> ta, nga -> anusvara, ন়/ণ -> ন,
    ড়/ঢ় -> র, শ/ষ -> স, the ja-phala and ba-phala conjunct rewrites,
    and the positional visarga rule."""
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":                      # chandrabindu: drop
            del s[i]
            continue
        if c == "ী":                      # dirgho i-kar -> rossho
            s[i] = "ি"
        elif c == "ূ":                    # dirgho u-kar -> rossho
            s[i] = "ু"
        elif c == "ক" and i + 2 < len(s) and s[i + 1] == _BN_HOSONTO \
                and s[i + 2] == "ষ":      # ক্ষ (khio) -> খ
            if i == 0:
                s[i: i + 3] = ["খ"]
            else:
                s[i + 1: i + 3] = ["খ"]
            i += 1
            continue
        elif c == "ঙ":                    # nga -> anusvara
            s[i] = "ং"
        elif c == "য" and i >= 1 and s[i - 1] == _BN_HOSONTO:
            # ja-phala: word-initial C + ্য reads as e-kar on the
            # consonant; elsewhere the conjunct drops entirely
            if i == 2:
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                continue
            del s[i - 1: i + 1]
            i -= 1
            continue
        elif c == "ব" and i >= 1 and s[i - 1] == _BN_HOSONTO:
            # ba-phala: silent after an initial or clustered consonant,
            # gemination of the preceding consonant otherwise
            if i == 2 or (i >= 5 and s[i - 3] == _BN_HOSONTO):
                del s[i - 1: i + 1]
                i -= 1
                continue
            if i >= 2:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif c == "ঃ":                    # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"            # short word: read as হ
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]                # geminate the next char
        elif c in ("শ", "ষ"):        # শ/ষ -> স
            s[i] = "স"
        elif c == "ণ":                    # ণ -> ন
            s[i] = "ন"
        elif c in ("ড়", "ঢ়"):        # ড়/ঢ় -> র
            s[i] = "র"
        elif c == "ৎ":                    # khanda-ta -> ta
            s[i] = "ত"
        i += 1
    return "".join(s)


_BN_SUFFIXES = {
    8: ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
        "ইয়াছিলেন"),
    7: ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা",
        "িয়াছিলি", "য়েদেরকে"),
    6: ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
        "েদেরকে"),
    5: ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা",
        "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে"),
    4: ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা",
        "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের"),
    3: ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম",
        "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি",
        "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের"),
    2: ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা",
        "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "রা", "কে"),
    1: ("ি", "ী", "া", "ো", "ে", "ব", "ত"),
}


def bengali_stem(word: str) -> str:
    """Strip the single longest matching verb/case/classifier suffix
    (8 -> 1 chars), requiring >=2 chars to remain."""
    for length in range(8, 0, -1):
        if len(word) > length + 1:
            for suf in _BN_SUFFIXES[length]:
                if word.endswith(suf):
                    return word[:-length]
    return word


# ---------------------------------------------------------------------------
# Sorani Kurdish — SoraniNormalizer + SoraniStemmer roles
# (analysis/ckb/SoraniNormalizer.java:37, SoraniStemmer.java:22)
# ---------------------------------------------------------------------------

import unicodedata as _ud


def sorani_normalize(word: str) -> str:
    """Unicode-representation folding for Sorani: yeh forms -> farsi
    yeh, kaf -> keheh, heh variants/teh-marbuta -> ae (word-final heh
    and heh+ZWNJ included), initial reh -> rreh, harakat/tatweel/
    formatting characters dropped."""
    out = []
    for ch in word:
        if ch in "يى":               # yeh, dotless yeh
            out.append("ی")
        elif ch == "ك":                   # kaf -> keheh
            out.append("ک")
        elif ch == "‌":                   # ZWNJ: heh before it -> ae
            if out and out[-1] == "ه":
                out[-1] = "ە"
        elif ch == "ة":                   # teh marbuta -> ae
            out.append("ە")
        elif ch == "ھ":                   # heh doachashmee -> heh
            out.append("ه")
        elif ch == "ر":                   # word-initial reh -> rreh
            out.append("ڕ" if not out else ch)
        elif ch == "ڒ":                   # reh with v above -> rreh
            out.append("ڕ")
        elif ch in "ـًٌٍَُِّْ":
            continue                           # tatweel + harakat
        elif _ud.category(ch) == "Cf":
            continue                           # directional controls etc.
        else:
            out.append(ch)
    if out and out[-1] == "ه":            # word-final heh -> ae
        out[-1] = "ە"
    return "".join(out)


def sorani_stem(word: str) -> str:
    """Light suffix strip for Sorani: postposition (-دا/-نا/-ەوە), then
    possessive pronoun (-مان/-یان/-تان), then the longest matching
    ezafe/definiteness/number marker."""
    w = word
    if len(w) > 5 and w.endswith("دا"):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("نا"):
        w = w[:-1]
    elif len(w) > 6 and w.endswith("ەوە"):
        w = w[:-3]
    if len(w) > 6 and w[-3:] in ("مان", "یان", "تان"):
        w = w[:-3]
    # (suffix, min word length, chars to strip) — the demonstrative
    # singular -ایە/-ەیە keeps its leading vowel (strips 2 of 3)
    for suf, min_len, strip in (("ێکی", 7, 3), ("یەکی", 8, 4),
                                ("ێک", 6, 2), ("یەک", 7, 3),
                                ("ەکە", 7, 3), ("کە", 6, 2),
                                ("ەکان", 8, 4), ("کان", 7, 3),
                                ("یانی", 8, 4), ("انی", 7, 3),
                                ("یان", 7, 3), ("ان", 6, 2),
                                ("یانە", 8, 4), ("انە", 7, 3),
                                ("ایە", 6, 2), ("ەیە", 6, 2),
                                ("ە", 5, 1), ("ی", 5, 1)):
        if len(w) >= min_len and w.endswith(suf):
            return w[:-strip]
    return w


# ---------------------------------------------------------------------------
# Telugu — TeluguNormalizer + TeluguStemmer roles
# (analysis/te/TeluguNormalizer.java:29, TeluguStemmer.java:27)
# ---------------------------------------------------------------------------

_TE_MAP = str.maketrans({
    "ఀ": "ం", "ఁ": "ం",    # candrabindu -> bindu
    "ఔ": "ఓ", "ఐ": "ఏ",    # long -> short vowels
    "ఆ": "అ", "ఈ": "ఇ", "ఊ": "ఉ",
    "ీ": "ి", "ూ": "ు",    # long -> short matras
    "ే": "ె", "ో": "ొ",
    "ః": None, "‌": None, "‍": None,  # visarga, ZW(N)J
})


def telugu_normalize(word: str) -> str:
    """Spelling-variant folding for Telugu: candrabindu -> bindu, long
    vowels and matras -> short, visarga and ZW(N)J dropped, the
    decomposed ai/au diphthongs recomposed."""
    w = word.translate(_TE_MAP)
    # decomposed ai diphthong (ె + ai length mark ౖ) -> precomposed ై
    return w.replace("ై", "ై")


_TE_SUFFIXES_2 = ("డు", "ము", "వు", "లు", "ని", "ను", "చే", "కై", "లో",
                  "ది", "కి", "సు", "వై", "పై")
_TE_MATRAS_1 = ("ి", "ీ", "ు", "ూ", "ె",
                "ే", "ొ", "ో", "ా")


def telugu_stem(word: str) -> str:
    """Strip the single longest matching case/number/postposition
    suffix (plural -ళ్ళు/-డ్లు, then the 2-char markers, then a bare
    final matra)."""
    if len(word) > 5 and (word.endswith("ళ్ళు") or word.endswith("డ్లు")):
        return word[:-4]
    if len(word) > 3 and word[-2:] in _TE_SUFFIXES_2:
        return word[:-2]
    if len(word) > 2 and word[-1] in _TE_MATRAS_1:
        return word[:-1]
    return word


# ---------------------------------------------------------------------------
# Serbian — SerbianNormalizationFilter role
# (analysis/sr/SerbianNormalizationFilter.java:32: Cyrillic -> Latin,
# then Latin diacritics -> "bald" Latin, đ -> dj, with the digraph
# letters љ/њ/џ expanding to lj/nj/dz)
# ---------------------------------------------------------------------------

_SR_MAP = str.maketrans({
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj",
    "е": "e", "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "c", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "c", "џ": "dz", "ш": "s",
    "đ": "dj", "ž": "z", "ć": "c", "č": "c", "š": "s",
})


def serbian_normalize(word: str) -> str:
    """Fold Serbian Cyrillic and diacritic Latin to one bald-Latin
    form, so књига and knjiga index (and query) as the same term.
    Expects lowercased input (the analyzer lowercases first)."""
    return word.translate(_SR_MAP)


# registered into analysis/snowball.STEMMERS by analysis/__init__ hook
LIGHT_STEMMERS = {
    "ar": lambda w: arabic_stem(arabic_normalize(w)),
    "fa": lambda w: persian_normalize(arabic_normalize(w)),
    "hi": lambda w: hindi_stem(hindi_normalize(w)),
    "id": indonesian_stem,
    "el": greek_stem,
    # round-5 second wave
    "bg": bulgarian_stem,
    "cs": czech_stem,
    "lv": latvian_stem,
    "gl": galician_minimal_stem,
    "bn": lambda w: bengali_stem(bengali_normalize(w)),
    "ckb": lambda w: sorani_stem(sorani_normalize(w)),
    "te": lambda w: telugu_stem(telugu_normalize(w)),
    "sr": serbian_normalize,
}
