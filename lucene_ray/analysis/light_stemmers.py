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


# registered into analysis/snowball.STEMMERS by analysis/__init__ hook
LIGHT_STEMMERS = {
    "ar": lambda w: arabic_stem(arabic_normalize(w)),
    "fa": lambda w: persian_normalize(arabic_normalize(w)),
    "hi": lambda w: hindi_stem(hindi_normalize(w)),
    "id": indonesian_stem,
    "el": greek_stem,
}
