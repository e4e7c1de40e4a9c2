"""Snowball stemmers, second wave: Armenian, Irish, Lithuanian, Basque,
Catalan, Estonian, Nepali, Tamil.

Fresh Python implementations of the published Snowball algorithms
(snowballstem.org algorithm descriptions) — the role of the reference's
generated stemmers under
lucene/analysis/common/src/java/org/tartarus/snowball/ext/
(ArmenianStemmer.java, IrishStemmer.java, LithuanianStemmer.java,
BasqueStemmer.java, CatalanStemmer.java, EstonianStemmer.java,
NepaliStemmer.java, TamilStemmer.java), driven through
snowball/SnowballFilter.java:48. NOT ports of the generated Among-table
Java: each stemmer is written from the algorithm's published step
structure (region marks, longest-suffix dispatch per step); the suffix
lists are the algorithms' published data.

Like the first wave (analysis/snowball.py) these run per UNIQUE token
(vocabulary-mapped in ``batch._apply_token_filters``), so per-call
Python cost never touches the per-occurrence hot path.
"""

from __future__ import annotations


def _longest_suffix(w: str, sufs, floor: int = 0) -> "str | None":
    """Longest s in ``sufs`` with w.endswith(s) and the WHOLE suffix at
    or after ``floor`` — Snowball's find_among_b under a backward limit
    (a too-long match that crosses the limit is not a match at all)."""
    best = None
    for s in sufs:
        if ((best is None or len(s) > len(best)) and len(w) - len(s) >= floor
                and w.endswith(s)):
            best = s
    return best


def _longest_prefix(w: str, prefs) -> "str | None":
    """Longest p in ``prefs`` with w.startswith(p) (find_among forward)."""
    best = None
    for p in prefs:
        if (best is None or len(p) > len(best)) and w.startswith(p):
            best = p
    return best


# ---------------------------------------------------------------------------
# Armenian — snowballstem.org/algorithms/armenian/stemmer.html
# (reference: org/tartarus/snowball/ext/ArmenianStemmer.java)
# ---------------------------------------------------------------------------

_HY_VOWELS = "աեէըիուօ"

# adjective endings
_HY_ADJ = ("րորդ", "երորդ", "ալի", "ակի", "որակ", "եղ", "ական", "արան",
           "են", "եկեն", "երեն", "որէն", "ին", "գին", "ովին", "լայն",
           "վուն", "պես", "իվ", "ատ", "ավետ", "կոտ", "բար")

# verb endings
_HY_VERB = ("ա", "ացա", "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ",
            "ըալ", "անալ", "ենալ", "ացնալ", "ել", "ըել", "նել", "ցնել",
            "եցնել", "չել", "վել", "ացվել", "եցվել", "տել", "ատել",
            "ոտել", "կոտել", "ված", "ում", "վում", "ան", "ցան", "ացան",
            "ացրին", "ացին", "եցին", "վեցին", "ալիս", "ելիս", "ավ",
            "ացավ", "եցավ", "ալով", "ելով", "ար", "ացար", "եցար",
            "ացրիր", "ացիր", "եցիր", "վեցիր", "աց", "եց", "ացրեց",
            "ալուց", "ելուց", "ալու", "ելու", "աք", "ցաք", "ացաք",
            "ացրիք", "ացիք", "եցիք", "վեցիք", "անք", "ցանք", "ացանք",
            "ացրինք", "ացինք", "եցինք", "վեցինք")

# noun endings
_HY_NOUN = ("որդ", "ույթ", "ուհի", "ցի", "իլ", "ակ", "յակ", "անակ",
            "իկ", "ուկ", "ան", "պան", "ստան", "արան", "եղէն", "յուն",
            "ություն", "ածո", "իչ", "ուս", "ուստ", "գար", "վոր",
            "ավոր", "ոց", "անօց", "ու", "ք", "չեք", "իք", "ալիք",
            "անիք", "վածք", "ույք", "ենք", "ոնք", "ունք", "մունք",
            "իչք", "արք")

# case/article endings (require R2)
_HY_ENDING = ("սա", "վա", "ամբ", "դ", "անդ", "ությանդ", "վանդ", "ոջդ",
              "երդ", "ներդ", "ուդ", "ը", "անը", "ությանը", "վանը",
              "ոջը", "երը", "ները", "ի", "վի", "երի", "ների", "անում",
              "երում", "ներում", "ն", "ան", "ության", "վան", "ին",
              "երին", "ներին", "ությանն", "երն", "ներն", "ուն", "ոջ",
              "ությանս", "վանս", "ոջս", "ով", "անով", "վով", "երով",
              "ներով", "եր", "ներ", "ց", "ից", "վանից", "ոջից", "վից",
              "երից", "ներից", "ցից", "ոց", "ուց")


def _hy_regions(w: str) -> "tuple[int, int]":
    """(pV, p2): pV = after the first vowel; p2 = standard R2."""
    n = len(w)
    v = _HY_VOWELS
    i = 0
    while i < n and w[i] not in v:
        i += 1
    if i >= n:
        return n, n
    pv = i + 1
    i = pv
    while i < n and w[i] in v:
        i += 1
    if i >= n:
        return pv, n
    i += 1  # past the first non-vowel after a vowel (R1)
    while i < n and w[i] not in v:
        i += 1
    if i >= n:
        return pv, n
    i += 1  # past the second vowel run's first vowel
    while i < n and w[i] in v:
        i += 1
    if i >= n:
        return pv, n
    return pv, i + 1


def armenian_stem(word: str) -> str:
    """Armenian Snowball: ending (R2) -> verb -> adjective -> noun, each
    at most one longest-suffix removal within the pV region."""
    w = word
    pv, p2 = _hy_regions(w)
    s = _longest_suffix(w, _HY_ENDING, pv)
    if s is not None and len(w) - len(s) >= p2:
        w = w[: len(w) - len(s)]
    s = _longest_suffix(w, _HY_VERB, pv)
    if s is not None:
        w = w[: len(w) - len(s)]
    s = _longest_suffix(w, _HY_ADJ, pv)
    if s is not None:
        w = w[: len(w) - len(s)]
    s = _longest_suffix(w, _HY_NOUN, pv)
    if s is not None:
        w = w[: len(w) - len(s)]
    return w


# ---------------------------------------------------------------------------
# Irish — snowballstem.org/algorithms/irish/stemmer.html
# (reference: org/tartarus/snowball/ext/IrishStemmer.java; the chain
# also applies IrishLowerCaseFilter — see analyzers.analyzer_for_lang)
# ---------------------------------------------------------------------------

_GA_VOWELS = "aeiouáéíóú"

# initial mutations / proclitics: longest PREFIX match, replacement
# (lenition bhf->f, eclipsis mb->b, t-prothesis, d'/m'/b' elision, ...)
_GA_INITIAL = {
    "b'": "", "d'": "", "h-": "", "m'": "", "n-": "", "t-": "",
    "bhf": "f", "d'fh": "f", "fh": "f",
    "sh": "s", "ts": "s",
    "bh": "b", "mb": "b",
    "ch": "c", "gc": "c",
    "dh": "d", "nd": "d",
    "gh": "g", "ng": "g",
    "bp": "p", "ph": "p",
    "dt": "t", "th": "t",
    "mh": "m",
}

# noun suffixes: R1-deleted vs R2-deleted sets
_GA_NOUN_R1 = ("íochta", "aíochta", "abh", "eabh", "ibh", "aibh", "amh",
               "eamh", "imh", "aimh", "íocht", "aíocht")
_GA_NOUN_R2 = ("ire", "aire", "irí", "airí")

# derivational suffixes: R2-deleted vs stem-replacements
_GA_DERIV_R2 = ("achta", "eachta", "ach", "each", "achtúil", "eachtúil",
                "acht", "eacht")
_GA_DERIV_REPL = {
    "arcachta": "arc", "arcacht": "arc", "arcachtaí": "arc",
    "gineach": "gin", "gineas": "gin", "ginis": "gin",
    "grafaíochta": "graf", "grafaíoch": "graf", "grafaíocht": "graf",
    "grafaíochtaí": "graf",
    "patacha": "paite", "paite": "paite", "patach": "paite",
    "pataigh": "paite",
    "óideacha": "óid", "óideach": "óid", "óidigh": "óid",
}

# verb suffixes: RV-deleted vs R1-deleted sets
_GA_VERB_RV = ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
_GA_VERB_R1 = ("adh", "eadh", "áil", "ain", "tear", "tar")


def _std_regions(w: str, vowels: str) -> "tuple[int, int, int]":
    """(pV, p1, p2): pV after the first vowel, p1/p2 the standard
    R1/R2 (after the 1st/2nd non-vowel that follows a vowel)."""
    n = len(w)
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    if i >= n:
        return n, n, n
    pv = i + 1
    i = pv
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return pv, n, n
    p1 = i + 1
    i = p1
    while i < n and w[i] not in vowels:
        i += 1
    if i >= n:
        return pv, p1, n
    i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return pv, p1, n
    return pv, p1, i + 1


def irish_stem(word: str) -> str:
    """Irish Snowball: initial-mutation rewrite, then regions over the
    rewritten word, then noun / deriv / verb suffix steps in order."""
    w = word
    p = _longest_prefix(w, _GA_INITIAL)
    if p is not None:
        w = _GA_INITIAL[p] + w[len(p):]
    pv, p1, p2 = _std_regions(w, _GA_VOWELS)

    # noun suffixes (one longest match; region check, no retry)
    s = _longest_suffix(w, _GA_NOUN_R1 + _GA_NOUN_R2)
    if s is not None:
        if s in _GA_NOUN_R2:
            if len(w) - len(s) >= p2:
                w = w[: len(w) - len(s)]
        elif len(w) - len(s) >= p1:
            w = w[: len(w) - len(s)]

    # derivational suffixes
    s = _longest_suffix(w, _GA_DERIV_R2 + tuple(_GA_DERIV_REPL))
    if s is not None:
        if s in _GA_DERIV_REPL:
            w = w[: len(w) - len(s)] + _GA_DERIV_REPL[s]
        elif len(w) - len(s) >= p2:
            w = w[: len(w) - len(s)]

    # verb suffixes
    s = _longest_suffix(w, _GA_VERB_RV + _GA_VERB_R1)
    if s is not None:
        if s in _GA_VERB_R1:
            if len(w) - len(s) >= p1:
                w = w[: len(w) - len(s)]
        elif len(w) - len(s) >= pv:
            w = w[: len(w) - len(s)]
    return w


# ---------------------------------------------------------------------------
# Lithuanian — snowballstem.org/algorithms/lithuanian/stemmer.html
# (reference: org/tartarus/snowball/ext/LithuanianStemmer.java)
# ---------------------------------------------------------------------------

_LT_VOWELS = "aeiouyąėęįūų"

# case/verb inflection endings (step 1: one longest deletion in R1)
_LT_STEP1 = (
    "a", "ia", "osna", "iosna", "uosna", "iuosna", "ysna", "ėsna", "e",
    "ie", "enie", "oje", "ioje", "uje", "iuje", "yje", "enyje", "ėje",
    "ame", "iame", "sime", "ome", "ėme", "tumėme", "ose", "iose", "uose",
    "iuose", "yse", "enyse", "ėse", "ate", "iate", "ite", "kite", "site",
    "ote", "tute", "ėte", "tumėte", "i", "ai", "iai", "ei", "tumei",
    "ki", "imi", "umi", "iumi", "si", "asi", "iasi", "esi", "iesi",
    "siesi", "isi", "aisi", "eisi", "tumeisi", "uisi", "osi", "ėjosi",
    "uosi", "iuosi", "siuosi", "usi", "ausi", "čiausi", "ąsi", "ėsi",
    "ųsi", "tųsi", "ti", "enti", "inti", "oti", "ioti", "uoti", "iuoti",
    "auti", "iauti", "yti", "ėti", "telėti", "inėti", "terėti", "ui",
    "iui", "eniui", "oj", "ėj", "k", "am", "iam", "iem", "im", "sim",
    "om", "tum", "ėm", "tumėm", "an", "on", "ion", "un", "iun", "ėn",
    "o", "io", "enio", "ėjo", "uo", "s", "as", "ias", "es", "ies", "is",
    "ais", "iais", "tumeis", "imis", "enimis", "omis", "iomis", "umis",
    "ėmis", "enis", "asis", "ysis", "ams", "iams", "iems", "ims",
    "enims", "oms", "ioms", "ums", "ėms", "ens", "os", "ios", "uos",
    "iuos", "us", "aus", "iaus", "ius", "ys", "enys", "ąs", "iąs", "ės",
    "amės", "iamės", "imės", "kimės", "simės", "omės", "ėmės", "tumėmės",
    "atės", "iatės", "sitės", "otės", "ėtės", "tumėtės", "įs", "ūs",
    "tųs", "at", "iat", "it", "sit", "ot", "ėt", "tumėt", "u", "au",
    "iau", "čiau", "iu", "eniu", "siu", "y", "ą", "ią", "ė", "ę", "į",
    "enį", "ų", "ių",
)

# derivational suffixes (step 2: REPEAT deletion in R1 until none)
_LT_STEP2 = (
    "ing", "aj", "iaj", "iej", "oj", "ioj", "uoj", "iuoj", "auj", "ąj",
    "iąj", "ėj", "ųj", "iųj", "ok", "iok", "iuk", "uliuk", "učiuk",
    "išk", "iul", "yl", "ėl", "am", "dam", "jam", "zgan", "ain", "esn",
    "op", "iop", "ias", "ies", "ais", "iais", "os", "ios", "uos", "iuos",
    "aus", "iaus", "ąs", "iąs", "ęs", "utėait", "ant", "iant", "siant",
    "int", "ot", "uot", "iuot", "yt", "ėt", "ykšt", "iau", "dav", "sv",
    "šv", "ykšč", "ę", "ėję",
)

# homonym-conflict rewrites, applied before step 1 (whole word)
_LT_CONFLICTS = {
    "aite": "aitė", "aitės": "aitė", "uote": "uotė", "uotės": "uotė",
    "ėjime": "ėjimas", "esiu": "esys", "asius": "asys",
    "avime": "avimas", "ojime": "ojimas", "okate": "okatė",
    "okatės": "okatė",
}


def _lt_fix_chdz(w: str) -> str:
    """č -> t, dž -> d at the word end (palatalization undo)."""
    if w.endswith("dž"):
        return w[:-2] + "d"
    if w.endswith("č"):
        return w[:-1] + "t"
    return w


def lithuanian_stem(word: str) -> str:
    """Lithuanian Snowball: R1 skips a leading 'a' on words longer than
    6 chars; conflict rewrites, one inflection deletion, repeated
    derivational deletions, č/dž and gd fixes between steps."""
    w = word
    start = 1 if (w[:1] == "a" and len(w) > 6) else 0
    n = len(w)
    i = start
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    p1 = n
    if i < n:
        i += 1
        while i < n and w[i] in _LT_VOWELS:
            i += 1
        if i < n:
            p1 = i + 1

    s = _longest_suffix(w, _LT_CONFLICTS)
    if s is not None:
        w = w[: len(w) - len(s)] + _LT_CONFLICTS[s]
    s = _longest_suffix(w, _LT_STEP1, p1)
    if s is not None:
        w = w[: len(w) - len(s)]
    w = _lt_fix_chdz(w)
    while True:
        s = _longest_suffix(w, _LT_STEP2, p1)
        if s is None:
            break
        w = w[: len(w) - len(s)]
    w = _lt_fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Basque — snowballstem.org/algorithms/basque/stemmer.html
# (reference: org/tartarus/snowball/ext/BasqueStemmer.java)
# Suffix -> action: 1 = delete in RV, 2 = delete in R2, 4 = delete in
# R1; 3/5/6 = rewrite to jok/tra/minutu. A failed region check ends the
# repeat loop (no shorter-suffix retry), as in the reference.
# ---------------------------------------------------------------------------

_EU_VOWELS = "aeiou"

_EU_ADITZAK = {
    "idea": 1, "bidea": 1, "kidea": 1, "pidea": 1, "kundea": 1,
    "galea": 1, "tailea": 1, "tzailea": 1, "gunea": 1, "kunea": 1,
    "tzaga": 1, "gaia": 1, "aldia": 1, "taldia": 1, "karia": 1,
    "garria": 2, "karria": 1, "ka": 1, "tzaka": 1, "la": 1, "mena": 1,
    "pena": 1, "kina": 1, "ezina": 1, "tezina": 1, "kuna": 1, "tuna": 1,
    "kizuna": 1, "era": 1, "bera": 1, "arabera": -1, "kera": 1,
    "pera": 1, "orra": 1, "korra": 1, "dura": 1, "gura": 1, "kura": 1,
    "tura": 1, "eta": 1, "keta": 1, "gailua": 1, "eza": 1, "erreza": 1,
    "tza": 2, "gaitza": 1, "kaitza": 1, "kuntza": 1, "ide": 1, "bide": 1,
    "kide": 1, "pide": 1, "kunde": 1, "tzake": 1, "tzeke": 1, "le": 1,
    "gale": 1, "taile": 1, "tzaile": 1, "gune": 1, "kune": 1, "tze": 1,
    "atze": 1, "gai": 1, "aldi": 1, "taldi": 1, "ki": 1, "ari": 1,
    "kari": 1, "lari": 1, "tari": 1, "etari": 1, "garri": 2, "karri": 1,
    "arazi": 1, "tarazi": 1, "an": 1, "ean": 1, "rean": 1, "kan": 1,
    "etan": 1, "atseden": -1, "men": 1, "pen": 1, "kin": 1, "rekin": 1,
    "ezin": 1, "tezin": 1, "tun": 1, "kizun": 1, "go": 1, "ago": 1,
    "tio": 1, "dako": 1, "or": 1, "kor": 1, "tzat": 1, "du": 1,
    "gailu": 1, "tu": 1, "atu": 1, "aldatu": 1, "tatu": 1, "baditu": -1,
    "ez": 1, "errez": 1, "tzez": 1, "gaitz": 1, "kaitz": 1,
}
_EU_IZENAK = {
    "ada": 1, "kada": 1, "anda": 1, "denda": 1, "gabea": 1, "kabea": 1,
    "aldea": 1, "kaldea": 1, "taldea": 1, "ordea": 1, "zalea": 1,
    "tzalea": 1, "gilea": 1, "emea": 1, "kumea": 1, "nea": 1, "enea": 1,
    "zionea": 1, "unea": 1, "gunea": 1, "pea": 1, "aurrea": 1, "tea": 1,
    "kotea": 1, "artea": 1, "ostea": 1, "etxea": 1, "ga": 1, "anga": 1,
    "gaia": 1, "aldia": 1, "taldia": 1, "handia": 1, "mendia": 1,
    "geia": 1, "egia": 1, "degia": 1, "tegia": 1, "nahia": 1, "ohia": 1,
    "kia": 1, "tokia": 1, "oia": 1, "koia": 1, "aria": 1, "karia": 1,
    "laria": 1, "taria": 1, "eria": 1, "keria": 1, "teria": 1,
    "garria": 2, "larria": 1, "kirria": 1, "duria": 1, "asia": 1,
    "tia": 1, "ezia": 1, "bizia": 1, "ontzia": 1, "ka": 1, "joka": 3,
    "aurka": -1, "ska": 1, "xka": 1, "zka": 1, "gibela": 1, "gela": 1,
    "kaila": 1, "skila": 1, "tila": 1, "ola": 1, "na": 1, "kana": 1,
    "ena": 1, "garrena": 1, "gerrena": 1, "urrena": 1, "zaina": 1,
    "tzaina": 1, "kina": 1, "mina": 1, "garna": 1, "una": 1, "duna": 1,
    "asuna": 1, "tasuna": 1, "ondoa": 1, "kondoa": 1, "ngoa": 1,
    "zioa": 1, "koa": 1, "takoa": 1, "zkoa": 1, "noa": 1, "zinoa": 1,
    "aroa": 1, "taroa": 1, "zaroa": 1, "eroa": 1, "oroa": 1, "osoa": 1,
    "toa": 1, "ttoa": 1, "ztoa": 1, "txoa": 1, "tzoa": 1, "ñoa": 1,
    "ra": 1, "ara": 1, "dara": 1, "liara": 1, "tiara": 1, "tara": 1,
    "etara": 1, "tzara": 1, "bera": 1, "kera": 1, "pera": 1, "ora": 2,
    "tzarra": 1, "korra": 1, "tra": 1, "sa": 1, "osa": 1, "ta": 1,
    "eta": 1, "keta": 1, "sta": 1, "dua": 1, "mendua": 1, "ordua": 1,
    "lekua": 1, "burua": 1, "durua": 1, "tsua": 1, "tua": 1, "mentua": 1,
    "estua": 1, "txua": 1, "zua": 1, "tzua": 1, "za": 1, "eza": 1,
    "eroza": 1, "tza": 2, "koitza": 1, "antza": 1, "gintza": 1,
    "kintza": 1, "kuntza": 1, "gabe": 1, "kabe": 1, "kide": 1, "alde": 1,
    "kalde": 1, "talde": 1, "orde": 1, "ge": 1, "zale": 1, "tzale": 1,
    "gile": 1, "eme": 1, "kume": 1, "ne": 1, "zione": 1, "une": 1,
    "gune": 1, "pe": 1, "aurre": 1, "te": 1, "kote": 1, "arte": 1,
    "oste": 1, "etxe": 1, "gai": 1, "di": 1, "aldi": 1, "taldi": 1,
    "geldi": -1, "handi": 1, "mendi": 1, "gei": 1, "egi": 1, "degi": 1,
    "tegi": 1, "nahi": 1, "ohi": 1, "ki": 1, "toki": 1, "oi": 1,
    "goi": 1, "koi": 1, "ari": 1, "kari": 1, "lari": 1, "tari": 1,
    "garri": 2, "larri": 1, "kirri": 1, "duri": 1, "asi": 1, "ti": 1,
    "ontzi": 1, "ñi": 1, "ak": 1, "ek": 1, "tarik": 1, "gibel": 1,
    "ail": 1, "kail": 1, "kan": 1, "tan": 1, "etan": 1, "en": 4,
    "ren": 2, "garren": 1, "gerren": 1, "urren": 1, "ten": 4, "tzen": 4,
    "zain": 1, "tzain": 1, "kin": 1, "min": 1, "dun": 1, "asun": 1,
    "tasun": 1, "aizun": 1, "ondo": 1, "kondo": 1, "go": 1, "ngo": 1,
    "zio": 1, "ko": 1, "trako": 5, "tako": 1, "etako": 1, "eko": 1,
    "tariko": 1, "sko": 1, "tuko": 1, "minutuko": 6, "zko": 1, "no": 1,
    "zino": 1, "ro": 1, "aro": 1, "igaro": -1, "taro": 1, "zaro": 1,
    "ero": 1, "giro": 1, "oro": 1, "oso": 1, "to": 1, "tto": 1, "zto": 1,
    "txo": 1, "tzo": 1, "gintzo": 1, "ño": 1, "zp": 1, "ar": 1, "dar": 1,
    "behar": 1, "zehar": -1, "liar": 1, "tiar": 1, "tar": 1, "tzar": 1,
    "or": 2, "kor": 1, "os": 1, "ket": 1, "du": 1, "mendu": 1, "ordu": 1,
    "leku": 1, "buru": 2, "duru": 1, "tsu": 1, "tu": 1, "tatu": 4,
    "mentu": 1, "estu": 1, "txu": 1, "zu": 1, "tzu": 1, "gintzu": 1,
    "z": 1, "ez": 1, "eroz": 1, "tz": 1, "koitz": 1,
}
_EU_ADJ = {
    "zlea": 2, "keria": 1, "la": 1, "era": 1, "dade": 1, "tade": 1,
    "date": 1, "tate": 1, "gi": 1, "ki": 1, "ik": 1, "lanik": 1,
    "rik": 1, "larik": 1, "ztik": 1, "go": 1, "ro": 1, "ero": 1, "to": 1,
}
_EU_REWRITE = {3: "jok", 5: "tra", 6: "minutu"}


def _eu_rv(w: str) -> int:
    """Basque RV: after the next vowel when the 2nd letter is a
    consonant; after the next consonant when letters 1-2 are vowels;
    position 3 for consonant-vowel starts (Spanish-style RV)."""
    v = _EU_VOWELS
    n = len(w)
    if n < 2:
        return n
    if w[1] not in v:
        i = 2
        while i < n and w[i] not in v:
            i += 1
        return min(i + 1, n) if i < n else n
    if w[0] in v:
        i = 2
        while i < n and w[i] in v:
            i += 1
        return min(i + 1, n) if i < n else n
    return 3 if n >= 3 else n


def _std_r1_r2(w: str, vowels: str) -> "tuple[int, int]":
    """Standard R1/R2 (after the 1st/2nd non-vowel following a vowel)."""
    n = len(w)
    i = 0
    r1 = r2 = n
    while i < n and w[i] not in vowels:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in vowels:
            i += 1
        if i < n:
            r1 = i + 1
            i = r1
            while i < n and w[i] not in vowels:
                i += 1
            if i < n:
                i += 1
                while i < n and w[i] in vowels:
                    i += 1
                if i < n:
                    r2 = i + 1
    return r1, r2


def _eu_apply(w: str, table: dict, pv: int, p1: int, p2: int
              ) -> "str | None":
    """One longest-match application; None = stop (no match or a failed
    region check)."""
    s = _longest_suffix(w, table)
    if s is None:
        return None
    act = table[s]
    base = len(w) - len(s)
    if act == 1:
        return w[:base] if base >= pv else None
    if act == 2:
        return w[:base] if base >= p2 else None
    if act == 4:
        return w[:base] if base >= p1 else None
    return w[:base] + _EU_REWRITE[act]


def basque_stem(word: str) -> str:
    """Basque Snowball: repeat verb endings (aditzak), repeat noun
    endings (izenak), then one adjective pass (adjetiboak)."""
    w = word
    pv = _eu_rv(w)
    p1, p2 = _std_r1_r2(w, _EU_VOWELS)
    while True:
        nxt = _eu_apply(w, _EU_ADITZAK, pv, p1, p2)
        if nxt is None:
            break
        w = nxt
    while True:
        nxt = _eu_apply(w, _EU_IZENAK, pv, p1, p2)
        if nxt is None:
            break
        w = nxt
    s = _longest_suffix(w, _EU_ADJ)
    if s is not None:
        act = _EU_ADJ[s]
        base = len(w) - len(s)
        if act == 1:
            if base >= pv:
                w = w[:base]
        else:
            w = w[:base] + "z"
    return w


# ---------------------------------------------------------------------------
# Catalan — snowballstem.org/algorithms/catalan/stemmer.html
# (reference: org/tartarus/snowball/ext/CatalanStemmer.java)
# ---------------------------------------------------------------------------

_CA_VOWELS = "aeiouàáèéíïòóúü"

# attached pronouns (R1 delete)
_CA_PRONOUN = (
    "la", "-la", "sela", "le", "me", "-me", "se", "-te", "hi", "li",
    "-li", "-m", "-n", "ho", "lo", "selo", "las", "selas", "les", "-les",
    "-ls", "-ns", "ens", "los", "selos", "nos", "-nos", "vos", "us",
    "-us", "'hi", "'l", "'m", "'n", "'ho", "'s", "'ls", "'ns", "'t",
)
_CA_STD = {
    "ica": 4, "lógica": 3, "enca": 1, "ada": 2, "ancia": 1, "encia": 1,
    "ència": 1, "ícia": 1, "logia": 3, "inia": 1, "íinia": 1, "eria": 1,
    "ària": 1, "atòria": 1, "alla": 1, "ella": 1, "ívola": 1, "ima": 1,
    "íssima": 1, "quíssima": 5, "ana": 1, "ina": 1, "era": 1, "sfera": 1,
    "ora": 1, "dora": 1, "adora": 1, "adura": 1, "esa": 1, "osa": 1,
    "assa": 1, "essa": 1, "issa": 1, "eta": 1, "ita": 1, "ota": 1,
    "ista": 1, "ialista": 1, "ionista": 1, "iva": 1, "ativa": 1,
    "nça": 1, "logía": 3, "ic": 4, "ístic": 1, "enc": 1, "esc": 1,
    "ud": 1, "atge": 1, "ble": 1, "able": 1, "ible": 1, "isme": 1,
    "ialisme": 1, "ionisme": 1, "ivisme": 1, "aire": 1, "icte": 1,
    "iste": 1, "ici": 1, "íci": 1, "logi": 3, "ari": 1, "tori": 1,
    "al": 1, "il": 1, "all": 1, "ell": 1, "ívol": 1, "isam": 1,
    "issem": 1, "ìssem": 1, "íssem": 1, "íssim": 1, "quíssim": 5,
    "amen": 1, "ìssin": 1, "ar": 1, "ificar": 1, "egar": 1, "ejar": 1,
    "itar": 1, "itzar": 1, "fer": 1, "or": 1, "dor": 1, "dur": 1,
    "doras": 1, "ics": 4, "lógics": 3, "uds": 1, "nces": 1, "ades": 2,
    "ancies": 1, "encies": 1, "ències": 1, "ícies": 1, "logies": 3,
    "inies": 1, "ínies": 1, "eries": 1, "àries": 1, "atòries": 1,
    "bles": 1, "ables": 1, "ibles": 1, "imes": 1, "íssimes": 1,
    "quíssimes": 5, "formes": 1, "ismes": 1, "ialismes": 1, "ines": 1,
    "eres": 1, "ores": 1, "dores": 1, "idores": 1, "dures": 1, "eses": 1,
    "oses": 1, "asses": 1, "ictes": 1, "ites": 1, "otes": 1, "istes": 1,
    "ialistes": 1, "ionistes": 1, "iques": 4, "lógiques": 3, "ives": 1,
    "atives": 1, "logíes": 3, "allengües": 1, "icis": 1, "ícis": 1,
    "logis": 3, "aris": 1, "toris": 1, "ls": 1, "als": 1, "ells": 1,
    "ims": 1, "íssims": 1, "quíssims": 5, "ions": 1, "cions": 1,
    "acions": 2, "esos": 1, "osos": 1, "assos": 1, "issos": 1, "ers": 1,
    "ors": 1, "dors": 1, "adors": 1, "idors": 1, "ats": 1, "itats": 1,
    "bilitats": 1, "ivitats": 1, "ativitats": 1, "ïtats": 1, "ets": 1,
    "ants": 1, "ents": 1, "ments": 1, "aments": 1, "ots": 1, "uts": 1,
    "ius": 1, "trius": 1, "atius": 1, "ès": 1, "és": 1, "ís": 1,
    "dís": 1, "ós": 1, "itat": 1, "bilitat": 1, "ivitat": 1,
    "ativitat": 1, "ïtat": 1, "et": 1, "ant": 1, "ent": 1, "ient": 1,
    "ment": 1, "ament": 1, "isament": 1, "ot": 1, "isseu": 1, "ìsseu": 1,
    "ísseu": 1, "triu": 1, "íssiu": 1, "atiu": 1, "ó": 1, "ió": 1,
    "ció": 1, "ació": 1,
}
_CA_VERB = {
    "aba": 1, "esca": 1, "isca": 1, "ïsca": 1, "ada": 1, "ida": 1,
    "uda": 1, "ïda": 1, "ia": 1, "aria": 1, "iria": 1, "ara": 1,
    "iera": 1, "ira": 1, "adora": 1, "ïra": 1, "ava": 1, "ixa": 1,
    "itza": 1, "ía": 1, "aría": 1, "ería": 1, "iría": 1, "ïa": 1,
    "isc": 1, "ïsc": 1, "ad": 1, "ed": 1, "id": 1, "ie": 1, "re": 1,
    "dre": 1, "ase": 1, "iese": 1, "aste": 1, "iste": 1, "ii": 1,
    "ini": 1, "esqui": 1, "eixi": 1, "itzi": 1, "am": 1, "em": 1,
    "arem": 1, "irem": 1, "àrem": 1, "írem": 1, "àssem": 1, "éssem": 1,
    "iguem": 1, "ïguem": 1, "avem": 1, "àvem": 1, "ávem": 1, "irìem": 1,
    "íem": 1, "aríem": 1, "iríem": 1, "assim": 1, "essim": 1, "issim": 1,
    "àssim": 1, "èssim": 1, "éssim": 1, "íssim": 1, "ïm": 1, "an": 1,
    "aban": 1, "arian": 1, "aran": 1, "ieran": 1, "iran": 1, "ían": 1,
    "arían": 1, "erían": 1, "irían": 1, "en": 1, "ien": 1, "arien": 1,
    "irien": 1, "aren": 1, "eren": 1, "iren": 1, "àren": 1, "ïren": 1,
    "asen": 1, "iesen": 1, "assen": 1, "essen": 1, "issen": 1,
    "éssen": 1, "ïssen": 1, "esquen": 1, "isquen": 1, "ïsquen": 1,
    "aven": 1, "ixen": 1, "eixen": 1, "ïxen": 1, "ïen": 1, "in": 1,
    "inin": 1, "sin": 1, "isin": 1, "assin": 1, "essin": 1, "issin": 1,
    "ïssin": 1, "esquin": 1, "eixin": 1, "aron": 1, "ieron": 1,
    "arán": 1, "erán": 1, "irán": 1, "iïn": 1, "ado": 1, "ido": 1,
    "ando": 2, "iendo": 1, "io": 1, "ixo": 1, "eixo": 1, "ïxo": 1,
    "itzo": 1, "ar": 1, "tzar": 1, "er": 1, "eixer": 1, "ir": 1,
    "ador": 1, "as": 1, "abas": 1, "adas": 1, "idas": 1, "aras": 1,
    "ieras": 1, "ías": 1, "arías": 1, "erías": 1, "irías": 1, "ids": 1,
    "es": 1, "ades": 1, "ides": 1, "udes": 1, "ïdes": 1, "atges": 1,
    "ies": 1, "aries": 1, "iries": 1, "ares": 1, "ires": 1, "adores": 1,
    "ïres": 1, "ases": 1, "ieses": 1, "asses": 1, "esses": 1, "isses": 1,
    "ïsses": 1, "ques": 1, "esques": 1, "ïsques": 1, "aves": 1,
    "ixes": 1, "eixes": 1, "ïxes": 1, "ïes": 1, "abais": 1, "arais": 1,
    "ierais": 1, "íais": 1, "aríais": 1, "eríais": 1, "iríais": 1,
    "aseis": 1, "ieseis": 1, "asteis": 1, "isteis": 1, "inis": 1,
    "sis": 1, "isis": 1, "assis": 1, "essis": 1, "issis": 1, "ïssis": 1,
    "esquis": 1, "eixis": 1, "itzis": 1, "áis": 1, "aréis": 1,
    "eréis": 1, "iréis": 1, "ams": 1, "ados": 1, "idos": 1, "amos": 1,
    "ábamos": 1, "áramos": 1, "iéramos": 1, "íamos": 1, "aríamos": 1,
    "eríamos": 1, "iríamos": 1, "aremos": 1, "eremos": 1, "iremos": 1,
    "ásemos": 1, "iésemos": 1, "imos": 1, "adors": 1, "ass": 1,
    "erass": 1, "ess": 1, "ats": 1, "its": 1, "ents": 1, "às": 1,
    "aràs": 1, "iràs": 1, "arás": 1, "erás": 1, "irás": 1, "és": 1,
    "arés": 1, "ís": 1, "iïs": 1, "at": 1, "it": 1, "ant": 1, "ent": 1,
    "int": 1, "ut": 1, "ït": 1, "au": 1, "erau": 1, "ieu": 1, "ineu": 1,
    "areu": 1, "ireu": 1, "àreu": 1, "íreu": 1, "asseu": 1, "esseu": 1,
    "eresseu": 1, "àsseu": 1, "ésseu": 1, "igueu": 1, "ïgueu": 1,
    "àveu": 1, "áveu": 1, "itzeu": 1, "ìeu": 1, "irìeu": 1, "íeu": 1,
    "aríeu": 1, "iríeu": 1, "assiu": 1, "issiu": 1, "àssiu": 1,
    "èssiu": 1, "éssiu": 1, "íssiu": 1, "ïu": 1, "ix": 1, "eix": 1,
    "ïx": 1, "itz": 1, "ià": 1, "arà": 1, "irà": 1, "itzà": 1, "ará": 1,
    "erá": 1, "irá": 1, "irè": 1, "aré": 1, "eré": 1, "iré": 1, "í": 1,
    "iï": 1, "ió": 1,
}
# standard-suffix actions: 1 = R1 delete, 2 = R2 delete, 3 = R2 -> log,
# 4 = R2 -> ic, 5 = R1 -> c. Verb actions: 1 = R1 delete, 2 = R2 delete.
_CA_CLEAN = str.maketrans({"à": "a", "á": "a", "è": "e", "é": "e",
                           "ì": "i", "í": "i", "ï": "i", "ò": "o",
                           "ó": "o", "ú": "u", "ü": "u", "·": "."})

# residual suffixes: 1 = R1 delete, 2 = R1 -> ic
_CA_RESIDUAL = {
    "a": 1, "e": 1, "i": 1, "ïn": 1, "o": 1, "ir": 1, "s": 1, "is": 1,
    "os": 1, "ïs": 1, "it": 1, "eu": 1, "iu": 1, "iqu": 2, "itz": 1,
    "à": 1, "á": 1, "é": 1, "ì": 1, "í": 1, "ï": 1, "ó": 1,
}


def catalan_stem(word: str) -> str:
    """Catalan Snowball: attached pronoun (R1), then standard suffix OR
    verb suffix, then residual suffix, then accent cleaning."""
    w = word
    p1, p2 = _std_r1_r2(w, _CA_VOWELS)
    s = _longest_suffix(w, _CA_PRONOUN)
    if s is not None and len(w) - len(s) >= p1:
        w = w[: len(w) - len(s)]

    did_std = False
    s = _longest_suffix(w, _CA_STD)
    if s is not None:
        act = _CA_STD[s]
        base = len(w) - len(s)
        if act == 1 and base >= p1:
            w, did_std = w[:base], True
        elif act == 2 and base >= p2:
            w, did_std = w[:base], True
        elif act == 3 and base >= p2:
            w, did_std = w[:base] + "log", True
        elif act == 4 and base >= p2:
            w, did_std = w[:base] + "ic", True
        elif act == 5 and base >= p1:
            w, did_std = w[:base] + "c", True
    if not did_std:
        s = _longest_suffix(w, _CA_VERB)
        if s is not None:
            act = _CA_VERB[s]
            base = len(w) - len(s)
            if act == 1 and base >= p1:
                w = w[:base]
            elif act == 2 and base >= p2:
                w = w[:base]

    s = _longest_suffix(w, _CA_RESIDUAL)
    if s is not None:
        act = _CA_RESIDUAL[s]
        base = len(w) - len(s)
        if base >= p1:
            w = w[:base] + ("ic" if act == 2 else "")
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Estonian — snowballstem.org/algorithms/estonian/stemmer.html
# (reference: org/tartarus/snowball/ext/EstonianStemmer.java)
# ---------------------------------------------------------------------------

_ET_V1 = "aeiouäõöü"          # vowels
_ET_RV = "aeiou"              # plain vowels
_ET_KI = "bdfghkpstzšž"       # consonants a ki- suffix attaches to
_ET_GI = "aceijlmnoqruvwxäõöü"  # letters a gi- suffix attaches to
_ET_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "õõ", "öö", "üü")

# irregular verb forms: whole word -> normalized stem
_ET_VERB_EXC = {
    "joob": "joo", "jood": "joo", "joodakse": "joo", "jooma": "joo",
    "joomata": "joo", "joome": "joo", "joon": "joo", "joote": "joo",
    "joovad": "joo", "juua": "joo", "juuakse": "joo", "jäi": "jääma",
    "jäid": "jääma", "jäime": "jääma", "jäin": "jääma", "jäite": "jääma",
    "jääb": "jääma", "jääd": "jääma", "jääda": "jääma",
    "jäädakse": "jääma", "jäädi": "jääma", "jääks": "jääma",
    "jääksid": "jääma", "jääksime": "jääma", "jääksin": "jääma",
    "jääksite": "jääma", "jääma": "jääma", "jäämata": "jääma",
    "jääme": "jääma", "jään": "jääma", "jääte": "jääma",
    "jäävad": "jääma", "jõi": "joo", "jõid": "joo", "jõime": "joo",
    "jõin": "joo", "jõite": "joo", "keeb": "keesi", "keed": "keesi",
    "keedakse": "keesi", "keeks": "keesi", "keeksid": "keesi",
    "keeksime": "keesi", "keeksin": "keesi", "keeksite": "keesi",
    "keema": "keesi", "keemata": "keesi", "keeme": "keesi",
    "keen": "keesi", "kees": "keesi", "keeta": "keesi", "keete": "keesi",
    "keevad": "keesi", "käia": "käisi", "käiakse": "käisi",
    "käib": "käisi", "käid": "käisi", "käidi": "käisi", "käiks": "käisi",
    "käiksid": "käisi", "käiksime": "käisi", "käiksin": "käisi",
    "käiksite": "käisi", "käima": "käisi", "käimata": "käisi",
    "käime": "käisi", "käin": "käisi", "käis": "käisi", "käite": "käisi",
    "käivad": "käisi", "laob": "ladu", "laod": "ladu", "laoks": "ladu",
    "laoksid": "ladu", "laoksime": "ladu", "laoksin": "ladu",
    "laoksite": "ladu", "laome": "ladu", "laon": "ladu", "laote": "ladu",
    "laovad": "ladu", "loeb": "luge", "loed": "luge", "loeks": "luge",
    "loeksid": "luge", "loeksime": "luge", "loeksin": "luge",
    "loeksite": "luge", "loeme": "luge", "loen": "luge", "loete": "luge",
    "loevad": "luge", "loob": "loo", "lood": "loo", "loodi": "loo",
    "looks": "loo", "looksid": "loo", "looksime": "loo",
    "looksin": "loo", "looksite": "loo", "looma": "loo",
    "loomata": "loo", "loome": "loo", "loon": "loo", "loote": "loo",
    "loovad": "loo", "luua": "loo", "luuakse": "loo", "lõi": "lõi",
    "lõid": "lõi", "lõime": "lõi", "lõin": "lõi", "lõite": "lõi",
    "lööb": "löö", "lööd": "löö", "löödakse": "löö", "löödi": "löö",
    "lööks": "löö", "lööksid": "löö", "lööksime": "löö",
    "lööksin": "löö", "lööksite": "löö", "lööma": "löö",
    "löömata": "löö", "lööme": "löö", "löön": "löö", "lööte": "löö",
    "löövad": "löö", "lüüa": "löö", "lüüakse": "löö", "müüa": "müüsi",
    "müüakse": "müüsi", "müüb": "müüsi", "müüd": "müüsi",
    "müüdi": "müüsi", "müüks": "müüsi", "müüksid": "müüsi",
    "müüksime": "müüsi", "müüksin": "müüsi", "müüksite": "müüsi",
    "müüma": "müüsi", "müümata": "müüsi", "müüme": "müüsi",
    "müün": "müüsi", "müüs": "müüsi", "müüte": "müüsi",
    "müüvad": "müüsi", "näeb": "nägi", "näed": "nägi", "näeks": "nägi",
    "näeksid": "nägi", "näeksime": "nägi", "näeksin": "nägi",
    "näeksite": "nägi", "näeme": "nägi", "näen": "nägi", "näete": "nägi",
    "näevad": "nägi", "nägema": "nägi", "nägemata": "nägi",
    "näha": "nägi", "nähakse": "nägi", "nähti": "nägi", "põeb": "põde",
    "põed": "põde", "põeks": "põde", "põeksid": "põde",
    "põeksime": "põde", "põeksin": "põde", "põeksite": "põde",
    "põeme": "põde", "põen": "põde", "põete": "põde", "põevad": "põde",
    "saab": "saa", "saad": "saa", "saada": "saa", "saadakse": "saa",
    "saadi": "saa", "saaks": "saa", "saaksid": "saa", "saaksime": "saa",
    "saaksin": "saa", "saaksite": "saa", "saama": "saa",
    "saamata": "saa", "saame": "saa", "saan": "saa", "saate": "saa",
    "saavad": "saa", "sai": "saa", "said": "saa", "saime": "saa",
    "sain": "saa", "saite": "saa", "sõi": "söö", "sõid": "söö",
    "sõime": "söö", "sõin": "söö", "sõite": "söö", "sööb": "söö",
    "sööd": "söö", "söödakse": "söö", "söödi": "söö", "sööks": "söö",
    "sööksid": "söö", "sööksime": "söö", "sööksin": "söö",
    "sööksite": "söö", "sööma": "söö", "söömata": "söö", "sööme": "söö",
    "söön": "söö", "sööte": "söö", "söövad": "söö", "süüa": "söö",
    "süüakse": "söö", "teeb": "tegi", "teed": "tegi", "teeks": "tegi",
    "teeksid": "tegi", "teeksime": "tegi", "teeksin": "tegi",
    "teeksite": "tegi", "teeme": "tegi", "teen": "tegi", "teete": "tegi",
    "teevad": "tegi", "tegema": "tegi", "tegemata": "tegi",
    "teha": "tegi", "tehakse": "tegi", "tehti": "tegi", "toob": "too",
    "tood": "too", "toodi": "too", "tooks": "too", "tooksid": "too",
    "tooksime": "too", "tooksin": "too", "tooksite": "too",
    "tooma": "too", "toomata": "too", "toome": "too", "toon": "too",
    "toote": "too", "toovad": "too", "tuua": "too", "tuuakse": "too",
    "tõi": "too", "tõid": "too", "tõime": "too", "tõin": "too",
    "tõite": "too", "viia": "viima", "viiakse": "viima", "viib": "viima",
    "viid": "viima", "viidi": "viima", "viiks": "viima",
    "viiksid": "viima", "viiksime": "viima", "viiksin": "viima",
    "viiksite": "viima", "viima": "viima", "viimata": "viima",
    "viime": "viima", "viin": "viima", "viisime": "viima",
    "viisin": "viima", "viisite": "viima", "viite": "viima",
    "viivad": "viima", "võib": "võisi", "võid": "võisi",
    "võida": "võisi", "võidakse": "võisi", "võidi": "võisi",
    "võiks": "võisi", "võiksid": "võisi", "võiksime": "võisi",
    "võiksin": "võisi", "võiksite": "võisi", "võima": "võisi",
    "võimata": "võisi", "võime": "võisi", "võin": "võisi",
    "võis": "võisi", "võite": "võisi", "võivad": "võisi",
}
# verb endings: 1 = delete, 2 = -> a, 3 = delete when a vowel precedes
_ET_VERB = {"da": 3, "mata": 1, "b": 3, "ksid": 1, "nuksid": 1, "me": 3,
            "sime": 1, "ksime": 1, "nuksime": 1, "akse": 2, "dakse": 1,
            "takse": 1, "site": 1, "ksite": 1, "nuksite": 1, "n": 3,
            "sin": 1, "ksin": 1, "nuksin": 1, "daks": 1, "taks": 1}

# special noun endings -> normalized form
_ET_SPECIAL_NOUN = {
    "lane": "lase", "lasse": "lase", "lasi": "lase", "last": "lase",
    "line": "lise", "lisse": "lise", "lisi": "lise", "list": "lise",
    "mine": "mise", "misse": "mise", "misi": "mise", "mist": "mise",
}

# case endings: 1 = delete after plain vowel or long vowel, 2 ('t') =
# delete when >= 4 chars precede
_ET_CASE = {"ga": 1, "ta": 1, "le": 1, "sse": 1, "l": 1, "s": 1,
            "ks": 1, "t": 2, "lt": 1, "st": 1}

_ET_PLURAL = {"d": 4, "sid": 2, "de": 4, "ikkude": 1, "ike": 1,
              "ikke": 1, "te": 3}

_ET_DEGREES = {"ma": 2, "mai": 1, "m": 1}


def _et_longv(w: str, end: int) -> bool:
    return end >= 2 and w[end - 2: end] in _ET_LONGV


def _et_p1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _ET_V1:
        i += 1
    if i >= n:
        return n
    i += 1
    while i < n and w[i] in _ET_V1:
        i += 1
    return i + 1 if i < n else n


def estonian_stem(word: str) -> str:
    """Estonian Snowball: whole-word irregular verbs short-circuit;
    otherwise gi/ki emphasis strip, verb endings OR the substantive
    battery (special nouns, case endings, plurals, degrees, i-plural,
    nu-participles), then kk/pp/tt undoubling before a final vowel."""
    exc = _ET_VERB_EXC.get(word)
    if exc is not None:
        return exc
    w = word
    p1 = _et_p1(w)

    # emphasis: -gi / -ki with >= 4 chars before, within R1
    s = _longest_suffix(w, ("gi", "ki"), p1)
    if s is not None:
        base = len(w) - 2
        if base >= 4:
            if s == "gi":
                if w[base - 1] in _ET_GI and not _et_longv(w, base):
                    w = w[:base]
            elif w[base - 1] in _ET_KI:
                w = w[:base]

    did_verb = False
    s = _longest_suffix(w, _ET_VERB, p1)
    if s is not None:
        act = _ET_VERB[s]
        base = len(w) - len(s)
        if act == 1:
            w, did_verb = w[:base], True
        elif act == 2:
            w, did_verb = w[:base] + "a", True
        elif base >= 1 and w[base - 1] in _ET_V1:
            w, did_verb = w[:base], True
    if not did_verb:
        # substantive battery, each rule independently once
        s = _longest_suffix(w, _ET_SPECIAL_NOUN, p1)
        if s is not None:
            w = w[: len(w) - len(s)] + _ET_SPECIAL_NOUN[s]
        s = _longest_suffix(w, _ET_CASE, p1)
        if s is not None:
            base = len(w) - len(s)
            if _ET_CASE[s] == 1:
                if (base >= 1 and w[base - 1] in _ET_RV) or \
                        _et_longv(w, base):
                    w = w[:base]
            elif base >= 4:
                w = w[:base]
        s = _longest_suffix(w, _ET_PLURAL, p1)
        if s is not None:
            act = _ET_PLURAL[s]
            base = len(w) - len(s)
            if act == 1:
                w = w[:base] + "iku"
            elif act == 2:
                if not _et_longv(w, base):
                    w = w[:base]
            elif act == 3:
                if base >= 4:
                    if w.endswith(("laste", "liste", "miste")):
                        w = w[:base] + "e"
                    elif w[base - 1] == "t":
                        pass  # t + te: leave for the t-stem
                    else:
                        w = w[:base]
                else:
                    w = w[:base] + "t"
            elif (base >= 1 and w[base - 1] in _ET_RV) or \
                    _et_longv(w, base):
                w = w[:base]
        s = _longest_suffix(w, _ET_DEGREES, p1)
        if s is not None:
            base = len(w) - len(s)
            if _ET_DEGREES[s] == 1:
                if base >= 1 and w[base - 1] in _ET_RV:
                    w = w[:base]
            else:
                w = w[:base]
        if (len(w) - 1 >= p1 and w.endswith("i")
                and len(w) >= 2 and w[-2] in _ET_RV):
            w = w[:-1]
        s = _longest_suffix(w, ("va", "du", "nu", "tu"), p1)
        if s is not None:
            w = w[: len(w) - 2]

    # undouble kk/pp/tt before a final vowel at/after R1
    if (len(w) >= 3 and w[-1] in _ET_V1 and len(w) - 1 >= p1
            and w[-3:-1] in ("kk", "pp", "tt")):
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Nepali — snowballstem.org/algorithms/nepali/stemmer.html
# (reference: org/tartarus/snowball/ext/NepaliStemmer.java)
# ---------------------------------------------------------------------------

# postpositions: 1 = always delete; 2 (का/कि/की/कै/को) = delete unless
# ए or े precedes
_NE_CAT1 = {"लाइ": 1, "लाई": 1, "सँग": 1, "संग": 1, "मार्फत": 1, "रत": 1,
            "का": 2, "मा": 1, "द्वारा": 1, "कि": 2, "पछि": 1, "की": 2,
            "ले": 1, "कै": 2, "सँगै": 1, "मै": 1, "को": 2}

# verb/tense endings, deleted repeatedly
_NE_CAT3 = (
    "थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ", "िन्छ",
    "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा", "इदा", "िदा",
    "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी", "देखी", "थी", "दी",
    "छु", "एछु", "ेछु", "नेछु", "नु", "हरु", "हरू", "छे", "थे", "ने",
    "एकै", "ेकै", "नेकै", "दै", "इदै", "िदै", "एको", "इएको", "िएको",
    "ेको", "नेको", "दो", "इदो", "िदो", "यो", "इयो", "भयो", "ियो",
    "थियो", "दियो", "थ्यो", "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ",
    "यौ", "थियौ", "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्", "ेछन्",
    "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्", "छस्",
    "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्", "छेस्",
    "होस्",
)


def nepali_stem(word: str) -> str:
    """Nepali Snowball: one postposition strip (category 1), then
    repeat {nasal/ai cleanup after specific stems (category 2), verb
    ending strip (category 3)} until no verb ending matches."""
    w = word
    s = _longest_suffix(w, _NE_CAT1)
    if s is not None:
        base = len(w) - len(s)
        if _NE_CAT1[s] == 1 or w[max(0, base - 1): base] not in ("ए", "े"):
            w = w[:base]
    while True:
        # category 2: ँ/ं after यौ/छौ/नौ/थे; ै after त्र
        if w.endswith(("ँ", "ं")):
            if w[-3:-1] in ("यौ", "छौ", "नौ", "थे"):
                w = w[:-1]
        elif w.endswith("ै") and w[-4:-1] == "त्र":
            w = w[:-1]
        s = _longest_suffix(w, _NE_CAT3)
        if s is None:
            break
        w = w[: len(w) - len(s)]
    return w


# ---------------------------------------------------------------------------
# Tamil — snowballstem.org/algorithms/tamil/stemmer.html
# (reference: org/tartarus/snowball/ext/TamilStemmer.java)
# Damodharan's algorithm: prefix strips (question/pronoun), then a
# battery of suffix rules (plural, question, um, common endings,
# vetrumai urupukal case markers, tense), with an ending-normalization
# fixpoint after most rules. Marks: ் = pulli (virama).
# ---------------------------------------------------------------------------

_TA_PULLI = "்"              # ்
_TA_AI = "ை"                 # ை

_TA_QUESTION_CONS = "கஙசஞதநபமயவ"   # after the எ question prefix
_TA_PRONOUN_V = "அஇஉ"              # pronoun prefix vowels
_TA_HARD_CONS = "கசடதபற"           # vallinam consonants
_TA_SOFT_CONS = "ஞணநனமயரலளழவ"      # mellinam/idaiyinam consonants
_TA_VOWEL_SIGNS = "ாிீுூெேை"
_TA_IND_VOWELS = "அஆஇஈஉஊஎஏஐஒஓஔ"

# fix_va_start rewrites (word-initial)
_TA_VA_START = {"வோ": "ஓ", "வொ": "ஒ", "வு": "உ", "வூ": "ஊ"}

# fix_ending among: suffix -> action
_TA_FIX = {"ந்த": 1, "ய": 1, "வ": 1, "ந்த்": 1, "ந்": 1, "வ்": 1,
           "ய்": 2, "ட்க்": 3, "ட்ப்": 3, "ற்க்": 4, "ன்ற்": 4,
           "ட்ட்": 5, "த்த்": 6, "ுக்": 7, "ுக்க்": 7, "ங்": 8,
           "னு": 9}

# common word endings: action 1 -> pulli, 2 (ல்ல) conditional -> pulli,
# 3 -> delete
_TA_COMMON = {"ென": 1, "ாகிய": 1, "ுடைய": 1, "ுள்ள": 1, "ாகி": 1,
              "ின்றி": 1, "ென்று": 1, "ுடை": 1, "ில்லை": 1, "ுடன்": 1,
              "ிடம்": 1, "ெனும்": 1, "ல்ல": 2,
              "பட்ட": 3, "பட்டண": 3, "தான": 3, "படிதான": 3, "குரிய": 3,
              "படி": 3, "பற்றி": 3, "படு": 3, "விடு": 3, "பட்டு": 3,
              "விட்டு": 3, "பட்டது": 3, "ெல்லாம்": 3}

# vetrumai urupukal (case markers)
_TA_VETRUMAI = {"னை": 1, "கண்": 1, "முன்": 1, "மேற்": 1, "மேல்": 1,
                "கீழ்": 1,
                "விட": 2, "ொடு": 2, "ோடு": 2, "ிருந்து": 2, "ின்று": 2,
                "ுடை": 2, "ிற்": 2, "ாமல்": 2, "ால்": 2, "ில்": 2,
                "ுள்": 2,
                "ின்": 3, "ிடம்": 4, "ல்": 5, "து": 6, "ீ": 7}

# tense suffixes
_TA_TENSE = {"க": 1, "த": 1, "ன": 1, "ப": 1, "ய": 1, "படு": 1,
             "ிற்று": 1, "னை": 1, "வை": 1, "னன்": 1, "பன்": 1,
             "னான்": 1, "மின்": 1, "னென்": 1, "னம்": 1, "பம்": 1,
             "கும்": 1, "தும்": 1, "றும்": 1, "னர்": 1, "பர்": 1,
             "வர்": 1, "னார்": 1, "மார்": 1, "கொண்டிர்": 1, "னள்": 1,
             "பள்": 1, "வள்": 1, "னாள்": 1,
             "வன்": 2, "து": 3, "ான்": 4,
             "ா": 5, "ேன்": 5, "ாம்": 5, "டும்": 5, "ெம்": 5, "ேம்": 5,
             "ோம்": 5, "ாய்": 5, "ீயர்": 5, "ார்": 5, "னிர்": 5,
             "ீர்": 5, "ாள்": 5,
             "கு": 6}

_TA_TENSE2 = ("கிற", "கின்ற", "ாநின்ற", "கிற்", "கின்ற்", "ாநின்ற்")


def _ta_fix_va_start(w: str) -> str:
    p = _longest_prefix(w, _TA_VA_START)
    return _TA_VA_START[p] + w[len(p):] if p is not None else w


def _ta_fix_ending(w: str, found_vetrumai: bool) -> "tuple[str, bool]":
    """One ending-normalization pass; returns (word, changed)."""
    if len(w) <= 3:
        return w, False
    s = _longest_suffix(w, _TA_FIX)
    if s is not None:
        act = _TA_FIX[s]
        base = len(w) - len(s)
        pre = w[base - 1: base]
        if act == 1:
            return w[:base], True
        if act == 2:
            if pre in "ிீை":     # ி ீ ை
                return w[:base], True
        elif act == 3:
            return w[:base] + "ள்", True
        elif act == 4:
            return w[:base] + "ல்", True
        elif act == 5:
            return w[:base] + "டு", True
        elif act == 6:
            if found_vetrumai and pre != _TA_AI:
                return w[:base] + "ம்", True
        elif act == 7:
            return w[:base] + _TA_PULLI, True
        elif act == 8:
            if pre not in _TA_VOWEL_SIGNS:
                return w[:base], True
        elif act == 9:
            if pre in (_TA_AI, _TA_PULLI):
                return w[:base], True
            return w[:base] + "ம்", True
        # a conditional case failed: fall through to the pulli rules
    if not w.endswith(_TA_PULLI):
        return w, False
    # trailing ் after consonant clusters
    if len(w) >= 2 and w[-2] in _TA_HARD_CONS:
        cut = 2
        if len(w) >= 4 and w[-3] == _TA_PULLI and w[-4] in _TA_HARD_CONS:
            cut = 4
        return w[:-cut], True
    if (len(w) >= 3 and w[-2] in _TA_SOFT_CONS
            and w[-3] == _TA_PULLI):
        return w[:-2], True
    if len(w) >= 2 and (w[-2] in _TA_VOWEL_SIGNS or w[-2] == _TA_PULLI):
        return w[:-1], True
    return w, False


def _ta_fix_endings(w: str, found_vetrumai: bool) -> str:
    while True:
        w, changed = _ta_fix_ending(w, found_vetrumai)
        if not changed:
            return w


def tamil_stem(word: str) -> str:
    """Tamil Snowball (Damodharan): see the per-rule comments; each
    rule runs once in the published order, tense suffixes to fixpoint."""
    w, _ = _ta_fix_ending(word, False)
    if len(w) <= 4:
        return w

    # question prefix: எ + consonant + ்
    if (len(w) >= 3 and w[0] == "எ" and w[1] in _TA_QUESTION_CONS
            and w[2] == _TA_PULLI):
        w = _ta_fix_va_start(w[3:])
    # pronoun prefix: அ/இ/உ + consonant + ்
    if (len(w) >= 3 and w[0] in _TA_PRONOUN_V
            and w[1] in _TA_QUESTION_CONS and w[2] == _TA_PULLI):
        w = _ta_fix_va_start(w[3:])

    # question suffixes ா/ே/ோ -> ்
    if len(w) > 4:
        if w[-1] in "ாேோ":
            w = w[:-1] + _TA_PULLI
        w = _ta_fix_endings(w, False)

    # ும் -> ்
    if len(w) > 4 and w.endswith("ும்"):
        w = w[:-3] + _TA_PULLI
        w, _ = _ta_fix_ending(w, False)

    # common word endings
    if len(w) > 4:
        s = _longest_suffix(w, _TA_COMMON)
        if s is not None:
            act = _TA_COMMON[s]
            base = len(w) - len(s)
            if act == 1:
                w = w[:base] + _TA_PULLI
                w = _ta_fix_endings(w, False)
            elif act == 2:
                if w[base - 1: base] not in _TA_VOWEL_SIGNS:
                    w = w[:base] + _TA_PULLI
                    w = _ta_fix_endings(w, False)
            else:
                w = w[:base]
                w = _ta_fix_endings(w, False)

    # vetrumai urupukal (case markers)
    found_vetrumai = False
    if len(w) > 4:
        done = False
        s = _longest_suffix(w, _TA_VETRUMAI)
        if s is not None:
            act = _TA_VETRUMAI[s]
            base = len(w) - len(s)
            pre = w[base - 1: base]
            if act == 1:
                w, done = w[:base], True
            elif act == 2:
                w, done = w[:base] + _TA_PULLI, True
            elif act == 3:
                if pre != "ம":
                    w, done = w[:base] + _TA_PULLI, True
            elif act == 4:
                if len(w) >= 7:
                    w, done = w[:base] + _TA_PULLI, True
            elif act == 5:
                if pre not in _TA_VOWEL_SIGNS:
                    w, done = w[:base] + _TA_PULLI, True
            elif act == 6:
                if pre not in _TA_VOWEL_SIGNS:
                    w, done = w[:base], True
            else:
                w, done = w[:base] + "ி", True
        if not done and w.endswith(_TA_AI):
            pre = w[-2:-1]
            if pre not in _TA_HARD_CONS or (
                    len(w) >= 3 and w[-3] == _TA_PULLI):
                w, done = w[:-1] + _TA_PULLI, True
        if done:
            found_vetrumai = True
            if w.endswith("ின்"):
                w = w[:-3] + _TA_PULLI
            w = _ta_fix_endings(w, found_vetrumai)

    # plural suffixes (no min-length gate in the reference)
    s = _longest_suffix(w, ("கள்", "ுங்கள்", "ட்கள்", "ற்கள்"))
    if s is not None:
        base = len(w) - len(s)
        if s == "ுங்கள்":
            if w[base - 1: base] in _TA_HARD_CONS:
                w = w[:base] + "ுங்"
            else:
                w = w[:base] + _TA_PULLI
        elif s == "ற்கள்":
            w = w[:base] + "ல்"
        elif s == "ட்கள்":
            w = w[:base] + "ள்"
        else:
            w = w[:base]

    # command suffixes பி/வி
    if len(w) > 4 and w.endswith(("பி", "வி")):
        w = w[:-2]

    # tense suffixes, to fixpoint
    while len(w) > 4:
        matched = False
        s = _longest_suffix(w, _TA_TENSE)
        if s is not None:
            act = _TA_TENSE[s]
            base = len(w) - len(s)
            pre = w[base - 1: base]
            if act == 1:
                w, matched = w[:base], True
            elif act == 2:
                if pre not in _TA_IND_VOWELS:
                    w, matched = w[:base], True
            elif act == 3:
                if pre not in _TA_VOWEL_SIGNS:
                    w, matched = w[:base], True
            elif act == 4:
                if pre != "ச":
                    w, matched = w[:base] + _TA_PULLI, True
            elif act == 5:
                w, matched = w[:base] + _TA_PULLI, True
            elif pre == _TA_PULLI:
                w, matched = w[:base], True
        s = _longest_suffix(w, _TA_TENSE2)
        if s is not None:
            w, matched = w[: len(w) - len(s)], True
        w = _ta_fix_endings(w, found_vetrumai)
        if not matched:
            break
    return w


def tamil_chain(word: str) -> str:
    """TamilAnalyzer chain core (ta/TamilAnalyzer.java:121): NFC
    composition covers the IndicNormalizationFilter's canonical Tamil
    split-vowel rules (e.g. ெ+ா -> ொ) ahead of the
    Snowball stemmer."""
    import unicodedata

    return tamil_stem(unicodedata.normalize("NFC", word))


# ---------------------------------------------------------------------------
# Polish — snowballstem.org/algorithms/polish/stemmer.html
# (reference: org/tartarus/snowball/ext/PolishStemmer.java; the stempel
# statistical stemmer is the pl module's other engine — this is the
# Snowball one, PolishSnowballAnalyzer role)
# ---------------------------------------------------------------------------

_PL_VOWELS = "aeiouyóąę"

# conditional clitic (deleted first, within R1)
_PL_CLITIC = ("byście", "bym", "by", "byśmy", "byś")

# main inflection endings: 1 = delete, 2 = -> s, 3 = delete in R1 else
# -> s, 4 = -> ł, 5 = delete then try the secondary participle strip
_PL_MAIN = {
    "ąca": 1, "ająca": 1, "sza": 1, "iejsza": 1, "ała": 1, "iała": 1,
    "iła": 1, "ąc": 1, "ając": 1, "ące": 1, "ające": 1, "cie": 1,
    "acie": 1, "ecie": 1, "icie": 1, "ajcie": 1, "aliście": 1,
    "ieliście": 1, "iliście": 1, "ałyście": 1, "iałyście": 1,
    "iłyście": 1, "sze": 1, "iejsze": 1, "ali": 1, "ieli": 1, "ili": 1,
    "aj": 1, "am": 1, "ałam": 1, "iałam": 1, "iłam": 1, "ałem": 1,
    "iałem": 1, "iłem": 1, "ało": 1, "iało": 1, "iło": 1, "amy": 1,
    "emy": 1, "imy": 1, "aliśmy": 1, "ieliśmy": 1, "iliśmy": 1,
    "ałyśmy": 1, "iałyśmy": 1, "iłyśmy": 1, "ały": 1, "iały": 1,
    "iły": 1, "asz": 1, "esz": 1, "isz": 1, "ącą": 1, "ającą": 1,
    "ają": 1, "iejszą": 1, "ać": 1, "ieć": 1, "ić": 1, "ąć": 1,
    "aść": 1, "eść": 1, "ę": 1, "ał": 1, "iał": 1, "ił": 1, "ałaś": 1,
    "iałaś": 1, "iłaś": 1, "ałeś": 1, "iałeś": 1, "iłeś": 1,
    "sząca": 2, "szące": 2, "szącą": 2, "szę": 2,
    "szą": 3,
    "liście": 4, "łyście": 4, "liśmy": 4, "łyśmy": 4, "łaś": 4,
    "łeś": 4,
    "ich": 5, "ych": 5, "imi": 5, "ymi": 5, "ej": 5, "iej": 5, "im": 5,
    "ym": 5, "ego": 5, "iego": 5, "emu": 5, "iemu": 5, "y": 5,
}

# secondary participle/comparative strip after a case-5 deletion
_PL_SECONDARY = {"ąc": 1, "ając": 1, "sz": 1, "iejsz": 1, "sząc": 2}

# word-final palatal consonant normalization
_PL_FINAL = {"ć": "c", "ń": "n", "ś": "s", "ź": "z"}


def polish_stem(word: str) -> str:
    """Polish Snowball: clitic strip (R1), one main inflection ending
    (floor 2), optional secondary strip after -ych/-ego/... deletions;
    when no ending matches, normalize a final palatal consonant."""
    w = word
    n = len(w)
    i = 0
    p1 = n
    while i < n and w[i] not in _PL_VOWELS:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in _PL_VOWELS:
            i += 1
        if i < n:
            p1 = i + 1

    ended = False
    if len(w) >= 2:
        s = _longest_suffix(w, _PL_CLITIC, p1)
        if s is not None:
            w = w[: len(w) - len(s)]
        s = _longest_suffix(w, _PL_MAIN, 2)
        if s is not None:
            act = _PL_MAIN[s]
            base = len(w) - len(s)
            if act == 1:
                w = w[:base]
            elif act == 2:
                w = w[:base] + "s"
            elif act == 3:
                w = w[:base] if base >= p1 else w[:base] + "s"
            elif act == 4:
                w = w[:base] + "ł"
            else:
                w = w[:base]
                s2 = _longest_suffix(w, _PL_SECONDARY, 2)
                if s2 is not None:
                    w = (w[: len(w) - len(s2)]
                         + ("s" if _PL_SECONDARY[s2] == 2 else ""))
            ended = True
    if not ended and len(w) >= 2 and w[-1] in _PL_FINAL:
        w = w[:-1] + _PL_FINAL[w[-1]]
    return w


# ---------------------------------------------------------------------------
# Esperanto — snowballstem.org/algorithms/esperanto/stemmer.html
# (reference: org/tartarus/snowball/ext/EsperantoStemmer.java, generated
# from esperanto.sbl; fresh implementation of the published algorithm)
# ---------------------------------------------------------------------------

_EO_DIGRAPH = {"cx": "ĉ", "gx": "ĝ", "hx": "ĥ",
               "jx": "ĵ", "sx": "ŝ", "ux": "ŭ"}
_EO_ACCENT = {"á": "a", "é": "e", "í": "i",
              "ó": "o", "ú": "u"}
_EO_FOREIGN_CHARS = set("qwxy")
_EO_PRONOUNS = ("ci", "gi", "hi", "li", "ili", "ŝli", "mi", "ni",
                "oni", "ri", "si", "vi", "ivi", "ĝi", "ŝi",
                "iŝi", "malŝi")
_EO_APOS_ADVERBS = ("amb", "bald", "malbald", "morg", "postmorg", "adi",
                    "hodi", "ank", "ĉirk", "tutĉirk", "presk",
                    "almen", "apen", "hier", "antaŭhier", "malgr",
                    "ankor", "kontr", "anstat", "kvaz")
_EO_UNINFLECTED = ("aha", "haha", "haleluja", "hola", "hosana", "maltra",
                   "hura", "ĥaĥa", "ekde", "elde", "disde",
                   "ehe", "maltre", "dirlididi", "malpli", "malĉi",
                   "malkaj", "amen", "tamen", "oho", "maltro", "minus",
                   "uhu", "muu")
_EO_CORR_PREFIX = ("k", "kelk", "nen", "t", "mult", "samt", "ĉ")
_EO_NUM_LOW = ("tri", "du", "unu")
_EO_NUM_HIGH = ("dek", "cent")
_EO_UJN_BASE = ("aliu", "unu")
_EO_VERB_ENDS = ("as", "i", "is", "os", "u", "us")
# grammatical endings; j/n/jn only strip after '-' or a digit
_EO_SUFFIXES = ("a", "e", "i", "j", "aj", "oj", "n", "an", "en", "jn",
                "ajn", "ojn", "on", "o", "as", "is", "os", "us", "u")


def _eo_canonical(w: str) -> "tuple[str, bool]":
    """x-digraphs to circumflexed letters; accented vowels and q/w/x/y
    mark the word foreign (a '-' resets the flag)."""
    out = []
    foreign = False
    i, n = 0, len(w)
    while i < n:
        two = w[i:i + 2]
        c = w[i]
        if two in _EO_DIGRAPH:
            out.append(_EO_DIGRAPH[two])
            i += 2
            continue
        if c == "-":
            foreign = False
        elif c in _EO_ACCENT:
            c = _EO_ACCENT[c]
            foreign = True
        elif c in _EO_FOREIGN_CHARS:
            foreign = True
        out.append(c)
        i += 1
    return "".join(out), foreign


def _eo_anchored(w: str, end: int) -> bool:
    """Suffix [end:] sits at word start or right after '-'."""
    return end == 0 or w[end - 1] == "-"


def _eo_is_correlative(w: str) -> bool:
    """ki-/ti-/i-/ĉi-/neni- table words in any case: optional prefix,
    'i', then e | [aou] j? n? (both branches allow trailing 'n')."""
    for branch in ("e", "aou"):
        i = len(w)
        if i and w[i - 1] == "n":
            i -= 1
        if branch == "e":
            if not (i and w[i - 1] == "e"):
                continue
            i -= 1
        else:
            if i and w[i - 1] == "j":
                i -= 1
            if not (i and w[i - 1] in "aou"):
                continue
            i -= 1
        if not (i and w[i - 1] == "i"):
            continue
        i -= 1
        s = _longest_suffix(w[:i], _EO_CORR_PREFIX)
        if s is not None:
            i -= len(s)
        if _eo_anchored(w, i):
            return True
    return False


def esperanto_stem(word: str) -> str:
    """Esperanto Snowball stemmer. Grammar endings (-o/-a/-e/-j/-n,
    verb tenses) strip after canonicalizing x-digraphs; pronouns,
    correlatives, merged numerals and interjections are left whole;
    words flagged foreign (q/w/x/y, accented vowels) are not stemmed.
    On any abort the ORIGINAL token is returned (SnowballFilter keeps
    the input term when stem() reports failure)."""
    w, foreign = _eo_canonical(word)
    if foreign:
        return word
    # 'st[as|i|is|os|u|us] -> est...: restore the elided initial e
    if w.startswith("'st") and w[3:] in _EO_VERB_ENDS:
        w = "e" + w[1:]
    # pronouns (with optional accusative -n) are never stemmed
    base = w[:-1] if w.endswith("n") else w
    s = _longest_suffix(base, _EO_PRONOUNS)
    if s is not None and _eo_anchored(base, len(base) - len(s)):
        return word
    # final apostrophe: l' -> la, un' -> unu, adverb' -> ...aŭ, else -o
    if w.endswith("'"):
        if w == "l'":
            w = "la"
        elif w == "un'":
            w = "unu"
        else:
            s = _longest_suffix(w[:-1], _EO_APOS_ADVERBS)
            if s is not None and _eo_anchored(w, len(w) - 1 - len(s)):
                w = w[:-1] + "aŭ"
            else:
                w = w[:-1] + "o"
    if _eo_is_correlative(w):
        return word
    s = _longest_suffix(w, _EO_UNINFLECTED)
    if s is not None and _eo_anchored(w, len(w) - len(s)):
        return word
    low = _longest_suffix(w, _EO_NUM_LOW)
    if low is not None and _longest_suffix(
            w[: len(w) - len(low)], _EO_NUM_HIGH) is not None:
        return word
    i = len(w)
    if i and w[i - 1] == "n":
        i -= 1
    if i and w[i - 1] == "j":
        i -= 1
    s = _longest_suffix(w[:i], _EO_UJN_BASE)
    if s is not None and _eo_anchored(w, i - len(s)):
        return word
    # long-word gate: >= 2 plain vowels, or an interior '-', or a digit
    nv = sum(1 for c in w if c in "aeiou")
    if not (nv >= 2 or "-" in w[1:] or any(c.isdigit() for c in w)):
        return word
    s = _longest_suffix(w, _EO_SUFFIXES)
    if s is None:
        return word
    end = len(w) - len(s)
    if s in ("j", "n", "jn") and not (
            end and (w[end - 1] == "-" or w[end - 1].isdigit())):
        return word
    if end and w[end - 1] == "-":
        end -= 1
    return w[:end]


# ---------------------------------------------------------------------------
# Yiddish — snowballstem.org/algorithms/yiddish/stemmer.html
# (reference: org/tartarus/snowball/ext/YiddishStemmer.java, generated from
# yiddish.sbl; fresh implementation of the published algorithm)
# ---------------------------------------------------------------------------

_YI_VOWELS = set("אויעױײ")  # א ו י ע ױ ײ
_YI_CONSONANTS = set(
    "בגדהזחט"       # ב ג ד ה ז ח ט
    "ךכלםמןנ"       # ך כ ל ם מ ן נ
    "ספףצץקר"       # ס פ ף צ ץ ק ר
    "שתװ")                              # ש ת װ
_YI_NIKED = set("ְֱֲֳִֵֶַ"
                "ָֹֻּֿׁׂ")
_YI_FINAL = {"ך": "כ", "ם": "מ", "ן": "נ",
             "ף": "פ", "ץ": "צ"}
# digraph -> (ligature, blocking nikud following the pair)
_YI_DIGRAPH = {"וו": ("װ", "ּ"),
               "וי": ("ױ", "ִ"),
               "יי": ("ײ", "ִ")}

_YI_PREFIXES = (
    "אדורכ", "אהינ", "אהער", "אהײמ", "אומ", "אונטער", "איבער", "אנ",
    "אנט", "אנטקעגנ", "אנידער", "אפ", "אפיר", "אקעגנ", "אראפ", "ארומ",
    "ארונטער", "אריבער", "ארױס", "ארױפ", "ארײנ", "אװעק", "אױס", "אױפ",
    "אײנ", "בא", "בײ", "דורכ", "דער", "מיט", "נאכ", "פאר", "פארבײ",
    "פארױס", "פונאנדער", "צו", "צוזאמענ", "צונױפ", "צוריק", "צע")
_YI_CLUSTERS = ("דזש", "שטר", "שטש", "שפר")

# strong-verb participle stems -> base (shared by the ...ענ and ...נ maps)
_YI_STRONG = {
    "קליב": "קלײב", "ריב": "רײב", "טריב": "טרײב", "שריב": "שרײב",
    "הױב": "הײב", "שװיג": "שװײג", "גאנג": "גײ", "זונג": "זינג",
    "שלונג": "שלינג", "צװונג": "צװינג", "בױג": "בײג", "בונד": "בינד",
    "װיז": "װײז", "ביט": "בײט", "ליט": "לײט", "מיט": "מײד",
    "שניט": "שנײד", "נומ": "נעמ", "שטאנ": "שטײ", "ביס": "בײס",
    "שמיס": "שמײס", "ריס": "רײס", "טרונק": "טרינק",
    "פארלױר": "פארליר", "שװױר": "שװער", "װוטש": "װיטש"}

# main suffix table: suffix -> action.  'del' = delete in R1; 'T' = the
# ge...t participle family (delete in R1 else keep a bare ט, then the
# irregular בראכ -> ברענג); ('stem', base) = delete + strong-verb
# replacement; other strings = unconditional replacement; None = protected
# (longest match blocks shorter suffixes, no change)
_YI_SUF = {
    "ונג": "del", "סטו": "del", "ט": "del", "בראכט": "ברענג",
    "סט": "del", "יסט": "IST", "עט": "del", "שאפט": "del",
    "הײט": "del", "קײט": "del", "יקײט": "del", "לעכ": "del",
    "עלעכ": "del", "יזמ": "del", "ימ": "del", "עמ": "del",
    "ענעמ": "EN", "טענעמ": "T", "נ": "del",
    "קליבנ": "קלײב", "ריבנ": "רײב", "טריבנ": "טרײב", "שריבנ": "שרײב",
    "הױבנ": "הײב", "שװיגנ": "שװײג", "זונגנ": "זינג", "שלונגנ": "שלינג",
    "צװונגנ": "צװינג", "בױגנ": "בײג", "בונדנ": "בינד", "װיזנ": "װײז",
    "טנ": "T", "GEביטנ": "בײט", "GEליטנ": "לײט", "GEמיטנ": "מײד",
    "שניטנ": "שנײד", "סטנ": "del", "יסטנ": "del", "עטנ": "del",
    "GEביסנ": "בײס", "שמיסנ": "שמײס", "GEריסנ": "רײס", "ענ": "del",
    "גאנגענ": "גײ", "עלענ": "del", "נומענ": "נעמ", "יזמענ": "del",
    "שטאנענ": "שטײ", "טרונקנ": "טרינק", "פארלױרנ": "פארליר",
    "שװױרנ": "שװער", "װוטשנ": "װיטש", "גײנ": "גײ",
    "ס": "del", "טס": "T", "עטס": "del", "נס": "del", "טנס": "T",
    "ענס": "EN", "עס": "del", "יעס": "יע", "עלעס": "del", "ערס": "del",
    "ענערס": "del", "ע": "del", "טע": "T", "סטע": "del", "עטע": "del",
    "יע": None, "עלע": "del", "ענע": "EN", "טענע": "T", "ער": "del",
    "טער": "T", "סטער": "del", "עטער": "del", "ענער": "EN",
    "טענער": "T", "ות": "HEY"}
_YI_SUF2 = {"ונג": 1, "שאפט": 1, "הײט": 1, "קײט": 1, "יקײט": 1, "ל": 2}
_YI_SUF3 = {"יג": 1, "יק": 1, "דיק": 1, "נדיק": 1, "ענדיק": 1,
            "בליק": 0, "גליק": 0, "ניק": 1, "יש": 1}


def _yi_prelude(w: str) -> str:
    """Fold double-vav/vav-yod/yod-yod to ligatures (unless a nikud marks
    them as separate), normalize final letter forms, drop nikud points."""
    out = []
    i, n = 0, len(w)
    while i < n:
        two = w[i:i + 2]
        c = w[i]
        if two in _YI_DIGRAPH:
            lig, block = _YI_DIGRAPH[two]
            if w[i + 2:i + 3] != block:
                out.append(lig)
                i += 2
                continue
        out.append(_YI_FINAL.get(c, c))
        i += 1
    return "".join(ch for ch in out if ch not in _YI_NIKED)


def _yi_mark(w: str) -> int:
    """p1 per the published region rule: verbal prefixes גע/צו rewrite to
    ASCII GE/TSU markers first (done by the caller); here compute p1 =
    after an initial consonant cluster, after three consonants, or after
    the first vowel run — never earlier than prefix + 3."""
    raise NotImplementedError  # folded into yiddish_stem for cursor fidelity


def yiddish_stem(word: str) -> str:
    """Yiddish Snowball stemmer: nikud/ligature normalization, GE/TSU
    verbal-prefix marking, plural/diminutive/inflection suffix removal
    with strong-verb participle restoration, then marker removal."""
    w = _yi_prelude(word)
    # --- mark_regions: prefix rewrites + p1 ---
    cursor = 0
    if w.startswith("גע"):
        rest = w[2:]
        if not (rest.startswith("לט") or rest.startswith("בנ")
                or rest == ""):
            w = "GE" + rest
            cursor = 2
    pfx = _longest_prefix(w[cursor:], _YI_PREFIXES)
    if pfx is not None:
        after = cursor + len(pfx)
        rest = w[after:]
        if rest in ("צוגנ", "צוקט", "צוקנ"):
            cursor = after
        elif rest.startswith("געבנ"):
            cursor = after
        elif rest.startswith("גע"):
            w = w[:after] + "GE" + w[after + 2:]
            cursor = after + 2
        elif rest.startswith("צו"):
            w = w[:after] + "TSU" + w[after + 2:]
            cursor = after + 3
        # else: prefix not followed by a verbal marker -> no rewrite,
        # cursor stays (the reference restores to the pre-prefix cursor)
    p1 = len(w)
    x = cursor + 3
    if x <= len(w):
        c = cursor
        cl = _longest_prefix(w[c:], _YI_CLUSTERS)
        if cl is not None:
            c += len(cl)
        if (len(w) - c >= 3
                and all(ch in _YI_CONSONANTS for ch in w[c:c + 3])):
            p1 = c + 3
        else:
            while c < len(w) and w[c] not in _YI_VOWELS:
                c += 1
            if c < len(w):
                c += 1
                while c < len(w) and w[c] in _YI_VOWELS:
                    c += 1
                if c < len(w):
                    p1 = max(c, x)
    # --- standard_suffix ---
    s = _longest_suffix(w, _YI_SUF)
    if s is not None:
        act = _YI_SUF[s]
        base = len(w) - len(s)
        in_r1 = base >= p1
        if act == "del":
            if in_r1:
                w = w[:base]
        elif act == "EN":
            if in_r1:
                w = w[:base]
                st = _longest_suffix(w, _YI_STRONG)
                if st is not None:
                    w = w[: len(w) - len(st)] + _YI_STRONG[st]
        elif act == "T":
            w = w[:base] if in_r1 else w[:base] + "ט"
            tail = w[: len(w) - 1] if not in_r1 else w
            if tail.endswith("בראכ"):
                cut = len(tail) - 4
                if tail[:cut].endswith("גע"):
                    cut -= 2
                w = tail[:cut] + "ברענג" + ("ט" if not in_r1 else "")
        elif act == "IST":  # יסט
            if base and w[base - 1] in ("ג", "ש"):
                if base + 3 >= p1:  # R1plus3
                    w = w[:base] + "יס"
            elif in_r1:
                w = w[:base]
        elif act == "HEY":  # ות -> ה
            if in_r1:
                w = w[:base] + "ה"
        elif act is None:
            pass  # protected (יע)
        else:  # unconditional replacement (strong forms, בראכט)
            w = w[:base] + act
    s = _longest_suffix(w, _YI_SUF2)
    if s is not None:
        base = len(w) - len(s)
        if base >= p1:
            if _YI_SUF2[s] == 1:
                w = w[:base]
            elif base and w[base - 1] in _YI_CONSONANTS:
                w = w[:base]
    s = _longest_suffix(w, _YI_SUF3)
    if s is not None:
        base = len(w) - len(s)
        if _YI_SUF3[s] == 1 and base >= p1:
            w = w[:base]
    return w.replace("GE", "").replace("TSU", "")
