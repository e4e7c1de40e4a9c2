"""Snowball stemmers for the top crawl languages (en Porter2, de, fr,
es, pt, it, nl, ru, sv, no, da + round 5: ro, fi, hu, tr).

Fresh Python implementations of the published Snowball algorithms
(M.F. Porter, snowballstem.org algorithm descriptions) — the role of the
reference's generated ``SnowballFilter`` chain
(lucene/analysis/common/src/java/org/apache/lucene/analysis/snowball/
SnowballFilter.java:48, generated stemmers under
org/tartarus/snowball/ext/). NOT a port of the generated Java: each
stemmer is written from the algorithm's published step structure
(R1/R2/RV regions, longest-suffix dispatch per step).

Like Porter in :mod:`lucene_ray.analysis.stem`, these run per UNIQUE
token (vocabulary-mapped in ``batch._apply_token_filters``), so per-call
Python cost never touches the per-occurrence hot path.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared region machinery
# ---------------------------------------------------------------------------


def _r_after_nonvowel_after_vowel(w: str, vowels: str, start: int = 0) -> int:
    """Index after the first non-vowel following a vowel, scanning from
    ``start``; len(w) if none — the standard R1/R2 definition."""
    n = len(w)
    i = start
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    # w[i] is the first non-vowel after a vowel (or end)
    return min(i + 1, n) if i < n else n


def _r1_r2(w: str, vowels: str) -> tuple[int, int]:
    r1 = _r_after_nonvowel_after_vowel(w, vowels)
    r2 = _r_after_nonvowel_after_vowel(w, vowels, r1)
    return r1, r2


def _rv_romance(w: str, vowels: str) -> int:
    """RV of the Romance stemmers (es/pt/it): if the second letter is a
    consonant, RV is after the next vowel; if the first two letters are
    vowels, RV is after the next consonant; otherwise (C-V) RV is after
    the third letter; end of word if those positions don't exist."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


class _Ctx:
    """Suffix-stripping helper bound to one word's R1/R2/RV offsets
    (offsets stay valid while we only ever REMOVE from the end)."""

    def __init__(self, w: str, r1: int, r2: int, rv: int):
        self.w = w
        self.r1, self.r2, self.rv = r1, r2, rv

    def in_r1(self, suf: str) -> bool:
        return len(self.w) - len(suf) >= self.r1

    def in_r2(self, suf: str) -> bool:
        return len(self.w) - len(suf) >= self.r2

    def in_rv(self, suf: str) -> bool:
        return len(self.w) - len(suf) >= self.rv

    def ends(self, *sufs: str) -> str | None:
        """Longest of ``sufs`` that the word ends with (None if none)."""
        best = None
        for s in sufs:
            if self.w.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        return best

    def drop(self, k: int) -> None:
        self.w = self.w[: len(self.w) - k]

    def replace(self, suf: str, rep: str) -> None:
        self.w = self.w[: len(self.w) - len(suf)] + rep


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def german_stem(word: str) -> str:
    """Snowball German stemmer (snowballstem.org/algorithms/german/;
    reference org/tartarus/snowball/ext/GermanStemmer.java role)."""
    w = word.replace("ß", "ss")
    # u/y between vowels are consonants: mark uppercase
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    vowels = _DE_VOWELS
    r1, r2 = _r1_r2(w, vowels)
    r1 = max(r1, 3 if len(w) >= 3 else len(w))  # R1 starts at 3 minimum
    c = _Ctx(w, r1, r2, 0)

    # step 1
    s = c.ends("ern", "em", "er")
    if s and c.in_r1(s):
        c.drop(len(s))
    else:
        s = c.ends("en", "es", "e")
        if s and c.in_r1(s):
            c.drop(len(s))
            if c.w.endswith("niss"):  # Nisse/nisses → nis
                c.drop(1)
        elif c.w.endswith("s") and c.in_r1("s") and len(c.w) >= 2 \
                and c.w[-2] in _DE_S_END:
            c.drop(1)

    # step 2
    s = c.ends("est", "en", "er")
    if s and c.in_r1(s):
        c.drop(len(s))
    elif c.w.endswith("st") and c.in_r1("st") and len(c.w) >= 6 \
            and c.w[-3] in _DE_ST_END:
        c.drop(2)

    # step 3 (d-suffixes)
    s = c.ends("end", "ung")
    if s:
        if c.in_r2(s):
            c.drop(len(s))
            if c.w.endswith("ig") and c.in_r2("ig") and not c.w.endswith("eig"):
                c.drop(2)
    else:
        s = c.ends("isch", "ik", "ig")
        if s:
            if c.in_r2(s) and not c.w[: len(c.w) - len(s)].endswith("e"):
                c.drop(len(s))
        else:
            s = c.ends("lich", "heit")
            if s:
                if c.in_r2(s):
                    c.drop(len(s))
                    s2 = c.ends("er", "en")
                    if s2 and c.in_r1(s2):
                        c.drop(2)
            else:
                if c.w.endswith("keit") and c.in_r2("keit"):
                    c.drop(4)
                    s2 = c.ends("lich", "ig")
                    if s2 and c.in_r2(s2):
                        c.drop(len(s2))

    out = c.w.lower()
    return (out.replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Snowball Dutch stemmer (snowballstem.org/algorithms/dutch/)."""
    w = word
    for a, b in (("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"), ("ü", "u"),
                 ("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")):
        w = w.replace(a, b)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        elif chars[i] == "i" and chars[i - 1] in _NL_VOWELS \
                and i + 1 < len(chars) and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)
    r1, r2 = _r1_r2(w, _NL_VOWELS)
    r1 = max(r1, 3 if len(w) >= 3 else len(w))
    c = _Ctx(w, r1, r2, 0)

    def valid_en_ending() -> bool:
        # preceded by a non-vowel, and not the word "gem"
        base = c.w
        return (len(base) >= 1 and base[-1] not in _NL_VOWELS
                and not base.endswith("gem"))

    # step 1
    s = c.ends("heden")
    if s and c.in_r1(s):
        c.replace("heden", "heid")
    else:
        s = c.ends("ene", "en")
        if s and c.in_r1(s):
            base = c.w[: len(c.w) - len(s)]
            if base and base[-1] not in _NL_VOWELS and not base.endswith("gem"):
                c.drop(len(s))
                c.w = _nl_undouble(c.w)
        else:
            s = c.ends("se", "s")
            if s and c.in_r1(s):
                base = c.w[: len(c.w) - len(s)]
                if base and base[-1] not in _NL_VOWELS and base[-1] != "j":
                    c.drop(len(s))

    # step 2: final e after non-vowel
    e_removed = False
    if c.w.endswith("e") and c.in_r1("e") and len(c.w) >= 2 \
            and c.w[-2] not in _NL_VOWELS:
        c.drop(1)
        e_removed = True
        c.w = _nl_undouble(c.w)

    # step 3a: heid
    if c.w.endswith("heid") and c.in_r2("heid") \
            and (len(c.w) < 5 or c.w[-5] != "c"):
        c.drop(4)
        if c.w.endswith("en") and c.in_r1("en"):
            base = c.w[:-2]
            if base and base[-1] not in _NL_VOWELS and not base.endswith("gem"):
                c.drop(2)
                c.w = _nl_undouble(c.w)

    # step 3b: d-suffixes
    s = c.ends("end", "ing")
    if s and c.in_r2(s):
        c.drop(3)
        if c.w.endswith("ig") and c.in_r2("ig") and not c.w.endswith("eig"):
            c.drop(2)
        else:
            c.w = _nl_undouble(c.w)
    elif c.w.endswith("ig") and c.in_r2("ig") and not c.w.endswith("eig"):
        c.drop(2)
    elif c.w.endswith("lijk") and c.in_r2("lijk"):
        c.drop(4)
        if c.w.endswith("e") and c.in_r1("e") and len(c.w) >= 2 \
                and c.w[-2] not in _NL_VOWELS:
            c.drop(1)
            c.w = _nl_undouble(c.w)
    elif c.w.endswith("baar") and c.in_r2("baar"):
        c.drop(4)
    elif c.w.endswith("bar") and c.in_r2("bar") and e_removed:
        c.drop(3)

    # step 4: undouble vowel — C v v D with D a non-I consonant
    w = c.w
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]
    return w.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _es_deaccent(w: str) -> str:
    for a, b in (("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")):
        w = w.replace(a, b)
    return w


_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
            "me", "se", "la", "le", "lo")
# the exact published step-2b suffix set (snowballstem.org/algorithms/
# spanish/ — conditional/imperfect/preterite/participle/infinitive
# paradigms); longest-match dispatch makes order irrelevant
_ES_STEP2B = (
    "arían arías arán arás aríais aría aréis aríamos aremos ará aré "
    "erían erías erán erás eríais ería eréis eríamos eremos erá eré "
    "irían irías irán irás iríais iría iréis iríamos iremos irá iré "
    "aba ada ida ía ara iera ad ed id ase iese aste iste an aban ían "
    "aran ieran asen iesen aron ieron ado ido ando iendo ió ar er ir "
    "as abas adas idas ías aras ieras ases ieses ís áis abais íais "
    "arais ierais aseis ieseis asteis isteis ados idos amos ábamos "
    "íamos imos áramos iéramos iésemos ásemos en es éis emos".split()
)


def spanish_stem(word: str) -> str:
    """Snowball Spanish stemmer (snowballstem.org/algorithms/spanish/)."""
    w = word
    r1, r2 = _r1_r2(w, _ES_VOWELS)
    rv = _rv_romance(w, _ES_VOWELS)
    c = _Ctx(w, r1, r2, rv)

    # step 0: attached pronoun
    p = c.ends(*_ES_PRON)
    if p:
        base = c.w[: len(c.w) - len(p)]
        bc = _Ctx(base, r1, r2, rv)
        a = bc.ends("iéndo", "ándo", "ár", "ér", "ír")
        if a and bc.in_rv(a):
            c.w = _es_deaccent(base)
        else:
            a = bc.ends("iendo", "ando", "ar", "er", "ir")
            if a and bc.in_rv(a):
                c.w = base
            elif base.endswith("yendo") and "uyendo" in base[-6:]:
                c.w = base

    changed_len = len(c.w)

    # step 1: standard suffixes
    s = c.ends("amientos", "imientos", "amiento", "imiento", "anzas",
               "ismos", "ables", "ibles", "istas", "anza", "icos", "icas",
               "ismo", "able", "ible", "ista", "osos", "osas", "ico",
               "ica", "oso", "osa")
    if s and c.in_r2(s):
        c.drop(len(s))
    else:
        s = c.ends("aciones", "adoras", "adores", "ancias", "adora",
                   "ación", "antes", "ancia", "ador", "ante")
        if s and c.in_r2(s):
            c.drop(len(s))
            if c.w.endswith("ic") and c.in_r2("ic"):
                c.drop(2)
        else:
            s = c.ends("logías", "logía")
            if s and c.in_r2(s):
                c.replace(s, "log")
            else:
                s = c.ends("uciones", "ución")
                if s and c.in_r2(s):
                    c.replace(s, "u")
                else:
                    s = c.ends("encias", "encia")
                    if s and c.in_r2(s):
                        c.replace(s, "ente")
                    elif c.w.endswith("amente") and c.in_r1("amente"):
                        c.drop(6)
                        if c.w.endswith("iv") and c.in_r2("iv"):
                            c.drop(2)
                            if c.w.endswith("at") and c.in_r2("at"):
                                c.drop(2)
                        else:
                            s2 = c.ends("os", "ic", "ad")
                            if s2 and c.in_r2(s2):
                                c.drop(2)
                    elif c.w.endswith("mente") and c.in_r2("mente"):
                        c.drop(5)
                        s2 = c.ends("ante", "able", "ible")
                        if s2 and c.in_r2(s2):
                            c.drop(len(s2))
                    else:
                        s = c.ends("idades", "idad")
                        if s and c.in_r2(s):
                            c.drop(len(s))
                            s2 = c.ends("abil", "ic", "iv")
                            if s2 and c.in_r2(s2):
                                c.drop(len(s2))
                        else:
                            s = c.ends("ivas", "ivos", "iva", "ivo")
                            if s and c.in_r2(s):
                                c.drop(len(s))
                                if c.w.endswith("at") and c.in_r2("at"):
                                    c.drop(2)

    # step 2a: verb suffixes beginning y (only if step 1 did nothing)
    if len(c.w) == changed_len:
        s = c.ends("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
                   "yes", "ya", "ye", "yo", "yó")
        if s and c.in_rv(s) and len(c.w) > len(s) \
                and c.w[len(c.w) - len(s) - 1] == "u":
            c.drop(len(s))

    # step 2b (if still unchanged)
    if len(c.w) == changed_len:
        s = c.ends(*_ES_STEP2B)
        if s and c.in_rv(s):
            if s in ("en", "es", "éis", "emos"):
                c.drop(len(s))
                if c.w.endswith("gu"):
                    c.drop(1)
            else:
                c.drop(len(s))

    # step 3: residual
    s = c.ends("os", "a", "o", "á", "í", "ó")
    if s and c.in_rv(s):
        c.drop(len(s))
    else:
        s = c.ends("e", "é")
        if s and c.in_rv(s):
            c.drop(len(s))
            if c.w.endswith("gu") and c.in_rv("u"):
                c.drop(1)

    return _es_deaccent(c.w)


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP2 = (
    "aríamos eríamos iríamos ássemos êssemos íssemos aríeis eríeis "
    "iríeis ásseis ésseis ísseis áramos éramos íramos ávamos aremos "
    "eremos iremos ariam eriam iriam assem essem issem ara~o era~o "
    "ira~o arias erias irias ardes erdes irdes asses esses isses astes "
    "estes istes áreis areis éreis ereis íreis ireis áveis íamos armos "
    "ermos irmos aria eria iria asse esse isse aste este iste arei erei "
    "irei aram eram iram avam arem erem irem ando endo indo adas idas "
    "arás aras erás eras irás avas ares eres ires ados idos amos "
    "emos imos iras ada ida ará ara erá era irá ava iam ado ido ias ais "
    "iais ia ei am em ar er ir as es is eu iu ou".split()
)


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese stemmer
    (snowballstem.org/algorithms/portuguese/)."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _r1_r2(w, _PT_VOWELS)
    rv = _rv_romance(w, _PT_VOWELS)
    c = _Ctx(w, r1, r2, rv)
    n0 = len(c.w)

    # step 1: standard suffixes
    s = c.ends("amentos", "imentos", "amento", "imento", "ismos", "istas",
               "ezas", "icos", "icas", "osos", "osas", "eza", "ico", "ica",
               "oso", "osa", "ável", "ível", "ismo", "ista")
    if s and c.in_r2(s):
        c.drop(len(s))
    else:
        s = c.ends("aço~es", "adoras", "adores", "ância", "aça~o",
                   "adora", "antes", "ador", "ante")
        if s and c.in_r2(s):
            c.drop(len(s))
            if c.w.endswith("ic") and c.in_r2("ic"):
                c.drop(2)
        else:
            s = c.ends("logias", "logia")
            if s and c.in_r2(s):
                c.replace(s, "log")
            else:
                s = c.ends("uço~es", "uça~o")
                if s and c.in_r2(s):
                    c.replace(s, "u")
                else:
                    s = c.ends("ências", "ência")
                    if s and c.in_r2(s):
                        c.replace(s, "ente")
                    elif c.w.endswith("amente") and c.in_r1("amente"):
                        c.drop(6)
                        if c.w.endswith("iv") and c.in_r2("iv"):
                            c.drop(2)
                            if c.w.endswith("at") and c.in_r2("at"):
                                c.drop(2)
                        else:
                            s2 = c.ends("os", "ic", "ad")
                            if s2 and c.in_r2(s2):
                                c.drop(2)
                    elif c.w.endswith("mente") and c.in_r2("mente"):
                        c.drop(5)
                        s2 = c.ends("ante", "avel", "ível")
                        if s2 and c.in_r2(s2):
                            c.drop(len(s2))
                    else:
                        s = c.ends("idades", "idade")
                        if s and c.in_r2(s):
                            c.drop(len(s))
                            s2 = c.ends("abil", "ic", "iv")
                            if s2 and c.in_r2(s2):
                                c.drop(len(s2))
                        else:
                            s = c.ends("ivas", "ivos", "iva", "ivo")
                            if s and c.in_r2(s):
                                c.drop(len(s))
                                if c.w.endswith("at") and c.in_r2("at"):
                                    c.drop(2)
                            else:
                                s = c.ends("iras", "ira")
                                if s and c.in_rv(s) and \
                                        c.w[: len(c.w) - len(s)].endswith("e"):
                                    c.replace(s, "ir")

    step1_changed = len(c.w) != n0

    # step 2: verb suffixes (only if step 1 did nothing)
    step2_changed = False
    if not step1_changed:
        s = c.ends(*_PT_STEP2)
        if s and c.in_rv(s):
            c.drop(len(s))
            step2_changed = True

    # step 3
    if (step1_changed or step2_changed) and c.w.endswith("i") \
            and c.in_rv("i") and len(c.w) >= 2 and c.w[-2] == "c":
        c.drop(1)

    # step 4: residual suffix (only if steps 1 and 2 both did nothing)
    if not (step1_changed or step2_changed):
        s = c.ends("os", "a", "i", "o", "á", "í", "ó")
        if s and c.in_rv(s):
            c.drop(len(s))

    # step 5
    s = c.ends("e", "é", "ê")
    if s and c.in_rv(s):
        c.drop(len(s))
        if (c.w.endswith("gu") and c.in_rv("u")) or \
                (c.w.endswith("ci") and c.in_rv("i")):
            c.drop(1)
    elif c.w.endswith("ç"):
        c.replace("ç", "c")

    return c.w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"

_IT_PRON = ("gliela", "gliele", "glieli", "glielo", "gliene", "sene",
            "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
            "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
            "vele", "veli", "velo", "vene", "gli", "ci", "la", "le", "li",
            "lo", "mi", "ne", "si", "ti", "vi")
_IT_STEP2 = (
    "erebbero irebbero assero assimo eranno eremmo ereste eresti essero "
    "iranno iremmo ireste iresti iscano iscono issero arono avamo avano "
    "avate eremo erete erono evamo evano evate iremo irete irono ivamo "
    "ivano ivate ammo ando asse assi emmo enda ende endi endo erai erei "
    "Yamo iamo immo irai irei isca isce isci isco ano are ata ate ati "
    "ato ava avi avo erà ere erò ete eva evi evo irà ire irò ita ite iti "
    "ito iva ivi ivo ono uta ute uti uto ar ir".split()
)


def italian_stem(word: str) -> str:
    """Snowball Italian stemmer (snowballstem.org/algorithms/italian/)."""
    w = word
    for a, b in (("á", "à"), ("é", "è"), ("í", "ì"), ("ó", "ò"), ("ú", "ù")):
        w = w.replace(a, b)
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif chars[i] in "ui" and chars[i - 1] in _IT_VOWELS \
                and i + 1 < len(chars) and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1_r2(w, _IT_VOWELS)
    rv = _rv_romance(w, _IT_VOWELS)
    c = _Ctx(w, r1, r2, rv)

    # step 0: attached pronoun
    p = c.ends(*_IT_PRON)
    if p:
        base = c.w[: len(c.w) - len(p)]
        bc = _Ctx(base, r1, r2, rv)
        a = bc.ends("ando", "endo")
        if a and bc.in_rv(a):
            c.w = base
        else:
            a = bc.ends("ar", "er", "ir")
            if a and bc.in_rv(a):
                c.w = base + "e"

    n0 = len(c.w)

    # step 1: standard suffixes
    s = c.ends("atrice", "atrici", "abile", "abili", "ibile", "ibili",
               "mente", "anza", "anze", "iche", "ichi", "ismo", "ismi",
               "ista", "iste", "isti", "istà", "istè", "istì", "ante",
               "anti", "ico", "ici", "ica", "ice", "oso", "osi", "osa",
               "ose")
    if s and c.in_r2(s):
        c.drop(len(s))
    else:
        s = c.ends("azione", "azioni", "atore", "atori")
        if s and c.in_r2(s):
            c.drop(len(s))
            if c.w.endswith("ic") and c.in_r2("ic"):
                c.drop(2)
        else:
            s = c.ends("logia", "logie")
            if s and c.in_r2(s):
                c.replace(s, "log")
            else:
                s = c.ends("uzione", "uzioni", "usione", "usioni")
                if s and c.in_r2(s):
                    c.replace(s, "u")
                else:
                    s = c.ends("enza", "enze")
                    if s and c.in_r2(s):
                        c.replace(s, "ente")
                    else:
                        s = c.ends("amento", "amenti", "imento", "imenti")
                        if s and c.in_rv(s):
                            c.drop(len(s))
                        elif c.w.endswith("amente") and c.in_r1("amente"):
                            c.drop(6)
                            if c.w.endswith("iv") and c.in_r2("iv"):
                                c.drop(2)
                                if c.w.endswith("at") and c.in_r2("at"):
                                    c.drop(2)
                            else:
                                s2 = c.ends("os", "ic", "abil")
                                if s2 and c.in_r2(s2):
                                    c.drop(len(s2))
                        elif c.w.endswith("ità") and c.in_r2("ità"):
                            c.drop(3)
                            s2 = c.ends("abil", "ic", "iv")
                            if s2 and c.in_r2(s2):
                                c.drop(len(s2))
                        else:
                            s = c.ends("ivo", "ivi", "iva", "ive")
                            if s and c.in_r2(s):
                                c.drop(len(s))
                                if c.w.endswith("at") and c.in_r2("at"):
                                    c.drop(2)
                                    if c.w.endswith("ic") and c.in_r2("ic"):
                                        c.drop(2)

    # step 2: verb suffixes (only if step 1 did nothing)
    if len(c.w) == n0:
        s = c.ends(*_IT_STEP2)
        if s and c.in_rv(s):
            c.drop(len(s))

    # step 3a: final vowel
    s = c.ends("a", "e", "i", "o", "à", "è", "ì", "ò")
    if s and c.in_rv(s):
        c.drop(1)
        if c.w.endswith("i") and c.in_rv("i"):
            c.drop(1)
    # step 3b
    s = c.ends("ch", "gh")
    if s and c.in_rv(s):
        c.drop(1)

    return c.w.replace("U", "u").replace("I", "i")


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"

_FR_STEP2A = (
    "issaIent issantes issante issants issions issions îtes îmes issais "
    "issait issant issent issiez issons iraIent irions issais irais "
    "irait irent iriez irons iront irait isses issez irez iras irai ira "
    "isse ies ir is ît ie i".split()
)
_FR_STEP2B_ER = (
    "eraIent erions èrent erais erait eriez erons eront erai eras erez "
    "ées era iez ée és er ez é".split()
)
_FR_STEP2B_A = (
    "assions assent asses antes aIent asse ants ante âtes âmes ais ait "
    "ant ât as ai a".split()
)


def french_stem(word: str) -> str:
    """Snowball French stemmer (snowballstem.org/algorithms/french/)."""
    w = word
    chars = list(w)
    n = len(chars)
    for i in range(n):
        ch = chars[i]
        prev_v = i > 0 and chars[i - 1].lower() in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1].lower() in _FR_VOWELS
        if ch in "ui" and prev_v and next_v:
            chars[i] = ch.upper()
        elif ch == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif ch == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)

    vowels = _FR_VOWELS
    # RV: after third letter if starts with two vowels or with par/col/tap;
    # else after the first vowel not at position 0
    n = len(w)
    if n >= 3 and ((w[0].lower() in vowels and w[1].lower() in vowels)
                   or w[:3] in ("par", "col", "tap")):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if w[i].lower() in vowels:
                rv = i + 1
                break
    r1, r2 = _r1_r2(w.lower(), vowels)
    c = _Ctx(w, r1, r2, rv)
    n0 = len(c.w)

    # ---- step 1: standard suffixes ----
    did_mentions = False  # 'ment'-family deletions count as a change
    s = c.ends("issements", "issement", "atrices", "atrice", "ateurs",
               "ations", "logies", "usions", "utions", "ements", "amment",
               "emment", "ments", "ances", "iqUes", "ismes", "ables",
               "istes", "ateur", "ation", "logie", "usion", "ution",
               "ences", "ement", "euses", "ment", "ance", "iqUe", "isme",
               "able", "iste", "ence", "ités", "ives", "eaux", "euse",
               "aux", "eux", "ité", "ive", "ifs", "if")
    if s:
        if s in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                 "iqUes", "ismes", "ables", "istes"):
            if c.in_r2(s):
                c.drop(len(s))
        elif s in ("atrice", "ateur", "ation", "atrices", "ateurs",
                   "ations"):
            if c.in_r2(s):
                c.drop(len(s))
                if c.w.endswith("ic"):
                    if c.in_r2("ic"):
                        c.drop(2)
                    else:
                        c.replace("ic", "iqU")
        elif s in ("logie", "logies"):
            if c.in_r2(s):
                c.replace(s, "log")
        elif s in ("usion", "ution", "usions", "utions"):
            if c.in_r2(s):
                c.replace(s, "u")
        elif s in ("ence", "ences"):
            if c.in_r2(s):
                c.replace(s, "ent")
        elif s in ("ement", "ements"):
            if c.in_rv(s):
                c.drop(len(s))
                if c.w.endswith("iv") and c.in_r2("iv"):
                    c.drop(2)
                    if c.w.endswith("at") and c.in_r2("at"):
                        c.drop(2)
                elif c.w.endswith("eus"):
                    if c.in_r2("eus"):
                        c.drop(3)
                    elif c.in_r1("eus"):
                        c.replace("eus", "eux")
                elif c.w.endswith(("abl", "iqU")):
                    if c.in_r2(c.w[-3:]):
                        c.drop(3)
                elif c.w.endswith(("ièr", "Ièr")):
                    if c.in_rv(c.w[-3:]):
                        c.replace(c.w[-3:], "i")
        elif s in ("ité", "ités"):
            if c.in_r2(s):
                c.drop(len(s))
                if c.w.endswith("abil"):
                    if c.in_r2("abil"):
                        c.drop(4)
                    else:
                        c.replace("abil", "abl")
                elif c.w.endswith("ic"):
                    if c.in_r2("ic"):
                        c.drop(2)
                    else:
                        c.replace("ic", "iqU")
                elif c.w.endswith("iv") and c.in_r2("iv"):
                    c.drop(2)
        elif s in ("if", "ive", "ifs", "ives"):
            if c.in_r2(s):
                c.drop(len(s))
                if c.w.endswith("at") and c.in_r2("at"):
                    c.drop(2)
                    if c.w.endswith("ic"):
                        if c.in_r2("ic"):
                            c.drop(2)
                        else:
                            c.replace("ic", "iqU")
        elif s == "eaux":
            c.replace("eaux", "eau")
        elif s == "aux":
            if c.in_r1(s):
                c.replace("aux", "al")
        elif s in ("euse", "euses"):
            if c.in_r2(s):
                c.drop(len(s))
            elif c.in_r1(s):
                c.replace(s, "eux")
        elif s in ("issement", "issements"):
            if c.in_r1(s) and len(c.w) > len(s) \
                    and c.w[len(c.w) - len(s) - 1].lower() not in vowels:
                c.drop(len(s))
        elif s == "amment":
            if c.in_rv(s):
                c.replace(s, "ant")
                did_mentions = True
        elif s == "emment":
            if c.in_rv(s):
                c.replace(s, "ent")
                did_mentions = True
        elif s in ("ment", "ments"):
            k = len(c.w) - len(s)
            if k >= 1 and c.w[k - 1].lower() in vowels and k - 1 >= rv:
                c.drop(len(s))
                did_mentions = True

    step1_changed = (len(c.w) != n0) or did_mentions

    # ---- step 2a: verb suffixes beginning i ----
    done2 = False
    if not step1_changed or did_mentions:
        s = c.ends(*_FR_STEP2A)
        if s and c.in_rv(s):
            k = len(c.w) - len(s)
            if k >= 1 and c.w[k - 1].lower() not in vowels and k - 1 >= rv \
                    and c.w[k - 1] != "H":
                c.drop(len(s))
                done2 = True
        # ---- step 2b ----
        if not done2:
            s = c.ends("ions")
            if s and c.in_r2(s):
                c.drop(4)
                done2 = True
            else:
                s = c.ends(*_FR_STEP2B_ER)
                if s and c.in_rv(s):
                    c.drop(len(s))
                    done2 = True
                else:
                    s = c.ends(*_FR_STEP2B_A)
                    if s and c.in_rv(s):
                        c.drop(len(s))
                        done2 = True
                        if c.w.endswith("e") and c.in_rv("e"):
                            c.drop(1)

    changed = step1_changed or done2

    # ---- step 3 (if a change was made) / step 4 (if not) ----
    if changed:
        if c.w.endswith("Y"):
            c.replace("Y", "i")
        elif c.w.endswith("ç"):
            c.replace("ç", "c")
    else:
        # step 4
        if c.w.endswith("s") and len(c.w) >= 2 \
                and c.w[-2].lower() not in "aiouès":
            c.drop(1)
        if c.w.endswith("ion") and c.in_r2("ion") and len(c.w) >= 4 \
                and c.w[-4] in "st":
            c.drop(3)
        else:
            s = c.ends("ière", "Ière", "ier", "Ier")
            if s and c.in_rv(s):
                c.replace(s, "i")
            elif c.w.endswith("e") and c.in_rv("e"):
                c.drop(1)

    # ---- step 5: undouble ----
    if c.w.endswith(("enn", "onn", "ett", "ell", "eill")):
        c.drop(1)

    # ---- step 6: un-accent ----
    w = c.w
    i = len(w) - 1
    seen_cons = False
    while i >= 0:
        if w[i].lower() in vowels:
            if w[i] in "éè" and seen_cons:
                w = w[:i] + "e" + w[i + 1:]
            break
        seen_cons = True
        i -= 1
    return w.replace("U", "u").replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PGERUND_1 = ("вшись", "вши", "в")           # require preceding а/я
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые",
           "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их",
           "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")      # require preceding а/я
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло",
              "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_RU_VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
              "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
              "ишь", "ует", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
              "ят", "ит", "ыт", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию",
            "ья", "ия", "ью", "ев", "ов", "ие", "ье", "еи", "ии", "ей",
            "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях", "ы", "ь",
            "ю", "я", "а", "е", "и", "й", "о", "у")


def russian_stem(word: str) -> str:
    """Snowball Russian stemmer (snowballstem.org/algorithms/russian/);
    every step operates inside RV (the region after the first vowel)."""
    w = word.replace("ё", "е")
    n = len(w)
    rv = n
    for i, ch in enumerate(w):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _r1_r2(w, _RU_VOWELS)
    c = _Ctx(w, r1, r2, rv)

    def ends_rv(sufs, require_ay: bool = False) -> "str | None":
        best = None
        for s in sufs:
            if not c.w.endswith(s) or not c.in_rv(s):
                continue
            if require_ay:
                k = len(c.w) - len(s)
                if k < 1 or c.w[k - 1] not in "ая":
                    continue
            if best is None or len(s) > len(best):
                best = s
        return best

    # step 1: perfective gerund, else (reflexive; adjectival | verb | noun)
    s = ends_rv(_RU_PGERUND_2) or ends_rv(_RU_PGERUND_1, require_ay=True)
    if s:
        c.drop(len(s))
    else:
        s = ends_rv(("ся", "сь"))
        if s:
            c.drop(len(s))
        s = ends_rv(_RU_ADJ)
        if s:
            c.drop(len(s))
            s2 = ends_rv(_RU_PART_2) or ends_rv(_RU_PART_1, require_ay=True)
            if s2:
                c.drop(len(s2))
        else:
            s = ends_rv(_RU_VERB_2) or ends_rv(_RU_VERB_1, require_ay=True)
            if s:
                c.drop(len(s))
            else:
                s = ends_rv(_RU_NOUN)
                if s:
                    c.drop(len(s))

    # step 2: final и
    if c.w.endswith("и") and c.in_rv("и"):
        c.drop(1)
    # step 3: derivational ость/ост in R2
    s = c.ends("ость", "ост")
    if s and c.in_r2(s):
        c.drop(len(s))
    # step 4: нн undouble | superlative ейш(е) then нн | final ь
    if c.w.endswith("нн"):
        c.drop(1)
    else:
        s = c.ends("ейше", "ейш")
        if s and c.in_rv(s):
            c.drop(len(s))
            if c.w.endswith("нн"):
                c.drop(1)
        if c.w.endswith("ь") and c.in_rv("ь"):
            c.drop(1)
    return c.w


# ---------------------------------------------------------------------------
# Swedish / Norwegian / Danish (shared Scandinavian shape)
# ---------------------------------------------------------------------------

def _scand_r1(w: str, vowels: str) -> int:
    r1 = _r_after_nonvowel_after_vowel(w, vowels)
    return max(r1, 3 if len(w) >= 3 else len(w))


_SV_VOWELS = "aeiouyäåö"
_SV_STEP1 = ("heterna", "hetens", "arnas", "ernas", "ornas", "anden",
             "heten", "heter", "andes", "arens", "arna", "erna", "orna",
             "ande", "arne", "aste", "aren", "ades", "erns", "andet",
             "ade", "are", "ern", "ens", "het", "ast", "ad", "en", "ar",
             "er", "or", "as", "es", "at", "a", "e")
_SV_S_END = "bcdfghjklmnoprtvy"


def swedish_stem(word: str) -> str:
    """Snowball Swedish stemmer (snowballstem.org/algorithms/swedish/)."""
    w = word
    r1 = _scand_r1(w, _SV_VOWELS)
    c = _Ctx(w, r1, len(w), 0)
    s = c.ends(*_SV_STEP1)
    if s and c.in_r1(s):
        c.drop(len(s))
    elif c.w.endswith("s") and c.in_r1("s") and len(c.w) >= 2 \
            and c.w[-2] in _SV_S_END:
        c.drop(1)
    for pair in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if c.w.endswith(pair) and c.in_r1(pair[-1]):
            c.drop(1)
            break
    s = c.ends("lig", "els", "ig")
    if s and c.in_r1(s):
        c.drop(len(s))
    elif c.w.endswith("löst") and c.in_r1("löst"):
        c.drop(1)  # löst -> lös
    elif c.w.endswith("fullt") and c.in_r1("fullt"):
        c.drop(1)  # fullt -> full
    return c.w


_NO_VOWELS = "aeiouyæåø"
_NO_STEP1 = ("hetenes", "hetene", "hetens", "heten", "heter", "endes",
             "enes", "edes", "erte", "ede", "ande", "ende", "ane", "ene",
             "ens", "ers", "ets", "het", "ast", "ert", "en", "ar", "er",
             "as", "es", "et", "a", "e")
_NO_S_END = "bcdfghjlmnoprtvyz"


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian stemmer
    (snowballstem.org/algorithms/norwegian/)."""
    w = word
    r1 = _scand_r1(w, _NO_VOWELS)
    c = _Ctx(w, r1, len(w), 0)
    s = c.ends(*_NO_STEP1)
    if s and c.in_r1(s):
        if s in ("erte", "ert"):
            c.replace(s, "er")
        else:
            c.drop(len(s))
    elif c.w.endswith("s") and c.in_r1("s") and len(c.w) >= 2 \
            and (c.w[-2] in _NO_S_END
                 or (c.w[-2] == "k" and (len(c.w) < 3
                                         or c.w[-3] not in _NO_VOWELS))):
        c.drop(1)
    for pair in ("dt", "vt"):
        if c.w.endswith(pair) and c.in_r1("t"):
            c.drop(1)
            break
    s = c.ends("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig",
               "lig", "els", "lov", "ig")
    if s and c.in_r1(s):
        c.drop(len(s))
    return c.w


_DA_VOWELS = "aeiouyæåø"
_DA_STEP1 = ("erendes", "erende", "hedens", "ethed", "erede", "heden",
             "heder", "endes", "ernes", "erens", "erets", "ered", "ende",
             "erne", "eren", "erer", "heds", "enes", "eres", "eret",
             "hed", "ene", "ere", "ens", "ers", "ets", "en", "er", "es",
             "et", "e")
_DA_S_END = "abcdfghjklmnoprtvyzå"


def danish_stem(word: str) -> str:
    """Snowball Danish stemmer (snowballstem.org/algorithms/danish/)."""
    w = word
    r1 = _scand_r1(w, _DA_VOWELS)
    c = _Ctx(w, r1, len(w), 0)
    s = c.ends(*_DA_STEP1)
    if s and c.in_r1(s):
        c.drop(len(s))
    elif c.w.endswith("s") and c.in_r1("s") and len(c.w) >= 2 \
            and c.w[-2] in _DA_S_END:
        c.drop(1)
    # step 2: consonant-cluster tails
    for pair in ("gd", "dt", "gt", "kt"):
        if c.w.endswith(pair) and c.in_r1(pair[-1]):
            c.drop(1)
            break
    # step 3
    if c.w.endswith("igst"):
        c.drop(2)
    s = c.ends("elig", "lig", "els", "ig")
    if s and c.in_r1(s):
        c.drop(len(s))
        for pair in ("gd", "dt", "gt", "kt"):  # repeat step 2
            if c.w.endswith(pair) and c.in_r1(pair[-1]):
                c.drop(1)
                break
    elif c.w.endswith("løst"):
        c.drop(1)
    # step 4: undouble a final double consonant in R1
    if len(c.w) >= 2 and c.w[-1] == c.w[-2] \
            and c.w[-1] not in _DA_VOWELS and c.in_r1(c.w[-1]):
        c.drop(1)
    return c.w


STEMMERS = {
    "de": german_stem,
    "nl": dutch_stem,
    "es": spanish_stem,
    "pt": portuguese_stem,
    "it": italian_stem,
    "fr": french_stem,
    "ru": russian_stem,
    "sv": swedish_stem,
    "no": norwegian_stem,
    "da": danish_stem,
}


def snowball_stem(term: str, lang: str) -> str:
    """Dispatch to the language's Snowball stemmer; unknown language is
    identity (the analyzer routes only configured languages here)."""
    fn = STEMMERS.get(lang)
    return fn(term) if fn else term


# ---------------------------------------------------------------------------
# English (Porter2 — the SnowballFilter("English") algorithm, distinct
# from the 1980 Porter in analysis/stem.py)
# ---------------------------------------------------------------------------

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = "cdeghkmnrt"
_EN_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTIONS2 = frozenset((
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed"))


def _en_is_short_syllable(w: str, i: int) -> bool:
    """Short syllable at index i (the vowel's index)."""
    if i == 0:
        return (len(w) >= 2 and w[0] in _EN_VOWELS
                and w[1] not in _EN_VOWELS)
    return (0 < i < len(w) - 1 and w[i] in _EN_VOWELS
            and w[i + 1] not in _EN_VOWELS and w[i + 1] not in "wxY"
            and w[i - 1] not in _EN_VOWELS)


def _en_is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _en_is_short_syllable(w, len(w) - 2)


def english_stem(word: str) -> str:
    """Snowball English / Porter2
    (snowballstem.org/algorithms/english/) — the algorithm behind the
    reference's SnowballFilter("English"); differs from the 1980 Porter
    (analysis/stem.py) in R-regions, the li-rule and short-word
    handling."""
    w = word
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EN_EXCEPTIONS:
        return _EN_EXCEPTIONS[w]
    # y after vowel (or initial) is a consonant: mark Y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)

    r1 = None
    for pref in ("gener", "commun", "arsen"):
        if w.startswith(pref):
            r1 = len(pref)
            break
    if r1 is None:
        r1 = _r_after_nonvowel_after_vowel(w, _EN_VOWELS)
    r2 = _r_after_nonvowel_after_vowel(w, _EN_VOWELS, r1)
    c = _Ctx(w, r1, r2, 0)

    # step 0: trailing apostrophe forms
    s = c.ends("'s'", "'s", "'")
    if s:
        c.drop(len(s))

    # step 1a
    if c.w.endswith("sses"):
        c.drop(2)
    elif c.w.endswith(("ied", "ies")):
        # -> i when preceded by more than one letter, else -> ie
        c.replace(c.w[-3:], "i" if len(c.w) > 4 else "ie")
    elif c.w.endswith(("us", "ss")):
        pass
    elif c.w.endswith("s"):
        if any(ch in _EN_VOWELS for ch in c.w[:-2]):
            c.drop(1)

    if c.w in _EN_EXCEPTIONS2:
        return c.w.replace("Y", "y")

    # step 1b
    s = c.ends("eedly", "eed")
    if s:
        if c.in_r1(s):
            c.replace(s, "ee")
    else:
        s = c.ends("ingly", "edly", "ing", "ed")
        if s and any(ch in _EN_VOWELS
                     for ch in c.w[: len(c.w) - len(s)]):
            c.drop(len(s))
            if c.w.endswith(("at", "bl", "iz")):
                c.w += "e"
            elif c.w.endswith(_EN_DOUBLES):
                c.drop(1)
            elif _en_is_short(c.w, c.r1):
                c.w += "e"

    # step 1c: y -> i after a non-vowel that is not the first letter
    if c.w.endswith(("y", "Y")) and len(c.w) > 2 \
            and c.w[-2] not in _EN_VOWELS:
        c.replace(c.w[-1], "i")

    # step 2 (in R1)
    for suf, rep in (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    ):
        if c.w.endswith(suf):
            if c.in_r1(suf):
                c.replace(suf, rep)
            break
    else:
        if c.w.endswith("ogi"):
            if c.in_r1("ogi") and len(c.w) >= 4 and c.w[-4] == "l":
                c.drop(1)
        elif c.w.endswith("li"):
            if c.in_r1("li") and len(c.w) >= 3 and c.w[-3] in _EN_LI_END:
                c.drop(2)

    # step 3 (in R1; ative needs R2)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    ):
        if c.w.endswith(suf):
            if c.in_r1(suf):
                c.replace(suf, rep)
            break
    else:
        if c.w.endswith("ative") and c.in_r2("ative"):
            c.drop(5)

    # step 4 (in R2)
    for suf in ("ement", "ance", "ence", "able", "ible", "ment", "ant",
                "ent", "ism", "ate", "iti", "ous", "ive", "ize", "al",
                "er", "ic"):
        if c.w.endswith(suf):
            if c.in_r2(suf):
                c.drop(len(suf))
            break
    else:
        if c.w.endswith("ion") and c.in_r2("ion") and len(c.w) >= 4 \
                and c.w[-4] in "st":
            c.drop(3)

    # step 5
    if c.w.endswith("e"):
        if c.in_r2("e") or (c.in_r1("e")
                            and not _en_is_short_syllable(c.w, len(c.w) - 3)):
            c.drop(1)
    elif c.w.endswith("l") and c.in_r2("l") and len(c.w) >= 2 \
            and c.w[-2] == "l":
        c.drop(1)

    return c.w.replace("Y", "y")


STEMMERS["en"] = english_stem  # Porter2; analyzer_for_lang('en') still prefers the stop-worded Porter1 chain


# ---------------------------------------------------------------------------
# Romanian (round 5)
# ---------------------------------------------------------------------------

_RO_VOWELS = "aăâeiîou"

_RO_STEP1 = {
    # repeat-until-fixpoint combining-suffix reductions (R1)
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic",
    "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}

_RO_STEP2_DELETE = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oşi",
    "ant", "anta", "ante", "anti", "antă", "ator", "atori",
    "itate", "itati", "ităi", "ităţi",
    "iv", "iva", "ive", "ivi", "ivă",
)

_RO_VERB_A = (
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc", "ăşti",
    "ăşte", "am", "ai", "au", "eam", "eai", "ea", "eaţi", "eau", "iam",
    "iai", "ia", "iaţi", "iau", "ui", "aşi", "arăm", "arăţi", "ară",
    "uşi", "urăm", "urăţi", "ură", "işi", "irăm", "irăţi", "iră", "âi",
    "âşi", "ârăm", "ârăţi", "âră", "asem", "aseşi", "ase", "aserăm",
    "aserăţi", "aseră", "isem", "iseşi", "ise", "iserăm", "iserăţi",
    "iseră", "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
    "usem", "useşi", "use", "userăm", "userăţi", "useră",
)
_RO_VERB_B = (
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "seşi", "serăm",
    "serăţi", "seră", "sei", "se", "sesem", "seseşi", "sese", "seserăm",
    "seserăţi", "seseră",
)


def romanian_stem(word: str) -> str:
    """Snowball Romanian stemmer
    (snowballstem.org/algorithms/romanian/; reference
    org/tartarus/snowball/ext/RomanianStemmer.java role). Modern
    comma-below ş/ţ variants normalize to the algorithm's cedilla forms
    on entry."""
    w = word.replace("ș", "ş").replace("ț", "ţ")
    # prelude: i/u between vowels are consonants (marked uppercase)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1_r2(w.lower(), _RO_VOWELS)
    rv = _rv_romance(w.lower(), _RO_VOWELS)
    c = _Ctx(w, r1, r2, rv)

    # step 0: removal of plurals (R1)
    s = c.ends("ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua",
               "iei", "iile", "iilor", "ilor", "ile", "atei", "aţie",
               "aţia")
    if s and c.in_r1(s):
        if s in ("ul", "ului"):
            c.drop(len(s))
        elif s == "aua":
            c.replace(s, "a")
        elif s in ("ea", "ele", "elor"):
            c.replace(s, "e")
        elif s in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
            c.replace(s, "i")
        elif s == "ile":
            if not c.w[: len(c.w) - 3].endswith("ab"):
                c.replace(s, "i")
        elif s == "atei":
            c.replace(s, "at")
        else:  # aţie / aţia
            c.replace(s, "aţi")

    # step 1: combining suffixes, repeat to fixpoint (R1)
    standard_removed = False
    while True:
        s = c.ends(*_RO_STEP1)
        if s and c.in_r1(s):
            c.replace(s, _RO_STEP1[s])
            standard_removed = True
            continue
        break

    # step 2: standard suffixes (R2)
    s = c.ends(*_RO_STEP2_DELETE, "iune", "iuni", "ism", "isme", "ist",
               "ista", "iste", "isti", "istă", "işti")
    if s and c.in_r2(s):
        if s in ("iune", "iuni"):
            if c.w[: len(c.w) - len(s)].endswith("ţ"):
                c.replace(s, "")
                c.w = c.w[:-1] + "t"
                standard_removed = True
        elif s in ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
                   "işti"):
            c.replace(s, "ist")
            standard_removed = True
        else:
            c.drop(len(s))
            standard_removed = True

    # step 3: verb suffixes (RV) — only if steps 1-2 removed nothing
    if not standard_removed:
        s = c.ends(*_RO_VERB_A, *_RO_VERB_B)
        if s and c.in_rv(s):
            if s in _RO_VERB_B:
                c.drop(len(s))
            else:
                prev = c.w[: len(c.w) - len(s)]
                # group (a) deletes only after a consonant or 'u' in RV
                if prev and len(prev) > c.rv \
                        and (prev[-1] == "u" or prev[-1] not in _RO_VOWELS
                             and prev[-1] not in "IU"):
                    c.drop(len(s))

    # step 4: final vowel (RV)
    s = c.ends("ie", "a", "e", "i", "ă")
    if s and c.in_rv(s):
        c.drop(len(s))
    return c.w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Finnish (round 5)
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouyäö"
_FI_RESTRICTED = "aeiouäö"  # V without y
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_CASES = ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä",
             "lta", "ltä", "lle", "na", "nä", "ksi", "ine")


def finnish_stem(word: str) -> str:
    """Snowball Finnish stemmer
    (snowballstem.org/algorithms/finnish/; reference
    org/tartarus/snowball/ext/FinnishStemmer.java role)."""
    w = word
    r1, r2 = _r1_r2(w, _FI_VOWELS)
    c = _Ctx(w, r1, r2, 0)

    # step 1: particles
    s = c.ends("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa",
               "pä", "sti")
    if s:
        if s == "sti":
            if c.in_r2(s):
                c.drop(len(s))
        elif c.in_r1(s):
            prev = c.w[: len(c.w) - len(s)]
            if prev and prev[-1] in ("n" + "t" + _FI_RESTRICTED):
                c.drop(len(s))

    # step 2: possessives (R1)
    s = c.ends("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en")
    if s and c.in_r1(s):
        prev = c.w[: len(c.w) - len(s)]
        if s == "si":
            if not prev.endswith("k"):
                c.drop(2)
        elif s == "ni":
            c.drop(2)
            if c.w.endswith("kse"):
                c.replace("kse", "ksi")
        elif s in ("nsa", "nsä", "mme", "nne"):
            c.drop(len(s))
        elif s == "an":
            if prev.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                c.drop(2)
        elif s == "än":
            if prev.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                c.drop(2)
        elif s == "en":
            if prev.endswith(("lle", "ine")):
                c.drop(2)

    # step 3: cases (R1)
    ending_removed = False
    hxn = None
    for x in _FI_RESTRICTED + "y":
        suf = "h" + x + "n"
        if c.w.endswith(suf) and c.in_r1(suf) \
                and c.w[: len(c.w) - 3].endswith(x):
            hxn = suf
            break
    s = c.ends("siin", "seen", "tten", "den", "tta", "ttä", "n", "a",
               "ä", *_FI_CASES)
    if hxn and (s is None or len(hxn) >= len(s)):
        c.drop(3)
        ending_removed = True
    elif s and c.in_r1(s):
        prev = c.w[: len(c.w) - len(s)]
        if s in ("siin", "den", "tten"):
            # preceded by Vi (restricted vowel + i)
            if len(prev) >= 2 and prev[-1] == "i" \
                    and prev[-2] in _FI_RESTRICTED:
                c.drop(len(s))
                ending_removed = True
        elif s == "seen":
            if prev.endswith(_FI_LONG):
                c.drop(4)
                ending_removed = True
        elif s in ("a", "ä"):
            # preceded by cv (consonant then the same vowel family)
            if len(prev) >= 2 and prev[-1] in _FI_VOWELS \
                    and prev[-2] not in _FI_VOWELS:
                c.drop(1)
                ending_removed = True
        elif s in ("tta", "ttä"):
            if prev.endswith("e"):
                c.drop(3)
                ending_removed = True
        elif s in _FI_CASES:
            c.drop(len(s))
            ending_removed = True
        elif s == "n":
            c.drop(1)
            ending_removed = True
            if c.w.endswith(_FI_LONG) or c.w.endswith("ie"):
                c.drop(1)

    # step 4: other endings (R2)
    s = c.ends("mpi", "mpa", "mpä", "mmi", "mma", "mmä", "impi", "impa",
               "impä", "immi", "imma", "immä", "eja", "ejä")
    if s and c.in_r2(s):
        if len(s) == 3 and s[0] == "m":
            if not c.w[: len(c.w) - 3].endswith("po"):
                c.drop(3)
        else:
            c.drop(len(s))

    # step 5: plurals
    if ending_removed:
        if c.w.endswith(("i", "j")) and c.in_r1(c.w[-1]):
            c.drop(1)
    else:
        if c.w.endswith("t") and c.in_r1("t") and len(c.w) >= 2 \
                and c.w[-2] in _FI_VOWELS:
            c.drop(1)
            if c.w.endswith("imma") and c.in_r2("imma"):
                c.drop(4)
            elif c.w.endswith("mma") and c.in_r2("mma") \
                    and not c.w[: len(c.w) - 3].endswith("po"):
                c.drop(3)

    # step 6: tidying
    if c.w.endswith(_FI_LONG) and c.in_r1(c.w[-1]):
        c.drop(1)  # 6a: shorten final long vowel in R1
    if len(c.w) >= 2 and c.w[-1] in "aäei" \
            and c.w[-2] not in _FI_VOWELS and c.in_r1(c.w[-1]):
        c.drop(1)  # 6b: cX tail
    if c.w.endswith(("oj", "uj")) and c.in_r1("j"):
        c.drop(1)  # 6c
    if c.w.endswith("jo") and c.in_r1("o"):
        c.drop(1)  # 6d
    # 6e: undouble a final double consonant (possibly before trailing
    # vowels)
    i = len(c.w)
    while i > 0 and c.w[i - 1] in _FI_VOWELS:
        i -= 1
    if i >= 2 and c.w[i - 1] == c.w[i - 2] \
            and c.w[i - 1] not in _FI_VOWELS:
        c.w = c.w[: i - 1] + c.w[i:]
    return c.w


# ---------------------------------------------------------------------------
# Hungarian (round 5)
# ---------------------------------------------------------------------------

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("cs", "dzs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")


def _hu_r1(w: str) -> int:
    """Hungarian R1 (snowballstem.org/algorithms/hungarian/): after the
    first consonant-or-digraph if the word begins with a vowel, after
    the first vowel if it begins with a consonant."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:  # digraph consonant counts as one unit
            if w.startswith(d, i):
                return min(i + len(d), n)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, n) if i < n else n


def _hu_undouble(w: str) -> str:
    """Remove one of a doubled final consonant (digraph-aware: 'ssz' is
    doubled 'sz')."""
    for d in _HU_DIGRAPHS:
        if w.endswith(d[0] + d):
            return w[: len(w) - len(d) - 1] + d
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _HU_VOWELS:
        return w[:-1]
    return w


def _hu_ends_double_cons(w: str) -> bool:
    for d in _HU_DIGRAPHS:
        if w.endswith(d[0] + d):
            return True
    return len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _HU_VOWELS


_HU_CASES = ("ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val",
             "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz",
             "hez", "höz", "nál", "nél", "ig", "at", "et", "ot", "öt",
             "ért", "képp", "képpen", "kor", "ul", "ül", "vá", "vé",
             "onként", "enként", "anként", "ként", "en", "on", "an",
             "ön", "n", "t")

# owner / plural suffix → replacement ('' = delete, 'a'/'e' restore the
# shortened stem vowel); longest match wins
_HU_OWNED = {
    "áké": "a", "ééi": "e", "áéi": "a", "éké": "e",
    "oké": "", "öké": "", "aké": "", "eké": "", "ké": "",
    "éi": "", "é": "",
}
_HU_OWNER = {
    "ánk": "a", "énk": "e", "unk": "", "ünk": "", "nk": "",
    "ájuk": "a", "éjük": "e", "juk": "", "jük": "", "uk": "", "ük": "",
    "ám": "a", "ém": "e", "om": "", "am": "", "em": "", "öm": "",
    "m": "",
    "ád": "a", "éd": "e", "od": "", "ad": "", "ed": "", "öd": "",
    "d": "",
    "ja": "", "je": "", "a": "", "e": "", "o": "", "á": "a", "é": "e",
    "jaim": "", "jeim": "", "aim": "", "eim": "", "im": "",
    "áim": "a", "éim": "e",
    "jaid": "", "jeid": "", "aid": "", "eid": "", "id": "",
    "áid": "a", "éid": "e",
    "jai": "", "jei": "", "ai": "", "ei": "", "i": "",
    "ái": "a", "éi": "e",
    "jaink": "", "jeink": "", "aink": "", "eink": "", "ink": "",
    "áink": "a", "éink": "e",
    "jaitok": "", "jeitek": "", "aitok": "", "eitek": "", "itek": "",
    "áitok": "a", "éitek": "e",
    "jaik": "", "jeik": "", "aik": "", "eik": "", "ik": "",
    "áik": "a", "éik": "e",
}
_HU_PLURAL = {"ák": "a", "ék": "e", "ök": "", "ok": "", "ek": "",
              "ak": "", "k": ""}


def hungarian_stem(word: str) -> str:
    """Snowball Hungarian stemmer role
    (snowballstem.org/algorithms/hungarian/; reference
    org/tartarus/snowball/ext/HungarianStemmer.java). Follows the
    published step structure — instrumental, case, case-special,
    case-other, factive, owned, owner, plural, each in R1 with the
    á→a / é→e stem-vowel restoration and digraph-aware undoubling; the
    owner/owned suffix inventories are reconstructed from the published
    algorithm description."""
    w = word
    r1 = _hu_r1(w)
    c = _Ctx(w, r1, len(w), 0)

    def v_ending():
        if c.w.endswith("á"):
            c.replace("á", "a")
        elif c.w.endswith("é"):
            c.replace("é", "e")

    # step 1: instrumental (al/el after a double consonant)
    s = c.ends("al", "el")
    if s and c.in_r1(s) and _hu_ends_double_cons(c.w[: len(c.w) - 2]):
        c.drop(2)
        c.w = _hu_undouble(c.w)

    # step 2: frequent cases
    s = c.ends(*_HU_CASES)
    if s and c.in_r1(s):
        c.drop(len(s))
        v_ending()

    # step 3: special cases
    s = c.ends("én", "án", "ánként")
    if s and c.in_r1(s):
        c.replace(s, "e" if s == "én" else "a")

    # step 4: other cases
    s = c.ends("astul", "estül", "stul", "stül", "ástul", "éstül")
    if s and c.in_r1(s):
        if s == "ástul":
            c.replace(s, "a")
        elif s == "éstül":
            c.replace(s, "e")
        else:
            c.drop(len(s))

    # step 5: factive (á/é after a double consonant)
    s = c.ends("á", "é")
    if s and c.in_r1(s) and _hu_ends_double_cons(c.w[: len(c.w) - 1]):
        c.drop(1)
        c.w = _hu_undouble(c.w)

    # step 6: owned
    s = c.ends(*_HU_OWNED)
    if s and c.in_r1(s):
        c.replace(s, _HU_OWNED[s])

    # step 7: owner suffixes
    s = c.ends(*_HU_OWNER)
    if s and c.in_r1(s):
        c.replace(s, _HU_OWNER[s])

    # step 8: plural
    s = c.ends(*_HU_PLURAL)
    if s and c.in_r1(s):
        c.replace(s, _HU_PLURAL[s])
    return c.w


# ---------------------------------------------------------------------------
# Turkish (round 5)
# ---------------------------------------------------------------------------

_TR_VOWELS = "aeıioöuü"
# vowel-harmony successor classes: the first suffix vowel must follow
# the stem's last vowel per two/four-fold harmony
_TR_HARMONY = {
    "a": "aı", "e": "ei", "ı": "aı", "i": "ei",
    "o": "au", "ö": "eü", "u": "au", "ü": "eü",
}


def _tr_last_vowel(w: str) -> "str | None":
    for ch in reversed(w):
        if ch in _TR_VOWELS:
            return ch
    return None


def _tr_first_vowel(s: str) -> "str | None":
    for ch in s:
        if ch in _TR_VOWELS:
            return ch
    return None


def _tr_harmonic(stem: str, suffix: str) -> bool:
    # 'ki' (and its buffered 'yken' form) is invariant in Turkish — the
    # only common suffixes exempt from vowel harmony
    if suffix in ("ki", "ken", "yken"):
        return True
    lv = _tr_last_vowel(stem)
    fv = _tr_first_vowel(suffix)
    if lv is None or fv is None:
        return True
    return fv in _TR_HARMONY[lv]


def _tr_expand(pattern: str) -> "list[str]":
    """Expand a suffix pattern: A → a/e (two-fold), I → ı/i,
    U → ı/i/u/ü (four-fold), D → d/t, C → c/ç; a parenthesised leading
    buffer letter is optional: '(y)lA' → ['yla','yle','la','le'].
    Harmony-invalid cross products are rejected at match time."""
    outs = [""]
    i = 0
    opt = None
    if pattern.startswith("("):
        opt = pattern[1]
        pattern = pattern[3:]
    while i < len(pattern):
        ch = pattern[i]
        subs = {"A": "ae", "I": "ıi", "U": "ıiuü",
                "D": "dt", "C": "cç"}.get(ch, ch)
        outs = [o + s for o in outs for s in subs]
        i += 1
    if opt is not None:
        outs = [opt + o for o in outs] + outs
    # longest first so ends() picks maximal forms
    return sorted(set(outs), key=len, reverse=True)


# nominal verb suffixes, stripped first (longest chain wins per pass)
_TR_NOMINAL_VERB = [
    _tr_expand(p) for p in (
        "(y)mUş", "(y)DU", "(y)sA", "(y)ken", "cAsInA", "sUnUz", "nUz",
        "sUn", "(y)Uz", "(y)Um", "DUr", "lAr", "m", "n", "k",
    )
]
# noun (inflectional) suffixes
_TR_NOUN = [
    _tr_expand(p) for p in (
        "lArI", "ndAn", "(n)Un", "(y)lA", "(y)A", "nA", "ndA", "DAn",
        "DA", "(s)U", "lAr", "(U)mUz", "(U)nUz", "(U)m", "(U)n", "ki",
        "(y)U", "(n)cA",
    )
]
_TR_BUFFERS = "yns"


def _tr_strip_group(w: str, groups) -> "tuple[str, bool]":
    """One longest-suffix strip from any pattern group, with vowel
    harmony and buffer-letter validity (a consonant buffer like y/n/s
    must follow a vowel, a vowel-initial suffix must follow a
    consonant-compatible boundary)."""
    best = None
    for forms in groups:
        for f in forms:
            if len(f) >= len(w):
                continue
            if not w.endswith(f):
                continue
            stem = w[: len(w) - len(f)]
            if not _tr_harmonic(stem, f):
                continue
            if f[0] in _TR_BUFFERS and f[0] not in _TR_VOWELS:
                # buffer consonant requires a vowel before it
                if not stem or stem[-1] not in _TR_VOWELS:
                    continue
            if f[0] in _TR_VOWELS:
                # vowel-initial suffix after a vowel needs a buffer —
                # reject direct vowel-vowel boundaries
                if stem and stem[-1] in _TR_VOWELS:
                    continue
            if best is None or len(f) > len(best):
                best = f
    if best is None:
        return w, False
    return w[: len(w) - len(best)], True


def turkish_stem(word: str) -> str:
    """Snowball Turkish stemmer role
    (snowballstem.org/algorithms/turkish/, Kapusuz Çilden's algorithm;
    reference org/tartarus/snowball/ext/TurkishStemmer.java). The
    published architecture — strip nominal-verb then noun inflections,
    each gated on two/four-fold vowel harmony and buffer-letter (y/n/s)
    validity, then restore final-consonant devoicing (b/c/d/ğ →
    p/ç/t/k surface forms invert) — over a reconstructed inflectional
    suffix inventory. Words of <= 2 letters pass through, as in the
    reference."""
    w = word
    if len(w) <= 2:
        return w
    w, stripped = _tr_strip_group(w, _TR_NOMINAL_VERB)
    # noun suffixes strip repeatedly (agglutination), bounded to keep a
    # 2+-letter stem that still contains a vowel
    for _ in range(4):
        if len(w) <= 2:
            break
        w2, changed = _tr_strip_group(w, _TR_NOUN)
        if not changed or len(w2) < 2 or _tr_last_vowel(w2) is None:
            break
        w = w2
    # post-process: undo final devoicing introduced by suffixation
    if len(w) >= 3:
        soft = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
        if w[-1] in soft:
            w = w[:-1] + soft[w[-1]]
    return w


STEMMERS["ro"] = romanian_stem
STEMMERS["fi"] = finnish_stem
STEMMERS["hu"] = hungarian_stem
STEMMERS["tr"] = turkish_stem

# Light (non-Snowball) stemmers — the ArabicStemmer / HindiStemmer /
# IndonesianStemmer / GreekStemmer roles (analysis/light_stemmers.py).
# They share the stem_lang dispatch so analyzer plumbing (manifest
# round-trip, vocabulary mapping, query-side normalize) is identical.
from lucene_ray.analysis.light_stemmers import LIGHT_STEMMERS as _LIGHT  # noqa: E402

STEMMERS.update(_LIGHT)

# Snowball second wave (analysis/snowball_more.py): Armenian, Irish,
# Lithuanian, Basque, Catalan, Estonian, Nepali.
from lucene_ray.analysis.snowball_more import (  # noqa: E402
    armenian_stem, basque_stem, catalan_stem, estonian_stem, irish_stem,
    lithuanian_stem, nepali_stem)

STEMMERS["hy"] = armenian_stem
STEMMERS["ga"] = irish_stem
STEMMERS["lt"] = lithuanian_stem
STEMMERS["eu"] = basque_stem
STEMMERS["ca"] = catalan_stem
STEMMERS["et"] = estonian_stem
STEMMERS["ne"] = nepali_stem

from lucene_ray.analysis.snowball_more import tamil_chain  # noqa: E402

STEMMERS["ta"] = tamil_chain

from lucene_ray.analysis.snowball_more import polish_stem  # noqa: E402

STEMMERS["pl"] = polish_stem

from lucene_ray.analysis.snowball_more import (  # noqa: E402
    esperanto_stem, yiddish_stem)

STEMMERS["eo"] = esperanto_stem
STEMMERS["yi"] = yiddish_stem
