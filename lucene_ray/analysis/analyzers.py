"""Analyzer = composable chain of tokenize + token filters, as in the
reference's Analyzer / TokenStream model (analysis/Analyzer.java:85,
analysis/TokenStream.java:78) but expressed as plain Python callables that
batch-vectorize inside ``map_batches``.

``StandardAnalyzer`` matches the reference default: StandardTokenizer ->
LowerCaseFilter -> StopFilter with an EMPTY stop set
(analysis/standard/StandardAnalyzer.java:34-96). ``EnglishAnalyzer`` uses
the 33-word English stop list. Stop filtering preserves position
increments (StopFilter keeps gaps — analysis/StopFilter.java:25), so
positions recorded for surviving tokens keep their original indices; the
*field length* used for norms counts only surviving tokens minus overlaps
(FieldInvertState.length semantics, index/IndexingChain.java:1870).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from lucene_ray.analysis.tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    ENGLISH_STOP_WORDS,
    tokenize,
    tokenize_with_offsets,
)


def _segment_with_offsets(lang: str, text: str):
    """Dispatch to the morphological segmenter for `lang` — each returns
    [(surface, start, end)] (analysis/japanese.py, korean.py, chinese.py)."""
    if lang == "ja":
        from lucene_ray.analysis.japanese import ja_tokenize_with_offsets

        return ja_tokenize_with_offsets(text)
    if lang == "ko":
        from lucene_ray.analysis.korean import ko_tokenize_with_offsets

        return ko_tokenize_with_offsets(text)
    if lang == "zh":
        from lucene_ray.analysis.chinese import zh_tokenize_with_offsets

        return zh_tokenize_with_offsets(text)
    if lang == "th":
        from lucene_ray.analysis.thai import th_tokenize_with_offsets

        return th_tokenize_with_offsets(text)
    raise ValueError(f"no segmenter for language {lang!r}")


def _is_date(term: str, fmt: str) -> bool:
    """DateRecognizerFilter predicate (miscellaneous/
    DateRecognizerFilter.java:28): strict strptime parse."""
    from datetime import datetime

    try:
        datetime.strptime(term, fmt)
        return True
    except ValueError:
        return False


def _dedupe_stream(out: list) -> list:
    """RemoveDuplicatesTokenFilter rule (miscellaneous/
    RemoveDuplicatesTokenFilter.java:28): keep the FIRST of any
    (term, position) pair; rows may carry offsets (term, pos, ...)."""
    seen = set()
    kept = []
    for row in out:
        key = (row[0], row[1])
        if key in seen:
            continue
        seen.add(key)
        kept.append(row)
    return kept


def _cjk_bigram_stream(stream):
    """CJKBigramFilter rewrite (cjk/CJKBigramFilter.java:66) over a raw
    (term, pos, start, end) stream: runs of >=2 adjacent single-Han
    tokens become overlapping bigrams; positions renumber sequentially
    (every input token has posInc 1, and the default outputUnigrams=false
    stream keeps posInc 1 per bigram)."""
    from lucene_ray.analysis.tokenizer import _IDEO_RE

    toks = list(stream)
    out = []
    i = 0
    n = len(toks)
    while i < n:
        t, p, s, e = toks[i]
        if len(t) == 1 and _IDEO_RE.match(t):
            j = i + 1
            while (j < n and len(toks[j][0]) == 1
                   and _IDEO_RE.match(toks[j][0])
                   and toks[j][1] == toks[j - 1][1] + 1):
                j += 1
            if j - i >= 2:
                for k in range(i, j - 1):
                    out.append((toks[k][0] + toks[k + 1][0],
                                toks[k][2], toks[k + 1][3]))
            else:
                out.append((t, s, e))
            i = j
        else:
            out.append((t, s, e))
            i += 1
    return [(t, pos, s, e) for pos, (t, s, e) in enumerate(out)]


@dataclass(frozen=True)
class Analyzer:
    """Configurable analyzer chain
    (tokenize -> lowercase -> ascii-fold -> stop -> stem)."""

    lowercase: bool = True
    stop_words: frozenset[str] = field(default_factory=frozenset)
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
    stem: bool = False        # PorterStemFilter (en/PorterStemFilter.java:51)
    # SnowballFilter language (snowball/SnowballFilter.java:48): one of
    # 'de','fr','es','pt','it','nl' selects that language's Snowball
    # stemmer (analysis/snowball.py); mutually exclusive with `stem`
    # (Porter English). Vocabulary-mapped like Porter — per-token Python
    # only ever touches unique terms.
    stem_lang: "str | None" = None
    # HunspellStemFilter (analysis/hunspell/HunspellStemFilter.java:43):
    # (aff_path, dic_path) of a user-provided Hunspell dictionary —
    # morphology for languages the algorithmic stemmers don't cover.
    # Paths (not the parsed object) so the config stays JSON-serializable
    # for the manifest round-trip; workers parse + cache one dictionary
    # per process (analysis/hunspell.load_cached).
    hunspell: "tuple[str, str] | None" = None
    ascii_fold: bool = False  # ASCIIFoldingFilter (miscellaneous/ASCIIFoldingFilter.java)
    # CJKWidthFilter role (analysis/cjk/CJKWidthFilter.java:36): fold
    # fullwidth ASCII to Basic Latin and halfwidth Katakana to
    # fullwidth (voiced marks composing: ﾃﾞ -> デ) — part of the
    # reference JapaneseAnalyzer chain. Runs FIRST among the token
    # filters so downstream filters see canonical widths.
    cjk_width: bool = False
    # ICUFoldingFilter role (analysis/icu/ICUFoldingFilter.java:51):
    # full-Unicode fold — NFKD compatibility decomposition, combining
    # marks stripped, case fold — so café/CAFÉ/ｃａｆé all index as cafe.
    # Strictly stronger than ascii_fold (which maps a Latin-1/Ext-A
    # subset); vocabulary-mapped like every other token filter.
    icu_fold: bool = False
    # ICUNormalizer2Filter role (analysis/icu/ICUNormalizer2Filter.java:40):
    # Unicode normalization PROPER — 'nfc' | 'nfkc' | 'nfkc_cf' — applied
    # to every token before the other filters. Unlike icu_fold it does
    # NOT strip combining marks: café(NFD) and café(NFC) unify without
    # losing the accent. 'nfkc_cf' adds the Unicode case fold (the
    # filter's default normalizer in the reference). Vocabulary-mapped.
    icu_normalize: "str | None" = None
    # PhoneticFilter role (analysis/phonetic/PhoneticFilter.java:33):
    # 'soundex' | 'nysiis' (analysis/phonetic.py) maps each token to its
    # sound-alike code. Pair with keyword_repeat=True for the filter's
    # inject=true mode (surface token AND code at the same position);
    # without it tokens are REPLACED by codes (inject=false).
    phonetic: "str | None" = None
    # CommonGramsFilter (analysis/commongrams/CommonGramsFilter.java:63):
    # adjacent token pairs where EITHER member is a common word inject a
    # "w1_w2" gram at the first word's position alongside the unigrams —
    # phrase queries over stopword-grade terms then hit one precomputed
    # posting instead of two huge ones. Grams form over the
    # POST-token-filter stream (stemmed forms), before synonym/compound
    # injection; common_grams_query() gives the CommonGramsQueryFilter
    # rewrite for the query side.
    common_grams: "tuple[str, ...] | None" = None
    # DictionaryCompoundWordTokenFilter (analysis/compound/
    # DictionaryCompoundWordTokenFilter.java:40): dictionary words whose
    # occurrences INSIDE long tokens inject as subwords at the SAME
    # position (German-style compound splitting). Runs LAST in the
    # chain, over filtered + synonym-injected tokens.
    compound_dict: "tuple[str, ...] | None" = None
    compound_min_word: int = 5
    compound_min_sub: int = 2
    compound_max_sub: int = 15
    compound_longest: bool = False
    # ElisionFilter (analysis/util/ElisionFilter.java:35): tuple of
    # articles whose leading "article'" strips off the token
    # ("l'avion" -> "avion"); the reference French/Italian/Catalan/Irish
    # chains run it right after the tokenizer. Here it runs FIRST among
    # the token filters (post-stop): with the engine's default empty
    # stop sets the streams agree; when combining with stop_words, list
    # the post-elision forms (documented order deviation).
    elision: "tuple[str, ...] | None" = None
    # DecimalDigitFilter (analysis/core/DecimalDigitFilter.java:31):
    # fold any Unicode decimal digit to ASCII 0-9 (٣/３/३ -> 3) — the
    # reference includes it in the Arabic/Persian/Hindi/Bengali/Thai
    # analyzer chains.
    decimal_digit: bool = False
    # ScandinavianNormalizationFilter / ScandinavianFoldingFilter
    # (miscellaneous/ScandinavianNormalizationFilter.java:38,
    # ScandinavianFoldingFilter.java:38): 'normalize' unifies the
    # interchangeable å/æ/ø spellings (ä->æ, ö->ø, aa->å, ae->æ,
    # oe/oo->ø); 'fold' additionally flattens å/æ->a, ø->o.
    scandinavian: "str | None" = None
    # TruncateTokenFilter (miscellaneous/TruncateTokenFilter.java:28):
    # keep only the first N chars of each token (a crude prefix
    # stemmer); runs AFTER stem, before phonetic.
    truncate_length: "int | None" = None
    # KeepWordFilter (miscellaneous/KeepWordFilter.java:27): the inverse
    # of StopFilter — only tokens IN the set survive, with position
    # gaps. Applied with the length filter (after stop, before stem).
    keep_words: "frozenset[str] | None" = None
    # UAX29URLEmailTokenizer role (standard/UAX29URLEmailTokenizer
    # .java:52, analysis/urlemail.py): URLs (http/https/ftp schemes or
    # scheme-less www.) and RFC-5321-style emails emit as SINGLE tokens;
    # text between the protected spans runs the standard UAX#29 chain.
    url_email: bool = False
    # Alternative raw tokenizer stage (replaces the UAX#29 chain):
    # 'whitespace' (core/WhitespaceTokenizer.java:28), 'letter'
    # (core/LetterTokenizer.java:29), 'keyword'
    # (core/KeywordTokenizer.java:28 — whole input = one token),
    # 'path_hierarchy' (path/PathHierarchyTokenizer.java:40 — every
    # path prefix emits at position 0), 'pattern'
    # (pattern/PatternTokenizer.java:53 — requires tokenizer_pattern).
    tokenizer: "str | None" = None
    # PatternTokenizer config: (regex, group). group=-1 -> the regex is
    # the SEPARATOR (split mode); group>=0 -> emit that capture group of
    # every match.
    tokenizer_pattern: "tuple[str, int] | None" = None
    # PathHierarchyTokenizer knobs (delimiter / replacement / skip).
    path_delimiter: str = "/"
    path_replacement: "str | None" = None
    path_skip: int = 0
    # ApostropheFilter (analysis/tr/ApostropheFilter.java:30): strip the
    # apostrophe and everything after it (Turkish possessive suffixes:
    # "türkiye'den" -> "türkiye"); runs FIRST among the token filters,
    # as in the reference TurkishAnalyzer chain. Handles both ' and ’.
    apostrophe: bool = False
    # CapitalizationFilter (miscellaneous/CapitalizationFilter.java:41,
    # factory defaults): uppercase the first letter, lowercase the rest.
    # Runs after stem, before truncate/phonetic.
    capitalization: bool = False
    # SetKeywordMarkerFilter (miscellaneous/SetKeywordMarkerFilter.java:27):
    # terms in the set are PROTECTED from the stemmers (stem/stem_lang/
    # hunspell); every other filter still applies.
    keyword_set: "frozenset[str] | None" = None
    # StemmerOverrideFilter (miscellaneous/StemmerOverrideFilter.java:37):
    # ((term, stem), ...) dictionary applied INSTEAD of the stemmer for
    # listed terms (and marking them keyword so the stemmer skips, as in
    # the reference).
    stem_overrides: tuple = ()
    # LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter.java:29):
    # only the first N tokens of the raw stream survive (applied before
    # the other filters, so stop-word gaps don't extend the window).
    limit_token_count: "int | None" = None
    # DelimitedTermFrequencyTokenFilter (miscellaneous/
    # DelimitedTermFrequencyTokenFilter.java:37): token "term<delim>N"
    # indexes term with frequency N (client-supplied tf, e.g. sparse
    # feature vectors). Like the reference's custom-term-frequency rule
    # (index/IndexingChain), only DOCS_AND_FREQS indexes allow it —
    # build_index rejects with_positions=True.
    tf_delimiter: "str | None" = None
    # HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:57):
    # a raw token ending in '-' joins with the following token(s) —
    # line-break hyphenation repair. Pair with tokenizer="whitespace"
    # (the standard tokenizer already drops the hyphen).
    hyphenated_words: bool = False
    # EnglishPossessiveFilter (en/EnglishPossessiveFilter.java:30):
    # strip a trailing 's / ’s possessive — the EnglishAnalyzer chain
    # runs it right after the tokenizer; here it runs first among the
    # per-token filters (identical on the lowercased stream).
    english_possessive: bool = False
    # EnglishMinimalStemFilter (en/EnglishMinimalStemmer.java:33,
    # Harman's S-stemmer): minimal plural removal — an alternative in
    # the stemmer slot (mutually exclusive with stem/stem_lang/
    # hunspell in practice; dispatched after them).
    minimal_stem: bool = False
    # RemoveDuplicatesTokenFilter (miscellaneous/
    # RemoveDuplicatesTokenFilter.java:28) as a standalone stage: after
    # ALL injectors (captures, synonyms, compounds, repeats), drop any
    # (term, position) pair already emitted — the reference's
    # posIncrement==0 duplicate rule. (The keyword_repeat path applies
    # the same rule implicitly to its own originals.)
    remove_duplicates: bool = False
    # DateRecognizerFilter (miscellaneous/DateRecognizerFilter.java:28):
    # keep only tokens that parse under the given strptime format
    # (e.g. '%Y-%m-%d'), with position gaps like StopFilter; runs with
    # the length/keep-word predicate stage.
    date_recognizer: "str | None" = None
    # PatternCaptureGroupTokenFilter (pattern/
    # PatternCaptureGroupTokenFilter.java:48), preserveOriginal=true
    # form: every capture group of every pattern match injects as a
    # token at the SAME position (the original always survives).
    # Same-position duplicates collapse, the RemoveDuplicates pairing
    # the reference recommends. Runs with the other injectors: after
    # the per-token filters and common grams, before synonyms.
    pattern_capture: "tuple[str, ...] | None" = None
    # ProtectedTermFilter (miscellaneous/ProtectedTermFilter.java:31):
    # terms in the set skip the ENTIRE per-token filter chain (the
    # reference's conditional wrapper with all filters inside) — a
    # stronger guard than keyword_set, which only protects from the
    # stemmers.
    protected_words: "frozenset[str] | None" = None
    # TrimFilter (miscellaneous/TrimFilter.java:26): strip leading and
    # trailing whitespace from each token — a no-op under the standard
    # tokenizer (which never emits spaces) but meaningful with the
    # 'keyword'/'pattern' raw tokenizers. Runs FIRST among the
    # per-token filters.
    trim: bool = False
    # PatternReplaceFilter (pattern/PatternReplaceFilter.java:34,
    # replaceAll mode — the TOKEN-level sibling of the
    # PatternReplaceCharFilter): (regex, replacement) applied to every
    # token right after trim, before the other per-token filters.
    pattern_replace: "tuple[str, str] | None" = None
    # ReverseStringFilter (analysis/reverse/ReverseStringFilter.java:44):
    # every token indexes reversed. Index the same text into a second
    # field with this filter and a LEADING wildcard (*suffix) becomes a
    # PREFIX range scan over that field (query.rewrite_leading_wildcard —
    # the reversed-wildcard serving pattern) instead of a full-dictionary
    # regex scan. Runs LAST in the filter chain (reverse of the stem).
    reverse_tokens: bool = False

    def __post_init__(self):
        if self.common_grams and self.keyword_repeat:
            raise ValueError(
                "common_grams and keyword_repeat cannot combine: the gram "
                "pass needs the un-injected position-ordered stream")
        if self.ja_segment and self.segment_lang not in (None, "ja"):
            raise ValueError(
                "ja_segment=True conflicts with segment_lang="
                f"{self.segment_lang!r}")
        if self.cjk_bigrams and (self.ja_segment or self.segment_lang
                                 or self.word_delimiter):
            raise ValueError(
                "cjk_bigrams pairs with the StandardTokenizer stream only "
                "(the CJKAnalyzer chain) — not with a morphological "
                "segmenter or word_delimiter")
        if self.url_email and (self.ja_segment or self.segment_lang
                               or self.word_delimiter or self.cjk_bigrams
                               or self.payload_delimiter):
            raise ValueError(
                "url_email replaces the raw tokenizer stage — it cannot "
                "combine with word_delimiter, payloads, cjk_bigrams or a "
                "morphological segmenter")
        if self.limit_token_count is not None and (
                self.word_delimiter or self.payload_delimiter):
            raise ValueError(
                "limit_token_count pairs with position-ordered raw "
                "streams only — not word_delimiter or payloads")
        if self.tokenizer:
            if self.tokenizer not in ("whitespace", "letter", "keyword",
                                      "path_hierarchy", "pattern"):
                raise ValueError(f"unknown tokenizer {self.tokenizer!r}")
            if self.tokenizer == "pattern" and not self.tokenizer_pattern:
                raise ValueError("tokenizer='pattern' needs "
                                 "tokenizer_pattern=(regex, group)")
            if (self.ja_segment or self.segment_lang or self.word_delimiter
                    or self.cjk_bigrams or self.payload_delimiter
                    or self.url_email):
                raise ValueError(
                    "tokenizer= replaces the raw tokenizer stage — it "
                    "cannot combine with word_delimiter, payloads, "
                    "cjk_bigrams, url_email or a morphological segmenter")

    @property
    def effective_segment_lang(self) -> "str | None":
        """'ja'|'ko'|'zh' when a morphological segmenter replaces the
        UAX#29 tokenizer (ja_segment is the legacy 'ja' spelling)."""
        return "ja" if self.ja_segment else self.segment_lang

    @property
    def common_set(self) -> frozenset:
        return frozenset(self.common_grams or ())

    @property
    def compound_set(self) -> frozenset:
        return frozenset(self.compound_dict or ())

    def decompose_token(self, term: str) -> list:
        from lucene_ray.analysis.compound import decompose

        return decompose(term, self.compound_set, self.compound_min_word,
                         self.compound_min_sub, self.compound_max_sub,
                         self.compound_longest)
    # index-side synonym injection at the SAME position
    # (SynonymGraphFilter, analysis/common/.../synonym/SynonymGraphFilter.java:78):
    # tuple of (source, (injected_terms, ...)), matched AFTER the other
    # filters; injected tokens count toward field length. A source with
    # spaces is a MULTI-WORD rule ("new york" -> nyc): the target injects
    # at the FIRST word's position wherever the words occur at CONSECUTIVE
    # positions (an intervening stop-word gap breaks the run — the
    # flattened-graph posLength model, with the injected token anchored at
    # the run start and offsets spanning the whole surface run)
    synonyms: tuple = ()
    # DelimitedPayloadTokenFilter pairing (payloads/DelimitedPayloadTokenFilter.java:30):
    # when set, tokenization is a pure whitespace split and each token
    # "term<delim>float" carries a per-position payload (batch.py
    # tokenize_with_payloads); positions.parquet then stores a payload
    # float32 column scored by PayloadScoreQuery
    payload_delimiter: "str | None" = None
    # WordDelimiterGraphFilter pairing (miscellaneous/
    # WordDelimiterGraphFilter.java:88, factory defaults): when set,
    # tokenization is a whitespace split and every raw token expands into
    # its sub-word parts (split on delimiters / case change / letter-digit
    # transitions, possessive 's dropped) at consecutive positions BEFORE
    # lowercase/stop/stem run. Tokens that dissolve entirely leave no gap.
    word_delimiter: bool = False
    # JapaneseTokenizer role (kuromoji/JapaneseTokenizer.java:63,
    # analysis/japanese.py): tokenization is a Viterbi lattice over the
    # built-in reduced lexicon with char-class unknown words, instead of
    # the UAX#29 chain. Inherently per-string — the batch path runs the
    # shared per-row tokenizer for every row (the reference's kuromoji
    # is also per-document); downstream filters stay vocabulary-mapped.
    ja_segment: bool = False
    # Morphological segmenter selection, generalizing ja_segment to the
    # other CJK analyzers: 'ja' (kuromoji, analysis/japanese.py), 'ko'
    # (nori KoreanTokenizer + KoreanPartOfSpeechStopFilter roles,
    # analysis/nori/.../ko/KoreanTokenizer.java:69; analysis/korean.py),
    # 'zh' (smartcn HMMChineseTokenizer role, analysis/smartcn/.../cn/
    # smart/HMMChineseTokenizer.java:33; analysis/chinese.py). Like
    # ja_segment these are inherently per-string lattices (the reference
    # tokenizers are per-document too); the batch path runs the shared
    # per-row tokenizer. ja_segment=True is the legacy spelling of
    # segment_lang='ja'.
    segment_lang: "str | None" = None
    # CJKBigramFilter role (analysis/cjk/CJKBigramFilter.java:66, the
    # CJKAnalyzer chain cjk/CJKAnalyzer.java:41): maximal runs of
    # single-Han-character tokens at consecutive positions re-emit as
    # overlapping character bigrams REPLACING the unigrams (the filter's
    # outputUnigrams=false default); a lone Han char stays a unigram.
    # Scope reduction (documented): bigrams form over the HAN flag only —
    # our StandardTokenizer emits Hangul/Katakana as word runs, so the
    # reference's HIRAGANA/KATAKANA/HANGUL flags have no single-char
    # stream to pair here. Positions renumber sequentially after the
    # rewrite (every raw token has posInc 1, as in the reference stream).
    cjk_bigrams: bool = False
    # LengthFilter (analysis/common/.../miscellaneous/LengthFilter.java:31):
    # drop tokens whose char length is outside [length_min, length_max]
    # (None = unbounded), leaving position gaps like StopFilter. Applied
    # after stop, before stem/fold/synonyms.
    length_min: int = 0
    length_max: "int | None" = None
    # KeywordRepeatFilter + RemoveDuplicatesTokenFilter pairing
    # (miscellaneous/KeywordRepeatFilter.java:30): with stem/fold on,
    # index BOTH the original token and its filtered form at the same
    # position (skipped when identical). Lets exact surface matches and
    # stemmed matches coexist in one field.
    keyword_repeat: bool = False
    # PatternReplaceCharFilter chain (analysis/common/.../pattern/
    # PatternReplaceCharFilter.java:40): ((regex, replacement), ...)
    # applied IN ORDER to the raw text BEFORE tokenization. RE2 syntax
    # (pyarrow + DuckDB share the engine). Deviation from the reference:
    # token offsets refer to the FILTERED text, not the original (the
    # reference maintains an offset-correction map; documented).
    char_filters: tuple = ()
    # MappingCharFilter (charfilter/MappingCharFilter.java:44 +
    # NormalizeCharMap): ((source, replacement), ...) literal rewrites
    # applied to the raw text BEFORE char_filters and tokenization, in
    # ONE simultaneous pass with greedy longest-match at each position
    # (the NormalizeCharMap FST semantics) and no re-scan of replacement
    # output. Offsets refer to the mapped text (same documented
    # deviation as char_filters).
    mapping_char_filter: tuple = ()
    # Similarity.computeNorm's discountOverlaps=true default
    # (similarities/BM25Similarity.java:72, Similarity.java:151): when
    # set, field length counts UNIQUE positions, so same-position injected
    # tokens (synonyms, keyword repeat) don't inflate norms. Off by
    # default here (this repo's earlier oracles count every token —
    # documented deviation each way; configured on the analyzer because
    # the norm is computed at invert time).
    discount_overlaps: bool = False

    @property
    def synonym_map(self) -> dict:
        """Single-token rules only (multi-word sources split out below)."""
        return {src: tuple(dsts) for src, dsts in self.synonyms if " " not in src}

    @property
    def multi_synonym_rules(self) -> list:
        """[(words_tuple, targets_tuple)] for multi-word sources."""
        return [
            (tuple(src.split()), tuple(dsts))
            for src, dsts in self.synonyms
            if " " in src
        ]

    @property
    def mapping_regex(self):
        """One alternation regex over the mapping sources, longest first
        (leftmost alternative wins in both Python re and RE2 — greedy
        longest-match at each position), plus the replacement lookup."""
        import re as _re

        srcs = sorted((s for s, _r in self.mapping_char_filter),
                      key=len, reverse=True)
        rx = _re.compile("|".join(_re.escape(s) for s in srcs))
        table = dict(self.mapping_char_filter)
        return rx, table

    def apply_mapping(self, text: str) -> str:
        """MappingCharFilter pass (one simultaneous longest-match sub)."""
        if not self.mapping_char_filter:
            return text
        rx, table = self.mapping_regex
        return rx.sub(lambda m: table[m.group(0)], text)

    def apply_char_filters(self, text: str) -> str:
        """MappingCharFilter + PatternReplaceCharFilter chain over one
        raw text (index-side; query analysis is per-term and skips char
        filters)."""
        import re as _re

        text = self.apply_mapping(text)
        for pat, rep in self.char_filters:
            text = _re.sub(pat, rep, text)
        return text

    @property
    def elision_set(self) -> frozenset:
        return frozenset(self.elision or ())

    def _length_ok(self, term: str) -> bool:
        """LengthFilter + KeepWordFilter predicate (LengthFilter.java:31,
        KeepWordFilter.java:27) — both drop with position gaps."""
        if len(term) < self.length_min:
            return False
        if self.length_max is not None and len(term) > self.length_max:
            return False
        if self.date_recognizer is not None and not _is_date(
                term, self.date_recognizer):
            return False
        return self.keep_words is None or term in self.keep_words

    @property
    def override_map(self) -> dict:
        return dict(self.stem_overrides)

    def transform_token(self, term: str) -> str:
        """Post-stop per-token filters (apostrophe, then elision, then
        digit/width folds, then normalize, then fold, then stem —
        subject to keyword marking / overrides — then capitalization,
        truncate, phonetic, reverse)."""
        if self.protected_words is not None and term in self.protected_words:
            # ProtectedTermFilter: conditional bypass of the whole chain
            return term
        if self.trim:
            # TrimFilter (miscellaneous/TrimFilter.java:26)
            term = term.strip()
        if self.pattern_replace:
            import re

            term = re.compile(self.pattern_replace[0]).sub(
                self.pattern_replace[1], term)
        if self.english_possessive:
            from lucene_ray.analysis.stem import english_possessive_strip

            term = english_possessive_strip(term)
        if self.apostrophe:
            # ApostropheFilter (tr/ApostropheFilter.java:30)
            for ap in ("'", "’"):
                j = term.find(ap)
                if j >= 0:
                    term = term[:j]
                    break
        if self.elision:
            from lucene_ray.analysis.stem import elide

            term = elide(term, self.elision_set)
        if self.decimal_digit:
            from lucene_ray.analysis.stem import decimal_digit_fold

            term = decimal_digit_fold(term)
        if self.cjk_width:
            from lucene_ray.analysis.stem import cjk_width_fold

            term = cjk_width_fold(term)
        if self.icu_normalize:
            import unicodedata

            form = self.icu_normalize.upper()
            if form == "NFKC_CF":
                term = unicodedata.normalize("NFKC", term).casefold()
                # casefold can denormalize (e.g. İ → i + U+0307); the
                # reference's nfkc_cf is a single closed normalizer, so
                # re-normalize after the fold
                term = unicodedata.normalize("NFKC", term)
            else:
                term = unicodedata.normalize(form, term)
        if self.icu_fold:
            import unicodedata

            term = "".join(
                ch for ch in unicodedata.normalize("NFKD", term)
                if not unicodedata.combining(ch)
            ).casefold()
        if self.ascii_fold:
            from lucene_ray.analysis.stem import ascii_fold

            term = ascii_fold(term)
        if self.scandinavian:
            from lucene_ray.analysis.stem import (scandinavian_fold_token,
                                                  scandinavian_normalize_token)

            term = (scandinavian_fold_token(term)
                    if self.scandinavian == "fold"
                    else scandinavian_normalize_token(term))
        if self.stem_overrides and term in self.override_map:
            # StemmerOverrideFilter: dictionary form replaces the
            # stemmer and marks keyword
            term = self.override_map[term]
        elif self.keyword_set is not None and term in self.keyword_set:
            pass  # SetKeywordMarkerFilter: protected from the stemmers
        elif self.stem:
            from lucene_ray.analysis.stem import porter_stem

            term = porter_stem(term)
        elif self.stem_lang:
            from lucene_ray.analysis.snowball import snowball_stem

            term = snowball_stem(term, self.stem_lang)
        elif self.hunspell:
            from lucene_ray.analysis.hunspell import load_cached

            term = load_cached(*self.hunspell).stem_one(term)
        elif self.minimal_stem:
            from lucene_ray.analysis.stem import english_minimal_stem

            term = english_minimal_stem(term)
        if self.capitalization and term:
            # CapitalizationFilter factory defaults
            term = term[0].upper() + term[1:].lower()
        if self.truncate_length is not None:
            term = term[: self.truncate_length]
        if self.phonetic:
            from lucene_ray.analysis.phonetic import encode

            term = encode(term, self.phonetic)
        if self.reverse_tokens:
            term = term[::-1]
        return term

    @property
    def has_token_filters(self) -> bool:
        return (self.stem or self.ascii_fold or self.icu_fold
                or self.cjk_width
                or bool(self.icu_normalize) or bool(self.stem_lang)
                or bool(self.hunspell) or bool(self.phonetic)
                or bool(self.elision) or self.decimal_digit
                or bool(self.scandinavian) or self.reverse_tokens
                or self.apostrophe or self.capitalization
                or bool(self.stem_overrides) or self.trim
                or bool(self.pattern_replace)
                or self.english_possessive or self.minimal_stem
                or self.truncate_length is not None)

    def _raw_stream(self, text: str):
        """(term, position, start, end) of the raw tokenizer stage, with
        the optional hyphenation repair applied on top."""
        if self.hyphenated_words:
            return _hyphenated_merge(self._raw_stream0(text))
        return self._raw_stream0(text)

    def _raw_stream0(self, text: str):
        """(term, position, start, end) of the raw tokenizer stage — the
        UAX#29-ish tokenizer, or whitespace+WDGF when word_delimiter;
        char filters run first (offsets refer to the filtered text)."""
        if self.char_filters or self.mapping_char_filter:
            text = self.apply_char_filters(text)
        seg = self.effective_segment_lang
        if seg:
            for pos, (t, s, e) in enumerate(
                    _segment_with_offsets(seg, text)):
                yield t, pos, s, e
            return
        if self.url_email:
            from lucene_ray.analysis.urlemail import \
                urlemail_tokenize_with_offsets

            yield from urlemail_tokenize_with_offsets(
                text, self.max_token_length)
            return
        if self.tokenizer:
            yield from self._alt_tokenize(text)
            return
        if not self.word_delimiter:
            stream = tokenize_with_offsets(text, self.max_token_length)
            if self.cjk_bigrams:
                stream = _cjk_bigram_stream(stream)
            yield from stream
            return
        from lucene_ray.analysis.worddelim import wdgf_parts_offsets

        pos = 0
        col = 0
        for raw in text.split(" "):
            if raw:
                for p, s, e in wdgf_parts_offsets(raw):
                    yield p, pos, col + s, col + e
                    pos += 1
            col += len(raw) + 1

    def _alt_tokenize(self, text: str):
        """Dispatch the alternative raw tokenizers (tokenizer=...)."""
        from lucene_ray.analysis import tokenizer as tk

        kind = self.tokenizer
        if kind == "whitespace":
            return tk.whitespace_tokenize_with_offsets(
                text, self.max_token_length)
        if kind == "letter":
            return tk.letter_tokenize_with_offsets(
                text, self.max_token_length)
        if kind == "keyword":
            return tk.keyword_tokenize_with_offsets(
                text, self.max_token_length)
        if kind == "path_hierarchy":
            return tk.path_hierarchy_tokenize_with_offsets(
                text, self.path_delimiter, self.path_replacement,
                self.path_skip)
        pat, grp = self.tokenizer_pattern
        return tk.pattern_tokenize_with_offsets(text, pat, grp)

    def capture_tokens(self, term: str) -> list:
        """PatternCaptureGroupTokenFilter injection (pattern/
        PatternCaptureGroupTokenFilter.java:48): distinct capture-group
        matches of every pattern, original and duplicates excluded."""
        if not self.pattern_capture:
            return []
        import re

        out, seen = [], {term}
        for pat in self.pattern_capture:
            for m in re.compile(pat).finditer(term):
                for g in m.groups():
                    if g and g not in seen:
                        seen.add(g)
                        out.append(g)
        return out

    def tokens(self, text: str) -> list[str]:
        """Analyzed terms of one document (order = position order)."""
        if ((self.synonyms and self.multi_synonym_rules)
                or self.common_grams or self.cjk_bigrams
                or self.url_email or self.tokenizer
                or self.limit_token_count is not None
                or self.hyphenated_words or self.remove_duplicates):
            # multi-word rules, common grams, CJK bigrams and the
            # URL/EMAIL tokenizer need the full raw-stream path
            return [t for t, _p in self.tokens_with_positions(text)]
        if self.char_filters or self.mapping_char_filter:
            text = self.apply_char_filters(text)
        seg = self.effective_segment_lang
        if seg:
            toks = [t for t, _s, _e in _segment_with_offsets(seg, text)]
        elif self.word_delimiter:
            from lucene_ray.analysis.worddelim import wdgf_parts

            toks = [p for t in text.split(" ") if t for p in wdgf_parts(t)]
        else:
            toks = tokenize(text, self.max_token_length)
        if self.lowercase:
            toks = [t.lower() for t in toks]
        if self.stop_words:
            sw = self.stop_words
            toks = [t for t in toks if t not in sw]
        if (self.length_min > 1 or self.length_max is not None
                or self.keep_words is not None):
            toks = [t for t in toks if self._length_ok(t)]
        if self.has_token_filters:
            orig = toks
            toks = [self.transform_token(t) for t in toks]
            if self.keyword_repeat:
                toks = toks + [o for o, t in zip(orig, toks) if o != t]
        if self.pattern_capture:
            toks = toks + [s for t in toks for s in self.capture_tokens(t)]
        if self.synonyms:
            syn = self.synonym_map
            toks = toks + [s for t in toks for s in syn.get(t, ())]
        if self.compound_dict:
            toks = toks + [s for t in toks for s in self.decompose_token(t)]
        return toks

    def _multi_matches(self, out: list) -> list:
        """Indices i where a multi-word rule matches out[i:i+L] at
        consecutive positions. Returns [(i, L, targets)]."""
        hits = []
        for words, dsts in self.multi_synonym_rules:
            L = len(words)
            for i in range(len(out) - L + 1):
                if all(
                    out[i + j][0] == words[j]
                    and out[i + j][1] == out[i][1] + j
                    for j in range(L)
                ):
                    hits.append((i, L, dsts))
        return hits

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(term, position) pairs; stop-filtered tokens leave position gaps."""
        out = []
        repeats = []
        lim = self.limit_token_count
        for term, pos, _s, _e in self._raw_stream(text):
            if lim is not None and pos >= lim:
                break  # LimitTokenCountFilter: raw positions ascend
            if self.lowercase:
                term = term.lower()
            if self.stop_words and term in self.stop_words:
                continue
            if not self._length_ok(term):
                continue
            if self.has_token_filters:
                orig = term
                term = self.transform_token(term)
                if self.keyword_repeat and orig != term:
                    repeats.append((orig, pos))
            out.append((term, pos))
        if self.common_grams:
            cs = self.common_set
            out = out + [
                (f"{t1}_{t2}", p1)
                for (t1, p1), (t2, p2) in zip(out, out[1:])
                if p2 == p1 + 1 and (t1 in cs or t2 in cs)
            ]
        out = out + repeats  # KeywordRepeat originals, same positions
        if self.pattern_capture:
            out = out + [(s, p) for t, p in out
                         for s in self.capture_tokens(t)]
        if self.synonyms:
            syn = self.synonym_map
            extra = [(s, p) for t, p in out for s in syn.get(t, ())]
            extra += [
                (s, out[i][1])
                for i, _l, dsts in self._multi_matches(out)
                for s in dsts
            ]
            out = out + extra
        if self.compound_dict:
            out = out + [(s, p) for t, p in out
                         for s in self.decompose_token(t)]
        if self.remove_duplicates:
            out = _dedupe_stream(out)
        return out

    def tokens_with_offsets(self, text: str) -> list[tuple[str, int, int, int]]:
        """(term, position, start_offset, end_offset); offsets span the
        ORIGINAL surface form (filters may rewrite the term)."""
        out = []
        repeats = []
        lim = self.limit_token_count
        for term, pos, s, e in self._raw_stream(text):
            if lim is not None and pos >= lim:
                break  # LimitTokenCountFilter: raw positions ascend
            if self.lowercase:
                term = term.lower()
            if self.stop_words and term in self.stop_words:
                continue
            if not self._length_ok(term):
                continue
            if self.has_token_filters:
                orig = term
                term = self.transform_token(term)
                if self.keyword_repeat and orig != term:
                    repeats.append((orig, pos, s, e))
            out.append((term, pos, s, e))
        if self.common_grams:
            cs = self.common_set
            out = out + [
                (f"{t1}_{t2}", p1, s1, e2)
                for (t1, p1, s1, _e1), (t2, p2, _s2, e2)
                in zip(out, out[1:])
                if p2 == p1 + 1 and (t1 in cs or t2 in cs)
            ]
        out = out + repeats  # KeywordRepeat originals, same positions
        if self.pattern_capture:
            # captures carry the source token's offsets
            out = out + [(cg, p, s, e) for t, p, s, e in out
                         for cg in self.capture_tokens(t)]
        if self.synonyms:
            syn = self.synonym_map
            extra = [
                (sy, p, s, e) for t, p, s, e in out for sy in syn.get(t, ())
            ]
            extra += [
                (sy, out[i][1], out[i][2], out[i + l - 1][3])
                for i, l, dsts in self._multi_matches(
                    [(t, p) for t, p, _s, _e in out]
                )
                for sy in dsts
            ]
            out = out + extra
        if self.compound_dict:
            # subwords carry the COMPOUND's offsets (the reference base
            # class leaves offsets at the original token)
            out = out + [(sub, p, s, e) for t, p, s, e in out
                         for sub in self.decompose_token(t)]
        if self.remove_duplicates:
            out = _dedupe_stream(out)
        return out

    def normalize(self, term: str) -> str:
        """Query-term normalization: lowercase + the token filters (the
        Analyzer.normalize contract — queries must meet the index's terms)."""
        if self.lowercase:
            term = term.lower()
        if self.has_token_filters:
            term = self.transform_token(term)
        return term


# Reference defaults.
StandardAnalyzer = Analyzer()  # empty stop set, like StandardAnalyzer
EnglishAnalyzer = Analyzer(stop_words=ENGLISH_STOP_WORDS)
# EnglishAnalyzer's full chain adds PorterStemFilter
# (en/EnglishAnalyzer.java:109-118); folding bundled for web text
EnglishStemAnalyzer = Analyzer(
    stop_words=ENGLISH_STOP_WORDS, stem=True, ascii_fold=True
)


def common_grams_query(tokens: "list[str]", common: "frozenset | set") \
        -> "list[str]":
    """CommonGramsQueryFilter (commongrams/CommonGramsQueryFilter.java:64):
    output bigrams whenever possible; a unigram survives only when it is
    not a member of any gram. 'the rain in spain falls mainly' →
    [the_rain, rain_in, in_spain, falls, mainly]."""
    out: list[str] = []
    in_gram = [False] * len(tokens)
    for i, t in enumerate(tokens):
        if i + 1 < len(tokens) and (t in common or tokens[i + 1] in common):
            out.append(f"{t}_{tokens[i + 1]}")
            in_gram[i] = in_gram[i + 1] = True
        if not in_gram[i]:
            out.append(t)
    return out


def _hyphenated_merge(stream):
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:
    57): raw tokens ending in '-' accumulate (hyphen dropped) and join
    with the next plain token; a chain of hyphen-ending tokens joins
    into one word. The merged token keeps the first part's start offset
    and the last part's end; positions renumber sequentially (each
    merge consumes one position, as the reference's single-token
    emission does). A trailing unpaired part gets its hyphen back."""
    pos = 0
    buf = None          # (accumulated text, start offset)
    last_end = 0
    for t, _p, s, e in stream:
        last_end = e
        if t.endswith("-"):
            buf = (t[:-1], s) if buf is None else (buf[0] + t[:-1], buf[1])
            continue
        if buf is not None:
            yield buf[0] + t, pos, buf[1], e
            buf = None
        else:
            yield t, pos, s, e
        pos += 1
    if buf is not None:
        yield buf[0] + "-", pos, buf[1], last_end


def analyzer_for_lang(lang: str) -> Analyzer:
    """Language-routed analyzer selection — the role of the reference's
    per-language analyzer registry (GermanAnalyzer, FrenchAnalyzer, … in
    lucene/analysis/{common,icu,kuromoji,nori,smartcn}). 39 routes:
    'en' gets stop words + Porter; the 23 Snowball languages
    (analysis/snowball.py + snowball_more.py: + hy/ga/lt/eu/ca/et/ne,
    eo/yi — the full snowball/ext directory) get their stemmer (tr additionally gets the dotted/dotless-i
    casing, ca/ga their article elision); el/ar/hi/id/fa and the wave
    bg/cs/lv/gl/bn/ckb/te/sr get the light-stemmer/normalizer chains
    (analysis/light_stemmers.py); ja/ko/zh get morphological lattice
    segmentation (analysis/japanese.py, korean.py, chinese.py); th gets
    the dictionary word-break (analysis/thai.py); anything else falls
    back to StandardAnalyzer. Pair with the `lang` column
    (pipelines/textstats.lang_id — script prior + trigram profiles) to
    route a multilingual crawl, e.g. as PerFieldAnalyzerWrapper-style
    field_analyzers or one index per language partition."""
    if lang == "en":
        return EnglishStemAnalyzer
    from lucene_ray.analysis.snowball import STEMMERS

    if lang == "ja":
        # kuromoji JapaneseAnalyzer role (ja/JapaneseAnalyzer.java:43):
        # morphological Viterbi segmentation (analysis/japanese.py) +
        # the chain's CJKWidthFilter (halfwidth kana / fullwidth ASCII
        # canonicalization)
        return Analyzer(ja_segment=True, cjk_width=True)
    if lang == "ko":
        # nori KoreanAnalyzer role (ko/KoreanAnalyzer.java:38): lattice
        # segmentation within each eojeol + POS stop of josa/eomi
        # (analysis/korean.py)
        return Analyzer(segment_lang="ko")
    if lang == "zh":
        # smartcn SmartChineseAnalyzer role (cn/smart/
        # SmartChineseAnalyzer.java:67): HMM-shaped lattice over the
        # seed lexicon with per-Hanzi OOV fallback (analysis/chinese.py)
        return Analyzer(segment_lang="zh")
    if lang == "th":
        # ThaiAnalyzer role (th/ThaiAnalyzer.java:33): dictionary-driven
        # word break (ThaiTokenizer / ICU dictionary segmentation role,
        # analysis/thai.py) — Thai has no inter-word spaces
        return Analyzer(segment_lang="th")
    if lang == "tr":
        # Turkish dotted/dotless i casing (TurkishLowerCaseFilter role,
        # analysis/tr/TurkishLowerCaseFilter.java:36): İ→i and I→ı must
        # fold BEFORE the generic lowercase (str.lower turns İ into
        # i+combining-dot and I into plain i, both wrong for Turkish);
        # a char-filter pair keeps the rule manifest-serializable.
        return Analyzer(stem_lang="tr",
                        char_filters=(("İ", "i"), ("I", "ı")))
    if lang == "fa":
        # PersianAnalyzer chain (fa/PersianAnalyzer.java:41): the ZWNJ
        # -> space rewrite (PersianCharFilter.java:26) splits Persian
        # compound verbs before tokenization; Arabic+Persian
        # normalization then runs as the 'fa' token filter
        return Analyzer(stem_lang="fa", char_filters=(("‌", " "),))
    if lang == "fr":
        # FrenchAnalyzer chain (fr/FrenchAnalyzer.java:56,131): the
        # ElisionFilter with DEFAULT_ARTICLES runs before the stemmer
        # (l'avion -> avion); see analysis/stem.elide for the order note
        return Analyzer(stem_lang="fr", elision=(
            "l", "m", "t", "qu", "n", "s", "j", "d", "c",
            "jusqu", "quoiqu", "lorsqu", "puisqu"))
    if lang == "it":
        # ItalianAnalyzer chain (it/ItalianAnalyzer.java:52): its own
        # article set (dell'arte -> arte)
        return Analyzer(stem_lang="it", elision=(
            "c", "l", "all", "dall", "dell", "nell", "sull", "coll",
            "pell", "gl", "agl", "dagl", "degl", "negl", "sugl",
            "un", "m", "t", "s", "v", "d"))
    if lang == "ca":
        # CatalanAnalyzer chain (ca/CatalanAnalyzer.java:121): the
        # ElisionFilter with its article set (l'home -> home) runs
        # before the Catalan Snowball stemmer
        return Analyzer(stem_lang="ca",
                        elision=("d", "l", "m", "n", "s", "t"))
    if lang == "ga":
        # IrishAnalyzer chain (ga/IrishAnalyzer.java:126): ElisionFilter
        # with d/m/b (d'fhear -> fhear; the stemmer then undoes the
        # lenition) before the Irish Snowball stemmer
        return Analyzer(stem_lang="ga", elision=("d", "m", "b"))
    if lang in STEMMERS:
        return Analyzer(stem_lang=lang)
    return StandardAnalyzer
