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


@dataclass(frozen=True)
class Analyzer:
    """Configurable analyzer chain (tokenize -> lowercase -> stop)."""

    lowercase: bool = True
    stop_words: frozenset[str] = field(default_factory=frozenset)
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH

    def tokens(self, text: str) -> list[str]:
        """Analyzed terms of one document (order = position order)."""
        toks = tokenize(text, self.max_token_length)
        if self.lowercase:
            toks = [t.lower() for t in toks]
        if self.stop_words:
            sw = self.stop_words
            toks = [t for t in toks if t not in sw]
        return toks

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(term, position) pairs; stop-filtered tokens leave position gaps."""
        out = []
        for term, pos, _s, _e in tokenize_with_offsets(text, self.max_token_length):
            if self.lowercase:
                term = term.lower()
            if self.stop_words and term in self.stop_words:
                continue
            out.append((term, pos))
        return out

    def normalize(self, term: str) -> str:
        """Query-term normalization (Analyzer.normalize — lowercase only)."""
        return term.lower() if self.lowercase else term


# Reference defaults.
StandardAnalyzer = Analyzer()  # empty stop set, like StandardAnalyzer
EnglishAnalyzer = Analyzer(stop_words=ENGLISH_STOP_WORDS)
