"""Multi-field term-key encoding.

The reference's first abstraction is a Document of named Fields with
per-field postings, norms and stats (document/Document.java:40,
index/FieldInfos.java). Ray-Data translation: ONE term dictionary per
segment, with non-default fields' terms key-prefixed as

    "\\x01" + field + "\\x1f" + term

\\x01 sorts below every character the analyzer can emit (lowercase ASCII
word chars), so all field sections sit BEFORE the default field's plain
terms in the sorted dictionary and a default-field prefix/range scan can
never leak into a field section (and vice versa — a field scan is a plain
prefix range over its section). Per-field norms/lengths live as
``norm_<field>`` / ``len_<field>`` columns in docs.parquet; the default
field keeps the legacy unprefixed terms and ``norm``/``doc_len`` columns,
so single-field indexes are byte-identical to the round-1 layout.
"""

from __future__ import annotations

FIELD_MARK = "\x01"
FIELD_SEP = "\x1f"


def field_key(field: str | None, term: str) -> str:
    """Storage key for ``term`` in ``field`` (None = default field)."""
    if field is None:
        return term
    return f"{FIELD_MARK}{field}{FIELD_SEP}{term}"


def field_prefix(field: str) -> str:
    """Prefix delimiting ``field``'s section of the term dictionary."""
    return f"{FIELD_MARK}{field}{FIELD_SEP}"


def split_key(key: str) -> tuple[str | None, str]:
    """(field, term) of a storage key; field None for the default field."""
    if key.startswith(FIELD_MARK):
        f, _, t = key[1:].partition(FIELD_SEP)
        return f, t
    return None, key
