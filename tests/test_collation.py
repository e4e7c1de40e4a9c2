"""Collation sort keys (analysis/collation.py) — every ordering
assertion is validated against ICU ITSELF via DuckDB's bundled ICU
collations, so the secondary-weight table can't drift from the real
locale data."""

import duckdb
import pytest

from lucene_ray.analysis.collation import (SUPPORTED_LOCALES,
                                           add_collation_key,
                                           collation_key,
                                           collation_key_hex)

VOCAB = {
    "de": ["zebra", "Äpfel", "apfel", "östlich", "ångström", "Ober",
           "oben", "uber", "über", "schon", "schön", "Haus", "hause",
           "häuser", "bar", "bär", "baren"],
    "sv": ["zebra", "ärlig", "apa", "örn", "ångström", "val", "våt",
           "vän", "ost", "öst", "alla", "Älv", "zon"],
    "da": ["zebra", "æble", "ø", "åben", "and", "Ørn", "sø", "sol",
           "aero"],
    "en": ["resume", "résumé", "Resume", "cote", "côte", "coté",
           "côté", "cotée"],
    "fi": ["zebra", "äiti", "apu", "öljy", "åland"],
    # Turkish alphabet order + the I/ı casing rule: Istanbul (capital
    # dotless-I word) sorts at ı, İzmir at i
    "tr": ["cam", "çam", "dag", "gol", "hal", "ılık", "ince", "otel",
           "öte", "su", "şu", "ucuz", "üzüm", "zebra", "Istanbul",
           "istanbul", "İzmir", "izmir"],
}


def icu_order(words, locale):
    con = duckdb.connect()
    ph = ",".join("(?)" for _ in words)
    return [r[0] for r in con.execute(
        f"SELECT s FROM (VALUES {ph}) t(s) ORDER BY s COLLATE {locale}",
        words).fetchall()]


class TestAgainstICU:
    @pytest.mark.parametrize("locale", sorted(VOCAB))
    def test_matches_icu(self, locale):
        words = VOCAB[locale]
        assert sorted(words, key=lambda w: collation_key(w, locale)) \
            == icu_order(words, locale)

    def test_cross_locale_divergence(self):
        # the SAME words order differently under de vs sv tailoring
        words = ["zebra", "Äpfel", "östlich", "apfel"]
        de = sorted(words, key=lambda w: collation_key(w, "de"))
        sv = sorted(words, key=lambda w: collation_key(w, "sv"))
        assert de == icu_order(words, "de")
        assert sv == icu_order(words, "sv")
        assert de != sv


class TestKeyProperties:
    def test_hex_preserves_order(self):
        words = VOCAB["de"]
        bykey = sorted(words, key=lambda w: collation_key(w, "de"))
        byhex = sorted(words, key=lambda w: collation_key_hex(w, "de"))
        assert bykey == byhex

    def test_levels(self):
        # case is tertiary: differs only in the last segment
        a, b = collation_key("ober", "de"), collation_key("Ober", "de")
        assert a != b and a < b
        # accent is secondary: primary prefixes equal
        p = collation_key("schon", "de")
        q = collation_key("schön", "de")
        assert p[: 2 * 5] == q[: 2 * 5] and p < q

    def test_supported_locales_all_produce_keys(self):
        for loc in SUPPORTED_LOCALES:
            assert collation_key("abc", loc)


class TestDatasetStage:
    def test_add_collation_key_sort(self, ray_session):
        import pyarrow as pa
        import ray.data

        words = VOCAB["de"]
        ds = ray.data.from_arrow(pa.table({"w": words}))
        out = add_collation_key(ds, "w", locale="de", key_col="k")
        got = [r["w"] for r in out.sort("k").take_all()]
        assert got == icu_order(words, "de")
