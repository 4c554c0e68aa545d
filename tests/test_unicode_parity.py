"""Cross-engine text-semantics parity: pin exactly where Spark (Java/ICU
string semantics) and DuckDB (RE2 + its own casefold) agree and where
they are KNOWN to diverge on the two primitives every text operator
builds on — `split(lower(text), '\\s+')` and `lower()`.

Why this matters: the oracle contract hash-compares engine output against
DuckDB, so any corpus content where the primitives disagree silently
breaks every downstream text oracle. The driver fixtures contain only
agreeing content; this test keeps that boundary explicit, and fails
loudly if an engine upgrade MOVES it (either newly-diverging content the
docs call safe, or newly-agreeing content the docs call divergent —
both mean the documented caveat in README/SURVEY is stale).

Known divergence classes (engine semantics are canonical — Java's full
Unicode handling is the behavior a multilingual 100 TB corpus needs;
DuckDB is only the test oracle):

- U+000B vertical tab: inside Java's \\s, outside RE2's.
- Turkish dotted capital İ: Java lowers to i + combining dot (U+0307),
  DuckDB to plain i.
- Greek final sigma: Java lower() maps word-final Σ to ς contextually,
  DuckDB maps every Σ to σ.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

AGREE = [
    "a b",       # NBSP is not \s in either engine
    "a b  c",  # line/paragraph separators: not \s in either
    "a b",       # thin space: not \s in either
    "a\r\nb",
    "a\tb c\fd",
    "a😀b c",
    "é x",      # combining accent survives lower() in both
    "",
    "   ",
    "GROẞ STRASSE",   # capital sharp-s lowers to ß in both
    "ÀÉÎÕÜ çñøå",
    "Ĳsselmeer",      # Dutch ligature
]

DIVERGE = [
    "a\x0bb",         # vertical tab
    "İstanbul",       # Turkish dotted capital I
    "ΣΙΣΥΦΟΣ",        # final-sigma casing
]


def _spark_prims(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "i long, text string"
    )
    return {
        r.i: (r.ws, r.lo)
        for r in df.select(
            "i",
            F.split(F.lower("text"), r"\s+").alias("ws"),
            F.lower("text").alias("lo"),
        ).collect()
    }


def _duck_prims(text):
    return duckdb.execute(
        "SELECT string_split_regex(lower(?), '\\s+'), lower(?)",
        [text, text],
    ).fetchone()


def test_primitives_agree_on_safe_content(spark):
    got = _spark_prims(spark, AGREE)
    for i, t in enumerate(AGREE):
        d = _duck_prims(t)
        assert got[i] == (d[0], d[1]), (
            f"{t!r}: engines newly diverge — the README parity caveat "
            f"is stale (spark={got[i]!r}, duck={d!r})"
        )


@pytest.mark.parametrize("text", DIVERGE)
def test_known_divergences_still_diverge(spark, text):
    got = _spark_prims(spark, [text])[0]
    d = _duck_prims(text)
    assert got != (d[0], d[1]), (
        f"{text!r}: engines now AGREE — remove it from the documented "
        f"divergence list"
    )


# ---------------------------------------------------------------------------
# Byte-level pre-tokenizer parity: PRETOK_BYTES_RE must extract IDENTICAL
# pre-token sequences in Java regex and RE2 on every script the byte BPE
# family budgets — including the three casefold-divergent inputs above,
# because the byte pre-tokenizer deliberately skips lower() (byte-level
# tokenizers are case-preserving), and its whitespace class is spelled
# explicitly instead of \s (Java counts U+000B in \s, RE2 does not).

BYTE_PRETOK_TEXTS = AGREE + DIVERGE + [
    "Привет мир κόσμος 世界 العربية",
    "a😀b ,。、 【brackets】",
    "ーガ ひらがな 한국어",
    "ᵃᵇ super ﬁ ligature ǅ title-case",
    "𝒳 math alphanumerics 𐍈 gothic",  # astral plane (4-byte UTF-8)
    # r13: RTL with combining marks, emoji-ZWJ, regional-indicator flags
    "النَّصُّ عَرَبِيٌّ here עִבְרִית שָׁלוֹם",
    "family 👨‍👩‍👧‍👦 flag 🏳️‍🌈 pair 🇺🇳 tail",
    "𝒽𝑒𝓁𝓁𝑜 𝔀𝓸𝓻𝓭 mixed 𐍈𐌰𐌹𐌷𐍄𐍃 runs",
]


def test_byte_pretokenizer_agrees_on_all_scripts(spark):
    from erlang_mapreduce_spark.operators.bpe import PRETOK_BYTES_RE

    df = spark.createDataFrame(
        list(enumerate(BYTE_PRETOK_TEXTS)), "i long, text string"
    )
    got = {
        r.i: r.w
        for r in df.select(
            "i",
            F.regexp_extract_all(
                "text", F.lit(PRETOK_BYTES_RE), 0
            ).alias("w"),
        ).collect()
    }
    for i, t in enumerate(BYTE_PRETOK_TEXTS):
        d = duckdb.execute(
            "SELECT regexp_extract_all(?, ?)", [t, PRETOK_BYTES_RE]
        ).fetchone()[0]
        assert got[i] == d, (
            f"{t!r}: byte pre-tokenizer diverges (spark={got[i]!r}, "
            f"duck={d!r}) — every byte-family oracle is now unsound on "
            f"such content"
        )
