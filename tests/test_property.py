"""Property-based re-proof of SURVEY.md §2.3 Q1: the countCombos skip-rule
state machine (mapreduce.erl:260-295) is output-equivalent to the naive
"all overlapping adjacent pairs, keep ^[a-z]{2}$" extraction.

The survey proved this by exhaustive enumeration + fuzz + full-dataset
identity; this test keeps the proof alive against regressions in the Python
port (the declarative Spark expression is a direct transcription of the
naive form, so equivalence here covers the hot path too). Pure Python on
both sides — no Spark session needed, so hypothesis can run thousands of
examples in milliseconds.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from erlang_mapreduce_spark.functions.udfs import bigram_state_machine

_PAIR = re.compile(r"^[a-z]{2}$")


def naive_pairs(word: str) -> list[str]:
    return [
        word[i : i + 2]
        for i in range(len(word) - 1)
        if _PAIR.match(word[i : i + 2])
    ]


# the alphabet the reference's data actually exercises: letters, the
# apostrophe (contractions in test.ngl), digits, '&', and some unicode
WORD_ALPHABET = "abcz'19&é "


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=WORD_ALPHABET, max_size=12))
def test_skip_rule_equals_naive(word: str):
    assert bigram_state_machine(word) == naive_pairs(word)


@given(st.text(max_size=24))
@settings(max_examples=500, deadline=None)
def test_skip_rule_equals_naive_any_unicode(word: str):
    assert bigram_state_machine(word) == naive_pairs(word)


def test_known_edge_cases():
    assert bigram_state_machine("doesn't") == ["do", "oe", "es", "sn"]
    assert bigram_state_machine("a") == []
    assert bigram_state_machine("") == []
    assert bigram_state_machine("1st") == ["st"]
    assert bigram_state_machine("a'b") == []  # skip-2 drops the (b-less) window


# ---------------------------------------------------------------------------
# Misra-Gries sketch pass of heavy_hitters: pure-pandas generator, fuzzed
# without a Spark session. For ANY stream, ANY batch boundaries, ANY
# partition split, and ANY (k, vocab_cap), the merged candidate set must
# contain every key with global count > total/k (no false negatives — the
# exact recount then removes false positives), and each partition must emit
# at most k candidate rows plus exactly one NULL total-sentinel row.
# ---------------------------------------------------------------------------


@st.composite
def _mg_case(draw):
    vocab = draw(st.integers(min_value=1, max_value=40))
    words = draw(
        st.lists(
            st.integers(min_value=0, max_value=vocab - 1),
            min_size=0,
            max_size=300,
        )
    )
    k = draw(st.integers(min_value=2, max_value=16))
    vocab_cap = draw(st.integers(min_value=k + 1, max_value=48))
    n_parts = draw(st.integers(min_value=1, max_value=4))
    batch = draw(st.integers(min_value=1, max_value=50))
    return [f"w{w}" for w in words], k, vocab_cap, n_parts, batch


@settings(max_examples=300, deadline=None)
@given(_mg_case())
def test_mg_sketch_no_false_negatives(case):
    import pandas as pd

    from erlang_mapreduce_spark.operators.curation import mg_sketch_partition

    words, k, vocab_cap, n_parts, batch = case
    total = len(words)
    from collections import Counter

    truth = {w for w, c in Counter(words).items() if c > total / k}

    candidates: set = set()
    for p in range(n_parts):
        part = words[p::n_parts]  # deterministic round-robin split
        batches = [
            pd.DataFrame({"word": part[i : i + batch]})
            for i in range(0, len(part), batch)
        ] or [pd.DataFrame({"word": pd.Series([], dtype="object")})]
        out = pd.concat(list(mg_sketch_partition(k, vocab_cap)(iter(batches))))
        sentinel = out[out["word"].isnull()]
        emitted = out[out["word"].notnull()]
        assert len(sentinel) == 1 and int(sentinel["c"].iloc[0]) == len(part)
        assert len(emitted) <= k, "per-partition emission exceeds k"
        candidates |= set(emitted["word"])
    missing = truth - candidates
    assert not missing, (missing, total, k)


@st.composite
def _gram_hash_case(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    bits60 = st.integers(min_value=0, max_value=(1 << 60) - 1)
    return (
        draw(st.lists(bits60, min_size=n, max_size=n)),
        draw(st.lists(bits60, min_size=n, max_size=n)),
    )


@settings(max_examples=200, deadline=None)
@given(_gram_hash_case())
def test_minhash_signature_matches_pure_python(case):
    """The vectorized numpy signature (the op's hot path) must agree
    element-for-element with a direct pure-Python transcription of the
    DuckDB oracle's SQL — (h1%p + i*((h2%(p-1))+1)) % p, min over grams —
    on arbitrary 60-bit hash inputs. Guards the int64 broadcast arithmetic
    (overflow, precedence, axis) that the sf-fixture oracle comparison
    only exercises on realistic gram profiles."""
    from erlang_mapreduce_spark.operators.dedup import (
        MERSENNE_P as p,
        N_HASH,
        minhash_signature,
    )

    ghs, gh2s = case
    expect = [
        min(
            ((h1 % p) + i * ((h2 % (p - 1)) + 1)) % p
            for h1, h2 in zip(ghs, gh2s)
        )
        for i in range(N_HASH)
    ]
    assert list(minhash_signature(ghs, gh2s)) == expect
