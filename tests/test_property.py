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
