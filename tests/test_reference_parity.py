"""Pin the flagship bigram semantics to the reference goldens (FIXTURES.md §2,
derived from a faithful transcription of countCombos mapreduce.erl:260-295 +
the distributed-mode filters :176-181 with totalCount excluded :222-224).

Runs the engine's declarative pipeline directly over the reference's own
bundled word lists (read-only) — the strongest parity evidence available,
since the reference ships no automated tests (SURVEY.md §5.1).
"""

from __future__ import annotations

import os

import pytest

from erlang_mapreduce_spark.operators.text import (
    bigram_freq,
    read_reference_wordlist,
)

REF = "/root/reference"

GOLDENS = {
    # file: (distinct_bigrams, total_cnt, spot_checks{bigram: cnt})
    "test.ngl": (78, 128, {"re": 5, "ve": 5, "in": 5, "ng": 5, "ar": 3}),
    "short.txt": (328, 4512, {"re": 97, "er": 91, "st": 75, "ab": 10, "ae": 1}),
    "354984si.ngl": (
        654,
        2994841,
        {"er": 64993, "in": 59416, "ti": 48339, "on": 45680, "es": 45671,
         "th": 15389, "st": 33025, "aa": 213, "zz": 561},
    ),
}


@pytest.mark.parametrize("fname", sorted(GOLDENS))
def test_reference_goldens(spark, fname):
    path = os.path.join(REF, fname)
    if not os.path.exists(path):
        pytest.skip(f"{path} not available")
    words = read_reference_wordlist(spark, path)
    result = bigram_freq(words)
    rows = {r.bigram: (r.cnt, r.prob) for r in result.collect()}
    n_distinct, total, spots = GOLDENS[fname]
    assert len(rows) == n_distinct
    assert sum(c for c, _ in rows.values()) == total
    for bg, cnt in spots.items():
        assert rows[bg][0] == cnt, f"{fname}:{bg}"
        assert rows[bg][1] == cnt / total

    # probability golden from FIXTURES.md §2.2 (IEEE double, exact)
    if fname == "short.txt":
        assert rows["re"][1] == 0.02149822695035461
        assert rows["ae"][1] == 0.00022163120567375886


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["bigram", "cnt", "prob"]
    assert abs(sum(r.prob for r in rows) - 1.0) < 1e-9
