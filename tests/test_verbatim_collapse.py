"""Verbatim-duplicate collapse correctness: the pair-dedup ops collapse
identical texts to one representative before their pipelines and expand
member pairs afterwards (`_verbatim_reps` / `_expand_rep_pairs` in
operators/dedup.py). The driver fixtures are mostly duplicate-free, so
this builds a corpus that is ALL cliques and near-dups and re-runs the
exact oracle comparison — every within-group pair (metric self-value),
cross-group pair (inherited representative metric), and exclusion
(short/NULL texts) flows through the expansion path.

Corpus shape:
- a 5-clique of verbatim copies (within-group: C(5,2)=10 pairs at 1.0);
- a 3-clique of a DIFFERENT text that is a near-dup of the first
  (cross-group: 5x3=15 pairs at the representative jaccard);
- two unrelated singleton docs (no pairs with anything);
- a pair of verbatim copies with < N_GRAM tokens (no grams -> excluded);
- two NULL-text docs (excluded).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import run_compare

_BASE = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "bank every single morning before the sun rises over the eastern hills"
)
_NEAR = _BASE + " and then returns home"
_DOCS = (
    [(i, _BASE, "en", "srcA", len(_BASE)) for i in range(5)]
    + [(10 + i, _NEAR, "en", "srcA", len(_NEAR)) for i in range(3)]
    + [
        (20, "completely unrelated text about database engines and "
             "distributed shuffle exchanges in query planners today",
         "en", "srcB", 100),
        (21, "another standalone document covering sailing weather "
             "patterns across northern coastal regions every winter",
         "en", "srcB", 100),
        (30, "too short", "en", "srcC", 9),
        (31, "too short", "en", "srcC", 9),
        (40, None, "en", "srcC", 0),
        (41, None, "en", "srcC", 0),
    ]
)


@pytest.fixture(scope="module")
def clique_dir(tmp_path_factory, sf_dir):
    d = str(tmp_path_factory.mktemp("clique_fixture"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", _DOCS)
    con.execute(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    # the oracle harness registers views for every table; link the rest
    # from the real fixture dir (the pair ops only read documents)
    import os
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_jaccard",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_cluster_cc",
        "dedup_cluster_keep_best",
    ],
)
def test_pair_ops_match_oracle_on_clique_corpus(spark, clique_dir, name):
    run_compare(spark, name, clique_dir)


def test_expansion_emits_expected_pair_structure(spark, clique_dir):
    from erlang_mapreduce_spark.registry import QUERIES

    rows = QUERIES["dedup_ngram_jaccard"](spark, clique_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in rows}
    # 10 within-clique-A + 3 within-clique-B at exactly 1.0
    for a in range(5):
        for b in range(a + 1, 5):
            assert pairs.get((a, b)) == 1.0
    for a, b in [(10, 11), (10, 12), (11, 12)]:
        assert pairs.get((a, b)) == 1.0
    # all 15 cross pairs present with one shared jaccard value in (0.5, 1)
    cross = {pairs[(a, 10 + b)] for a in range(5) for b in range(3)}
    assert len(cross) == 1 and 0.5 <= cross.pop() < 1.0
    # nothing else pairs: short/NULL/singleton docs are absent
    ids_in_pairs = {i for p in pairs for i in p}
    assert ids_in_pairs == set(range(5)) | {10, 11, 12}
    assert len(pairs) == 10 + 3 + 15
