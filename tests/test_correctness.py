"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import ORACLES, QUERIES

from .oracle import run_compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, name):
    run_compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
