"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, name):
    run_compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, sf_dir, name):
    """The driver canonicalizes rows-only outputs too (that is what broke
    round-1 multimodal_decode), so rows-only ops get the same schema guard
    and pandas-canonicalization dry run as oracle-checked ones."""
    df = QUERIES[name](spark, sf_dir)
    assert_driver_hashable(df)
    rows = [tuple(r) for r in df.collect()]
    driver_canon(df.columns, rows)
    assert len(df.schema.fields) > 0
