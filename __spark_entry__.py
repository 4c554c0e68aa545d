"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the erlang_mapreduce_spark package: ``entry`` runs the
flagship reference workload (bigram frequencies + probabilities,
mapreduce.erl:40-55 in canonical distributed semantics — SURVEY.md §2.3);
``queries``/``oracle_sql`` expose the SURVEY.md §2.B operator registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from erlang_mapreduce_spark import ORACLES, QUERIES, flagship  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.B."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per oracle-checkable operator. The single op
    absent here (agg_approx — engine-specific sketches) gets the
    rows-only check, and SELF-EVIDENCES: each of its rows carries exact
    companions plus |approx−exact|/exact and 0/1 ok-flag columns, so the
    recorded driver row verifies the sketch bound in-row."""
    # file-based scans read fixture files materialized from the sf0.01
    # parquet; make sure they exist before the oracle side runs.
    if os.path.isdir(SF001):
        from erlang_mapreduce_spark.sources.scans import ensure_fixtures

        ensure_fixtures(SF001)
    return dict(ORACLES)
