"""Physical-plan assertions — the scale contract, checked, not hoped for.

Each test materializes an operator's final AQE plan (or the static plan
where AQE isn't triggered) and asserts the physical property the docstring
promises: pushdown reaching the scan, dimension joins broadcasting,
partial/final aggregation, bucketed joins running without an Exchange.
"""

from __future__ import annotations

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import QUERIES


def plan_of(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def final_plan_of(df) -> str:
    """Execute, then explain — AQE rewrites the plan at runtime, and the
    runtime plan is the one that must hold the property."""
    df.write.format("noop").mode("overwrite").save()
    return plan_of(df)


def test_scan_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(QUERIES["scan_parquet"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p or "GreaterThan" in p
    # column pruning: the 16-column lineitem scan reads exactly 5 columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        in p.replace("l_partkey:bigint,", "")
        or p.count(":") > 0
    )
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert read_schema.count(",") == 4, read_schema  # 5 columns


def test_dimension_join_broadcasts(spark, sf_dir):
    p = plan_of(QUERIES["join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def count_nodes(p: str, name: str) -> int:
    """Count plan NODES (formatted explain prints each node twice: once in
    the tree, once in the detail section — count only detail headers)."""
    import re

    return len(re.findall(rf"^\(\d+\) {name}\b", p, flags=re.M))


def test_agg_partial_final_pair(spark, sf_dir):
    p = plan_of(QUERIES["agg_hash_count"](spark, sf_dir))
    assert "partial_count" in p  # map-side combine before the Exchange
    assert count_nodes(p, "HashAggregate") == 2
    assert count_nodes(p, "Exchange") == 1  # exactly one keyed shuffle


def test_sortmerge_agg_reuses_join_partitioning(spark, sf_dir):
    # the groupBy on the join key must NOT add a second Exchange
    p = final_plan_of(QUERIES["join_sortmerge"](spark, sf_dir))
    assert count_nodes(p, "Exchange") <= 2  # one per join side, none for agg


def test_bucketed_join_no_exchange(spark, sf_dir):
    p = plan_of(QUERIES["join_bucketed"](spark, sf_dir))
    assert "Bucketed: true" in p
    assert "Exchange" not in p, p  # co-located join AND aggregate


def test_ratio_of_total_no_single_partition_window(spark, sf_dir):
    # the global total must be a broadcast scalar (BroadcastNestedLoopJoin
    # over a 1-row relation), not a partition-less window funneling all
    # rows through one task
    p = plan_of(QUERIES["agg_ratio_of_total"](spark, sf_dir))
    assert count_nodes(p, "Window") == 0
    assert "BroadcastNestedLoopJoin" in p


def test_partition_pruning_reaches_scan(spark, sf_dir):
    p = plan_of(QUERIES["scan_partition_pruned"](spark, sf_dir))
    assert "PartitionFilters" in p
    line = [l for l in p.splitlines() if "PartitionFilters" in l][0]
    assert "o_orderpriority" in line and "IN (1-URGENT,2-HIGH" in line, line
