"""Plan audit: dump `.explain("formatted")` for every registered operator.

Usage: python tools/explain_audit.py [op_id ...]   (default: all)

Greps worth running on the output:
  PushedFilters     — predicates reaching the parquet scan
  ReadSchema        — column pruning (scans must not read unused columns)
  BroadcastHashJoin — dimension joins must broadcast, not shuffle
  HashAggregate     — partial/final pairs around every Exchange
  WholeStageCodegen — JVM-side spans (Python appears only in the UDF ops)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erlang_mapreduce_spark import QUERIES  # noqa: E402
from erlang_mapreduce_spark.session import get_spark  # noqa: E402

# ops that execute eagerly (streaming replay, sinks, iterative CC) are
# skipped: their final DataFrame's plan is a memory/file scan, not the
# interesting part, and building it runs the whole job
from erlang_mapreduce_spark.registry import EAGER_OPS as EAGER  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or sorted(set(QUERIES) - EAGER)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain-audit")
    jvm = spark.sparkContext._jvm
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        print(f"\n{'=' * 30} {name}")
        print(
            jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )


if __name__ == "__main__":
    main()
