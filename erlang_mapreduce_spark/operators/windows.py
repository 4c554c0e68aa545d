"""Window-function operators (SURVEY.md §2.B "Window functions") — ranking,
analytic (lag/lead/first), and frame-based running/sliding aggregates.

All are single-shuffle plans: one Exchange on the partition key, one sort
within partitions, then the WindowExec runs pipelined. Orderings are always
TOTAL (unique tie-break column included) so results are deterministic —
a window over a non-total order is a latent nondeterminism bug that only
shows up when partitioning changes (e.g. at real scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "win_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       row_number() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC) AS rnk,
       dense_rank() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC) AS drnk
FROM customer
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per nation by balance. row_number gets
    a unique tie-break; rank/dense_rank are tie-stable by definition."""
    c = load(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


@query(
    "win_analytic",
    oracle="""
SELECT event_id,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       first_value(value) OVER w AS first_value,
       lag(event_type, 2, 'none') OVER w AS prev2_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / offset-with-default per user timeline."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


@query(
    "win_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(29,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(29,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS moving_avg3
FROM orders
""",
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average per customer order history.
    Frame sums go through DECIMAL: engines implement sliding frames with
    different accumulation strategies (e.g. pairwise vs subtract-on-slide),
    so float frame-sums are NOT reproducible across engines — decimal is."""
    o = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(29,6)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec).over(run).cast("double").alias("running_total"),
        (F.sum(dec).over(mov).cast("double") / F.count("*").over(mov)).alias(
            "moving_avg3"
        ),
    )
