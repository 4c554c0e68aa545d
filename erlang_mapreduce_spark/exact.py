"""Order-independent numeric aggregation helpers.

IEEE-754 addition is not associative: Spark (partition-parallel partial
aggregation, the generalization of the reference's per-mapper ETS combine at
mapreduce.erl:275-282) and DuckDB sum doubles in different orders, so raw
``SUM(double)`` hashes can diverge in the low bits. Summing through DECIMAL
is exact and order-independent; casting each input double to DECIMAL rounds
identically on both engines because a double can never sit exactly on a
10^-6 half-way boundary (those are non-dyadic rationals).

Use ``dsum``/``dsum_sql`` for every double-typed SUM/AVG the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(29,6)"  # |values| < 1e9 with 6 fractional digits; sums < 1e23


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact mean: decimal sum / count, divided in double (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def dsum_sql(expr: str) -> str:
    """DuckDB equivalent of ``dsum``."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(29,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB equivalent of ``davg``."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(29,6))) AS DOUBLE) / COUNT({expr})"
    )
