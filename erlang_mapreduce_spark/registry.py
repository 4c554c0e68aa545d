"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2.B registers here via the ``@query``
decorator: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle string. ``__spark_entry__``
re-exports these as ``queries()`` / ``oracle_sql()``.

Hash-safety conventions (the driver compares row-count + schema +
order-insensitive value hash, columns sorted by name):

- Alias every computed column identically in Spark and SQL.
- Sums/avgs of doubles are order-dependent in IEEE float; both sides
  therefore sum via DECIMAL (exact, order-independent) and cast the result
  back to DOUBLE — see ``exact.py``. Ties in decimal rounding cannot occur
  for non-dyadic boundaries, so the per-row casts agree bit-for-bit.
- Transcendentals (ln/pow/stddev) may differ in the last ulp between JVM
  libm and DuckDB's — round those to 6 decimals on both sides.
- Timestamps are emitted as formatted strings (UTC session tz) to dodge
  engine-specific timestamp transport.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as operator ``name``; ``oracle`` is the DuckDB SQL
    equivalent (None ⇒ rows-only check, for non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
