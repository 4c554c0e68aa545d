"""Local mirror of the driver's t2 check: run a registered Spark query and
its DuckDB oracle on the same sf dir, compare row count + schema shape +
order-insensitive values (floats with tight tolerance — the driver hashes,
so production queries are engineered to match exactly; the tolerance here
only localizes a failure to 'value drift' vs 'wrong rows')."""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from erlang_mapreduce_spark.registry import ORACLES, QUERIES
from erlang_mapreduce_spark.tables import TABLES

_ORACLE_SF = "sf0.01"  # static fixture paths inside oracle strings


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def driver_canon(cols, rows) -> None:
    """Replica of the driver's `_canon` preamble: load the collected rows
    into a pandas DataFrame and `sort_values` over every column (sorted by
    name). The driver canonicalizes EVERY query output this way — including
    rows-only ops — before hashing, and pandas cannot factorize list/dict
    cells (`TypeError: unhashable type: 'list'`), so any array/map/struct
    output column that survives to here fails the driver even when the
    values are right. Running it locally makes a local green imply a driver
    green; it reproduces the round-1 fn_agg_collect/multimodal_decode
    failures on the pre-fix code."""
    import pandas as pd

    order = sorted(cols)
    pdf = pd.DataFrame(list(rows), columns=list(cols))
    if len(pdf):
        pdf[order].sort_values(by=order)  # raises on unhashable cells


_SIMPLE_TYPES = {
    "string", "boolean", "byte", "short", "integer", "long", "float",
    "double", "date", "timestamp", "timestamp_ntz", "binary",
}


def assert_driver_hashable(df) -> None:
    """Schema-level guard: no output column may be array/map/struct typed
    (the driver canonicalizer dies on them — see driver_canon). Decimal
    passes too; anything complex must be stringified (array_join/to_json)
    before leaving an operator."""
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        assert tn in _SIMPLE_TYPES or tn.startswith("decimal"), (
            f"column {f.name!r} has driver-unhashable type {f.dataType.simpleString()}"
        )


def run_compare(spark, name: str, sf_dir: str) -> None:
    """Assert the Spark query matches its oracle. Raises AssertionError with
    a focused diff on mismatch."""
    q = QUERIES[name]
    sdf = q(spark, sf_dir)
    assert_driver_hashable(sdf)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    driver_canon(scols, srows)

    sql = ORACLES[name].replace(_ORACLE_SF, os.path.basename(os.path.normpath(sf_dir)))
    con = duck_con(sf_dir)
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    sc, sn = _norm_rows(scols, srows)
    dc, dn = _norm_rows(dcols, drows)
    mismatches = []
    for i, (a, b) in enumerate(zip(sn, dn)):
        if not all(_cells_equal(x, y) for x, y in zip(a, b)):
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, (
        f"{name}: value mismatch (cols={sc}); first diffs: {mismatches}"
    )
