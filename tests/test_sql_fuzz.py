"""Randomized cross-engine fuzz of the composite-SQL suite.

The sql_* ops run the SAME SQL text on Spark and DuckDB, so any seeded
random database is a free oracle trial: generate small tables with NULL
spikes, negative/zero/extreme numerics, duplicate keys, and timestamp
ties, then require the row-for-row match the driver requires on the real
fixture. This hunts the failure classes a fixed fixture can't reach —
float boundary rows (Q17's row-vs-average threshold), empty filter
results, NULL propagation through join keys and aggregates, and year()
edges — across engines, not just within one.

Seeds are fixed (deterministic CI); each trial writes a self-contained
fixture directory so `tables.load` and the DuckDB view registration see
identical bytes.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import run_compare

SQL_OPS = (
    "sql_pricing_summary",
    "sql_top_revenue_orders",
    "sql_revenue_by_nation",
    "sql_volume_shipping",
    "sql_market_share",
    "sql_small_qty_revenue",
)

_SRC = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
_SEEDS = (7, 23, 1031)


def _ts_array(rng, n, year_lo=1990, year_hi=2031):
    """Second-precision timestamps (epoch micros), with deliberate ties."""
    secs = rng.integers(
        int(np.datetime64(f"{year_lo}-01-01").astype("datetime64[s]").astype(int)),
        int(np.datetime64(f"{year_hi}-01-01").astype("datetime64[s]").astype(int)),
        n,
    )
    # force ~10% exact ties onto one boundary-ish instant
    tie = secs[0]
    secs[rng.random(n) < 0.1] = tie
    return pa.array(secs * 1_000_000, type=pa.timestamp("us"))


def _spike(rng, arr: pa.Array, p=0.12) -> pa.Array:
    mask = rng.random(len(arr)) < p
    return pa.array(
        [None if m else v for m, v in zip(mask, arr.to_pylist())],
        type=arr.type,
    )


def _gen_dir(base: str, seed: int) -> str:
    rng = np.random.default_rng(seed)
    d = os.path.join(base, f"fuzz_{seed}")
    os.makedirs(d, exist_ok=True)

    n_nat, n_cust, n_supp, n_part = 25, 40, 15, 30
    n_ord, n_li = 120, 400

    def write(name, table):
        pq.write_table(table, os.path.join(d, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(
            ["AMERICA", "ASIA", "MIDDLE EAST", "EUROPE", "AFRICA"]
        ),
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(n_nat), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            rng.integers(0, 5, n_nat), pa.int32()
        ),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, n_nat, n_cust), pa.int32()),
        "c_acctbal": _spike(rng, pa.array(
            np.round(rng.uniform(-1000, 10000, n_cust), 2))),
        "c_mktsegment": pa.array(
            rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust)
        ),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, n_nat, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-100, 5000, n_supp), 2)),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_part)]),
        "p_brand": pa.array(
            [f"Brand#{rng.integers(1, 6)}" for _ in range(n_part)]
        ),
        "p_type": pa.array(
            rng.choice(["PROMO", "ECONOMY", "STANDARD"], n_part)
        ),
        "p_size": pa.array(rng.integers(1, 50, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(100, 2000, n_part), 2)
        ),
    }))
    write("orders", pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord)),
        "o_totalprice": pa.array(np.round(rng.uniform(0, 50000, n_ord), 2)),
        "o_orderdate": _ts_array(rng, n_ord),
        "o_orderpriority": _spike(rng, pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord))),
    }))
    # quantities include zeros and negatives — Q17's threshold comparison
    # must agree on EVERY boundary; prices include exact-tie duplicates
    qty = np.round(rng.uniform(-5, 60, n_li), 2)
    qty[rng.random(n_li) < 0.05] = 0.0
    price = np.round(rng.uniform(0, 10000, n_li), 2)
    price[rng.random(n_li) < 0.08] = 1234.56
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(1, n_ord + 1, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": _spike(rng, pa.array(qty)),
        "l_extendedprice": _spike(rng, pa.array(price), p=0.06),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": _ts_array(rng, n_li),
    }))
    # tables the SQL suite never touches: copy the real fixture bytes so
    # the DuckDB view registration (which binds every table) still works
    for t in ("events", "documents", "embeddings"):
        shutil.copyfile(
            os.path.join(_SRC, f"{t}.parquet"),
            os.path.join(d, f"{t}.parquet"),
        )
    return d


@pytest.fixture(scope="module")
def fuzz_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sql_fuzz"))
    return [_gen_dir(base, s) for s in _SEEDS]


@pytest.mark.parametrize("name", SQL_OPS)
def test_sql_op_matches_oracle_on_random_db(spark, fuzz_dirs, name):
    for d in fuzz_dirs:
        run_compare(spark, name, d)


# Every oracle-checked op whose inputs are ONLY the randomized TPC-H
# tables (discovered by scanning each op's load() calls) joins the same
# trials: deterministic-tie-break claims, NULL-key joins, and boundary
# comparisons all get exercised on data the fixed fixture can't produce.
RELATIONAL_OPS = (
    "scan_parquet", "project_select", "filter_pred",
    "join_broadcast", "join_sortmerge", "join_outer", "join_semi_anti",
    "join_skew_salted", "join_bucketed",
    "agg_hash_count", "agg_multi", "agg_distinct", "agg_grouping_sets",
    "agg_global", "agg_ratio_of_total", "agg_pivot", "agg_percentile",
    "agg_mode", "agg_unpivot", "agg_corr_stats", "agg_quantile_bins",
    "win_rank", "win_frame", "win_ntile",
    "sort_global", "topk", "topk_per_group",
    "set_union_intersect_except", "dedup_exact", "dedup_levenshtein",
    "fn_string", "fn_date", "fn_math", "fn_conditional", "fn_bitwise",
    "fn_agg_collect", "fn_nested",
    "hist_numeric", "sample_hash", "sample_stratified",
    "profile_columns", "analytics_pareto_topk",
    "graph_pagerank", "sort_zorder_layout",
)


@pytest.mark.parametrize("name", RELATIONAL_OPS)
def test_relational_op_matches_oracle_on_random_db(spark, fuzz_dirs, name):
    for d in fuzz_dirs:
        run_compare(spark, name, d)
