"""Timestamp-collision + skew sweep over the events operators.

Organic event streams have hot users and clock-quantized timestamps;
the driver fixtures have neither (micro-unique ts, uniform users), so a
window ordering that silently depends on physical row order — NOT a
total order — passes every regular check and diverges between engines
(or between two runs) the first time real data collides. This fixture
quantizes every ts to the minute (mass collisions: ~40 events share
each minute at sf0.001), funnels 70% of rows onto one hot user, and
duplicates a block of event_ids at a different ts (CDC-style re-emit),
then re-runs the exact oracle comparison for every batch operator that
consumes `events`.

Streaming-replay ops are exempt (their chunk materialization sorts by
(ts, event_id), and replaying collision fixtures exercises the replay
harness, not the operators); their windowing twins ARE swept here.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import run_compare

_OPS = (
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "rollup_time_hypertable",
    "ts_gap_fill",
    "cdc_latest_by_key",
    "win_range_interval",
    "join_asof",
    "join_interval",
    "join_theta_range",
    "analytics_funnel",
    "analytics_cohort_retention",
    "fn_date",
    "fn_map_json",
    "udf_grouped",
    "udaf",
)


@pytest.fixture(scope="module")
def collision_dir(tmp_path_factory, sf_dir):
    d = str(tmp_path_factory.mktemp("ts_collision_fixture"))
    duckdb.sql(
        f"""
COPY (
    SELECT event_id,
           date_trunc('minute', ts) AS ts,
           CASE WHEN event_id % 10 < 7 THEN 7 ELSE user_id END AS user_id,
           event_type, value, props
    FROM '{sf_dir}/events.parquet'
    UNION ALL
    SELECT event_id,  -- same ids re-emitted later: CDC-style update rows
           date_trunc('minute', ts) + INTERVAL 1 DAY AS ts,
           CASE WHEN event_id % 10 < 7 THEN 7 ELSE user_id END AS user_id,
           event_type, value + 1000, props
    FROM '{sf_dir}/events.parquet'
    WHERE event_id % 50 = 0
) TO '{d}/events.parquet' (FORMAT PARQUET)
"""
    )
    import os

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", _OPS)
def test_events_op_matches_oracle_under_collisions(
    spark, collision_dir, name
):
    run_compare(spark, name, collision_dir)
