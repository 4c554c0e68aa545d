"""Isolated per-op re-timing — the drift adjudicator.

Full-bench totals on this VM drift ±20-30% run-to-run (ambient, see
SCALING.md / project memory), so apparent per-op regressions in a round's
BENCH file are judged on ISOLATED timings instead: a fresh session, the
op warmed once at sf0.001, then 3 passes at the bench SF with
release_transient_storage between passes — bench.py methodology, minus
the 34 other queries heating the JVM. Results merge into
BENCH_local_detail.json under "isolated" (bench.py preserves that key).

Run on an otherwise idle machine:
    python tools/isolated_timing.py dedup_minhash sim_search_ann
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erlang_mapreduce_spark.ckpt import release_transient_storage  # noqa: E402
from erlang_mapreduce_spark.registry import QUERIES  # noqa: E402
from erlang_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ops = sys.argv[1:]
    if not ops:
        print("usage: isolated_timing.py <op> [<op> ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolated-timing")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for op in ops:
        force(QUERIES[op](spark, "/root/testdata/sf0.001"))  # warmup
        release_transient_storage()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(QUERIES[op](spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
            release_transient_storage()
        results[op] = {"passes": ts, "median": sorted(ts)[1]}
        print(op, results[op])

    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_local_detail.json",
    )
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        detail = {}
    detail.setdefault("isolated", {}).update(results)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)


if __name__ == "__main__":
    main()
