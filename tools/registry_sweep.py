"""Full-registry single-pass timing sweep — wall-time evidence for the
never-benched tail.

bench.py's official line covers the 35 HEADLINE ops and the detail file
adds ~25 TRACKED_ONLY medians, which leaves ~115 registered ops with no
recorded wall time at all. This sweep times EVERY registry op once at the
bench SF (one warmed pass — enough to catch a >3 s outlier, not a
substitute for the median-of-3 bench cells) and merges the result into
BENCH_local_detail.json under "sweep" (bench.py preserves that key across
full-bench rewrites, like "isolated").

Methodology: warm each op at sf0.001 first (JVM + codegen + shared-table
caches outside the timed region), release transient storage, then one
timed pass at $SPARK_GRAFT_SF_DIR. Single-pass numbers on a shared
32-thread JVM jitter ±30%; treat a sweep cell as an order-of-magnitude
screen, and send anything >3 s to tools/isolated_timing.py before
believing it.

Run on an otherwise idle machine:
    python tools/registry_sweep.py            # all 182 ops
    python tools/registry_sweep.py text_tfidf # or a subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erlang_mapreduce_spark.ckpt import (  # noqa: E402
    release_transient_storage,
    set_shared_cap,
)
from erlang_mapreduce_spark.registry import QUERIES  # noqa: E402
from erlang_mapreduce_spark.session import get_spark  # noqa: E402

OUTLIER_S = 3.0


def sweep_ops(spark, ops, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Warm each op (JVM + codegen, outside the timed region) then time one
    pass at ``sf_dir``. Warmup corpus comes from $SPARK_GRAFT_SWEEP_WARM_DIR
    (default sf0.001) and is SKIPPED if absent — a missing warmup corpus
    must not record the op as ERROR when the timed corpus works (r13 ADVICE
    item 2a). The shared-checkpoint cap is raised for the sweep's duration:
    with ~5 shared keys per corpus and the default cap of 6, each sf0.001
    warmup evicted the timed corpus's gram-set/pair-graph entries, so every
    dedup-family cell silently included a full shared-table rebuild (2b)."""
    warm_dir = os.environ.get(
        "SPARK_GRAFT_SWEEP_WARM_DIR", "/root/testdata/sf0.001"
    )
    warm = os.path.isdir(warm_dir)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    sweep: dict[str, float] = {}
    errors: dict[str, str] = {}
    prev_cap = set_shared_cap(12)  # both corpora's shared keys stay live
    try:
        for i, op in enumerate(ops, 1):
            try:
                if warm:
                    force(QUERIES[op](spark, warm_dir))
                    release_transient_storage()
                t0 = time.perf_counter()
                force(QUERIES[op](spark, sf_dir))
                sweep[op] = round(time.perf_counter() - t0, 3)
                release_transient_storage()
                print(f"[{i}/{len(ops)}] {op}: {sweep[op]:.3f}s", flush=True)
            except Exception as exc:  # record, keep sweeping
                errors[op] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"[{i}/{len(ops)}] {op}: ERROR {errors[op]}", flush=True)
    finally:
        set_shared_cap(prev_cap)  # restore the CALLER's cap, not a default
    return sweep, errors


def main() -> None:
    args = sys.argv[1:]
    # --key=NAME writes cells into detail[NAME] verbatim instead of merging
    # into the rolling "sweep" dict — bench.py uses --key=adjudication to
    # persist fresh-subprocess re-measures of every flagged regression cell
    # (r14 VERDICT task 1) without overwriting the cells being adjudicated.
    out_key = "sweep"
    if args and args[0].startswith("--key="):
        out_key = args[0][len("--key="):]
        args = args[1:]
    ops = args or list(QUERIES)
    unknown = [o for o in ops if o not in QUERIES]
    if unknown:
        print(f"unknown ops: {unknown}", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sweep, errors = sweep_ops(spark, ops, sf_dir)

    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_local_detail.json",
    )
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        detail = {}
    if out_key != "sweep":
        detail[out_key] = sweep
    else:
        prev = detail.get("sweep", {})
        if isinstance(prev, dict):
            prev.update(sweep)  # partial re-sweeps refresh only their ops
            detail["sweep"] = prev
        else:
            detail["sweep"] = sweep
    if out_key == "sweep":
        detail["sweep_meta"] = {
            "sf_dir": sf_dir,
            "methodology": "single warmed pass in a fresh subprocess JVM; "
                           "screen only — isolate >3s",
            "errors": errors,
        }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)

    outliers = sorted(
        ((op, t) for op, t in detail.get("sweep", {}).items()
         if t > OUTLIER_S),
        key=lambda kv: -kv[1],
    )
    print(f"\nswept {len(sweep)} ops -> {detail_path}")
    if outliers:
        print(f"outliers >{OUTLIER_S}s (isolate before believing):")
        for op, t in outliers:
            print(f"  {op}: {t:.3f}s")
    if errors:
        print(f"errors: {errors}")
        sys.exit(1)


if __name__ == "__main__":
    main()
