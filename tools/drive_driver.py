"""Simulate the driver: vanilla SparkSession (NO engine configs), import
__spark_entry__ from /root/repo, run entry + ALL queries at sf0.01, compare
each oracle via DuckDB exactly like t2 (count + cols + values), and write
CORRECTNESS_local_full.json — a full-registry artifact in the driver's row
format. The real driver caps its per-round check at the first 50 registry
entries; this artifact keeps the rotated-out ops honest every round
(round-2 verdict item 4)."""
import json
import math
import os
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# vanilla session, as the driver would build it
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as ent
import duckdb

df = ent.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={df.columns}, top={rows[:2]}")

SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get("DRIVE_OUT", "/root/repo/CORRECTNESS_local_full.json")
qs, oracles = ent.queries(), ent.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


# the one shared replica of the driver's canonicalization preamble — the
# same function the pytest oracle mirror uses, so the two checks can't drift
from tests.oracle import driver_canon as canon  # noqa: E402


def norm(cols, rows):
    # every cell becomes a STRING (floats via round-9) so tuples stay
    # comparable even when a float column carries NULLs — a mixed
    # None/float column would otherwise crash sorted() with
    # "'<' not supported between float and str"
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(
            str(r[i]) if not isinstance(r[i], float)
            else ("NaN" if math.isnan(r[i]) else str(round(r[i], 9)))
            for i in idx
        ))
    return sorted(out)


fails, results = [], {}
for name in sorted(qs):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    results[name] = rec
    try:
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        canon(sdf.columns, srows)  # driver hashes rows-only ops too
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            rec["err"] = "no_oracle"
            rec["rows_match"] = len(srows) > 0
            print(f"  {name}: rows-only, {len(srows)} rows OK")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        rec["oracle_rows"] = len(drows)
        rec["schema_match"] = sorted(sdf.columns) == sorted(dcols)
        rec["rows_match"] = len(srows) == len(drows)
        rec["hash_match"] = norm(sdf.columns, srows) == norm(dcols, drows)
        ok = rec["schema_match"] and rec["rows_match"] and rec["hash_match"]
        status = "OK" if ok else (
            f"MISMATCH cols={rec['schema_match']} "
            f"cnt={rec['rows_match']} vals={rec['hash_match']}"
        )
        print(f"  {name}: {len(srows)} rows {status}")
        if not ok:
            fails.append(name)
    except Exception as e:
        rec["err"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"  {name}: ERROR {rec['err']}")
        fails.append(name)

with open(OUT, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
n_green = sum(
    1 for r in results.values()
    if (r["hash_match"] or (r["err"] == "no_oracle" and r["rows_match"]))
)
print(f"wrote {OUT}: {n_green}/{len(results)} green")
print("FAILURES:", fails if fails else "none")
