"""Simulate the driver: vanilla SparkSession (NO engine configs), import
__spark_entry__ from /root/repo, run entry + all queries at sf0.01, compare
each oracle via DuckDB exactly like t2 (count + cols + values)."""
import sys, os, math
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
qs, oracles = ent.queries(), ent.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) if not isinstance(r[i], float) else round(r[i], 9) for i in idx))
    return sorted(out)

fails = []
for name in sorted(qs):
    try:
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows OK")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(sdf.columns) == sorted(dcols)
        ok_cnt = len(srows) == len(drows)
        ok_vals = norm(sdf.columns, srows) == norm(dcols, drows)
        status = "OK" if (ok_cols and ok_cnt and ok_vals) else f"MISMATCH cols={ok_cols} cnt={ok_cnt} vals={ok_vals}"
        print(f"  {name}: {len(srows)} rows {status}")
        if "MISMATCH" in status: fails.append(name)
    except Exception as e:
        print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
print("FAILURES:", fails if fails else "none")
