"""Mimic the driver's verify: run each __spark_entry__.queries() entry
and its oracle_sql() via DuckDB at sf0.01, compare row count + sorted
values. Exercises the same contract CORRECTNESS_r{N}.json grades."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

_args = sys.argv[1:]
# CHECK_ENTRY_JSON=<path> writes a driver-shaped per-entry record file
# (the round's SELFCHECK artifact — rows/schema/hash flags per entry)
JSON_OUT = os.environ.get("CHECK_ENTRY_JSON")
SF = _args[0] if _args and os.path.isdir(_args[0]) else "/root/testdata/sf0.01"
# remaining (non-directory) args filter which entries run; anything
# that looks like a path but doesn't exist is a typo'd SF dir — fail
# loudly instead of silently treating it as a match-nothing filter
ONLY = {a for a in _args if not os.path.isdir(a)}
_bad_paths = [a for a in ONLY if "/" in a]
if _bad_paths:
    sys.exit(f"not a directory: {_bad_paths} (SF dir typo?)")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            # ns (Spark/pandas) vs us (DuckDB) resolution is a checker
            # artifact, not a value difference — driver hashes these equal
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(list(df.columns), ignore_index=True)


qs, oracles = E.queries(), E.oracle_sql()
unknown = ONLY - qs.keys()
if unknown:
    sys.exit(f"unknown entry names: {sorted(unknown)} "
             f"(valid: {sorted(qs)})")
fails = []
records: dict = {}
n_ran = 0
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    n_ran += 1
    t0 = time.time()
    rec = {"rows_match": False, "schema_match": False,
           "hash_match": False, "spark_rows": None,
           "oracle_rows": None, "err": None}
    records[name] = rec
    try:
        got = fn(spark, SF).toPandas()
        rec["spark_rows"] = len(got)
    except Exception as ex:
        rec["err"] = f"SPARK ERROR: {str(ex)[:300]}"
        fails.append((name, f"SPARK ERROR: {ex}"))
        print(f"{name:24s} SPARK ERROR: {str(ex)[:200]}")
        continue
    if name not in oracles:
        rec["rows_only"] = True
        rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = \
            len(got) > 0
        print(f"{name:24s} rows-only: {len(got)} rows  ({time.time()-t0:.1f}s)")
        if len(got) == 0:
            fails.append((name, "0 rows"))
        continue
    try:
        want = con.sql(oracles[name]).df()
        rec["oracle_rows"] = len(want)
    except Exception as ex:
        rec["err"] = f"DUCKDB ERROR: {str(ex)[:300]}"
        fails.append((name, f"DUCKDB ERROR: {ex}"))
        print(f"{name:24s} DUCKDB ERROR: {str(ex)[:200]}")
        continue
    g, w = canon(got), canon(want)
    status = "OK"
    rec["rows_match"] = len(g) == len(w)
    if len(g) != len(w):
        status = f"ROWCOUNT {len(g)} vs {len(w)}"
    elif list(g.columns) != list(w.columns):
        status = f"COLS {list(g.columns)} vs {list(w.columns)}"
    elif [str(d) for d in g.dtypes] != [str(d) for d in w.dtypes]:
        # the driver value-hashes raw cells, so float64 910.0 vs int64 910
        # is a hash miss even when numerically equal (round-1 lesson)
        status = f"DTYPES {[str(d) for d in g.dtypes]} vs {[str(d) for d in w.dtypes]}"
    else:
        rec["schema_match"] = True
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=0, rtol=0)
            rec["hash_match"] = True
        except AssertionError as ex:
            status = "VALUES DIFFER: " + str(ex).split("\n")[-2][:150]
    if status != "OK":
        fails.append((name, status))
        rec["err"] = status[:300]
    print(f"{name:24s} {status}  rows={len(got)}  ({time.time()-t0:.1f}s)")

if JSON_OUT:
    import json
    with open(JSON_OUT, "w") as fh:
        json.dump({"sf_dir": SF, "n_ran": n_ran,
                   "n_fail": len(fails), "entries": records}, fh,
                  indent=1)
    print(f"wrote {JSON_OUT}")

print()
if n_ran == 0:
    print("NO ENTRIES RAN (filter matched nothing)")
    spark.stop()
    sys.exit(1)
print("FAILURES:" if fails else f"ALL ENTRIES MATCH ({n_ran} ran)")
for n, s in fails:
    print(" -", n, s)
spark.stop()
sys.exit(1 if fails else 0)
