"""Capture .explain('formatted') for the round-8-touched declared
queries, from a given tree, into plans/r08/<entry>_<suffix>.txt.
Usage: python scripts/dump_plans_r8.py <tree> <suffix> [entry ...]
Run once with the round-start worktree (suffix=before) and once with
the current tree (suffix=after)."""
import os
import sys

tree, suffix = sys.argv[1], sys.argv[2]
entries = sys.argv[3:] or [
    "wildcard_topk", "fuzzy_topk", "prefix_topk", "term_range_topk",
    "query_string", "rescore_topk", "bm25_topk",
]
sys.path.insert(0, tree)
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import importlib  # noqa: E402

E = importlib.import_module("__spark_entry__")
qs = E.queries()
os.makedirs("/root/repo/plans/r08", exist_ok=True)
for name in entries:
    fn = qs[name]
    df = fn(spark, "/root/testdata/sf0.001")
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    out = f"/root/repo/plans/r08/{name}_{suffix}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(out, len(txt.splitlines()), "lines", flush=True)
spark.stop()
