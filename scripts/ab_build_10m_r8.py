"""Interleaved r7-vs-r8 BUILD A/B over one persisted 10.5M transcript
corpus (VERDICT #6): fresh pinned-tree subprocess per rep, alternating,
per-stage metrics printed. Usage:
  python scripts/ab_build_10m_r8.py <transcripts> <treeA> <treeB> [reps]
"""
import os
import subprocess
import sys

tpath, tree_a, tree_b = sys.argv[1:4]
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

CHILD = r'''
import json, shutil, sys, time
tree, tpath = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
from pyspark.sql import SparkSession
from capsbm25.build import build_index
from capsbm25.config import BuildConfig
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, schema="id long").count()
cfg = BuildConfig(num_part_ids=256, shuffle_partitions=32, num_waves=2,
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  index_positions=True)
out = "/tmp/ab_build_idx"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
res = build_index(spark, spark.read.parquet(tpath), out, cfg)
dt = round(time.time() - t0, 2)
stages = {k: v.get("sec") for k, v in res.metrics.items() if "sec" in v}
import os
print("ABLINE " + json.dumps({"tree": os.path.basename(tree),
                              "build_s": dt, "N": res.N,
                              "stages": stages}), flush=True)
shutil.rmtree(out, ignore_errors=True)
spark.stop()
'''

for rep in range(reps):
    for tree in (tree_a, tree_b):
        env = dict(os.environ, PYTHONPATH=tree)
        r = subprocess.run(
            [sys.executable, "-c", CHILD, tree, tpath],
            capture_output=True, text=True, env=env, cwd=tree)
        for ln in r.stdout.splitlines():
            if ln.startswith("ABLINE"):
                print(f"rep{rep} {ln}", flush=True)
        if r.returncode != 0:
            print(f"rep{rep} tree={tree} FAILED:\n{r.stderr[-1500:]}",
                  flush=True)
