"""Round-7 10.5M-turn profiling: (a) the near_topk bimodality seen in
BENCH logs (min-of-3 reps 2.0-2.2s in some runs, 10.5-11.0s in
others), (b) the distributed-path latency decomposition (decode+prune
kernel vs groupBy+topk tail) against the <=6s round-7 target.

Builds the 1.5M-conv (10.5M-turn) index ONCE into a fixed scratch dir
and reuses it across invocations, so reps are cheap. Usage:

    python scripts/profile_10m_r7.py [n_convs] [--fresh]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_dictionary, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import bm25_topk, near_topk

N_CONVS = 1_500_000
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if args:
    N_CONVS = int(args[0])
FRESH = "--fresh" in sys.argv
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCRATCH = f"/tmp/profile10m_r7_{N_CONVS}"

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

cfg = BuildConfig(num_part_ids=256, shuffle_partitions=CPUS, num_waves=2,
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  index_positions=True)
out = os.path.join(SCRATCH, "idx")
meta_path = os.path.join(SCRATCH, "meta.json")
if FRESH and os.path.exists(SCRATCH):
    shutil.rmtree(SCRATCH)
if os.path.exists(meta_path):
    with open(meta_path) as f:
        meta = json.load(f)
    print(json.dumps({"reused_index": out, **meta}))
else:
    os.makedirs(SCRATCH, exist_ok=True)
    tpath = os.path.join(SCRATCH, "transcripts")
    fx.gen_transcripts_spark(spark, N_CONVS, seed=42, partitions=64) \
        .write.mode("overwrite").parquet(tpath)
    corpus = spark.read.parquet(tpath)
    t0 = time.time()
    res = build_index(spark, corpus, out, cfg)
    meta = {"build_s": round(time.time() - t0, 1),
            "N": int(res.N), "avgdl": float(res.avgdl)}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    print(json.dumps({"built_index": out, **meta}))

N, avgdl = meta["N"], meta["avgdl"]
postings = load_postings(spark, out)
dictionary = load_dictionary(spark, out)
queries = fx.queries_pdf(42)

# ---- near bimodality: 6 reps, every rep printed ----
qn = pd.DataFrame(
    [(int(q.query_id), " ".join(q.text.split()[:2]), int(q.k))
     for q in queries.itertuples(index=False)
     if len(q.text.split()) >= 2],
    columns=["query_id", "text", "k"],
)
reps = []
for i in range(6):
    t0 = time.time()
    n = near_topk(spark, postings, qn, N, avgdl, cfg, window=8).count()
    reps.append(round(time.time() - t0, 3))
print(json.dumps({"surface": "near", "reps": reps, "rows": n}))

# ---- distributed decomposition ----
for mode in ("kernel", "distributed"):
    reps = []
    for i in range(3):
        t0 = time.time()
        n = bm25_topk(spark, postings, queries, N, avgdl, cfg,
                      mode=mode).count()
        reps.append(round(time.time() - t0, 3))
    print(json.dumps({"surface": mode, "reps": reps, "rows": n}))
