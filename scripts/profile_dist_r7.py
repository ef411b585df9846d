"""Decompose the distributed scoring path's latency on the persisted
10.5M profiling index (scripts/profile_10m_r7.py must have run first):

  scan_join_count   — In(term)-pruned scan + broadcast join only
  df_map_agg        — the per-term df aggregate (_term_df_map)
  decode_only       — Arrow transfer + varint decode of every matched
                      posting row (no scoring, no prune, no shuffle)
  no_topk           — full path minus the two top-k windows
                      (_window_topk monkeypatched to identity)
  full_distributed  — the real surface

best-of-3 each, one JSON line per piece; the deltas bucket the gap vs
the WAND kernel into decode / shuffle+agg / top-k windows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from capsbm25 import fixtures as fx
from capsbm25 import query as Q
from capsbm25.build import load_postings
from capsbm25.config import BuildConfig

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
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

with open(os.path.join(SCRATCH, "meta.json")) as f:
    meta = json.load(f)
N, avgdl = meta["N"], meta["avgdl"]
cfg = BuildConfig(num_part_ids=256, shuffle_partitions=CPUS, num_waves=2,
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  index_positions=True)
postings = load_postings(spark, os.path.join(SCRATCH, "idx"))
queries = fx.queries_pdf(42)

qt = Q._query_terms_pdf(queries, cfg)
qdf = spark.createDataFrame(qt)
terms = sorted(qt["term"].unique().tolist())
filtered = postings.where(F.col("term").isin(terms))
if "pos" in filtered.columns:
    filtered = filtered.drop("pos")
matched = filtered.join(F.broadcast(qdf), "term")


def timeit(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 3)
        best = dt if best is None else min(best, dt)
    print(json.dumps({"piece": label, "best_s": best, "out": out}),
          flush=True)


timeit("scan_join_count", lambda: matched.count())
timeit("df_map_agg", lambda: len(Q._term_df_map(filtered)))

need = ["query_id", "k", "n_query_terms", "doc_ids", "tfs", "dls",
        "term"]
decode = Q._decode_posting


def decode_rows(it):
    n = 0
    for pdf in it:
        for row in pdf.itertuples(index=False):
            docs, tfs, dls = decode(row)
            n += docs.size
    yield pd.DataFrame({"n": [n]})


timeit("decode_only", lambda: int(
    matched.select(*need).mapInPandas(decode_rows, schema="n long")
    .agg(F.sum("n")).collect()[0][0]))


def full():
    return Q.bm25_topk(spark, postings, queries, N, avgdl, cfg,
                       mode="distributed").count()


timeit("full_distributed", full)

orig = Q._window_topk
Q._window_topk = lambda scored: scored.select(
    "query_id", "doc_id", "score",
    F.lit(1).cast("int").alias("rank"))
try:
    timeit("no_topk", full)
finally:
    Q._window_topk = orig
