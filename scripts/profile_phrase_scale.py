"""Diagnose phrase-query latency at the 1.05M-turn positional index:
build once, print per-term df/bytes for the probe phrases, then time
kernel vs distributed modes separately. Used to chase the round-3
finding that the 8-phrase probe set jumped 1.6s (211k turns) ->
~90s (1.05M turns)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import _term_stats_map, phrase_topk
from capsbm25.tokenize import tokenize_py

N_CONVS = int(os.environ.get("PHRASE_DIAG_CONVS", "150000"))

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cfg = BuildConfig(num_part_ids=256, shuffle_partitions=32, num_waves=2,
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  index_positions=True)
pdf = fx.gen_transcripts_pdf(N_CONVS, 42)
out = os.path.join(tempfile.mkdtemp(prefix="pdiag_"), "idx")
t0 = time.time()
res = build_index(spark, spark.createDataFrame(pdf), out, cfg)
print("build_s", round(time.time() - t0, 1), "turns", res.N, flush=True)
postings = load_postings(spark, out)

texts = []
for t in pdf.sort_values(["conv_id", "turn_idx"])["text"].head(200):
    toks = tokenize_py(t or "")
    if len(toks) >= 5:
        texts.append(" ".join(toks[2:5]))
    if len(texts) == 8:
        break
queries = pd.DataFrame({"query_id": np.arange(8, dtype=np.int32),
                        "text": texts, "k": np.full(8, 10, np.int32)})

terms = sorted({t for x in texts for t in tokenize_py(x)})
dfm, bm = _term_stats_map(postings.where(F.col("term").isin(terms)))
print("top per-term (df, KiB):",
      sorted(((dfm[t], bm[t] // 1024, t) for t in dfm), reverse=True)[:6],
      flush=True)

for mode in ("distributed", "kernel"):
    t0 = time.time()
    n = phrase_topk(spark, postings, queries, res.N, res.avgdl, cfg,
                    mode=mode).count()
    print(mode, round(time.time() - t0, 2), "rows", n, flush=True)
