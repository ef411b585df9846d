"""Query-latency scale ladder: the 30-query reference set against
indexes built from 5x-growing corpora, one JSON line per size.

Complements scripts/bench_scaling.py (build-throughput N-vs-4N, the
north-rule criterion): this measures how QUERY wall-clock grows with
corpus size on fixed hardware. With the fixture's fixed Zipf
vocabulary, hot-term posting lengths grow linearly with the corpus, so
kernel-mode latency is expected ~linear in corpus size while the
pushdown-pruned scan keeps constants small; distributed mode spreads
the same decode over tasks. Results recorded in BENCH/BASELINE.md.

Usage: python scripts/bench_query_scale.py [n_convs ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import bm25_topk

SIZES = [int(a) for a in sys.argv[1:]] or [250, 1250, 6250]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = 3

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
                  hot_share_threshold=0.004, max_salt_buckets=16)
queries = fx.queries_pdf(42)

for n_convs in SIZES:
    pdf = fx.gen_transcripts_pdf(n_convs, 42)
    out = os.path.join(tempfile.mkdtemp(prefix="qscale_"), "idx")
    t0 = time.time()
    res = build_index(spark, spark.createDataFrame(pdf), out, cfg)
    build_s = time.time() - t0
    postings = load_postings(spark, out)
    timings = {}
    n_rows = {}
    for mode in ("kernel", "distributed"):
        for _ in range(REPS):
            t0 = time.time()
            n_rows[mode] = bm25_topk(
                spark, postings, queries, res.N, res.avgdl, cfg, mode=mode,
            ).count()
            dt = round(time.time() - t0, 3)
            timings[mode] = min(timings.get(mode, dt), dt)
    print(json.dumps({
        "turns": res.N, "convs": n_convs, "cpus": CPUS,
        "build_s": round(build_s, 2),
        "query_kernel_s": timings["kernel"],
        "query_distributed_s": timings["distributed"],
        "rows": n_rows,
    }), flush=True)
