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
from pyspark.sql import functions as F

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
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  # round 5: the ladder index carries positions so the
                  # NEAR surface rides the same index as the others
                  # (bm25 modes never read the pos column — pruned)
                  index_positions=True)
queries = fx.queries_pdf(42)

for n_convs in SIZES:
    import pandas as pd

    from capsbm25.build import load_dictionary
    from capsbm25.query import (boolean_topk, fuzzy_topk, near_topk,
                                wildcard_topk)

    scratch = os.path.join(tempfile.mkdtemp(prefix="qscale_"))
    if n_convs > 200_000:
        # driver-side pandas gen is fine at ladder sizes but takes
        # minutes (and GBs) at 10.5M turns — generate in-Spark and
        # read back, exactly like bench.py's headline path
        tpath = os.path.join(scratch, "transcripts")
        fx.gen_transcripts_spark(spark, n_convs, seed=42, partitions=64) \
            .write.mode("overwrite").parquet(tpath)
        corpus = spark.read.parquet(tpath)
    else:
        corpus = spark.createDataFrame(fx.gen_transcripts_pdf(n_convs, 42))
    out = os.path.join(scratch, "idx")
    t0 = time.time()
    res = build_index(spark, corpus, out, cfg)
    build_s = time.time() - t0
    postings = load_postings(spark, out)
    dictionary = load_dictionary(spark, out)
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

    # round-4 query surfaces at scale (mirrors bench.py's query mix)
    qb = pd.DataFrame(
        [(int(q.query_id), q.text.split()[0],
          " ".join(q.text.split()[1:]), fx.HOT_TERM, int(q.k))
         for q in queries.itertuples(index=False)],
        columns=["query_id", "must", "should", "must_not", "k"],
    )
    qn = pd.DataFrame(
        [(int(q.query_id), " ".join(q.text.split()[:2]), int(q.k))
         for q in queries.itertuples(index=False)
         if len(q.text.split()) >= 2],
        columns=["query_id", "text", "k"],
    )
    first_terms = sorted({q.text.split()[0]
                          for q in queries.itertuples(index=False)})[:8]
    qf = pd.DataFrame({"query_id": range(len(first_terms)),
                       "text": first_terms,
                       "k": [10] * len(first_terms)})
    qw = qf.assign(text=[t[:3] + "*" for t in first_terms])
    # round-6 surfaces: parser (mixed-clause strings), suggesters,
    # field-sorted retrieval
    from capsbm25.build import load_doc_stats
    from capsbm25.parser import query_string_topk
    from capsbm25.query import sorted_topk
    from capsbm25.suggest import suggest_spelling, suggest_terms

    def qs_text(t):
        w = t.split()
        qs = [f"+{w[0]}"] + w[1:3] + [w[0][:3] + "*"]
        if len(w) > 3:
            qs.append(f"-{w[3]}")
        return " ".join(qs)

    qqs = queries.assign(text=[qs_text(t) for t in queries["text"]])
    qsug = qf.assign(text=[t[:3] for t in first_terms])
    qsp = qf.assign(text=["x" + t[1:] for t in first_terms])
    stats = load_doc_stats(spark, out)
    fdf = stats.where(F.pmod(F.col("doc_id"), F.lit(3)) == 0) \
               .select("doc_id")
    surfaces = {
        # bench.py's 1-in-3 metadata filter (auto mode: kernel-sized
        # broadcasts below max_kernel_filter, distributed beyond)
        "filtered": lambda: bm25_topk(
            spark, postings, queries, res.N, res.avgdl, cfg,
            doc_filter=fdf).count(),
        "boolean": lambda: boolean_topk(
            spark, postings, qb, res.N, res.avgdl, cfg).count(),
        "near": lambda: near_topk(
            spark, postings, qn, res.N, res.avgdl, cfg, window=8).count(),
        "fuzzy": lambda: fuzzy_topk(
            spark, postings, qf, cfg, max_edits=1,
            dictionary=dictionary).count(),
        "wildcard": lambda: wildcard_topk(
            spark, postings, qw, cfg, dictionary=dictionary).count(),
        "query_string": lambda: query_string_topk(
            spark, postings, qqs, res.N, res.avgdl, cfg,
            dictionary=dictionary).count(),
        "suggest_terms": lambda: suggest_terms(
            spark, postings, qsug, cfg, dictionary=dictionary).count(),
        "suggest_spelling": lambda: suggest_spelling(
            spark, postings, qsp, cfg, dictionary=dictionary).count(),
        "sorted": lambda: sorted_topk(
            spark, postings, queries, stats, "dl", cfg).count(),
    }
    for name, fn in surfaces.items():
        for _ in range(REPS):
            t0 = time.time()
            n_rows[name] = fn()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps({
        "turns": res.N, "convs": n_convs, "cpus": CPUS,
        "build_s": round(build_s, 2),
        "query_kernel_s": timings["kernel"],
        "query_distributed_s": timings["distributed"],
        **{f"query_{k}_s": timings[k] for k in surfaces},
        "rows": n_rows,
    }), flush=True)
