"""Round-8: re-measure + decompose the heavy surfaces on a persisted
10.5M-turn index (reuses the bench_query_scale leftover, passed as
argv[1]): wildcard, fuzzy, query_string (with phase decomposition),
sorted, distributed. 3 reps each, min reported."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.build import (load_corpus_stats, load_dictionary,
                            load_doc_stats, load_postings)
from capsbm25.config import BuildConfig
from capsbm25.parser import query_string_topk
from capsbm25.query import bm25_topk, fuzzy_topk, sorted_topk, wildcard_topk

out = sys.argv[1]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(CPUS * 4, numPartitions=CPUS).mapInPandas(
    lambda it: it, schema="id long").count()

cfg = BuildConfig(num_part_ids=256, shuffle_partitions=CPUS, num_waves=2,
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  index_positions=True)
cs = load_corpus_stats(out)
N, avgdl = cs["N"], cs["avgdl"]
postings = load_postings(spark, out)
dictionary = load_dictionary(spark, out)
stats = load_doc_stats(spark, out)
queries = fx.queries_pdf(42)
first_terms = sorted({q.text.split()[0]
                      for q in queries.itertuples(index=False)})[:8]
qf = pd.DataFrame({"query_id": range(len(first_terms)), "text": first_terms,
                   "k": [10] * len(first_terms)})
qw = qf.assign(text=[t[:3] + "*" for t in first_terms])


def qs_text(t):
    w = t.split()
    qs = [f"+{w[0]}"] + w[1:3] + [w[0][:3] + "*"]
    if len(w) > 3:
        qs.append(f"-{w[3]}")
    return " ".join(qs)


qqs = queries.assign(text=[qs_text(t) for t in queries["text"]])

timings = {}
surfaces = {
    "wildcard": lambda: wildcard_topk(
        spark, postings, qw, cfg, dictionary=dictionary).count(),
    "fuzzy": lambda: fuzzy_topk(
        spark, postings, qf, cfg, max_edits=1,
        dictionary=dictionary).count(),
    "distributed": lambda: bm25_topk(
        spark, postings, queries, N, avgdl, cfg,
        mode="distributed").count(),
    "query_string": lambda: query_string_topk(
        spark, postings, qqs, N, avgdl, cfg,
        dictionary=dictionary).count(),
    "sorted": lambda: sorted_topk(
        spark, postings, queries, stats, "dl", cfg).count(),
}
for name, fn in surfaces.items():
    for rep in range(3):
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 3)
        timings[name] = min(timings.get(name, dt), dt)
        print(f"{name} rep{rep} {dt}s rows={n}", flush=True)

# wildcard decomposition: match phase vs docs_only membership vs ranked
from capsbm25.query import (_expansion_matched, _expansion_doc_ids,
                            _term_expansion_topk)

rows = []
for q in qw.itertuples(index=False):
    pat = q.text.lower()
    rows.append((int(q.query_id), pat,
                 pat.replace("*", "%").replace("?", "_"), int(q.k)))
import re

qpdf = pd.DataFrame(rows, columns=["query_id", "pat", "like_pat", "k"])
lead = sorted({re.split(r"[*?]", p)[0] for p in qpdf["pat"]})
cond = F.col("term").startswith(lead[0])
for p_ in lead[1:]:
    cond = cond | F.col("term").startswith(p_)
for rep in range(2):
    t0 = time.time()
    matched = _expansion_matched(
        spark, postings, dictionary,
        spark.createDataFrame(qpdf.drop(columns=["pat"])),
        F.expr("term LIKE like_pat"), scan_cond=cond)
    t1 = time.time()
    n1 = _expansion_doc_ids(matched, distinct=False).count()
    t2 = time.time()
    n2 = _term_expansion_topk(matched, None, None).count()
    t3 = time.time()
    print(f"wc-decomp rep{rep}: match {t1-t0:.3f} docs_only {t2-t1:.3f} "
          f"({n1}) ranked_tail {t3-t2:.3f} ({n2})", flush=True)

# matched mass
m = matched.groupBy().agg(F.count("*"), F.sum("df")).collect()[0]
print("matched rows:", m[0], "df mass:", m[1], flush=True)
print(json.dumps({"timings": timings}), flush=True)
spark.stop()
