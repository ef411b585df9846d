"""Interleaved r7-vs-r8 A/B on one persisted 10.5M index: each rep
spawns a fresh subprocess pinned to one tree (sys.path), alternating
A/B/A/B, so ambient-load phases hit both sides equally.
Usage: python scripts/ab_10m_r8.py <idx> <treeA> <treeB> [reps]
"""
import json
import os
import subprocess
import sys

idx, tree_a, tree_b = sys.argv[1:4]
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

CHILD = r'''
import json, os, sys, time
tree, idx = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
import pandas as pd
from pyspark.sql import SparkSession, functions as F
from capsbm25 import fixtures as fx
from capsbm25.build import (load_corpus_stats, load_dictionary,
                            load_doc_stats, load_postings)
from capsbm25.config import BuildConfig
from capsbm25.parser import query_string_topk
from capsbm25.query import bm25_topk, fuzzy_topk, sorted_topk, wildcard_topk
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, schema="id long").count()
cfg = BuildConfig(num_part_ids=256, shuffle_partitions=32, num_waves=2,
                  hot_share_threshold=0.004, max_salt_buckets=16,
                  index_positions=True)
cs = load_corpus_stats(idx); N, avgdl = cs["N"], cs["avgdl"]
postings = load_postings(spark, idx)
dictionary = load_dictionary(spark, idx)
stats = load_doc_stats(spark, idx)
queries = fx.queries_pdf(42)
first_terms = sorted({q.text.split()[0] for q in queries.itertuples(index=False)})[:8]
qf = pd.DataFrame({"query_id": range(len(first_terms)), "text": first_terms,
                   "k": [10]*len(first_terms)})
qw = qf.assign(text=[t[:3]+"*" for t in first_terms])
def qs_text(t):
    w = t.split()
    qs = [f"+{w[0]}"] + w[1:3] + [w[0][:3]+"*"]
    if len(w) > 3: qs.append(f"-{w[3]}")
    return " ".join(qs)
qqs = queries.assign(text=[qs_text(t) for t in queries["text"]])
out = {}
for name, fn in (
    ("wildcard", lambda: wildcard_topk(spark, postings, qw, cfg, dictionary=dictionary).count()),
    ("fuzzy", lambda: fuzzy_topk(spark, postings, qf, cfg, max_edits=1, dictionary=dictionary).count()),
    ("distributed", lambda: bm25_topk(spark, postings, queries, N, avgdl, cfg, mode="distributed").count()),
    ("query_string", lambda: query_string_topk(spark, postings, qqs, N, avgdl, cfg, dictionary=dictionary).count()),
    ("sorted", lambda: sorted_topk(spark, postings, queries, stats, "dl", cfg).count()),
):
    t0 = time.time(); n = fn(); out[name] = round(time.time()-t0, 3)
print("ABLINE " + json.dumps({"tree": os.path.basename(tree), **out}), flush=True)
spark.stop()
'''

for rep in range(reps):
    for tree in (tree_a, tree_b):
        # PYTHONPATH + cwd pin BOTH sides of the boundary to the tree:
        # the driver imports via sys.path, but executor python workers
        # resolve capsbm25 from PYTHONPATH/cwd — without this a child
        # mixes tree-A planning with tree-B kernels
        env = dict(os.environ, PYTHONPATH=tree)
        r = subprocess.run(
            [sys.executable, "-c", CHILD, tree, idx],
            capture_output=True, text=True, env=env, cwd=tree)
        for ln in r.stdout.splitlines():
            if ln.startswith("ABLINE"):
                print(f"rep{rep} {ln}", flush=True)
        if r.returncode != 0:
            print(f"rep{rep} tree={tree} FAILED:\n{r.stderr[-2000:]}",
                  flush=True)
