"""Round-8: decompose fuzzy/wildcard bench latency on the persistent
profiling index: dictionary-match job vs postings decode+topk job, and
matched-term/df-mass counts."""
import sys
import time

import pandas as pd

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from capsbm25 import fixtures as fx
from capsbm25.build import load_corpus_stats, load_dictionary, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import fuzzy_topk, wildcard_topk

out = "/dev/shm/capsprof_idx/idx"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, schema="id long").count()

cfg = BuildConfig(shuffle_partitions=64, num_waves=2)
postings = load_postings(spark, out)
dictionary = load_dictionary(spark, out)
queries = fx.queries_pdf(42)
first_terms = sorted({q.text.split()[0] for q in queries.itertuples(index=False)})[:8]
qf = pd.DataFrame({"query_id": range(len(first_terms)), "text": first_terms,
                   "k": [10] * len(first_terms)})
qw = qf.assign(text=[t[:3] + "*" for t in first_terms])

# full costs, warm (3 reps each)
for name, fn in (
    ("fuzzy", lambda: fuzzy_topk(spark, postings, qf, cfg, max_edits=1,
                                 dictionary=dictionary).count()),
    ("wildcard", lambda: wildcard_topk(spark, postings, qw, cfg,
                                       dictionary=dictionary).count()),
):
    for rep in range(3):
        t0 = time.time()
        n = fn()
        print(f"{name} rep{rep} {time.time()-t0:.3f}s rows={n}", flush=True)

# decomposition: dictionary-match phase alone (mirror _expansion_matched)
from capsbm25.query import _expansion_matched, _fuzzy_scan_cond

rows = []
for q in qw.itertuples(index=False):
    pat = q.text.lower()
    rows.append((int(q.query_id), pat, pat.replace("*", "%").replace("?", "_"), int(q.k)))
qpdf = pd.DataFrame(rows, columns=["query_id", "pat", "like_pat", "k"])
import re
lead = sorted({re.split(r"[*?]", p)[0] for p in qpdf["pat"]})
scan_cond = F.col("term").startswith(lead[0])
for p_ in lead[1:]:
    scan_cond = scan_cond | F.col("term").startswith(p_)

for rep in range(3):
    t0 = time.time()
    matched = _expansion_matched(
        spark, postings, dictionary,
        spark.createDataFrame(qpdf.drop(columns=["pat"])),
        F.expr("term LIKE like_pat"), scan_cond=scan_cond)
    t1 = time.time()
    n = matched.count()
    print(f"wildcard match-phase rep{rep}: dict+collect {t1-t0:.3f}s "
          f"pruned-join count {time.time()-t1:.3f}s matched_rows={n}",
          flush=True)

# matched stats
stats = matched.groupBy("query_id").agg(
    F.countDistinct("term"), F.sum("df")).toPandas()
print(stats.to_string(), flush=True)
spark.stop()
