"""Manual end-to-end shakeout: build + query on a small corpus, compare
to the oracle. Not part of pytest (tests/ holds the real suite)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import bm25_topk
from oracle import OracleIndex

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

N_CONVS = 300
pdf = fx.gen_transcripts_pdf(N_CONVS, 42)
print(f"corpus: {len(pdf)} turns")
tdf = spark.createDataFrame(pdf)

cfg = BuildConfig(num_part_ids=64, shuffle_partitions=8, num_waves=3)
out = os.path.join(tempfile.mkdtemp(), "idx")
res = build_index(spark, tdf, out, cfg)
print("build metrics:", res.metrics)
print("plan hot terms:", res.plan.hot_terms)

postings = load_postings(spark, out)
print("postings rows:", postings.count(), "partial rows excluded")

oracle = OracleIndex(pdf)
print("oracle N", oracle.N, "engine N", res.N, "avgdl", oracle.avgdl, res.avgdl)
assert oracle.N == res.N
assert abs(oracle.avgdl - res.avgdl) < 1e-9

# postings invariants vs oracle
import numpy as np

from capsbm25.codec import decode_varints, delta_decode

rows = postings.collect()
assert len(rows) == len(oracle.postings), (len(rows), len(oracle.postings))
for r in rows[:2000]:
    docs = delta_decode(r.doc_ids)
    tfs = decode_varints(r.tfs)
    o = oracle.postings[r.term]
    assert r.df == len(o), (r.term, r.df, len(o))
    assert list(docs) == sorted(o.keys()), r.term
    assert [int(t) for t in tfs] == [o[d] for d in sorted(o)], r.term
print("postings invariants ok (checked all terms:", len(rows), ")")

queries = fx.queries_pdf(42)
for mode, prune in [("kernel", True), ("kernel", False), ("distributed", False)]:
    got = bm25_topk(
        spark, postings, queries, res.N, res.avgdl, cfg, mode=mode, prune=prune
    ).toPandas()
    want = oracle.topk_pdf(queries)
    assert len(got) == len(want), (mode, len(got), len(want))
    for qid in queries["query_id"]:
        g = got[got.query_id == qid].reset_index(drop=True)
        w = want[want.query_id == qid].reset_index(drop=True)
        assert list(g.doc_id) == list(w.doc_id), (mode, qid, list(g.doc_id)[:5], list(w.doc_id)[:5])
        assert np.allclose(g.score, w.score, atol=1e-9), (mode, qid)
    print(f"mode={mode} prune={prune}: rank-identical to oracle on {len(queries)} queries")

# --- round-3 query surfaces over the same index ---
from pyspark.sql import functions as F

from capsbm25.build import load_doc_stats
from capsbm25.query import (facet_counts, more_like_this, prefix_topk,
                            term_doc_ids)
from capsbm25.snippets import kwic_snippets

dm = load_doc_stats(spark, out)
convs = sorted(pdf["conv_id"].unique())[::3]
fdf = dm.where(F.col("conv_id").isin(convs)).select("doc_id")
fset = {i for i, c in enumerate(oracle.doc_meta["conv_id"]) if c in set(convs)}
got = bm25_topk(spark, postings, queries, res.N, res.avgdl, cfg,
                doc_filter=fdf).toPandas()
want = oracle.topk_pdf(queries, doc_filter=fset)
assert len(got) == len(want) and set(got.doc_id) <= fset
print("filtered retrieval ok:", len(got), "rows inside the filter")

neg = fx.HOT_TERM
excl = term_doc_ids(postings, [neg])
got = bm25_topk(spark, postings, queries, res.N, res.avgdl, cfg,
                doc_exclude=excl).toPandas()
assert not set(got.doc_id) & set(oracle.postings[neg])
print("MUST_NOT ok:", len(got), "rows, none containing", repr(neg))

fc = facet_counts(spark, postings, queries, dm, "conv_id", cfg).toPandas()
assert (fc.groupby("query_id")["n_docs"].sum() > 0).all()
print("facet counts ok:", len(fc), "facet rows")

pq = prefix_topk(
    spark, postings,
    queries.assign(text="w00").head(3).reset_index(drop=True), cfg,
).toPandas()
assert len(pq) > 0
print("prefix query ok:", len(pq), "rows for prefix 'w00'")

mlt = more_like_this(spark, postings, tdf, dm, [0, 5], res.N, res.avgdl,
                     cfg, k=5).toPandas()
assert len(mlt) > 0 and not (mlt.src_doc_id == mlt.doc_id).any()
print("more-like-this ok:", len(mlt), "rows, own source excluded per query")

results = bm25_topk(spark, postings, queries, res.N, res.avgdl, cfg)
snip = kwic_snippets(spark, tdf, dm, results, queries, cfg).toPandas()
assert len(snip) > 0 and (snip["snippet"].str.len() > 0).all()
print("KWIC snippets ok:", len(snip), "snippets")

print("E2E OK")
spark.stop()
