"""KWIC snippet extraction vs a naive Python oracle (differential
pattern of /root/reference/utils/test-correctness.sh recast)."""

import numpy as np
import pandas as pd

from capsbm25 import fixtures as fx
from capsbm25.query import bm25_topk
from capsbm25.snippets import kwic_snippets


def _naive_kwic(oracle, results: pd.DataFrame, queries: pd.DataFrame,
                window: int = 3) -> pd.DataFrame:
    from capsbm25.tokenize import tokenize_py

    qterms = {int(q.query_id): sorted(set(tokenize_py(q.text)))
              for q in queries.itertuples(index=False)}
    rows = []
    for r in results.itertuples(index=False):
        toks = oracle.docs[int(r.doc_id)]
        terms = qterms[int(r.query_id)]
        pos = [i for i, t in enumerate(toks) if t in terms]
        if not pos:
            continue
        i = pos[0]
        rows.append((int(r.query_id), int(r.doc_id), i,
                     " ".join(toks[max(0, i - window):i + window + 1])))
    return pd.DataFrame(
        rows, columns=["query_id", "doc_id", "first_pos", "snippet"]
    )


def _doc_map(built_index, spark):
    from capsbm25.build import load_doc_stats

    return load_doc_stats(spark, built_index["res"].out_dir)


def test_kwic_matches_naive(built_index, spark):
    res, cfg = built_index["res"], built_index["cfg"]
    queries = fx.queries_pdf(42)
    results = bm25_topk(
        spark, built_index["postings"], queries, res.N, res.avgdl, cfg
    )
    corpus = spark.createDataFrame(built_index["pdf"])
    got = (
        kwic_snippets(spark, corpus, _doc_map(built_index, spark),
                      results, queries, cfg)
        .toPandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    want = _naive_kwic(
        built_index["oracle"], results.toPandas(), queries
    ).sort_values(["query_id", "doc_id"], ignore_index=True)
    # BM25 results always contain >= 1 query term -> nothing dropped
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # window clipping: every snippet is 1..2*window+1 tokens
    n_toks = got["snippet"].str.split().str.len()
    assert ((n_toks >= 1) & (n_toks <= 7)).all()


def test_kwic_drops_docs_without_terms(built_index, spark):
    """A fabricated result row pointing at a doc without the query term
    is dropped, not errored."""
    cfg = built_index["cfg"]
    oracle = built_index["oracle"]
    term = next(t for t in oracle.postings if t.startswith("rare"))
    hit = next(iter(oracle.postings[term]))
    miss = next(d for d in range(oracle.N) if d not in oracle.postings[term])
    queries = pd.DataFrame(
        {"query_id": np.array([0], dtype=np.int32), "text": [term],
         "k": np.array([5], dtype=np.int32)}
    )
    results = spark.createDataFrame(
        pd.DataFrame({"query_id": np.array([0, 0], dtype=np.int32),
                      "doc_id": np.array([hit, miss], dtype=np.int64)})
    )
    corpus = spark.createDataFrame(built_index["pdf"])
    got = kwic_snippets(
        spark, corpus, _doc_map(built_index, spark), results, queries, cfg
    ).toPandas()
    assert list(got["doc_id"]) == [hit]
    assert term in got["snippet"].iloc[0].split()


def test_kwic_empty_results(built_index, spark):
    cfg = built_index["cfg"]
    queries = pd.DataFrame(
        {"query_id": np.array([0], dtype=np.int32), "text": ["zzz"],
         "k": np.array([5], dtype=np.int32)}
    )
    results = spark.createDataFrame([], "query_id int, doc_id long")
    corpus = spark.createDataFrame(built_index["pdf"])
    got = kwic_snippets(
        spark, corpus, _doc_map(built_index, spark), results, queries, cfg
    ).toPandas()
    assert len(got) == 0


def test_kwic_rejects_unknown_query_ids(built_index, spark):
    """Round-6 review: result rows whose query_id is missing from the
    queries frame used to be dropped silently — indistinguishable from
    the documented no-term-match skip."""
    import pytest

    from capsbm25.build import load_doc_stats

    res, cfg = built_index["res"], built_index["cfg"]
    q = fx.queries_pdf(42).head(1)
    hits = bm25_topk(spark, built_index["postings"], q, res.N,
                     res.avgdl, cfg)
    stale = q.assign(query_id=q["query_id"] + 1000)
    with pytest.raises(ValueError, match="absent from the queries"):
        kwic_snippets(
            spark, spark.createDataFrame(built_index["pdf"]),
            load_doc_stats(spark, res.out_dir), hits, stale, cfg,
        ).count()
