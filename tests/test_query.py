"""Rank-identity differential tests — the reference's test-correctness.sh
pattern (byte-compare engine vs naive oracle, :36-40) recast as: top-k
doc_ids identical, BM25 scores equal within 1e-9, across all execution
modes (pruned kernel == unpruned kernel == distributed agg == oracle)."""

import numpy as np
import pandas as pd

from capsbm25 import fixtures as fx
from capsbm25.query import bm25_topk


def _assert_rank_identical(got: pd.DataFrame, want: pd.DataFrame, queries):
    for qid in queries["query_id"]:
        g = got[got.query_id == qid].sort_values("rank")
        w = want[want.query_id == qid].sort_values("rank")
        assert list(g.doc_id) == list(w.doc_id), f"query {qid} doc_ids differ"
        assert np.allclose(g.score, w.score, atol=1e-9), f"query {qid} scores differ"
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_rank_identical_all_modes(built_index, spark):
    res, cfg = built_index["res"], built_index["cfg"]
    queries = fx.queries_pdf(42)
    want = built_index["oracle"].topk_pdf(queries)
    for mode, prune in [("kernel", True), ("kernel", False), ("distributed", False)]:
        got = bm25_topk(
            spark, built_index["postings"], queries, res.N, res.avgdl, cfg,
            mode=mode, prune=prune,
        ).toPandas()
        assert len(got) == len(want), mode
        _assert_rank_identical(got, want, queries)


def test_edge_queries(built_index, spark):
    res, cfg = built_index["res"], built_index["cfg"]
    queries = pd.DataFrame(
        {
            "query_id": np.arange(4, dtype=np.int32),
            "text": [
                fx.OOV_TERM,            # out of vocab -> 0 rows
                "",                     # empty query -> 0 rows
                fx.HOT_TERM,            # hot/salted term
                f"{fx.HOT_TERM} {fx.HOT_TERM} w0000",  # duplicate terms count once
            ],
            "k": np.array([10, 10, 5, 5], dtype=np.int32),
        }
    )
    got = bm25_topk(
        spark, built_index["postings"], queries, res.N, res.avgdl, cfg
    ).toPandas()
    want = built_index["oracle"].topk_pdf(queries)
    assert (got.query_id != 0).all() and (got.query_id != 1).all()
    _assert_rank_identical(got, want, queries)


def test_conjunctive_rank_identical(built_index, spark):
    """AND semantics (posting-list intersection) vs oracle, both modes."""
    res, cfg = built_index["res"], built_index["cfg"]
    queries = fx.queries_pdf(42)
    want = built_index["oracle"].topk_pdf(queries, conjunctive=True)
    for mode in ("kernel", "distributed"):
        got = bm25_topk(
            spark, built_index["postings"], queries, res.N, res.avgdl, cfg,
            mode=mode, conjunctive=True,
        ).toPandas()
        assert len(got) == len(want), mode
        _assert_rank_identical(got, want, queries)
    # sanity: AND results are a subset of OR results per query
    or_pdf = built_index["oracle"].topk_pdf(queries)
    assert len(want) <= len(or_pdf)


def test_validate_index_hook(built_index, spark):
    from capsbm25.validate import validate_index

    out = validate_index(spark, built_index["res"].out_dir, built_index["cfg"])
    assert out["violations"] == 0, out
    assert out["rows"] > 0


def test_k_larger_than_matches(built_index, spark):
    res, cfg = built_index["res"], built_index["cfg"]
    oracle = built_index["oracle"]
    rare = next(t for t in oracle.postings if t.startswith("rare"))
    queries = pd.DataFrame(
        {"query_id": np.array([0], dtype=np.int32), "text": [rare],
         "k": np.array([100], dtype=np.int32)}
    )
    got = bm25_topk(
        spark, built_index["postings"], queries, res.N, res.avgdl, cfg
    ).toPandas()
    assert len(got) == oracle.df(rare) == 1
    _assert_rank_identical(got, want=oracle.topk_pdf(queries), queries=queries)
