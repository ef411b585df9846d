"""t2-scale differential test (FIXTURES.md: ~20k turns): full build +
the 30-query reference set, rank-identical to the oracle through the
pruned WAND kernel. The heavyweight cousin of test_query.py — one
build, one mode, larger corpus (salting, multi-wave resume machinery,
and block pruning all exercised at a size where they matter)."""

import numpy as np

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import bm25_topk
from capsbm25.validate import validate_postings
from oracle import OracleIndex


def test_t2_rank_identical(spark, tmp_path):
    pdf = fx.gen_transcripts_pdf(2800, 42)  # ~20k turns
    assert len(pdf) > 18000
    cfg = BuildConfig(num_part_ids=128, shuffle_partitions=8, num_waves=4)
    res = build_index(
        spark, spark.createDataFrame(pdf), str(tmp_path / "t2"), cfg
    )
    postings = load_postings(spark, res.out_dir)

    v = validate_postings(postings, cfg)
    assert v["violations"] == 0, v

    oracle = OracleIndex(pdf)
    assert res.N == oracle.N and abs(res.avgdl - oracle.avgdl) < 1e-9

    queries = fx.queries_pdf(42)
    got = bm25_topk(
        spark, postings, queries, res.N, res.avgdl, cfg,
        mode="kernel", prune=True,
    ).toPandas()
    want = oracle.topk_pdf(queries)
    assert len(got) == len(want)
    for qid in queries["query_id"]:
        g = got[got.query_id == qid].sort_values("rank")
        w = want[want.query_id == qid].sort_values("rank")
        assert list(g.doc_id) == list(w.doc_id), qid
        assert np.allclose(g.score, w.score, atol=1e-9), qid
