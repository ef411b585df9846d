"""Golden micro-fixture with hand-computed BM25 — the analog of the
reference's data/banana eyeball fixtures. Three conversations, scores
computed by hand in this file (not by the oracle)."""

import math

import numpy as np
import pandas as pd

from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import bm25_topk

# doc_id order is (conv_id, turn_idx): a/0, a/1, b/0, b/1, c/0
CORPUS = pd.DataFrame(
    {
        "conv_id": ["a", "a", "b", "b", "c"],
        "turn_idx": pd.array([0, 1, 0, 1, 0], dtype="int32"),
        "role": ["user", "assistant", "user", "assistant", "user"],
        "text": [
            "spark index spark",      # doc 0: tf(spark)=2, dl=3
            "index merge",            # doc 1
            "spark merge merge sort", # doc 2: tf(merge)=2, dl=4
            "sort",                   # doc 3
            "spark",                  # doc 4: dl=1
        ],
        "tool": ["none"] * 5,
        "ts": pd.to_datetime(["2026-01-01"] * 5),
    }
)

K1, B = 1.2, 0.75
N, AVGDL = 5, (3 + 2 + 4 + 1 + 1) / 5  # = 2.2


def _score(tf, dl, df):
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / AVGDL))


def test_golden_hand_computed(spark, tmp_path):
    cfg = BuildConfig(num_part_ids=4, shuffle_partitions=2, num_waves=2,
                      hot_share_threshold=1.0)  # no salting at this size
    out = str(tmp_path / "golden")
    res = build_index(spark, spark.createDataFrame(CORPUS), out, cfg)
    assert res.N == N and abs(res.avgdl - AVGDL) < 1e-12

    postings = load_postings(spark, out)
    by_term = {r.term: r for r in postings.collect()}
    assert set(by_term) == {"spark", "index", "merge", "sort"}
    assert by_term["spark"].df == 3 and by_term["spark"].cf == 4
    assert by_term["merge"].df == 2 and by_term["merge"].cf == 3

    queries = pd.DataFrame(
        {"query_id": np.array([0], dtype=np.int32), "text": ["spark merge"],
         "k": np.array([5], dtype=np.int32)}
    )
    got = bm25_topk(spark, postings, queries, res.N, res.avgdl, cfg).toPandas()

    # hand-computed expectations: df(spark)=3, df(merge)=2
    exp = {
        0: _score(2, 3, 3),                    # spark tf=2
        1: _score(1, 2, 2),                    # merge tf=1
        2: _score(1, 4, 3) + _score(2, 4, 2),  # spark + merge
        4: _score(1, 1, 3),                    # spark, shortest doc
    }
    expected = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got["doc_id"].tolist() == [d for d, _ in expected]
    assert np.allclose(got["score"], [s for _, s in expected], atol=1e-12)
