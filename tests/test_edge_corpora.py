"""Degenerate-corpus robustness: tiny and all-empty corpora must build
valid (possibly empty) indexes and answer queries without crashing."""

import numpy as np
import pandas as pd

from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import bm25_topk


def _corpus(texts):
    return pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": pd.array([0] * len(texts), dtype="int32"),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": ["none"] * len(texts),
            "ts": pd.to_datetime(["2026-01-01"] * len(texts)),
        }
    )


def _q(text, k=5):
    return pd.DataFrame(
        {"query_id": np.array([0], dtype=np.int32), "text": [text],
         "k": np.array([k], dtype=np.int32)}
    )


def test_single_doc_corpus(spark, tmp_path):
    cfg = BuildConfig(num_part_ids=4, shuffle_partitions=2, num_waves=2)
    res = build_index(
        spark, spark.createDataFrame(_corpus(["hello world hello"])),
        str(tmp_path / "one"), cfg,
    )
    assert res.N == 1 and res.avgdl == 3.0
    postings = load_postings(spark, res.out_dir)
    rows = {r.term: r for r in postings.collect()}
    assert rows["hello"].df == 1 and rows["hello"].cf == 2
    got = bm25_topk(spark, postings, _q("hello"), res.N, res.avgdl, cfg).toPandas()
    assert got["doc_id"].tolist() == [0]


def test_all_empty_texts(spark, tmp_path):
    cfg = BuildConfig(num_part_ids=4, shuffle_partitions=2, num_waves=2)
    res = build_index(
        spark, spark.createDataFrame(_corpus(["", "", ""])),
        str(tmp_path / "empty"), cfg,
    )
    assert res.N == 3 and res.avgdl == 0.0
    postings = load_postings(spark, res.out_dir)
    assert postings.count() == 0
    got = bm25_topk(spark, postings, _q("anything"), res.N, res.avgdl, cfg).toPandas()
    assert len(got) == 0
