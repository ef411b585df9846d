"""Proximity (NEAR / SpanNearQuery) search over positional postings —
differential against a brute-force oracle across kernel, distributed
(incl. forced over-cap) and auto modes, ordered and unordered, plus the
phrase == ordered-NEAR(window=len) equivalence."""

import numpy as np
import pandas as pd
import pytest

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import near_topk, phrase_topk
from oracle import OracleIndex


@pytest.fixture(scope="module")
def near_index(spark, tmp_path_factory):
    pdf = fx.gen_transcripts_pdf(100, 17)
    cfg = BuildConfig(num_part_ids=32, shuffle_partitions=8, num_waves=2,
                      hot_share_threshold=0.004, max_salt_buckets=8,
                      index_positions=True)
    out = str(tmp_path_factory.mktemp("nearidx") / "t1")
    res = build_index(spark, spark.createDataFrame(pdf), out, cfg)
    return {"pdf": pdf, "cfg": cfg, "res": res,
            "postings": load_postings(spark, out),
            "oracle": OracleIndex(pdf)}


def _near_queries(oracle):
    """Term pairs/triples at varied distances, from real docs."""
    texts = []
    for doc_id in (0, 9, 33, 71):
        toks = oracle.docs[doc_id]
        d = list(dict.fromkeys(toks))
        if len(d) >= 6:
            texts.append(f"{d[0]} {d[4]}")          # scattered pair
            texts.append(f"{d[1]} {d[2]} {d[5]}")   # scattered triple
    texts.append(f"{fx.HOT_TERM} w0000")            # hot-term pair
    texts.append(f"w0000 {fx.OOV_TERM}")            # OOV term
    return texts[:8]


def _want(oracle, queries, window, ordered):
    rows = []
    for q in queries.itertuples(index=False):
        for rank, (d, s) in enumerate(
            oracle.near_topk(q.text, window, int(q.k), ordered=ordered), 1
        ):
            rows.append((int(q.query_id), d, s, rank))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "score", "rank"])


def _check(got, want, queries, tag):
    assert len(got) == len(want), tag
    for qid in queries["query_id"]:
        g = got[got.query_id == qid].sort_values("rank")
        w = want[want.query_id == qid].sort_values("rank")
        assert list(g.doc_id) == list(w.doc_id), (tag, qid)
        assert np.allclose(g.score, w.score, atol=1e-9), (tag, qid)


@pytest.mark.parametrize("window,ordered", [
    (3, False), (8, False), (20, False), (3, True), (8, True),
])
def test_near_rank_identical_to_oracle(near_index, spark, window, ordered):
    res, cfg, oracle = (near_index["res"], near_index["cfg"],
                        near_index["oracle"])
    texts = _near_queries(oracle)
    queries = pd.DataFrame({
        "query_id": np.arange(len(texts), dtype=np.int32),
        "text": texts,
        "k": np.full(len(texts), 10, dtype=np.int32),
    })
    want = _want(oracle, queries, window, ordered)
    # the probe set must produce hits at the wide window and lose some
    # at the narrow one (else the window is not being exercised)
    if window >= 20:
        assert len(want) > 0
    for mode in ("kernel", "distributed", "auto"):
        got = near_topk(
            spark, near_index["postings"], queries, res.N, res.avgdl,
            cfg, window=window, ordered=ordered, mode=mode,
        ).toPandas()
        _check(got, want, queries, (mode, window, ordered))


def test_near_window_monotone(near_index, spark):
    """Widening the window can only add result docs (per query)."""
    res, cfg, oracle = (near_index["res"], near_index["cfg"],
                        near_index["oracle"])
    texts = _near_queries(oracle)
    queries = pd.DataFrame({
        "query_id": np.arange(len(texts), dtype=np.int32),
        "text": texts,
        "k": np.full(len(texts), 10_000, dtype=np.int32),
    })
    prev: dict[int, set] = {}
    sizes = []
    for w in (2, 5, 12, 40):
        got = near_topk(
            spark, near_index["postings"], queries, res.N, res.avgdl,
            cfg, window=w,
        ).toPandas()
        cur = {
            int(qid): set(g.doc_id)
            for qid, g in got.groupby("query_id")
        }
        for qid, docs in prev.items():
            assert docs <= cur.get(qid, set()), (w, qid)
        prev = {**{q: set() for q in queries["query_id"]}, **cur}
        sizes.append(len(got))
    assert sizes[0] < sizes[-1], "window never changed the result"


def test_phrase_equals_ordered_near_at_len_window(near_index, spark):
    """phrase(text) == near(text, window=len(tokens), ordered=True) for
    duplicate-free phrases: k positions in order within a span of k-1
    ARE consecutive."""
    res, cfg, oracle = (near_index["res"], near_index["cfg"],
                        near_index["oracle"])
    texts = []
    for doc_id in (0, 9, 33):
        toks = oracle.docs[doc_id][2:5]
        if len(set(toks)) == 3:
            texts.append(" ".join(toks))
    assert texts
    queries = pd.DataFrame({
        "query_id": np.arange(len(texts), dtype=np.int32),
        "text": texts,
        "k": np.full(len(texts), 10_000, dtype=np.int32),
    })
    ph = phrase_topk(
        spark, near_index["postings"], queries, res.N, res.avgdl, cfg,
    ).toPandas()
    nr = near_topk(
        spark, near_index["postings"], queries, res.N, res.avgdl, cfg,
        window=3, ordered=True,
    ).toPandas()
    assert len(ph) == len(nr) > 0
    pd.testing.assert_frame_equal(
        ph.sort_values(["query_id", "rank"], ignore_index=True),
        nr.sort_values(["query_id", "rank"], ignore_index=True),
    )


def test_near_overcap_fallback(near_index, spark, monkeypatch):
    """NEAR through the distributed over-cap positions path stays
    oracle-identical (collect cap zeroed -> chunked candidate mask;
    then span=4 forces the many-tiny-chunks worst case)."""
    import capsbm25.query as qm

    res, cfg, oracle = (near_index["res"], near_index["cfg"],
                        near_index["oracle"])
    monkeypatch.setattr(qm, "MAX_CAND_COLLECT", 0)
    texts = _near_queries(oracle)[:4]
    queries = pd.DataFrame({
        "query_id": np.arange(len(texts), dtype=np.int32),
        "text": texts,
        "k": np.full(len(texts), 10, dtype=np.int32),
    })
    want = _want(oracle, queries, 8, False)
    got = near_topk(
        spark, near_index["postings"], queries, res.N, res.avgdl, cfg,
        window=8, mode="distributed",
    ).toPandas()
    _check(got, want, queries, "overcap-array")
    monkeypatch.setattr(qm, "CAND_CHUNK_SPAN", 4)
    got2 = near_topk(
        spark, near_index["postings"], queries, res.N, res.avgdl, cfg,
        window=8, mode="distributed",
    ).toPandas()
    _check(got2, want, queries, "overcap-chunked")


def test_near_rejects_bad_args(near_index, spark):
    res, cfg = near_index["res"], near_index["cfg"]
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int32),
                      "text": ["w0000 w0000 w0001"],
                      "k": np.array([5], dtype=np.int32)})
    with pytest.raises(ValueError, match="distinct query terms"):
        near_topk(spark, near_index["postings"], q, res.N, res.avgdl,
                  cfg, window=4, ordered=True)
    with pytest.raises(ValueError, match="window"):
        near_topk(spark, near_index["postings"], q, res.N, res.avgdl,
                  cfg, window=0)
