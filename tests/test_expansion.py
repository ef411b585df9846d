"""Term-expansion query family: fuzzy (Lucene FuzzyQuery, Levenshtein
<= max_edits) and wildcard (Lucene WildcardQuery, * / ?) — differential
against naive expansion oracles, same summed-tf ranking contract as
prefix_topk."""

import fnmatch

import numpy as np
import pandas as pd
import pytest

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.query import fuzzy_topk, wildcard_topk


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expansion_want(oracle, match_fn, k):
    """(doc_id, score) ranked by summed tf over dictionary terms
    accepted by match_fn — the family's shared scoring contract."""
    terms = [t for t in oracle.postings if match_fn(t)]
    per_doc: dict[int, int] = {}
    for t in terms:
        for d, tf in oracle.postings[t].items():
            per_doc[d] = per_doc.get(d, 0) + tf
    ranked = sorted(per_doc.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(d, float(s)) for d, s in ranked]


def _check_one(got, qid, want):
    g = got[got.query_id == qid].sort_values("rank")
    assert list(g.doc_id) == [d for d, _ in want], qid
    assert list(g.score) == [s for _, s in want], qid


def test_fuzzy_matches_naive_expansion(built_index, spark):
    res, cfg, oracle = (built_index["res"], built_index["cfg"],
                        built_index["oracle"])
    vocab = sorted(oracle.postings)
    probes = [vocab[3], vocab[len(vocab) // 2], "w9999zz"]  # last: far OOV
    for max_edits in (0, 1, 2):
        queries = pd.DataFrame({
            "query_id": np.arange(len(probes), dtype=np.int32),
            "text": probes,
            "k": np.full(len(probes), 12, dtype=np.int32),
        })
        got = fuzzy_topk(
            spark, built_index["postings"], queries, cfg,
            max_edits=max_edits,
        ).toPandas()
        for qid, p in enumerate(probes):
            want = _expansion_want(
                oracle, lambda t, p=p: _lev(t, p) <= max_edits, 12)
            _check_one(got, qid, want)


def test_fuzzy_prefix_len(built_index, spark):
    """prefix_len: matches must share the exact prefix AND the scan
    carries a pushed StartsWith predicate."""
    res, cfg, oracle = (built_index["res"], built_index["cfg"],
                        built_index["oracle"])
    vocab = sorted(oracle.postings)
    p = vocab[len(vocab) // 3]
    queries = pd.DataFrame({
        "query_id": np.array([0], dtype=np.int32),
        "text": [p],
        "k": np.array([12], dtype=np.int32),
    })
    out = fuzzy_topk(spark, built_index["postings"], queries, cfg,
                     max_edits=2, prefix_len=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # round 5: the predicate runs on the term DICTIONARY; the postings
    # scan is pruned by the pushed In(term) of the matched expansion
    assert "In(term" in plan.replace("\n", " "), plan[:1500]
    got = out.toPandas()
    want = _expansion_want(
        oracle,
        lambda t: t[:3] == p[:3] and _lev(t, p) <= 2,
        12,
    )
    _check_one(got, 0, want)


def test_fuzzy_rejects_bad_args(built_index, spark):
    cfg = built_index["cfg"]
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int32),
                      "text": ["two terms"],
                      "k": np.array([5], dtype=np.int32)})
    with pytest.raises(ValueError, match="single-term"):
        fuzzy_topk(spark, built_index["postings"], q, cfg)
    q1 = q.assign(text=["one"])
    with pytest.raises(ValueError, match="max_edits"):
        fuzzy_topk(spark, built_index["postings"], q1, cfg, max_edits=3)


def test_wildcard_matches_naive_expansion(built_index, spark):
    res, cfg, oracle = (built_index["res"], built_index["cfg"],
                        built_index["oracle"])
    vocab = sorted(oracle.postings)
    seed = vocab[len(vocab) // 2]
    pats = [
        seed[:3] + "*",            # prefix form
        seed[:2] + "?" + seed[3:],  # single-char hole
        "*" + seed[-3:],           # leading wildcard (dictionary scan)
        "*zzz@nohit".replace("@", "q"),  # no match
    ]
    queries = pd.DataFrame({
        "query_id": np.arange(len(pats), dtype=np.int32),
        "text": pats,
        "k": np.full(len(pats), 12, dtype=np.int32),
    })
    got = wildcard_topk(
        spark, built_index["postings"], queries, cfg
    ).toPandas()
    n_hits = 0
    for qid, p in enumerate(pats):
        want = _expansion_want(
            oracle, lambda t, p=p: fnmatch.fnmatchcase(t, p), 12)
        n_hits += len(want)
        _check_one(got, qid, want)
    assert n_hits > 0


def test_wildcard_prefix_pattern_prunes_scan(built_index, spark):
    cfg = built_index["cfg"]
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int32),
                      "text": ["w00*"],
                      "k": np.array([5], dtype=np.int32)})
    out = wildcard_topk(spark, built_index["postings"], q, cfg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # round 5: the predicate runs on the term DICTIONARY; the postings
    # scan is pruned by the pushed In(term) of the matched expansion
    assert "In(term" in plan.replace("\n", " "), plan[:1500]


def test_wildcard_rejects_bad_pattern(built_index, spark):
    cfg = built_index["cfg"]
    # (uppercase input is VALID — patterns lowercase against the
    # normalized dictionary, like substring_topk)
    for bad in ["", "has space*", "dash-ed*", None]:
        q = pd.DataFrame({"query_id": np.array([0], dtype=np.int32),
                          "text": [bad],
                          "k": np.array([5], dtype=np.int32)})
        with pytest.raises(ValueError, match="wildcard pattern"):
            wildcard_topk(spark, built_index["postings"], q, cfg)
