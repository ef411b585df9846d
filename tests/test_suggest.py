"""Suggest family (Lucene suggest module analogs) + field-sorted
retrieval: differential tests against naive recomputation from the
pure-Python oracle's postings, on the shared t1 index."""

import numpy as np
import pandas as pd
import pytest

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.tokenize import tokenize_py


def _lev(a: str, b: str) -> int:
    """Classic Levenshtein (insert/delete/substitute), naive DP."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _q(texts, ks):
    return pd.DataFrame(
        {"query_id": np.arange(len(texts), dtype=np.int32),
         "text": texts,
         "k": np.array(ks, dtype=np.int32)})


def test_suggest_terms_matches_naive(built_index, spark):
    from capsbm25.build import load_dictionary
    from capsbm25.suggest import suggest_terms

    oracle, cfg = built_index["oracle"], built_index["cfg"]
    dic = load_dictionary(spark, built_index["res"].out_dir)
    assert dic is not None  # round-6 builds persist the side index
    vocab = sorted(oracle.postings)
    prefixes = [vocab[0][:1], vocab[len(vocab) // 2][:2], "zzzznope"]
    got = suggest_terms(
        spark, built_index["postings"], _q(prefixes, [5, 8, 5]), cfg,
        dictionary=dic,
    ).toPandas()
    for qid, p in enumerate(prefixes):
        want = sorted(
            ((t, oracle.df(t)) for t in vocab if t.startswith(p)),
            key=lambda x: (-x[1], x[0]),
        )[: (5, 8, 5)[qid]]
        g = got[got.query_id == qid].sort_values("rank")
        assert list(zip(g.term, g.df)) == want
        assert list(g["rank"]) == list(range(1, len(want) + 1))


def test_suggest_terms_fallback_agrees_with_dictionary(built_index, spark):
    """dictionary=None falls back to a 2-column postings projection;
    per-term df must still sum across salted multi-row terms."""
    from capsbm25.build import load_dictionary
    from capsbm25.suggest import suggest_terms

    cfg = built_index["cfg"]
    q = _q(["t", "th"], [12, 12])
    dic = load_dictionary(spark, built_index["res"].out_dir)
    a = suggest_terms(spark, built_index["postings"], q, cfg,
                      dictionary=dic).toPandas()
    b = suggest_terms(spark, built_index["postings"], q, cfg,
                      dictionary=None).toPandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_suggest_spelling_matches_naive(built_index, spark):
    from capsbm25.build import load_dictionary
    from capsbm25.suggest import suggest_spelling

    oracle, cfg = built_index["oracle"], built_index["cfg"]
    vocab = sorted(oracle.postings)
    base = max(vocab, key=lambda t: (len(t) >= 5, oracle.df(t)))
    typo = "x" + base[1:]  # one substitution away from a hot term
    got = suggest_spelling(
        spark, built_index["postings"], _q([typo], [7]), cfg,
        dictionary=load_dictionary(spark, built_index["res"].out_dir),
        max_edits=2,
    ).toPandas()
    want = sorted(
        ((t, _lev(t, typo), oracle.df(t)) for t in vocab
         if 1 <= _lev(t, typo) <= 2),
        key=lambda x: (x[1], -x[2], x[0]),
    )[:7]
    g = got.sort_values("rank")
    assert list(zip(g.term, g.dist, g.df)) == want
    assert base in set(g.term)  # the intended correction surfaces


def test_suggest_spelling_excludes_self_and_min_df(built_index, spark):
    from capsbm25.suggest import suggest_spelling

    oracle, cfg = built_index["oracle"], built_index["cfg"]
    vocab = sorted(oracle.postings)
    word = max(vocab, key=oracle.df)  # an existing, correctly spelled term
    got = suggest_spelling(
        spark, built_index["postings"], _q([word], [50]), cfg,
    ).toPandas()
    assert word not in set(got.term)  # dist >= 1: never suggest the input
    assert (got.dist >= 1).all()
    hi = int(got.df.max())
    capped = suggest_spelling(
        spark, built_index["postings"], _q([word], [50]), cfg,
        min_df=hi,
    ).toPandas()
    assert set(capped.term) <= set(got[got.df >= hi].term)
    assert (capped.df >= hi).all()


def test_suggest_arg_validation(built_index, spark):
    from capsbm25.suggest import suggest_spelling, suggest_terms

    cfg = built_index["cfg"]
    char_cfg = BuildConfig(tokenizer="chargram")
    with pytest.raises(ValueError, match="word-tokenizer"):
        suggest_terms(spark, built_index["postings"], _q(["ab"], [5]),
                      char_cfg)
    with pytest.raises(ValueError, match="word-tokenizer"):
        suggest_spelling(spark, built_index["postings"], _q(["ab"], [5]),
                         char_cfg)
    with pytest.raises(ValueError, match="ONE word"):
        suggest_spelling(spark, built_index["postings"],
                         _q(["two words"], [5]), cfg)
    with pytest.raises(ValueError, match="max_edits"):
        suggest_spelling(spark, built_index["postings"], _q(["abc"], [5]),
                         cfg, max_edits=3)
    # empty prefixes drop; an all-empty batch returns an empty frame
    empty = suggest_terms(spark, built_index["postings"], _q([""], [5]),
                          cfg).toPandas()
    assert empty.empty


def test_suggest_scan_pushes_prefix(built_index, spark):
    """The fallback (postings-projection) dictionary scan must carry
    the pushed StringStartsWith predicate and a payload-free
    ReadSchema — suggestion never reads posting payloads."""
    from capsbm25.suggest import suggest_terms

    got = suggest_terms(spark, built_index["postings"],
                        _q(["th"], [5]), built_index["cfg"],
                        dictionary=None)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(term,th)" in plan
    assert "doc_ids" not in plan and "tfs" not in plan


def test_sorted_topk_matches_naive(built_index, spark):
    from capsbm25.build import load_doc_stats
    from capsbm25.query import sorted_topk

    oracle, cfg = built_index["oracle"], built_index["cfg"]
    stats = load_doc_stats(spark, built_index["res"].out_dir)
    stats_pdf = stats.select("doc_id", "dl", "turn_idx").toPandas()
    by_doc = stats_pdf.set_index("doc_id")
    queries = fx.queries_pdf(42).head(3).reset_index(drop=True)
    for field, asc in (("dl", False), ("dl", True), ("turn_idx", False)):
        for conj in (False, True):
            got = sorted_topk(
                spark, built_index["postings"], queries, stats, field,
                cfg, ascending=asc, conjunctive=conj,
            ).toPandas()
            for q in queries.itertuples(index=False):
                terms = sorted(set(tokenize_py(q.text, cfg)))
                present = [t for t in terms if t in oracle.postings]
                if conj:
                    if len(present) != len(terms) or not terms:
                        cand = set()
                    else:
                        cand = set(oracle.postings[terms[0]])
                        for t in terms[1:]:
                            cand &= oracle.postings[t].keys()
                else:
                    cand = set()
                    for t in present:
                        cand |= oracle.postings[t].keys()
                vals = [(d, by_doc.loc[d, field]) for d in cand]
                want = sorted(
                    vals, key=lambda x: (x[1] if asc else -x[1], x[0])
                )[: int(q.k)]
                g = got[got.query_id == q.query_id].sort_values("rank")
                assert list(g.doc_id) == [d for d, _ in want], (
                    field, asc, conj, q.query_id)
                assert list(g.sort_key) == [v for _, v in want]


def test_sorted_topk_validates_field(built_index, spark):
    from capsbm25.build import load_doc_stats
    from capsbm25.query import sorted_topk

    stats = load_doc_stats(spark, built_index["res"].out_dir)
    with pytest.raises(ValueError, match="doc_stats column"):
        sorted_topk(spark, built_index["postings"],
                    fx.queries_pdf(42).head(1), stats, "nope",
                    built_index["cfg"])


def test_suggest_rejects_df_less_frame(built_index, spark):
    """Round-6 review: a frame without df used to get df=lit(0), and
    suggest_spelling's default min_df=1 then silently returned ZERO
    corrections; suggest_terms silently degraded its popularity
    ranking. Both now raise up front."""
    import pytest as _pytest

    from capsbm25.suggest import suggest_spelling, suggest_terms

    cfg = built_index["cfg"]
    bare = built_index["postings"].select("term")
    q = pd.DataFrame({"query_id": np.array([0], dtype=np.int32),
                      "text": ["w0"], "k": np.array([5], dtype=np.int32)})
    with _pytest.raises(ValueError, match="df column"):
        suggest_terms(spark, bare, q, cfg)
    with _pytest.raises(ValueError, match="df column"):
        suggest_spelling(spark, bare, q, cfg)


def test_sorted_topk_multi_field_matches_naive(built_index, spark):
    """Multi-SortField (Lucene Sort([f1, f2])): lexicographic order,
    per-field directions, keys returned as sort_key_0.. columns."""
    from capsbm25.build import load_doc_stats
    from capsbm25.query import sorted_topk

    oracle, cfg = built_index["oracle"], built_index["cfg"]
    stats = load_doc_stats(spark, built_index["res"].out_dir)
    by_doc = stats.select("doc_id", "dl", "turn_idx").toPandas() \
        .set_index("doc_id")
    queries = fx.queries_pdf(42).head(2).reset_index(drop=True)
    got = sorted_topk(
        spark, built_index["postings"], queries, stats,
        ["dl", "turn_idx"], cfg, ascending=[False, True],
    ).toPandas()
    assert {"sort_key_0", "sort_key_1"} <= set(got.columns)
    for q in queries.itertuples(index=False):
        cand = set()
        for t in set(tokenize_py(q.text, cfg)):
            cand |= oracle.postings.get(t, {}).keys()
        vals = [(d, int(by_doc.loc[d, "dl"]), int(by_doc.loc[d, "turn_idx"]))
                for d in cand]
        want = sorted(vals, key=lambda x: (-x[1], x[2], x[0]))[: int(q.k)]
        g = got[got.query_id == q.query_id].sort_values("rank")
        assert list(g.doc_id) == [d for d, _, _ in want], q.query_id
        assert list(g.sort_key_0) == [a for _, a, _ in want]
        assert list(g.sort_key_1) == [b for _, _, b in want]
    # validation: per-field direction list must match field count
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one bool per"):
        sorted_topk(spark, built_index["postings"], queries, stats,
                    ["dl", "turn_idx"], cfg, ascending=[True])
    with _pytest.raises(ValueError, match="at least one"):
        sorted_topk(spark, built_index["postings"], queries, stats,
                    [], cfg)


def test_sorted_topk_search_after_page_walk(built_index, spark):
    """Cursor pagination over field-sorted results (ES search_after's
    primary shape): walking pages with each page's last (sort keys,
    doc_id) as the next cursor reconstructs the unpaged ranking —
    single field, multi field with mixed directions, and a stats
    frame that drops half the docs (NULL keys sort last; cursors with
    NULL keys resume inside the null tail). Half-cursor raises."""
    from pyspark.sql import functions as F

    from capsbm25.build import load_doc_stats
    from capsbm25.query import sorted_topk

    cfg = built_index["cfg"]
    stats = load_doc_stats(spark, built_index["res"].out_dir)
    # drop half the docs so the NULL tail is real
    holey = stats.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    queries = fx.queries_pdf(42).head(3).reset_index(drop=True)
    full_q = queries.assign(k=np.int32(30))
    cases = [
        ("dl", False, stats, ["after_key"], ["sort_key"]),
        (["dl", "turn_idx"], [False, True], stats,
         ["after_key_0", "after_key_1"], ["sort_key_0", "sort_key_1"]),
        ("dl", True, holey, ["after_key"], ["sort_key"]),
    ]
    for field, asc, sdf, acols, kcols in cases:
        want = sorted_topk(
            spark, built_index["postings"], full_q, sdf, field, cfg,
            ascending=asc,
        ).toPandas().sort_values(["query_id", "rank"],
                                 ignore_index=True)
        pages = []
        cursor = {}  # qid -> dict of after cols
        page_q = queries.assign(k=np.int32(10))
        for _ in range(3):
            pq = page_q.copy()
            for i, a in enumerate(acols):
                pq[a] = [cursor.get(int(q), {}).get(a)
                         for q in pq["query_id"]]
            pq["after_doc"] = [cursor.get(int(q), {}).get("after_doc")
                               for q in pq["query_id"]]
            got = sorted_topk(
                spark, built_index["postings"], pq, sdf, field, cfg,
                ascending=asc,
            ).toPandas().sort_values(["query_id", "rank"],
                                     ignore_index=True)
            pages.append(got)
            for qid, g in got.groupby("query_id"):
                last = g.iloc[-1]
                cursor[int(qid)] = dict(
                    {a: last[kc] for a, kc in zip(acols, kcols)},
                    after_doc=int(last["doc_id"]))
        walked = pd.concat(pages, ignore_index=True)
        # pages concatenate to the unpaged ranking's doc order
        for qid in queries["query_id"]:
            w = walked[walked.query_id == qid]
            f = want[want.query_id == qid].head(len(w))
            assert list(w.doc_id) == list(f.doc_id), (field, asc, qid)
    with pytest.raises(ValueError, match="cursor columns"):
        sorted_topk(
            spark, built_index["postings"],
            queries.assign(after_doc=np.int64(1)).head(1),
            stats, ["dl", "turn_idx"], cfg)
