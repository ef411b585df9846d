"""Char-granular substring search over a chargram positional index —
the direct graft of the reference suffix array's any-substring search
(upper_bound, /root/reference/src/Suffix_Array.cpp:252-297), tested
differentially against a naive scan oracle. Token-granular phrase_topk
cannot answer these queries (patterns cross token boundaries and
include punctuation); substring_topk must, exactly."""

import numpy as np
import pandas as pd
import pytest

from capsbm25 import fixtures as fx
from capsbm25.build import build_index, load_postings
from capsbm25.config import BuildConfig
from capsbm25.query import substring_topk


@pytest.fixture(scope="module")
def char_index(spark, tmp_path_factory):
    pdf = fx.gen_transcripts_pdf(100, 42)
    cfg = BuildConfig(num_part_ids=32, shuffle_partitions=8, num_waves=2,
                      hot_share_threshold=0.004, max_salt_buckets=8,
                      tokenizer="chargram", chargram_n=3,
                      index_positions=True)
    out = str(tmp_path_factory.mktemp("charidx") / "t1")
    res = build_index(spark, spark.createDataFrame(pdf), out, cfg)
    ordered = pdf.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    return {"pdf": pdf, "cfg": cfg, "res": res,
            "postings": load_postings(spark, out),
            "hays": [(t or "").lower() for t in ordered["text"]]}


def _count_overlapping(hay: str, pat: str) -> int:
    n, i = 0, hay.find(pat)
    while i != -1:
        n += 1
        i = hay.find(pat, i + 1)
    return n


def _oracle_topk(hays, pattern: str, k: int) -> list[tuple[int, float]]:
    pat = pattern.lower()
    counts = [(_count_overlapping(h, pat), d) for d, h in enumerate(hays)]
    hits = sorted(((-c, d) for c, d in counts if c > 0))[:k]
    return [(d, float(-negc)) for negc, d in hits]


def _patterns(hays):
    """Corpus-derived patterns a token index cannot answer."""
    out = []
    h = hays[0]
    out.append(h[3:9])           # crosses a token boundary (space inside)
    out.append(h[:5])            # doc-start anchored
    out.append(h[-6:])           # doc-end anchored
    # punctuation + case-insensitivity: ', w' appears after W0003, runs
    out.append(", w")
    out.append("0 w00")          # digit-space-prefix, very common
    out.append("w00")            # exactly chargram_n, stopword-grade
    out.append("000")            # self-overlapping (w0000 -> 2 matches)
    out.append("@@never-there@@")
    return out


def _queries_pdf(texts, k=10):
    return pd.DataFrame({
        "query_id": np.arange(len(texts), dtype=np.int32),
        "text": texts,
        "k": np.full(len(texts), k, dtype=np.int32),
    })


def test_substring_matches_naive_scan_all_modes(char_index, spark):
    hays, cfg = char_index["hays"], char_index["cfg"]
    texts = _patterns(hays)
    queries = _queries_pdf(texts)
    want = {qid: _oracle_topk(hays, t, 10)
            for qid, t in zip(queries["query_id"], texts)}

    for mode, kw in [("kernel", {}), ("distributed", {}),
                     ("auto", {"max_kernel_df": 500})]:
        got = substring_topk(
            spark, char_index["postings"], queries, cfg, mode=mode, **kw
        ).toPandas()
        for qid in queries["query_id"]:
            g = got[got.query_id == qid].sort_values("rank")
            w = want[int(qid)]
            assert list(zip(g.doc_id, g.score)) == w, (
                mode, qid, texts[int(qid)])


def test_substring_counts_overlapping(char_index, spark):
    """'000' inside 'w0000' must count 2 (overlap), not 1 — the same
    semantics as counting suffix-array match positions."""
    hays, cfg = char_index["hays"], char_index["cfg"]
    queries = _queries_pdf(["000"], k=5)
    got = substring_topk(
        spark, char_index["postings"], queries, cfg, mode="kernel"
    ).toPandas().sort_values("rank")
    want = _oracle_topk(hays, "000", 5)
    assert list(zip(got.doc_id, got.score)) == want
    assert got.score.iloc[0] >= 2  # corpus has w0000-style runs


def test_substring_case_insensitive(char_index, spark):
    hays, cfg = char_index["hays"], char_index["cfg"]
    lo = substring_topk(spark, char_index["postings"],
                        _queries_pdf(["w0003,"]), cfg).toPandas()
    up = substring_topk(spark, char_index["postings"],
                        _queries_pdf(["W0003,"]), cfg).toPandas()
    assert len(lo) > 0
    assert list(lo.doc_id) == list(up.doc_id)
    assert list(lo.score) == list(up.score)


def test_substring_rejects_subgram_pattern(char_index, spark):
    with pytest.raises(ValueError, match="shorter than chargram_n"):
        substring_topk(spark, char_index["postings"],
                       _queries_pdf(["ab"]), char_index["cfg"])


def test_substring_rejects_word_index(spark, char_index):
    with pytest.raises(ValueError, match="chargram index"):
        substring_topk(spark, char_index["postings"],
                       _queries_pdf(["abc"]), BuildConfig())


def test_chargram_tokenizer_parity(spark, char_index):
    """JVM expr, Arrow UDF, and pure-Python chargram tokenizers agree
    (the 4-way parity contract extended to the new mode)."""
    from pyspark.sql import functions as F

    from capsbm25.tokenize import (make_tokens_pandas_udf, tokenize_py,
                                   tokens_expr)

    cfg = char_index["cfg"]
    texts = ["", "ab", "abc", "AbC d", "w0003, W0001 x", None]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    via_expr = [r.t for r in
                df.select(tokens_expr(F.col("text"), cfg).alias("t")).collect()]
    via_udf = [r.t for r in
               df.select(make_tokens_pandas_udf(cfg)(F.col("text")).alias("t"))
               .collect()]
    via_py = [tokenize_py(t, cfg) for t in texts]
    assert via_expr == via_udf == via_py
    assert via_py[2] == ["abc"]
    assert via_py[3] == ["abc", "bc ", "c d"]


def test_substring_scan_fallback_matches_naive(char_index, spark):
    """substring_scan (non-indexed, built-in exprs) must produce the
    same overlap counts as the naive Python scan — including sub-gram
    patterns the index path rejects — and agree with substring_topk on
    indexable patterns."""
    from capsbm25.dataops import substring_scan

    hays = char_index["hays"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(hays)), "text": hays})
    )
    for pat in ["w0", "0 ", hays[0][3:9], "000"]:
        got = {r.doc_id: r.n_occ
               for r in substring_scan(docs, pat).collect()}
        want = {d: _count_overlapping(h, pat.lower())
                for d, h in enumerate(hays)
                if _count_overlapping(h, pat.lower()) > 0}
        assert got == want, pat

    # cross-check vs the index path on an indexable pattern: the scan
    # restricted to the index's top-k must carry identical counts
    queries = _queries_pdf(["000"], k=5)
    idx = substring_topk(
        spark, char_index["postings"], queries, char_index["cfg"]
    ).toPandas()
    scan = {r.doc_id: r.n_occ
            for r in substring_scan(docs, "000").collect()}
    for r in idx.itertuples(index=False):
        assert scan[r.doc_id] == int(r.score)


def test_substring_pattern_with_control_chars(char_index, spark):
    """Chargram tokens can contain ANY character — a pattern containing
    the old phrase-separator byte (\\x1f) must not corrupt the phrase
    round-trip (the phrase now travels as array<string>). The fixture
    corpus has no \\x1f, so the pattern must return empty, not crash,
    in both modes; a space-containing control-adjacent pattern must
    still match."""
    cfg = char_index["cfg"]
    for mode in ("kernel", "distributed"):
        got = substring_topk(
            spark, char_index["postings"],
            _queries_pdf(["a\x1fb\x1fc"]), cfg, mode=mode,
        ).toPandas()
        assert len(got) == 0, mode


def test_substring_over_streamed_segments(spark, tmp_path):
    """Composition: a chargram positional index built INCREMENTALLY via
    Structured Streaming answers substring queries identically to the
    naive scan — the kernel merges multi-segment terms and their
    positional payloads."""
    import os

    from capsbm25.streaming import (load_segment_postings,
                                    start_incremental_build)

    pdf = fx.gen_transcripts_pdf(60, 42)
    src = str(tmp_path / "in")
    out = str(tmp_path / "idx")
    os.makedirs(src)
    convs = sorted(pdf["conv_id"].unique())
    for i, chunk in enumerate([convs[:20], convs[20:40], convs[40:]]):
        pdf[pdf["conv_id"].isin(chunk)].to_parquet(f"{src}/p{i}.parquet")

    cfg = BuildConfig(num_part_ids=16, shuffle_partitions=4,
                      tokenizer="chargram", chargram_n=3,
                      index_positions=True)
    q = start_incremental_build(spark, src, out, cfg,
                                max_files_per_trigger=1)
    q.awaitTermination(300)

    ordered = pdf.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    hays = [(t or "").lower() for t in ordered["text"]]
    texts = [hays[0][2:8], "000", "@@none@@"]
    queries = _queries_pdf(texts, k=8)
    got = substring_topk(
        spark, load_segment_postings(spark, out), queries, cfg,
        mode="kernel",
    ).toPandas()
    for qid, t in zip(queries["query_id"], texts):
        g = got[got.query_id == qid].sort_values("rank")
        assert list(zip(g.doc_id, g.score)) == _oracle_topk(hays, t, 8), t


def test_substring_subgram_autofallback(char_index, spark):
    """Patterns shorter than chargram_n auto-dispatch to the full-scan
    fallback when a corpus handle is given — one call answers a MIXED
    batch (index path for coverable patterns, scan for sub-gram ones)
    with identical overlap-counting scores and tie-breaks, mirroring
    the reference upper_bound's any-length uniformity."""
    hays, cfg = char_index["hays"], char_index["cfg"]
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(hays), dtype=np.int64),
        "text": hays,
    }))
    texts = ["w0", "000", "0", " w00"]  # 2 sub-gram, 2 index-covered
    queries = _queries_pdf(texts, k=7)
    got = substring_topk(
        spark, char_index["postings"], queries, cfg, corpus=corpus
    ).toPandas()
    for qid, pat in enumerate(texts):
        want = _oracle_topk(hays, pat, 7)
        g = got[got.query_id == qid].sort_values("rank")
        assert list(zip(g.doc_id, g.score)) == want, pat
    # an all-short batch works too; without corpus= it still raises
    short_only = _queries_pdf(["ab"], k=3)
    got2 = substring_topk(
        spark, char_index["postings"], short_only, cfg, corpus=corpus
    ).toPandas()
    assert list(zip(got2.doc_id, got2.score)) == _oracle_topk(hays, "ab", 3)
    with pytest.raises(ValueError, match="shorter than chargram_n"):
        substring_topk(spark, char_index["postings"], short_only, cfg)
