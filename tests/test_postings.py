"""Posting-list invariants — the recast of the reference's sorted-order
and LCP invariants (is_sorted, Suffix_Array.cpp:512-536) demanded by
BASELINE.json: per-term doc_ids strictly increasing, df == len(doc_ids),
cf == sum(tfs), block maxima are valid upper bounds, and full df/tf
equality against the naive oracle."""

import numpy as np
from pyspark.sql import functions as F

from capsbm25.codec import decode_varints, delta_decode
from capsbm25.scoring import idf as idf_fn
from capsbm25.scoring import term_scores


def test_postings_match_oracle_exactly(built_index):
    oracle = built_index["oracle"]
    rows = built_index["postings"].collect()
    assert len(rows) == len(oracle.postings)
    for r in rows:
        o = oracle.postings[r.term]
        docs = delta_decode(r.doc_ids)
        tfs = decode_varints(r.tfs).astype(int)
        dls = decode_varints(r.dls).astype(int)
        assert r.df == len(o) == docs.size
        assert r.cf == sum(o.values()) == tfs.sum()
        assert (np.diff(docs) > 0).all(), f"{r.term}: doc_ids not strictly increasing"
        assert docs.tolist() == sorted(o)
        assert tfs.tolist() == [o[d] for d in sorted(o)]
        assert dls.tolist() == [oracle.dl[d] for d in sorted(o)]


def test_one_row_per_term(built_index):
    dupes = (
        built_index["postings"]
        .groupBy("term")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_salting_exercised_and_merged(built_index, spark):
    res = built_index["res"]
    assert res.plan.hot_terms, "fixture corpus must trigger hot-term salting"
    out = res.out_dir
    allp = spark.read.parquet(f"{out}/postings")
    partials = allp.where(F.col("partial"))
    assert partials.count() > 0, "salted partial postings should exist pre-merge"
    # every hot term: >=1 partial row, exactly 1 merged final row
    # (a hot term's salt buckets may hash into one Spark partition and
    # emerge as a single combined partial — still correct)
    part_counts = {
        r["term"]: r["n"]
        for r in partials.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    final_counts = {
        r["term"]: r["n"]
        for r in built_index["postings"]
        .where(F.col("term").isin(list(res.plan.hot_terms)))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for term in res.plan.hot_terms:
        assert part_counts.get(term, 0) >= 1, term
        assert final_counts.get(term) == 1, term
    assert max(part_counts.values()) > 1, "salting never split any hot term"


def test_with_part_id_matches_fused_assignment(built_index, spark):
    """The standalone part-assignment operator (for externally-produced
    pairs) must agree with the fused extract_pairs(plan=...) path."""
    from capsbm25.docids import assign_doc_ids
    from capsbm25.postings import extract_pairs, with_part_id

    res, cfg = built_index["res"], built_index["cfg"]
    docs = assign_doc_ids(
        spark.createDataFrame(built_index["pdf"]), cfg
    ).select("doc_id", "text").limit(50)
    fused = (
        extract_pairs(docs, cfg, plan=res.plan)
        .select("term", "doc_id", "part_id")
        .toPandas()
        .sort_values(["term", "doc_id"], ignore_index=True)
    )
    standalone = (
        with_part_id(extract_pairs(docs, cfg), res.plan)
        .select("term", "doc_id", "part_id")
        .toPandas()
        .sort_values(["term", "doc_id"], ignore_index=True)
    )
    assert fused.equals(standalone)


def test_corpus_stats(built_index):
    oracle = built_index["oracle"]
    res = built_index["res"]
    assert res.N == oracle.N
    assert abs(res.avgdl - oracle.avgdl) < 1e-9


def test_manifest_lineage(built_index, spark):
    from capsbm25.build import Manifest

    man = Manifest(built_index["res"].out_dir)
    stages = [r["stage"] for r in man.records()]
    for s in ["docs", "plan", "pairs", "hot_merge"]:
        assert s in stages
    assert any(s.startswith("wave=") for s in stages)
    for r in man.records():
        assert r["status"] == "done"
        assert r["finished_ts"] >= r["started_ts"]
    # the plan itself is recorded verbatim (shuffle-plan lineage)
    plan_rec = man.done("plan")
    assert "splitters" in plan_rec["plan"]
