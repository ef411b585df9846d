"""KWIC snippet extraction — the fetch/highlight phase of a fulltext
engine (Lucene highlighter analog; the reference's query output is a
match POSITION into the text, Suffix_Array.cpp:252-297 — this op turns
positions back into human-readable context).

Scale shape: top-k results are small by construction (Σ k rows), so
their doc ids are collected driver-side and PUSHED into the metadata
and corpus scans as isin filters (PushedFilters, row-group pruning) —
the corpus is never scanned in full for a snippet fetch. The only
Python-side work is tokenizing the ≤ Σ k result docs."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capsbm25.catalog import pdf_frame
from capsbm25.config import BuildConfig
from capsbm25.tokenize import tokenize_py

SNIPPET_SCHEMA = ("query_id int, doc_id long, first_pos int, "
                  "snippet string")


def kwic_snippets(
    spark: SparkSession,
    corpus: DataFrame,
    doc_map: DataFrame,
    results: DataFrame,
    queries: pd.DataFrame,
    cfg: BuildConfig | None = None,
    window: int = 3,
) -> DataFrame:
    """Keyword-in-context snippets for query results.

    corpus:  transcripts (conv_id, turn_idx, text, ...)
    doc_map: (doc_id, conv_id, turn_idx) — e.g. load_doc_stats(...)
    results: (query_id, doc_id, ...) with ENGINE doc ids (the output
             of bm25_topk / phrase_topk)
    queries: pandas (query_id, text)

    Returns (query_id, doc_id, first_pos, snippet): first_pos is the
    0-based token index of the first occurrence of ANY of the query's
    terms in the doc (Lucene-highlighter any-term semantics, covers OR
    results where no single term is guaranteed); snippet is the
    space-joined token window [first_pos-window, first_pos+window].
    Result docs containing none of the query terms are dropped.
    """
    cfg = cfg or BuildConfig()
    hits = results.select("query_id", "doc_id").toPandas()
    if hits.empty:
        return spark.createDataFrame([], SNIPPET_SCHEMA)
    qterms = {
        int(q.query_id): sorted(set(tokenize_py(q.text, cfg)))
        for q in queries.itertuples(index=False)
    }
    unknown = sorted(set(hits["query_id"].astype(int)) - set(qterms))
    if unknown:
        # silently dropping these rows would be indistinguishable from
        # the documented "doc contains none of the query terms" skip —
        # a stale/filtered queries frame must surface as an error
        raise ValueError(
            f"hits reference query_id(s) {unknown[:5]} absent from the "
            "queries frame"
        )
    doc_ids = sorted(hits["doc_id"].unique().tolist())

    # pushed isin filters: doc_map prunes to the k result rows, corpus
    # prunes to their conversations — no full corpus scan. The metadata
    # rows are already on the driver after the first (pruned) scan, so
    # the broadcast join side is rebuilt from them instead of
    # re-executing the doc_map plan a second time.
    md_pdf = (
        doc_map.where(F.col("doc_id").isin(doc_ids))
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
    )
    if md_pdf.empty:  # results reference no doc known to doc_map
        return spark.createDataFrame([], SNIPPET_SCHEMA)
    convs = sorted(md_pdf["conv_id"].unique().tolist())
    docs = (
        corpus.where(F.col("conv_id").isin(convs))
        .select("conv_id", "turn_idx", "text")
        .join(F.broadcast(pdf_frame(spark, md_pdf)),
              ["conv_id", "turn_idx"])
        .select("doc_id", "text")
    )

    # doc -> list of (query_id, terms) requesting it
    want: dict[int, list[tuple[int, list[str]]]] = {}
    for h in hits.itertuples(index=False):
        want.setdefault(int(h.doc_id), []).append(
            (int(h.query_id), qterms.get(int(h.query_id), []))
        )

    def extract(it):
        for pdf in it:
            out_q, out_d, out_p, out_s = [], [], [], []
            for row in pdf.itertuples(index=False):
                toks = tokenize_py(row.text or "", cfg)
                ta = np.asarray(toks, dtype=object)
                for qid, terms in want.get(int(row.doc_id), []):
                    if not terms:
                        continue
                    mask = np.isin(ta, terms)
                    if not mask.any():
                        continue
                    i = int(mask.argmax())
                    lo = max(0, i - window)
                    out_q.append(qid)
                    out_d.append(int(row.doc_id))
                    out_p.append(i)
                    out_s.append(" ".join(toks[lo:i + window + 1]))
            yield pd.DataFrame(
                {"query_id": pd.Series(out_q, dtype=np.int32),
                 "doc_id": pd.Series(out_d, dtype=np.int64),
                 "first_pos": pd.Series(out_p, dtype=np.int32),
                 "snippet": pd.Series(out_s, dtype=object)}
            )

    return docs.mapInPandas(extract, schema=SNIPPET_SCHEMA)
