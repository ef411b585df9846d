"""Posting-list construction: pair extraction, range shuffle, bounded
merge/assembly, and the salted-hot-term fix-up.

Pipeline stage mapping to the reference (SURVEY.md §2/§3):

  extract_pairs        ~ normalization scan + local work
                         (/root/reference/src/main.cpp:61-70) — one
                         Arrow kernel: tokenize, per-doc tf, dl; no
                         shuffle (tf is computable doc-locally, unlike
                         a naive explode+groupBy which would shuffle
                         every token occurrence).
  with_part_id         ~ locate_pivots (Suffix_Array.cpp:225-249) —
                         vectorized searchsorted against the plan.
  assemble_postings    ~ partition_sub_subarrays + merge_sub_subarrays
                         (:300-368, :371-428): ONE hash exchange on
                         part_id, Tungsten sortWithinPartitions
                         (external sort with spill — strictly better
                         than the reference's RAM-only merge), then a
                         streaming Arrow kernel folding each term's
                         sorted run into one delta+varint posting row.
  merge_hot_partials   ~ compute_partition_boundary_lcp (:431-447):
                         stitch cross-partition metadata — here, merge
                         the salted partial postings of hot terms.

Posting row schema (FIXTURES.md §3, plus dls so queries never join a
10^12-row doc_stats table — doc lengths travel with the posting):
  term, df, cf, doc_ids (delta+varint), tfs (varint), dls (varint),
  block_max: array<struct<upper:float,last_doc:long>>, part_id, partial
"""

from __future__ import annotations

import re
from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from capsbm25.codec import delta_decode, delta_encode, decode_varints, encode_varints
from capsbm25.config import BuildConfig
from capsbm25.partition import PartitionPlan
from capsbm25.scoring import idf as idf_fn
from capsbm25.scoring import term_scores, upper_f32

PAIRS_SCHEMA = "term string, doc_id long, tf int, dl int"
POSTINGS_SCHEMA = (
    "term string, df long, cf long, doc_ids binary, tfs binary, dls binary, "
    "block_max array<struct<upper:float,last_doc:long>>, "
    "part_id int, partial boolean"
)
POSTINGS_COLS = [
    "term", "df", "cf", "doc_ids", "tfs", "dls", "block_max", "part_id", "partial",
]


def _batch_pairs(pdf: pd.DataFrame, pattern: re.Pattern, max_len) -> pd.DataFrame:
    """Vectorized (term, doc_id, tf, dl) extraction for one Arrow batch."""
    toks = pdf["text"].fillna("").str.lower().str.findall(pattern)
    lens = toks.map(len).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.DataFrame(
            {"term": pd.Series(dtype=object), "doc_id": pd.Series(dtype=np.int64),
             "tf": pd.Series(dtype=np.int32), "dl": pd.Series(dtype=np.int32)}
        )
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    if max_len:
        flat = pd.Series(flat).str.slice(0, max_len).to_numpy(dtype=object)
    rows = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
    codes, uniq = pd.factorize(flat, sort=False)
    order = np.lexsort((codes, rows))
    r, c = rows[order], codes[order]
    newgrp = np.ones(r.size, dtype=bool)
    np.not_equal(r[1:], r[:-1], out=newgrp[1:])
    newgrp[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(newgrp)
    counts = np.diff(np.append(starts, r.size))
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "term": np.asarray(uniq, dtype=object)[c[starts]],
            "doc_id": ids[r[starts]],
            "tf": counts.astype(np.int32),
            "dl": lens[r[starts]].astype(np.int32),
        }
    )


def extract_pairs(
    docs: DataFrame,
    cfg: BuildConfig | None = None,
    plan: PartitionPlan | None = None,
) -> DataFrame:
    """docs(doc_id, text) -> (term, doc_id, tf, dl[, part_id]).

    Map-side only (tf/dl are doc-local, so no shuffle — unlike a naive
    explode+groupBy, which measured 4x slower at bench scale). When a
    plan is given, the samplesort part_id assignment is fused into the
    same Arrow pass instead of a second kernel over all pairs.
    """
    cfg = cfg or BuildConfig()
    pattern = re.compile(cfg.token_pattern)
    max_len = cfg.max_token_len
    schema = PAIRS_SCHEMA + (", part_id int" if plan is not None else "")

    def kernel(it):
        for pdf in it:
            out = _batch_pairs(pdf, pattern, max_len)
            if plan is not None:
                out["part_id"] = plan.assign(
                    out["term"].to_numpy(dtype=object), out["doc_id"].to_numpy()
                )
            yield out

    return docs.select("doc_id", "text").mapInPandas(kernel, schema=schema)


def with_part_id(pairs: DataFrame, plan: PartitionPlan) -> DataFrame:
    """Attach the logical range-partition id from the samplesort plan."""
    def kernel(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["part_id"] = plan.assign(
                pdf["term"].to_numpy(dtype=object), pdf["doc_id"].to_numpy()
            )
            yield pdf

    return pairs.mapInPandas(kernel, schema=PAIRS_SCHEMA + ", part_id int")


def _posting_rows(flushes, N, avgdl, cfg, hot_terms):
    """Turn a list of (term, docs, tfs, dls, part_id) into posting rows."""
    out = []
    for term, docs, tfs, dls, part_id in flushes:
        docs = np.asarray(docs, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        dls = np.asarray(dls, dtype=np.int64)
        partial = term in hot_terms
        df = int(docs.size)
        if partial:
            bmax = []
        else:
            sc = term_scores(tfs, dls, float(idf_fn(N, df)), avgdl, cfg.k1, cfg.b)
            bmax = _block_max(sc, docs, cfg.block_size)
        out.append(
            {
                "term": term,
                "df": df,
                "cf": int(tfs.sum()),
                "doc_ids": delta_encode(docs),
                "tfs": encode_varints(tfs),
                "dls": encode_varints(dls),
                "block_max": bmax,
                "part_id": int(part_id),
                "partial": partial,
            }
        )
    return pd.DataFrame(out, columns=POSTINGS_COLS)


def _block_max(scores: np.ndarray, docs: np.ndarray, block_size: int):
    f32 = upper_f32(scores)
    n = docs.size
    blocks = []
    for lo in range(0, n, block_size):
        hi = min(lo + block_size, n)
        blocks.append(
            {"upper": float(f32[lo:hi].max()), "last_doc": int(docs[hi - 1])}
        )
    return blocks


def assemble_postings(
    pairs_with_part: DataFrame,
    plan: PartitionPlan,
    N: int,
    avgdl: float,
    cfg: BuildConfig | None = None,
) -> DataFrame:
    """Range shuffle + local sort + streaming posting assembly.

    Invariant: a non-hot term maps to exactly one part_id, and one
    part_id lands in exactly one task after ``repartition(n, part_id)``,
    so every non-hot term yields exactly one posting row with globally
    sorted doc_ids — no second shuffle, no groupBy. Hot terms yield one
    partial row per salt bucket, stitched by merge_hot_partials.
    """
    cfg = cfg or BuildConfig()
    hot = set(plan.hot_terms)

    shuffled = pairs_with_part.repartition(
        cfg.shuffle_partitions, "part_id"
    ).sortWithinPartitions("term", "doc_id")

    def kernel(it):
        cur_term = None
        cur_part = 0
        bufs: tuple[list, list, list] = ([], [], [])
        flushes = []
        for pdf in it:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy(dtype=object)
            docs = pdf["doc_id"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["dl"].to_numpy()
            parts = pdf["part_id"].to_numpy()
            newgrp = np.ones(terms.size, dtype=bool)
            newgrp[1:] = terms[1:] != terms[:-1]
            starts = np.flatnonzero(newgrp)
            ends = np.append(starts[1:], terms.size)
            for lo, hi in zip(starts, ends):
                t = terms[lo]
                if t != cur_term and cur_term is not None:
                    flushes.append(
                        (cur_term, np.concatenate(bufs[0]),
                         np.concatenate(bufs[1]), np.concatenate(bufs[2]), cur_part)
                    )
                    bufs = ([], [], [])
                if t != cur_term:
                    cur_term, cur_part = t, int(parts[lo])
                bufs[0].append(docs[lo:hi])
                bufs[1].append(tfs[lo:hi])
                bufs[2].append(dls[lo:hi])
            if len(flushes) >= 4096:
                yield _posting_rows(flushes, N, avgdl, cfg, hot)
                flushes = []
        if cur_term is not None:
            flushes.append(
                (cur_term, np.concatenate(bufs[0]),
                 np.concatenate(bufs[1]), np.concatenate(bufs[2]), cur_part)
            )
        if flushes:
            yield _posting_rows(flushes, N, avgdl, cfg, hot)

    return shuffled.mapInPandas(kernel, schema=POSTINGS_SCHEMA)


def merge_hot_partials(
    partials: DataFrame, N: int, avgdl: float, cfg: BuildConfig | None = None
) -> DataFrame:
    """Stitch salted partial postings into final rows (boundary fix-up).

    Only hot terms reach this groupBy — its input is tiny (a handful of
    rows per hot term), so the extra shuffle is negligible.
    """
    cfg = cfg or BuildConfig()

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        docs = np.concatenate([delta_decode(b) for b in pdf["doc_ids"]])
        tfs = np.concatenate(
            [decode_varints(b).astype(np.int64) for b in pdf["tfs"]]
        )
        dls = np.concatenate(
            [decode_varints(b).astype(np.int64) for b in pdf["dls"]]
        )
        order = np.argsort(docs, kind="stable")
        docs, tfs, dls = docs[order], tfs[order], dls[order]
        part_id = int(pdf["part_id"].min())
        return _posting_rows([(key[0], docs, tfs, dls, part_id)], N, avgdl, cfg, set())

    return partials.groupBy("term").applyInPandas(merge, schema=POSTINGS_SCHEMA)
