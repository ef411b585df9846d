"""Suggest family: prefix autocomplete and did-you-mean spelling
correction over the term dictionary (Lucene suggest-module analogs —
TermSuggester / completion and DirectSpellChecker).

These are DICTIONARY-ONLY queries: no posting payload is ever read —
ReadSchema prunes the scan to (term, df[, tlen]) whether the input is
the persisted dictionary side index (build.py's `dictionary` stage) or
a raw postings frame — so their cost is dictionary-sized at any corpus
size, the Spark analog of Lucene's suggester structures living beside
the inverted index. The reference's sorted term order that makes its
suffix-array range scans cheap (/root/reference/src/Suffix_Array.cpp:
252-297) is the same order the dictionary parquet's row-group min/max
exploits here: prefix predicates push as StringStartsWith, the fuzzy
length window as a `tlen` range.

Result ranking is per-query top-k via the engine's two-phase salted
window (no single task ever sorts a pathological prefix's full match
set — a one-char prefix over a 10^8-term dictionary lands on 32 salt
buckets before the k-bounded global phase).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capsbm25.catalog import pdf_frame
from capsbm25.config import BuildConfig
from capsbm25.query import _fuzzy_scan_cond, _salted_topk
from capsbm25.tokenize import tokenize_py

SUGGEST_SCHEMA = "query_id int, term string, df long, rank int"
SPELL_SCHEMA = "query_id int, term string, dist int, df long, rank int"


def _dictionary_terms(postings: DataFrame,
                      dictionary: DataFrame | None) -> DataFrame:
    """(term, df, tlen) rows from the persisted dictionary when
    available, else a 3-column projection of the postings (pre-round-5
    indexes, streaming segment unions — POSTINGS_SCHEMA always carries
    df). Multi-row terms (salted hot terms: one dictionary row per
    part; segments: one per segment) are the caller's concern —
    suggestion surfaces aggregate per-term total df before ranking.
    A frame with no df column raises: popularity ranking and the
    min_df threshold would silently degrade (df=0 + the default
    min_df=1 used to return ZERO corrections with no error)."""
    dic = dictionary if dictionary is not None else postings
    if "df" not in dic.columns:
        raise ValueError(
            "suggest surfaces need a df column (term popularity); got "
            f"columns {dic.columns} — pass the index postings or the "
            "persisted dictionary, not a projection without df"
        )
    cols = ["term", "df"] + (["tlen"] if "tlen" in dic.columns else [])
    dic = dic.select(*cols)
    if "tlen" not in dic.columns:
        dic = dic.withColumn("tlen", F.length("term"))
    return dic


def _ranked_topk(grouped: DataFrame, rank_cols, out_cols) -> DataFrame:
    """Per-query top-k over per-TERM rows (post-aggregation: one row
    per (query, term)) via the engine's shared two-phase salted
    window, salted on term. No task sorts more than one bucket of one
    query's matches."""
    return _salted_topk(grouped, rank_cols, out_cols, salt_col="term")


def suggest_terms(
    spark: SparkSession,
    postings: DataFrame,
    queries: pd.DataFrame,
    cfg: BuildConfig | None = None,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Prefix autocomplete (Lucene suggest / TermSuggester analog):
    the top-k index terms completing each prefix, ranked by df DESC
    (the completions matching the most documents first — Lucene's
    popularity-weighted completion), ties by term ASC. The prefix
    itself, when it is an index term, is a legal completion.

    queries: pandas (query_id, text, k) — text IS the prefix, matched
    against the index's normalized terms (lowercased here for
    consistency, like prefix_topk). Empty prefixes are dropped: an
    empty completion prompt has no meaningful suggestion set. Word
    tokenizers only.

    Returns (query_id, term, df, rank) — df is the term's corpus-wide
    document frequency (summed across dictionary rows for salted /
    segmented multi-row terms).

    Scale shape: the batch's StringStartsWith union pushes into the
    dictionary parquet scan (term-sorted row groups -> min/max range
    pruning, the reference's binary-search analog); matching, the
    per-term df aggregate, and the salted top-k all run over
    dictionary-sized rows. Posting payloads are never read and nothing
    is collected."""
    cfg = cfg or BuildConfig()
    if cfg.tokenizer == "chargram":
        raise ValueError(
            "suggest_terms requires a word-tokenizer index; a prefix "
            "of a chargram is not a completion prompt"
        )
    qpdf = queries.copy()
    qpdf["prefix"] = [str(t or "").lower() for t in qpdf["text"]]
    qpdf = qpdf[qpdf["prefix"] != ""][["query_id", "prefix", "k"]]
    if qpdf.empty:
        return spark.createDataFrame([], SUGGEST_SCHEMA)
    prefixes = sorted(set(qpdf["prefix"]))
    scan_cond = F.col("term").startswith(prefixes[0])
    for p in prefixes[1:]:
        scan_cond = scan_cond | F.col("term").startswith(p)
    qdf = pdf_frame(spark, qpdf).select(
        F.col("query_id").cast("int"), "prefix", F.col("k").cast("int"))
    matched = (
        _dictionary_terms(postings, dictionary)
        .where(scan_cond)
        .join(F.broadcast(qdf), F.col("term").startswith(F.col("prefix")))
    )
    grouped = matched.groupBy("query_id", "term").agg(
        F.sum("df").cast("long").alias("df"), F.first("k").alias("k"))
    return _ranked_topk(
        grouped, [F.desc("df"), F.asc("term")],
        ["query_id", "term", "df", "rank"],
    )


def suggest_spelling(
    spark: SparkSession,
    postings: DataFrame,
    queries: pd.DataFrame,
    cfg: BuildConfig | None = None,
    dictionary: DataFrame | None = None,
    max_edits: int = 2,
    min_df: int = 1,
) -> DataFrame:
    """Did-you-mean spelling correction (Lucene DirectSpellChecker):
    the top-k index terms within `max_edits` classic Levenshtein edits
    of each query word, EXCLUDING the word itself (a spell checker
    proposes alternatives; dist >= 1), ranked by dist ASC (closest
    corrections first), then df DESC (DirectSpellChecker's frequency
    comparator), ties by term ASC. `min_df` drops corrections rarer
    than the threshold (the thresholdFrequency role: a correction seen
    once in 10^11 docs is likelier a typo than a fix).

    queries: pandas (query_id, text, k) — text must tokenize to ONE
    word (per-term correction, like fuzzy_topk / Lucene). max_edits is
    capped at 2, the Lucene bound.

    Returns (query_id, term, dist, df, rank); queries with no
    qualifying correction yield no rows.

    Scale shape: identical to fuzzy_topk's dictionary phase — the
    |len(term) - len(word)| <= max_edits window pushes to the
    dictionary scan as a `tlen` range (parquet row-group min/max over
    the term-sorted layout; the FST-automaton analog), the banded
    built-in levenshtein (threshold form, early exit) tests only the
    surviving rows, and ranking is the salted top-k over matched
    terms. No posting payload is read; nothing is collected."""
    cfg = cfg or BuildConfig()
    if cfg.tokenizer == "chargram":
        raise ValueError(
            "suggest_spelling requires a word-tokenizer index; edit "
            "distance over chargrams is not meaningful"
        )
    if not 1 <= int(max_edits) <= 2:
        raise ValueError("max_edits must be 1..2 (the Lucene bound)")
    if int(min_df) < 0:
        raise ValueError("min_df must be >= 0")
    rows = []
    for q in queries.itertuples(index=False):
        toks = tokenize_py(q.text or "", cfg)
        if len(toks) != 1:
            raise ValueError(
                f"suggest_spelling corrects ONE word per query (Lucene "
                f"DirectSpellChecker); {q.text!r} tokenizes to "
                f"{len(toks)} terms"
            )
        rows.append((int(q.query_id), toks[0], int(q.k)))
    qpdf = pd.DataFrame(rows, columns=["query_id", "qterm", "k"])
    if qpdf.empty:
        return spark.createDataFrame([], SPELL_SCHEMA)
    me = int(max_edits)
    qdf = pdf_frame(spark, qpdf).select(
        F.col("query_id").cast("int"), "qterm", F.col("k").cast("int"))
    # join on the cheap per-pair length band; the banded levenshtein
    # (the expensive predicate) is evaluated ONCE per in-band pair and
    # filtered on its materialized value — dist >= 1 excludes both the
    # word itself (0) and over-threshold rows (-1, the threshold
    # form's sentinel)
    matched = (
        _dictionary_terms(postings, dictionary)
        .where(_fuzzy_scan_cond([len(t) for t in qpdf["qterm"]], me))
        .join(
            F.broadcast(qdf),
            F.abs(F.col("tlen") - F.length(F.col("qterm"))) <= me,
        )
        .withColumn(
            "dist", F.levenshtein(F.col("term"), F.col("qterm"), me))
        .where(F.col("dist") >= 1)
    )
    grouped = (
        matched.groupBy("query_id", "term", "dist")
        .agg(F.sum("df").cast("long").alias("df"),
             F.first("k").alias("k"))
        .where(F.col("df") >= int(min_df))
    )
    return _ranked_topk(
        grouped, [F.asc("dist"), F.desc("df"), F.asc("term")],
        ["query_id", "term", "dist", "df", "rank"],
    )
