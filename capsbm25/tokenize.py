"""Tokenization — the graft analog of the reference's alphabet
normalization scan (/root/reference/src/main.cpp:61-70: a per-byte
vectorized map executed in parallel blocks).

Two interchangeable implementations with identical semantics
(lowercase, then extract runs of [a-z0-9]+, optional truncation to
max_token_len):

1. JVM-native column expression (default): ``F.regexp_extract_all(
   F.lower(text))`` — stays inside whole-stage codegen, zero Python.
2. Arrow ``pandas_udf`` (``use_pandas_tokenizer=True``): pandas
   ``str.findall`` on an Arrow batch — the "vectorized Arrow UDF"
   surface the north rule names; never per-row Python.

Tests assert the two produce identical token lists, and that both match
DuckDB's ``regexp_extract_all(lower(text), ...)`` (the oracle side).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from capsbm25.config import BuildConfig

DEFAULT_PATTERN = "[a-z0-9]+"


def tokens_expr(text: Column, cfg: BuildConfig | None = None) -> Column:
    """Token array as a native Catalyst expression (the fast path)."""
    cfg = cfg or BuildConfig()
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))), F.lit(cfg.token_pattern), 0
    )
    if cfg.max_token_len:
        toks = F.transform(toks, lambda t: F.substring(t, 1, cfg.max_token_len))
    return toks


def make_tokens_pandas_udf(cfg: BuildConfig | None = None):
    """Arrow-batched pandas UDF with identical semantics to tokens_expr."""
    cfg = cfg or BuildConfig()
    pattern = re.compile(cfg.token_pattern)
    max_len = cfg.max_token_len

    @F.pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        toks = texts.fillna("").str.lower().str.findall(pattern)
        if max_len:
            toks = toks.map(lambda ts: [t[:max_len] for t in ts])
        return toks

    return tokenize


def tokens_col(text: Column, cfg: BuildConfig | None = None) -> Column:
    """Dispatch on cfg.use_pandas_tokenizer."""
    cfg = cfg or BuildConfig()
    if cfg.use_pandas_tokenizer:
        return make_tokens_pandas_udf(cfg)(text)
    return tokens_expr(text, cfg)


def tokenize_py(text: str, cfg: BuildConfig | None = None) -> list[str]:
    """Pure-Python tokenizer used by tests/oracle.py (must stay in exact
    agreement with tokens_expr / the pandas UDF)."""
    cfg = cfg or BuildConfig()
    toks = re.findall(cfg.token_pattern, (text or "").lower())
    if cfg.max_token_len:
        toks = [t[: cfg.max_token_len] for t in toks]
    return toks


def duckdb_tokens_sql(text_expr: str, cfg: BuildConfig | None = None) -> str:
    """DuckDB SQL expression producing the same token list (oracle side)."""
    cfg = cfg or BuildConfig()
    base = (
        f"regexp_extract_all(lower(coalesce({text_expr}, '')), "
        f"'{cfg.token_pattern}')"
    )
    if cfg.max_token_len:
        base = f"list_transform({base}, t -> t[1:{cfg.max_token_len}])"
    return base
