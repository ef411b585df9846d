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

# token_pattern executes under THREE regex engines — Java (tokens_expr
# via regexp_extract_all), Python re (the build kernels and every
# query-side tokenize_py), and DuckDB RE2 (the oracle) — so only a
# conservative common dialect keeps the "cannot drift" contract: plain
# ASCII literals, character classes with ranges, +*?| quantifiers. No
# backslash escapes (\\w is Unicode in Python, ASCII in Java), no
# groups (findall returns group CONTENTS where regexp_extract_all
# returns full matches), no negated classes (byte-vs-codepoint
# boundary differences), no dot.
_PATTERN_SAFE = re.compile(r"^[a-z0-9\[\]\-+*?|]+$")
_checked_patterns: set[str] = set()


def _validate_token_pattern(pattern: str) -> None:
    if pattern in _checked_patterns:
        return
    if not _PATTERN_SAFE.match(pattern):
        raise ValueError(
            "token_pattern must stay within the Java/Python/RE2 common "
            "dialect [a-z0-9[]-+*?|] — backslash escapes, groups, "
            f"negation and '.' evaluate differently per engine: "
            f"{pattern!r}"
        )
    re.compile(pattern)  # malformed patterns fail here, loudly
    _checked_patterns.add(pattern)


def _checked(cfg: BuildConfig) -> str:
    """cfg.token_pattern, validated once per distinct pattern."""
    _validate_token_pattern(cfg.token_pattern)
    return cfg.token_pattern


def _chargrams_expr(text: Column, n: int) -> Column:
    """All overlapping n-char windows of lower(text) as a native
    expression; gram i (0-based) starts at char offset i, so token
    position == char offset — which is what makes phrase machinery over
    chargrams equal exact substring search."""
    hay = F.lower(F.coalesce(text, F.lit("")))
    return F.when(
        F.length(hay) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(hay) - (n - 1)),
            lambda i: hay.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def tokens_expr(text: Column, cfg: BuildConfig | None = None) -> Column:
    """Token array as a native Catalyst expression (the fast path)."""
    cfg = cfg or BuildConfig()
    if cfg.tokenizer == "chargram":
        return _chargrams_expr(text, cfg.chargram_n)
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))), F.lit(_checked(cfg)), 0
    )
    if cfg.max_token_len:
        toks = F.transform(toks, lambda t: F.substring(t, 1, cfg.max_token_len))
    return toks


def make_series_tokenizer(cfg: BuildConfig | None = None):
    """pandas-Series -> Series-of-token-lists callable for the Arrow
    build kernels (_batch_pairs); one place defines both tokenizer
    modes so build, query and pandas-UDF sides cannot drift."""
    cfg = cfg or BuildConfig()
    if cfg.tokenizer == "chargram":
        n = cfg.chargram_n

        def tok(texts: pd.Series) -> pd.Series:
            low = texts.fillna("").str.lower()
            return low.map(
                lambda s: [s[i:i + n] for i in range(len(s) - n + 1)]
            )

        return tok
    pattern = re.compile(_checked(cfg))
    max_len = cfg.max_token_len

    def tok(texts: pd.Series) -> pd.Series:
        toks = texts.fillna("").str.lower().str.findall(pattern)
        if max_len:
            toks = toks.map(lambda ts: [t[:max_len] for t in ts])
        return toks

    return tok


def make_tokens_pandas_udf(cfg: BuildConfig | None = None):
    """Arrow-batched pandas UDF with identical semantics to tokens_expr."""
    tok = make_series_tokenizer(cfg)

    @F.pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        return tok(texts)

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
    s = (text or "").lower()
    if cfg.tokenizer == "chargram":
        n = cfg.chargram_n
        return [s[i:i + n] for i in range(len(s) - n + 1)]
    toks = re.findall(_checked(cfg), s)
    if cfg.max_token_len:
        toks = [t[: cfg.max_token_len] for t in toks]
    return toks


def duckdb_tokens_sql(text_expr: str, cfg: BuildConfig | None = None) -> str:
    """DuckDB SQL expression producing the same token list (oracle side)."""
    cfg = cfg or BuildConfig()
    if cfg.tokenizer == "chargram":
        # substring oracles count occurrences directly (DuckDB's RE2 has
        # no lookahead); no entry tokenizes via SQL in chargram mode
        raise ValueError("no DuckDB tokenizer for chargram mode")
    # escape single quotes for the SQL string literal (a pattern like
    # "[a-z']+" would otherwise terminate the literal early)
    pat_sql = _checked(cfg).replace("'", "''")
    base = (
        f"regexp_extract_all(lower(coalesce({text_expr}, '')), "
        f"'{pat_sql}')"
    )
    if cfg.max_token_len:
        base = f"list_transform({base}, t -> t[1:{cfg.max_token_len}])"
    return base
