"""Tokenizer parity: JVM expression == Arrow pandas UDF == pure Python
== DuckDB SQL (the oracle side used by __spark_entry__.py)."""

import duckdb
import pandas as pd

from capsbm25.config import BuildConfig
from capsbm25.tokenize import (
    duckdb_tokens_sql,
    make_tokens_pandas_udf,
    tokenize_py,
    tokens_expr,
)

TEXTS = [
    "Hello, World! 42 times",
    "",
    None,
    "MiXeD-CaSe w0001, punct...ed;tokens",
    "a " * 50 + "b",
    "éàç unicode stays out 字",
    "under_score dash-dash 3.14",
]


def test_four_way_parity(spark):
    pdf = pd.DataFrame({"text": TEXTS})
    df = spark.createDataFrame(pdf)
    cfg = BuildConfig()

    jvm = [r[0] for r in df.select(tokens_expr(df.text, cfg)).collect()]
    udf = [r[0] for r in df.select(make_tokens_pandas_udf(cfg)(df.text)).collect()]
    py = [tokenize_py(t, cfg) for t in TEXTS]
    duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {duckdb_tokens_sql('text')} FROM pdf"
        ).fetchall()
    ]
    assert jvm == py
    assert udf == py
    assert duck == py


def test_max_token_len(spark):
    cfg = BuildConfig(max_token_len=3)
    pdf = pd.DataFrame({"text": ["alphabet soup x"]})
    df = spark.createDataFrame(pdf)
    assert df.select(tokens_expr(df.text, cfg)).collect()[0][0] == ["alp", "sou", "x"]
    assert tokenize_py("alphabet soup x", cfg) == ["alp", "sou", "x"]
    duck = duckdb.sql(
        f"SELECT {duckdb_tokens_sql('text', cfg)} FROM pdf"
    ).fetchall()[0][0]
    assert duck == ["alp", "sou", "x"]
