"""capsbm25 — a PySpark-native inverted-index builder + BM25 top-k query engine.

Grafts the samplesort-based parallel construction idea of CaPS-SA
(/root/reference: local sort -> sampled splitters -> range partition ->
bounded k-way merge -> boundary fix-up -> order-invariant validation,
see /root/reference/src/Suffix_Array.cpp:466-494) onto distributed
posting-list construction over Iceberg/Parquet tables of multi-turn
transcripts, expressed Spark-first: DataFrame plans, one explicit range
shuffle, Arrow-vectorized kernels, zero per-row Python UDFs.
"""

from capsbm25.config import BuildConfig

__all__ = ["BuildConfig"]
__version__ = "0.1.0"
