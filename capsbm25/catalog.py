"""Iceberg-or-Parquet table seam (SURVEY §7.1).

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jar, so every engine write/read goes through this seam:

* If an Iceberg catalog is configured (any ``spark.sql.catalog.<name>``
  whose impl mentions iceberg) and the destination looks like a table
  name (``db.table`` / ``cat.db.table``), use ``writeTo`` /
  ``read.table`` — snapshot isolation, partition evolution, time travel
  come free.
* Otherwise fall back to partitioned Parquet paths. Engine code is
  identical either way.

The build orchestrator (build.py) passes filesystem paths in the
sandbox; on a cluster, point BuildConfig.extra["table_prefix"] at a
catalog namespace and the same build writes Iceberg tables.
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_WRITER_CONF_LOCK = threading.Lock()

# Driver<->JVM transfer helpers. PySpark's default toPandas() /
# createDataFrame(pandas) serialize ROW-AT-A-TIME through the pickle
# path unless spark.sql.execution.arrow.pyspark.enabled is set — and
# it defaults to FALSE, so every driver fetch that scales with data
# size (doc-filter id sets, tombstone probes, splitter samples,
# candidate collects) pays ~10x: 13.4s pickle vs 1.3s Arrow for a
# 3.5M-row single-long-column fetch on this hardware. DataFrame.toArrow
# (Spark 4.0+) and createDataFrame(pyarrow.Table) use Arrow batches
# UNCONDITIONALLY, without flipping the session conf — flipping it
# globally would also change toPandas dtype behavior under the CALLER's
# session (the driver harness hashes dtypes), so the engine opts in
# per call site instead.


def arrow_collect(df: DataFrame) -> pd.DataFrame:
    """Bounded driver fetch via Arrow batches; falls back to the pickle
    path on runtimes without DataFrame.toArrow (Spark < 4.0). Use for
    every collect whose row count scales with data size; cosmetic
    fetches (top-k results, aggregates) don't care."""
    to_arrow = getattr(df, "toArrow", None)
    if to_arrow is None:  # pragma: no cover - Spark < 4.0 only
        return df.toPandas()
    return to_arrow().to_pandas()


def arrow_frame(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """pandas -> DataFrame via an Arrow table (the reverse direction of
    arrow_collect, ~4x over pickled createDataFrame at 100k+ rows).
    Same Spark < 4.0 fallback."""
    if not hasattr(DataFrame, "toArrow"):  # pragma: no cover
        return spark.createDataFrame(pdf)
    import pyarrow as pa

    return spark.createDataFrame(pa.Table.from_pandas(
        pdf, preserve_index=False))


def ids_frame(spark: SparkSession, ids: np.ndarray) -> DataFrame:
    """A single-column (doc_id long) DataFrame from a driver-side id
    array — the join-shaped form of a collected doc set."""
    return arrow_frame(spark, pd.DataFrame({"doc_id":
                                            np.asarray(ids, np.int64)}))


def pdf_frame(spark: SparkSession, pdf: pd.DataFrame,
              ddl: str | None = None) -> DataFrame:
    """Driver pandas -> DataFrame for the SMALL hot-path frames (query
    terms, expansion pairs, clause metadata), via Arrow batches but
    PRESERVING the pickle path's inferred schema (integer columns
    widen to long, floats to double) so every call site keeps its
    previous downstream schema bit-for-bit.

    Why not plain createDataFrame(pandas): it pickles the rows into a
    defaultParallelism-sliced python RDD, and every EVALUATION of the
    frame — each broadcast build, each join — then runs a python-worker
    job whose floor is ~0.15s + ~3ms/slice on this hardware (measured:
    a 2-row frame costs 0.26-0.31s per use on local[32]; the Arrow form
    0.03s). The constant is paid once per query call, per frame, on
    nearly every query surface.

    ddl: explicit schema for frames whose columns inference cannot type
    (all-None object columns, empty lists) — the Arrow table is built
    against the equivalent pyarrow schema, so declared types win and no
    widening applies. Falls back to the pickle path whenever Arrow
    would NOT reproduce it exactly: NaN floats (Arrow maps NaN to null,
    pickle keeps NaN), datetime/timedelta columns (tz semantics
    differ), or a runtime without DataFrame.toArrow."""

    def _legacy():
        return (spark.createDataFrame(pdf, schema=ddl) if ddl
                else spark.createDataFrame(pdf))

    if not hasattr(DataFrame, "toArrow"):  # pragma: no cover
        return _legacy()
    import pyarrow as pa

    cast: dict = {}
    for c in pdf.columns:
        dt = pdf.dtypes[c]
        kind = getattr(dt, "kind", "O")
        if kind in "mM":
            return _legacy()
        if kind == "f":
            if pdf[c].isna().any():
                return _legacy()
            if ddl is None and dt != np.float64:
                cast[c] = np.float64
        elif kind in "iu" and ddl is None and dt != np.int64:
            cast[c] = np.int64
    if cast:
        pdf = pdf.astype(cast)
    if ddl is None:
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    else:
        try:
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            tbl = pa.Table.from_pandas(
                pdf, schema=to_arrow_schema(StructType.fromDDL(ddl)),
                preserve_index=False)
        except Exception:  # pragma: no cover - internal-API drift
            return _legacy()
    return spark.createDataFrame(tbl)


def is_table_ident(dest: str) -> bool:
    """Heuristic: catalog table ident vs filesystem path."""
    return "/" not in dest and not dest.endswith(".parquet") and "." in dest


def catalog_configured(spark: SparkSession, dest: str) -> bool:
    """True when dest's catalog is actually configured on the session
    (RUNTIME conf, so catalogs registered via spark.conf.set count).
    The module docstring's gate is 'a catalog is configured AND dest
    looks like a table name' — the shape heuristic alone would route a
    legal relative dir name with a dot ('bench.idx') into writeTo
    against the default catalog, landing data under spark-warehouse/
    instead of the intended path. 'cat.db.t' checks
    spark.sql.catalog.<cat>; 'db.t' checks a REPLACED session catalog
    (spark.sql.catalog.spark_catalog, e.g. Iceberg's
    SparkSessionCatalog) — the built-in default doesn't count."""
    head = dest.split(".", 1)[0] if dest.count(".") >= 2 else "spark_catalog"
    try:
        return spark.conf.get(f"spark.sql.catalog.{head}", None) is not None
    except Exception:
        return False


def _routes_to_catalog(spark: SparkSession, dest: str) -> bool:
    return is_table_ident(dest) and catalog_configured(spark, dest)


def write_table(
    df: DataFrame,
    dest: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if _routes_to_catalog(df.sparkSession, dest):
        w = df.writeTo(dest)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    if partition_by:
        # dynamic-partition writes default to maxConcurrentOutputFileWriters=0,
        # which inserts a full per-task SORT on the partition columns so a
        # single writer can stream dir-by-dir — a pipeline break that
        # measured +~15% build wall at bench scale. A task holds at most
        # a handful of part dirs (parts-per-wave / tasks), so concurrent
        # writers are cheap. Sessions that went through
        # session.configure_session already carry >=64 and skip the
        # transient set/restore entirely; otherwise the set/write/restore
        # is serialized under a module lock so two threads of one session
        # can't interleave set/restore and strand the wrong value.
        spark = df.sparkSession
        key = "spark.sql.maxConcurrentOutputFileWriters"
        # the >=64 check happens INSIDE the lock: an unlocked read can
        # observe another thread's transient set(64), whose finally
        # then restores the conf to 0/unset before THIS write plans —
        # silently reintroducing the per-task partition sort (round-5
        # advice). Every transient setter holds the lock across its
        # whole write, so cur >= 64 observed UNDER the lock proves the
        # value is durable (configure_session) — and a durable-tuned
        # write then runs OUTSIDE the lock, so concurrent writes of a
        # tuned session don't serialize on each other's full job walls.
        with _WRITER_CONF_LOCK:
            try:
                cur = int(spark.conf.get(key, "0"))
            except (TypeError, ValueError):
                cur = 0
            if cur < 64:
                prev = spark.conf.get(key, None)
                spark.conf.set(key, "64")
                try:
                    df.write.mode(mode).partitionBy(*partition_by).parquet(
                        dest)
                finally:
                    if prev is None:
                        spark.conf.unset(key)
                    else:
                        spark.conf.set(key, prev)
                return
        df.write.mode(mode).partitionBy(*partition_by).parquet(dest)
        return
    df.write.mode(mode).parquet(dest)


def read_table(spark: SparkSession, src: str) -> DataFrame:
    if _routes_to_catalog(spark, src):
        return spark.read.table(src)
    return spark.read.parquet(src)
