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

from pyspark.sql import DataFrame, SparkSession

_WRITER_CONF_LOCK = threading.Lock()


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Iceberg catalogs (empty in this sandbox)."""
    out = []
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in str(v).lower():
                out.append(k.rsplit(".", 1)[1])
    return out


def is_table_ident(dest: str) -> bool:
    """Heuristic: catalog table ident vs filesystem path."""
    return "/" not in dest and not dest.endswith(".parquet") and "." in dest


def write_table(
    df: DataFrame,
    dest: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if is_table_ident(dest):
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
        # advice). Holding the lock for the already-tuned case costs
        # nothing (configure_session-tuned sessions never contend).
        with _WRITER_CONF_LOCK:
            try:
                cur = int(spark.conf.get(key, "0"))
            except (TypeError, ValueError):
                cur = 0
            if cur >= 64:
                df.write.mode(mode).partitionBy(*partition_by).parquet(dest)
                return
            prev = spark.conf.get(key, None)
            spark.conf.set(key, "64")
            try:
                df.write.mode(mode).partitionBy(*partition_by).parquet(dest)
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        return
    df.write.mode(mode).parquet(dest)


def read_table(spark: SparkSession, src: str) -> DataFrame:
    if is_table_ident(src):
        return spark.read.table(src)
    return spark.read.parquet(src)
