"""Engine-facing SparkSession tuning.

The engine persists postings partitioned by ``part_id`` (hundreds of
directories per index at scale — the guaranteed-pruning layout,
postings.py / build.py). Two Spark defaults interact badly with that
layout and are corrected here, ONCE, on the session that runs the
engine — previously these lived only in bench.py, so a user's own
session silently paid a distributed-listing job per read:

* ``spark.sql.sources.parallelPartitionDiscovery.threshold`` (default
  32): reading a path with more than 32 partition dirs launches a
  distributed LISTING JOB. On a local / POSIX filesystem that is pure
  task-scheduling overhead (~1s per read at 512 dirs); driver-side
  listing is effectively free. On object stores (S3/GCS) the parallel
  listing genuinely wins, so the raise is gated on the index living on
  a local filesystem.
* ``spark.sql.maxConcurrentOutputFileWriters`` (default 0): a dynamic
  ``partitionBy`` write with 0 concurrent writers inserts a full
  per-task SORT on the partition columns so one writer can stream
  dir-by-dir — a pipeline break measured at +~15% build wall. A build
  task holds at most parts-per-wave/tasks dirs, so 64 concurrent
  writers are cheap. Setting it here (session-scoped, once) also
  removes the transient set/restore in catalog.write_table from the
  hot path (the restore raced concurrent writers; see catalog.py).

Both are runtime SQL confs — safe to set on an existing session.
``build_index`` and the streaming ingest entry points call this
automatically for filesystem destinations; cluster deployments writing
to object stores should rely on the defaults (see README deployment
notes).
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import SparkSession

_LOCAL_SCHEMES = ("", "file")


def _is_local_path(dest: str, spark: SparkSession | None = None) -> bool:
    """True when dest resolves to a local filesystem. An explicit
    scheme decides directly; a SCHEME-LESS dest (including a bare
    relative name like "myindex" — round-5 advice) resolves against
    Hadoop's fs.defaultFS when a session is given: on a cluster whose
    default filesystem is HDFS/object store, a scheme-less path is
    genuinely REMOTE and the local-only listing tuning must not apply
    (distributed listing wins there — see the module docstring).
    Without a session, scheme-less defaults to local (pure-string
    callers, tests)."""
    if "://" in dest:
        return dest.split("://", 1)[0] in _LOCAL_SCHEMES
    if spark is None:
        return True
    try:
        fs = spark._jsc.hadoopConfiguration().get("fs.defaultFS") or ""
    except Exception:
        return True
    if "://" not in fs:
        return True  # scheme-less defaultFS -> local fs
    return fs.split("://", 1)[0] in _LOCAL_SCHEMES


_LISTING_LOCK = threading.RLock()
_LISTING_KEY = "spark.sql.sources.parallelPartitionDiscovery.threshold"


@contextlib.contextmanager
def scoped_listing_threshold(spark: SparkSession, dest: str):
    """Raise the partition-listing threshold for the duration of one
    index open (load_postings): Spark lists files eagerly while the
    read's relation resolves, so a set/restore window around
    spark.read.parquet covers the listing without permanently retuning
    the caller's session (whose OWN highly-partitioned object-store
    tables may want distributed listing). No-op on non-local dests and
    on sessions already tuned (configure_session). Serialized under a
    lock so two engine threads can't interleave set/restore; an RLock
    so a session-tuned outer frame can nest."""
    if not _is_local_path(dest, spark):
        yield
        return
    with _LISTING_LOCK:
        conf = spark.conf
        try:
            cur = int(conf.get(_LISTING_KEY, "32"))
        except (TypeError, ValueError):
            cur = 32
        if cur >= 8192:
            yield
            return
        prev = conf.get(_LISTING_KEY, None)
        conf.set(_LISTING_KEY, "8192")
        try:
            yield
        finally:
            if prev is None:
                conf.unset(_LISTING_KEY)
            else:
                conf.set(_LISTING_KEY, prev)


def configure_session(spark: SparkSession, dest: str | None = None) -> None:
    """Apply the engine's session confs. ``dest`` (an index path) gates
    the local-filesystem-only tunings; pass None to apply them
    unconditionally (tests, local tools).

    Each read-check-set runs under the SAME lock its scoped
    set/restore counterpart holds (scoped_listing_threshold /
    catalog.write_table): an unlocked read could observe another
    thread's transient value, conclude the session is already tuned,
    and then have that thread's finally revert the conf — leaving the
    session permanently untuned (the round-5 race class)."""
    if dest is not None and not _is_local_path(dest, spark):
        return
    conf = spark.conf
    with _LISTING_LOCK:
        try:
            cur = int(conf.get(_LISTING_KEY, "32"))
        except (TypeError, ValueError):
            cur = 32
        if cur < 8192:
            conf.set(_LISTING_KEY, "8192")
    from capsbm25.catalog import _WRITER_CONF_LOCK

    wkey = "spark.sql.maxConcurrentOutputFileWriters"
    with _WRITER_CONF_LOCK:
        try:
            wcur = int(conf.get(wkey, "0"))
        except (TypeError, ValueError):
            wcur = 0
        if wcur < 64:
            conf.set(wkey, "64")
