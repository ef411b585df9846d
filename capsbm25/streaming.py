"""Incremental index maintenance via Structured Streaming.

The reference is strictly batch (SURVEY §2.2) and the north rule does
not require streaming; this module is the natural Spark-native
extension: new transcript turns arrive as files, each micro-batch
becomes an immutable index SEGMENT (the classic Lucene-style design),
and the query kernels merge segments at read time.

  readStream(transcripts) --foreachBatch--> segments/seg=<id>/postings
                                            + doc-id offsets + stats

Exactness: query-time BM25 uses global N/avgdl (maintained in
stats.json) and per-term df summed across segments inside the scoring
kernel (capsbm25/query.py merges multi-segment terms and recomputes
pruning bounds), so incremental == batch == oracle, rank-identically —
tested in tests/test_streaming.py.

doc_ids stay dense and stable: each micro-batch is assigned the range
[N_so_far, N_so_far + batch_rows) in (conv_id, turn_idx) order within
the batch (arrival order across batches — the streaming analog of the
stable ordering contract; a periodic compaction could re-sort segments
if strict global key order is required).
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import logging
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capsbm25.catalog import arrow_collect, arrow_frame
from capsbm25.config import BuildConfig
from capsbm25.docids import assign_doc_ids
from capsbm25.partition import plan_from_sample
from capsbm25.postings import assemble_postings, extract_pairs, extract_runs

_logger = logging.getLogger("capsbm25.streaming")


def _stats_path(out_dir: str) -> str:
    return os.path.join(out_dir, "stats.json")


@contextlib.contextmanager
def _stats_lock(out_dir: str):
    """Exclusive advisory lock serializing ALL stats.json mutations
    (the Lucene write.lock analog). process_batch and compact_segments
    each do their expensive Spark work lock-free, then re-read + mutate
    + swap stats.json inside this lock — so a batch can no longer
    commit between compaction's staleness re-check and its swap (which
    silently dropped the batch's segment), and a compaction can no
    longer be clobbered by a batch writing from a pre-compaction
    snapshot (which lost compact_gen/compacted_from)."""
    os.makedirs(out_dir, exist_ok=True)
    fd = os.open(os.path.join(out_dir, "write.lock"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _write_stats(out_dir: str, stats: dict) -> None:
    # fsync BEFORE the rename and fsync the directory after: without
    # them an OS crash can journal the rename ahead of the tmp file's
    # data blocks, leaving a 0-byte stats.json that makes the whole
    # index unloadable (the one file the durable-segment design cannot
    # reconstruct)
    tmp = _stats_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _stats_path(out_dir))
    dfd = os.open(out_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def load_stream_stats(out_dir: str) -> dict:
    p = _stats_path(out_dir)
    if not os.path.exists(p):
        return {"N": 0, "total_dl": 0, "segments": []}
    with open(p) as f:
        return json.load(f)


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    cfg: BuildConfig,
    auto_compact: bool = True,
    merge_factor: int = 10,
) -> None:
    """foreachBatch body: build one immutable segment. Idempotent on
    batch_id (Structured Streaming may re-run a batch after failure).

    auto_compact (default ON) is the Lucene merge-on-commit analog —
    and the reference's construct() runs its merge stages inside the
    one build pipeline, not as a separately invoked tool
    (/root/reference/src/Suffix_Array.cpp:466-494): after the segment
    commits, any tier holding >= merge_factor segments is merged via
    the tiered policy, cascading promotions included, so a long-lived
    ingest keeps live-segment count <= ~merge_factor x tiers with no
    operator intervention. Merges run synchronously in the ingest
    thread (foreachBatch already serializes batches; a failed/aborted
    merge never fails the commit — the segment is durable first)."""
    stats = load_stream_stats(out_dir)
    # adopt the stream's persisted build config: a restart with a
    # different caller cfg (other token_pattern / index_positions) would
    # otherwise build inconsistent segments that skew df across the
    # index or break phrase queries on the new segments only
    cfg = cfg.adopt(stats.get("config", {}))
    ingested = {s["id"] for s in stats["segments"]}
    ingested.update(stats.get("compacted_from", []))
    if batch_id in ingested:
        return  # replay after restart — segment already committed
    n_rows = batch_df.count()
    if n_rows == 0:
        return
    from capsbm25.session import configure_session

    configure_session(spark, out_dir)
    # adaptive partitioning resolves against the BATCH size (a
    # segment's plan only spans its own docs) — but keep the caller's
    # UNRESOLVED cfg for auto-compaction below, whose merged segments
    # span many batches and must re-resolve against the LIVE corpus
    cfg_unresolved = cfg
    cfg = cfg.resolve_parts(n_rows)
    t0 = time.time()
    # doc-id ranges allocate from a MONOTONE counter, not the live doc
    # count: deletes + compaction shrink N, and allocating from N would
    # hand a new batch ids still owned by surviving docs
    offset = stats.get("next_doc_id", stats["N"])

    docs = assign_doc_ids(batch_df, cfg, method="distributed", with_dl=True)
    docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(offset)).select(
        "doc_id", "conv_id", "turn_idx", "dl", "text"
    )
    # build the segment in a PRIVATE temp dir; the canonical seg=<id>
    # path is claimed by an os.rename under the write lock AFTER the
    # idempotency re-check — a replayed batch racing the original
    # commit must never rewrite a LIVE segment's files (a concurrent
    # reader holding the old file listing would fail mid-job)
    import shutil
    import uuid

    tmp_seg = os.path.join(
        out_dir, "segments",
        f".ingesting-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    try:
        docs.write.mode("overwrite").parquet(os.path.join(tmp_seg, "docs"))
        docs = spark.read.parquet(os.path.join(tmp_seg, "docs"))

        sample = extract_pairs(
            docs.sample(fraction=min(1.0, 20000 / max(n_rows, 1)),
                        seed=cfg.seed), cfg
        )
        plan = plan_from_sample(
            arrow_collect(sample.select("term", "tf")), cfg)

        # block maxima inside a segment use segment-local stats; the
        # query kernel recomputes bounds when merging segments (query.py)
        seg_dl = docs.agg(F.sum("dl").alias("s")).collect()[0]["s"] or 0
        seg_avgdl = (seg_dl / n_rows) if n_rows else 0.0
        postings = assemble_postings(
            extract_runs(docs, cfg, plan=plan), plan, n_rows, seg_avgdl, cfg
        )
        postings.write.mode("overwrite").parquet(
            os.path.join(tmp_seg, "postings"))
    except BaseException:
        # a failed build must not leak its private .ingesting-* dir —
        # foreachBatch retries would accumulate one per failure
        shutil.rmtree(tmp_seg, ignore_errors=True)
        raise

    # COMMIT under the write lock: re-load stats so a compaction that
    # swapped the segment list mid-batch is merged with, not clobbered
    # (compaction preserves next_doc_id — N/total_dl may SHRINK when it
    # applies delete tombstones — so the id range taken at batch start
    # stays valid; concurrent BATCH writers on one out_dir are not
    # supported and are detected below).
    with _stats_lock(out_dir):
        cur = load_stream_stats(out_dir)
        ingested_now = {s["id"] for s in cur["segments"]}
        ingested_now.update(cur.get("compacted_from", []))
        if batch_id in ingested_now:
            shutil.rmtree(tmp_seg, ignore_errors=True)
            return  # lost a replay race — already committed
        cur_next = cur.get("next_doc_id", cur["N"])
        if cur_next != offset:
            shutil.rmtree(tmp_seg, ignore_errors=True)
            raise RuntimeError(
                f"next_doc_id moved {offset} -> {cur_next} during batch "
                f"{batch_id}: concurrent segment writers on one index "
                "directory are not supported (doc-id ranges would overlap)"
            )
        seg = os.path.join(out_dir, "segments", f"seg={batch_id}")
        if os.path.exists(seg):
            # leftover from a CRASHED uncommitted attempt (the live
            # check above proved it's not in stats) — safe to drop
            shutil.rmtree(seg)
        os.rename(tmp_seg, seg)
        cur["N"] += n_rows
        cur["next_doc_id"] = offset + n_rows
        cur["total_dl"] += int(seg_dl)
        cur.setdefault("config", cfg.persist_dict())
        cur["segments"].append(
            {"id": batch_id, "rows": n_rows, "dl": int(seg_dl),
             "sec": round(time.time() - t0, 3)}
        )
        _write_stats(out_dir, cur)
    if auto_compact:
        # merge-on-commit is BEST-EFFORT by contract ("a failed/aborted
        # merge never fails the commit"): the segment above is durable
        # and replay is idempotent, so a transient merge failure inside
        # a default-on feature must not propagate out of foreachBatch
        # and kill the StreamingQuery — log it and let the NEXT batch's
        # auto_compact retry naturally (round-5 advice, medium).
        try:
            _auto_compact(spark, out_dir, cfg_unresolved, merge_factor)
        except Exception:
            _logger.exception(
                "merge-on-commit auto-compaction failed after a durable "
                "segment commit — continuing; the next batch retries"
            )


def _auto_compact(spark, out_dir, cfg, merge_factor: int) -> None:
    """Merge-scheduling policy for ingest (Lucene merge-on-commit): as
    long as some tier holds >= merge_factor live segments, run one
    tiered compaction pass. The loop handles cascades (mf tier-0
    merges promote a tier-1 segment that may complete ITS tier) and is
    bounded: each pass strictly reduces segment count or aborts (a
    concurrent commit/delete changed the segment list — the NEXT
    batch's auto_compact retries), so it terminates."""
    for _ in range(64):  # safety bound over any realistic tier depth
        stats = load_stream_stats(out_dir)
        tiers: dict[int, int] = {}
        for s in stats["segments"]:
            lvl = _tier_level(int(s["rows"]), merge_factor)
            tiers[lvl] = tiers.get(lvl, 0) + 1
        if not tiers or max(tiers.values()) < merge_factor:
            return
        r = compact_segments(spark, out_dir, cfg, policy="tiered",
                             merge_factor=merge_factor)
        if not r.get("compacted"):
            return


def start_incremental_build(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    cfg: BuildConfig | None = None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    auto_compact: bool = True,
    merge_factor: int = 10,
):
    """Start the streaming build; returns the StreamingQuery.
    auto_compact keeps segment count bounded across a long-lived
    ingest via merge-on-commit tiered compaction (see process_batch)."""
    from capsbm25.fixtures import TRANSCRIPT_SCHEMA

    cfg = cfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    writer = stream.writeStream.foreachBatch(
        lambda bdf, bid: process_batch(spark, bdf, bid, out_dir, cfg,
                                       auto_compact=auto_compact,
                                       merge_factor=merge_factor)
    ).option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_term_counts(
    spark: SparkSession,
    input_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    cfg: BuildConfig | None = None,
) -> DataFrame:
    """Watermarked, windowed streaming aggregation: term arrival counts
    per event-time window over the live transcript stream — the
    standard Structured Streaming shape (readStream -> event-time
    window + watermark -> stateful agg), usable as a live ingest
    monitor next to the segment builder. Returns the streaming
    DataFrame; caller attaches a writeStream sink.

    Late turns older than the watermark are dropped from state —
    bounded state at 10^12-turn ingest rates.

    cfg: the index's BuildConfig, so the monitor's tokenization
    matches the index it runs beside (a custom token_pattern or
    chargram index would otherwise count terms that don't exist in
    the index).
    """
    from capsbm25.fixtures import TRANSCRIPT_SCHEMA
    from capsbm25.tokenize import tokens_expr

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    return (
        stream.withWatermark("ts", watermark)
        .select(F.col("ts"),
                F.explode(tokens_expr(F.col("text"), cfg)).alias("term"))
        .groupBy(F.window("ts", window).alias("w"), F.col("term"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "term",
            "n",
        )
    )


def load_index_snapshot(
    spark: SparkSession, out_dir: str,
) -> tuple[DataFrame, DataFrame | None]:
    """ONE consistent (postings, tombstones) view from a SINGLE stats
    snapshot. Calling load_segment_postings and load_tombstones
    separately can straddle a compaction: the postings resolve from
    pre-compaction stats (old segment dirs stay on disk for async GC)
    while the second call sees the post-compaction stats where the
    tombstones are already applied — doc_exclude comes back None and
    queries over the OLD postings resurrect deleted docs. Readers that
    mask deletes at query time should take both frames from here."""
    stats = load_stream_stats(out_dir)
    return (load_segment_postings(spark, out_dir, stats=stats),
            load_tombstones(spark, out_dir, stats=stats))


def load_segment_postings(spark: SparkSession, out_dir: str,
                          stats: dict | None = None) -> DataFrame:
    """All live segments' postings (multiple rows per term possible —
    the query kernels merge them; salted partials are merged here too
    since segments skip the hot-merge pass: the kernel handles any
    number of partial rows per term). When pairing with
    load_tombstones for delete-masked queries, use load_index_snapshot
    (or pass the same `stats` to both) — independent snapshots can
    straddle a compaction."""
    stats = stats if stats is not None else load_stream_stats(out_dir)
    paths = [
        os.path.join(out_dir, "segments", f"seg={s['id']}", "postings")
        for s in stats["segments"]
    ]
    if not paths:
        from capsbm25.postings import POSTINGS_SCHEMA

        return spark.createDataFrame([], POSTINGS_SCHEMA)
    return spark.read.parquet(*paths)


def _tombstone_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "tombstones")


def _tombstone_files(out_dir: str, stats: dict | None = None) -> list[str]:
    """PENDING tombstone files: on-disk parquet minus the ones a past
    compaction already applied (tracked in stats, like compacted_from).
    Applied files are left on disk for external/async GC — removing
    them at the compaction swap would break a concurrently-planned
    load_tombstones reader mid-job, the exact race the segment dirs'
    async-GC policy avoids."""
    d = _tombstone_dir(out_dir)
    if not os.path.isdir(d):
        return []
    stats = stats if stats is not None else load_stream_stats(out_dir)
    applied = set(stats.get("tombstones_applied", []))
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.endswith(".parquet") and f not in applied
    )


def load_tombstones(spark: SparkSession, out_dir: str,
                    stats: dict | None = None) -> DataFrame | None:
    """Deleted docs as (doc_id, dl) rows, deduped; None if no deletes.
    Pass .select("doc_id") as bm25_topk(doc_exclude=...) to mask
    deleted docs at query time before a compaction applies them.
    Pair with load_segment_postings via load_index_snapshot (or a
    shared `stats`) — see its docstring for the straddle race."""
    files = _tombstone_files(out_dir, stats=stats)
    if not files:
        return None
    return (
        spark.read.parquet(*files)
        .dropDuplicates(["doc_id"])
        .select("doc_id", "dl")
    )


def segment_docs(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-doc metadata of all live segments:
    (doc_id, conv_id, turn_idx, dl, text)."""
    stats = load_stream_stats(out_dir)
    paths = [
        os.path.join(out_dir, "segments", f"seg={s['id']}", "docs")
        for s in stats["segments"]
    ]
    if not paths:
        return spark.createDataFrame(
            [], "doc_id long, conv_id string, turn_idx int, dl int, "
                "text string"
        )
    return spark.read.parquet(*paths)


# pending-tombstone doc_ids per index dir, keyed by the exact pending
# file list — avoids re-reading EVERY pending file on each delete call
# (O(total pending) per delete, growing until the next compaction);
# invalidated automatically whenever the file list changes (new delete
# from another process, compaction consolidating/applying files)
_pending_seen_cache: dict[str, tuple[tuple[str, ...], set]] = {}


def _pending_doc_ids(out_dir: str, files: list[str]) -> set:
    """doc_ids across the given pending tombstone files, cached on the
    file list. Caller must hold the write lock (the cache is only
    trustworthy while the list cannot change under us)."""
    key = tuple(files)
    hit = _pending_seen_cache.get(out_dir)
    if hit is not None and hit[0] == key:
        return hit[1]
    import pyarrow.parquet as pq

    seen: set = set()
    for f in files:
        seen.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    _pending_seen_cache[out_dir] = (key, seen)
    return seen


def delete_docs(spark: SparkSession, out_dir: str,
                conv_ids: list[str]) -> dict:
    """Record delete tombstones for whole conversations (the GDPR-
    shaped delete: a conversation and all its turns). Lucene liveDocs
    semantics: deleted docs stop matching as soon as queries pass
    load_tombstones(...) as doc_exclude; scoring stats stay stale-
    global until compact_segments() physically drops the docs and
    restores exact N/avgdl/df.

    The resolved id set is collected driver-side — deletes are
    request-sized (a conversation list), not corpus-sized. Dedup
    against pending tombstones and the counter update run under the
    index write lock, so concurrent deletes never double-count; the
    resolution snapshot is validated under the lock and RETRIED if a
    compaction (or batch) swapped the segment list while we resolved —
    committing ids resolved against since-compacted segments would
    re-tombstone physically-removed docs and permanently understate
    N/total_dl at the next compaction."""
    import uuid

    def _marker(s: dict):
        return (s.get("compact_gen", 0), [x["id"] for x in s["segments"]])

    for _ in range(5):
        stats0 = load_stream_stats(out_dir)
        before = _marker(stats0)
        resolved = arrow_collect(
            segment_docs(spark, out_dir)
            .where(F.col("conv_id").isin(list(conv_ids)))
            .select("doc_id", "dl")
        )
        with _stats_lock(out_dir):
            cur = load_stream_stats(out_dir)
            if _marker(cur) != before:
                continue  # segments moved under us — re-resolve
            if resolved.empty:
                return {"deleted": 0}
            files = _tombstone_files(out_dir, cur)
            if files:
                seen = _pending_doc_ids(out_dir, files)
                resolved = resolved[~resolved["doc_id"].isin(seen)]
            else:
                seen = set()
            if resolved.empty:
                return {"deleted": 0}
            os.makedirs(_tombstone_dir(out_dir), exist_ok=True)
            new_file = os.path.join(_tombstone_dir(out_dir),
                                    f"del-{uuid.uuid4().hex[:12]}.parquet")
            resolved.to_parquet(new_file, index=False)
            # extend the cache in place — the next delete sees exactly
            # files + [new_file] and skips re-reading everything
            _pending_seen_cache[out_dir] = (
                tuple(sorted([*files, new_file])),
                seen | set(resolved["doc_id"].tolist()),
            )
            cur["deleted_n"] = cur.get("deleted_n", 0) + len(resolved)
            cur["deleted_dl"] = (cur.get("deleted_dl", 0)
                                 + int(resolved["dl"].sum()))
            _write_stats(out_dir, cur)
        return {"deleted": len(resolved), "dl": int(resolved["dl"].sum())}
    raise RuntimeError(
        "delete_docs could not get a stable segment snapshot after 5 "
        "attempts (continuous compaction/ingest churn) — retry later"
    )


def compact_segments(
    spark: SparkSession, out_dir: str, cfg: BuildConfig | None = None,
    policy: str = "full", merge_factor: int = 10,
    max_tombstone_collect: int = 1_000_000,
) -> dict:
    """Segment compaction, two policies.

    policy="full" (the Lucene forceMerge(1) analog): merge ALL live
    segments into one — every term collapses back to a single posting
    row, so the query kernel's single-row fast path applies again. Delete
    tombstones (delete_docs) are APPLIED: tombstoned docs are
    physically dropped from postings AND doc metadata, block maxima
    are recomputed with the post-delete LIVE N/avgdl, and stats shrink
    to exact live values — after compaction, queries need no
    doc_exclude and the index is rank-identical to a fresh batch build
    over the surviving corpus (tested). The doc-id allocator
    (next_doc_id) stays monotone so later batches never reuse a
    surviving doc's id. Cost: rewrites the ENTIRE index — O(total) per
    call; on a long-lived ingest stream run policy="tiered" between
    occasional full merges.

    Tombstone application is scale-safe: up to max_tombstone_collect
    pending delete ids, the drop set ships to the merge kernel as one
    sorted array via a real Spark broadcast (one copy per executor).
    Beyond the cap (a retention sweep at 10^12 docs — collecting it
    would OOM the driver), compaction switches to a fully DISTRIBUTED
    rebuild: live docs = segment docs ANTI-JOIN tombstones (a
    DataFrame join, nothing driver-side), and postings are rebuilt
    from the surviving text via the batch pipeline
    (extract_runs -> assemble_postings) with live stats — exactly the
    rank-identity contract, with no driver materialization (tested by
    forcing the cap to 0).

    policy="tiered" (the Lucene TieredMergePolicy / the reference's
    bounded k-way merge tree, /root/reference/src/Suffix_Array.cpp:
    371-428): merge only SAME-SIZE-TIER segments — each segment's tier
    is floor(log_mf(rows)) and any tier holding >= merge_factor live
    segments has its oldest merge_factor members merged into one.
    Bytes rewritten per call is O(merged tiers), NOT O(index): under
    continuous ingest each doc is rewritten O(log_mf(N)) times total
    instead of O(ingest batches), and per-term query fan-in stays
    O(merge_factor x log_mf(N)) instead of growing linearly with
    batches. Pending tombstones that fall INSIDE a merged group are
    applied with it (stats shrink by exactly those docs); the
    remainder is consolidated into one pending file so later deletes
    and compactions stop re-reading a growing file list. Returns the
    per-merge row accounting so callers (and tests) can verify the
    O(tier) rewrite bound.

    Both policies are idempotent and atomic: new segments are written
    to private temp dirs, the canonical seg=<name> paths are claimed
    by os.rename under the write lock after a staleness re-check, and
    old segment dirs are left for external GC (object stores prefer
    async delete).
    """
    stats = load_stream_stats(out_dir)
    # adopt the build-time config persisted with the stream (tokenizer,
    # block size, positions flag) — a mismatched caller cfg would
    # tokenize differently / drop positions
    cfg = (cfg or BuildConfig()).adopt(stats.get("config", {}))
    from capsbm25.session import configure_session

    configure_session(spark, out_dir)
    # merged/rebuilt segments re-plan over the live corpus
    cfg = cfg.resolve_parts(int(stats.get("N", 0)))
    if policy == "tiered":
        return _compact_tiered(spark, out_dir, cfg, stats, merge_factor,
                               max_tombstone_collect)
    if policy != "full":
        raise ValueError(f"unknown compaction policy {policy!r}")
    return _compact_full(spark, out_dir, cfg, stats, max_tombstone_collect)


def _compact_full(spark, out_dir, cfg, stats, max_tombstone_collect) -> dict:
    from capsbm25.postings import merge_hot_partials

    tomb_files_at_start = _tombstone_files(out_dir)
    if len(stats["segments"]) <= 1 and not tomb_files_at_start:
        return {"compacted": False, "segments": len(stats["segments"])}
    drop_bc = None
    n_del = dl_del = 0
    rebuild = False
    if tomb_files_at_start:
        import numpy as np

        tomb_all = spark.read.parquet(*tomb_files_at_start).dropDuplicates(
            ["doc_id"])
        probe = arrow_collect(
            tomb_all.limit(max_tombstone_collect + 1))
        if len(probe) > max_tombstone_collect:
            rebuild = True  # mass delete: never collect to the driver
            agg = tomb_all.agg(
                F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
            n_del, dl_del = int(agg["n"]), int(agg["s"] or 0)
        else:
            n_del = len(probe)
            dl_del = int(probe["dl"].sum())
            drop = np.unique(probe["doc_id"].to_numpy(np.int64))
            # a REAL broadcast (one copy per executor), not a closure
            # capture pickled per task
            drop_bc = spark.sparkContext.broadcast(drop)
    N = stats["N"] - n_del
    avgdl = ((stats["total_dl"] - dl_del) / N) if N else 0.0

    import shutil
    import uuid

    # write to a PRIVATE temp dir first: two concurrent compactors would
    # otherwise derive the same generation from their lock-free stats
    # snapshots and write the same canonical path — and the loser's
    # abort would rmtree the directory the winner just published. The
    # canonical seg=compacted-<gen> name is claimed by an os.rename
    # under the lock, with gen derived from the stats read UNDER the
    # lock (monotone counter persisted in stats — counting compacted
    # segments in the live list would always yield 1 and the third
    # compaction would overwrite the path it reads from).
    tmp_seg_dir = os.path.join(
        out_dir, "segments", f".compacting-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    try:
        if not rebuild:
            allp = load_segment_postings(spark, out_dir)
            # merge_hot_partials merges ANY multi-row term (sorted by
            # doc) — exactly the per-term stitch compaction needs;
            # single-row terms pass through it unchanged
            merged = merge_hot_partials(allp, N, avgdl, cfg, drop=drop_bc)
            merged.write.mode("overwrite").parquet(
                os.path.join(tmp_seg_dir, "postings"))
            # doc metadata survives compaction (minus deleted docs) —
            # without it, later delete-by-conversation calls could not
            # resolve ids and snippet fetches could not map keys (Lucene
            # rewrites stored fields on merge for the same reason)
            live_docs = segment_docs(spark, out_dir)
            if drop_bc is not None:
                tomb = spark.read.parquet(
                    *tomb_files_at_start).select("doc_id")
                live_docs = live_docs.join(tomb, "doc_id", "anti")
            live_docs.write.mode("overwrite").parquet(
                os.path.join(tmp_seg_dir, "docs"))
        else:
            _rebuild_from_live_docs(
                spark, out_dir, cfg, tomb_files_at_start, tmp_seg_dir,
                N, avgdl)
    except BaseException:
        # a failed merge/rebuild must not leak its private temp dir —
        # for full compaction it holds up to a whole copy of the index
        shutil.rmtree(tmp_seg_dir, ignore_errors=True)
        raise
    finally:
        if drop_bc is not None:
            # the writes above ran eagerly — free the executor copies
            # now instead of waiting for GC + ContextCleaner
            drop_bc.destroy()

    # staleness re-check + rename + swap ATOMICALLY under the write
    # lock: batch commits also serialize on it, so none can land between
    # the check and the os.replace (the round-2 check-then-swap race).
    # A batch (or another compaction) that committed while we merged
    # still aborts us cleanly here — and we only ever delete our own
    # private temp dir.
    ids_at_start = [s["id"] for s in stats["segments"]]
    with _stats_lock(out_dir):
        now = load_stream_stats(out_dir)
        if [s["id"] for s in now["segments"]] != ids_at_start:
            shutil.rmtree(tmp_seg_dir, ignore_errors=True)
            return {"compacted": False, "aborted": "segments changed "
                    "during compaction — rerun (or pause the stream)"}
        if _tombstone_files(out_dir) != tomb_files_at_start:
            # a delete landed while we merged: the new tombstones are
            # NOT applied in our output — aborting keeps them pending
            # rather than silently resurrecting the docs
            shutil.rmtree(tmp_seg_dir, ignore_errors=True)
            return {"compacted": False, "aborted": "tombstones changed "
                    "during compaction — rerun"}
        gen = int(now.get("compact_gen", 0)) + 1
        seg_id = f"compacted-{gen}"
        target = os.path.join(out_dir, "segments", f"seg={seg_id}")
        # a PRIOR run that crashed between this rename and _write_stats
        # left seg=compacted-<gen> on disk with compact_gen unbumped —
        # the rerun derives the same gen and os.rename would fail
        # ENOTEMPTY forever. gen > now's compact_gen proves stats never
        # referenced the leftover, so it is safe to clear (mirrors the
        # process_batch / _compact_tiered crash guards).
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(tmp_seg_dir, target)
        n_live = now["N"] - n_del
        dl_live = now["total_dl"] - dl_del
        new_stats = {
            "N": n_live,
            "total_dl": dl_live,
            # id allocation stays monotone across delete-compactions
            "next_doc_id": now.get("next_doc_id", now["N"]),
            "config": now.get("config", cfg.persist_dict()),
            "compact_gen": gen,
            "tier_gen": now.get("tier_gen", 0),
            "segments": [{"id": seg_id, "rows": n_live,
                          "dl": dl_live, "sec": 0.0}],
            # UNION with the previous compaction's ids — dropping them
            # would let a streaming replay re-ingest pre-compaction
            # batches
            "compacted_from": sorted(
                set(now.get("compacted_from", []))
                | {s["id"] for s in now["segments"]},
                key=str,
            ),
        }
        new_stats["tombstones_applied"] = sorted(
            set(now.get("tombstones_applied", []))
            | {os.path.basename(f) for f in tomb_files_at_start}
        )
        _write_stats(out_dir, new_stats)
    return {"compacted": True, "segments_before": len(stats["segments"]),
            "deleted_applied": n_del,
            "path": "rebuild" if rebuild else "merge"}


def _rebuild_from_live_docs(spark, out_dir, cfg, tomb_files, tmp_seg_dir,
                            N_live, avgdl_live) -> None:
    """Mass-delete compaction path: rebuild postings from the surviving
    corpus with the batch pipeline — tombstones stay a DataFrame
    anti-join end to end, nothing is ever collected to the driver."""
    from capsbm25.postings import (POSTINGS_SCHEMA, assemble_postings,
                                   extract_pairs, extract_runs,
                                   merge_hot_partials)

    tomb = spark.read.parquet(*tomb_files).select("doc_id").distinct()
    live = segment_docs(spark, out_dir).join(tomb, "doc_id", "anti")
    live.write.mode("overwrite").parquet(os.path.join(tmp_seg_dir, "docs"))
    live = spark.read.parquet(os.path.join(tmp_seg_dir, "docs"))
    if N_live <= 0:
        spark.createDataFrame([], POSTINGS_SCHEMA).write.mode(
            "overwrite").parquet(os.path.join(tmp_seg_dir, "postings"))
        return
    sample = extract_pairs(
        live.sample(fraction=min(1.0, 20000 / max(N_live, 1)),
                    seed=cfg.seed), cfg)
    plan = plan_from_sample(
        arrow_collect(sample.select("term", "tf")), cfg)
    # the anti-join shuffle leaves doc_ids unordered within partitions;
    # extract_runs flushes at every doc-order restart, so sort first or
    # runs degenerate to one row per pair
    src = live.select("doc_id", "text").sortWithinPartitions("doc_id")
    raw_dir = os.path.join(tmp_seg_dir, ".postings_raw")
    assemble_postings(extract_runs(src, cfg, plan=plan), plan, N_live,
                      avgdl_live, cfg).write.mode("overwrite").parquet(raw_dir)
    raw = spark.read.parquet(raw_dir)
    # keep the single-row-per-term invariant of a full compaction:
    # stitch the salted hot partials before publishing
    dst = os.path.join(tmp_seg_dir, "postings")
    raw.where(~F.col("partial")).write.mode("overwrite").parquet(dst)
    partials = raw.where(F.col("partial"))
    if not partials.isEmpty():
        merge_hot_partials(partials, N_live, avgdl_live, cfg).write.mode(
            "append").parquet(dst)
    import shutil

    shutil.rmtree(raw_dir, ignore_errors=True)


def _tier_level(rows: int, merge_factor: int) -> int:
    """floor(log_mf(rows)) by exact integer division — float log puts
    exact powers one tier low (log(1000)/log(10) = 2.999...)."""
    level, n = 0, max(int(rows), 1)
    while n >= merge_factor:
        n //= merge_factor
        level += 1
    return level


def _compact_tiered(spark, out_dir, cfg, stats, merge_factor,
                    max_tombstone_collect) -> dict:
    from capsbm25.postings import POSTINGS_SCHEMA, merge_hot_partials

    if merge_factor < 2:
        raise ValueError("merge_factor must be >= 2")
    segments = stats["segments"]
    tomb_files_at_start = _tombstone_files(out_dir)

    # plan: group each tier's oldest members, merge_factor at a time
    by_level: dict[int, list[dict]] = {}
    for s in segments:
        by_level.setdefault(_tier_level(s["rows"], merge_factor), []).append(s)
    groups: list[list[dict]] = []
    for lvl in sorted(by_level):
        members = by_level[lvl]
        for i in range(len(members) // merge_factor):
            groups.append(members[i * merge_factor:(i + 1) * merge_factor])
    if not groups:
        return {"compacted": False, "policy": "tiered",
                "segments": len(segments), "merges": []}

    import shutil
    import uuid

    import numpy as np
    import pandas as pd

    tomb_all = None
    if tomb_files_at_start:
        # cache: every merge group semi-joins against this frame and
        # the remainder consolidation reads it once more — without the
        # cache each of those re-reads and re-dedups EVERY pending file
        tomb_all = spark.read.parquet(*tomb_files_at_start).dropDuplicates(
            ["doc_id"]).cache()
        if len(arrow_collect(
                tomb_all.limit(max_tombstone_collect + 1))) \
                > max_tombstone_collect:
            # a mass delete is pending: leave ALL tombstones to the
            # full policy's distributed rebuild (applying per-tier
            # subsets would still need a driver-sized remainder
            # consolidation below)
            tomb_all.unpersist()
            tomb_all = None

    def _merge_group(g):
        seg_paths = [os.path.join(out_dir, "segments", f"seg={s['id']}")
                     for s in g]
        g_post = spark.read.parquet(*(os.path.join(p, "postings")
                                      for p in seg_paths))
        g_docs = spark.read.parquet(*(os.path.join(p, "docs")
                                      for p in seg_paths))
        drop_bc = None
        g_del = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "dl": pd.Series(dtype=np.int64)})
        if tomb_all is not None:
            # tombstones FALLING IN this group ride the merge (the
            # Lucene merge-applies-deletes analog, tier-scoped); the
            # membership test is a distributed semi-join — only the
            # in-group subset is collected, and an over-cap subset
            # (mass delete) simply stays pending for the rebuild path
            ing = tomb_all.join(g_docs.select("doc_id"), "doc_id", "semi")
            probe = arrow_collect(
                ing.limit(max_tombstone_collect + 1))
            if len(probe) <= max_tombstone_collect and len(probe):
                g_del = probe
                drop_bc = spark.sparkContext.broadcast(
                    np.unique(g_del["doc_id"].to_numpy(np.int64)))
        rows_in = sum(s["rows"] for s in g)
        dl_in = sum(s["dl"] for s in g)
        # block-max context: post-merge live global stats (the kernel
        # recomputes exact uppers at query time anyway — tested)
        n_ctx = max(stats["N"] - len(g_del), 1)
        avg_ctx = (stats["total_dl"] - int(g_del["dl"].sum())) / n_ctx
        merged = merge_hot_partials(g_post, n_ctx, avg_ctx, cfg,
                                    drop=drop_bc)
        tmp = os.path.join(
            out_dir, "segments",
            f".tiering-{os.getpid()}-{uuid.uuid4().hex[:8]}")
        try:
            merged.write.mode("overwrite").parquet(
                os.path.join(tmp, "postings"))
            out_docs = g_docs
            if drop_bc is not None:
                ids = spark.createDataFrame(g_del[["doc_id"]])
                out_docs = g_docs.join(ids, "doc_id", "anti")
            out_docs.write.mode("overwrite").parquet(
                os.path.join(tmp, "docs"))
        except BaseException:
            # a failing group removes its OWN partial temp dir before
            # re-raising — the concurrent-merge error path below only
            # sees finished groups' tmp paths, so without this the
            # half-written .tiering-* dir would accumulate under
            # segments/ across failures (round-5 advice; disk-only,
            # hidden dirs are never referenced by stats)
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        finally:
            if drop_bc is not None:
                # both writes ran eagerly — free the executor copies
                drop_bc.destroy()
        return ({
            "members": [s["id"] for s in g],
            "tmp": tmp,
            "rows_in": rows_in,
            "rows_out": rows_in - len(g_del),
            "dl_out": dl_in - int(g_del["dl"].sum()),
            "deleted_applied": len(g_del),
            "deleted_dl": int(g_del["dl"].sum()),
        }, g_del if len(g_del) else None)

    # merge groups are INDEPENDENT (disjoint member segments, private
    # temp dirs) — submit them concurrently and let the Spark scheduler
    # interleave their jobs, so a long ingest history with several
    # eligible tiers pays ~max(group) wall instead of sum(groups).
    # Results keep the deterministic `groups` order regardless of
    # completion order (stats accounting below folds them in order).
    if len(groups) == 1:
        results = [_merge_group(groups[0])]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(len(groups), 8),
            thread_name_prefix="capsbm25-tiered-merge",
        ) as pool:
            futs = [pool.submit(_merge_group, g) for g in groups]
            results, err = [], None
            for f in futs:
                try:
                    results.append(f.result())
                except BaseException as e:  # noqa: BLE001 — cleanup+reraise
                    err = err or e
            if err is not None:
                # drop the temp dirs of the groups that DID finish —
                # a failed tiered pass must leave no stray segments
                for m, _ in results:
                    shutil.rmtree(m["tmp"], ignore_errors=True)
                raise err
    merges = [r[0] for r in results]
    # the consolidated pending REMAINDER is computed BEFORE the lock —
    # it depends only on the start-snapshot tombstone files (validated
    # unchanged under the lock) and the applied set, and running Spark
    # jobs inside the critical section both stretches the lock hold and
    # widens the crash window between the renames and the stats swap.
    # Any failure from here until commit must drop the finished groups'
    # temp dirs (the 'no stray segments' invariant) — _auto_compact
    # swallows and retries, so a persistent failure would otherwise
    # accumulate tier-sized .tiering-* dirs indefinitely.
    try:
        applied_frames = [r[1] for r in results if r[1] is not None]
        applied = (pd.concat(applied_frames, ignore_index=True)
                   if applied_frames else None)
        rem = None
        if applied is not None:
            rem = arrow_collect(
                tomb_all
                .join(arrow_frame(spark, applied[["doc_id"]]),
                      "doc_id", "anti")
            )
    except BaseException:
        for m in merges:
            shutil.rmtree(m["tmp"], ignore_errors=True)
        raise
    finally:
        if tomb_all is not None:
            tomb_all.unpersist()

    def _abort(reason: str) -> dict:
        for m in merges:
            shutil.rmtree(m["tmp"], ignore_errors=True)
        return {"compacted": False, "policy": "tiered", "aborted": reason}

    with _stats_lock(out_dir):
        now = load_stream_stats(out_dir)
        live_ids = {s["id"] for s in now["segments"]}
        if any(s["id"] not in live_ids for g in groups for s in g):
            # a concurrent compaction consumed one of our inputs
            return _abort("segments changed during tiered compaction — "
                          "rerun")
        if applied is not None and \
                _tombstone_files(out_dir) != tomb_files_at_start:
            # a delete landed mid-merge and we are about to consolidate
            # the pending set — aborting keeps every tombstone pending
            # instead of silently resurrecting the new ones. (With no
            # tombstones applied we commit regardless: new pending
            # files are untouched by a pure tier merge.)
            return _abort("tombstones changed during tiered compaction "
                          "— rerun")
        gen = int(now.get("tier_gen", 0))
        first_member = {}  # first member id -> its merge record
        consumed: set = set()
        for m in merges:
            gen += 1
            m["seg_id"] = f"tiered-{gen}"
            seg = os.path.join(out_dir, "segments", f"seg={m['seg_id']}")
            if os.path.exists(seg):
                # leftover from a run that crashed between its renames
                # and its stats swap (tier_gen was never bumped, so the
                # name repeats and stats reference nothing under it) —
                # drop it or every rerun wedges on ENOTEMPTY
                shutil.rmtree(seg)
            os.rename(m["tmp"], seg)
            first_member[m["members"][0]] = m
            consumed.update(m["members"])
        new_segments = []
        for s in now["segments"]:
            if s["id"] in first_member:
                m = first_member[s["id"]]
                new_segments.append({"id": m["seg_id"],
                                     "rows": m["rows_out"],
                                     "dl": m["dl_out"], "sec": 0.0})
            elif s["id"] not in consumed:
                new_segments.append(s)
        n_applied = sum(m["deleted_applied"] for m in merges)
        dl_applied = sum(m["deleted_dl"] for m in merges)
        now["segments"] = new_segments
        # pin the id allocator to the PRE-shrink N on legacy stats that
        # predate next_doc_id (mirrors _compact_full): shrinking N with
        # no allocator record would let the next batch reuse doc-id
        # ranges that surviving docs still own
        now["next_doc_id"] = now.get("next_doc_id", now["N"])
        now["N"] -= n_applied
        now["total_dl"] -= dl_applied
        now["tier_gen"] = gen
        now["compacted_from"] = sorted(
            set(now.get("compacted_from", [])) | consumed, key=str)
        if applied is not None:
            # consolidate the pending tombstones: everything applied in
            # a merged tier drops out; the remainder (rem, computed
            # pre-lock) becomes ONE pending file (bounds the per-delete
            # dedup read) and every start file is marked applied (files
            # stay on disk for async GC)
            td = _tombstone_dir(out_dir)
            os.makedirs(td, exist_ok=True)
            new_pending: list[str] = []
            if len(rem):
                fn = os.path.join(td,
                                  f"pending-{uuid.uuid4().hex[:12]}.parquet")
                rem.to_parquet(fn, index=False)
                new_pending = [fn]
            now["tombstones_applied"] = sorted(
                set(now.get("tombstones_applied", []))
                | {os.path.basename(f) for f in tomb_files_at_start}
            )
            now["deleted_n"] = len(rem)
            now["deleted_dl"] = int(rem["dl"].sum()) if len(rem) else 0
            _pending_seen_cache[out_dir] = (
                tuple(sorted(new_pending)),
                set(rem["doc_id"].tolist()) if len(rem) else set(),
            )
        _write_stats(out_dir, now)
    for m in merges:
        m.pop("tmp", None)
    return {"compacted": True, "policy": "tiered",
            "merges": merges,
            "rows_rewritten": sum(m["rows_in"] for m in merges),
            "segments_after": len(new_segments),
            "deleted_applied": sum(m["deleted_applied"] for m in merges)}


def stream_corpus_stats(out_dir: str) -> tuple[int, float]:
    stats = load_stream_stats(out_dir)
    n = stats["N"]
    return n, (stats["total_dl"] / n if n else 0.0)
