"""Index validation hook — the graft analog of ``is_sorted``
(/root/reference/src/Suffix_Array.cpp:512-536: an order-invariant
checker shipped with the engine, runnable on demand against the built
artifact, not only inside the test suite).

Checks, distributed (an Arrow kernel per partition, tiny aggregate to
the driver):
  * decoded doc_ids strictly increasing per posting row
  * df == len(doc_ids), cf == sum(tfs), len(tfs) == len(dls) == df
  * all tfs >= 1, dls >= tfs (a term can't occur more often than the
    doc has tokens)
  * exactly one non-partial row per term
(the round-8 schema stores no block_max column; indexes from earlier
rounds that still carry one validate fine — it is simply not read)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capsbm25.catalog import arrow_collect
from capsbm25.codec import decode_varints, delta_decode
from capsbm25.config import BuildConfig


def validate_postings(
    postings: DataFrame, cfg: BuildConfig | None = None,
    unique_terms: bool = True,
) -> dict:
    """Returns {'rows': n, 'violations': int, 'examples': [term, ...]}.
    Raises AssertionError on any violation if strict use is wanted by
    the caller checking result['violations'] == 0.

    unique_terms=False relaxes the one-non-partial-row-per-term check:
    a SEGMENTED streaming index (load_segment_postings before
    compaction) legitimately carries one final row per term PER
    SEGMENT — the query kernels merge them; after compact_segments the
    default strict form applies again."""
    cfg = cfg or BuildConfig()
    block_size = cfg.block_size

    def check(it):
        bad: list[str] = []
        n = 0
        for pdf in it:
            for row in pdf.itertuples(index=False):
                n += 1
                docs = delta_decode(row.doc_ids)
                tfs = decode_varints(row.tfs).astype(np.int64)
                dls = decode_varints(row.dls).astype(np.int64)
                ok = (
                    row.df == docs.size == tfs.size == dls.size
                    and row.cf == int(tfs.sum())
                    and (docs.size < 2 or (np.diff(docs) > 0).all())
                    and (tfs >= 1).all()
                    and (dls >= tfs).all()
                )
                if ok and cfg.index_positions and not row.partial \
                        and row.df > 0 and not getattr(row, "pos", b""):
                    # a positional index must carry a payload on every
                    # non-empty final row — a lost pos column would
                    # otherwise only surface as a runtime error inside
                    # phrase query executors
                    ok = False
                if ok and getattr(row, "pos", b""):
                    # positional payload: one strictly-increasing
                    # position list per pair, each position < dl
                    from capsbm25.codec import decode_pair_positions

                    try:
                        pos = decode_pair_positions(row.pos, tfs)
                        bounds = np.concatenate(([0], np.cumsum(tfs)))
                        interior = np.ones(pos.size, dtype=bool)
                        interior[bounds[:-1]] = False
                        ok = (
                            (pos >= 0).all()
                            and (pos < np.repeat(dls, tfs)).all()
                            and (not interior.any()
                                 or (np.diff(pos)[interior[1:]] > 0).all())
                        )
                    except ValueError:
                        ok = False
                if not ok:
                    bad.append(row.term)
        yield pd.DataFrame(
            {"n": [n], "violations": [len(bad)], "examples": [bad[:5]]}
        )

    agg = arrow_collect(postings.mapInPandas(
        check, schema="n long, violations long, examples array<string>"
    ))
    dup = 0
    if unique_terms:
        dup = (
            postings.where(~F.col("partial"))
            .groupBy("term")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
    return {
        "rows": int(agg["n"].sum()),
        "violations": int(agg["violations"].sum()) + int(dup),
        "duplicate_terms": int(dup),
        "examples": [t for ex in agg["examples"] for t in ex][:10],
    }


def validate_index(spark: SparkSession, out_dir: str,
                   cfg: BuildConfig | None = None) -> dict:
    from capsbm25.build import load_build_config, load_postings

    # adopt the index's persisted build config so block_size /
    # index_positions checks match what was actually built
    cfg = load_build_config(out_dir, base=cfg)
    return validate_postings(load_postings(spark, out_dir), cfg)
