"""Kill-and-resume: a build interrupted after wave 0 and resumed must
produce an index identical to an uninterrupted build, skipping completed
stages (the checkpoint/lineage requirement of the north rule — the
reference's restart story is rerun-from-scratch)."""

import pandas as pd

from capsbm25 import fixtures as fx
from capsbm25.build import Manifest, build_index, load_postings
from capsbm25.config import BuildConfig


def _postings_pdf(spark, out):
    return (
        load_postings(spark, out)
        .select("term", "df", "cf", "doc_ids", "tfs", "dls")
        .toPandas()
        .sort_values("term", ignore_index=True)
    )


def test_resume_identical(spark, tmp_path):
    pdf = fx.gen_transcripts_pdf(80, 42)
    df = spark.createDataFrame(pdf)
    cfg = BuildConfig(num_part_ids=12, shuffle_partitions=4, num_waves=3)

    full_out = str(tmp_path / "full")
    build_index(spark, df, full_out, cfg)

    part_out = str(tmp_path / "partial")
    build_index(spark, df, part_out, cfg, stop_after_wave=0)
    man = Manifest(part_out)
    done = {r["stage"] for r in man.records()}
    assert "wave=0" in done and "hot_merge" not in done

    res = build_index(spark, df, part_out, cfg, resume=True)
    # resumed run skipped the already-done stages
    assert res.metrics["docs"].get("skipped")
    assert res.metrics["wave=0"].get("skipped")
    assert "sec" in res.metrics["hot_merge"]

    a = _postings_pdf(spark, full_out)
    b = _postings_pdf(spark, part_out)
    pd.testing.assert_frame_equal(a, b)

    # checksums recorded per wave match between the two builds
    ca = {r["stage"]: r["checksum"] for r in Manifest(full_out).records()
          if "checksum" in r}
    cb = {r["stage"]: r["checksum"] for r in Manifest(part_out).records()
          if "checksum" in r}
    assert ca == cb
