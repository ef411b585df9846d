"""Fixture generator determinism: batch-independence and Spark==local
(the seeded-generator discipline of /root/reference/utils/gen_rand_seq.py)."""

import pandas as pd

from capsbm25 import fixtures as fx


def test_batch_independence():
    full = fx.gen_transcripts_pdf(60, 42)
    off = fx.conv_row_offsets(60, 42)
    parts = pd.concat(
        [
            fx.gen_rows(0, 17, int(off[0]), 42),
            fx.gen_rows(17, 40, int(off[17]), 42),
            fx.gen_rows(40, 60, int(off[40]), 42),
        ],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(full, parts)


def test_seed_changes_content():
    a = fx.gen_transcripts_pdf(20, 42)
    b = fx.gen_transcripts_pdf(20, 43)
    assert not a["text"].equals(b["text"])


def test_spark_generation_matches_local(spark):
    local = fx.gen_transcripts_pdf(80, 42).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    dist = (
        fx.gen_transcripts_spark(spark, 80, 42, partitions=7)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    # Spark returns tz-aware timestamps; compare naive
    dist["ts"] = pd.to_datetime(dist["ts"]).dt.tz_localize(None)
    local["ts"] = pd.to_datetime(local["ts"])
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)


def test_edge_coverage():
    pdf = fx.gen_transcripts_pdf(300, 42)
    texts = pdf["text"]
    assert (texts == "").mean() > 0.01, "empty-turn edge missing"
    assert texts.str.contains(fx.HOT_TERM).mean() > 0.2, "hot-term skew missing"
    rare = texts.str.extractall(r"(rare\d+tok)")[0]
    assert len(rare) > 0 and rare.is_unique, "df=1 rare terms missing"
    assert pdf["role"].isin(["user", "assistant", "system", "tool"]).all()
    assert pdf.groupby("conv_id")["turn_idx"].apply(
        lambda s: (s.to_numpy() == range(len(s))).all()
    ).all()
