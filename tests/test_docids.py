"""doc_id assignment: the distributed samplesort method must equal the
window-function ground truth (SURVEY §7.4 hard part (b))."""

from pyspark.sql import functions as F

from capsbm25 import fixtures as fx
from capsbm25.config import BuildConfig
from capsbm25.docids import assign_doc_ids


def test_distributed_equals_window(spark):
    pdf = fx.gen_transcripts_pdf(120, 42)
    df = spark.createDataFrame(pdf).repartition(7)
    cfg = BuildConfig(num_part_ids=16, shuffle_partitions=4)

    a = (
        assign_doc_ids(df, cfg, method="distributed")
        .select("conv_id", "turn_idx", "doc_id")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        assign_doc_ids(df, cfg, method="window")
        .select("conv_id", "turn_idx", "doc_id")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a.equals(b)
    # dense 0..N-1
    assert a["doc_id"].tolist() == list(range(len(pdf)))


def test_variable_length_conv_ids(spark):
    """'src1' < 'src10' < 'src2' ordering — regression for the
    NUL-stripping separator bug (numpy coerces '\\x00' to '')."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["src10", "src1", "src2", "src1", "src10"],
            "turn_idx": pd.array([0, 5, 0, 30, 2], dtype="int32"),
            "text": ["a", "b", "c", "d", "e"],
        }
    )
    df = spark.createDataFrame(pdf)
    cfg = BuildConfig(num_part_ids=4, shuffle_partitions=2, samples_per_part=2)
    got = (
        assign_doc_ids(df, cfg, method="distributed")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(zip(got.conv_id, got.turn_idx)) == [
        ("src1", 5), ("src1", 30), ("src10", 0), ("src10", 2), ("src2", 0)
    ]


def test_per_turn_text_equality(spark):
    """The binding per-row invariant (BASELINE.json input_hint): per-turn
    text equality under stable (conv_id, turn_idx) ordering."""
    pdf = fx.gen_transcripts_pdf(60, 42)
    df = spark.createDataFrame(pdf)
    out = (
        assign_doc_ids(df, BuildConfig(num_part_ids=8), method="distributed")
        .select("conv_id", "turn_idx", "text", "doc_id")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    src = pdf.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert (out["text"].to_numpy() == src["text"].to_numpy()).all()
    assert (out["conv_id"].to_numpy() == src["conv_id"].to_numpy()).all()
