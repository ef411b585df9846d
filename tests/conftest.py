import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def built_index(spark, tmp_path_factory):
    """One shared t1-scale index build: corpus pandas df, BuildResult,
    postings DataFrame, OracleIndex."""
    from capsbm25 import fixtures as fx
    from capsbm25.build import build_index, load_postings
    from capsbm25.config import BuildConfig
    from oracle import OracleIndex

    pdf = fx.gen_transcripts_pdf(250, 42)
    cfg = BuildConfig(num_part_ids=48, shuffle_partitions=8, num_waves=3,
                      hot_share_threshold=0.004, max_salt_buckets=8)
    out = str(tmp_path_factory.mktemp("idx") / "t1")
    res = build_index(spark, spark.createDataFrame(pdf), out, cfg)
    return {
        "pdf": pdf,
        "cfg": cfg,
        "res": res,
        "postings": load_postings(spark, out),
        "oracle": OracleIndex(pdf),
    }


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .appName("capsbm25-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()
