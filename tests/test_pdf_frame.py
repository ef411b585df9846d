"""pdf_frame: the Arrow-backed small-frame constructor must reproduce
the pickle path's inferred schema AND values bit-for-bit (round 8 —
every hot query path builds its driver frames through it; a silent
dtype drift here would shift result schemas across the whole contract),
and must fall back to the pickle path where Arrow cannot reproduce it
(NaN floats become nulls under Arrow, datetime tz semantics differ)."""

import numpy as np
import pandas as pd
import pandas.testing as pt
import pytest

from capsbm25.catalog import pdf_frame

FRAMES = {
    # phrase_topk's qt: int64 + string + array<string>
    "phrase_qt": pd.DataFrame(
        {"query_id": [0, 0], "term": ["hash", "join"], "k": [15, 15],
         "phrase": [["hash", "join"], ["hash", "join"]]}),
    # int32 inputs must WIDEN to long like the pickle path did
    "int32s": pd.DataFrame(
        {"query_id": np.arange(3, dtype=np.int32),
         "k": np.array([1, 2, 3], np.int32)}),
    "float32": pd.DataFrame({"x": np.array([1.5, 2.0], np.float32)}),
    "nullable_str": pd.DataFrame({"s": ["a", None]}),
    # explain_scores' want column: array<long>
    "int_lists": pd.DataFrame({"query_id": [1], "want": [[3, 5, 7]]}),
    "bools": pd.DataFrame({"b": [True, False], "t": ["x", "y"]}),
}


def _pickle_path(spark, pdf, schema=None):
    """createDataFrame with the session's arrow fast path pinned OFF —
    the bench/driver sessions never enable it, so THIS is the inference
    pdf_frame must reproduce (the test session enables the conf, which
    would silently change the baseline to arrow semantics)."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        return (spark.createDataFrame(pdf, schema=schema) if schema
                else spark.createDataFrame(pdf))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@pytest.mark.parametrize("name", sorted(FRAMES))
def test_schema_and_values_match_pickle_path(spark, name):
    pdf = FRAMES[name]
    got = pdf_frame(spark, pdf.copy())
    want = _pickle_path(spark, pdf.copy())
    assert got.schema == want.schema
    pt.assert_frame_equal(got.toPandas(), want.toPandas())


def test_ddl_all_none_column(spark):
    # term_range_topk's lo/hi: all-None object columns need the ddl
    pdf = pd.DataFrame(
        {"query_id": [1], "lo": pd.Series([None], dtype=object),
         "hi": pd.Series(["zz"], dtype=object), "k": [10]})
    ddl = "query_id long, lo string, hi string, k long"
    got = pdf_frame(spark, pdf, ddl=ddl)
    want = _pickle_path(spark, pdf, schema=ddl)
    assert got.schema == want.schema
    pt.assert_frame_equal(got.toPandas(), want.toPandas())


def test_ddl_empty_list_column(spark):
    # query_string's qmeta: cboosts can be all-empty lists
    pdf = pd.DataFrame([(0, 1, 10, [])],
                       columns=["query_id", "n_must", "k", "cboosts"])
    ddl = "query_id int, n_must long, k long, cboosts array<double>"
    got = pdf_frame(spark, pdf, ddl=ddl)
    want = _pickle_path(spark, pdf, schema=ddl)
    assert got.schema == want.schema
    pt.assert_frame_equal(got.toPandas(), want.toPandas())


def test_ddl_keeps_declared_narrow_ints(spark):
    # with a ddl, int32 stays int (no widening — declared types win)
    pdf = pd.DataFrame({"query_id": np.array([1], np.int32), "s": ["x"]})
    got = pdf_frame(spark, pdf, ddl="query_id int, s string")
    assert [f.dataType.simpleString() for f in got.schema.fields] \
        == ["int", "string"]


def test_nan_floats_fall_back_to_pickle_semantics(spark):
    # Arrow would turn the NaN into a NULL; the pickle path keeps NaN.
    pdf = pd.DataFrame({"q": [1, 2], "x": [1.0, np.nan]})
    got = pdf_frame(spark, pdf)
    want = _pickle_path(spark, pdf)
    assert got.schema == want.schema
    gx = got.orderBy("q").toPandas()["x"]
    wx = want.orderBy("q").toPandas()["x"]
    assert np.isnan(gx.iloc[1]) == np.isnan(wx.iloc[1])


def test_datetime_falls_back(spark):
    pdf = pd.DataFrame({"q": [1], "ts": pd.to_datetime(["2026-01-01"])})
    got = pdf_frame(spark, pdf)
    want = _pickle_path(spark, pdf)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_local_relation_not_python_rdd(spark):
    # the point of the helper: the frame must plan as a LocalTableScan
    # (driver-side local relation — no pickled python RDD to evaluate)
    got = pdf_frame(spark, FRAMES["phrase_qt"].copy())
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "LocalRelation" in plan, plan
    assert "ExistingRDD" not in plan, plan
