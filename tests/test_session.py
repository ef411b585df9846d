"""Engine-owned session tunings (round 5): the partitioned postings
layout needs the listing threshold + concurrent-writer confs on the
USER's session, applied by the engine itself (session.py) — not by the
bench harness."""

from capsbm25.session import _is_local_path, configure_session

LIST_KEY = "spark.sql.sources.parallelPartitionDiscovery.threshold"
WRITE_KEY = "spark.sql.maxConcurrentOutputFileWriters"


def test_local_path_detection():
    assert _is_local_path("/data/idx")
    assert _is_local_path("file:///data/idx")
    assert _is_local_path("./rel/idx")
    assert not _is_local_path("s3a://bucket/idx")
    assert not _is_local_path("gs://bucket/idx")
    assert not _is_local_path("hdfs://nn/idx")


def test_configure_session_sets_and_respects(spark):
    prev_list = spark.conf.get(LIST_KEY, None)
    prev_write = spark.conf.get(WRITE_KEY, None)
    try:
        spark.conf.set(LIST_KEY, "32")
        spark.conf.set(WRITE_KEY, "0")
        # object-store destination: defaults left alone
        configure_session(spark, "s3a://bucket/idx")
        assert spark.conf.get(LIST_KEY) == "32"
        assert spark.conf.get(WRITE_KEY) == "0"
        # local destination: both raised
        configure_session(spark, "/tmp/some/idx")
        assert spark.conf.get(LIST_KEY) == "8192"
        assert spark.conf.get(WRITE_KEY) == "64"
        # an operator's HIGHER setting is never lowered
        spark.conf.set(LIST_KEY, "100000")
        spark.conf.set(WRITE_KEY, "128")
        configure_session(spark, "/tmp/some/idx")
        assert spark.conf.get(LIST_KEY) == "100000"
        assert spark.conf.get(WRITE_KEY) == "128"
    finally:
        for k, v in ((LIST_KEY, prev_list), (WRITE_KEY, prev_write)):
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_local_path_bare_relative_dir():
    # round-6 fix: a bare relative dir name is a legal local dest and
    # must not silently skip the engine tunings
    assert _is_local_path("myindex")
    assert _is_local_path("rel/idx")


def test_scoped_listing_threshold_restores(spark):
    from capsbm25.session import scoped_listing_threshold

    prev = spark.conf.get(LIST_KEY, None)
    try:
        spark.conf.set(LIST_KEY, "32")
        with scoped_listing_threshold(spark, "/tmp/idx"):
            assert spark.conf.get(LIST_KEY) == "8192"
        assert spark.conf.get(LIST_KEY) == "32"
        # non-local dest: no-op
        with scoped_listing_threshold(spark, "s3a://bucket/idx"):
            assert spark.conf.get(LIST_KEY) == "32"
        # already-tuned session: left alone, no restore-to-smaller
        spark.conf.set(LIST_KEY, "9999")
        with scoped_listing_threshold(spark, "/tmp/idx"):
            assert spark.conf.get(LIST_KEY) == "9999"
        assert spark.conf.get(LIST_KEY) == "9999"
    finally:
        if prev is None:
            spark.conf.unset(LIST_KEY)
        else:
            spark.conf.set(LIST_KEY, prev)


def test_load_postings_leaves_session_conf(built_index, spark):
    # round-5 advice: opening an index must not permanently retune the
    # caller's session-wide listing threshold
    from capsbm25.build import load_postings

    prev = spark.conf.get(LIST_KEY, None)
    try:
        spark.conf.set(LIST_KEY, "32")
        load_postings(spark, built_index["res"].out_dir).count()
        assert spark.conf.get(LIST_KEY) == "32"
    finally:
        if prev is None:
            spark.conf.unset(LIST_KEY)
        else:
            spark.conf.set(LIST_KEY, prev)


def test_token_pattern_dialect_validation():
    """Round-6 review: token_pattern runs under Java, Python AND RE2 —
    patterns outside the common dialect (backslash classes, groups)
    silently tokenize differently per engine and must raise."""
    import pytest

    from capsbm25.config import BuildConfig
    from capsbm25.tokenize import tokenize_py

    assert tokenize_py("a-b c", BuildConfig()) == ["a", "b", "c"]
    for bad in (r"\w+", "(a|b)+", "[^a-z]+", "[a-z.]+"):
        with pytest.raises(ValueError, match="common dialect"):
            tokenize_py("x", BuildConfig(token_pattern=bad))


def test_hot_salting_budget_skips_not_breaks():
    """Round-6 review: when one hot candidate exceeds the remaining
    salt budget, LATER smaller candidates that still fit must be
    salted (break forfeited them, recreating the quantile-repeat skew
    the salting exists to prevent)."""
    import pandas as pd

    from capsbm25.config import BuildConfig
    from capsbm25.partition import plan_from_sample

    cfg = BuildConfig(num_part_ids=12, max_salt_buckets=8,
                      hot_share_threshold=0.13, shuffle_partitions=4)
    rows = [("aa", 30), ("bb", 20), ("cc", 15)] + [
        (f"t{i}", 5) for i in range(7)]
    sample = pd.DataFrame(
        {"term": [t for t, _ in rows], "tf": [n for _, n in rows]})
    plan = plan_from_sample(sample, cfg)
    # budget 6: aa takes 4, bb (nb=3) does not fit, cc (nb=2) DOES
    hot = {t: nb for t, (_, nb) in plan.hot_terms.items()}
    assert hot.get("aa") == 4
    assert "bb" not in hot
    assert hot.get("cc") == 2
