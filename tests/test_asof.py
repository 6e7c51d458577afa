"""As-of join operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ddataframeoperation_spark.operators.asof import asof_join


def _ts(s):
    return F.col(s).cast("timestamp")


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 12:00:00", "b"),
            (2, "2024-01-01 11:00:00", "c"),
            (3, "2024-01-01 11:00:00", "d"),  # key with no right rows
        ],
        "k long, ts string, tag string",
    ).withColumn("ts", _ts("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", 10.0),
            (1, "2024-01-01 11:59:00", 20.0),
            (2, "2024-01-01 11:00:00", 30.0),  # exact tie -> inclusive
            (2, "2024-01-01 11:30:00", 40.0),  # later than left -> excluded
        ],
        "k long, ts string, v double",
    ).withColumn("ts", _ts("ts"))
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "ts", ["v"])
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got == {"a": 10.0, "b": 20.0, "c": 30.0, "d": None}
    assert out.count() == left.count()  # left-join cardinality preserved


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "ts", ["v"], direction="forward")
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    # 'a'@10:00 -> next right is 11:59 (20.0); 'b'@12:00 -> none after;
    # 'c'@11:00 -> exact tie 30.0 (inclusive); 'd' -> no right rows.
    assert got == {"a": 20.0, "b": None, "c": 30.0, "d": None}


def test_asof_bad_direction(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "ts", "ts", ["v"], direction="sideways")


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "ts", ["v"],
                    tolerance_seconds=600)  # 10 minutes
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    # 'a' matched a 30-min-old row -> voided; 'b' (1 min) and 'c' (0) kept.
    assert got == {"a": None, "b": 20.0, "c": 30.0, "d": None}


def test_interval_overlap_join_bucketing_exact(spark):
    # Bucketed candidates + exact filter must equal the naive theta join,
    # including intervals spanning multiple buckets and touching endpoints.
    from ddataframeoperation_spark.operators.asof import interval_overlap_join

    l = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 30), (3, 100, 260)],  # 3 spans three buckets
        "lid long, s long, e long",
    )
    r = spark.createDataFrame(
        [(10, 10, 12), (11, 31, 40), (12, 250, 300), (13, 15, 19)],
        "rid long, s long, e long",
    )
    got = sorted(
        (x["l_lid"], x["r_rid"])
        for x in interval_overlap_join(
            l, r, "s", "e", "s", "e",
            bucket_seconds=64.0, left_cols=["lid"], right_cols=["rid"],
        ).collect()
    )
    # (1,10): touching endpoints (10 <= 10..12); (2,11)? 31 > 30 -> no;
    # (3,12): multi-bucket span overlap.
    assert got == [(1, 10), (3, 12)]


def test_interval_overlap_join_preserves_duplicate_rows(spark):
    # Two identical left rows must each produce their own pair row — the
    # bucket-ownership dedup only collapses multi-bucket copies of the
    # SAME candidate, unlike a distinct() over the output columns.
    from ddataframeoperation_spark.operators.asof import interval_overlap_join

    l = spark.createDataFrame([(0, 10), (0, 10)], "s long, e long")
    r = spark.createDataFrame([(5, 60)], "s long, e long")  # spans 2 buckets
    out = interval_overlap_join(
        l, r, "s", "e", "s", "e", bucket_seconds=32.0
    ).collect()
    assert len(out) == 2
