"""Window/idiom operator tests (B17-B20, B35)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import windows as W


def test_latest_per_key_is_max(spark, sf_dir):
    e = read_fixture_table(spark, sf_dir, "events")
    latest = W.latest_per_key(
        e, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    per_user_max = e.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    joined = latest.join(per_user_max, "user_id")
    assert joined.filter(F.col("ts") != F.col("max_ts")).count() == 0
    assert latest.count() == e.select("user_id").distinct().count()


def test_top_n_per_group_bound(spark, sf_dir):
    o = read_fixture_table(spark, sf_dir, "orders")
    top3 = W.top_n_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    counts = top3.groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert counts.filter(F.col("n") > 3).count() == 0


def test_sessionize_gap_property(spark):
    """Events 31 min apart start new sessions; <=30 min continue them."""
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 1.0),  # same session (10 min)
        (1, "2024-01-01 00:41:00", 1.0),  # new session (31 min)
        (2, "2024-01-01 00:00:00", 1.0),  # separate user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    s = W.sessionize(df, "user_id", "ts", 30.0)
    got = {
        (r["user_id"], r["ts"].isoformat(), r["session_seq"])
        for r in s.collect()
    }
    assert got == {
        (1, "2024-01-01T00:00:00", 1),
        (1, "2024-01-01T00:10:00", 1),
        (1, "2024-01-01T00:41:00", 2),
        (2, "2024-01-01T00:00:00", 1),
    }


def test_running_sum_matches_manual(spark):
    rows = [(1, 1, 10.0), (1, 2, 5.0), (1, 3, 2.5), (2, 1, 7.0)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    out = W.running_agg(df, "v", ["k"], [F.col("seq")])
    got = {(r["k"], r["seq"]): r["running_sum"] for r in out.collect()}
    assert got == {(1, 1): 10.0, (1, 2): 15.0, (1, 3): 17.5, (2, 1): 7.0}


def test_scd2_history_collapses_runs_and_closes_intervals(spark):
    from ddataframeoperation_spark.operators import windows as W

    df = spark.createDataFrame(
        [
            (1, "2024-01-01", "A"),
            (1, "2024-01-02", "A"),   # unchanged -> collapsed
            (1, "2024-01-03", "B"),
            (1, "2024-01-05", "A"),   # value may recur in a NEW interval
            (2, "2024-01-01", "X"),
        ],
        "uid long, d string, v string",
    ).selectExpr("uid", "CAST(d AS TIMESTAMP) AS ts", "v")
    rows = sorted(
        (r["uid"], r["v"], str(r["valid_from"])[:10],
         None if r["valid_to"] is None else str(r["valid_to"])[:10],
         r["is_current"])
        for r in W.scd2_history(df, ["uid"], "ts", ["v"]).collect()
    )
    assert rows == [
        (1, "A", "2024-01-01", "2024-01-03", False),
        (1, "A", "2024-01-05", None, True),
        (1, "B", "2024-01-03", "2024-01-05", False),
        (2, "X", "2024-01-01", None, True),
    ]
