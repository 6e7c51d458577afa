"""Script-transform surface tests (B30)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import script


def test_zscore_per_group(spark):
    rows = [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    z = script.zscore_per_group(df, ["user_id"], "value")
    got = {(r["user_id"], r["value"]): round(r["zscore"], 6) for r in z.collect()}
    # mean=20, sample sd=10 -> z = -1, 0, 1; single-row group -> 0.
    assert got[(1, 10.0)] == -1.0
    assert got[(1, 20.0)] == 0.0
    assert got[(1, 30.0)] == 1.0
    assert got[(2, 5.0)] == 0.0


def test_apply_script_batches(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x long")

    def double_up(batches):
        for pdf in batches:
            pdf["y"] = pdf["x"] * 2
            yield pdf

    out = script.apply_script_batches(df, double_up, "x long, y long")
    assert out.filter(F.col("y") != F.col("x") * 2).count() == 0
    assert out.count() == 100


def test_scalar_pandas_udf(spark):
    udf = script.scalar_pandas_udf(lambda s: s + 1, "long")
    df = spark.createDataFrame([(1,), (2,)], "x long")
    got = sorted(r["y"] for r in df.select(udf("x").alias("y")).collect())
    assert got == [2, 3]
