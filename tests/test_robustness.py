"""Malformed-input handling: the PERMISSIVE/FAILFAST contract for dirty data
(a 100 TB corpus always has corrupt records; silent row drops are the
failure mode to prevent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


CSV = "1,alice,10.5\n2,bob,NOT_A_NUMBER\n3,carol,7.25\n"


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(CSV)
    return str(p)


def test_permissive_keeps_and_marks_corrupt_rows(spark, csv_path):
    df = (
        spark.read.schema("id INT, name STRING, score DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(csv_path)
    )
    rows = df.collect()
    assert len(rows) == 3  # nothing silently dropped
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["id"] == 2 and bad[0]["score"] is None
    good_scores = {r["score"] for r in rows if r["_corrupt_record"] is None}
    assert good_scores == {10.5, 7.25}


def test_dropmalformed_filters(spark, csv_path):
    df = (
        spark.read.schema("id INT, name STRING, score DOUBLE")
        .option("mode", "DROPMALFORMED")
        .csv(csv_path)
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_failfast_raises(spark, csv_path):
    df = (
        spark.read.schema("id INT, name STRING, score DOUBLE")
        .option("mode", "FAILFAST")
        .csv(csv_path)
    )
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_corrupt_json_column(spark):
    rows = [(1, '{"k": 5}'), (2, "{not json"), (3, None)]
    df = spark.createDataFrame(rows, "id long, props string")
    parsed = df.select(
        "id", F.from_json("props", "k INT").getField("k").alias("k")
    )
    got = {r["id"]: r["k"] for r in parsed.collect()}
    assert got == {1: 5, 2: None, 3: None}  # bad JSON -> null, no crash
