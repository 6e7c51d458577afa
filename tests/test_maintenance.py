"""Table-maintenance operators: merge upsert, compaction, incremental dedup."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import dedup, skew


def test_merge_upsert(spark, tmp_path):
    target = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, tag string, v double"
    ).write.parquet(target)
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "id long, tag string, v double"
    )
    skew.merge_upsert(spark, target, updates, ["id"])
    got = {
        (r["id"], r["tag"], r["v"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)}


def test_merge_upsert_idempotent(spark, tmp_path):
    target = str(tmp_path / "t")
    spark.createDataFrame([(1, 1.0)], "id long, v double").write.parquet(target)
    updates = spark.createDataFrame([(1, 2.0)], "id long, v double")
    skew.merge_upsert(spark, target, updates, ["id"])
    skew.merge_upsert(spark, target, updates, ["id"])  # replay-safe
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2.0


def test_compact_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(1000).repartition(20).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*")) == 20
    skew.compact(spark, path, target_files=2)
    assert len(glob.glob(f"{path}/part-*")) == 2
    assert spark.read.parquet(path).count() == 1000


def test_dedup_increment(spark):
    corpus = spark.createDataFrame(
        [(1, "known document text here")], "doc_id long, text string"
    ).select(dedup.fingerprint("text").alias("fp"))
    new = spark.createDataFrame(
        [
            (10, "known document text here"),   # already in corpus -> dropped
            (11, "a brand new document"),
            (12, "A brand NEW document!!"),      # dup of 11 within increment
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.dedup_increment(new, corpus).collect())
    assert kept == [11, 13]
