"""Runnable demo: the nightly-refresh loop on this engine.

A production corpus pipeline rarely recomputes from scratch: each night it
(1) diffs the new snapshot against yesterday's, (2) applies the change set
to downstream state, (3) refreshes materialized aggregates from the deltas
alone, and (4) checks the refreshed snapshot for distribution drift before
promoting it. Steps 2-4 touch the CHANGE volume and the |groups|-sized
state — never the full base table. This demo runs that loop end to end on
the customer fixture.

Run: python examples/nightly_refresh.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import relational as R
from ddataframeoperation_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("nightly-refresh-demo")
    old = read_fixture_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # Tonight's snapshot: every 97th account closed, every 13th balance
    # bumped, every 53rd key re-onboarded under a new id.
    new = old.filter(F.col("c_custkey") % 97 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal")),
    ).unionByName(
        old.filter(F.col("c_custkey") % 53 == 0).withColumn(
            "c_custkey", F.col("c_custkey") + 1000000
        )
    )

    print("== 1. classify the change set (snapshot diff)")
    diff = R.snapshot_diff(old, new, ["c_custkey"], ["c_mktsegment", "c_acctbal"])
    diff.groupBy("change_type").count().orderBy("change_type").show()

    print("== 2. apply the changes back onto the old snapshot (CDC apply)")
    changes = (
        diff.filter(F.col("change_type") != "unchanged")
        .join(new, on="c_custkey", how="left")
        .select("c_custkey", "c_mktsegment", "c_acctbal", "change_type")
    )
    applied = R.apply_changes(old, changes, ["c_custkey"], ["c_mktsegment", "c_acctbal"])
    print("   applied rows:", applied.count(), "== new rows:", new.count())

    print("== 3. refresh the per-segment aggregate from deltas only")
    state = R.build_group_agg(old, "c_mktsegment", "c_acctbal")
    retr = R.retraction_stream(old, new, ["c_custkey"], ["c_mktsegment", "c_acctbal"])
    print("   retraction rows (change volume):", retr.count())
    refreshed = R.maintain_group_agg(state, retr, "c_mktsegment", "c_acctbal")
    refreshed.orderBy("c_mktsegment").show()

    print("== 4. drift gate before promoting the snapshot")
    psi = R.psi_drift(old, new, "c_acctbal", buckets=10)
    total = psi.agg(F.round(F.sum("psi_term"), 6).alias("psi")).collect()[0][0]
    verdict = "stable" if total < 0.1 else ("drifting" if total < 0.25 else "shifted")
    print(f"   numeric PSI(c_acctbal) = {total} -> {verdict}")
    cat = R.psi_drift_categorical(old, new, "c_mktsegment")
    ctotal = cat.agg(F.round(F.sum("psi_term"), 6).alias("psi")).collect()[0][0]
    print(f"   categorical PSI(c_mktsegment) = {ctotal}")

    spark.stop()


if __name__ == "__main__":
    main()
