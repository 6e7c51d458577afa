"""Randomized reference-implementation checks for the round-5b operators:
the Spark result is compared against a brute-force Python computation on
seeded random inputs (one Spark job per case, unlike the per-example
hypothesis tests in test_properties.py which stay driver-side)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import relational as R
from ddataframeoperation_spark.operators.timeseries import twap
from ddataframeoperation_spark.operators.windows import funnel_counts


def test_pareto_frontier_matches_bruteforce(spark):
    rng = random.Random(42)
    # Small discrete domain -> plenty of ties on each axis and full-row dups.
    rows = [(i, float(rng.randint(0, 12)), rng.randint(0, 12)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    got = {r["id"] for r in R.pareto_frontier_2d(df, "x", "y").collect()}

    def dominated(a, b):  # b dominates a
        return (
            b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])
        )

    expect = {
        a[0]
        for a in rows
        if not any(dominated(a, b) for b in rows)
    }
    assert got == expect


def test_funnel_matches_bruteforce(spark):
    rng = random.Random(7)
    steps = ["a", "b", "c"]
    rows = [
        (i, f"2024-01-01 00:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}",
         rng.randint(1, 12), rng.choice(["a", "b", "c", "x"]))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["step"]: r["n_users"] for r in funnel_counts(df, steps).collect()}

    # Reference: per user, walk the strictly-increasing first-touch chain.
    # The anchor comparison is on ts ALONE (matching the operator's
    # `ts > _t{i-1}` filter) — comparing (ts, event_id) tuples would admit
    # same-timestamp progressions the operator rejects.
    by_user: dict[int, list[tuple[str, str]]] = {}
    for eid, ts, uid, et in rows:
        by_user.setdefault(uid, []).append((et, ts))
    counts = [0, 0, 0]
    for evs in by_user.values():
        anchor = None
        for si, s in enumerate(steps):
            nxt = min(
                (t for et, t in evs if et == s and (anchor is None or t > anchor)),
                default=None,
            )
            if nxt is None:
                break
            anchor = nxt
            counts[si] += 1
    assert [got.get(i + 1, 0) for i in range(3)] == counts
    # Funnel counts are non-increasing by construction.
    assert counts[0] >= counts[1] >= counts[2]


def test_twap_matches_bruteforce_and_bounds(spark):
    rng = random.Random(3)
    rows = [
        (i, f"2024-01-01 00:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}",
         rng.randint(1, 5), round(rng.uniform(-10, 10), 3))
        for i in range(150)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in
           twap(df, "user_id", "ts", "value", tiebreak_col="event_id").collect()}

    by_user: dict[int, list] = {}
    for eid, ts, uid, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    for uid, evs in by_user.items():
        evs.sort()
        num = den = 0.0
        for (t1, _, v), (t2, _, _2) in zip(evs, evs[1:]):
            h1, m1, s1 = t1.split(" ")[1].split(":")
            h2, m2, s2 = t2.split(" ")[1].split(":")
            dt = (int(m2) * 60 + int(s2)) - (int(m1) * 60 + int(s1))
            num += v * dt
            den += dt
        if den == 0.0:
            # Equal-timestamp-only intervals give dt 0; Spark yields NaN
            # num/den there — out of scope for the bound check.
            continue
        if len(evs) >= 2:
            ref = num / den
            assert math.isclose(got[uid]["twap"], round(ref, 4), abs_tol=2e-4)
            vals = [v for _, _, v in evs[:-1]]
            assert min(vals) - 1e-9 <= got[uid]["twap"] <= max(vals) + 1e-9
