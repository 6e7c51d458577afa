"""Runnable demo: product/event analytics on this engine.

The round-5 analytics surface over an event log: conversion funnel,
retention cohorts, Markov transitions, debounce de-noising, sessionized
stats, OHLC bars, EWMA smoothing, and time-weighted averages — all
declarative Spark over the events fixture, every operator shuffle-shaped
for scale (see SCALE.md §12).

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators.timeseries import ewma, ohlc_bars, twap
from ddataframeoperation_spark.operators.windows import (
    debounce,
    funnel_counts,
    retention_cohorts,
    sessionize,
    transition_counts,
)
from ddataframeoperation_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event-analytics-demo")
    events = read_fixture_table(spark, sf, "events")

    print("== Conversion funnel (view -> click -> purchase, first-touch) ==")
    funnel_counts(events, ["view", "click", "purchase"]).show()

    print("== Weekly retention cohorts ==")
    retention_cohorts(events).orderBy("cohort", "period_offset").show()

    print("== Event transition matrix (top 5 by count) ==")
    transition_counts(events, tiebreak=["event_id"]).orderBy(
        "n", ascending=False
    ).show(5)

    print("== Debounce: events surviving a 60s per-user gap filter ==")
    kept = debounce(events, min_gap_seconds=60.0, tiebreak=["event_id"])
    print(f"kept {kept.count()} of {events.count()} events")

    print("== Sessions (30-min gap) per user: first 5 ==")
    sessionize(events, "user_id", "ts", 30.0, tiebreak=["event_id"]).groupBy(
        "user_id"
    ).count().orderBy("user_id").show(5)

    print("== Hourly OHLC bars for user 1 ==")
    ohlc_bars(events, "user_id", "ts", "value", "hour", "event_id").filter(
        "user_id = 1"
    ).orderBy("bucket").show(5)

    print("== EWMA level + time-weighted average per user: first 5 ==")
    smooth = ewma(events, "user_id", "ts", "value", tiebreak_col="event_id")
    weighted = twap(events, "user_id", "ts", "value", tiebreak_col="event_id")
    smooth.join(weighted, "user_id").orderBy("user_id").show(5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
