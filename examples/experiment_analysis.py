"""Runnable demo: the experiment/engagement readout on this engine.

The round-7d analytics surface over an event log, end to end: rolling
7-day distinct actives (exact and the constant-state HLL sketch path),
per-user engagement-trend OLS fits, consecutive-day activity streaks,
last-touch conversion attribution, frequent 3-step journey paths, a
rolling z-score anomaly screen — and the statistical readout comparing
two cohorts: Mann-Whitney rank-sum, two-sample Kolmogorov-Smirnov
distance, and a chi-square independence check. Every statistic is
computed without a global sort (two-level bucketed prefix sums) and
with the engine-exact numerics contract of SCALE.md §20.

Run: python examples/experiment_analysis.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators.relational import (
    chi_square_test,
    group_ols,
    ks_test,
    rank_sum_test,
)
from ddataframeoperation_spark.operators.timeseries import (
    rolling_distinct,
    rolling_distinct_approx,
    rolling_zscore,
)
from ddataframeoperation_spark.operators.windows import (
    activity_streaks,
    last_touch_attribution,
    top_paths,
)
from ddataframeoperation_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("experiment_analysis")
    ev = read_fixture_table(spark, sf, "events")

    print("== rolling 7-day actives (exact vs HLL sketch) ==")
    exact = rolling_distinct(ev, window_days=7).orderBy("day").limit(5)
    approx = rolling_distinct_approx(ev, window_days=7).orderBy("day").limit(5)
    exact.join(approx, "day").show(truncate=False)

    print("== per-user engagement trend (centered-sum OLS) ==")
    u = ((F.unix_micros("ts") - F.lit(1704067200000000)) / F.lit(3600)).cast("long")
    x = u.cast("decimal(20,0)") * F.lit("0.000001").cast("decimal(7,6)")
    group_ols(ev.withColumn("_x", x), ["user_id"], "_x", "value").orderBy(
        F.desc("slope")
    ).show(5, truncate=False)

    print("== longest activity streaks ==")
    activity_streaks(ev, top_per_key=1).orderBy(
        F.desc("streak_days"), "user_id"
    ).show(5, truncate=False)

    print("== last-touch attribution (1h window) ==")
    last_touch_attribution(
        ev, max_gap_seconds=3600.0, tiebreak=("event_id",)
    ).orderBy("touch_type").show(truncate=False)

    print("== top 3-step journeys ==")
    top_paths(ev, path_len=3, top_n=5, tiebreak=("event_id",)).show(
        truncate=False
    )

    print("== rolling z-score anomalies ==")
    rolling_zscore(ev, tiebreak_col="event_id").filter(
        F.col("is_anomaly")
    ).select("user_id", "ts", "value", "zscore").show(5, truncate=False)

    print("== cohort statistics: click vs view values ==")
    two = ev.filter(F.col("event_type").isin("click", "view"))
    rank_sum_test(two, "event_type", "value", group_a="click").show(
        truncate=False
    )
    ks_test(two, "event_type", "value", group_a="click").show(truncate=False)

    print("== independence: does segment predict event mix? ==")
    seg = ev.withColumn("segment", (F.col("user_id") % 3).cast("string"))
    chi_square_test(seg, "segment", "event_type").show(truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
