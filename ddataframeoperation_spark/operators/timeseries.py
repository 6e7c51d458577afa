"""Time-series rollup operators (hypertable-style continuous aggregates).

Timescale-like hypertables expose one logical table with pre-aggregated
rollups at several granularities. The Spark-first rendering: compute every
granularity in ONE scan using grouping sets over derived time buckets —
each input row flows through the aggregate once per granularity, but the
scan/shuffle machinery is shared (vs one query per granularity = N scans).

At 100 TB these rollups are what you materialize incrementally (foreachBatch
upsert per granularity from the streaming path, streaming/windows.py); the
batch operator here is the backfill / bootstrap form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "time_bucket",
    "multi_granularity_rollup",
    "resample_ffill",
    "ohlc_aggs",
    "ohlc_bars",
    "ewma",
    "twap",
    "rolling_distinct",
    "rolling_distinct_approx",
    "rolling_zscore",
    "calendar_spine",
    "seasonal_decompose_weekly",
    "cusum_changepoint",
    "seasonal_mad_anomalies",
]

_GRANULARITIES = ("hour", "day", "week", "month", "quarter", "year")


def time_bucket(ts: str | Column, granularity: str) -> Column:
    """Truncate a timestamp to a named bucket (hour/day/week/month/...)."""
    if granularity not in _GRANULARITIES:
        raise ValueError(f"granularity must be one of {_GRANULARITIES}")
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_trunc(granularity, c)


def multi_granularity_rollup(
    df: DataFrame,
    ts_col: str,
    granularities: Sequence[str],
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """All requested granularities in one scan.

    Output: one row per (granularity, bucket_start, *extra_keys) with the
    aggregates; ``granularity`` is a discriminator column so consumers can
    slice one rollup level with a partition-prunable filter when the result
    is written partitioned by it.

    Implementation: explode each row into its (granularity, bucket) pairs —
    an array of G structs, G small and constant — then a single hash
    aggregate. Shuffle carries G× the (pre-aggregated map-side) key space,
    not G× the data.
    """
    for g in granularities:
        if g not in _GRANULARITIES:
            raise ValueError(f"granularity must be one of {_GRANULARITIES}")
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).alias("granularity"),
                time_bucket(ts_col, g).alias("bucket_start"),
            )
            for g in granularities
        ]
    )
    exploded = df.select(F.explode(pairs).alias("_gb"), *df.columns).select(
        F.col("_gb.granularity").alias("granularity"),
        F.col("_gb.bucket_start").alias("bucket_start"),
        *df.columns,
    )
    return exploded.groupBy("granularity", "bucket_start", *extra_keys).agg(*aggs)


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    granularity: str = "day",
    step: str = "1 day",
    agg: Column | None = None,
) -> DataFrame:
    """Regularize an irregular series (hypertable ``time_bucket_gapfill`` +
    ``locf``): per key, one row for EVERY ``step`` bucket between that
    key's first and last observation, forward-filling gaps with the last
    observed value.

    Plan shape — three steps, each shuffling only on ``key_col`` so AQE
    can reuse one exchange:

    1. bucketize + aggregate observations (map-side combined);
    2. per-key bounds → ``sequence(lo, hi, step)`` → explode = the dense
       grid, built JVM-side (grid size = span/step per key — rows are
       generated, never read);
    3. left-join observations onto the grid and gap-fill with
       ``last(value, ignorenulls=True)`` over the bucket order.

    Output: (key, bucket, value, is_gap). Leading buckets before a key's
    first observation cannot be filled and don't occur (the grid starts at
    the key's own min).
    """
    if agg is None:
        agg = F.max(value_col)
    obs = (
        df.withColumn("_bucket", F.date_trunc(granularity, F.col(ts_col)))
        .groupBy(key_col, "_bucket")
        .agg(agg.alias("_v"))
    )
    bounds = obs.groupBy(key_col).agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
        ).alias("_bucket"),
    )
    joined = grid.join(obs, on=[key_col, "_bucket"], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.col("_bucket").alias("bucket"),
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.col("_v").isNull().alias("is_gap"),
    )


def ohlc_aggs(
    value_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> "list[Column]":
    """The OHLC aggregate list — SHARED by the batch operator
    (:func:`ohlc_bars`) and its streaming twin
    (``streaming.windows.ohlc_stream``) so tie-breaking and NULL handling
    can never diverge between the pair. min_by/max_by over a
    (ts, tiebreak) struct keep constant per-group state."""
    order = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(F.col(ts_col))
    )
    return [
        F.min_by(F.col(value_col), order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), order).alias("close"),
        F.count("*").cast("long").alias("n_obs"),
    ]


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    granularity: str = "hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Candlestick / OHLC downsampling: per (key, time bucket) the first
    (open), highest (high), lowest (low), and last (close) observation plus
    count and mean — the canonical financial-bar / telemetry-downsample
    aggregate (Timescale ``candlestick_agg``, kdb ``xbar`` shape).

    Implementation is ONE hash aggregate, no window: open/close are
    ``min_by``/``max_by`` over a (ts, tiebreak) struct, which Spark
    evaluates map-side-combinable like any other agg — so the operator
    scales exactly like a plain group-by (single shuffle on the bucketed
    key, partial aggregation before it). A window formulation
    (first/last over partitions) would sort every partition instead.

    ``tiebreak_col`` breaks equal-timestamp ties deterministically; without
    it, equal-``ts`` rows make open/close nondeterministic under
    partial-agg ordering.
    """
    aggs = ohlc_aggs(value_col, ts_col, tiebreak_col) + [
        F.round(F.avg(value_col), 4).alias("mean_value")
    ]
    return df.groupBy(
        F.col(key_col),
        time_bucket(ts_col, granularity).alias("bucket"),
    ).agg(*aggs)


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (final smoothed level):
    ``s_1 = v_1;  s_t = alpha * v_t + (1 - alpha) * s_(t-1)`` over the
    time-ordered series — the standard streaming smoother for metrics /
    anomaly baselines.

    Spark-first form: collect each key's series into a time-sorted array
    (``array_sort`` over (ts, tiebreak, value) structs — total struct
    ordering, no window sort) and fold it JVM-side with ``aggregate``.
    The recurrence is inherently sequential per key, but keys are
    independent, so parallelism = key cardinality — same contract as any
    per-key window. The per-key series must fit in one array (fine for
    bounded per-entity telemetry; for unbounded series, segment by time
    first and chain segment levels, or use the streaming path).

    The identical left fold runs in DuckDB as
    ``list_reduce(list(v ORDER BY ts, tb), (acc, x) -> a*x + (1-a)*acc)``
    — both engines execute the same IEEE double sequence, so results match
    exactly; ``round_to`` only guards the final rendering. NULL values are
    FILTERED before the fold (a NULL observation has no defined smoothed
    contribution; Spark's collect_list would silently drop it while SQL
    ``list()`` keeps it and poisons the fold — the explicit filter makes
    both engines see the same series, and ``n_obs`` counts non-null
    observations). Keys whose values are all NULL drop out entirely.

    Returns (key, n_obs, ewma).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    df = df.filter(F.col(value_col).isNotNull())
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    item = F.struct(
        F.col(ts_col).alias("t"), tb.alias("b"), F.col(value_col).alias("v")
    )
    g = df.groupBy(key_col).agg(
        F.array_sort(F.collect_list(item)).alias("_series"),
    )
    vals = F.transform(F.col("_series"), lambda s: s["v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: F.lit(float(alpha)) * x
        + F.lit(1.0 - float(alpha)) * acc,
    )
    return g.select(
        F.col(key_col),
        F.size("_series").cast("long").alias("n_obs"),
        F.round(folded, round_to).alias("ewma"),
    )


def twap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation is weighted
    by how long it remained current — ``sum(v_i * dt_i) / sum(dt_i)`` with
    ``dt_i`` the gap to the next observation. The standard correction for
    irregular sampling (a price that held for an hour should not count the
    same as one that held a second); the last observation of each key has
    no duration and is excluded (n_intervals = n_obs - 1).

    One lead() window per key (single shuffle+sort) and a
    map-side-combined aggregate. Gaps are computed in integer microseconds
    (exact) before the double multiply, so both engines see identical
    arithmetic. NULL values are FILTERED FIRST, so a NULL observation's
    holding time accrues to the previous non-null value (the LOCF-correct
    attribution) instead of diluting the denominator with weight that has
    no numerator. Keys with fewer than two non-null observations drop out.

    Returns (key, n_intervals, twap).
    """
    df = df.filter(F.col(value_col).isNotNull())
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    dt = (
        F.unix_micros(nxt.cast("timestamp"))
        - F.unix_micros(F.col(ts_col).cast("timestamp"))
    ).cast("double")
    v = F.col(value_col).cast("double")
    weighted = df.withColumn("_dt", dt).filter(F.col("_dt").isNotNull())
    # try_divide: a key whose events all share ONE timestamp has only
    # zero-length intervals, so Σdt = 0 — under ANSI (Spark 4 default)
    # plain division would kill the job; NULL twap ("no time elapsed,
    # no time-weighted average") is the honest answer for that key.
    return weighted.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.round(
            F.try_divide(F.sum(v * F.col("_dt")), F.sum("_dt")), round_to
        ).alias("twap"),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
    out_col: str = "n_active",
) -> DataFrame:
    """Rolling W-day distinct-key count per calendar day — the DAU/WAU/MAU
    family (7-day actives, 28-day actives) every event pipeline reports.

    COUNT(DISTINCT) over a sliding time frame is not decomposable, so the
    naive rendering is a RANGE window over the raw event stream — a
    per-day re-sort of everything, and distinct-within-frame isn't even
    expressible as a Spark window. The scale-safe shape used here:

        1. reduce to the distinct (day, key) grid first — one two-phase
           hash aggregate; at 100 TB this collapses the event stream to
           |keys| × |days| at most, usually orders of magnitude smaller;
        2. explode each (day, key) into the ``window_days`` target days
           it contributes to — a bounded, constant-factor row expansion
           of the REDUCED grid, never of the raw events;
        3. one count-distinct per target day (again two-phase: partial
           distinct on (day, key), merge counts) — Spark plans
           countDistinct as expand+two aggregates, all map-side
           combinable;
        4. keep only target days that actually appear in the data (a
           broadcast semi-join against the tiny distinct-day list), so
           the trailing ``window_days - 1`` phantom days past the end of
           the data don't emit partial windows.

    Output: one row per observed day with the distinct-key count over
    [day - window_days + 1, day]. All shuffles carry (date, key) pairs.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    per = (
        df.select(
            F.to_date(F.col(ts_col)).alias("_d"), F.col(key_col).alias("_k")
        )
        .filter(F.col("_d").isNotNull() & F.col("_k").isNotNull())
        .distinct()
    )
    days = per.select(F.col("_d").alias("day")).distinct()
    offsets = F.sequence(F.lit(0), F.lit(window_days - 1))
    expanded = per.select(
        "_k", F.explode(F.transform(offsets, lambda i: F.date_add("_d", i))).alias("day")
    )
    observed = expanded.join(F.broadcast(days), on="day", how="left_semi")
    return observed.groupBy("day").agg(
        F.countDistinct("_k").cast("long").alias(out_col)
    )


def rolling_distinct_approx(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 28,
    out_col: str = "n_active_approx",
    lg_config_k: int = 12,
) -> DataFrame:
    """The sketch path for :func:`rolling_distinct` — rolling W-day
    APPROXIMATE distinct actives via mergeable Datasketches HLL.

    The exact operator's (day, key) grid is the right plan up to moderate
    key cardinality, but for a 28-day MAU over billions of keys the grid
    itself is the bottleneck: |days| x |keys| rows shuffle per window
    position. The sketch plan's state is CONSTANT in key cardinality:

        1. one pass over the events builds a per-day HLL sketch
           (``hll_sketch_agg`` — two-phase, map-side combinable; raw keys
           are scanned exactly once and never shuffled);
        2. each daily sketch (a few KB, regardless of how many keys it
           summarizes) is exploded to the ``window_days`` target days it
           contributes to — |days| x W sketch rows total;
        3. per target day, ``hll_union_agg`` merges the W sketches and
           ``hll_sketch_estimate`` reads out the count — HLL union is
           lossless over sketches, so the estimate equals what a single
           sketch of the window's raw keys would give;
        4. phantom trailing days past the end of the data are dropped by
           a broadcast semi-join against the observed-day list, mirroring
           the exact operator's contract.

    Same output shape as :func:`rolling_distinct` (day, count) with the
    count an estimate (±~1.6% at the default ``lg_config_k=12``); the
    registered query asserts the error bound against the exact twin.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    clean = df.select(
        F.to_date(F.col(ts_col)).alias("_d"), F.col(key_col).alias("_k")
    ).filter(F.col("_d").isNotNull() & F.col("_k").isNotNull())
    daily = clean.groupBy("_d").agg(
        F.hll_sketch_agg("_k", F.lit(lg_config_k)).alias("_sk")
    )
    days = daily.select(F.col("_d").alias("day"))
    offsets = F.sequence(F.lit(0), F.lit(window_days - 1))
    expanded = daily.select(
        "_sk",
        F.explode(F.transform(offsets, lambda i: F.date_add("_d", i))).alias(
            "day"
        ),
    )
    observed = expanded.join(F.broadcast(days), on="day", how="left_semi")
    return observed.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).cast("long").alias(out_col)
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_rows: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
    tiebreak_col: str | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """B19 — per-key rolling z-score anomaly screen: each observation
    scored against the mean/stddev of its ``window_rows`` PRECEDING
    observations (exclusive — the point under test never contaminates
    its own baseline), flagged when |z| exceeds ``threshold``. The
    metric-monitoring staple (latency spikes, spend anomalies, sensor
    drift) in its streaming-friendly per-key form.

    Plan: ONE key-partitioned window with a bounded ROWS frame — at most
    ``window_rows`` values of state per row, never whole-partition
    buffering; mean and stddev share the frame, so Spark computes both
    in a single WindowExec over a single exchange. Rows with fewer than
    ``min_periods`` predecessors emit NULL z (warm-up); zero-variance
    baselines emit NULL z rather than ±inf. Pass a unique
    ``tiebreak_col`` for a total order when timestamps can collide.
    """
    if window_rows < 2:
        raise ValueError("window_rows must be >= 2")
    if not 1 <= min_periods <= window_rows:
        raise ValueError("need 1 <= min_periods <= window_rows")
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    cnt = F.count(value_col).over(w)
    z = F.when(
        (cnt >= min_periods) & sd.isNotNull() & (sd != 0.0),
        (F.col(value_col) - mean) / sd,
    )
    # The flag derives from the ROUNDED score — the value actually
    # published (and hash-compared): flagging on the unrounded z would
    # let a z straddling the rounding grid disagree with its own column.
    out = df.withColumn("zscore", F.round(z, ndigits))
    return out.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
    )


def calendar_spine(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """B24 — date-dimension generator (the warehouse calendar spine):
    one row per calendar day spanning [min(ts), max(ts)] of the input,
    with the standard derived attributes —

      day          (timestamp, midnight)
      year, month, day_of_month, quarter   exact integers
      day_of_week  1=Monday..7=Sunday (ISO — Spark's ``dayofweek`` is
                   1=Sunday, so this uses ``weekday()+1`` which both
                   engines agree on)
      is_weekend   day_of_week >= 6
      week_start   date_trunc('week', day)

    Built from ONE 2-value global aggregate (min/max — broadcastable
    1-row) + ``sequence``/``explode``: output is calendar-bounded (days,
    not rows), so the spine costs one scan regardless of corpus size.
    The spine is what gapfill joins against; exposing it standalone
    gives downstream marts the conformed date dimension.
    """
    bounds = df.agg(
        F.date_trunc("day", F.min(ts_col)).alias("_lo"),
        F.date_trunc("day", F.max(ts_col)).alias("_hi"),
    )
    days = bounds.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    dow = F.weekday("day") + F.lit(1)
    return days.select(
        "day",
        F.year("day").cast("long").alias("year"),
        F.month("day").cast("long").alias("month"),
        F.dayofmonth("day").cast("long").alias("day_of_month"),
        F.quarter("day").cast("long").alias("quarter"),
        dow.cast("long").alias("day_of_week"),
        (dow >= 6).alias("is_weekend"),
        F.date_trunc("week", "day").alias("week_start"),
    )


def seasonal_decompose_weekly(
    df: DataFrame,
    ts_col: str,
    value_cents: Column,
    group_col: str,
) -> DataFrame:
    """B24 — trend / weekly-seasonal / residual decomposition of a daily
    series, ENTIRELY in scaled integer arithmetic (×7 units), so the
    decomposition is a pure engine-exact function of the data — no float
    moving averages to drift across engines or partition orders.

      daily    = per (group, day) sum of ``value_cents`` (DECIMAL(38,0)
                 partials, long output)
      trend_x7 = the 7-OBSERVED-DAY centered sum (ROWS BETWEEN 3 PRECEDING
                 AND 3 FOLLOWING; NULL where the frame has < 7 days) —
                 7× the centered moving average, kept unscaled
      seasonal_x7 = per (group, weekday Mon=0..Sun=6) integral mean of the
                 detrended 7·daily − trend_x7 (``div``; both engines
                 truncate toward zero)
      resid_x7 = 7·daily − trend_x7 − seasonal_x7

    Contracts: the trend frame is over OBSERVED days — a gap shifts the
    frame identically in every engine; compose with the gap-fill spine
    first when calendar alignment matters. Quantization: trend/seasonal/
    resid are in 1e-2/7 dollar units (divide by 7 offline for display);
    cents quantization of the input is floor(x·100+0.5), the module's
    exact-money recipe.

    Plan: one (group, day) hash-aggregate, one windowed pass partitioned
    by group, one weekday aggregate joined back broadcast — the raw table
    shuffles once, everything after is |groups × days| sized.

    ``value_cents`` NaN caveat: same caller contract as
    :func:`cusum_changepoint` — make the expression NaN-safe if the raw
    measure can contain NaN (a bare cents floor/cast raises under ANSI).
    """
    d = F.to_date(F.col(ts_col)).alias("d")
    # NULL-ts rows have no day and NULL-value rows contribute nothing to
    # the sum while still counting a day into the 7-observed-day frame
    # check (count(lit(1)) vs sum's NULL-skip) — either one silently
    # presents a 6-day sum as a complete trend frame. Drop them up front
    # on BOTH engines (the registered oracles filter identically).
    df = df.filter(F.col(ts_col).isNotNull() & value_cents.isNotNull())
    daily = df.groupBy(F.col(group_col).alias("grp"), d).agg(
        F.sum(value_cents.cast("decimal(38,0)"))
        .cast("long")
        .alias("daily_cents")
    )
    w = Window.partitionBy("grp").orderBy("d").rowsBetween(-3, 3)
    t = daily.withColumn(
        "trend_x7",
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.sum("daily_cents").over(w)
        ),
    ).withColumn(
        "resid0_x7", F.lit(7) * F.col("daily_cents") - F.col("trend_x7")
    ).withColumn("dow", F.weekday("d"))
    s = (
        t.filter(F.col("resid0_x7").isNotNull())
        .groupBy("grp", "dow")
        .agg(
            F.expr("sum(resid0_x7) div count(resid0_x7)").alias(
                "seasonal_x7"
            )
        )
    )
    return (
        t.join(F.broadcast(s), ["grp", "dow"], "left")
        .select(
            F.col("grp").alias(group_col),
            "d",
            "daily_cents",
            "trend_x7",
            F.col("seasonal_x7").cast("long").alias("seasonal_x7"),
            (F.col("resid0_x7") - F.col("seasonal_x7"))
            .cast("long")
            .alias("resid_x7"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str,
    value_cents: Column,
    group_col: str,
) -> DataFrame:
    """B24 — CUSUM changepoint detection per group, in exact scaled
    integers: the day where the mean of a daily series most plausibly
    shifted (the classic level-shift detector — deploys, pricing changes,
    a source going stale). The statistic is the cumulative sum of
    deviations from the group mean; to stay in integers it is computed
    ×n: S_t = Σ_{i≤t} (n·x_i − T) with n = #days and T = Σx, so S is
    exactly n× the usual CUSUM, S_n ≡ 0, and the argmax is unchanged.
    All products in DECIMAL(38,0); the changepoint is argmax |S_t| with
    the EARLIEST-day tiebreak — every engine returns the identical day.

    ``value_cents`` is a caller-provided Column; if the underlying
    measure can contain NaN, make the expression NaN-safe (e.g. wrap the
    raw value in ``nanvl(v, NULL)`` before the cents floor/cast) — a
    bare ``floor(v*100+0.5).cast('long')`` RAISES on NaN under ANSI
    (the Spark 4 default), including inside this operator's own
    NULL-drop filter, on BOTH engines symmetrically.

    Returns one row per group: (group, change_day, n_days,
    s_max_abs STRING — canonical DECIMAL digits; n·Σ|dev| passes 2^53
    long before 100 TB). Plan: one (group, day) aggregate, one broadcast
    of the |groups|-row totals, one running-sum window partitioned by
    group, one top-1-per-group window — daily tables only.
    """
    d = F.to_date(F.col(ts_col)).alias("d")
    # Drop NULL-ts (no day) and NULL-value rows BEFORE the daily
    # aggregate: an all-NULL day would otherwise count into n but
    # contribute NULL (skipped) to T, breaking the documented S_n == 0
    # invariant and biasing every deviation — and a NULL day would sort
    # first on Spark but last on DuckDB, desynchronizing the running
    # sum. The registered oracle filters identically.
    df = df.filter(F.col(ts_col).isNotNull() & value_cents.isNotNull())
    daily = df.groupBy(F.col(group_col).alias("grp"), d).agg(
        F.sum(value_cents.cast("decimal(38,0)")).alias("x")
    )
    g = daily.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("t")
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        daily.join(F.broadcast(g), "grp")
        .withColumn(
            "s",
            F.sum(
                F.expr("CAST(n AS DECIMAL(38,0)) * x - t")
            ).over(w),
        )
        .withColumn("sa", F.abs(F.col("s")))
    )
    rn = Window.partitionBy("grp").orderBy(
        F.col("sa").desc(), F.col("d").asc()
    )
    return (
        c.withColumn("_rn", F.row_number().over(rn))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("grp").alias(group_col),
            F.col("d").alias("change_day"),
            F.col("n").cast("long").alias("n_days"),
            F.col("sa").cast("string").alias("s_max_abs"),
        )
    )


def seasonal_mad_anomalies(
    df: DataFrame,
    ts_col: str,
    value_cents: Column,
    group_col: str,
    k_mad: int = 3,
) -> DataFrame:
    """B24 — the alerting stage on top of
    :func:`seasonal_decompose_weekly`: flag days whose RESIDUAL deviates
    from its group's median residual by more than ``k_mad``× the median
    absolute deviation — the robust "page me" rule (alerting on raw
    values pages every Sunday; on mean±stddev, one outlier inflates its
    own threshold; median/MAD resist both).

    Stays in exact integers end to end: medians are the LOWER median —
    the order statistic at row ``(n+1) div 2`` under (value ASC, day
    ASC) — i.e. a SELECTED datum, never an interpolated half, so med,
    dev, and mad are exact longs and the flag ``dev > k_mad·mad`` is an
    engine-exact predicate. Stated contract: with ``mad = 0`` (more than
    half the days have the identical residual) ANY deviation flags —
    the standard MAD degeneracy, intentionally loud. Edge days without
    a full trend frame have no residual and cannot flag.

    Returns flagged rows only: (group, d, resid_x7, dev, mad). Plan:
    the decomposition's aggregates + two group-partitioned rank windows
    (median selections) + broadcast joins of the |groups|-row median
    tables.
    """
    rs = seasonal_decompose_weekly(df, ts_col, value_cents, group_col)
    rs = rs.filter(F.col("resid_x7").isNotNull()).select(
        F.col(group_col).alias("grp"), "d", "resid_x7"
    )

    def _lower_median(src: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("grp").orderBy(F.col(val).asc(), F.col("d").asc())
        wn = Window.partitionBy("grp")
        return (
            src.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(wn))
            .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
            .select("grp", F.col(val).alias(out))
        )

    med = _lower_median(rs, "resid_x7", "med")
    dev = rs.join(F.broadcast(med), "grp").withColumn(
        "dev", F.abs(F.col("resid_x7") - F.col("med"))
    )
    mad = _lower_median(dev, "dev", "mad")
    return (
        dev.join(F.broadcast(mad), "grp")
        .filter(F.col("dev") > F.lit(int(k_mad)) * F.col("mad"))
        .select(
            F.col("grp").alias(group_col), "d", "resid_x7", "dev", "mad"
        )
    )
