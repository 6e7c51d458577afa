"""Structured Streaming forms of the event-time operators.

SURVEY.md §2 B36–B38. The reference is batch-only (eager R, §4), so these
are pure engine surface: watermarked tumbling/sliding windows, session
windows, and stateful dedup over the ``events`` table replayed as a stream.

Test/verification strategy (SURVEY.md §5.4): replay the parquet fixture
with ``availableNow`` + a memory sink and check batch-equivalence — the
windowed streaming aggregate over the full replay must equal the batch
``groupBy(window)`` on the same data. That also powers the driver's
rows-only correctness entries.

Scale notes: state store size is bounded by the watermark horizon ×
key cardinality; keys here are (window) or (window, user) — at 100 TB of
events the shuffle partitions the state by key so state is distributed; the
watermark is what keeps it finite. ``availableNow`` processes a backlog in
rate-limited batches — the same code serves backfill and live tailing.
"""

from __future__ import annotations

import contextlib
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bounded_state_partitions",
    "events_as_stream",
    "stage_multi_batch_replay",
    "run_with_late_replay",
    "tumbling_counts",
    "sliding_counts",
    "session_window_agg",
    "stream_dedup",
    "stream_interval_join",
    "run_to_memory",
    "ohlc_stream",
    "stream_psi_bucket_counts",
    "stream_daily_actives",
]


#: State-store partition cap applied by the run helpers below. The number
#: of state-store partitions is frozen from ``spark.sql.shuffle.partitions``
#: at the stream's FIRST micro-batch and every subsequent batch replays ALL
#: of them — a confless session's default 200 makes each fixture-scale
#: micro-batch pay 200 state-store task startups (~42 s/query measured at
#: sf0.1 on the driver's vanilla session, vs ~5 s at 32). 32 matches the
#: engine session / local core count; a real cluster deployment sizes the
#: session conf itself and can raise the cap.
_MAX_STATE_PARTITIONS = 32


@contextlib.contextmanager
def bounded_state_partitions(
    spark: SparkSession, cap: int = _MAX_STATE_PARTITIONS
):
    """Temporarily LOWER ``spark.sql.shuffle.partitions`` to ``cap`` for
    the duration of a blocking stream run (never raises it — a session
    already tuned below the cap is left alone), restoring the previous
    value afterwards. Every run helper in this package wraps its
    ``start()``/``awaitTermination()`` in this, so streaming queries are
    self-sufficient w.r.t. session config — the vanilla-session footgun
    (SCALE.md §51 addendum) is pinned here instead of documented away.

    Session-global conf is mutated for the run's duration: don't launch
    CONCURRENT batch queries on the same session from another thread
    while a run helper is blocking (the helpers themselves are
    sequential, and the restored value makes this invisible to
    everything after).
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        lowered = int(old) > cap
    except (TypeError, ValueError):
        lowered = False
    if lowered:
        spark.conf.set(key, str(cap))
    try:
        yield
    finally:
        if lowered:
            spark.conf.set(key, old)


def events_as_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events fixture as a file-source stream (one-file-per-batch
    keeps the replay deterministic enough for equivalence checks)."""
    from ddataframeoperation_spark.catalog import _normalize_timestamps

    # Older fixtures store timestamp[ns]; the batch schema probe below fails
    # with PARQUET_TYPE_ILLEGAL on a vanilla session unless the legacy
    # ns-as-long conf is set FIRST (read_fixture_table does the same — but
    # streaming entry points must not depend on a batch query having run
    # earlier in the session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a *directory*; select just the events
    # file out of the fixture dir with a glob filter.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Same normalization as the batch catalog: ns-long → µs timestamp, and
    # TIMESTAMP_NTZ → TIMESTAMP (watermarks reject NTZ event-time columns).
    return _normalize_timestamps(stream)


def stage_multi_batch_replay(
    batch_df: DataFrame,
    stage_dir: str,
    n_batches: int = 4,
    ts_col: str = "ts",
):
    """Write a batch table as ``n_batches`` event-time-ordered parquet files
    and return a file-source stream over them with one-file-per-trigger —
    a deterministic multi-micro-batch replay for equivalence testing.

    Range partitioning guarantees every row of part i+1 ≥ every row of
    part i, and the file source orders files by modification time (ties by
    path are NOT deterministic across filesystems) — so the part files get
    explicitly ascending mtimes in part order. The replay then advances
    the watermark monotonically with no accidental late-data drops, which
    outer joins / eviction-semantics tests depend on.
    """
    import glob
    import os
    import time as _time

    batch_df.repartitionByRange(n_batches, ts_col).write.mode(
        "overwrite"
    ).parquet(stage_dir)
    now = _time.time()
    for i, f in enumerate(sorted(glob.glob(f"{stage_dir}/part-*"))):
        os.utime(f, (now + i, now + i))
    spark = batch_df.sparkSession
    schema = spark.read.parquet(stage_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )


def run_with_late_replay(
    batch_df: DataFrame,
    base_dir: str,
    cutoff,
    transform,
    flush_df: DataFrame | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Replay harness that PROVABLY exercises late-data drop: run a
    watermarked streaming ``transform`` over TWO availableNow runs
    sharing one checkpoint — run 1 sees the ON-TIME head (every row
    with ``ts_col >= cutoff``, including the global max event time, so
    the committed watermark ends at ``max(ts) - delay``); run 2 sees
    the LATE stragglers (``ts_col < cutoff``) plus an optional
    ``flush_df``. Choose ``cutoff`` at least ``delay + window/gap``
    below the global max and the engine must drop every straggler
    regardless of whether its late filter keys on row event time or
    aggregation-window end — the sink then equals the batch aggregate
    over the on-time subset alone (the oracle), and any surviving
    straggler surfaces as an extra or merged output row.

    Why two RUNS and not one multi-file availableNow run: Spark 4.1
    executes an entire availableNow backlog as ONE trigger, and the
    late-record filter keys on the watermark as of the START of the
    trigger (`numRowsDroppedByWatermark` stays 0 even for rows weeks
    below the reported per-batch watermark; verified empirically — a
    processingTime trigger drops the same row). Only a watermark
    COMMITTED to the checkpoint, i.e. from a previous run (or previous
    processing-time trigger), gates late rows. The restart is also the
    real-world shape: a backfill job re-started after the live head has
    advanced the watermark.

    Append-mode emission needs the final watermark to pass each real
    window's end, so ``flush_df`` (one far-future sentinel row for a
    key outside the fixture) rides at the end of run 2; the sentinel's
    own window ends beyond the final watermark and never emits, keeping
    the sink exactly the on-time aggregate.

    Same mtime discipline as :func:`stage_multi_batch_replay`: the file
    source orders files by modification time, so staged files get
    explicitly ascending mtimes (head, late, flush).
    """
    import glob
    import os
    import shutil
    import tempfile
    import time as _time

    input_dir = os.path.join(base_dir, "input")
    sink = os.path.join(base_dir, "sink")
    ck = os.path.join(base_dir, "ckpt")
    os.makedirs(input_dir, exist_ok=True)
    spark = batch_df.sparkSession
    now = _time.time()

    def _stage(df: DataFrame, idx: int, name: str) -> None:
        tmp = tempfile.mkdtemp(prefix=f"stage_{name}_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        srcs = glob.glob(f"{tmp}/part-*.parquet")
        if srcs:  # an empty subset writes no part file — nothing to stage
            dst = os.path.join(input_dir, f"{idx:02d}-{name}.parquet")
            shutil.copy(srcs[0], dst)
            os.utime(dst, (now + idx, now + idx))
        shutil.rmtree(tmp, ignore_errors=True)

    _stage(batch_df.filter(F.col(ts_col) >= F.lit(cutoff)), 0, "head")
    schema = spark.read.parquet(input_dir).schema

    def _run() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )
        with bounded_state_partitions(spark):
            q = (
                transform(stream)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    _run()
    _stage(batch_df.filter(F.col(ts_col) < F.lit(cutoff)), 1, "late")
    if flush_df is not None:
        _stage(flush_df, 2, "flush")
    _run()
    return spark.read.parquet(sink)


def tumbling_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """B36 — watermarked tumbling-window aggregate: count + sum(value) per
    (window, event_type)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """B36 — sliding-window variant (each event lands in window/slide panes)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def session_window_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """B37 — native session windows (gap-close semantics) per user; late
    data beyond the watermark is dropped by the engine. Batch twin:
    operators.windows.sessionize."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """B38 — stateful streaming dedup by key within the watermark horizon
    (state for a key is dropped once the watermark passes it, keeping state
    bounded — the 100 TB requirement)."""
    keys = keys or ["user_id", "event_type"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """B36 — stream-stream interval join: pair each left event with the
    right-stream events of the same ``key`` that occur within
    ``(l.ts, l.ts + max_gap]`` — the click→conversion attribution shape.
    ``how="left_outer"`` additionally emits click-without-conversion rows
    (null right columns) once the right watermark passes ``l.ts + max_gap``
    — i.e., when no future match is possible. ``how="full_outer"`` (r8,
    VERDICT r7 task 6 — the last watermark-join shape) also emits
    conversion-without-click rows (null LEFT columns): a right row's
    no-match verdict is final once the left watermark passes ``r.ts``
    (any later-arriving left with ``l.ts < r.ts`` would be below the
    watermark and dropped), so both sides' unmatched rows finalize off
    the same two-sided time bound. ``how="right_outer"`` (r9) keeps
    exactly the right-preserving half of that matrix — matched pairs
    plus conversion-without-click — completing the
    inner/left/right/full/semi stream-stream join surface.

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, which is what lets the engine evict buffered rows:
    a left row is droppable once the right watermark passes
    ``l.ts + max_gap``, so state is bounded by rate × horizon regardless
    of total stream length — the 100 TB-stream requirement. Without the
    time bound Spark would have to buffer both streams forever (and
    rejects the plan in append mode; for outer joins the bound is also
    what *defines* when an unmatched row is final).
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    ).withWatermark("r_ts", watermark)
    j = l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap}")),
        how,
    )
    if how == "left_semi":
        # Semi join: left rows that HAVE a match — no right columns
        # exist, and each positive is FINAL the moment its first match
        # arrives (no watermark wait), unlike the outer join's
        # "no-match" verdicts.
        return j.select(
            F.col("l_key").alias("user_id"), "l_event_id", "l_ts"
        )
    # full/right outer: right-only rows carry a NULL l_key, so the
    # output key must coalesce across sides (inner/left_outer always
    # have l_key).
    key_out = (
        F.coalesce("l_key", "r_key")
        if how in ("full_outer", "right_outer")
        else F.col("l_key")
    )
    return j.select(
        key_out.alias("user_id"),
        "l_event_id",
        "r_event_id",
        "l_ts",
        "r_ts",
    )


def run_to_memory(result: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame with trigger=availableNow into a memory
    sink and return the materialized table — the batch-equivalence harness.
    Uses a unique sink name per call; blocks until the backlog is drained."""
    name = "s" + _uuid.uuid4().hex[:12]
    with bounded_state_partitions(result.sparkSession):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return result.sparkSession.table(name)


def ohlc_stream(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``timeseries.ohlc_bars``: watermarked tumbling
    OHLC bars per (key, window). min_by/max_by are ordinary declarative
    aggregates, so the state per open window is CONSTANT-size (the four
    extremes + count) — this is the continuously-materialized candlestick
    rollup (Timescale continuous aggregate shape), not a buffered sort.
    """
    from ddataframeoperation_spark.operators.timeseries import ohlc_aggs

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(*ohlc_aggs(value_col, ts_col, tiebreak_col))
        .select(
            F.col("win.start").alias("bucket"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


def stream_psi_bucket_counts(
    stream: DataFrame,
    ref_cuts: list[float],
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """B36 × drift — per-tumbling-window distribution monitoring of an
    ARRIVING stream against a static reference: bucket each event by the
    reference's percentile cut points (``ref_cuts``, computed once from
    the reference snapshot — e.g. ``percentile(v, array(0.1..0.9))``
    collected to a tiny driver-side list) and count per (window, bucket).
    Bucketing is a row-local literal-array fold — no stream-static join,
    no extra state beyond the windowed aggregate itself. Feed the
    materialized output to ``relational._psi_terms``-style post-processing
    (or the convenience wrapper in the registered query) to get one PSI
    per window — "did tonight's ingest drift from the reference corpus,
    hour by hour".

    Returns streaming (window_start, bucket, n_cur); NULL values are
    dropped (the batch psi_drift contract).
    """
    cuts = F.array(*[F.lit(float(c)) for c in ref_cuts])
    v = F.col(value_col).cast("double")
    bucket = F.lit(1) + F.size(F.filter(cuts, lambda x: v > x))
    return (
        stream.filter(v.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_cur"))
        .select(F.col("win.start").alias("window_start"), "bucket", "n_cur")
    )


def stream_daily_actives(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "2 hours",
    rsd: float = 0.01,
) -> DataFrame:
    """B36 — streaming daily distinct actives: per event-time day, the
    approximate distinct-key count — the live DAU counter. Streaming
    aggregation cannot hold exact per-key distinct state (Spark rejects
    COUNT(DISTINCT) in streaming for exactly that reason);
    ``approx_count_distinct`` is the supported shape because its HLL
    partial state is CONSTANT per window and mergeable across
    micro-batches — the same sketch argument as the batch
    rolling_distinct_approx twin. The watermark bounds how long a day's
    window stays open; state is (#open windows) x sketch size,
    independent of key cardinality and stream length.

    Returns (window_start, n_active_approx); the registered query gates
    the estimate against the exact batch count per day.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 day").alias("w"))
        .agg(
            F.approx_count_distinct(key_col, rsd).alias("n_active_approx")
        )
        .select(F.col("w.start").alias("window_start"), "n_active_approx")
    )
