"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the most recent right row of the same key with
``right.ts <= left.ts`` (backward as-of; the standard point-in-time lookup
for feature stores, tick data, slowly-changing dimensions).

Implementation is a composition of built-in operators — no UDF, no
per-row Python:

1. tag both sides and union them on (key, ts) with the right side's value
   columns (left rows carry nulls there);
2. one window per key ordered by (ts, side) — right rows sort *before*
   left rows at equal ts, giving inclusive `<=` semantics;
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding frame
   forward-fills each left row with the latest right values;
4. keep the left rows.

Cost: ONE shuffle on the key + a per-partition sort — the same price as a
sort-merge join, with none of the range-explosion of a theta join. At
100 TB both inputs shuffle once; skewed keys are AQE/salting territory like
any window (operators.skew).

DuckDB's native ``ASOF JOIN`` provides the correctness oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["asof_join", "asof_join_nearest", "interval_overlap_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + the nearest right ``right_cols`` values
    at-or-before (``direction='backward'``, the default) or at-or-after
    (``'forward'``) each left row's timestamp, matched within ``key``.

    ``tolerance_seconds`` optionally voids matches farther than the window
    (pandas ``merge_asof(tolerance=...)`` semantics). Left rows with no
    qualifying right row keep nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    # NULL-ts right rows can never be a legitimate "as of" match, but in
    # the union-scan they sort BEFORE all time (Spark asc = NULLS FIRST)
    # and last(ignorenulls) would hand their VALUES to every left row
    # preceding the first real right row (while skipping their NULL
    # _r_ts — value set, match-ts unset: pure garbage). Drop them.
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows (_side=0) order before left rows at equal _ts => inclusive.
    # Forward direction: scan event time in reverse so "last right seen"
    # becomes "nearest right at-or-after".
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"),
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        from ddataframeoperation_spark.operators.windows import epoch_seconds

        gap = epoch_seconds(F.col("_ts")) - epoch_seconds(F.col("_f_ts"))
        if direction == "forward":
            gap = -gap
        within = gap <= tolerance_seconds
        out = out.select(
            "*",
            *[
                F.when(within, F.col(f"_f_{c}")).alias(f"_t_{c}")
                for c in right_cols
            ],
        )
        value_cols = [F.col(f"_t_{c}").alias(f"{c}_asof") for c in right_cols]
    else:
        # Left-ts guard: a NULL-ts left row has no position on the time
        # line — in the FORWARD scan (desc = NULLS LAST) it would sort
        # after everything and "see" the earliest right row as its
        # match. It keeps NULLs instead, per the no-qualifying-row
        # contract. (The tolerance path above reaches the same NULL via
        # its NULL gap.)
        value_cols = [
            F.when(F.col("_ts").isNotNull(), F.col(f"_f_{c}")).alias(
                f"{c}_asof"
            )
            for c in right_cols
        ]
    return out.select(*[F.col(f"_l.{c}").alias(c) for c in lcols], *value_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: float = 3600.0,
    keys: Sequence[str] = (),
    left_cols: Sequence[str] = (),
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """Interval-overlap join (two-sided range join) — another operator
    Spark lacks natively: pair every left interval with every right
    interval it overlaps (``l.start <= r.end AND r.start <= l.end``,
    timestamps inclusive). The naive theta join is a cartesian product;
    this is the standard BUCKETED form: each interval explodes into the
    coarse time buckets it touches, candidates equi-join on (keys,
    bucket), duplicates from multi-bucket spans collapse, and the exact
    overlap predicate filters last.

    Cost model: an interval spanning L seconds lands in ceil(L/W)+1
    buckets (W = ``bucket_seconds``), so the join input inflates by the
    span/bucket ratio — pick W near the TYPICAL interval length so most
    intervals hit 1–2 buckets. Candidates per bucket are (left-in-bucket
    × right-in-bucket): W also bounds the bucket population at 100 TB the
    same way the band width does for MinHash. Everything is builtins
    (sequence/explode + equi-join) — codegen'd, no UDF, never a cross
    join.

    Returns the matched pairs: all ``keys``, both sides' start/end
    columns (left's prefixed ``l_``, right's ``r_``), and any
    ``left_cols``/``right_cols`` passthroughs (same prefixes).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    w = float(bucket_seconds)

    def bucketed(
        df: DataFrame, s: str, e: str, tag: str, extra: Sequence[str]
    ) -> DataFrame:
        lo = F.floor(F.col(s).cast("double") / w).cast("long")
        hi = F.floor(F.col(e).cast("double") / w).cast("long")
        return df.select(
            *keys,
            *[F.col(c).alias(f"{tag}_{c}") for c in extra],
            F.col(s).alias(f"{tag}_start"),
            F.col(e).alias(f"{tag}_end"),
            F.explode(F.sequence(lo, hi)).alias("_bucket"),
        )

    lb = bucketed(left, left_start, left_end, "l", left_cols)
    rb = bucketed(right, right_start, right_end, "r", right_cols)
    on = [*keys, "_bucket"]
    cand = lb.join(rb, on=on)
    # Bucket-ownership dedup instead of distinct(): an overlapping pair
    # meets in every bucket BOTH spans touch; keep only the meeting in the
    # bucket that owns the overlap's left edge (max of the two starts —
    # inside both spans for every true overlap, so exactly one copy
    # survives). Row-local predicate: no extra shuffle, and — unlike
    # distinct() — it cannot collapse two legitimately identical input
    # rows into one pair.
    own = F.floor(
        F.greatest(F.col("l_start"), F.col("r_start")).cast("double") / w
    ).cast("long")
    return (
        cand.filter(F.col("_bucket") == own)
        .drop("_bucket")
        .filter(
            (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end"))
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join, ``direction='nearest'`` — the third pandas
    ``merge_asof`` direction completing backward/forward: each left row
    takes the right row with the SMALLEST absolute time distance within
    ``key``, either side of it. Deterministic tie ladder, stated because
    engines have no default here: equidistant backward/forward
    candidates resolve BACKWARD (the earlier row — pandas' own rule);
    same-timestamp right rows resolve to the greatest ``right_tiebreak``
    value (pass a unique id; without one, equal-timestamp duplicates
    are the caller's nondeterminism to own).

    Output: every left column, ``{c}_asof`` for each right column, and
    ``gap_us`` — the SIGNED match distance in exact integer
    microseconds (positive = matched an earlier right row; the §20
    rule: second-resolution epochs would misclassify sub-second
    nearest-side decisions). ``tolerance_seconds`` voids matches
    farther than the window (both value columns and gap_us go NULL).

    Plan: the same single union + key-partitioned fill as
    :func:`asof_join`, run in BOTH directions — one hash exchange on
    ``key``, two sorts over it (Catalyst reuses the partitioning), no
    join. Each left row then picks between its two candidate fills
    row-locally.
    """
    lcols = left.columns
    tb = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.struct(*lcols).alias("_l"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    # NULL-ts right rows dropped — same union-scan garbage mode as
    # :func:`asof_join` (values handed to early left rows with no
    # match-ts to show for it).
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tb.cast("long").alias("_tb"),
        F.lit(None)
        .cast(left.select(F.struct(*lcols)).schema[0].dataType)
        .alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    u = l_tagged.unionByName(r_tagged)
    # Backward scan: right rows order BEFORE left rows at equal ts
    # (inclusive at-or-before); among equal-ts rights, ascending _tb so
    # last() picks the greatest tiebreak.
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward scan: reverse event time; same inclusivity and tie rules.
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(wb).alias("_b_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(wf).alias("_f_ts"),
    ).filter(F.col("_side") == 1)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gb = us(F.col("_ts")) - us(F.col("_b_ts"))
    gf = us(F.col("_f_ts")) - us(F.col("_ts"))
    use_b = F.col("_b_ts").isNotNull() & (
        F.col("_f_ts").isNull() | (gb <= gf)
    )
    signed_gap = F.when(use_b, gb).otherwise(-gf)
    within = (
        F.lit(True)
        if tolerance_seconds is None
        else F.abs(signed_gap) <= F.lit(int(round(tolerance_seconds * 1e6)))
    )
    # _ts guard: a NULL-ts left row sorts LAST in the forward scan
    # (desc = NULLS LAST) and would otherwise "see" the earliest right
    # row and match it (use_b is NULL-false there, so the forward
    # branch wins) with a NULL gap_us — value without a distance. No
    # position on the time line means no nearest match.
    matched = (
        F.col("_ts").isNotNull()
        & (F.col("_b_ts").isNotNull() | F.col("_f_ts").isNotNull())
        & within
    )
    vals = [
        F.when(
            matched, F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
        ).alias(f"{c}_asof")
        for c in right_cols
    ]
    return filled.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *vals,
        F.when(matched, signed_gap).cast("long").alias("gap_us"),
    )
