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

__all__ = ["asof_join"]


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
    r_tagged = right.select(
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
        value_cols = [F.col(f"_f_{c}").alias(f"{c}_asof") for c in right_cols]
    return out.select(*[F.col(f"_l.{c}").alias(c) for c in lcols], *value_cols)
