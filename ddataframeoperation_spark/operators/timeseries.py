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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_bucket", "multi_granularity_rollup"]

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
