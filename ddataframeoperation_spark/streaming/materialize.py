"""Incremental materialization of streaming rollups (continuous aggregates).

The batch form of the hypertable rollup lives in operators/timeseries.py;
this is the streaming half: maintain a queryable parquet rollup that stays
current as events arrive, paying only for changed windows.

Mechanism: watermarked tumbling aggregate in *update* output mode →
``foreachBatch`` rewrites exactly the partitions of the windows that
changed (dynamic partition overwrite, partitioned by window start). The
parquet directory is then a normal table for any reader.

Scale notes:
- each micro-batch writes only windows it touched — steady-state cost is
  proportional to arrival rate, not table size;
- the watermark bounds both state and the set of rewritable windows, so
  old partitions become immutable (compaction-friendly);
- exactly-once: offsets + completed batch ids live in the checkpoint;
  dynamic partition overwrite makes the per-batch write idempotent, so a
  replayed batch rewrites the same partitions with the same content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ddataframeoperation_spark.streaming.windows import (
    bounded_state_partitions,
)

__all__ = ["materialize_tumbling_rollup"]


def materialize_tumbling_rollup(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Run an availableNow pass that upserts the per-window rollup into
    ``out_path`` (parquet, partitioned by window start). Re-invoking with
    the same checkpoint resumes incrementally: already-committed files are
    not reprocessed.

    While this call blocks it holds ``bounded_state_partitions``: the
    session-global ``spark.sql.shuffle.partitions`` is temporarily
    lowered (never raised), so a concurrent batch query planned on the
    SAME session from another thread would silently plan with the
    lowered partition count. Don't share the session across threads for
    the duration of the run."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"), "n_events", "sum_value"
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # Update mode re-emits every changed window IN FULL (the aggregate
        # row is the whole partition content), so overwriting just those
        # partitions is a correct upsert.
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(out_path)
        )

    with bounded_state_partitions(stream.sparkSession):
        q = (
            agg.writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_rollup(spark: SparkSession, out_path: str) -> DataFrame:
    """The materialized rollup as a plain table (partition-prunable on
    window_start)."""
    return spark.read.parquet(out_path)
