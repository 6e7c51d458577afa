"""Streaming dedup ingest — the production arrival path of the corpus.

Batch dedup (operators/dedup.py) answers "clean THIS corpus"; this module
answers "keep the corpus clean as documents ARRIVE": every micro-batch is
fingerprinted, deduplicated within itself, anti-joined against the
persisted corpus fingerprint index, and only the survivors are appended —
to the corpus AND to the index. The index is the same 16-byte-per-doc
artifact `dedup_increment` consumes, so batch backfills and the streaming
path share one source of truth.

Scale notes:
- the per-batch anti-join touches the INDEX (fingerprints only), never
  historical document bodies — steady-state cost tracks arrival rate plus
  an index probe;
- exactly-once: source offsets live in the streaming checkpoint. A
  replayed batch re-appends its files, so the parquet append itself is
  at-least-once — the fingerprint index still suppresses re-arrivals in
  every LATER batch, and readers dedup residual replays by fingerprint
  (the documented contract of at-least-once sinks without a transactional
  table format; with Delta/Iceberg the append becomes a MERGE and the
  contract upgrades to exactly-once);
- within-batch dedup is keep-lowest-id (deterministic), matching
  `dedup_increment`.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ddataframeoperation_spark.operators.dedup import dedup_by_fingerprint
from ddataframeoperation_spark.streaming.windows import (
    bounded_state_partitions,
)

__all__ = ["stream_dedup_ingest", "read_corpus"]


def stream_dedup_ingest(
    stream: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Run an availableNow pass appending only fingerprint-new documents
    under ``corpus_path`` (``docs/`` + ``fps/`` parquet). Re-invoking with
    the same checkpoint resumes incrementally — already-committed source
    files are not reprocessed; re-sent duplicates of already-ingested
    docs are dropped by the index probe.

    While this call blocks it holds ``bounded_state_partitions``: the
    session-global ``spark.sql.shuffle.partitions`` is temporarily
    lowered (never raised), so a concurrent batch query planned on the
    SAME session from another thread would silently plan with the
    lowered partition count. Don't share the session across threads for
    the duration of the run."""
    docs_path = f"{corpus_path}/docs"
    fps_path = f"{corpus_path}/fps"
    spark = stream.sparkSession

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        # The batch dedup operator itself (same keep-lowest-id semantics
        # the module promises), with text NULL-coalesced to '' so a
        # NULL-text doc gets the EMPTY fingerprint rather than a NULL fp —
        # a NULL fp never matches the left_anti probe (NULL != NULL), so
        # one NULL-text doc would otherwise re-ingest every batch.
        fresh = dedup_by_fingerprint(
            batch_df, F.coalesce(F.col(text_col), F.lit("")), id_col
        )
        try:
            # Existence probe via the read itself — os.path only sees the
            # local filesystem and would silently disable cross-batch
            # dedup for an HDFS/S3 corpus_path.
            index = spark.read.parquet(fps_path).select("fp").distinct()
            fresh = fresh.join(index, "fp", "left_anti")
        except AnalysisException:
            pass  # first batch: no index yet
        # Materialize once: the two appends below must see the SAME
        # survivor set even though the anti-join's index snapshot changes
        # as soon as the first append lands.
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop("fp").write.mode("append").parquet(docs_path)
        fresh.select("fp", id_col).write.mode("append").parquet(fps_path)

    with bounded_state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The deduplicated corpus as a plain table."""
    return spark.read.parquet(f"{corpus_path}/docs")
