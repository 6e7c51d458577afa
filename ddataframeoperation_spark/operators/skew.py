"""Skew- and layout-management operators — the 100 TB toolkit.

SURVEY.md §4 scale posture: AQE handles moderate skew at runtime
(``spark.sql.adaptive.skewJoin``), but pathological hot keys in
aggregations and joins need explicit salting, and repeated big-big joins
on the same key deserve a bucketed layout so the shuffle happens once at
write time instead of per query. The reference has no notion of any of
this (single R process); these operators are pure engine surface.

- :func:`salted_group_agg` — two-phase aggregation for hot grouping keys:
  shuffle on (key, salt) first so no single reducer owns a hot key, then
  combine the per-salt partials. Works for any algebraic aggregate given
  its (partial, merge) pair; results are bit-identical to a plain groupBy.
- :func:`salted_join` — replicate the small side per salt value so a hot
  join key's rows spread over ``salt_buckets`` tasks.
- :func:`write_bucketed` / :func:`bucketed_table` — persist a DataFrame
  bucketed+sorted by the join key; two tables bucketed the same way
  equi-join with zero Exchange (verified in tests by plan inspection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "with_salt",
    "salted_group_agg",
    "salted_join",
    "write_bucketed",
    "bucketed_table",
    "write_partitioned",
    "merge_upsert",
    "compact",
]


def with_salt(df: DataFrame, buckets: int, name: str = "_salt") -> DataFrame:
    """Add a uniform salt column in [0, buckets). Derived from a hash of
    the whole row rather than rand() so replays are deterministic."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    return df.withColumn(name, salt.cast("int"))


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: Sequence[Column],
    finals: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed grouping keys.

    ``partials`` aggregate within (keys, salt) — e.g. ``F.sum("x").alias
    ("sum_x")``, ``F.count("*").alias("cnt")``; ``finals`` combine the
    partials per key — e.g. ``F.sum("sum_x").alias("sum_x")``,
    ``F.sum("cnt").alias("cnt")``. The first shuffle spreads a hot key
    over ``salt_buckets`` reducers; the second shuffle moves only
    ``|keys| × salt_buckets`` pre-aggregated rows.
    """
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side
    once per salt value, join on (key, salt). Use when one join key owns a
    disproportionate share of the big side and AQE's skew splitting is not
    enough (e.g. the hot key exceeds a single executor's memory). The small
    side grows ×``salt_buckets`` — keep it genuinely small."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int")
    )
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = big_s.join(
        small_r,
        on=[big_s[big_key] == small_r[small_key], big_s["_salt"] == small_r["_salt"]],
        how=how,
    )
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_cols`` between tables bucketed the same
    way need no Exchange — the write pays the shuffle once. This is the
    layout move for fact tables that are repeatedly joined on one key at
    100 TB."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Hive-style partitioned layout (``path/col=value/...``). Filters on
    ``partition_cols`` become directory pruning — at 100 TB a date filter
    on date-partitioned events skips whole directories without opening a
    footer. Partition columns must be low-cardinality (date, region, type);
    a high-cardinality partition column creates a small-files problem
    instead. Pruning is asserted in tests via ``PartitionFilters`` in the
    scan node."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """MERGE-style upsert onto a plain parquet table: rows in ``updates``
    replace target rows with the same key; new keys append.

    Implementation: anti-join the target against the update keys (keep
    unaffected rows), union the updates, rewrite. On plain parquet this
    rewrites the table (the write is staged to a temp dir first, so a
    mid-rewrite failure never destroys the target); a table format with
    transaction support (Delta/Iceberg) turns the same logical MERGE into
    a metadata operation — this operator is the format-independent
    fallback and the semantic contract.

    At 100 TB: partition the target (write_partitioned) and call this per
    affected partition — the update key set prunes the rewrite.
    """
    from pyspark.sql import functions as SF

    target = spark.read.format(fmt).load(target_path)
    kept = target.join(
        updates.select(*key_cols).distinct(), on=list(key_cols), how="left_anti"
    )
    merged = kept.unionByName(updates)
    staging = target_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").format(fmt).save(staging)
    # Atomic-ish swap via filesystem rename (same Hadoop FS both sides).
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(target_path)
    src = jvm.org.apache.hadoop.fs.Path(staging)
    fs = dst.getFileSystem(conf)
    fs.delete(dst, True)
    fs.rename(src, dst)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    fmt: str = "parquet",
) -> None:
    """Small-files compaction: rewrite a table directory into
    ``target_files`` files. Streaming sinks and per-batch upserts
    accumulate small files; periodic compaction restores scan efficiency
    (fewer tasks, better columnar compression). Same staged-rewrite safety
    as :func:`merge_upsert`."""
    df = spark.read.format(fmt).load(path).coalesce(target_files)
    staging = path.rstrip("/") + "__staging"
    df.write.mode("overwrite").format(fmt).save(staging)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(path)
    src = jvm.org.apache.hadoop.fs.Path(staging)
    fs = dst.getFileSystem(conf)
    fs.delete(dst, True)
    fs.rename(src, dst)
