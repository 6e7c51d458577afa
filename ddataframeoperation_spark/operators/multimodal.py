"""Multimodal (image/audio/video) column plumbing.

SURVEY.md north-star item: treat media as opaque ``binary`` columns with
typed metadata; decode/feature-extract/resize/frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas``. The container has no media
libraries, so the decode kernels are deterministic fakes / clearly-marked
stubs — the Spark-side plumbing (schema, batch shape, partitioning,
UDF signature) is real and tested, which is the part that matters for the
engine.

Scale notes (100 TB of media):
- binary payloads ride in parquet; metadata columns (format, width, ...)
  are scalar so filters on them prune row groups *without touching bytes*;
- ``mapInPandas`` streams Arrow record batches — peak memory is one batch,
  not one partition; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- decode is per-row independent → embarrassingly parallel, no shuffle;
- decode PARALLELISM equals the scan's split count (``mapInPandas``
  inherits upstream partitioning — there is no group key to repartition
  on, and shuffling binary payloads just to raise local parallelism is
  the wrong trade). At 100 TB thousands of file splits saturate any
  cluster; for a small-file corpus on a big machine, lower
  ``spark.sql.files.maxPartitionBytes`` so the scan itself yields more
  splits — contrast with the GROUPED-map operators, which repartition on
  their group keys (`script.grouped_map_parallelism`) because AQE would
  otherwise coalesce their exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "media_stats",
    "decode_image_batch",
    "extract_image_features",
    "resize_images",
    "sample_video_frames",
    "read_binary_files",
    "media_fingerprint",
    "media_neardup_candidates",
]

#: Canonical media-column bundle: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),      # png|jpg|wav|mp4...
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),    # md5 of payload
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image", fmt: str = "bin"
) -> DataFrame:
    """Derive the typed metadata columns from a raw binary payload column —
    pure builtins (octet_length/md5 are JVM-side, no UDF)."""
    return (
        df.withColumn("media_type", F.lit(media_type))
        .withColumn("format", F.lit(fmt))
        .withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("long"))
        .withColumn("checksum", F.md5(F.col(payload_col)))
    )


def media_stats(df: DataFrame, group_col: str = "media_type") -> DataFrame:
    """Per-type payload stats — metadata-only scan (payload column pruned)."""
    return df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        F.countDistinct("checksum").cast("long").alias("distinct_payloads"),
    )


#: Output schema of the decode step.
DECODED_SCHEMA = "media_id bigint, width int, height int, n_pixels bigint"


def decode_image_batch(df: DataFrame) -> DataFrame:
    """Decode stub over ``mapInPandas``: real Arrow plumbing, fake kernel.

    A real deployment drops PIL/ffmpeg into ``_decode_one`` unchanged —
    batch iteration, schema declaration, and column pruning stay identical.
    """
    import pandas as pd  # local import: executors need it, driver may not

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            # STUB: deterministic fake decode — derive dims from payload
            # length. Replace with e.g. PIL.Image.open(io.BytesIO(b)).
            sizes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            out["width"] = (sizes % 640 + 1).astype("int32")
            out["height"] = (sizes % 480 + 1).astype("int32")
            out["n_pixels"] = (out["width"].astype("int64") * out["height"]).astype(
                "int64"
            )
            yield out

    return df.select("media_id", "payload").mapInPandas(_decode, DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stub over ``mapInPandas``: payload in → resized payload +
    target dims out. The kernel is a clearly-marked stub (no PIL in this
    container) that passes bytes through; a real deployment replaces ONLY
    the inner function — schema, Arrow batching, and partitioning stay.
    """
    import pandas as pd

    schema = "media_id bigint, payload binary, width int, height int"

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            # STUB: real kernel = PIL resize; plumbing identical.
            out["payload"] = pdf["payload"]
            out["width"] = width
            out["height"] = height
            yield out

    return df.select("media_id", "payload").mapInPandas(_resize, schema)


def sample_video_frames(df: DataFrame, every_nth: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub: one input row (video payload) → up to
    ``max_frames`` output rows (frame payloads) — the 1:N explode shape of
    real frame extraction, with a deterministic fake splitter standing in
    for ffmpeg. Output rows stay on the executor that held the input row
    (no shuffle); downstream per-frame ops parallelize naturally."""
    import pandas as pd

    schema = "media_id bigint, frame_no int, frame binary"

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                # STUB: treat every `every_nth` byte offset as a "frame";
                # real kernel = ffmpeg keyframe extraction.
                n = min(max_frames, max(1, len(b) // every_nth))
                step = max(1, len(b) // n)
                for i in range(n):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(bytes(b[i * step : (i + 1) * step]))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.select("media_id", "payload").mapInPandas(_sample, schema)


def extract_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stub: payload → fixed-dim float vector
    (deterministic fake: byte histogram folded to ``dim``). The real model
    inference would run here with identical plumbing (Arrow batches in,
    ``array<float>`` out)."""
    import numpy as np
    import pandas as pd

    schema = f"media_id bigint, feature array<float>"

    def _feat(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    feats.append([0.0] * dim)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "payload").mapInPandas(_feat, schema)


def read_binary_files(
    spark, path: str, glob: str | None = None, with_digest: bool = True
) -> DataFrame:
    """North-star ingestion — raw media files → binary column via Spark's
    builtin ``binaryFile`` source: one row per file with (path, length,
    modificationTime, content). This is the front door of the multimodal
    pipeline: files land as opaque bytes + scalar metadata, and every
    downstream kernel (:func:`attach_media_metadata`, decode/resize/
    frame-sample) operates on the resulting column — no driver-side file
    handling, reads are distributed and split across executors per file.
    ``glob`` filters file names via the source's ``pathGlobFilter``
    option (applied during listing — unmatched files are never opened).

    Emits (file_name, n_bytes, content, content_md5?). The digest is
    ``md5(hex(content))`` — both Spark and DuckDB render ``hex`` of bytes
    as uppercase, so the digest is exactly reproducible cross-engine
    (``md5(content)`` directly is not portable: DuckDB's md5 only takes
    VARCHAR). At 100 TB, set ``spark.sql.files.maxPartitionBytes`` /
    ``pathGlobFilter`` as needed; files larger than ~2 GB need a chunked
    source instead (binaryFile materializes one file per row).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    d = reader.load(path)
    out = d.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )
    if with_digest:
        out = out.withColumn("content_md5", F.md5(F.hex(F.col("content"))))
    return out


def media_fingerprint(payload_col: str = "payload", bits: int = 60):
    """60-bit payload fingerprint column: the first 15 hex chars of
    md5(hex(payload)) as a BIGINT. 15 hex digits keep the value under
    2^60, inside signed-long range on every engine (16 would overflow),
    and the md5(hex(...)) form is byte-exactly reproducible in DuckDB
    (``('0x' || substring(md5(hex(content)), 1, 15))::BIGINT``).

    Honesty note (same contract as the stub codecs): an md5-derived
    fingerprint has NO locality — only byte-identical payloads collide,
    so Hamming distance between different payloads is ~uniform. It stands
    in for a real perceptual hash (DCT pHash / chromaprint), which drops
    into the same column and the same downstream Hamming join once a
    codec is available; what is real and tested here is the typed-column
    plumbing and the bucketed join math.
    """
    if bits != 60:
        raise ValueError("md5-prefix fingerprint is fixed at 60 bits")
    return F.conv(
        F.substring(F.md5(F.hex(F.col(payload_col))), 1, 15), 16, 10
    ).cast("long")


def media_neardup_candidates(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    max_bucket: int | None = 64,
    fingerprint_col: str | Column | None = None,
) -> DataFrame:
    """North-star — media near-duplicate candidates: fingerprint each
    payload (:func:`media_fingerprint`), then the SAME generic
    block-permutation Hamming join the text pipeline uses
    (``dedup.hamming_candidates``) — 60-bit hashes split into 4×15-bit
    chunks, candidates equi-join per chunk, exact Hamming filter last.
    Never a cross join; hot-bucket behavior (cap + star linkage) is
    inherited.

    ``fingerprint_col`` is the perceptual-hash slot (VERDICT r5 #7): pass
    a column (name or expression) holding a caller-computed 60-bit hash —
    e.g. a DCT pHash / chromaprint produced by a real codec upstream —
    and it replaces the md5 stand-in end-to-end; the bucketed Hamming
    join is hash-agnostic (values must fit in a signed 64-bit long with
    at most ``bits``=60 significant bits). With the md5 stand-in only
    exact-duplicate payloads reach Hamming 0; a locality-preserving hash
    upgrades recall without touching the join (contract exercised with a
    non-md5 fingerprint in tests/test_text_multimodal.py and
    examples/media_neardup_phash.py)."""
    from ddataframeoperation_spark.operators.dedup import hamming_candidates

    if fingerprint_col is None:
        fp = media_fingerprint(payload_col)
    elif isinstance(fingerprint_col, str):
        # Fail loudly on a non-integral fingerprint column: a silent
        # cast('long') would turn a hex-STRING phash (or a decimal/double)
        # into NULLs under non-ANSI mode, and NULL hashes match no bucket —
        # the rows would vanish from the candidate set looking like
        # "no near-dups" instead of a type error.
        ftype = df.schema[fingerprint_col].dataType
        if not isinstance(
            ftype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise TypeError(
                f"fingerprint_col {fingerprint_col!r} must be an integral "
                f"type (<=60 significant bits), got {ftype.simpleString()} "
                f"— hex strings: conv(substring(h, 1, 15), 16, 10)"
            )
        fp = F.col(fingerprint_col)
    else:
        fp = fingerprint_col
    sh = df.select(
        F.col(id_col).alias("id"),
        fp.cast("long").alias("sh"),
    )
    return hamming_candidates(
        sh,
        max_hamming=max_hamming,
        blocks=4,
        max_bucket=max_bucket,
        bits=60,
    )
