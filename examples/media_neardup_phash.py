"""Runnable demo: media near-dup with a caller-supplied perceptual hash.

The engine's media near-duplicate join (`multimodal.media_neardup_candidates`)
is fingerprint-agnostic: by default it uses an md5-derived 60-bit stand-in
(no locality — only byte-identical payloads pair), but any 60-bit
locality-preserving hash drops into the `fingerprint_col` slot and the
bucketed block-permutation Hamming join is unchanged. This demo shows the
contract with a deterministic toy "perceptual" hash computed IN Spark from
payload bytes (a real deployment would compute DCT pHash / chromaprint in
a codec UDF upstream — same column, same join).

Run: python examples/media_neardup_phash.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import multimodal
from ddataframeoperation_spark.session import get_spark


def toy_phash(payload_col: str = "payload"):
    """Stand-in perceptual hash: 60 bits, bit b = "sampled byte above
    mid-intensity" at 60 evenly-strided offsets — so corrupting a few
    bytes flips at most a few BITS, while different content flips many.
    That locality property is what a real pHash has and md5 lacks. Pure
    builtins (JVM-side); a codec-backed pHash would swap in via a pandas
    UDF producing the same long column."""
    bytes_arr = F.transform(
        F.split(F.hex(F.col(payload_col)), "(?<=\\G..)"),
        lambda h: F.conv(h, 16, 10).cast("int"),
    )
    stride = F.greatest(
        F.lit(1), (F.octet_length(F.col(payload_col)) / 60).cast("int")
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda b: F.when(
            F.coalesce(
                F.element_at(bytes_arr, b * stride + 1), F.lit(0)
            ) > 127,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long"),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, bit: acc * 2 + bit
    )


def main() -> None:
    spark = get_spark("media-phash-demo")
    base = bytes(range(200)) * 3
    nearly = bytearray(base)
    nearly[20] ^= 0xFF  # one corrupted byte — a re-encode artifact
    rows = [
        (1, bytes(base)),
        (2, bytes(nearly)),          # near-dup of 1
        (3, bytes(reversed(base))),  # different content
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    print("== md5 stand-in (exact replicas only) ==")
    for r in multimodal.media_neardup_candidates(df, max_bucket=None).collect():
        print(r)

    print("== caller-supplied perceptual hash (near-dups pair) ==")
    fp = df.withColumn("phash", toy_phash())
    out = multimodal.media_neardup_candidates(
        fp, max_bucket=None, fingerprint_col="phash", max_hamming=4
    )
    for r in out.collect():
        print(r)

    spark.stop()


if __name__ == "__main__":
    main()
