"""Vector similarity search over embedding columns.

SURVEY.md §2 B33 (north-star mandated). The embedding column is a stock
``array<float>`` (fixtures: embeddings.embedding, 64-dim).

Two tiers, as the north star demands:
- brute-force exact cosine top-k — the correctness baseline. All math is
  builtin higher-order functions (zip_with/aggregate) in double precision,
  JVM-side, whole-stage-codegen'd; top-k is TakeOrdered (no global sort).
  At scale this is a single map + O(k) reduce: fine for one query vector
  over any corpus size, since the scan is embarrassingly parallel.
- LSH-bucketed (random hyperplane signs → Hamming buckets) — the 100 TB
  *pairwise* / multi-query path: candidates share a bucket, so the join is
  equi on bucket id instead of cross. Exact re-scoring on candidates only.
  An IVF variant (k-means coarse centroids) would slot in the same shape;
  random-hyperplane LSH is chosen because it needs no training pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "cosine_neardup_pairs",
    "hyperplane_signature",
    "lsh_topk",
]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in double. Left-to-right
    fold → deterministic, order-stable (matches any sequential oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """B33 baseline — exact brute-force cosine top-k for one query vector.

    The query vector is inlined as an array literal (broadcast by value);
    the scan computes cosine per row and TakeOrdered keeps k. Rounded to 4
    decimals for cross-engine comparability; ordering uses the unrounded
    score with id tiebreak for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("_cos"),
    )
    return (
        scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.round("_cos", 4).alias("cos_sim"))
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """B33/north-star — embedding-cosine near-duplicate pairs.

    Candidate generation is an equi-join on a blocking key — never a cross
    join: either a caller-supplied ``block_col`` (e.g. a cluster/label/
    partition id) or, for unblocked corpora, the random-hyperplane LSH
    signature from ``planes`` (pairs within a bucket share all sign bits;
    raise recall by passing several independent plane sets and unioning).
    Exact cosine re-scores candidates; only pairs >= threshold survive.

    At 100 TB: precompute the signature as a stored column partitioned by
    its prefix, so the self-join is co-partitioned and shuffle-free.
    """
    if block_col is not None:
        blk = F.col(block_col)
    elif planes is not None:
        blk = hyperplane_signature(F.col(vec_col), planes)
    else:
        raise ValueError("pass block_col or planes — unblocked pairwise "
                         "cosine is a cross join and does not scale")
    # Pre-normalize each vector ONCE per row so a candidate pair costs one
    # dot product instead of dot + two norms (3× fewer per-pair array
    # traversals; per-pair work dominates since candidates >> rows).
    norm = l2_norm(F.col(vec_col))
    blocked = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / norm
        ).alias("v"),
        blk.alias("blk"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = a.join(
        b,
        on=[F.col("a.blk") == F.col("b.blk"), F.col("a.id") < F.col("b.id")],
    )
    scored = cand.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        dot(F.col("a.v"), F.col("b.v")).alias("_cos"),
    )
    return scored.filter(F.col("_cos") >= threshold).select(
        "id_a", "id_b", F.round("_cos", 4).alias("cos_sim")
    )


def hyperplane_signature(
    vec_col: Column, planes: Sequence[Sequence[float]]
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(dot(v, plane_i)),
    packed into a bigint. Deterministic given the plane set (callers derive
    planes from a seeded RNG driver-side)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        sig = sig.bitwiseOR(
            F.when(dot(vec_col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    return sig


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_hamming: int = 2,
) -> DataFrame:
    """B33 scale path — approximate top-k: prefilter to vectors whose
    hyperplane signature is within ``max_hamming`` bits of the query's,
    then exact cosine + TakeOrdered on the survivors.

    On a 100 TB corpus the signature (8 bytes) would be precomputed and
    stored partitioned by signature prefix, turning the prefilter into
    partition pruning; here it is computed in the same scan.
    """
    sig = hyperplane_signature(F.col(vec_col), planes)
    # Query signature folded constant: compute driver-side with the same math.
    qsig = 0
    for i, p in enumerate(planes):
        s = sum(float(x) * float(y) for x, y in zip(query_vec, p))
        if s > 0:
            qsig |= 1 << i
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.select(F.col(id_col), F.col(vec_col), sig.alias("_sig")).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    scored = cand.select(F.col(id_col), cosine(F.col(vec_col), q).alias("_cos"))
    return (
        scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.round("_cos", 4).alias("cos_sim"))
    )
