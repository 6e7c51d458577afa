"""Connected-components clustering and cluster dedup tests."""

from __future__ import annotations

from ddataframeoperation_spark.operators import dedup


def test_connected_components_chain_and_islands(spark):
    # Components: {1,2,3,4} (chain), {10,11} (pair); 99 untouched (no edges).
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_dedup_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 10, 11, 99)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup.cluster_dedup(docs, pairs).collect())
    # One per cluster (lowest id) + the unpaired doc.
    assert kept == [1, 10, 99]


def test_full_neardup_pipeline(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + "!"),
            (3, base.upper()),
            (4, "an entirely different document about query engines and joins"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_candidates(docs)
    out = sorted(r["doc_id"] for r in dedup.cluster_dedup(docs, pairs).collect())
    assert out == [1, 4]
