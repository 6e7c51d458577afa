"""IVF ANN (B33 scale path) and winnowing fingerprint (B34) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import similarity, text as TX


def _emb(spark, sf_dir):
    return read_fixture_table(spark, sf_dir, "embeddings")


def _query_vec(emb):
    return emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]


def test_ivf_full_probe_equals_exact_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = _query_vec(emb)
    cents = similarity.kmeans_centroids(emb, k=4, iters=3)
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    ivf = similarity.ivf_topk(emb, q, cents, k=10, nprobe=len(cents)).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in ivf] == [
        (r["vec_id"], r["cos_sim"]) for r in exact
    ]


def test_ivf_partial_probe_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = _query_vec(emb)
    cents = similarity.kmeans_centroids(emb, k=4, iters=3)
    exact_ids = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    ivf_ids = {
        r["vec_id"]
        for r in similarity.ivf_topk(emb, q, cents, k=10, nprobe=2).collect()
    }
    # Probing half the cells must keep most of the true neighborhood —
    # the query vector's own cell is always ranked first.
    assert len(ivf_ids & exact_ids) >= 6
    assert 0 in ivf_ids  # the query vector itself can never be pruned


def test_centroid_assign_column_matches_arrow_kernel(spark, sf_dir):
    emb = _emb(spark, sf_dir).limit(64)
    cents = similarity.kmeans_centroids(emb, k=3, iters=2)
    arrow = similarity.ivf_assign(emb, cents).select("vec_id", "ivf_cell")
    col = emb.select(
        "vec_id",
        similarity.centroid_assign(F.col("embedding"), cents).alias("ivf_cell"),
    )
    a = {r["vec_id"]: r["ivf_cell"] for r in arrow.collect()}
    b = {r["vec_id"]: r["ivf_cell"] for r in col.collect()}
    assert a == b


def test_kmeans_centroids_deterministic_and_unit_norm(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    c1 = similarity.kmeans_centroids(emb, k=4, iters=3)
    c2 = similarity.kmeans_centroids(emb, k=4, iters=3)
    assert c1 == c2
    for c in c1:
        n = sum(v * v for v in c) ** 0.5
        assert abs(n - 1.0) < 1e-9


def _fp_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE QUICK BROWN FOX jumps over the lazy dog today"),  # long shared run
        (3, "completely different words appear in this sentence"),
        (4, ""),  # empty -> no fingerprints
        (5, "abc"),  # shorter than k -> no fingerprints
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_shared_substring_shares_fingerprint(spark):
    # Winnowing guarantee: any match of length >= k+window-1 chars shares
    # at least one fingerprint. Docs 1/2 share a 30+ char normalized run.
    d = TX.winnow_fingerprints(_fp_docs(spark), k=5, window=4)
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in d.collect()}
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])
    assert fps[4] == set()
    assert fps[5] == set()


def test_winnow_fingerprints_sorted_distinct(spark):
    d = TX.winnow_fingerprints(_fp_docs(spark), k=5, window=4)
    for r in d.collect():
        fp = list(r["fingerprints"])
        assert fp == sorted(set(fp))


def test_fingerprint_overlap_pairs_orders_ids(spark):
    pairs = TX.fingerprint_overlap_pairs(
        _fp_docs(spark), k=5, window=4, min_shared=1
    ).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_kgram_hashes_matches_polynomial():
    import numpy as np

    codes = np.frombuffer(b"abcdef", dtype=np.uint8)
    hs = TX.kgram_hashes(codes, k=3)
    mod, base = 2147483647, 31
    expect = [
        (codes[i] * base**2 + codes[i + 1] * base + codes[i + 2]) % mod
        for i in range(4)
    ]
    assert hs.tolist() == expect
    assert TX.kgram_hashes(np.array([1, 2], dtype=np.int64), k=3).size == 0


# ------------------------------------------------------- product quantization


def test_pq_full_shortlist_equals_exact_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = _query_vec(emb)
    books = similarity.pq_train(emb, m=8, ksub=16, iters=3)
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    pq = similarity.pq_topk(emb, q, books, k=10, shortlist=None).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in pq] == [
        (r["vec_id"], r["cos_sim"]) for r in exact
    ]


def test_pq_small_shortlist_recall(spark, sf_dir):
    # The ADC scan with a 40-of-500 shortlist must keep most of the true
    # top-10 — this is the approximate mode the registered query's exact
    # gate can't see.
    emb = _emb(spark, sf_dir)
    q = _query_vec(emb)
    books = similarity.pq_train(emb, m=8, ksub=16, iters=5)
    exact_ids = {
        r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    pq_ids = {
        r["vec_id"]
        for r in similarity.pq_topk(emb, q, books, k=10, shortlist=40).collect()
    }
    assert len(pq_ids & exact_ids) >= 6
    # Re-rank is exact cosine, so the query vector itself always wins.
    assert 0 in pq_ids


def test_pq_train_deterministic_and_shaped(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    b1 = similarity.pq_train(emb, m=4, ksub=8, iters=2)
    b2 = similarity.pq_train(emb, m=4, ksub=8, iters=2)
    assert b1 == b2
    assert len(b1) == 4 and len(b1[0]) == 8 and len(b1[0][0]) == 16


def test_pq_train_rejects_indivisible_dim(spark, sf_dir):
    import pytest

    emb = _emb(spark, sf_dir)
    with pytest.raises(ValueError):
        similarity.pq_train(emb, m=7)


def test_pq_encode_codes_in_range(spark, sf_dir):
    emb = _emb(spark, sf_dir).limit(32)
    books = similarity.pq_train(emb, m=8, ksub=16, iters=2, sample_n=32)
    rows = similarity.pq_encode(emb, books).collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["pq_code"]) == 8
        assert all(0 <= c < 16 for c in r["pq_code"])


# ------------------------------------------------------------- semantic join


def test_semantic_join_full_probe_is_exact(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    l = emb.filter(F.col("vec_id") < 100)
    r = emb.filter(F.col("vec_id") >= 100)
    cents = similarity.kmeans_centroids(emb, k=4, iters=3)
    got = {
        row["l_vec_id"]: row["r_vec_id"]
        for row in similarity.semantic_join(l, r, cents, nprobe=None).collect()
    }
    # Brute-force expectation via cosine_topk_multi with k=1.
    q = l.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        row["query_id"]: row["vec_id"]
        for row in similarity.cosine_topk_multi(r, q, k=1).collect()
    }
    assert got == exact
    assert len(got) == 100


def test_semantic_join_partial_probe_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    l = emb.filter(F.col("vec_id") < 100)
    r = emb.filter(F.col("vec_id") >= 100)
    cents = similarity.kmeans_centroids(emb, k=8, iters=5)
    exact = {
        row["l_vec_id"]: row["r_vec_id"]
        for row in similarity.semantic_join(l, r, cents, nprobe=None).collect()
    }
    approx = {
        row["l_vec_id"]: row["r_vec_id"]
        for row in similarity.semantic_join(l, r, cents, nprobe=3).collect()
    }
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    # Probing 3 of 8 cells keeps the true match for most rows.
    assert hits >= 70


def test_semantic_join_no_cartesian_in_partial_mode(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = similarity.kmeans_centroids(emb, k=4, iters=2)
    p = str(
        similarity.semantic_join(emb, emb, cents, nprobe=1)
        ._jdf.queryExecution()
        .executedPlan()
    )
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p


def test_semantic_join_rejects_bad_nprobe(spark, sf_dir):
    import pytest

    emb = _emb(spark, sf_dir)
    cents = similarity.kmeans_centroids(emb, k=4, iters=2)
    with pytest.raises(ValueError):
        similarity.semantic_join(emb, emb, cents, nprobe=0)
