"""Deterministic hash-based sampling (B22 reproducible form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import sampling


def test_hash_split_disjoint_exhaustive(spark, sf_dir):
    c = read_fixture_table(spark, sf_dir, "customer")
    parts = sampling.hash_split(c, [0.8, 0.1, 0.1], ["c_custkey"], salt="t")
    n = c.count()
    ns = [p.count() for p in parts]
    assert sum(ns) == n  # exhaustive
    # pairwise disjoint
    for i in range(3):
        for j in range(i + 1, 3):
            assert parts[i].join(parts[j], "c_custkey").count() == 0
    # fractions within a loose band (n=150 at sf0.001)
    assert ns[0] > 0.6 * n and ns[1] < 0.25 * n and ns[2] < 0.25 * n


def test_hash_sample_partitioning_invariant(spark, sf_dir):
    # THE property seeded randomSplit lacks: membership survives any
    # repartitioning of the input.
    c = read_fixture_table(spark, sf_dir, "customer")
    a = set(
        r["c_custkey"]
        for r in sampling.hash_sample(c, 0.3, ["c_custkey"], "s").collect()
    )
    b = set(
        r["c_custkey"]
        for r in sampling.hash_sample(
            c.repartition(7, "c_nationkey"), 0.3, ["c_custkey"], "s"
        ).collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_salt_independence(spark, sf_dir):
    c = read_fixture_table(spark, sf_dir, "customer")
    a = set(r["c_custkey"] for r in sampling.hash_sample(c, 0.5, ["c_custkey"], "s1").collect())
    b = set(r["c_custkey"] for r in sampling.hash_sample(c, 0.5, ["c_custkey"], "s2").collect())
    assert a != b  # different salt -> different draw (overwhelmingly likely)


def test_source_mix_fractions(spark, sf_dir):
    d = read_fixture_table(spark, sf_dir, "documents")
    out = sampling.source_mix(
        d, {"src0": 1.0, "src1": 0.0}, source_col="source", keys=["doc_id"]
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    # src0 fully kept, src1 and unlisted sources fully dropped
    assert got == {"src0"}
    n_src0 = d.filter(F.col("source") == "src0").count()
    assert out.count() == n_src0


def test_hash_uniform_null_key_drops_row(spark):
    # NULL key -> NULL uniform -> row fails every threshold comparison,
    # matching the DuckDB oracle's null-propagating concat expression.
    df = spark.createDataFrame([(1,), (None,)], "k long")
    kept = sampling.hash_sample(df, 1.0, ["k"], "s").collect()
    assert [r["k"] for r in kept] == [1]


def test_leakage_safe_split_colocates_near_dups(spark):
    from ddataframeoperation_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # 0-1-2 form one near-dup cluster (chained pairs), 10-11 another.
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    for salt in ("a", "b"):
        out = {
            r["doc_id"]: (r["split_key"], r["split"])
            for r in sampling.leakage_safe_split(
                docs, pairs, [0.8, 0.1, 0.1], ["train", "val", "test"],
                salt=salt,
            ).collect()
        }
        assert len(out) == 40  # every doc assigned, singletons included
        # cluster members share the representative key AND the split
        assert out[0] == out[1] == out[2] == (0, out[0][1])
        assert out[10] == out[11] == (10, out[10][1])
        # singletons key on their own id
        assert out[39][0] == 39


def test_leakage_safe_split_drops_null_ids(spark):
    # Same NULL contract as hash_split/hash_uniform: a NULL id cannot be
    # hashed, so the row is dropped — not silently filed under the last
    # label by the otherwise() branch.
    docs = spark.createDataFrame(
        [(1, "x"), (None, "y")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = sampling.leakage_safe_split(
        docs, pairs, [0.5, 0.5], ["train", "test"]
    ).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_cap_per_source_quota_and_determinism(spark):
    rows = [(i, f"s{i % 2}", 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sampling.cap_per_source(
        df, 3, source_col="source", order_by=[F.col("n_chars").desc()]
    )
    got = sorted((r["source"], r["doc_id"]) for r in out.collect())
    # per source: keep the 3 longest (lowest doc_id = highest n_chars here)
    assert got == [("s0", 0), ("s0", 2), ("s0", 4), ("s1", 1), ("s1", 3), ("s1", 5)]


def test_token_budget_mix_hard_cap_and_prefix(spark, sf_dir):
    # Per-source token sums never exceed the budget, the kept set is the
    # PREFIX of the hash order (every kept doc's uniform sorts before
    # every dropped doc's, per source, up to the boundary-crossing drop),
    # and the op is deterministic.
    d = read_fixture_table(spark, sf_dir, "documents")
    out = sampling.token_budget_mix(d, 700, salt="t")
    from ddataframeoperation_spark.operators.text import token_count

    sums = (
        out.groupBy("source")
        .agg(F.sum(token_count("text")).alias("tok"))
        .collect()
    )
    assert sums and all(r["tok"] <= 700 for r in sums)
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.token_budget_mix(d, 700, salt="t").select("doc_id").collect()
    )
    assert ids1 == ids2 and ids1  # deterministic, non-empty


def test_token_budget_mix_bucketed_equals_single_window(spark, sf_dir):
    # The skew-proof two-level prefix-sum plan must keep EXACTLY the rows
    # a naive single per-source window would — across bucket counts, so
    # u-range boundary edges are exercised.
    from pyspark.sql import Window

    d = read_fixture_table(spark, sf_dir, "documents")
    from ddataframeoperation_spark.operators.text import token_count

    naive = (
        d.withColumn("_ntok", token_count("text").cast("long"))
        .withColumn("_u", sampling.hash_uniform(["doc_id"], "t"))
        .withColumn(
            "_cum",
            F.sum("_ntok").over(
                Window.partitionBy("source")
                .orderBy(F.col("_u").asc(), F.col("doc_id").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("_cum") <= 500)
    )
    want = sorted(r["doc_id"] for r in naive.select("doc_id").collect())
    for buckets in (1, 3, 256):
        got = sorted(
            r["doc_id"]
            for r in sampling.token_budget_mix(
                d, 500, salt="t", buckets=buckets
            ).select("doc_id").collect()
        )
        assert got == want, buckets


def test_token_budget_mix_dict_budgets(spark, sf_dir):
    # Dict budgets: per-source caps honored independently; sources absent
    # from the dict are dropped entirely; budget 0 keeps nothing (every
    # doc has >0 tokens).
    d = read_fixture_table(spark, sf_dir, "documents")
    out = sampling.token_budget_mix(
        d, {"src0": 400, "src1": 900, "src2": 0}, salt="t"
    )
    from ddataframeoperation_spark.operators.text import token_count

    rows = (
        out.groupBy("source")
        .agg(F.sum(token_count("text")).alias("tok"))
        .collect()
    )
    by_src = {r["source"]: r["tok"] for r in rows}
    assert set(by_src) <= {"src0", "src1"}  # src2 capped to 0, rest dropped
    assert by_src.get("src0", 0) <= 400 and by_src.get("src1", 0) <= 900
    assert by_src.get("src0", 0) > 0 and by_src.get("src1", 0) > 0


def test_token_budget_mix_rejects_negative_budgets(spark, sf_dir):
    import pytest

    d = read_fixture_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        sampling.token_budget_mix(d, -5)
    with pytest.raises(ValueError):
        sampling.token_budget_mix(d, {"src0": -5, "src1": 900})


def test_token_budget_mix_count_out(spark, sf_dir):
    # count_out exposes the already-computed token count — it must equal
    # an independent tokenization of the kept rows.
    from ddataframeoperation_spark.operators.text import token_count

    d = read_fixture_table(spark, sf_dir, "documents")
    out = sampling.token_budget_mix(d, 600, salt="t", count_out="ntok")
    mismatch = out.filter(
        F.col("ntok") != token_count("text").cast("long")
    ).count()
    assert mismatch == 0 and out.count() > 0


def test_epoch_shard_order_invariants(spark, sf_dir):
    d = read_fixture_table(spark, sf_dir, "documents")
    n = d.count()
    e1 = sampling.epoch_shard_order(d, epoch=1, n_shards=4)
    # Exhaustive + disjoint: every doc appears exactly once.
    assert e1.count() == n
    assert e1.select("doc_id").distinct().count() == n
    # Positions are contiguous 1..|shard| within each shard.
    per = e1.groupBy("shard").agg(
        F.count("*").alias("c"), F.max("position").alias("m"),
        F.min("position").alias("lo"),
    ).collect()
    assert all(r["c"] == r["m"] and r["lo"] == 1 for r in per)
    assert {r["shard"] for r in per} <= {0, 1, 2, 3}
    # Deterministic within an epoch; a different epoch reshuffles.
    a = sorted(map(tuple, e1.select("doc_id", "shard", "position").collect()))
    b = sorted(map(tuple, sampling.epoch_shard_order(d, epoch=1, n_shards=4)
                   .select("doc_id", "shard", "position").collect()))
    assert a == b
    c = sorted(map(tuple, sampling.epoch_shard_order(d, epoch=2, n_shards=4)
                   .select("doc_id", "shard", "position").collect()))
    assert a != c
