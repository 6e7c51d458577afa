"""Relational-core invariants (SURVEY.md §5.4 property checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import relational as R


def test_filter_partitions_table(spark, sf_dir):
    """filter(p) + filter(!p) partitions the table (no rows lost/duplicated)."""
    o = read_fixture_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice") > 100000
    n = o.count()
    assert R.filter_rows(o, p).count() + R.filter_rows(o, ~p).count() == n


def test_union_all_counts(spark, sf_dir):
    c = read_fixture_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0)
    b = c.filter(F.col("c_acctbal") <= 0)
    assert R.union_all(a, b).count() == a.count() + b.count()


def test_join_project_commutes(spark, sf_dir):
    """Projection pushed through a key-preserving join gives the same rows."""
    o = read_fixture_table(spark, sf_dir, "orders")
    c = read_fixture_table(spark, sf_dir, "customer")
    j1 = (
        R.join(o, c, on=F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_custkey")
        .orderBy("o_orderkey")
        .collect()
    )
    j2 = (
        R.join(
            o.select("o_orderkey", "o_custkey"),
            c.select("c_custkey"),
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_custkey")
        .orderBy("o_orderkey")
        .collect()
    )
    assert j1 == j2


def test_semi_plus_anti_partitions(spark, sf_dir):
    c = read_fixture_table(spark, sf_dir, "customer")
    o = read_fixture_table(spark, sf_dir, "orders")
    on = F.col("c_custkey") == F.col("o_custkey")
    semi = R.join(c, o, on=on, how="left_semi").count()
    anti = R.join(c, o, on=on, how="left_anti").count()
    assert semi + anti == c.count()


def test_top_k_deterministic(spark, sf_dir):
    o = read_fixture_table(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    a = R.top_k(o.select("o_orderkey", "o_totalprice"), order, 5).collect()
    b = R.top_k(o.select("o_orderkey", "o_totalprice"), order, 5).collect()
    assert a == b and len(a) == 5


def test_repartition_invariance(spark, sf_dir):
    """Single-partition vs repartitioned aggregation agree (shuffle-safety)."""
    li = read_fixture_table(spark, sf_dir, "lineitem")
    agg = lambda d: {
        (r["l_returnflag"], r["n"])
        for r in d.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert agg(li.coalesce(1)) == agg(li.repartition(16))


def test_empty_input(spark, sf_dir):
    li = read_fixture_table(spark, sf_dir, "lineitem").filter(F.lit(False))
    out = R.group_agg(li, ["l_returnflag"], [F.count("*").alias("n")])
    assert out.count() == 0


def test_random_split_partitions(spark, sf_dir):
    c = read_fixture_table(spark, sf_dir, "customer")
    train, test = R.random_split(c, [0.8, 0.2], seed=42)
    assert train.count() + test.count() == c.count()
    # Seeded split is reproducible.
    train2, _ = R.random_split(c, [0.8, 0.2], seed=42)
    assert train.count() == train2.count()


def test_observed_metrics_free_ride(spark, sf_dir):
    from ddataframeoperation_spark.operators.relational import observed

    o = read_fixture_table(spark, sf_dir, "orders")
    df, obs = observed(
        o,
        [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
                "null_keys"
            ),
        ],
    )
    n = df.filter(F.col("o_totalprice") > 0).count()  # the real action
    got = obs.get
    assert got["n_rows"] >= n and got["null_keys"] == 0


def test_validate_expectations_empty_input_is_clean(spark):
    from ddataframeoperation_spark.operators.relational import validate_expectations

    empty = spark.createDataFrame([], "x long, y string")
    out = {
        r["rule"]: r["n_violations"]
        for r in validate_expectations(
            empty, {"x_positive": F.col("x") > 0, "y_not_null": F.col("y").isNotNull()}
        ).collect()
    }
    # empty input = clean: 0 violations per rule, never NULL
    assert out == {"x_positive": 0, "y_not_null": 0}


def test_validate_expectations_null_fails_rule(spark):
    from ddataframeoperation_spark.operators.relational import validate_expectations

    df = spark.createDataFrame([(1,), (None,)], "x int")
    out = {
        r["rule"]: r["n_violations"]
        for r in validate_expectations(df, {"x_pos": F.col("x") > 0}).collect()
    }
    # NULL comparison must count as a violation, not pass vacuously
    assert out["x_pos"] == 1


def test_heavy_hitters_exact_below_capacity(spark):
    from ddataframeoperation_spark.operators.relational import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [("d",)], "v string"
    )
    got = [(r["item"], r["cnt"]) for r in heavy_hitters(df, "v", k=3).collect()]
    assert sorted(got, key=lambda t: -t[1]) == [("a", 5), ("b", 3), ("c", 2)]


def test_hll_rollup_merge_matches_group_union(spark):
    # The merged estimate must come from the sketch UNION of the same
    # per-group sketches — keys spanning multiple groups must not be
    # double counted (union semantics, not sum-of-estimates).
    from ddataframeoperation_spark.operators.relational import hll_distinct_rollup

    rows = [(g, k) for g in ("a", "b") for k in range(500)]  # same 500 keys in both
    df = spark.createDataFrame(rows, "g string, k long")
    per, merged = hll_distinct_rollup(df, "g", "k")
    per_est = {r["g"]: r["estimate"] for r in per.collect()}
    all_est = merged.head()["estimate"]
    for est in (*per_est.values(), all_est):
        assert abs(est - 500) <= 25  # 5% bound
    # sum-of-estimates would be ~1000; union must stay ~500
    assert all_est < 700


def test_minmax_scale_null_and_constant_groups(spark):
    """ADVICE r5: NULL observations must stay NULL even in a constant
    (min==max) group — the midpoint convention applies only to real
    values. Fixture events have no NULLs, so this contract is pinned
    here on a constructed frame."""
    rows = [
        ("a", 0.0), ("a", 5.0), ("a", 10.0), ("a", None),   # spread group
        ("b", 7.0), ("b", 7.0), ("b", None),                # constant group
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {
        (r["g"], r["value"]): r["scaled"]
        for r in R.minmax_scale(df, "g", "value").collect()
    }
    assert out[("a", 0.0)] == 0.0
    assert out[("a", 5.0)] == 0.5
    assert out[("a", 10.0)] == 1.0
    assert out[("a", None)] is None          # NULL stays NULL
    assert out[("b", 7.0)] == 0.5            # constant group -> midpoint
    assert out[("b", None)] is None          # even in a constant group


def test_pareto_frontier_bucketed_matches_bruteforce(spark):
    """The bucketed two-level prefix-min frontier must equal the O(n^2)
    dominance definition exactly, including both-attribute ties
    (co-frontier) and duplicate x values — across bucket counts, so
    bucket-boundary edge cases are exercised."""
    rows = [
        (1, 1.0, 9.0), (2, 2.0, 7.0), (3, 2.0, 7.0),   # tie: co-frontier
        (4, 3.0, 8.0),                                  # dominated by (2)
        (5, 3.0, 5.0), (6, 4.0, 5.0),                   # (6) dominated by (5)
        (7, 5.0, 1.0), (8, 5.0, 2.0),                   # same x, (8) dominated
        (9, 0.5, 12.0),                                 # frontier (smallest x)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    expect = set()
    for i, x, y in rows:
        if not any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for _, x2, y2 in rows
        ):
            expect.add(i)
    for buckets in (1, 2, 7, 1024):
        got = {
            r["id"]
            for r in R.pareto_frontier_2d(df, "x", "y", buckets=buckets).collect()
        }
        assert got == expect, buckets


def test_pareto_frontier_rejects_non_numeric_x(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "x string, y double"
    )
    with pytest.raises(TypeError, match="numeric"):
        R.pareto_frontier_2d(df, "x", "y")


def test_minmax_scale_exact_by_default(spark):
    # The library operator must not quantize: 1/3 stays 1/3, not 0.3333.
    df = spark.createDataFrame(
        [("g", 0.0), ("g", 1.0), ("g", 3.0)], "g string, value double"
    )
    out = {r["value"]: r["scaled"] for r in R.minmax_scale(df, "g", "value").collect()}
    assert out[1.0] == 1.0 / 3.0
    rounded = {
        r["value"]: r["scaled"]
        for r in R.minmax_scale(df, "g", "value", decimals=4).collect()
    }
    assert rounded[1.0] == 0.3333
