"""Round-7b operator checks: semi-join reduction, boilerplate-line
removal, quality-aware cluster dedup, and z-value clamping.

Each operator also has a registered query + DuckDB oracle; these tests
pin the edge cases the fixture data cannot reach (NULL text, regex-special
delimiters, tie-breaks, out-of-range clamps, empty boilerplate sets).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import dedup
from ddataframeoperation_spark.operators import relational as R
from ddataframeoperation_spark.operators import text as TX
from ddataframeoperation_spark.operators.skew import zvalue


# ---------------------------------------------------------------- A: semi-join reduction


def test_prefiltered_join_equals_plain_inner(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    plain = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_custkey"
    )
    reduced = R.prefiltered_join(
        o, c, on=["o_custkey"], right_keys=["c_custkey"]
    ).select("o_orderkey", "c_custkey")
    assert sorted(map(tuple, reduced.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_prefiltered_join_rejects_row_preserving_how(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    try:
        R.prefiltered_join(df, df, on=["k"], how="left")
    except ValueError as e:
        assert "inner" in str(e)
    else:
        raise AssertionError("left join must be rejected")


def test_prefiltered_join_plan_has_semi_below_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_acctbal") > 9000
    )
    p = str(
        R.prefiltered_join(o, c, on=["o_custkey"], right_keys=["c_custkey"])
        ._jdf.queryExecution()
        .executedPlan()
    )
    # The reduction is a broadcast LEFT-SEMI against the distinct filtered
    # keys — the fact side is thinned before the main join's exchange.
    assert "LeftSemi" in p and "BroadcastHashJoin" in p


# ------------------------------------------------------------- B: boilerplate removal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_boilerplate_strips_frequent_lines(spark):
    banner = "ACCEPT COOKIES"
    nav = "home | about | contact"
    rows = [(i, f"{nav}\nbody text {i}\n{banner}") for i in range(4)] + [
        (99, "unique document\nwith no boilerplate")
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in TX.remove_boilerplate(
            _docs(spark, rows), min_docs=3, delimiter="\n"
        ).collect()
    }
    for i in range(4):
        assert out[i] == (f"body text {i}", 2)
    assert out[99] == ("unique document\nwith no boilerplate", 0)


def test_remove_boilerplate_preserves_order_and_empties(spark):
    # Document made ENTIRELY of boilerplate collapses to ''; blank lines
    # are never counted as boilerplate (keep_empty contract).
    rows = [(i, "x\n\nx\n\ny") for i in range(5)] + [(9, "a\nx\nb\ny\nc")]
    out = {
        r["doc_id"]: r["clean_text"]
        for r in TX.remove_boilerplate(
            _docs(spark, rows), min_docs=5, delimiter="\n"
        ).collect()
    }
    assert out[0] == "\n"  # x and y removed, BOTH blank lines kept
    assert out[9] == "a\nb\nc"  # order of survivors preserved


def test_remove_boilerplate_null_text_and_no_boilerplate(spark):
    rows = [(0, None), (1, "alpha\nbeta"), (2, "gamma")]
    got = {
        r["doc_id"]: r["clean_text"]
        for r in TX.remove_boilerplate(
            _docs(spark, rows), min_docs=2, delimiter="\n"
        ).collect()
    }
    # NULL stays NULL; nothing reaches the threshold so text is unchanged.
    assert got == {0: None, 1: "alpha\nbeta", 2: "gamma"}


def test_remove_boilerplate_regex_special_delimiter(spark):
    rows = [(i, "spam.real{}.spam".format(i)) for i in range(3)]
    out = {
        r["doc_id"]: r["clean_text"]
        for r in TX.remove_boilerplate(
            _docs(spark, rows), min_docs=3, delimiter="."
        ).collect()
    }
    assert out == {i: f"real{i}" for i in range(3)}


# --------------------------------------------------------- C: quality-aware cluster dedup


def test_cluster_dedup_best_keeps_argmax_with_id_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.7)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    kept = {
        r["doc_id"]
        for r in dedup.cluster_dedup_best(
            df, pairs, score_col="q"
        ).collect()
    }
    # Cluster {1,2,3}: max q=0.9 tie between 2 and 3 → lowest id 2.
    # Cluster {4,5}: 5 wins on q. No singletons here.
    assert kept == {2, 5}


def test_cluster_dedup_best_random_matches_bruteforce(spark):
    for seed in range(4):
        rng = random.Random(seed)
        n = rng.randint(2, 40)
        scores = {i: rng.randint(0, 5) / 10.0 for i in range(n)}
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(0, n))
            }
        )
        # Brute-force components.
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comps: dict[int, list[int]] = {}
        for i in range(n):
            comps.setdefault(find(i), []).append(i)
        expect = set()
        for members in comps.values():
            expect.add(
                max(members, key=lambda i: (scores[i], -i))
            )
        df = spark.createDataFrame(
            [(i, scores[i]) for i in range(n)], "doc_id long, q double"
        )
        pairs = spark.createDataFrame(
            edges or [(0, 0)], "id_a long, id_b long"
        )
        if not edges:
            pairs = pairs.filter(F.lit(False))
        kept = {
            r["doc_id"]
            for r in dedup.cluster_dedup_best(
                df, pairs, score_col="q"
            ).collect()
        }
        assert kept == expect, seed


# ------------------------------------------------------------------ D: z-value clamps


def test_zvalue_clamps_out_of_range_and_orders_locally(spark):
    df = spark.createDataFrame(
        [(0, -5.0, -5.0), (1, 999.0, 999.0), (2, 0.0, 0.0), (3, 10.0, 10.0)],
        "id long, x double, y double",
    )
    z = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zvalue(["x", "y"], [0.0, 0.0], [10.0, 10.0], bits=4).alias("z")
        ).collect()
    }
    assert z[0] == 0  # below range clamps to cell 0
    assert z[1] == (1 << 8) - 1  # above range clamps to max cell (both dims full)
    assert z[2] == 0
    assert z[3] == (1 << 8) - 1


# ------------------------------------------------------------------ E: temporal split


def test_temporal_split_boundaries_and_purge(spark):
    from ddataframeoperation_spark.operators.sampling import temporal_split

    rows = [
        # (id, user, ts): u1 only before cutoff; u2 straddles; u3 only after.
        (0, "u1", "2024-01-01 00:00:00"),
        (1, "u2", "2024-01-02 00:00:00"),
        (2, "u2", "2024-01-10 00:00:00"),  # exactly cutoff → embargo zone
        (3, "u2", "2024-01-12 00:00:00"),  # exactly cutoff+embargo → eval
        (4, "u3", "2024-01-15 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "id long, user string, ts_s string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    got = {
        r["id"]: r["split"]
        for r in temporal_split(
            df, "ts", "2024-01-10 00:00:00",
            embargo_seconds=2 * 86400.0, key_col="user",
        ).collect()
    }
    # id 2 dropped (embargo); u2's pre-cutoff row 1 purged (u2 in eval);
    # cutoff+embargo boundary row 3 lands in eval.
    assert got == {0: "train", 3: "eval", 4: "eval"}


def test_temporal_split_no_key_keeps_all_train(spark):
    from ddataframeoperation_spark.operators.sampling import temporal_split

    rows = [(0, "2024-01-01 00:00:00"), (1, "2024-01-20 00:00:00")]
    df = spark.createDataFrame(rows, "id long, ts_s string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    got = {
        r["id"]: r["split"]
        for r in temporal_split(df, "ts", "2024-01-10 00:00:00").collect()
    }
    assert got == {0: "train", 1: "eval"}


def test_temporal_split_null_contracts(spark):
    from ddataframeoperation_spark.operators.sampling import temporal_split

    rows = [
        (0, "u1", None),                    # undatable → dropped entirely
        (1, None, "2024-01-01 00:00:00"),   # NULL key survives the purge
        (2, None, "2024-01-20 00:00:00"),   # NULL key in eval purges nothing
        (3, "u1", "2024-01-02 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "id long, user string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    got = {
        r["id"]: r["split"]
        for r in temporal_split(
            df, "ts", "2024-01-10 00:00:00", key_col="user"
        ).collect()
    }
    assert got == {1: "train", 3: "train", 2: "eval"}
