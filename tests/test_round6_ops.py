"""Round-6 operator equivalence checks on randomized inputs.

The bucketed two-level plans (Pareto frontier, token-budget mix) claim
EXACT equivalence to their naive one-window formulations; fixed examples
pin known edge cases, these seeded-random sweeps hunt for unknown ones
(duplicate keys, ties at bucket boundaries, skewed groups, empty groups).
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import relational as R
from ddataframeoperation_spark.operators import sampling


def test_pareto_frontier_random_matches_bruteforce(spark):
    for seed in range(6):
        rng = random.Random(seed)
        # Small value grids force duplicate x, duplicate y, and full ties.
        rows = [
            (i, float(rng.randint(0, 12)) / 2.0, float(rng.randint(0, 12)))
            for i in range(rng.randint(1, 80))
        ]
        expect = {
            i
            for i, x, y in rows
            if not any(
                x2 <= x and y2 <= y and (x2 < x or y2 < y)
                for _, x2, y2 in rows
            )
        }
        df = spark.createDataFrame(rows, "id long, x double, y double")
        for buckets in (1, 7, 64):
            got = {
                r["id"]
                for r in R.pareto_frontier_2d(df, "x", "y", buckets=buckets).collect()
            }
            assert got == expect, (seed, buckets)


def test_token_budget_mix_random_matches_single_window(spark):
    for seed in range(4):
        rng = random.Random(100 + seed)
        # Skewed sources (one holds ~60% of rows), token counts incl. 0.
        rows = [
            (
                i,
                f"s{min(rng.randint(0, 9), rng.randint(0, 9))}",
                rng.randint(0, 40),
            )
            for i in range(rng.randint(1, 200))
        ]
        budget = rng.randint(0, 120)
        df = spark.createDataFrame(rows, "doc_id long, source string, ntok long")
        naive = (
            df.withColumn("_u", sampling.hash_uniform(["doc_id"], "r6"))
            .withColumn(
                "_cum",
                F.sum("ntok").over(
                    Window.partitionBy("source")
                    .orderBy(F.col("_u").asc(), F.col("doc_id").asc())
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .filter(F.col("_cum") <= budget)
        )
        want = sorted(r["doc_id"] for r in naive.select("doc_id").collect())
        for buckets in (1, 5, 256):
            got = sorted(
                r["doc_id"]
                for r in sampling.token_budget_mix(
                    df, budget, token_col="ntok", salt="r6", buckets=buckets
                ).select("doc_id").collect()
            )
            assert got == want, (seed, buckets, budget)


def test_levenshtein_pairs_blockings_match_bruteforce(spark):
    import itertools

    from ddataframeoperation_spark.operators import dedup

    def ed(a, b):
        # classic Wagner-Fischer
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    for seed in range(4):
        rng = random.Random(50 + seed)
        alphabet = "abc"
        vals = list(
            {
                "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
                for _ in range(40)
            }
        )
        df = spark.createDataFrame([(v,) for v in vals], "name string")
        for k in (0, 1, 2):
            want = sorted(
                (a, b, ed(a, b))
                for a, b in itertools.combinations(sorted(vals), 2)
                if ed(a, b) <= k
            )
            for blocking in ("deletes", "length"):
                got = sorted(
                    map(
                        tuple,
                        dedup.levenshtein_pairs(
                            df, "name", max_dist=k, blocking=blocking
                        ).collect(),
                    )
                )
                assert got == want, (seed, k, blocking)


def test_text_ops_survive_non_ascii(spark):
    # Unicode/emoji/CJK/RTL documents must flow through the text pipeline
    # without crashing, with sane outputs: the [a-z0-9] normalization maps
    # non-ASCII to separators, so counts/fingerprints stay defined, and
    # identical inputs still fingerprint identically.
    from ddataframeoperation_spark.operators import dedup
    from ddataframeoperation_spark.operators import text as TX

    rows = [
        (1, "héllo wörld — café naïve"),
        (2, "日本語のテキストです。形態素解析はしない。"),
        (3, "مرحبا بالعالم hello"),
        (4, "🎉🎉 emoji only 🎉"),
        (5, ""),
        (6, "héllo wörld — café naïve"),   # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = df.select(
        "doc_id",
        TX.token_count("text").alias("ntok"),
        TX.quality_score("text").alias("q"),
        dedup.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in stats}
    assert all(r["ntok"] is not None and r["ntok"] >= 0 for r in stats)
    assert all(r["q"] is not None and 0.0 <= r["q"] <= 1.0 for r in stats)
    assert by_id[1]["fp"] == by_id[6]["fp"]          # dup detection holds
    assert by_id[2]["fp"] is not None                # CJK: defined, stable
    # language-id should not crash and yields a (possibly 'unknown') label
    lang = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", TX.language_id("text").alias("lang")).collect()}
    assert set(lang) == {1, 2, 3, 4, 5, 6}
    # quality/packing composites stay runnable
    assert TX.lexical_diversity(df).count() == 6


def test_apply_changes_roundtrip_and_validation(spark):
    from pyspark.sql import Row

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    for seed in range(4):
        rng = random.Random(200 + seed)
        # random new snapshot: drop some keys, mutate some, insert some
        rows = {r["k"]: (r["name"], r["v"]) for r in old.collect()}
        new_rows = {}
        for k, (nm, v) in rows.items():
            roll = rng.random()
            if roll < 0.25:
                continue  # deleted
            if roll < 0.6:
                new_rows[k] = (nm + "x", (v or 0.0) + 1)  # changed
            else:
                new_rows[k] = (nm, v)  # unchanged
        for k in range(10, 10 + rng.randint(0, 3)):
            new_rows[k] = ("new", float(k))
        new = spark.createDataFrame(
            [Row(k=k, name=nm, v=v) for k, (nm, v) in new_rows.items()],
            "k long, name string, v double",
        )
        from ddataframeoperation_spark.operators import relational as R

        diff = R.snapshot_diff(old, new, ["k"], ["name", "v"]).filter(
            F.col("change_type") != "unchanged"
        )
        changes = diff.join(new, on="k", how="left").select(
            "k", "name", "v", "change_type"
        )
        applied = R.apply_changes(old, changes, ["k"], ["name", "v"])
        got = sorted(map(tuple, applied.collect()))
        want = sorted((k, nm, v) for k, (nm, v) in new_rows.items())
        assert got == want, seed
    # unknown/NULL op values must fail the job (in-plan raise_error —
    # an eager pre-check would execute the changes lineage twice), not
    # silently drop or delete rows.
    import pytest

    for op in ("truncated", None):
        bad = spark.createDataFrame(
            [(1, "a", 1.0, op)],
            "k long, name string, v double, change_type string",
        )
        with pytest.raises(Exception, match="unknown change_type"):
            R.apply_changes(old, bad, ["k"], ["name", "v"]).collect()


def test_round6_ops_empty_inputs(spark):
    from ddataframeoperation_spark.operators import dedup
    from ddataframeoperation_spark.operators import relational as R

    empty_xy = spark.createDataFrame([], "id long, x double, y double")
    assert R.pareto_frontier_2d(empty_xy, "x", "y").count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, source string, ntok long")
    assert sampling.token_budget_mix(
        empty_docs, 100, token_col="ntok"
    ).count() == 0
    assert sampling.epoch_shard_order(empty_docs, epoch=0, n_shards=4).count() == 0

    empty_names = spark.createDataFrame([], "name string")
    assert dedup.levenshtein_pairs(
        empty_names, "name", max_dist=1, blocking="deletes"
    ).count() == 0

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    empty_changes = spark.createDataFrame([], "k long, v string, change_type string")
    got = R.apply_changes(base, empty_changes, ["k"], ["v"]).collect()
    assert [tuple(r) for r in got] == [(1, "a")]


def test_psi_drift_properties(spark):
    from ddataframeoperation_spark.operators import relational as R

    base = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "value double"
    )
    # identical distributions -> PSI ~ 0
    same = R.psi_drift(base, base, "value")
    total = same.agg(F.sum("psi_term")).collect()[0][0]
    assert abs(total) < 1e-9
    # shifted distribution -> PSI clearly positive, all terms finite
    shifted = base.withColumn("value", F.col("value") + 500.0)
    out = R.psi_drift(base, shifted, "value").collect()
    tot = sum(r["psi_term"] for r in out)
    assert tot > 0.25
    assert all(r["psi_term"] == r["psi_term"] for r in out)  # no NaN
    # reference deciles: each bucket holds ~10% of the reference
    assert all(80 <= r["n_ref"] <= 120 or r["n_ref"] == 0 for r in out)
    # NULLs dropped, not bucketed
    with_null = spark.createDataFrame(
        [(None,), (1.0,), (2.0,)], "value double"
    )
    nn = R.psi_drift(with_null, with_null, "value", buckets=2)
    assert nn.agg(F.sum("n_ref")).collect()[0][0] == 2


def test_psi_categorical_vanished_and_new_sources(spark):
    from ddataframeoperation_spark.operators import relational as R

    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "src string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 50 + [("c",)] * 50, "src string"
    )
    out = {r["category"]: r for r in R.psi_drift_categorical(ref, cur, "src").collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["b"]["n_cur"] == 0 and out["c"]["n_ref"] == 0
    # vanished and new categories dominate the index; 'a' is stable
    assert abs(out["a"]["psi_term"]) < 1e-9
    assert out["b"]["psi_term"] > 1 and out["c"]["psi_term"] > 1
    # NULL category is a real category
    refn = spark.createDataFrame([("a",), (None,)], "src string")
    cats = {r["category"] for r in R.psi_drift_categorical(refn, refn, "src").collect()}
    assert cats == {"a", "(null)"}


def test_incremental_agg_matches_fresh_aggregate(spark):
    from pyspark.sql import Row

    from ddataframeoperation_spark.operators import relational as R

    for seed in range(4):
        rng = random.Random(300 + seed)
        old_rows = {
            k: (rng.choice(["g1", "g2", "g3"]), float(rng.randint(0, 100)))
            for k in range(rng.randint(1, 60))
        }
        new_rows = {}
        for k, (g, v) in old_rows.items():
            roll = rng.random()
            if roll < 0.2:
                continue                                  # delete
            if roll < 0.5:
                new_rows[k] = (rng.choice(["g1", "g2", "g3"]), v + 7)  # update (may move groups)
            else:
                new_rows[k] = (g, v)                      # unchanged
        for k in range(100, 100 + rng.randint(0, 10)):
            new_rows[k] = (rng.choice(["g1", "g4"]), float(k))  # insert (new group possible)
        old = spark.createDataFrame(
            [Row(k=k, g=g, v=v) for k, (g, v) in old_rows.items()],
            "k long, g string, v double",
        )
        new = spark.createDataFrame(
            [Row(k=k, g=g, v=v) for k, (g, v) in new_rows.items()],
            "k long, g string, v double",
        )
        old_agg = old.groupBy("g").agg(
            F.count("*").alias("n_rows"), F.sum("v").alias("sum_value")
        )
        retr = R.retraction_stream(old, new, ["k"], ["g", "v"])
        got = {
            r["g"]: (r["n_rows"], round(r["sum_value"], 6))
            for r in R.maintain_group_agg(old_agg, retr, "g", "v").collect()
        }
        want = {
            r["g"]: (r["n"], round(r["s"], 6))
            for r in new.groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .collect()
        }
        assert got == want, seed


def test_maintain_group_agg_null_group_and_null_values(spark):
    from pyspark.sql import Row

    from ddataframeoperation_spark.operators import relational as R

    # NULL group key: groupBy treats NULL as a real group; the merge join
    # must be null-safe or the NULL group splits into two rows.
    old = spark.createDataFrame(
        [Row(k=1, g=None, v=1.0), Row(k=2, g=None, v=2.0), Row(k=3, g="a", v=3.0)],
        "k long, g string, v double",
    )
    new = spark.createDataFrame(
        [Row(k=1, g=None, v=1.0), Row(k=3, g="a", v=3.0)],
        "k long, g string, v double",
    )
    old_agg = old.groupBy("g").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("sum_value")
    )
    retr = R.retraction_stream(old, new, ["k"], ["g", "v"])
    got = {
        r["g"]: (r["n_rows"], r["sum_value"])
        for r in R.maintain_group_agg(old_agg, retr, "g", "v").collect()
    }
    assert got == {None: (1, 1.0), "a": (1, 3.0)}
    # Retracting a group's LAST non-null value must yield sum NULL
    # (SQL SUM over only-NULL rows), not 0.0.
    old2 = spark.createDataFrame(
        [Row(k=1, g="g", v=5.0), Row(k=2, g="g", v=None)],
        "k long, g string, v double",
    )
    new2 = spark.createDataFrame(
        [Row(k=2, g="g", v=None)], "k long, g string, v double"
    )
    # build_group_agg tracks the non-null value count the NULL-sum
    # semantics need; a plain (count, sum) aggregate cannot recover it.
    old_agg2 = R.build_group_agg(old2, "g", "v")
    retr2 = R.retraction_stream(old2, new2, ["k"], ["g", "v"])
    [row] = R.maintain_group_agg(old_agg2, retr2, "g", "v").collect()
    assert row["n_rows"] == 1 and row["sum_value"] is None


def test_leakage_safe_kfold_colocates_clusters(spark):
    # Every near-dup cluster must land entirely in ONE fold; folds are
    # disjoint+exhaustive; NULL ids dropped.
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)] + [(None, "ghost")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (10, 11)], "id_a long, id_b long"
    )
    out = sampling.leakage_safe_kfold(docs, pairs, k=4, salt="t").collect()
    assert len(out) == 40  # NULL id dropped
    fold_by_id = {r["doc_id"]: r["fold"] for r in out}
    assert all(0 <= f <= 3 for f in fold_by_id.values())
    assert fold_by_id[0] == fold_by_id[1] == fold_by_id[2]
    assert fold_by_id[5] == fold_by_id[6]
    assert fold_by_id[10] == fold_by_id[11]
    # deterministic across invocations
    again = {
        r["doc_id"]: r["fold"]
        for r in sampling.leakage_safe_kfold(docs, pairs, k=4, salt="t").collect()
    }
    assert again == fold_by_id


def test_apply_changes_null_key_is_a_real_key(spark):
    from pyspark.sql import Row

    from ddataframeoperation_spark.operators import relational as R

    # snapshot_diff treats a NULL key null-safely; apply must match —
    # updating the NULL-key row must REPLACE it, not duplicate it.
    old = spark.createDataFrame(
        [Row(k=None, v="old"), Row(k=1, v="a")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [Row(k=None, v="new", change_type="changed")],
        "k long, v string, change_type string",
    )
    got = sorted(
        [(r["k"], r["v"]) for r in R.apply_changes(old, changes, ["k"], ["v"]).collect()],
        key=str,
    )
    assert got == sorted([(None, "new"), (1, "a")], key=str)
    # and the full roundtrip through snapshot_diff holds with a NULL key
    new = spark.createDataFrame(
        [Row(k=None, v="new"), Row(k=1, v="a")], "k long, v string"
    )
    diff = R.snapshot_diff(old, new, ["k"], ["v"]).filter(
        F.col("change_type") != "unchanged"
    )
    n2 = new.select(F.col("k").alias("nk"), F.col("v").alias("nv"))
    ch = diff.join(
        n2, on=F.col("k").eqNullSafe(F.col("nk")), how="left"
    ).select("k", F.col("nv").alias("v"), "change_type")
    rt = sorted(
        [(r["k"], r["v"]) for r in R.apply_changes(old, ch, ["k"], ["v"]).collect()],
        key=str,
    )
    assert rt == sorted([(None, "new"), (1, "a")], key=str)


def test_psi_drift_constant_reference(spark):
    # A constant reference collapses every cut point to one value: all
    # reference mass lands in bucket 1, drifted-higher current mass in
    # the top bucket — the index must stay finite and clearly positive.
    from ddataframeoperation_spark.operators import relational as R

    ref = spark.createDataFrame([(5.0,)] * 100, "value double")
    cur = spark.createDataFrame([(9.0,)] * 100, "value double")
    out = R.psi_drift(ref, cur, "value", buckets=4).collect()
    tot = sum(r["psi_term"] for r in out)
    assert tot > 1 and all(r["psi_term"] == r["psi_term"] for r in out)
    # identical constant snapshots -> zero drift
    same = R.psi_drift(ref, ref, "value", buckets=4)
    assert abs(same.agg(F.sum("psi_term")).collect()[0][0]) < 1e-9


def test_epoch_shard_order_single_shard(spark):
    # n_shards=1 degenerates to one global deterministic order — still
    # exhaustive with contiguous positions.
    d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = sampling.epoch_shard_order(d, epoch=0, n_shards=1).collect()
    assert len(out) == 50
    assert {r["shard"] for r in out} == {0}
    assert sorted(r["position"] for r in out) == list(range(1, 51))


def test_levenshtein_pairs_unicode(spark):
    # Edit distance over non-ASCII: Spark's levenshtein is
    # character-based, and the deletion neighborhood must split on
    # CHARACTERS (substr is character-indexed), not bytes.
    from ddataframeoperation_spark.operators import dedup

    df = spark.createDataFrame(
        [("héllo",), ("hèllo",), ("héllò",), ("東京",), ("東京都",)],
        "name string",
    )
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in dedup.levenshtein_pairs(
            df, "name", max_dist=1, blocking="deletes"
        ).collect()
    }
    assert ("hèllo", "héllo", 1) in got
    assert ("héllo", "héllò", 1) in got
    assert ("東京", "東京都", 1) in got
    # 2-apart pair excluded at max_dist=1
    assert not any({a, b} == {"hèllo", "héllò"} for a, b, _ in got)


def test_token_budget_mix_zero_budget_and_all_null_tokens(spark):
    # budget 0 admits only a zero-token PREFIX (the mix is prefix-based,
    # not greedy: a budget-busting doc earlier in the hash order blocks
    # everything after it); all-NULL token column keeps nothing
    # (NULL-drop contract) — neither crashes.
    solo = spark.createDataFrame(
        [(1, "s", 0)], "doc_id long, source string, ntok long"
    )
    kept = sampling.token_budget_mix(solo, 0, token_col="ntok").collect()
    assert [r["doc_id"] for r in kept] == [1]  # cum 0 <= budget 0
    nulls = spark.createDataFrame(
        [(1, "s", None)], "doc_id long, source string, ntok long"
    )
    assert sampling.token_budget_mix(nulls, 10, token_col="ntok").count() == 0
