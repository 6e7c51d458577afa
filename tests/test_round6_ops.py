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
