"""10x scale probe: replicate the sf0.1 fixtures with shifted keys and time
the headline operators on the enlarged corpus vs the original.

Usage: python tools/scale_probe.py [factor] [name-substring ...]

With name-substring filters, only probes whose label contains one of the
substrings run — the per-round loop for newly added operators.

This is the local stand-in for a real cluster scale test: if an operator's
runtime grows ~linearly (or stays task-overhead-bound) between 1x and Nx
while its plan shape is unchanged, the shuffle/join structure — the thing
that decides survival at 100 TB — is scaling as designed. Quadratic growth
here means a candidate explosion that 1000 executors would NOT fix.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import dedup, relational, sampling, similarity
from ddataframeoperation_spark.operators import retrieval as RT
from ddataframeoperation_spark.operators import text as TX
from ddataframeoperation_spark.operators.asof import interval_overlap_join
from ddataframeoperation_spark.operators.timeseries import ewma, ohlc_bars, twap
from ddataframeoperation_spark.operators.windows import (
    debounce,
    last_touch_attribution,
    funnel_counts,
    retention_cohorts,
    scd2_history,
    transition_counts,
)
from ddataframeoperation_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def replicate(df: DataFrame, factor: int, id_cols: list[str], shift: int) -> DataFrame:
    out = df
    for i in range(1, factor):
        rep = df
        for c in id_cols:
            rep = rep.withColumn(c, F.col(c) + i * shift)
        out = out.unionByName(rep)
    return out


FILTERS: list[str] = []


def probe(name, build, action=lambda d: d.count()):
    if FILTERS and not any(f in name for f in FILTERS):
        return
    df = build()
    action(df)  # warm / JIT
    t0 = time.time()
    n = action(build())
    print(f"{name}: {time.time() - t0:.2f}s ({n} rows)", flush=True)


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    FILTERS.extend(sys.argv[2:])
    spark = get_spark("scale_probe")
    docs1 = read_fixture_table(spark, SF, "documents")
    ev1 = read_fixture_table(spark, SF, "events")
    emb1 = read_fixture_table(spark, SF, "embeddings")
    docs = replicate(docs1, factor, ["doc_id"], 10_000_000).localCheckpoint()
    ev = replicate(ev1, factor, ["event_id", "user_id"], 10_000_000).localCheckpoint()
    emb = replicate(emb1, factor, ["vec_id"], 10_000_000).localCheckpoint()
    print(f"scale factor {factor}: docs={docs.count()} events={ev.count()} emb={emb.count()}")

    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(f"block_dedup {tag}", lambda d=d: dedup.block_dedup(d))
        probe(f"bm25_topk {tag}", lambda d=d: TX.bm25_topk(d, ["join", "spark", "window"], k=10))
        probe(f"simhash_candidates {tag}", lambda d=d: dedup.simhash_candidates(d))
        probe(f"token_ids {tag}", lambda d=d: TX.encode_token_ids(d, min_df=2))
        probe(
            f"cap_per_source {tag}",
            lambda d=d: sampling.cap_per_source(d, 10, order_by=[F.col("n_chars").desc()]),
        )
        probe(
            f"gopher_quality {tag}",
            lambda d=d: TX.gopher_quality_signals(d),
        )
        probe(
            f"calibration_bins {tag}",
            lambda d=d: relational.calibration_bins(
                d.select(
                    F.round(
                        F.least(
                            F.lit(1.0),
                            F.greatest(
                                F.lit(0.0),
                                (F.col("n_chars") / 2000.0 - 0.5),
                            ),
                        ),
                        4,
                    ).alias("score"),
                    (F.col("lang") == "en").alias("label"),
                ),
                "score",
                "label",
            ),
        )
        probe(
            f"mixture_weights {tag}",
            lambda d=d: sampling.mixture_weights(
                d.withColumn("n_tokens", F.size(TX.tokens("text")).cast("long")),
                {"en": 3000, "es": 2000, "de": 2000, "fr": 1500, "zh": 1500},
                budget_tokens=50_000,
                source_col="lang",
                token_col="n_tokens",
            ),
        )
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"key_skew_audit {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.skew", fromlist=["skew"]
            ).key_skew_audit(e, "user_id", top_n=20),
        )
        probe(
            f"period_over_period {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.windows",
                fromlist=["windows"],
            ).period_over_period(
                e,
                ["event_type"],
                F.date_trunc("day", "ts"),
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ),
        )
        probe(
            f"time_to_convert {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.windows",
                fromlist=["windows"],
            ).time_to_convert(e, "click", "purchase", bucket_minutes=360),
        )
        probe(
            f"churn_cohorts {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.windows",
                fromlist=["windows"],
            ).churn_cohorts(
                e.filter(F.col("event_type") == "purchase"),
                inactive_days=2,
                cohort_granularity="day",
            ),
        )
        iv = lambda e=e: e.select(  # noqa: E731
            "event_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + F.round(F.col("value") * 1e6, 0).cast("long")).alias("e"),
        )
        probe(
            f"interval_overlap {tag}",
            lambda iv=iv: interval_overlap_join(
                iv(), iv(), "s", "e", "s", "e",
                bucket_seconds=600.0 * 1e6,
                left_cols=["event_id"], right_cols=["event_id"],
            ).filter(F.col("l_event_id") < F.col("r_event_id")),
        )
        probe(
            f"scd2_history {tag}",
            lambda e=e: scd2_history(e, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]),
        )
        probe(
            f"ohlc_bars {tag}",
            lambda e=e: ohlc_bars(e, "user_id", "ts", "value", "hour", "event_id"),
        )
        probe(
            f"ewma {tag}",
            lambda e=e: ewma(e, "user_id", "ts", "value", tiebreak_col="event_id"),
        )
        probe(
            f"funnel {tag}",
            lambda e=e: funnel_counts(e, ["view", "click", "purchase"]),
        )
        probe(f"retention {tag}", lambda e=e: retention_cohorts(e))
        probe(
            f"transition_matrix {tag}",
            lambda e=e: transition_counts(e, tiebreak=["event_id"]),
        )
        probe(
            f"twap {tag}",
            lambda e=e: twap(e, "user_id", "ts", "value", tiebreak_col="event_id"),
        )
        probe(
            f"debounce {tag}",
            lambda e=e: debounce(e, min_gap_seconds=60.0, tiebreak=["event_id"]),
        )
    # Round-6: CDC roundtrip, incremental maintenance, drift — each must
    # stay flat (cost tracks change volume / bucket count, not rows).
    cust1 = read_fixture_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    cust = replicate(cust1, factor, ["c_custkey"], 10_000_000).localCheckpoint()

    def _new_snapshot(c):
        return c.filter(F.col("c_custkey") % 97 != 0).withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 10.0
            ).otherwise(F.col("c_acctbal")),
        ).unionByName(
            c.filter(F.col("c_custkey") % 53 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + 1000000
            )
        )

    for tag, c in (("1x", cust1), (f"{factor}x", cust)):
        new = _new_snapshot(c)
        probe(
            f"cdc_apply {tag}",
            lambda c=c, new=new: relational.apply_changes(
                c,
                relational.snapshot_diff(
                    c, new, ["c_custkey"], ["c_mktsegment", "c_acctbal"]
                )
                .filter(F.col("change_type") != "unchanged")
                .join(new, on="c_custkey", how="left")
                .select("c_custkey", "c_mktsegment", "c_acctbal", "change_type"),
                ["c_custkey"],
                ["c_mktsegment", "c_acctbal"],
            ),
        )
        probe(
            f"incremental_agg {tag}",
            lambda c=c, new=new: relational.maintain_group_agg(
                relational.build_group_agg(c, "c_mktsegment", "c_acctbal"),
                relational.retraction_stream(
                    c, new, ["c_custkey"], ["c_mktsegment", "c_acctbal"]
                ),
                "c_mktsegment",
                "c_acctbal",
            ),
        )
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"psi_drift {tag}",
            lambda e=e: relational.psi_drift(
                e.filter(F.col("event_id") % 2 == 0),
                e.filter(F.col("event_id") % 2 == 1).withColumn(
                    "value", F.col("value") * 1.1 + 5
                ),
                "value",
            ),
        )
    for tag, m in (("1x", emb1), (f"{factor}x", emb)):
        probe(f"quantized_topk {tag}", lambda m=m: similarity.quantized_topk(m, 0, k=10))
        probe(
            f"embedding_health {tag}",
            lambda m=m: similarity.embedding_health(m, expected_dim=64),
        )
        probe(
            f"centroid_confusion {tag}",
            lambda m=m: similarity.nearest_centroid_confusion(m),
        )
        # Round-7: batched multi-query retrieval — the one corpus-scale
        # retrieval op. The query table stays 3 rows at every factor; the
        # level-1 (query, id-shard) local top-k must spread the growth
        # across shards, never sorting one query's scores on one task.
        probe(
            f"cosine_topk_multi {tag}",
            lambda m=m: similarity.cosine_topk_multi(
                m,
                emb1.filter(F.col("vec_id") < 3).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec"),
                ),
                k=10,
            ),
        )
        # Round-12 (VERDICT r11 #2): the retrieval-eval surface at scale.
        # Retrieval cost dominates; the eval layer must stay bounded —
        # rrf fuses two k-bounded lists, metrics aggregates per query
        # over a qrels join that grows linearly with the corpus, and the
        # MMR greedy kernel is row-local over <=10-candidate groups.
        _qtab = emb1.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        probe(
            f"hybrid_rrf {tag}",
            lambda m=m: RT.rrf_fusion(
                [
                    similarity.cosine_topk(
                        m, emb1.filter(F.col("vec_id") == 0).head()[1], k=10
                    ).select(F.col("vec_id").alias("doc_id"),
                             F.col("cos_sim").alias("s")),
                    similarity.cosine_topk(
                        m, emb1.filter(F.col("vec_id") == 1).head()[1], k=10
                    ).select(F.col("vec_id").alias("doc_id"),
                             F.col("cos_sim").alias("s")),
                ],
                id_col="doc_id",
                score_col="s",
            ),
        )
        probe(
            f"retrieval_metrics {tag}",
            lambda m=m, q=_qtab: RT.retrieval_metrics(
                similarity.cosine_topk_multi(m, q, k=10),
                m.select("vec_id", "label")
                .join(
                    F.broadcast(
                        emb1.filter(F.col("vec_id") < 3).select(
                            F.col("vec_id").alias("query_id"), "label"
                        )
                    ),
                    on="label",
                )
                .select("query_id", "vec_id", F.lit(1).alias("grade")),
                k=10,
                query_col="query_id",
                id_col="vec_id",
                score_col="cos_sim",
            ),
        )
        probe(
            f"mmr_rerank {tag}",
            lambda m=m, q=_qtab: RT.mmr_diversify(
                similarity.cosine_topk_multi(m, q, k=10), m, k=5, lamb=0.7
            ),
        )
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"weighted_sample {tag}",
            lambda d=d: sampling.weighted_sample(
                d, 100, "n_chars", ["doc_id"], id_order=["doc_id"]
            ),
        )
        probe(
            f"temperature_mix {tag}",
            lambda d=d: sampling.temperature_mix(d, 200, "source", ["doc_id"]),
        )
        probe(f"lexical_diversity {tag}", lambda d=d: TX.lexical_diversity(d))
        # Round-7b: the data card — row-local token/trigram math + one
        # map-side-combined aggregate; must grow with scan width only.
        probe(f"corpus_datacard {tag}", lambda d=d: TX.corpus_datacard(d))
        probe(
            f"mad_outliers {tag}",
            lambda d=d: relational.mad_outliers(d, "source", "n_chars"),
        )
        probe(
            f"snapshot_diff {tag}",
            lambda d=d: relational.snapshot_diff(
                d,
                d.withColumn("n_chars", F.col("n_chars") + (F.col("doc_id") % 7 == 0).cast("long")),
                ["doc_id"], ["n_chars"],
            ),
        )
        # Round-6: bucketed Pareto frontier under the ADVICE-flagged
        # adversarial shape — near-unique continuous x (distinct-x ~ rows),
        # where the old single global running-min window would collapse to
        # one task. Growth here must stay ~linear.
        probe(
            f"pareto_frontier_continuous_x {tag}",
            lambda d=d: relational.pareto_frontier_2d(
                d.withColumn(
                    "x", F.col("n_chars") + (F.col("doc_id") % 997) / 1000.0
                ).withColumn(
                    "y", (F.col("doc_id") * 2654435761 % 1000003).cast("double")
                ),
                "x", "y",
            ),
        )
        # Round-7: bucketed cumulative share (the ABC-classification
        # re-plan) under the same adversarial near-unique value shape —
        # the running sum must spread across value buckets, never one task.
        probe(
            f"cumulative_share_continuous {tag}",
            lambda d=d: relational.cumulative_share(
                d.withColumn(
                    "v",
                    (F.col("n_chars") * 1000 + F.col("doc_id") % 997).cast(
                        "long"
                    ),
                ),
                "v", "doc_id",
            ),
        )
        # Round-6: token-budget mixture and epoch shard ordering — the
        # (source, u-bucket) prefix sums and shard windows must stay flat.
        probe(
            f"token_budget_mix {tag}",
            lambda d=d: sampling.token_budget_mix(d, 700, salt="p"),
        )
        probe(
            f"epoch_shard_order {tag}",
            lambda d=d: sampling.epoch_shard_order(d, epoch=1, n_shards=64),
        )
        # Round-6: percentile-cut-point quartile assignment (the global-ntile
        # replacement): one percentile agg + broadcast + row-local fold.
        probe(
            f"percentile_quartiles {tag}",
            lambda d=d: (lambda dd:
                dd.crossJoin(
                    F.broadcast(dd.agg(F.expr(
                        "percentile(ntok, array(0.25, 0.5, 0.75))"
                    ).alias("_c")))
                )
                .withColumn("stage", F.lit(1) + F.size(
                    F.filter(F.col("_c"), lambda x: F.col("ntok") > x)
                ))
                .groupBy("stage").count()
            )(d.select("doc_id", TX.token_count("text").alias("ntok"))),
        )
        # Round-7b: corpus-frequency boilerplate removal — digest-only
        # explode/aggregate + one-row broadcast set + row-local rejoin.
        # min_docs scales with the corpus so the boilerplate SET (the
        # broadcast) stays the same size at every factor.
        probe(
            f"remove_boilerplate {tag}",
            lambda d=d, t=tag: TX.remove_boilerplate(
                d,
                min_docs=300 * (1 if t == "1x" else factor),
                delimiter=" ",
            ),
        )
        # Round-7b: quality-aware cluster dedup over a synthetic bounded
        # pair set (chains of 3) — isolates the components + max_by
        # survivor selection from the pair-generation cost that
        # minhash/jaccard probes already cover.
        probe(
            f"cluster_dedup_best {tag}",
            lambda d=d: dedup.cluster_dedup_best(
                d.withColumn("q", TX.quality_score("text")),
                d.filter(F.col("doc_id") % 3 != 2).select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"),
                ),
                score_col="q",
            ),
        )
    # Round-7b: semi-join reduction — the broadcast LEFT SEMI must keep
    # the fact-side cost linear while the dim filter stays selective.
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"prefiltered_join {tag}",
            lambda e=e: relational.prefiltered_join(
                e,
                e.filter(F.col("user_id") % 37 == 0)
                .select(F.col("user_id").alias("u"), "event_type")
                .dropDuplicates(["u"]),
                on=["user_id"],
                right_keys=["u"],
            ),
        )
        # Round-7b: the Morton/Z-order key — row-local shift/mask
        # projection, must run at scan speed.
        from ddataframeoperation_spark.operators.skew import zvalue

        probe(
            f"zvalue {tag}",
            lambda e=e: e.select(
                zvalue(["user_id", "value"], [0.0, 0.0], [1e7, 512.0]).alias("z")
            ),
        )
        # Round-7c: purged temporal split — two pushed-down time filters
        # + one left-anti key join; must scale with the scan.
        probe(
            f"temporal_split {tag}",
            lambda e=e: sampling.temporal_split(
                e, "ts", "2024-01-22 00:00:00",
                embargo_seconds=86400.0, key_col="user_id",
            ),
        )
    # Round-7d: rolling distinct actives — exact (reduced (day,key) grid,
    # bounded explode) and the HLL sketch path (|days| x W sketch rows,
    # state constant in key cardinality); next-event training pairs (one
    # bounded-frame window).
    from ddataframeoperation_spark.operators.timeseries import (
        rolling_distinct,
        rolling_distinct_approx,
    )
    from ddataframeoperation_spark.operators.windows import next_event_examples

    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"rolling_actives_exact {tag}",
            lambda e=e: rolling_distinct(e, window_days=7),
        )
        probe(
            f"rolling_actives_hll {tag}",
            lambda e=e: rolling_distinct_approx(e, window_days=7),
        )
        probe(
            f"next_event_examples {tag}",
            lambda e=e: next_event_examples(
                e, context=3, tiebreak=("event_id",)
            ),
        )
    # Round-7d: dedup provenance (one (fp,id) shuffle, capped id lists),
    # BPE pair discovery (vocabulary aggregate BEFORE pair explosion),
    # and skip-gram pairs (row-local pair generation, one count agg).
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"negative_samples {tag}",
            lambda d=d: sampling.negative_samples(
                d.filter(F.col("doc_id") % 5 == 0).select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"),
                ),
                d,
                k=3,
                buckets=64,
            ),
        )
        # Replica-salt the group key: replicate() copies TEXTS, so an
        # unsalted prefix group would grow 10x denser (edge count ~x100)
        # — probing the INPUT's degree growth, not the operator. Cost is
        # documented as deg-bounded; hold degree constant, scale groups.
        probe(
            f"triangle_count {tag}",
            lambda d=d: dedup.triangle_count(
                d.select(
                    F.md5(
                        F.concat(
                            F.array_join(
                                F.slice(
                                    F.split(
                                        dedup.normalized_text("text"), " "
                                    ),
                                    1, 2,
                                ),
                                " ",
                            ),
                            (F.col("doc_id") / 10_000_000).cast("long").cast("string"),
                        )
                    ).alias("fp"),
                    F.col("doc_id").alias("id"),
                )
                .alias("g")
                .join(
                    d.select(
                        F.md5(
                            F.concat(
                                F.array_join(
                                    F.slice(
                                        F.split(
                                            dedup.normalized_text("text"), " "
                                        ),
                                        1, 2,
                                    ),
                                    " ",
                                ),
                                (F.col("doc_id") / 10_000_000).cast("long").cast("string"),
                            )
                        ).alias("fp"),
                        F.col("doc_id").alias("id2"),
                    ),
                    on="fp",
                )
                .filter(F.col("id") < F.col("id2"))
                .select(F.col("id").alias("id_a"), F.col("id2").alias("id_b")),
            ),
        )
        probe(
            f"dedup_provenance {tag}",
            lambda d=d: dedup.dedup_with_provenance(
                d,
                text_col=F.array_join(
                    F.slice(F.split(dedup.normalized_text("text"), " "), 1, 2),
                    " ",
                ),
                max_ids=2,
            ),
        )
        probe(
            f"bpe_pair_counts {tag}",
            lambda d=d: TX.bpe_pair_counts(d, top_n=50),
        )
        probe(
            f"skipgram_pairs {tag}",
            lambda d=d: TX.skipgram_pairs(d, window=2, min_count=3),
        )
    # Round-7d: PQ ANN — codebooks train once on a bounded sample (off
    # the data path); the ADC scan touches only 8-byte codes and the
    # re-rank touches `shortlist` full vectors, so growth must track the
    # code scan alone.
    books = similarity.pq_train(emb1, m=8, ksub=16, iters=3)
    qv = emb1.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    for tag, mdf in (("1x", emb1), (f"{factor}x", emb)):
        probe(
            f"pq_topk {tag}",
            lambda mdf=mdf: similarity.pq_topk(
                mdf, qv, books, k=10, shortlist=100
            ),
        )
    # Round-7d second batch: HLL cohort overlap (two 1-row sketch
    # aggregates, key sets never joined), per-group OLS (pure co-moment
    # aggregate), unicode NFC (row-local Arrow UDF).
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"hll_overlap {tag}",
            lambda e=e: relational.hll_overlap(
                e.filter(F.col("event_type") == "click"),
                e.filter(F.col("event_type") == "purchase"),
                "user_id",
            ),
        )
        probe(
            f"group_ols {tag}",
            lambda e=e: relational.group_ols(
                e.withColumn(
                    "_x",
                    (F.unix_micros("ts") - F.lit(1704067200000000)) / 3.6e9,
                ),
                ["user_id"], "_x", "value",
            ),
        )
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"normalize_unicode {tag}",
            lambda d=d: TX.normalize_unicode(d, "text"),
        )
        probe(
            f"shard_manifest {tag}",
            lambda d=d: sampling.shard_manifest(
                d, 64, ["doc_id"], token_col=TX.token_count("text"), salt="p"
            ),
        )
    # Round-7d third batch: conversion-window funnel (chained filtered
    # min-aggs + gap predicate) and rolling z-score (one bounded-frame
    # key window).
    from ddataframeoperation_spark.operators.timeseries import rolling_zscore

    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"funnel_windowed {tag}",
            lambda e=e: funnel_counts(
                e, ["view", "click", "purchase"], max_gap_seconds=86400.0
            ),
        )
        probe(
            f"rolling_zscore {tag}",
            lambda e=e: rolling_zscore(e, tiebreak_col="event_id"),
        )
        probe(
            f"last_touch_attribution {tag}",
            lambda e=e: last_touch_attribution(
                e, max_gap_seconds=3600.0, tiebreak=("event_id",)
            ),
        )
        probe(
            f"activity_streaks {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.windows",
                fromlist=["activity_streaks"],
            ).activity_streaks(e, top_per_key=2),
        )
        probe(
            f"top_paths {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.windows",
                fromlist=["top_paths"],
            ).top_paths(e, path_len=3, top_n=20, tiebreak=("event_id",)),
        )
        probe(
            f"rank_sum_test {tag}",
            lambda e=e: relational.rank_sum_test(
                e.filter(F.col("event_type").isin("click", "view")),
                "event_type", "value", group_a="click",
            ),
        )
        probe(
            f"ks_test {tag}",
            lambda e=e: relational.ks_test(
                e.filter(F.col("event_type").isin("click", "view")),
                "event_type", "value", group_a="click",
            ),
        )
        probe(
            f"cohens_kappa {tag}",
            lambda e=e: relational.cohens_kappa(
                e.select(
                    F.col("event_type").alias("a"),
                    F.when(F.col("value") > 10, F.col("event_type"))
                    .otherwise(F.lit("other"))
                    .alias("b"),
                ),
                "a", "b",
            ),
        )
    # Round-9 (VERDICT r8 #5): the r8 newcomers that only had sf-ladder
    # evidence. calendar_spine is calendar-bounded (output constant under
    # replication — the probe times the 1-row min/max scan);
    # dup_rate_by_source is one fingerprint window + a |sources| agg;
    # partitioned_sink exercises DYNAMIC partition overwrite under 128
    # partitions (the many-partition case the fixture's 5 langs can't).
    from ddataframeoperation_spark.operators.timeseries import calendar_spine

    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(f"calendar_spine {tag}", lambda e=e: calendar_spine(e))
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"dup_rate_by_source {tag}",
            lambda d=d: dedup.dup_rate_by_source(d),
        )

        def _psink(d=d):
            import shutil
            import tempfile

            out = tempfile.mkdtemp(prefix="ddfo_probe_psink_")
            try:
                part = d.select(
                    "doc_id", (F.col("doc_id") % 128).alias("p")
                )
                part.write.mode("overwrite").partitionBy("p").parquet(out)
                part.filter(F.col("p") == 7).write.mode("overwrite").option(
                    "partitionOverwriteMode", "dynamic"
                ).partitionBy("p").parquet(out)
                return spark.createDataFrame(
                    [(spark.read.parquet(out).count(),)], "n long"
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)

        probe(f"partitioned_sink_128p {tag}", _psink)

    # Round-9 widening: join advisor (two 1-row censuses) and one BPE
    # trainer iteration (vocabulary-sized pair explosion, 1-row merge
    # broadcast) — both must stay scan-bound.
    from ddataframeoperation_spark.operators.skew import join_strategy_advice

    cust = read_fixture_table(spark, SF, "customer")
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"join_advisor {tag}",
            lambda e=e: join_strategy_advice(
                e, "user_id", cust, "c_custkey", broadcast_max_rows=1000,
                skew_share_bp=50,
            ),
        )
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"bpe_train_step {tag}",
            lambda d=d: TX.bpe_train_step(d, top_n=10),
        )
    from ddataframeoperation_spark.operators.skew import join_fanout_estimate

    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"join_fanout {tag}",
            lambda e=e: join_fanout_estimate(e, "user_id", e, "user_id"),
        )

    # Round-9/10 classifier-eval family: gain/lift chart (one percentile
    # aggregate + bounded explode-refold), exact ROC-AUC and exact PR-AUC
    # (bucketed two-level prefix machinery) — all must stay scan-bound.
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        scored = lambda e=e: e.select(  # noqa: E731
            F.round(F.col("value"), 2).alias("score"),
            (F.col("event_type") == "click").alias("label"),
        )
        probe(
            f"gain_chart {tag}",
            lambda s=scored: relational.gain_chart(s(), "score", "label"),
        )
        probe(
            f"auc_exact {tag}",
            lambda s=scored: relational.auc_exact(s(), "score", "label"),
        )
        probe(
            f"pr_auc {tag}",
            lambda s=scored: relational.pr_auc_exact(s(), "score", "label"),
        )
        probe(
            f"operating_points {tag}",
            lambda s=scored: relational.operating_points(
                s(), "score", "label", [0.3, 0.5, 0.7]
            ),
        )

    # Round-10 widening: matryoshka prefix-recall eval (one scan per
    # evaluated dim, two-level per-(query, shard) top-k) and the
    # per-source dedup token-savings report (one fingerprint window).
    for tag, m in (("1x", emb1), (f"{factor}x", emb)):
        qs = emb1.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        probe(
            f"matryoshka_recall {tag}",
            lambda m=m, qs=qs: similarity.matryoshka_recall(
                m, qs, dims=[8, 16, 32], k=10
            ),
        )
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"dedup_token_savings {tag}",
            lambda d=d: dedup.dedup_token_savings(d),
        )
        probe(
            f"stratified_kfold {tag}",
            lambda d=d: sampling.stratified_kfold_assign(
                d, 5, ["doc_id"], strata_col="lang", salt="cv"
            ),
        )
        probe(
            f"weighted_percentiles {tag}",
            lambda d=d: relational.weighted_percentiles(
                d.select("n_chars",
                         F.coalesce(F.size(TX.tokens("text")), F.lit(0))
                         .cast("long").alias("_w")),
                "n_chars", "_w", probs_bp=[2500, 5000, 9000],
            ),
        )
        probe(
            f"vocab_overlap {tag}",
            lambda d=d: TX.vocab_overlap_by_source(d),
        )
    # linear attribution: one user-key RANGE window; index planner: a
    # 1-row census + literal expansion (timed for completeness).
    from ddataframeoperation_spark.operators.windows import linear_attribution

    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"linear_attribution {tag}",
            lambda e=e: linear_attribution(e, max_gap_seconds=3600.0),
        )
        from ddataframeoperation_spark.operators.asof import asof_join_nearest
        probe(
            f"asof_nearest {tag}",
            lambda e=e: asof_join_nearest(
                e.filter(F.col("event_type") == "purchase"),
                e.filter(F.col("event_type") == "click"),
                key="user_id", left_ts="ts", right_ts="ts",
                right_cols=["value"], tolerance_seconds=1800.0,
                right_tiebreak="event_id",
            ),
        )
    for tag, m in (("1x", emb1), (f"{factor}x", emb)):
        probe(
            f"index_planner {tag}",
            lambda m=m: similarity.index_memory_planner(
                m, budget_bytes=10**9, ivf_cells=64
            ),
        )

    # Round-7d: semantic join in its production (partial-probe) mode.
    # The cell count SCALES WITH THE CORPUS (bounded cell population —
    # the FAISS sizing rule): with ncells fixed, candidate pairs grow as
    # n²/ncells (measured 4.95→54.5 s at 10×); with ncells ∝ n the
    # equi-join stays linear in the corpus.
    for tag, m, k7 in (("1x", emb1, 8), (f"{factor}x", emb, 8 * factor)):
        cents7 = similarity.kmeans_centroids(m, k=k7, iters=3)
        probe(
            f"semantic_join {tag}",
            lambda m=m, cents7=cents7: similarity.semantic_join(
                m.filter(F.col("vec_id") % 2 == 0),
                m.filter(F.col("vec_id") % 2 == 1),
                cents7,
                nprobe=2,
            ),
        )

    # Round-10 late widening: URL hygiene, novelty, perplexity buckets,
    # Poisson bootstrap (docs-shaped); PageRank on a synthetic degree-4
    # graph over the doc ids (nodes AND edges scale with the corpus —
    # the per-iteration shuffles are what's probed); Bloom report with
    # build/probe both over events keys.
    def _messy(d):
        return d.withColumn(
            "url",
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.COM:443/"),
                F.col("lang"), F.lit("/Page-"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("/?utm_source=feed&a=1#s-"),
                F.col("doc_id").cast("string"),
            ),
        )

    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"url_dedup {tag}",
            lambda d=d: dedup.dedup_by_canonical_url(
                _messy(d), "url",
                order_by=[F.col("n_chars").desc_nulls_last(), F.col("doc_id").asc()],
            ),
        )
        probe(f"token_novelty {tag}", lambda d=d: TX.token_novelty(d))
        probe(
            f"perplexity_buckets {tag}",
            lambda d=d: TX.perplexity_buckets(d, materialize_bigrams=True),
        )
        probe(
            f"poisson_bootstrap {tag}",
            lambda d=d: sampling.poisson_replicates(
                d.select("doc_id", "n_chars"), 32, ["doc_id"]
            ).groupBy("replicate").agg(F.sum("multiplicity").alias("k")),
        )
        probe(
            f"pagerank {tag}",
            lambda d=d: dedup.pagerank(
                d.select(F.col("doc_id").alias("id")),
                d.select(F.col("doc_id").alias("src"))
                .withColumn("_i", F.explode(F.sequence(F.lit(1), F.lit(4))))
                .select(
                    "src",
                    F.pmod(
                        F.xxhash64(F.col("src") * F.col("_i")), F.lit(997)
                    ).alias("dst"),
                    F.lit(1).alias("w"),
                ),
                n_iter=4,
            ),
        )
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"keyword_pagerank {tag}",
            lambda d=d: TX.keyword_pagerank(d, min_count=3, n_iter=4, k=15),
        )
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        # Two probe-shape corrections vs the naive form (which measured
        # 6.4s at 1x and >9 min at 10x — a property of the SYNTHETIC
        # graph, not the plan): (1) the replicated corpus repeats each
        # document's TEXT factor times, so ungrouped jaccard candidates
        # cross replicas and the pair list grows ~factor² — block on
        # (source, replica) so 10x means 10x DATA, not 10 extra copies
        # of every document wired into one clique; (2) max_degree is the
        # operator's stated production posture ("at crawl scale ALWAYS
        # set it") — wedge cost is Σ deg² over centers either way.
        probe(
            f"common_neighbors {tag}",
            lambda d=d: dedup.common_neighbor_pairs(
                dedup.jaccard_pairs(
                    d.withColumn(
                        "_blk",
                        F.concat_ws(
                            "/",
                            F.col("source"),
                            (F.col("doc_id") / 10_000_000).cast("long"),
                        ),
                    ),
                    group_col="_blk",
                    threshold=0.35,
                ).select("id_a", "id_b"),
                min_common=2,
                max_degree=64,
            ),
        )
    for tag, m in (("1x", emb1), (f"{factor}x", emb)):
        probe(
            f"binary_hamming {tag}",
            lambda m=m: similarity.binary_hamming_topk(
                m, [0.1] * 32 + [-0.1] * 32, k=20
            ),
        )
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"bloom_report {tag}",
            lambda e=e: __import__(
                "ddataframeoperation_spark.operators.skew", fromlist=["skew"]
            ).bloom_filter_report(
                e.filter(F.col("event_type") == "purchase"), "user_id",
                e, "user_id", n_bits=1 << 20,
            ),
        )

    # Round-13: the r12 wideners certified this round. HITS shares
    # pagerank's synthetic degree-4 graph (nodes AND edges scale with
    # the corpus; per-iteration shuffles are what's probed);
    # Adamic-Adar mirrors the common_neighbors probe (same wedge
    # machinery, weighted centers) with the same replica-salted block
    # so 10x means 10x data, not denser cliques; preference_pairs is
    # ONE argmin aggregate (groups constant, candidates 10x — the
    # worst case for the agg); brier is a scan + 1-row scorecard;
    # cusum/seasonal collapse to a daily aggregate before any window.
    from ddataframeoperation_spark.operators.timeseries import (
        cusum_changepoint,
        seasonal_mad_anomalies,
    )

    _cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    for tag, d in (("1x", docs1), (f"{factor}x", docs)):
        probe(
            f"hits {tag}",
            lambda d=d: dedup.hits(
                d.select(F.col("doc_id").alias("id")),
                d.select(F.col("doc_id").alias("src"))
                .withColumn("_i", F.explode(F.sequence(F.lit(1), F.lit(4))))
                .select(
                    "src",
                    F.pmod(
                        F.xxhash64(F.col("src") * F.col("_i")), F.lit(997)
                    ).alias("dst"),
                    F.lit(1).alias("w"),
                ),
                n_iter=4,
            ),
        )
        probe(
            f"adamic_adar {tag}",
            lambda d=d: dedup.adamic_adar_pairs(
                dedup.jaccard_pairs(
                    d.withColumn(
                        "_blk",
                        F.concat_ws(
                            "/",
                            F.col("source"),
                            (F.col("doc_id") / 10_000_000).cast("long"),
                        ),
                    ),
                    group_col="_blk",
                    threshold=0.35,
                ).select("id_a", "id_b"),
                min_common=2,
                max_degree=64,
            ),
        )
        probe(
            f"preference_pairs {tag}",
            lambda d=d: TX.preference_pairs(
                d.select(
                    (F.col("doc_id") % 97).alias("prompt_id"),
                    "doc_id",
                    F.col("n_chars").alias("score"),
                ),
                group_col="prompt_id",
                id_col="doc_id",
                score_col="score",
            ),
        )
        probe(
            f"brier_decomposition {tag}",
            lambda d=d: relational.brier_decomposition(
                d.select(
                    F.round(
                        F.least(
                            F.lit(1.0),
                            F.greatest(
                                F.lit(0.0), F.col("n_chars") / 2000.0 - 0.5
                            ),
                        ),
                        4,
                    ).alias("score"),
                    (F.col("lang") == "en").alias("label"),
                ),
                "score",
                "label",
            ),
        )
    for tag, e in (("1x", ev1), (f"{factor}x", ev)):
        probe(
            f"cusum_changepoint {tag}",
            lambda e=e: cusum_changepoint(e, "ts", _cents, "event_type"),
        )
        probe(
            f"seasonal_mad_anomalies {tag}",
            lambda e=e: seasonal_mad_anomalies(e, "ts", _cents, "event_type"),
        )
    ord1 = read_fixture_table(spark, SF, "orders")
    ordx = replicate(
        ord1, factor, ["o_orderkey", "o_custkey"], 10_000_000
    ).localCheckpoint()
    for tag, o in (("1x", ord1), (f"{factor}x", ordx)):
        probe(
            f"rfm_segments {tag}",
            lambda o=o: relational.rfm_segments(o),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
