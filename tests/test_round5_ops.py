"""Round-5 widening operators: OHLC bars, EWMA, robust outliers,
null-safe join, weighted/temperature sampling, lexical diversity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import relational as R
from ddataframeoperation_spark.operators import sampling
from ddataframeoperation_spark.operators import text as TX
from ddataframeoperation_spark.operators.timeseries import ewma, ohlc_bars


def _events(spark):
    rows = [
        # (event_id, ts, key, value) — two keys, one hour bucket each plus
        # a second bucket for key 1; equal-ts tie inside key 2.
        (1, "2024-03-01 10:05:00", 1, 10.0),
        (2, "2024-03-01 10:20:00", 1, 30.0),
        (3, "2024-03-01 10:50:00", 1, 20.0),
        (4, "2024-03-01 11:10:00", 1, 5.0),
        (5, "2024-03-01 10:00:00", 2, 7.0),
        (6, "2024-03-01 10:00:00", 2, 9.0),  # same ts as id 5 — tiebreak
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_ohlc_open_close_high_low(spark):
    out = ohlc_bars(
        _events(spark), "user_id", "ts", "value", "hour", tiebreak_col="event_id"
    )
    bars = {(r["user_id"], str(r["bucket"])): r for r in out.collect()}
    b = bars[(1, "2024-03-01 10:00:00")]
    assert (b["open"], b["high"], b["low"], b["close"]) == (10.0, 30.0, 10.0, 20.0)
    assert b["n_obs"] == 3 and b["mean_value"] == 20.0
    # Equal timestamps: the tiebreak (event_id) decides open/close.
    t = bars[(2, "2024-03-01 10:00:00")]
    assert (t["open"], t["close"]) == (7.0, 9.0)
    assert bars[(1, "2024-03-01 11:00:00")]["open"] == 5.0


def test_ewma_matches_hand_fold(spark):
    out = {r["user_id"]: r for r in
           ewma(_events(spark), "user_id", "ts", "value",
                alpha=0.5, tiebreak_col="event_id").collect()}
    # key 1: 10 -> .5*30+.5*10=20 -> .5*20+.5*20=20 -> .5*5+.5*20=12.5
    assert out[1]["ewma"] == 12.5 and out[1]["n_obs"] == 4
    # key 2: seed 7 (tiebreak), then .5*9+.5*7
    assert out[2]["ewma"] == 8.0


def test_ewma_single_obs_and_alpha_validation(spark):
    one = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 9, 3.5)],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = ewma(one, "user_id", "ts", "value").collect()[0]
    assert row["ewma"] == 3.5 and row["n_obs"] == 1
    with pytest.raises(ValueError):
        ewma(one, "user_id", "ts", "value", alpha=0.0)


def test_mad_outliers_flags_only_the_spike(spark):
    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("b", 5.0), ("b", 6.0), ("b", 7.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = R.mad_outliers(df, "g", "v", k=3.0)
    flagged = [r["v"] for r in out.collect() if r["is_outlier"]]
    assert flagged == [1000.0]
    # Stats are constant per group and robust to the spike.
    a = [r for r in out.collect() if r["g"] == "a"][0]
    assert a["group_median"] == 12.5


def test_join_nullsafe_matches_null_keys(spark):
    left = spark.createDataFrame([(1, None), (2, 7), (3, 8)], "id long, k int")
    right = spark.createDataFrame([(None, "nil"), (7, "seven")], "k2 int, name string")
    got = {
        (r["id"], r["name"])
        for r in R.join_nullsafe(left, right, "k", "k2").collect()
    }
    assert got == {(1, "nil"), (2, "seven")}  # NULL<=>NULL matches; 8 drops


def test_weighted_sample_prefers_heavy_rows(spark):
    # One row dominates the weight mass -> it must be in any small sample;
    # zero/NULL weights are excluded by contract.
    rows = [(i, 1) for i in range(1, 50)] + [(99, 10**9), (100, 0), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in
           sampling.weighted_sample(df, 5, "w", ["doc_id"], id_order=["doc_id"]).collect()}
    assert 99 in got and 100 not in got and 101 not in got and len(got) == 5
    # Deterministic: same call, same sample.
    again = {r["doc_id"] for r in
             sampling.weighted_sample(df, 5, "w", ["doc_id"], id_order=["doc_id"]).collect()}
    assert got == again


def test_temperature_mix_quota_flattening(spark):
    # 400 'big' vs 16 'small': proportional mixing would give 25:1; at
    # tau=0.5 quotas follow sqrt(n) -> 20:4 = 5:1 for total=24.
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_mix(df, 24, "source", ["doc_id"])
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 20, "small": 4}
    with pytest.raises(ValueError):
        sampling.temperature_mix(df, 0, "source", ["doc_id"])


def test_lexical_diversity_contracts(spark):
    rows = [
        (1, "spam spam spam spam"),           # ttr 0.25, novelty 1/3
        (2, "all distinct words here"),        # ttr 1.0, novelty 1.0
        (3, None),                             # NULL -> [''] token, no bigrams
        (4, "one"),                            # single token -> novelty NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.lexical_diversity(df).collect()}
    assert out[1]["ttr"] == 0.25 and out[1]["bigram_novelty"] == 0.3333
    assert out[2]["ttr"] == 1.0 and out[2]["bigram_novelty"] == 1.0
    assert out[3]["n_tokens"] == 1 and out[3]["bigram_novelty"] is None
    assert out[4]["bigram_novelty"] is None


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes view->click->purchase in order.
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:05:00", 1, "click"),
        (3, "2024-01-01 10:10:00", 1, "purchase"),
        # u2 clicked BEFORE first view -> stops at step 1.
        (4, "2024-01-02 09:00:00", 2, "click"),
        (5, "2024-01-02 10:00:00", 2, "view"),
        # u3 never viewed -> counted nowhere.
        (6, "2024-01-03 10:00:00", 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from ddataframeoperation_spark.operators.windows import funnel_counts

    out = {r["step"]: (r["step_name"], r["n_users"])
           for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert out == {1: ("view", 2), 2: ("click", 1), 3: ("purchase", 1)}
    with pytest.raises(ValueError):
        funnel_counts(df, [])


def test_retention_cohorts_offsets(spark):
    rows = [
        # u1 first active Mon 2024-01-01 week; returns 8 days later (offset 1)
        (1, "2024-01-02 10:00:00", 1),
        (2, "2024-01-10 10:00:00", 1),
        # u2 active once, same week as u1's cohort.
        (3, "2024-01-03 10:00:00", 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    from ddataframeoperation_spark.operators.windows import retention_cohorts

    out = {(str(r["cohort"]), r["period_offset"]): r["n_users"]
           for r in retention_cohorts(df).collect()}
    assert out == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}


def test_label_centroids_and_confusion(spark):
    rows = [
        (1, [0.0, 0.0], 0),
        (2, [0.0, 2.0], 0),   # label-0 centroid = (0, 1)
        (3, [10.0, 10.0], 1),
        (4, [12.0, 10.0], 1),  # label-1 centroid = (11, 10)
        (5, [10.9, 9.9], 0),   # mislabeled: nearest centroid is label 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from ddataframeoperation_spark.operators.similarity import (
        label_centroids,
        nearest_centroid_confusion,
    )

    cents = {r["label"]: r["centroid"] for r in label_centroids(df).collect()}
    assert cents[1] == [11.0, 10.0]
    # label-0 centroid includes the stray point: mean of (0,0),(0,2),(10.9,9.9)
    assert [round(v, 4) for v in cents[0]] == [3.6333, 3.9667]
    conf = {(r["label"], r["assigned_label"]): r["n_vecs"]
            for r in nearest_centroid_confusion(df).collect()}
    assert conf[(0, 0)] == 2 and conf[(0, 1)] == 1 and conf[(1, 1)] == 2


def test_pareto_frontier_2d(spark):
    rows = [
        (1, 1.0, 9),   # frontier (cheapest)
        (2, 2.0, 5),   # frontier
        (3, 3.0, 5),   # dominated by 2 (same size, pricier)
        (4, 3.0, 1),   # frontier
        (5, 4.0, 1),   # dominated by 4
        (6, 2.0, 5),   # tie with 2 on both -> co-frontier
        (7, None, 1),  # NULL attribute -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    got = {r["id"] for r in
           R.pareto_frontier_2d(df, "price", "size").collect()}
    assert got == {1, 2, 4, 6}


def test_transition_counts_with_terminals(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:01:00", 1, "click"),
        (3, "2024-01-01 10:02:00", 1, "click"),
        (4, "2024-01-02 09:00:00", 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from ddataframeoperation_spark.operators.windows import transition_counts

    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_counts(df, tiebreak=["event_id"]).collect()}
    # u1: view->click->click->END; u2: view->END
    assert got == {("view", "click"): 1, ("click", "click"): 1,
                   ("click", None): 1, ("view", None): 1}


def test_winsorize_clips_to_group_percentiles(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = R.winsorize(df, "g", "v", 0.0, 0.5)  # clip to [min, median]
    vals = sorted(r["winsorized"] for r in out.collect())
    assert max(vals) == 6.0  # median of 1..10,1000 is 6
    assert min(vals) == 1.0
    with pytest.raises(ValueError):
        R.winsorize(df, "g", "v", 0.9, 0.1)


def test_debounce_drops_rapid_followers(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 10:00:02", 1),   # 2s after prev -> dropped
        (3, "2024-01-01 10:00:09", 1),   # 7s after DROPPED prev (lag
                                          # semantics: vs row 2) -> kept
        (4, "2024-01-01 10:00:00", 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    from ddataframeoperation_spark.operators.windows import debounce

    kept = {r["event_id"]
            for r in debounce(df, min_gap_seconds=5.0, tiebreak=["event_id"]).collect()}
    assert kept == {1, 3, 4}


def test_corpus_balance_uniform_vs_skewed(spark):
    import math

    rows = [(i, "en", "s%d" % (i % 4)) for i in range(8)] + [
        (100 + i, "de", "only") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {r["lang"]: r for r in TX.corpus_balance(df).collect()}
    # Uniform 4-way mix: entropy ln(4), hhi 0.25; single source: 0 / 1.
    assert out["en"]["source_entropy"] == round(math.log(4), 4)
    assert out["en"]["hhi"] == 0.25 and out["en"]["n_sources"] == 4
    assert out["de"]["source_entropy"] in (0.0, -0.0)
    assert out["de"]["hhi"] == 1.0 and out["de"]["top_source_share"] == 1.0


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0)], "k long, v double"
    )
    got = {r["k"]: r["change_type"]
           for r in R.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "deleted", 4: "inserted"}


def test_snapshot_diff_null_attrs_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v double")
    new = spark.createDataFrame([(1, None), (2, 5.0)], "k long, v double")
    got = {r["k"]: r["change_type"]
           for r in R.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: "unchanged", 2: "changed"}  # NULL == NULL, NULL != 5


def test_twap_weights_by_holding_time(spark):
    rows = [
        # v=10 held 10s, v=20 held 30s, v=99 last (no duration, excluded)
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (2, "2024-01-01 00:00:10", 1, 20.0),
        (3, "2024-01-01 00:00:40", 1, 99.0),
        (4, "2024-01-01 00:00:00", 2, 5.0),   # single obs -> key drops
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from ddataframeoperation_spark.operators.timeseries import twap

    out = {r["user_id"]: r for r in
           twap(df, "user_id", "ts", "value", tiebreak_col="event_id").collect()}
    assert out[1]["twap"] == 17.5  # (10*10 + 20*30)/40
    assert out[1]["n_intervals"] == 2
    assert 2 not in out


def test_scd2_asof_boundary_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "bronze"),
        (2, "2024-01-05 00:00:00", 1, "silver"),
        (3, "2024-01-09 00:00:00", 1, "gold"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from ddataframeoperation_spark.operators.windows import scd2_history

    hist = scd2_history(ev, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"])
    probes = spark.createDataFrame(
        [("2024-01-05 00:00:00",), ("2024-01-08 23:59:59",), ("2024-02-01 00:00:00",)],
        "t string",
    ).select(F.col("t").cast("timestamp").alias("as_of"))
    j = hist.join(
        F.broadcast(probes),
        (F.col("valid_from") <= F.col("as_of"))
        & (F.col("valid_to").isNull() | (F.col("as_of") < F.col("valid_to"))),
    )
    got = {str(r["as_of"]): r["event_type"] for r in j.collect()}
    # Boundary instant belongs to the NEW interval (from-inclusive).
    assert got["2024-01-05 00:00:00"] == "silver"
    assert got["2024-01-08 23:59:59"] == "silver"
    assert got["2024-02-01 00:00:00"] == "gold"  # open current row


def test_kfold_disjoint_exhaustive_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = sampling.kfold_assign(df, 5, ["id"]).collect()
    folds = [r["fold"] for r in out]
    assert len(folds) == 500 and set(folds) <= {0, 1, 2, 3, 4}
    # roughly balanced (hash-uniform): every fold populated
    assert len(set(folds)) == 5
    again = [r["fold"] for r in sampling.kfold_assign(df, 5, ["id"]).collect()]
    assert folds == again
    with pytest.raises(ValueError):
        sampling.kfold_assign(df, 1, ["id"])


def test_kfold_null_key_gets_null_fold(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "id long")
    out = {r["id"]: r["fold"] for r in
           sampling.kfold_assign(df, 5, ["id"]).collect()}
    # least() skips NULLs — without the isNotNull guard the NULL-key row
    # would silently land in fold k-1 instead of fold NULL.
    assert out[None] is None
    assert out[1] is not None and out[2] is not None
