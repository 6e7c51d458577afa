"""Round-8 operator tests: Gopher quality rules, mixture reweighting,
join-key skew audit."""

from __future__ import annotations

import pytest


# --------------------------------------------------------- gopher_quality


def _gq(spark, rows):
    from ddataframeoperation_spark.operators.text import gopher_quality_signals

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in gopher_quality_signals(df).collect()}


def test_gopher_good_document_passes(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "to be with all of that other good text that people have written "
    ) * 3
    got = _gq(spark, [(1, good)])
    r = got[1]
    assert r["passes_gopher"] is True
    assert r["n_words"] >= 50 and 3.0 <= r["mean_word_len"] <= 10.0
    assert r["n_stop_hits"] >= 2


def test_gopher_rules_fail_individually(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "to be with all of that other good text that people have written "
    ) * 3
    rows = [
        (1, "too short to pass the fifty word minimum"),  # n_words < 50
        (2, base + " ##### " * 30),                       # symbol_ratio > 0.1
        (3, "\n".join(["- bullet line with the text of and to be"] * 60)),
        (4, base.replace(" ", "... ")),                   # ellipsis storm
        (5, " ".join(["12345 67890"] * 60)),              # alpha_frac = 0, no stopwords
    ]
    got = _gq(spark, rows)
    assert all(got[i]["passes_gopher"] is False for i in (1, 2, 3, 4, 5))
    assert got[2]["symbol_ratio"] > 0.1
    assert got[3]["bullet_frac"] > 0.9
    assert got[5]["alpha_frac"] == 0.0 and got[5]["n_stop_hits"] == 0


def test_gopher_signal_values_exact(spark):
    # 4 words, 16 word chars -> mean 4.0; one '#' and one '...' -> 2/4.
    got = _gq(spark, [(1, "abcd efgh ijkl mnop # ...")])
    r = got[1]
    # '#' and '...' normalize away, so words = 4 alpha tokens.
    assert r["n_words"] == 4
    assert r["mean_word_len"] == 4.0
    assert r["symbol_ratio"] == 0.5
    assert r["alpha_frac"] == 1.0


def test_gopher_empty_and_line_signals(spark):
    got = _gq(
        spark,
        [
            (1, ""),
            (2, "- first bullet\nplain line here\n* second bullet ends..."),
        ],
    )
    assert got[1]["n_words"] == 0 and got[1]["passes_gopher"] is False
    r = got[2]
    assert r["bullet_frac"] == round(2 / 3, 4)
    assert r["ellipsis_frac"] == round(1 / 3, 4)


# --------------------------------------------------------- mixture_weights


def test_mixture_weights_caps_and_deficits(spark):
    from ddataframeoperation_spark.operators.sampling import mixture_weights

    rows = [("en", 800), ("en", 200), ("fr", 100), ("zh", 4000)]
    df = spark.createDataFrame(rows, "lang string, n_tokens long")
    got = {
        r["lang"]: r
        for r in mixture_weights(
            df,
            {"en": 5000, "fr": 4000, "zh": 1000},
            budget_tokens=2000,
            source_col="lang",
            token_col="n_tokens",
        ).collect()
    }
    en = got["en"]  # avail 1000, target 1000 -> weight exactly 1.0
    assert (en["avail_tokens"], en["target_tokens"]) == (1000, 1000)
    assert en["weight_bp"] == 10000 and en["deficit_tokens"] == 0
    fr = got["fr"]  # avail 100 < target 800 -> capped, deficit 700
    assert fr["target_tokens"] == 800 and fr["weight_bp"] == 10000
    assert fr["expected_tokens"] == 100 and fr["deficit_tokens"] == 700
    zh = got["zh"]  # avail 4000 >> target 200 -> weight 200/4000 = 500bp
    assert zh["weight_bp"] == 500 and zh["deficit_tokens"] == 0


def test_mixture_weights_untargeted_domain_gets_zero(spark):
    from ddataframeoperation_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [("en", 100), ("xx", 900)], "lang string, n_tokens long"
    )
    got = {
        r["lang"]: r
        for r in mixture_weights(
            df, {"en": 10000}, 500, source_col="lang", token_col="n_tokens"
        ).collect()
    }
    assert got["xx"]["target_share_bp"] == 0
    assert got["xx"]["weight_bp"] == 0 and got["xx"]["expected_tokens"] == 0


def test_mixture_weights_validates_inputs(spark):
    from ddataframeoperation_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame([("en", 1)], "lang string, n_tokens long")
    with pytest.raises(ValueError, match="sum to 10000"):
        mixture_weights(df, {"en": 9999}, 100, source_col="lang")
    with pytest.raises(ValueError, match="budget_tokens"):
        mixture_weights(df, {"en": 10000}, -1, source_col="lang")


# ---------------------------------------------------------- key_skew_audit


def test_key_skew_audit_exact_counts_and_ties(spark):
    from ddataframeoperation_spark.operators.skew import key_skew_audit

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 3 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_audit(df, "k", top_n=3).collect()
    # count desc, key asc: a(6), then the b/c tie resolves alphabetically.
    assert [(r["key_value"], r["n_rows"]) for r in got] == [
        ("a", 6), ("b", 3), ("c", 3),
    ]
    r = got[0]
    assert (r["total_rows"], r["n_keys"]) == (14, 4)  # NULL is a key
    assert r["share_bp"] == (6 * 10000) // 14


def test_key_skew_audit_null_key_surfaces(spark):
    from ddataframeoperation_spark.operators.skew import key_skew_audit

    rows = [(None,)] * 5 + [("x",)] * 2
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_audit(df, "k", top_n=2).collect()
    assert got[0]["key_value"] is None and got[0]["n_rows"] == 5
    assert got[0]["share_bp"] == (5 * 10000) // 7
    with pytest.raises(ValueError):
        key_skew_audit(df, "k", top_n=0)


# ------------------------------------------------------ period_over_period


def test_period_over_period_exact_growth(spark):
    from pyspark.sql import functions as F

    from ddataframeoperation_spark.operators.windows import period_over_period

    rows = [
        ("a", "2024-01-01", 100.0),
        ("a", "2024-01-02", 150.0),
        ("a", "2024-01-03", 75.0),
        ("b", "2024-01-01", 10.0),
    ]
    df = spark.createDataFrame(rows, "g string, d string, v double").select(
        "g", F.col("d").cast("timestamp").alias("d"), "v"
    )
    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    got = {
        (r["g"], str(r["period"])[:10]): r
        for r in period_over_period(df, ["g"], F.col("d"), cents).collect()
    }
    assert got[("a", "2024-01-01")]["growth_bp"] is None
    assert got[("a", "2024-01-02")]["growth_bp"] == 5000   # +50%
    assert got[("a", "2024-01-03")]["growth_bp"] == -5000  # -50%
    assert got[("b", "2024-01-01")]["prev_cents"] is None


def test_period_over_period_truncates_like_duckdb(spark):
    import duckdb
    from pyspark.sql import functions as F

    from ddataframeoperation_spark.operators.windows import period_over_period

    # -1/3 period drop: truncating div must give -3333 on BOTH engines.
    rows = [("a", "2024-01-01", 3.0), ("a", "2024-01-02", 2.0)]
    df = spark.createDataFrame(rows, "g string, d string, v double").select(
        "g", F.col("d").cast("timestamp").alias("d"), "v"
    )
    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    r = {
        str(x["period"])[:10]: x["growth_bp"]
        for x in period_over_period(df, ["g"], F.col("d"), cents).collect()
    }
    duck = duckdb.sql("SELECT ((200 - 300) * 10000) // 300").fetchone()[0]
    assert r["2024-01-02"] == duck == -3333


# ------------------------------------------------------- embedding_health


def test_embedding_health_counts_every_defect(spark):
    from ddataframeoperation_spark.operators.similarity import embedding_health

    rows = [
        (1, [1.0, 2.0, 3.0]),          # healthy
        (2, None),                      # null
        (3, [1.0, 2.0]),                # wrong dim
        (4, [0.0, 0.0, 0.0]),           # all zero
        (5, [1.0, float("nan"), 3.0]),  # NaN
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_health(df, expected_dim=3).collect()[0]
    assert (
        r["n_vecs"], r["n_null_vecs"], r["n_dim_mismatch"],
        r["n_zero_vecs"], r["n_nan_vecs"],
    ) == (5, 1, 1, 1, 1)


def test_embedding_health_validates_dim(spark):
    from ddataframeoperation_spark.operators.similarity import embedding_health

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        embedding_health(df, expected_dim=0)


# ------------------------------------------------------- time_to_convert


def test_time_to_convert_buckets_and_nonconverters(spark):
    from pyspark.sql import functions as F

    from ddataframeoperation_spark.operators.windows import time_to_convert

    rows = [
        # u1: click 00:00, purchase 00:30 -> bucket 0 (60-min buckets)
        (1, "2024-01-01 00:00:00", "click"),
        (1, "2024-01-01 00:30:00", "purchase"),
        # u2: click 00:00, purchase 02:30 -> bucket 2
        (2, "2024-01-01 00:00:00", "click"),
        (2, "2024-01-01 02:30:00", "purchase"),
        # u3: click but never purchases -> bucket -1
        (3, "2024-01-01 05:00:00", "click"),
        # u4: purchase BEFORE any click (ignored), then click, no later
        # purchase -> bucket -1
        (4, "2024-01-01 00:00:00", "purchase"),
        (4, "2024-01-01 01:00:00", "click"),
        # u5: never clicks -> absent entirely
        (5, "2024-01-01 00:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    got = {
        r["latency_bucket"]: r["n_users"]
        for r in time_to_convert(
            df, "click", "purchase", bucket_minutes=60
        ).collect()
    }
    assert got == {0: 1, 2: 1, -1: 2}


def test_time_to_convert_same_instant_is_zero_latency(spark):
    from pyspark.sql import functions as F

    from ddataframeoperation_spark.operators.windows import time_to_convert

    rows = [
        (1, "2024-01-01 00:00:00", "click"),
        (1, "2024-01-01 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    got = time_to_convert(df, "click", "purchase", bucket_minutes=60).collect()
    assert {(r["latency_bucket"], r["n_users"]) for r in got} == {(0, 1)}
    with pytest.raises(ValueError):
        time_to_convert(df, "click", "purchase", bucket_minutes=0)


# ----------------------------------------------------- partitioned sink


def test_dynamic_partition_overwrite_preserves_siblings(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "psink")
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr"), (4, "de")], "doc_id long, lang string"
    )
    df.write.mode("overwrite").partitionBy("lang").parquet(out)
    # Dynamic overwrite of ONE partition must leave the others intact...
    df.filter(F.col("lang") == "en").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("lang").parquet(out)
    back = {
        (r["lang"], r["doc_id"]) for r in spark.read.parquet(out).collect()
    }
    assert back == {("en", 1), ("en", 2), ("fr", 3), ("de", 4)}
    # ...where STATIC overwrite clobbers them (the failure mode the
    # dynamic option exists to prevent).
    df.filter(F.col("lang") == "en").write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("lang").parquet(out)
    langs = {r["lang"] for r in spark.read.parquet(out).collect()}
    assert langs == {"en"}


# -------------------------------------------------------- calibration_bins


def test_calibration_bins_exact_counts_and_midpoints(spark):
    from ddataframeoperation_spark.operators.relational import calibration_bins

    rows = [
        (0.05, True), (0.08, False),          # bin 0: 1/2 pos
        (0.55, True), (0.58, True),           # bin 5: 2/2
        (1.0, False),                          # score 1.0 -> TOP bin (9)
        (0.95, True),                          # bin 9: with the 1.0 row, 1/2
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "score", "label").collect()}
    assert got[0]["n"] == 2 and got[0]["n_pos"] == 1
    assert got[0]["pos_rate_bp"] == 5000 and got[0]["mid_bp"] == 500
    assert got[5]["pos_rate_bp"] == 10000 and got[5]["mid_bp"] == 5500
    assert got[9]["n"] == 2 and got[9]["n_pos"] == 1  # 1.0 stays in-bin
    assert got[9]["mid_bp"] == 9500


def test_calibration_bins_drops_nulls_and_validates(spark):
    from ddataframeoperation_spark.operators.relational import calibration_bins

    rows = [(0.5, True), (None, True), (0.5, None)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = calibration_bins(df, "score", "label").collect()
    assert len(got) == 1 and got[0]["n"] == 1
    with pytest.raises(ValueError):
        calibration_bins(df, "score", "label", n_bins=1)


# ---------------------------------------------------------- churn_cohorts


def test_churn_cohorts_exact_boundary(spark):
    import datetime

    from ddataframeoperation_spark.operators.windows import churn_cohorts

    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        # u1: first Jan-1, last Jan-20 (active at max=Jan-21, 14d window)
        (1, base), (1, base + datetime.timedelta(days=19)),
        # u2: first Jan-1, last Jan-2 -> churned (> 14d before Jan-21)
        (2, base), (2, base + datetime.timedelta(days=1)),
        # u3: first Jan-8 (next week cohort), last = Jan-21 = corpus max
        (3, base + datetime.timedelta(days=7)),
        (3, base + datetime.timedelta(days=20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        str(r["cohort_week"])[:10]: (r["n_users"], r["n_churned"], r["churn_bp"])
        for r in churn_cohorts(df, inactive_days=14).collect()
    }
    assert got["2024-01-01"] == (2, 1, 5000)
    assert got["2024-01-08"] == (1, 0, 0)
    with pytest.raises(ValueError):
        churn_cohorts(df, inactive_days=0)
    with pytest.raises(ValueError):
        churn_cohorts(df, cohort_granularity="quarter")


# ------------------------------------------------------ dup_rate_by_source


def test_dup_rate_by_source_charges_later_source(spark):
    from ddataframeoperation_spark.operators.dedup import dup_rate_by_source

    rows = [
        (1, "srcA", "hello world"),
        (2, "srcB", "HELLO,  world!"),   # normalized dup of 1 -> srcB charged
        (3, "srcB", "unique text here"),
        (4, "srcA", "hello world"),      # dup of 1 -> srcA charged
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in dup_rate_by_source(df).collect()}
    assert (got["srcA"]["n_docs"], got["srcA"]["n_dups"]) == (2, 1)
    assert got["srcA"]["dup_bp"] == 5000
    assert (got["srcB"]["n_docs"], got["srcB"]["n_dups"]) == (2, 1)


# -------------------------------------------------------- calendar_spine


def test_calendar_spine_attributes_exact(spark):
    import datetime

    from ddataframeoperation_spark.operators.timeseries import calendar_spine

    # Span Fri 2024-03-29 .. Mon 2024-04-01: crosses month/quarter AND a
    # weekend, and pins the ISO day-of-week convention.
    rows = [
        (datetime.datetime(2024, 3, 29, 15, 30),),
        (datetime.datetime(2024, 4, 1, 2, 0),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {str(r["day"])[:10]: r for r in calendar_spine(df).collect()}
    assert sorted(got) == ["2024-03-29", "2024-03-30", "2024-03-31", "2024-04-01"]
    fri = got["2024-03-29"]
    assert (fri["day_of_week"], fri["is_weekend"], fri["quarter"]) == (5, False, 1)
    sat = got["2024-03-30"]
    assert (sat["day_of_week"], sat["is_weekend"]) == (6, True)
    sun = got["2024-03-31"]
    assert (sun["day_of_week"], sun["is_weekend"]) == (7, True)
    mon = got["2024-04-01"]
    assert (mon["day_of_week"], mon["month"], mon["quarter"]) == (1, 4, 2)
    assert str(mon["week_start"])[:10] == "2024-04-01"
