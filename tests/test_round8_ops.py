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
