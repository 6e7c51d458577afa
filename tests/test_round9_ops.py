"""Round-9 contract tests: the four r8 ADVICE fixes.

1. mixture_weights emits fully-missing targeted domains (full-outer join).
2. dup_rate_by_source coalesces NULL text before fingerprinting.
3. calibration_bins clamps out-of-range scores at BOTH ends.
4. The Q21 re-plan stays exact when l_shipdate contains NULLs.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


# ----------------------------------------------- mixture_weights full-outer


def test_mixture_weights_missing_targeted_domain_surfaces(spark):
    # A targeted domain with ZERO corpus presence must still emit a row:
    # the total deficit is exactly the signal the planner needs.
    from ddataframeoperation_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame([("en", 1000)], "lang string, n_tokens long")
    got = {
        r["lang"]: r
        for r in mixture_weights(
            df,
            {"en": 5000, "fr": 5000},
            budget_tokens=2000,
            source_col="lang",
            token_col="n_tokens",
        ).collect()
    }
    assert set(got) == {"en", "fr"}
    fr = got["fr"]
    assert fr["avail_tokens"] == 0
    assert fr["target_tokens"] == 1000
    assert fr["weight_bp"] == 0
    assert fr["expected_tokens"] == 0
    assert fr["deficit_tokens"] == 1000  # the whole target is missing
    en = got["en"]  # untouched by the join change
    assert en["avail_tokens"] == 1000 and en["deficit_tokens"] == 0


# ------------------------------------------ dup_rate_by_source NULL text


def test_dup_rate_null_text_joins_empty_fingerprint_group(spark):
    # NULL text fingerprints as '' (coalesce-before-fingerprint contract):
    # two NULL-text docs and one ''-text doc form ONE group of 3 — the
    # later two count as dups, charged to their own sources.
    from ddataframeoperation_spark.operators.dedup import dup_rate_by_source

    rows = [
        (1, "a", None),
        (2, "b", None),
        (3, "b", ""),
        (4, "a", "unique real text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in dup_rate_by_source(df).collect()}
    # doc 1 survives the empty group; docs 2 and 3 are dups of it.
    assert got["a"]["n_docs"] == 2 and got["a"]["n_dups"] == 0
    assert got["b"]["n_docs"] == 2 and got["b"]["n_dups"] == 2
    assert got["b"]["dup_bp"] == 10000


# --------------------------------------------- calibration_bins clamping


def test_calibration_bins_clamps_both_ends(spark):
    from ddataframeoperation_spark.operators.relational import calibration_bins

    rows = [(-0.3, True), (-0.01, False), (0.05, True), (1.0, False), (1.7, True)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "score", "label").collect()}
    # No negative phantom bins, no bin past the top.
    assert set(got) == {0, 9}
    assert got[0]["n"] == 3 and got[0]["n_pos"] == 2  # -0.3, -0.01, 0.05
    assert got[0]["mid_bp"] == 500
    assert got[9]["n"] == 2 and got[9]["n_pos"] == 1  # 1.0, 1.7
    assert got[9]["mid_bp"] == 9500


# ----------------------------------------------- Q21 NULL-shipdate exactness


def _write_q21_fixture(spark, path):
    d = dt.date
    # Order 1: supplier 10 ships last -> qualifies; supplier 11 earlier.
    # Order 2: supplier 12 has ONLY a NULL shipdate -> the textbook
    #          NOT EXISTS qualifies it unconditionally; supplier 10 holds
    #          the real max and qualifies too.
    # Order 3: single supplier -> EXISTS(other supplier) fails, nobody.
    li = spark.createDataFrame(
        [
            (1, 10, d(1995, 3, 2)),
            (1, 11, d(1995, 3, 1)),
            (2, 10, d(1995, 5, 5)),
            (2, 12, None),
            (3, 10, d(1995, 1, 1)),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate date",
    )
    orders = spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F")], "o_orderkey long, o_orderstatus string"
    )
    supp = spark.createDataFrame(
        [(10, "S10"), (11, "S11"), (12, "S12")],
        "s_suppkey long, s_name string",
    )
    li.write.parquet(f"{path}/lineitem.parquet")
    orders.write.parquet(f"{path}/orders.parquet")
    supp.write.parquet(f"{path}/supplier.parquet")


def test_q21_replan_exact_with_null_shipdates(spark, tmp_path):
    from ddataframeoperation_spark.queries import QUERIES

    _write_q21_fixture(spark, str(tmp_path))
    got = {
        r["s_name"]: r["numwait"]
        for r in QUERIES["b10_q21_waiting_suppliers"](spark, str(tmp_path)).collect()
    }
    # Textbook semantics: S10 waits on orders 1 and 2; S12's NULL row
    # passes the NOT EXISTS, so S12 qualifies on order 2; S11 shipped
    # earlier than S10 on order 1 -> excluded; order 3 has one supplier.
    assert got == {"S10": 2, "S12": 1}
