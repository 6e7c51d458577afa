"""Round-10 contract tests: the r9 VERDICT/ADVICE fixes.

1. gain_chart's gain/lift arithmetic survives 2^63-adjacent counts
   (numerators lifted to DECIMAL(38,0), like auc_exact).
2. join_fanout_estimate's per-key product survives >3.1e9-row keys
   (the fanout bomb must be REPORTED, not die in ANSI overflow).
3. join_strategy_advice on an EMPTY fact emits zero rows.
4. join_strategy_advice count ties resolve NULLS-LAST (non-null key
   wins a tie; NULL wins only when strictly heaviest).
"""

from __future__ import annotations

import pyspark.sql.functions as F


# ------------------------------------------- gain_chart overflow arithmetic


def test_gain_lift_exact_at_2e63_adjacent_counts(spark):
    # A 10^12-row corpus (the 100 TB scale): the lift numerator
    # cum_pos * tn * 10000 ~ 4e27 >> 2^63 — long arithmetic would raise
    # under ANSI; the DECIMAL(38,0) lift must return the exact
    # floor-division value. (The documented exactness bound is ~10^16
    # rows, where the numerator reaches DECIMAL(38,0)'s 10^38 cap.)
    from ddataframeoperation_spark.operators.relational import (
        _gain_lift_columns,
    )

    cum_pos, cum_n = 400_000_000_000, 500_000_000_000
    tn, tp = 1_000_000_000_000, 450_000_000_000
    df = spark.createDataFrame(
        [(cum_pos, cum_n, tn, tp)],
        "cum_pos long, cum_n long, _tn long, _tp long",
    )
    gain, lift = _gain_lift_columns()
    row = df.select(gain.alias("g"), lift.alias("l")).collect()[0]
    assert row["g"] == (cum_pos * 10000) // tp
    assert row["l"] == (cum_pos * tn * 10000) // (cum_n * tp)
    # And the zero-guard branches still emit 0, typed long.
    z = spark.createDataFrame(
        [(1, 0, 1, 0)], "cum_pos long, cum_n long, _tn long, _tp long"
    )
    rz = z.select(gain.alias("g"), lift.alias("l")).collect()[0]
    assert rz["g"] == 0 and rz["l"] == 0


def test_gain_chart_small_data_unchanged(spark):
    # The lift to DECIMAL must not change small-count results.
    from ddataframeoperation_spark.operators.relational import gain_chart

    rows = [(i / 10.0, i >= 5) for i in range(10)]
    out = gain_chart(
        spark.createDataFrame(rows, "score double, label boolean"),
        "score",
        "label",
        n_bins=5,
    ).orderBy("bucket").collect()
    # Perfect separation: top bucket(s) hold only positives.
    assert out[0]["gain_bp"] > 0
    assert out[-1]["gain_bp"] == 10000  # full depth captures everything
    assert out[-1]["lift_bp"] == 10000  # full depth = random = 10000
    for r in out:
        assert isinstance(r["gain_bp"], int) and isinstance(r["lift_bp"], int)


# --------------------------------------------- join_fanout per-key overflow


def test_join_fanout_survives_fanout_bomb_counts(spark):
    # One key with 4e9 rows on both sides: product 1.6e19 > 2^63. The
    # detector's whole purpose is to REPORT this key; feed synthetic
    # censuses (no data materialization) through the factored core.
    from ddataframeoperation_spark.operators.skew import (
        _fanout_from_censuses,
    )

    bomb = 4_000_000_000
    lc = spark.createDataFrame(
        [("bomb", bomb), ("ok", 10)], "key_value string, left_rows long"
    )
    rc = spark.createDataFrame(
        [("bomb", bomb), ("ok", 7)], "key_value string, right_rows long"
    )
    rows = _fanout_from_censuses(lc, rc, top_n=5).collect()
    got = {r["key_value"]: r for r in rows}
    assert got["bomb"]["out_rows"] == str(bomb * bomb)  # 1.6e19, exact
    assert got["ok"]["out_rows"] == "70"
    assert rows[0]["total_out_rows"] == str(bomb * bomb + 70)
    assert all(r["matched_keys"] == 2 for r in rows)
    # Ordering is by the NUMERIC product, not the shipped string.
    assert rows[0]["key_value"] == "bomb"


# ---------------------------------------------- join_strategy_advice guards


def test_join_advisor_empty_fact_emits_no_row(spark):
    from ddataframeoperation_spark.operators.skew import join_strategy_advice

    fact = spark.createDataFrame([], "k long, v long")
    dim = spark.createDataFrame([(1, 1)], "k long, v long")
    assert join_strategy_advice(fact, "k", dim, "k").count() == 0


def test_join_advisor_null_key_tiebreak_nulls_last(spark):
    from ddataframeoperation_spark.operators.skew import join_strategy_advice

    dim = spark.createDataFrame([(1, 1)], "k long, v long")
    # Tie between a NULL key and a real key: the real key must win
    # (DuckDB ORDER BY k ASC defaults NULLS LAST; the contract makes
    # Spark match instead of struct-compare's nulls-first).
    tied = spark.createDataFrame([(None, 0), ("a", 0)], "k string, v long")
    r = join_strategy_advice(tied, "k", dim, "k").collect()[0]
    assert r["fact_top_key"] == "a"
    # NULL strictly heaviest: NULL is the honest answer (the classic
    # accidental hot key) and must still surface.
    nullheavy = spark.createDataFrame(
        [(None, 0), (None, 1), ("a", 0)], "k string, v long"
    )
    r2 = join_strategy_advice(nullheavy, "k", dim, "k").collect()[0]
    assert r2["fact_top_key"] is None
    assert r2["fact_rows"] == 3 and r2["fact_keys"] == 2


# ------------------------------------------------ degree census integer div


def test_degree_census_edge_total_is_integer_exact(spark):
    # n_edges_total now comes from `sum(degree) div 2` (integer), not a
    # double division — values must stay exact and typed long.
    from ddataframeoperation_spark.operators.dedup import pair_degree_census

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    rows = pair_degree_census(pairs).collect()
    assert all(r["n_edges_total"] == 4 for r in rows)
    assert dict(pair_degree_census(pairs).dtypes)["n_edges_total"] == "bigint"
