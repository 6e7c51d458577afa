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


# ------------------------------------------------ join_strategy_advice


def _advise(spark, fact_rows, dim_n, **kw):
    from ddataframeoperation_spark.operators.skew import join_strategy_advice

    fact = spark.createDataFrame(fact_rows, "k long, v long")
    dim = spark.createDataFrame([(i,) for i in range(dim_n)], "k long")
    return join_strategy_advice(fact, "k", dim, "k", **kw).collect()[0]


def test_join_advisor_broadcast_wins_first(spark):
    # Small dim => broadcast, even with a pathologically hot fact key.
    rows = [(1, i) for i in range(99)] + [(2, 0)]
    r = _advise(spark, rows, 10, broadcast_max_rows=10, skew_share_bp=500)
    assert r["strategy"] == "broadcast" and r["salt_buckets"] == 0
    assert r["fact_top_key"] == "1" and r["fact_top_share_bp"] == 9900


def test_join_advisor_salted_with_bucket_count(spark):
    rows = [(1, i) for i in range(50)] + [(k, 0) for k in range(2, 52)]
    r = _advise(
        spark, rows, 1000, broadcast_max_rows=10, skew_share_bp=4000,
        target_parallelism=200,
    )
    # top key share = 50/100 = 5000bp >= 4000 -> salted;
    # buckets = (5000 * 200) div 10000 + 1 = 101.
    assert r["strategy"] == "salted" and r["salt_buckets"] == 101
    assert (r["fact_rows"], r["fact_keys"], r["dim_rows"]) == (100, 51, 1000)


def test_join_advisor_shuffle_and_tiebreak(spark):
    # Uniform keys, big dim -> plain shuffle; count ties resolve to the
    # smallest key STRING ('10' < '9' lexicographically).
    rows = [(9, 0), (10, 0)]
    r = _advise(spark, rows, 100, broadcast_max_rows=10, skew_share_bp=6000)
    assert r["strategy"] == "shuffle" and r["salt_buckets"] == 0
    assert r["fact_top_key"] == "10"


def test_join_advisor_validates(spark):
    import pytest as _pytest

    from ddataframeoperation_spark.operators.skew import join_strategy_advice

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with _pytest.raises(ValueError, match="skew_share_bp"):
        join_strategy_advice(df, "k", df, "k", skew_share_bp=0)
    with _pytest.raises(ValueError, match="target_parallelism"):
        join_strategy_advice(df, "k", df, "k", target_parallelism=0)


# ---------------------------------------------------- bpe_train_step


def test_bpe_train_step_banana_exact(spark):
    from ddataframeoperation_spark.operators.text import bpe_train_step

    docs = spark.createDataFrame(
        [(1, "banana banana banana bandana bandana"), (2, "a banana for anna")],
        "doc_id long, text string",
    )
    rows = bpe_train_step(docs, top_n=5).collect()
    # 'an' is the top merge: 2 per banana (x4), 2 per bandana (x2), 1 in
    # anna = 13 weighted. After the merge no 'a<n' adjacency survives and
    # every word reconstructs exactly.
    assert all(r["merge_pair"] == "an" and r["merge_count"] == 13 for r in rows)
    assert all(r["residual_count"] == 0 and r["broken_words"] == 0 for r in rows)
    got = {r["pair"]: r["pair_count"] for r in rows}
    # banana -> b,an,an,a (x4): (b,an) 4, (an,an) 4, (an,a) 4;
    # bandana -> b,an,d,an,a (x2): (b,an) 2, (an,d) 2, (d,an) 2, (an,a) 2;
    # anna -> an,n,a: (an,n) 1, (n,a) 1; 'for' -> f+o 1, o+r 1.
    assert got["an+a"] == 6 and got["b+an"] == 6 and got["an+an"] == 4
    assert got["an+d"] == 2 and got["d+an"] == 2


def test_bpe_train_step_word_collapses_to_single_symbol(spark):
    from ddataframeoperation_spark.operators.text import bpe_train_step

    # Corpus of one 2-char word: the merge consumes the whole word —
    # zero post-merge pairs, and the single-symbol branch must not
    # touch element_at(_s, 0) (Spark's sequence(1, 0) is DESCENDING).
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    rows = bpe_train_step(docs, top_n=5).collect()
    assert rows == []  # no adjacent pairs survive; census says lossless
    # The invariants are still checkable through a corpus with leftovers.
    docs2 = spark.createDataFrame([(1, "ab ab abc")], "doc_id long, text string")
    rows2 = bpe_train_step(docs2, top_n=5).collect()
    assert len(rows2) == 1
    r = rows2[0]
    assert r["merge_pair"] == "ab" and r["merge_count"] == 3
    assert r["residual_count"] == 0 and r["broken_words"] == 0
    assert r["pair"] == "ab+c" and r["pair_count"] == 1


# ---------------------------------------------------- join_fanout_estimate


def test_join_fanout_exact_products_and_total(spark):
    from ddataframeoperation_spark.operators.skew import join_fanout_estimate

    left = spark.createDataFrame(
        [(k, 0) for k in [1] * 3 + [2] * 2 + [3]], "k long, v long"
    )
    right = spark.createDataFrame(
        [(k, 0) for k in [1] * 4 + [2] * 5 + [9]], "k long, v long"
    )
    rows = join_fanout_estimate(left, "k", right, "k", top_n=10).collect()
    got = {r["key_value"]: r for r in rows}
    # key 1: 3*4=12, key 2: 2*5=10; key 3/9 unmatched -> absent.
    # out_rows ships as the canonical string of the DECIMAL(38,0)
    # product (overflow-safe past 3.04e9-row keys under ANSI).
    assert set(got) == {"1", "2"}
    assert got["1"]["out_rows"] == "12" and got["2"]["out_rows"] == "10"
    assert all(r["total_out_rows"] == "22" for r in rows)  # exact string
    assert all(r["matched_keys"] == 2 for r in rows)


def test_join_fanout_self_join_squares(spark):
    from ddataframeoperation_spark.operators.skew import join_fanout_estimate

    df = spark.createDataFrame(
        [(k, 0) for k in [7] * 5 + [8] * 2], "k long, v long"
    )
    rows = join_fanout_estimate(df, "k", df, "k", top_n=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["key_value"] == "7" and r["out_rows"] == "25"  # n^2
    assert r["total_out_rows"] == "29" and r["matched_keys"] == 2


def test_join_fanout_null_keys_never_match(spark):
    from ddataframeoperation_spark.operators.skew import join_fanout_estimate

    df = spark.createDataFrame(
        [(None, 0), (None, 1), (1, 2)], "k string, v long"
    )
    rows = join_fanout_estimate(df, "k", df, "k", top_n=5).collect()
    # Equi-join semantics: NULL matches nothing — only key '1' appears.
    assert [r["key_value"] for r in rows] == ["1"]
    assert rows[0]["total_out_rows"] == "1"


# ------------------------------------------------------- lsh_power_curve


def test_lsh_power_curve_tracks_analytic_formula(spark):
    from ddataframeoperation_spark.operators.dedup import lsh_power_curve

    rows = lsh_power_curve(spark).collect()
    assert len(rows) == 3 * 19
    for r in rows:
        s = r["s_bp"] / 10000.0
        p = s ** r["rows_per_band"]
        recall = 1.0 - (1.0 - p) ** r["n_bands"]
        # Integer floor-folds sit within a few bp of the real curve;
        # each of the r-1 folds floors away <= 1bp, amplified xb in the
        # low-recall tail -> worst-case b*(r-1) bp (see docstring).
        assert abs(r["p_band_bp"] - round(p * 10000)) <= 6, r
        bound = max(8, r["n_bands"] * (r["rows_per_band"] - 1))
        assert abs(r["recall_bp"] - round(recall * 10000)) <= bound, r
        assert 0 <= r["recall_bp"] <= 10000


def test_lsh_power_curve_monotone_in_similarity(spark):
    from ddataframeoperation_spark.operators.dedup import lsh_power_curve

    rows = lsh_power_curve(spark, configs=((16, 8),)).collect()
    by_s = sorted(rows, key=lambda r: r["s_bp"])
    recalls = [r["recall_bp"] for r in by_s]
    assert recalls == sorted(recalls)  # the S-curve never dips


def test_lsh_power_curve_degenerate_params(spark):
    from ddataframeoperation_spark.operators.dedup import lsh_power_curve

    # r=1, b=1: recall == s exactly (identity branches around Spark's
    # descending sequence(2, 1)).
    rows = lsh_power_curve(spark, configs=((1, 1),), s_grid_bp=(0, 4000, 10000)).collect()
    got = {r["s_bp"]: r for r in rows}
    assert all(got[s]["p_band_bp"] == s and got[s]["recall_bp"] == s
               for s in (0, 4000, 10000))


def test_lsh_power_curve_validates(spark):
    import pytest as _pytest

    from ddataframeoperation_spark.operators.dedup import lsh_power_curve

    with _pytest.raises(ValueError, match="basis points"):
        lsh_power_curve(spark, s_grid_bp=(10001,))
    with _pytest.raises(ValueError, match=">= 1"):
        lsh_power_curve(spark, configs=((0, 4),))


# ---------------------------------------------------- pair_degree_census


def test_degree_census_exact_histogram(spark):
    from ddataframeoperation_spark.operators.dedup import pair_degree_census

    # Path 1-2-3 plus hub 9 connected to 1,2,3: degrees 1:{2,9?}...
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 1), (9, 2), (9, 3)], "id_a long, id_b long"
    )
    rows = pair_degree_census(pairs).collect()
    got = {r["degree"]: r["n_nodes"] for r in rows}
    # degrees: 1->2 (1-2, 9-1), 2->3 (1-2, 2-3, 9-2), 3->2 (2-3, 9-3),
    # 9->3 ==> node degrees: 1:2, 2:3, 3:2, 9:3.
    assert got == {2: 2, 3: 2}
    r = rows[0]
    assert r["n_nodes_total"] == 4 and r["n_edges_total"] == 5
    assert r["max_degree"] == 3


def test_degree_census_empty_graph(spark):
    from ddataframeoperation_spark.operators.dedup import pair_degree_census

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert pair_degree_census(pairs).collect() == []


# --------------------------------------------------- packing_efficiency


def test_packing_efficiency_exact_numbers(spark):
    from ddataframeoperation_spark.operators.text import packing_efficiency

    docs = spark.createDataFrame(
        [
            (1, "s", "a b c d"),        # 4 tokens
            (2, "s", "e f g"),          # 3 tokens -> starts in bin 0 (cum 4)
            (3, "s", "h i j k l m n"),  # 7 tokens, oversize -> starts bin 1 (cum 7)
            (4, "t", "x"),              # 1 token, own shard
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: r
        for r in packing_efficiency(
            docs, budget=5, shard_col="source", order_keys=["doc_id"]
        ).collect()
    }
    s = got["s"]
    # shard s: totals 14 tokens, start bins {0, 0, 1} -> n_bins 2;
    # fill = 14*10000 div (2*5) = 14000 (>10000: doc 3 spills past bin 1).
    assert (s["n_docs"], s["n_bins"], s["total_tokens"]) == (3, 2, 14)
    assert s["fill_bp"] == 14000 and s["oversize_docs"] == 1
    t = got["t"]
    assert (t["n_docs"], t["n_bins"], t["total_tokens"]) == (1, 1, 1)
    assert t["fill_bp"] == 2000 and t["oversize_docs"] == 0


def test_packing_efficiency_validates(spark):
    import pytest as _pytest

    from ddataframeoperation_spark.operators.text import packing_efficiency

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="budget"):
        packing_efficiency(df, budget=0)


# ------------------------------------------------- r9 edge-case hardening


def test_bpe_train_step_empty_corpus(spark):
    from ddataframeoperation_spark.operators.text import bpe_train_step

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id long, text string"
    )
    # No word reaches min_word_len=2 -> no merge exists -> empty output,
    # not a crash (the 1-row merge broadcast is just empty).
    assert bpe_train_step(docs, top_n=5).collect() == []


def test_packing_efficiency_null_text_packs_as_zero(spark):
    from ddataframeoperation_spark.operators.text import packing_efficiency

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")],
        "doc_id long, text string",
    )
    r = packing_efficiency(docs, budget=10, order_keys=["doc_id"]).collect()[0]
    # NULL text counts 0 tokens (pack_sequences' coalesce contract);
    # note '' and single-token docs still count >= 1 via split semantics.
    assert r["n_docs"] == 3 and r["n_bins"] == 1
    assert r["total_tokens"] == 5 and r["oversize_docs"] == 0


# ------------------------------------------------------------ gain_chart


def test_gain_chart_perfect_classifier(spark):
    from ddataframeoperation_spark.operators.relational import gain_chart

    # 100 rows, top-10 scores are exactly the 10 positives: a perfect
    # ranker captures ALL positives in bucket 1 -> gain 10000, lift 10x.
    rows = [(1.0 - i / 100.0, i < 10) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bucket"]: r for r in gain_chart(df, "score", "label").collect()}
    assert got[1]["n_pos"] == 10 and got[1]["gain_bp"] == 10000
    assert got[1]["lift_bp"] == 100000  # 10x random in basis points
    assert got[10]["cum_n"] == 100 and got[10]["cum_pos"] == 10
    assert got[10]["gain_bp"] == 10000 and got[10]["lift_bp"] == 10000


def test_gain_chart_random_classifier_flat(spark):
    from ddataframeoperation_spark.operators.relational import gain_chart

    # Positives spread uniformly across score order -> every decile holds
    # one positive; lift ~10000 at every depth (exact with 10 per bucket).
    rows = [(1.0 - i / 100.0, i % 10 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bucket"]: r for r in gain_chart(df, "score", "label").collect()}
    assert all(got[b]["n_pos"] == 1 for b in range(1, 11))
    assert all(got[b]["lift_bp"] == 10000 for b in range(1, 11))
    assert [got[b]["gain_bp"] for b in range(1, 11)] == [
        1000 * b for b in range(1, 11)
    ]


def test_gain_chart_no_positives_and_validation(spark):
    import pytest as _pytest

    from ddataframeoperation_spark.operators.relational import gain_chart

    rows = [(i / 10.0, False) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = gain_chart(df, "score", "label").collect()
    assert out and all(r["gain_bp"] == 0 and r["lift_bp"] == 0 for r in out)
    with _pytest.raises(ValueError, match="n_bins"):
        gain_chart(df, "score", "label", n_bins=1)


# -------------------------------------------------------------- auc_exact


def test_auc_perfect_random_and_inverted(spark):
    from ddataframeoperation_spark.operators.relational import auc_exact

    # Perfect: all positives above all negatives.
    d1 = spark.createDataFrame(
        [(1.0, True)] * 5 + [(0.0, False)] * 5, "score double, label boolean"
    )
    assert auc_exact(d1, "score", "label").collect()[0]["auc_bp"] == 10000
    # All ties: AUC exactly 1/2.
    d2 = spark.createDataFrame(
        [(0.5, True)] * 4 + [(0.5, False)] * 6, "score double, label boolean"
    )
    assert auc_exact(d2, "score", "label").collect()[0]["auc_bp"] == 5000
    # Inverted ranking: 0.
    d3 = spark.createDataFrame(
        [(0.0, True)] * 3 + [(1.0, False)] * 3, "score double, label boolean"
    )
    assert auc_exact(d3, "score", "label").collect()[0]["auc_bp"] == 0


def test_auc_empty_cohort_is_null(spark):
    from ddataframeoperation_spark.operators.relational import auc_exact

    df = spark.createDataFrame(
        [(0.1, True), (0.9, True)], "score double, label boolean"
    )
    r = auc_exact(df, "score", "label").collect()[0]
    assert r["n_neg"] == 0 and r["auc_bp"] is None
