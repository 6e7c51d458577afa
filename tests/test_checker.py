"""Regression tests for tools/check_oracles.py — the local mimic of the
driver's correctness gate. The round-3 regression shipped because the
checker's norm_cell stringified decimal.Decimal symmetrically and reported
ALL GREEN while the driver hash-failed 4 decimal-output queries (see
VERDICT.md round 3, "What's wrong" #1)."""

from decimal import Decimal

import pytest

from tools.check_oracles import decimal_output_columns, norm_cell


class TestNormCell:
    def test_decimal_trailing_zeros_equal_float_rendering(self):
        # The judge's canonical case: DECIMAL(18,4) value 1.5000 must
        # compare equal to DuckDB's float64 rendering of 1.5.
        assert norm_cell(Decimal("1.5000")) == norm_cell(1.5)

    def test_decimal_integral_equals_float(self):
        assert norm_cell(Decimal("3773034.0000")) == norm_cell(3773034.0)

    def test_decimal_round3_failure_values(self):
        # Actual trailing-zero cells from the four round-3 hash-fails.
        for dec, flt in [
            (Decimal("22586.5300"), 22586.53),
            (Decimal("617998219.9420"), 617998219.9420),
            (Decimal("521320.6030"), 521320.6030),
        ]:
            assert norm_cell(dec) == norm_cell(flt)

    def test_non_decimal_cells_unchanged(self):
        assert norm_cell(None) == "NULL"
        assert norm_cell("x") == "x"
        assert norm_cell(7) == "7"

    def test_integral_floats_full_precision(self):
        # f"{v:.6g}" collapsed distinct integral sums >= 1e7 — a real
        # cross-engine drift could print ALL GREEN while the driver's
        # exact hash failed. Integral floats must render exactly.
        assert norm_cell(37730341.0) != norm_cell(37730348.0)
        assert norm_cell(37730341.0) == "37730341"
        # ... while still unifying int-typed vs float-typed columns.
        assert norm_cell(5.0) == norm_cell(5)


class TestCertLedgerGrades:
    # The two certificate grades (VERDICT r12 "What's wrong" #2): an
    # oracle-backed green row, and the weaker rows-only certificate for
    # by-contract no-oracle queries. Everything else is red.

    def test_oracle_backed_green(self):
        from tools.cert_ledger import is_green_row

        assert is_green_row(
            {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 4446, "oracle_rows": 4446, "err": None},
            has_oracle=True,
        )

    def test_rows_only_green(self):
        from tools.cert_ledger import is_green_row

        # Verbatim shape of CORRECTNESS_r01's b12_approx_count_distinct.
        assert is_green_row(
            {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 3, "oracle_rows": None, "err": "no_oracle"},
            has_oracle=False,
        )

    def test_no_oracle_row_never_certifies_an_oracled_query(self):
        from tools.cert_ledger import is_green_row

        # A query that HAS an oracle in the current registry must earn
        # the oracle-backed grade: a historical no_oracle row (recorded
        # before its oracle existed — CORRECTNESS_r01's
        # b12_approx_count_distinct is exactly this) or a degraded
        # driver run must NOT retire it from the `never` queue, or an
        # oracle mismatch could hide forever.
        assert not is_green_row(
            {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 3, "oracle_rows": None, "err": "no_oracle"},
            has_oracle=True,
        )

    def test_red_rows(self):
        from tools.cert_ledger import is_green_row

        assert not is_green_row(
            {"rows_match": False, "schema_match": True, "err": None,
             "spark_rows": 1, "oracle_rows": 2},
            has_oracle=True,
        )
        assert not is_green_row(
            {"rows_match": True, "schema_match": False, "err": None,
             "spark_rows": 1, "oracle_rows": 1},
            has_oracle=True,
        )
        # A rows-only slot that produced ZERO rows is NOT a certificate —
        # the driver's weak check is rows > 0.
        assert not is_green_row(
            {"rows_match": None, "schema_match": None, "err": "no_oracle",
             "spark_rows": 0, "oracle_rows": None},
            has_oracle=False,
        )
        # A genuine error row never certifies.
        assert not is_green_row(
            {"rows_match": None, "schema_match": None,
             "err": "AnalysisException: ...", "spark_rows": None},
            has_oracle=False,
        )


class TestPlanCensus:
    def test_counts_drift_relevant_markers(self):
        from tools.plan_audit import plan_census

        plan = (
            "AdaptiveSparkPlan\n"
            "+- SortMergeJoin [a#1], [b#2], Inner\n"
            "   :- Sort [a#1 ASC NULLS FIRST]\n"
            "   :  +- Exchange hashpartitioning(a#1, 32)\n"
            "   :     +- HashAggregate(keys=[a#1], functions=[sum(x#3)])\n"
            "   +- Sort [b#2 ASC NULLS FIRST]\n"
            "      +- Exchange hashpartitioning(b#2, 32)\n"
            "+- Window [row_number() windowspecdefinition(a#1 ASC)]\n"
        )
        c = plan_census(plan)
        assert c["sort_merge_join"] == 1
        assert c["shuffle_hash_exch"] == 2
        assert c["hash_agg"] == 1
        assert c["window"] == 1
        assert c["sort"] == 2
        # zero entries are dropped, windowspecdefinition is not a Window op
        assert "cartesian" not in c and "broadcast_hash_join" not in c

    def test_broadcast_vs_shuffle_distinct(self):
        from tools.plan_audit import plan_census

        c = plan_census(
            "+- BroadcastHashJoin [k#1], [k#2], Inner, BuildRight\n"
            "   +- BroadcastExchange HashedRelationBroadcastMode\n"
        )
        assert c == {"broadcast_hash_join": 1, "broadcast_exch": 1}


class TestDriverSlotContract:
    def test_first_50_slots_retire_certification_debt(self):
        # The external gate records correctness rows for EXACTLY the first
        # 50 registration-order queries (round-3 evidence: slots 51+ never
        # materialize). Since round 12 the rotation policy is
        # debt-retirement (VERDICT r11 #1: the bar is "EVERY query has a
        # passing entry", measured CUMULATIVELY across rounds): slots go
        # to never-certified queries first, and per-round family
        # representation yields to the CUMULATIVE invariant that every
        # family holds at least one green certificate (past rounds ∪ the
        # current 50).
        from ddataframeoperation_spark.queries import ORACLES, QUERIES
        from tools.cert_ledger import certified_union

        names = list(QUERIES)
        first50 = names[:50]
        assert "b10_flagship_q3" == first50[0]  # flagship stays pinned
        _, union = certified_union()
        # Cumulative family coverage: every B-family certified or slotted.
        covered = {n.split("_")[0] for n in union | set(first50)}
        assert {f"b{i:02d}" for i in range(1, 39)} <= covered
        assert {"bmm", "bzo"} <= covered
        # Rotation discipline: never-certified queries fill the non-pinned
        # slots before any re-certification (all of them once fewer than
        # 49 remain — the backlog must monotonically drain to 0).
        never = [n for n in names if n not in union]
        slotted_never = [n for n in never if n in set(first50)]
        assert len(slotted_never) >= min(len(never), 49)
        # Slots are oracle-checked except the PINNED rows-only-by-
        # contract hash families — allowed in a slot while awaiting
        # their (weaker, rows-check) first certificate AND after they
        # hold it (the r13 closing rotation slots them once; when the
        # driver file lands they move from `never` into `union` and the
        # tree must stay green either way). The set is pinned BY NAME —
        # `n in never or n in union` would be a tautology (never is the
        # complement of union), so a new oracle-less query can't slip
        # into a slot without consciously extending this list.
        ROWS_ONLY_BY_CONTRACT = {
            "b32_minhash_raw",
            "b32_simhash_candidates",
            "b33_lsh_topk",
            "bmm_binary_ingest",
        }
        assert set(QUERIES) - set(ORACLES) == ROWS_ONLY_BY_CONTRACT
        for n in first50:
            assert n in ORACLES or n in ROWS_ONLY_BY_CONTRACT, n


@pytest.mark.usefixtures("spark")
class TestDecimalOutputFlag:
    def test_decimal_output_column_flagged(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(3).select(
            F.col("id"), F.lit("1.5").cast("decimal(18,4)").alias("money")
        )
        assert decimal_output_columns(df) == ["money"]

    def test_double_output_clean(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(3).select(
            F.col("id"),
            F.lit("1.5").cast("decimal(18,4)").cast("double").alias("money"),
        )
        assert decimal_output_columns(df) == []

    def test_content_digest_cross_engine_with_nulls(self, spark):
        # The b29 roundtrip digest must produce the SAME (n_rows,
        # content_hash) on Spark and DuckDB, including NULL cells and
        # integral doubles (decimal(18,2) canonicalization).
        import duckdb

        from ddataframeoperation_spark.queries import (
            _content_digest,
            _content_digest_sql,
        )

        rows = [(1, "a", 1.5), (2, None, 2.0), (3, "c", None), (4, "", 0.0)]
        df = spark.createDataFrame(rows, "k long, s string, v double")
        got = _content_digest(df, ["k", "s", "v"], {"v"}).collect()[0]

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (k BIGINT, s VARCHAR, v DOUBLE); "
            "INSERT INTO t VALUES (1,'a',1.5),(2,NULL,2.0),(3,'c',NULL),(4,'',0.0)"
        )
        want = con.execute(
            _content_digest_sql("t", ["k", "s", "v"], {"v"})
        ).fetchone()
        # content_hash is a STRING of the decimal(38,0)/HUGEINT sum — a
        # LONG sum would overflow at ~4.3e9 rows (ANSI throws).
        assert (got["n_rows"], got["content_hash"]) == (want[0], str(want[1]))

    def test_no_registered_query_outputs_decimal(self, spark, sf_dir):
        # Every queries() entry must be decimal-free in its OUTPUT schema
        # (decimal arithmetic internally is fine and encouraged). Building
        # a query's DataFrame DOES execute the side-effecting ones
        # (streaming run_to_memory, sink roundtrips, eager checkpoint), so
        # this is a full-construction pass at sf0.001 — and a builder that
        # raises is a hard failure, not a silent skip: a skipped query
        # would hide a decimal regression behind an unrelated error.
        from ddataframeoperation_spark.queries import QUERIES

        offenders, broken = {}, {}
        for name, fn in QUERIES.items():
            try:
                cols = decimal_output_columns(fn(spark, sf_dir))
            except Exception as e:
                broken[name] = repr(e)
                continue
            if cols:
                offenders[name] = cols
        assert not broken, f"queries failed to build: {broken}"
        assert not offenders, f"decimal output columns: {offenders}"


class TestLargeIntegralFloats:
    def test_integral_double_above_1e15_matches_int_rendering(self):
        # An integral double >= 1e15 must render full digits like an
        # int-typed cell, not repr's '1e+15' — the residual asymmetric
        # rendering window flagged in round 4.
        assert norm_cell(1e15) == norm_cell(10**15) == "1000000000000000"
        assert norm_cell(2.0**60) == str(2**60)
        assert norm_cell(-1e18) == str(-(10**18))
