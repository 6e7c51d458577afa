"""Round-13 pins: the rfm 6dp cut-rounding semantics (a pure-Python
replay of the engine's percentile → round(6) → strict-compare bucket
math over randomized integer metrics), and the examples-smoke guard
against module-level SF_DIR derivations."""

from __future__ import annotations

import random

import pytest


def _py_percentile(xs: list[int], q: float) -> float:
    """Spark percentile() / numpy 'linear': lower + frac*(higher-lower)
    over the sorted values at pos = q*(n-1)."""
    s = sorted(xs)
    pos = q * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    if lo + 1 >= len(s):
        return float(s[lo])
    return s[lo] + frac * (s[lo + 1] - s[lo])


def _py_bucket(metric: int, cuts: list[float], best_is_low: bool) -> int:
    cuts = [round(c, 6) for c in cuts]
    if best_is_low:
        return 1 + sum(1 for c in cuts if metric > c)
    return 1 + sum(1 for c in cuts if metric < c)


@pytest.mark.usefixtures("spark")
class TestRfmCutRounding:
    def test_bucket_grid_matches_pure_python_replay(self, spark):
        # Randomized integer metrics (the operator's only float surface
        # is the interpolated cut points, rounded to 6dp on both
        # engines). The replay recomputes recency/frequency/cents and
        # the full (r,f,m) grid driver-style; any divergence in the
        # percentile fold, the 6dp round, or the strict comparisons
        # shows up as a grid mismatch.
        import datetime

        from ddataframeoperation_spark.operators.relational import rfm_segments

        rng = random.Random(13)
        base = datetime.date(2024, 1, 1)
        rows = []
        per_cust: dict[int, list[tuple[datetime.date, float]]] = {}
        for cust in range(60):
            n_orders = rng.randint(1, 12)
            orders = []
            for _ in range(n_orders):
                d = base + datetime.timedelta(days=rng.randint(0, 364))
                # clean-2-decimal money (the repo's money contract)
                amt = rng.randint(100, 99999) / 100.0
                orders.append((d, amt))
                rows.append((cust, d, amt))
            per_cust[cust] = orders
        df = spark.createDataFrame(
            rows, "o_custkey int, o_orderdate date, o_totalprice double"
        )
        got = {
            (r["r_bucket"], r["f_bucket"], r["m_bucket"]): (
                r["n_customers"],
                r["total_cents"],
            )
            for r in rfm_segments(df).collect()
        }

        # pure-Python replay
        maxd = max(d for ords in per_cust.values() for d, _ in ords)
        rdays = {
            c: (maxd - max(d for d, _ in ords)).days
            for c, ords in per_cust.items()
        }
        freq = {c: len(ords) for c, ords in per_cust.items()}
        cents = {
            c: sum(int(a * 100 + 0.5) for _, a in ords)
            for c, ords in per_cust.items()
        }
        qs = [0.2, 0.4, 0.6, 0.8]
        rc = [_py_percentile(list(rdays.values()), q) for q in qs]
        fc = [_py_percentile(list(freq.values()), q) for q in qs]
        mc = [_py_percentile(list(cents.values()), q) for q in qs]
        want: dict[tuple[int, int, int], list[int]] = {}
        for c in per_cust:
            key = (
                _py_bucket(rdays[c], rc, True),
                _py_bucket(freq[c], fc, False),
                _py_bucket(cents[c], mc, False),
            )
            agg = want.setdefault(key, [0, 0])
            agg[0] += 1
            agg[1] += cents[c]
        assert got == {k: tuple(v) for k, v in want.items()}


class TestExamplesSmokeGuard:
    def test_module_level_sf_dir_derivation_rejected(self, tmp_path):
        # The smoke's SF_DIR override lands AFTER the module body runs,
        # so a module-level value derived from SF_DIR would silently
        # keep the default fixture — the guard must fail such a module
        # loudly instead of green-lighting a wrong-fixture run.
        import tools.examples_smoke as es

        bad = tmp_path / "bad_example.py"
        bad.write_text(
            'SF_DIR = "/root/testdata/sf0.01"\n'
            'DOCS = f"{SF_DIR}/documents.parquet"\n'
            "def main():\n"
            "    return 0\n"
        )
        good = tmp_path / "good_example.py"
        good.write_text(
            'SF_DIR = "/root/testdata/sf0.01"\n'
            "def main():\n"
            '    assert SF_DIR == "OVERRIDDEN"\n'
            "    return 0\n"
        )
        import sys

        old = es.EXAMPLES
        old_argv = sys.argv
        try:
            es.EXAMPLES = [bad, good]
            sys.argv = ["examples_smoke.py", "OVERRIDDEN"]
            rc = es.main()
        finally:
            es.EXAMPLES = old
            sys.argv = old_argv
        # bad_example must fail (derivation guard), good_example must
        # pass WITH the override visible inside main() -> rc nonzero
        # because exactly one of the two failed.
        assert rc == 1
