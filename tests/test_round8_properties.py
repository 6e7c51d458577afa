"""Randomized reference-implementation checks for the round-8 operators:
each Spark result is compared against a brute-force Python computation on
seeded random inputs (the test_round5_properties.py pattern). These pin
the operators' MATH; the engine-vs-engine numerics contracts are pinned
by the DuckDB oracles.
"""

from __future__ import annotations

import datetime
import random
import re
from collections import Counter, defaultdict

from ddataframeoperation_spark.operators.sampling import mixture_weights
from ddataframeoperation_spark.operators.skew import key_skew_audit
from ddataframeoperation_spark.operators.text import gopher_quality_signals
from ddataframeoperation_spark.operators.windows import (
    period_over_period,
    time_to_convert,
)


def _norm(t: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()


def test_gopher_signals_match_bruteforce_random(spark):
    rng = random.Random(31)
    vocab = ["the", "fox", "##", "running", "a1", "...", "be", "zq"]
    rows = []
    for i in range(60):
        n = rng.randint(0, 120)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality_signals(df).collect()}
    for i, text in rows:
        norm = _norm(text)
        words = norm.split(" ") if norm else []
        nw = len(words)
        r = got[i]
        assert r["n_words"] == nw
        if nw:
            wc = sum(len(w) for w in words)
            assert r["mean_word_len"] == round(wc / nw, 4)
            nh = text.count("#")
            ne = text.count("...")  # str.count is non-overlapping, like replace
            assert r["symbol_ratio"] == round((nh + ne) / nw, 4)
            alpha = sum(1 for w in words if re.search("[a-z]", w))
            assert r["alpha_frac"] == round(alpha / nw, 4)
        stopset = ("the", "be", "to", "of", "and", "that", "have", "with")
        hits = sum(1 for w in stopset if f" {w} " in f" {norm} ")
        assert r["n_stop_hits"] == hits


def test_mixture_weights_match_bruteforce_random(spark):
    rng = random.Random(32)
    langs = ["aa", "bb", "cc", "dd"]
    rows = [(rng.choice(langs), rng.randint(1, 500)) for _ in range(300)]
    df = spark.createDataFrame(rows, "lang string, n_tokens long")
    shares = {"aa": 4000, "bb": 3000, "cc": 3000}  # dd untargeted
    budget = 40_000
    got = {
        r["lang"]: r
        for r in mixture_weights(
            df, shares, budget, source_col="lang", token_col="n_tokens"
        ).collect()
    }
    avail = defaultdict(int)
    for g, n in rows:
        avail[g] += n
    for g in langs:
        bp = shares.get(g, 0)
        target = (budget * bp) // 10000
        r = got[g]
        assert r["avail_tokens"] == avail[g]
        assert r["target_tokens"] == target
        assert r["weight_bp"] == min(10000, (target * 10000) // avail[g])
        assert r["expected_tokens"] == min(avail[g], target)
        assert r["deficit_tokens"] == target - min(avail[g], target)


def test_key_skew_audit_matches_bruteforce_random(spark):
    rng = random.Random(33)
    # Zipf-ish key draw: key k with weight 1/(k+1).
    keys = [str(min(rng.randint(0, 40), rng.randint(0, 40))) for _ in range(800)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = key_skew_audit(df, "k", top_n=10).collect()
    cnt = Counter(keys)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["key_value"], r["n_rows"]) for r in got] == want
    assert all(
        r["share_bp"] == (r["n_rows"] * 10000) // len(keys) for r in got
    )
    assert got[0]["n_keys"] == len(cnt) and got[0]["total_rows"] == len(keys)


def test_period_over_period_matches_bruteforce_random(spark):
    from pyspark.sql import functions as F

    rng = random.Random(34)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for _ in range(500):
        g = rng.choice(["x", "y", "z"])
        day = rng.randint(0, 9)
        # clean 2-decimal money
        v = rng.randint(1, 99999) / 100.0
        rows.append((g, base + datetime.timedelta(days=day), v))
    df = spark.createDataFrame(rows, "g string, d timestamp, v double")
    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    got = {
        (r["g"], r["period"].day): (
            r["value_cents"], r["prev_cents"], r["growth_bp"]
        )
        for r in period_over_period(df, ["g"], F.col("d"), cents).collect()
    }
    sums: dict[tuple[str, int], int] = defaultdict(int)
    for g, d, v in rows:
        sums[(g, d.day)] += round(v * 100)
    for g in ("x", "y", "z"):
        days = sorted(d for (gg, d) in sums if gg == g)
        prev = None
        for d in days:
            cur = sums[(g, d)]
            want_growth = None
            if prev is not None and prev != 0:
                q = ((cur - prev) * 10000) / prev
                want_growth = int(q)  # truncation toward zero
            assert got[(g, d)][0] == cur
            assert got[(g, d)][1] == prev
            assert got[(g, d)][2] == want_growth
            prev = cur


def test_time_to_convert_matches_bruteforce_random(spark):
    rng = random.Random(35)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    for uid in range(120):
        for _ in range(rng.randint(0, 8)):
            rows.append(
                (
                    uid,
                    base + datetime.timedelta(minutes=rng.randint(0, 5000)),
                    rng.choice(["click", "purchase", "view"]),
                )
            )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["latency_bucket"]: r["n_users"]
        for r in time_to_convert(
            df, "click", "purchase", bucket_minutes=97
        ).collect()
    }
    per_user = defaultdict(list)
    for u, t, e in rows:
        per_user[u].append((t, e))
    want: Counter = Counter()
    for u, evs in per_user.items():
        clicks = [t for t, e in evs if e == "click"]
        if not clicks:
            continue
        t0 = min(clicks)
        purch = [t for t, e in evs if e == "purchase" and t >= t0]
        if not purch:
            want[-1] += 1
        else:
            lat_us = int((min(purch) - t0).total_seconds() * 1_000_000)
            want[lat_us // (97 * 60_000_000)] += 1
    assert got == dict(want)


def test_fixed_point_money_helpers_match_decimal_bruteforce(spark):
    """The r8 money re-plan (queries._cents/_sum_fixed/_rev_cents4) must
    reproduce exact Decimal arithmetic on random clean-2-decimal money:
    per-row cents, the revenue product, and the descaled group sums."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from ddataframeoperation_spark.queries import _cents, _rev_cents4, _sum_fixed

    rng = random.Random(36)
    rows = []
    for i in range(400):
        price = rng.randint(90, 11_000_000) / 100.0   # up to $110k, 2dp
        disc = rng.randint(0, 10) / 100.0
        rows.append((i, i % 7, price, disc))
    df = spark.createDataFrame(
        rows, "rid long, g long, l_extendedprice double, l_discount double"
    )
    # per-row: cents and the 1e-4-dollar revenue product (keyed by rid —
    # collect() order is not a contract)
    per_row = {
        r["rid"]: r
        for r in df.select(
            "rid",
            _cents("l_extendedprice").alias("p2"),
            _rev_cents4().alias("rev4"),
        ).collect()
    }
    want_rows = {}
    for rid, g, price, disc in rows:
        p2 = int(Decimal(str(price)) * 100)
        d2 = 100 - int(Decimal(str(disc)) * 100)
        assert per_row[rid]["p2"] == p2
        assert per_row[rid]["rev4"] == p2 * d2
        want_rows.setdefault(g, Decimal(0))
        want_rows[g] += Decimal(p2 * d2)
    # group sums: exact decimal sum descaled once, vs Decimal brute force
    got = {
        r["g"]: r["revenue"]
        for r in df.groupBy("g")
        .agg(_sum_fixed(_rev_cents4(), 10000.0).alias("revenue"))
        .collect()
    }
    for g, total4 in want_rows.items():
        assert got[g] == float(total4) / 10000.0
