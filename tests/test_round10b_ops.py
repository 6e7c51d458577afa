"""Round-10 late-session widening: contract tests for the new operators.

- bloom_filter_report: textbook Bloom semantics pinned against a
  brute-force Python bloom built with the same md5 recipe — NO false
  negatives ever, false positives exactly as the position sets dictate,
  NULL keys excluded from every count.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F  # noqa: F401


def _positions(key, salt: str, n_hashes: int, n_bits: int) -> set[int]:
    return {
        int(
            hashlib.md5(f"{key}|{salt}|{i}".encode()).hexdigest()[:8], 16
        )
        % n_bits
        for i in range(n_hashes)
    }


def test_bloom_report_matches_bruteforce_and_never_false_negative(spark):
    from ddataframeoperation_spark.operators.skew import bloom_filter_report

    n_bits, n_hashes, salt = 64, 3, "t"
    build_keys = list(range(0, 40, 2))  # 20 keys
    probe_keys = list(range(0, 120))  # 120 keys, 20 true
    # Probe rows: each key appears (k % 3) + 1 times.
    probe_rows = [k for k in probe_keys for _ in range((k % 3) + 1)]

    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe = spark.createDataFrame(
        [(k,) for k in probe_rows] + [(None,)], "k long"
    )
    rep = bloom_filter_report(
        build, "k", probe, "k", n_bits=n_bits, n_hashes=n_hashes, salt=salt
    ).collect()[0]

    bpos = set().union(
        *(_positions(k, salt, n_hashes, n_bits) for k in build_keys)
    )
    passes = {
        k for k in probe_keys if _positions(k, salt, n_hashes, n_bits) <= bpos
    }
    true = set(build_keys)
    # No false negatives: every true key passes (the m=64 filter is tiny,
    # so false positives are guaranteed too — both sides exercised).
    assert true <= passes
    assert passes - true, "fixture must produce false positives"

    assert rep["n_build_keys"] == len(build_keys)
    assert rep["n_probe_keys"] == len(probe_keys)
    assert rep["n_pass_keys"] == len(passes)
    assert rep["n_true_keys"] == len(true)
    assert rep["n_false_pos_keys"] == len(passes - true)
    n_rows = len(probe_rows)
    n_pass_rows = sum((k % 3) + 1 for k in passes)
    n_true_rows = sum((k % 3) + 1 for k in true)
    assert rep["n_probe_rows"] == n_rows  # NULL-key row excluded
    assert rep["n_pass_rows"] == n_pass_rows
    assert rep["n_true_rows"] == n_true_rows
    assert rep["skip_bp"] == (n_rows - n_pass_rows) * 10000 // n_rows


def test_bloom_report_rejects_bad_params(spark):
    import pytest

    from ddataframeoperation_spark.operators.skew import bloom_filter_report

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_filter_report(df, "k", df, "k", n_bits=0)
    with pytest.raises(ValueError):
        bloom_filter_report(df, "k", df, "k", n_hashes=0)


def test_quarantine_partitions_and_null_semantics(spark):
    from ddataframeoperation_spark.operators.relational import quarantine

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 60.0, "b"), (3, None, "a"), (4, 70.0, None)],
        "id long, qty double, tag string",
    )
    clean, bad = quarantine(
        df,
        {
            "qty_small": F.col("qty") <= 50,  # NULL qty must violate
            "tag_known": F.col("tag").isin("a", "b"),
        },
    )
    crows = {r["id"] for r in clean.collect()}
    brows = {r["id"]: r["reasons"] for r in bad.collect()}
    assert crows == {1}
    # exhaustive + disjoint
    assert crows | set(brows) == {1, 2, 3, 4} and not crows & set(brows)
    assert brows[2] == "qty_small"
    assert brows[3] == "qty_small"  # NULL = violation
    assert brows[4] == "qty_small,tag_known"  # sorted rule-name order
    # clean side keeps the original schema (no helper columns)
    assert clean.columns == df.columns

    import pytest

    with pytest.raises(ValueError):
        quarantine(df, {})


def test_poisson_replicates_bruteforce_and_contract(spark):
    from ddataframeoperation_spark.operators.sampling import (
        POISSON1_CDF,
        poisson_replicates,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)] + [(None, 1.0)],
        "id long, x double",
    )
    out = poisson_replicates(df, 4, ["id"], salt="t").collect()
    got = {(r["id"], r["replicate"]): r["multiplicity"] for r in out}

    def brute(i, rep):
        u = (
            int(hashlib.md5(f"{i}|{rep}|t".encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )
        for k, t in enumerate(POISSON1_CDF):
            if u < t:
                return k
        return 5

    expect = {(i, r): brute(i, r) for i in range(200) for r in range(4)}
    assert got == expect  # NULL-key row excluded, everything else exact
    # Poisson(1) sanity: mean multiplicity within 3 sigma of 1 per replicate
    for rep in range(4):
        tot = sum(v for (i, r), v in expect.items() if r == rep)
        assert abs(tot / 200 - 1.0) < 3 / (200 ** 0.5)

    import pytest

    with pytest.raises(ValueError):
        poisson_replicates(df, 0, ["id"])


def test_canonicalize_url_contract(spark):
    from ddataframeoperation_spark.operators.text import (
        canonical_host,
        canonicalize_url,
        registrable_domain,
    )

    cases = [
        # (raw, canonical)
        ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1#f",
         "https://ex.com/A/b?a=1&b=2"),
        ("http://user:pw@EX.com:80/p", "http://ex.com/p"),
        ("http://ex.com:8080/p/", "http://ex.com:8080/p"),  # non-default port kept
        ("https://ex.com", "https://ex.com"),
        ("https://ex.com/?ref=rss&utm_medium=a&fbclid=1", "https://ex.com"),
        ("https://ex.com/p?z=1&y=2&z=0", "https://ex.com/p?y=2&z=0&z=1"),
        ("  https://ex.com/p///  ", "https://ex.com/p"),
        ("https://www.www.ex.com/p", "https://www.ex.com/p"),  # one www label
        (None, None),
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)

    hosts = [
        ("a.b.example.co.uk", "example.co.uk"),  # longest suffix wins
        ("sub.example.com", "example.com"),
        ("example.com", "example.com"),
        ("com", "com"),            # bare suffix unchanged
        ("example.internal", "example.internal"),  # unknown TLD unchanged
    ]
    hdf = spark.createDataFrame(hosts, "h string, want string")
    out = hdf.select(
        registrable_domain(F.col("h")).alias("got"), "want"
    ).collect()
    for r in out:
        assert r["got"] == r["want"], r

    # canonical_host extracts the de-www'd deported host
    one = spark.createDataFrame(
        [("HTTPS://WWW.Ex.CO.UK:443/x?a=1",)], "url string"
    ).select(canonical_host("url").alias("h")).collect()[0]
    assert one["h"] == "ex.co.uk"


def test_dedup_by_canonical_url_keep_best(spark):
    from ddataframeoperation_spark.operators.dedup import (
        dedup_by_canonical_url,
    )

    rows = [
        (1, "https://ex.com/p?utm_source=a", 100),
        (2, "HTTPS://WWW.ex.com:443/p/", 300),   # same page, longest -> keep
        (3, "https://ex.com/p#frag", 300),        # tie on len -> lower id (2)
        (4, "https://ex.com/q", 50),              # different page
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    kept = dedup_by_canonical_url(
        df, "url",
        order_by=[F.col("n_chars").desc_nulls_last(), F.col("doc_id").asc()],
    )
    got = {r["doc_id"]: r["url_canonical"] for r in kept.collect()}
    assert set(got) == {2, 4}
    assert got[2] == "https://ex.com/p"

    import pytest

    with pytest.raises(ValueError):
        dedup_by_canonical_url(df, "url", order_by=None)


def test_pagerank_matches_integer_bruteforce(spark):
    from ddataframeoperation_spark.operators.dedup import pagerank

    # Directed weighted graph with a dangling node (4: no out-edges) and
    # an isolated node (5): 0->1 (w3), 0->2 (w1), 1->2 (w2), 2->0 (w5),
    # 3->4 (w1). Node 4 receives but redistributes nothing (dropped mass).
    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (3, 4, 1)]
    nodes = list(range(6))
    unit, d, n_iter = 10**9, 8500, 6

    ndf = spark.createDataFrame([(i,) for i in nodes], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["id"]: r["rank_units"]
        for r in pagerank(ndf, edf, n_iter=n_iter, damping_bp=d,
                          unit=unit).collect()
    }

    wout = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0) + w
    r = {v: unit for v in nodes}
    base = (10000 - d) * unit // 10000
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, t, w in edges:
            inflow[t] += r[s] * w // wout[s]
        r = {v: base + d * inflow[v] // 10000 for v in nodes}
    assert got == r
    # Isolated node ends at exactly the base mass.
    assert got[5] == base

    import pytest

    with pytest.raises(ValueError):
        pagerank(ndf, edf, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(ndf, edf, damping_bp=10001)


def test_perplexity_buckets_per_language_bands(spark):
    from ddataframeoperation_spark.operators.text import perplexity_buckets

    # Language A: 6 scoreable docs -> tertiles of 2/2/2. The repeated
    # phrase docs (templated) must land in the head band; the one doc of
    # rare words in the tail. Language B: its own independent bands.
    rows = [
        (1, "the cat sat on the mat the cat sat", "A"),
        (2, "the cat sat on the mat", "A"),
        (3, "the cat sat here", "A"),
        (4, "on the mat again", "A"),
        (5, "zq xv wk jj qq pp", "A"),
        (6, "vv uu tt ss rr", "A"),
        (7, "one", "A"),          # <2 tokens: no score, excluded
        (8, "alpha beta alpha beta", "B"),
        (9, "gamma delta", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(df, n_buckets=3).collect()
    got = {r["doc_id"]: (r["lang"], r["ppl_bucket"]) for r in out}
    assert 7 not in got
    a = {i: got[i][1] for i in (1, 2, 3, 4, 5, 6)}
    assert sorted(a.values()) == [1, 1, 2, 2, 3, 3]  # equal-count bands
    assert a[1] == 1          # most templated doc is head
    assert a[5] == 3 or a[6] == 3  # rare-garbage in tail
    assert {got[8][1], got[9][1]} <= {1, 2, 3}  # B banded independently

    import pytest

    with pytest.raises(ValueError):
        perplexity_buckets(df, n_buckets=1)


def test_gini_concentration_exact_cases(spark):
    from ddataframeoperation_spark.operators.skew import gini_concentration

    rows = (
        # group "even": 4 keys x 25 -> gini 0
        [("even", k, 25) for k in range(4)]
        # group "one": key 0 owns all 100 over 4 keys -> G=(n-1)/n=0.75
        + [("one", 0, 100)] + [("one", k, 0) for k in (1, 2, 3)]
        # group "zero": all zero -> contract: gini_bp 0
        + [("zero", k, 0) for k in (0, 1)]
    )
    df = spark.createDataFrame(rows, "g string, k long, v long")
    got = {
        r["g"]: (r["n_keys"], r["total_value"], r["gini_bp"])
        for r in gini_concentration(df, "g", "k", F.col("v")).collect()
    }
    assert got["even"] == (4, "100", 0)
    assert got["one"] == (4, "100", 7500)
    assert got["zero"] == (2, "0", 0)


def test_benford_audit_digits_and_contract(spark):
    from ddataframeoperation_spark.operators.relational import (
        BENFORD_BP,
        benford_audit,
    )

    # 1..9 each once from varying magnitudes, plus zero/negative excluded,
    # plus an extra leading-1 value -> digit 1 has n=2 of 10 total.
    vals = [1, 23, 345, 4567, 5, 66, 777, 8888, 99999, 100, 0, -5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r["digit"]: r for r in benford_audit(df, F.col("v")).collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["n"] == 2 and out[2]["n"] == 1
    assert out[1]["observed_bp"] == 2 * 10000 // 10
    for d in range(1, 10):
        assert out[d]["expected_bp"] == BENFORD_BP[d - 1]
        assert out[d]["dev_bp"] == out[d]["observed_bp"] - out[d]["expected_bp"]
    # Benford shares sum to ~100%
    assert sum(BENFORD_BP) == 10000


def test_seasonal_decompose_exact_identity(spark):
    import datetime as dt

    from ddataframeoperation_spark.operators.timeseries import (
        seasonal_decompose_weekly,
    )

    # 21 consecutive days, one group, value = weekday index (pure weekly
    # signal, zero trend slope): interior trend_x7 must be the constant
    # 21*100 cents (sum 0..6 = 21), and resid must vanish after the
    # seasonal term on fully-interior weekdays.
    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (base + dt.timedelta(days=i), "g", float((base + dt.timedelta(days=i)).weekday()))
        for i in range(21)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, grp string, value double")
    out = seasonal_decompose_weekly(df, "ts", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"), "grp")
    got = {r["d"]: r for r in out.collect()}
    assert len(got) == 21
    for d, r in got.items():
        i = (d - base.date()).days
        assert r["daily_cents"] == d.weekday() * 100
        if 3 <= i <= 17:
            assert r["trend_x7"] == 2100
        else:
            assert r["trend_x7"] is None and r["resid_x7"] is None
    # Pure weekly signal + flat trend => residual exactly 0 interior.
    interior = [r for d, r in got.items() if 3 <= (d - base.date()).days <= 17]
    assert all(r["resid_x7"] == 0 for r in interior)
    # Decomposition identity where defined: 7*daily = trend + seasonal + resid
    for r in interior:
        assert 7 * r["daily_cents"] == r["trend_x7"] + r["seasonal_x7"] + r["resid_x7"]


def test_token_novelty_bruteforce(spark):
    from ddataframeoperation_spark.operators.text import token_novelty

    rows = [
        (1, "alpha beta alpha"),
        (2, "beta gamma"),
        (3, "gamma alpha delta epsilon"),
        (4, ""),            # no tokens: excluded
        (5, None),          # NULL text: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_novelty(df).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["n_tokens"], got[1]["n_distinct"], got[1]["n_novel"]) == (3, 2, 2)
    assert got[1]["novelty_bp"] == 10000
    assert (got[2]["n_distinct"], got[2]["n_novel"]) == (2, 1)  # gamma new
    assert got[2]["novelty_bp"] == 5000
    assert (got[3]["n_distinct"], got[3]["n_novel"]) == (4, 2)  # delta, epsilon
    assert got[3]["novelty_bp"] == 5000


def test_cusum_changepoint_detects_level_shift(spark):
    import datetime as dt

    from ddataframeoperation_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = dt.datetime(2024, 3, 1)
    # Group "shift": 10 days at 100 cents then 10 days at 500 — CUSUM
    # |S| peaks exactly at the last low day (day index 9). Group "flat":
    # constant series — every S_t = 0, earliest-day tiebreak wins.
    rows = []
    for i in range(20):
        v = 1.0 if i < 10 else 5.0
        rows.append((base + dt.timedelta(days=i), "shift", v))
        rows.append((base + dt.timedelta(days=i), "flat", 2.0))
    df = spark.createDataFrame(rows, "ts timestamp, grp string, value double")
    out = {
        r["grp"]: r
        for r in cusum_changepoint(
            df, "ts", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"), "grp"
        ).collect()
    }
    assert out["shift"]["change_day"] == (base + dt.timedelta(days=9)).date()
    assert out["shift"]["n_days"] == 20
    # S_t at day 9 (0-based): 10 days * (n*x - T) = 10*(20*100 - 6000) = -40000
    assert out["shift"]["s_max_abs"] == "40000"
    assert out["flat"]["change_day"] == base.date()
    assert out["flat"]["s_max_abs"] == "0"


def test_keyword_pagerank_centrality_beats_frequency(spark):
    from ddataframeoperation_spark.operators.text import keyword_pagerank

    # "hub" co-occurs with many distinct tokens; "spam" repeats more
    # often but only inside one two-token phrase. Centrality must rank
    # hub over spam even though spam's raw frequency is higher.
    docs = (
        ["hub alpha", "hub beta", "hub gamma", "hub delta", "hub epsilon"] * 3
        + ["spam filler"] * 20
    )
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "doc_id long, text string")
    out = keyword_pagerank(df, min_count=3, n_iter=4, k=5).collect()
    toks = [r["token"] for r in out]
    assert len(toks) == 5 and len(set(toks)) == 5
    assert all(r["rank_units"] > 0 for r in out)
    assert toks.index("hub") < toks.index("spam")
    # ordered by rank desc (token asc tiebreak) by contract
    ranks = [r["rank_units"] for r in out]
    assert ranks == sorted(ranks, reverse=True)


def test_binary_quantize_and_hamming_bruteforce(spark):
    import random

    from ddataframeoperation_spark.operators.similarity import (
        binary_hamming_topk,
        binary_quantize,
    )

    rng = random.Random(7)
    dim = 64
    vecs = {i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(40)}
    # Force the sign bit (element 63 > 0) on some rows — the two's-
    # complement packing path must stay exact.
    for i in range(0, 40, 3):
        vecs[i][63] = abs(vecs[i][63]) + 0.5
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )

    def pack(v):
        bits = 0
        for i, x in enumerate(v):
            if x > 0:
                bits |= 1 << i
        return bits - (1 << 64) if bits >= 1 << 63 else bits

    got = {
        r["vec_id"]: r["c"][0]
        for r in df.select(
            "vec_id", binary_quantize(F.col("embedding"), dim).alias("c")
        ).collect()
    }
    assert got == {i: pack(v) for i, v in vecs.items()}

    q = vecs[0]
    out = binary_hamming_topk(df, q, k=10).collect()

    def ham(a, b):
        return sum((x > 0) != (y > 0) for x, y in zip(a, b))

    brute = sorted(((ham(v, q), i) for i, v in vecs.items()))[:10]
    assert [(r["hamming"], r["vec_id"]) for r in out] == brute
    assert out[0]["vec_id"] == 0 and out[0]["hamming"] == 0


def test_grouped_agg_udf_mad_matches_pandas(spark):
    import pandas as pd

    from ddataframeoperation_spark.operators.script import (
        grouped_agg_pandas_udf,
    )

    rows = [("a", 1.0), ("a", 3.0), ("a", 100.0), ("a", None),
            ("b", 5.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, x double")

    def _mad(s: pd.Series) -> float:
        m = s.median()
        return float((s - m).abs().median())

    mad = grouped_agg_pandas_udf(_mad, "double")
    got = {r["g"]: r["m"] for r in
           df.groupBy("g").agg(mad(F.col("x")).alias("m")).collect()}
    # group a (NaN skipped): median 3 -> |1-3|,|3-3|,|100-3| -> median 2
    assert got["a"] == 2.0
    # group b: median 7 -> |5-7|,|9-7| -> median 2
    assert got["b"] == 2.0


def test_csv_quoted_roundtrip_nasty_strings(spark):
    import shutil
    import tempfile

    nasty = [
        (1, 'comma, "doubled" quote'),
        (2, "line1\nline2\r\nline3"),
        (3, "back\\slash and trailing space "),
        (4, "ünïcode — em–dash"),
        (5, ""),
    ]
    src = spark.createDataFrame(nasty, "id long, s string")
    root = tempfile.mkdtemp(prefix="csvq_test_")
    try:
        path = f"{root}/t"
        (src.write.mode("overwrite").option("header", "true")
            .option("escape", '"').option("quoteAll", "true")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false").csv(path))
        back = {
            r["id"]: r["s"]
            for r in spark.read.option("header", "true")
            .option("multiLine", "true").option("escape", '"')
            .schema("id long, s string").csv(path).collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    for i, s in nasty[:4]:
        assert back[i] == s, (i, back[i], s)
    # Known CSV asymmetry, pinned: a written empty string reads back NULL
    # under Spark defaults (why the b29 query guarantees non-empty text).
    assert back[5] is None


def test_rolling_origin_folds_bruteforce(spark):
    import datetime as dt

    from ddataframeoperation_spark.operators.sampling import (
        rolling_origin_folds,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = rolling_origin_folds(
        df, "ts", ["2024-01-11", "2024-01-16"], "5 days"
    ).collect()
    got = {(r["fold"], r["id"]): r["split"] for r in out}
    for k, cut_day in enumerate((10, 15)):
        for i in range(30):
            if i < cut_day:
                assert got[(k, i)] == "train"
            elif i < cut_day + 5:
                assert got[(k, i)] == "test"
            else:
                assert (k, i) not in got

    import pytest

    with pytest.raises(ValueError):
        rolling_origin_folds(df, "ts", [])


def test_json_key_census_dynamic_and_null_contract(spark):
    from ddataframeoperation_spark.functions.schema import json_key_census

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2}',),
        ('{"a": 1, "c": true}',),
        ('not json at all',),
        (None,),
    ]
    df = spark.createDataFrame(rows, "j string")
    got = {
        r["key"]: (r["n_rows"], r["n_distinct_values"])
        for r in json_key_census(df, "j").collect()
    }
    assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}


def test_seasonal_mad_anomalies_flags_the_spike(spark):
    import datetime as dt

    from ddataframeoperation_spark.operators.timeseries import (
        seasonal_mad_anomalies,
    )

    base = dt.datetime(2024, 1, 1)  # Monday
    # Pure weekly signal for 28 days, except day 15 carries a huge spike.
    rows = []
    for i in range(28):
        v = float((base + dt.timedelta(days=i)).weekday() + 1)
        if i == 15:
            v += 500.0
        rows.append((base + dt.timedelta(days=i), "g", v))
    df = spark.createDataFrame(rows, "ts timestamp, grp string, value double")
    out = seasonal_mad_anomalies(
        df, "ts", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        "grp", k_mad=3,
    ).collect()
    flagged = {r["d"] for r in out}
    spike_day = (base + dt.timedelta(days=15)).date()
    assert spike_day in flagged
    # The spike leaks into its neighbors' trend frames; it must still be
    # the LARGEST deviation by far.
    top = max(out, key=lambda r: r["dev"])
    assert top["d"] == spike_day
    assert all(r["dev"] > 3 * r["mad"] for r in out)


def test_common_neighbor_pairs_bruteforce(spark):
    from ddataframeoperation_spark.operators.dedup import (
        common_neighbor_pairs,
    )

    # Path graph 1-2-3-4-5 plus edge (10,2),(10,4):
    # non-adjacent pairs with >=2 common neighbors:
    #   (1,3) via 2 only -> 1 common, excluded at min_common=2
    #   (3,10) via {2,4} -> 2 commons, reported
    #   (2,4) via {3,10} -> 2 commons, reported
    #   (1,5): none. (2,10)/(4,10) adjacent -> excluded.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 2), (10, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in common_neighbor_pairs(pairs, min_common=2).collect()
    }
    assert got == {(3, 10): 2, (2, 4): 2}

    got1 = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in common_neighbor_pairs(pairs, min_common=1).collect()
    }
    assert got1[(1, 3)] == 1 and (1, 2) not in got1

    import pytest

    with pytest.raises(ValueError):
        common_neighbor_pairs(pairs, min_common=0)


def test_rank_movers_bruteforce(spark):
    import datetime as dt

    from ddataframeoperation_spark.operators.windows import rank_movers

    d1, d2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    rows = [
        (d1, "a", 3.0), (d1, "b", 2.0), (d1, "c", 1.0),
        (d2, "a", 1.0), (d2, "b", 5.0),        # c absent on day 2
        (d2, "d", 1.0),                        # d appears (tie with a)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, g string, v double")
    out = {
        (r["g"], str(r["period"])): (r["rnk"], r["prev_rank"], r["delta"])
        for r in rank_movers(
            df, ["g"], F.to_date("ts"),
            F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long"),
        ).collect()
    }
    assert out[("a", "2024-01-01")] == (1, None, None)
    assert out[("b", "2024-01-02")] == (1, 2, 1)      # climbed
    # a and d tie on day 2 (100 cents): the group-key tiebreak is part
    # of the rank ORDER BY (the determinism contract), so ranks are
    # strict: a before d.
    assert out[("a", "2024-01-02")][0] == 2
    assert out[("d", "2024-01-02")] == (3, None, None)
    assert out[("a", "2024-01-02")][2] == 1 - 2       # slid from 1 to 2
    assert ("c", "2024-01-02") not in out


def test_bloom_planner_model_and_k_opt(spark):
    import math

    from ddataframeoperation_spark.operators.skew import bloom_filter_planner

    build = spark.createDataFrame(
        [(i,) for i in range(1000)] + [(None,), (5,)], "k long"
    )
    out = bloom_filter_planner(
        build, "k", n_bits_options=(8192, 16384), n_hashes_options=(1, 2, 6)
    ).collect()
    assert len(out) == 6
    for r in out:
        assert r["n_build_keys"] == 1000  # NULL + dup excluded
        m, k = r["n_bits"], r["n_hashes"]
        want = round((1 - math.exp(-(k * 1000) / m)) ** k, 4)
        assert abs(r["fp_pred"] - want) < 1e-9
        assert r["bits_per_key_x100"] == m * 100 // 1000
        k_opt = max(1, math.floor(math.log(2) * m / 1000 + 0.5))
        assert r["is_k_opt"] == (k == k_opt)


def test_group_mode_tiebreak_and_nulls(spark):
    from ddataframeoperation_spark.operators.relational import group_mode

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
            ("h", None), ("h", None), ("h", "z")]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {r["k"]: (r["mode_value"], r["n"])
           for r in group_mode(df, ["k"], "v").collect()}
    assert got["g"] == ("a", 2)   # tie a/b at 2 -> smallest value wins
    assert got["h"] == (None, 2)  # NULL is a candidate like any other


def test_match_one_to_one_bruteforce(spark):
    from ddataframeoperation_spark.operators.relational import (
        match_one_to_one,
    )

    a = spark.createDataFrame(
        [(1, 101, 1.0), (1, 102, 2.0), (1, 103, 3.0), (2, 201, 1.0)],
        "u long, aid long, t double",
    )
    b = spark.createDataFrame(
        [(1, 901, 5.0), (1, 902, 1.0), (3, 301, 1.0)],
        "u long, bid long, t double",
    )
    m = match_one_to_one(
        a.select("u", "aid", F.col("t").alias("ta")),
        b.select("u", "bid", F.col("t").alias("tb")),
        ["u"],
        order_a=[F.col("ta").asc(), F.col("aid").asc()],
        order_b=[F.col("tb").asc(), F.col("bid").asc()],
    ).select("u", "k", "aid", "bid").collect()
    got = {(r["u"], r["k"]): (r["aid"], r["bid"]) for r in m}
    # user 1: a-order 101,102,103; b-order 902,901 -> 2 matches; 103 unmatched
    assert got == {(1, 1): (101, 902), (1, 2): (102, 901)}


def test_class_balance_caps_and_determinism(spark):
    from ddataframeoperation_spark.operators.sampling import class_balance

    rows = ([(i, "big") for i in range(50)]
            + [(100 + i, "small") for i in range(5)]
            + [(None, "big")])
    df = spark.createDataFrame(rows, "id long, label string")
    out = class_balance(df, "label", ["id"], salt="t").collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], set()).add(r["id"])
    assert len(by_label["big"]) == 5 and len(by_label["small"]) == 5
    assert None not in by_label["big"]  # NULL-key row excluded
    # Determinism: a second run selects the identical rows.
    out2 = {(r["id"], r["label"]) for r in
            class_balance(df, "label", ["id"], salt="t").collect()}
    assert out2 == {(r["id"], r["label"]) for r in out}
