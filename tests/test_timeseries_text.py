"""Time-series rollup and corpus-prep pipeline tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddataframeoperation_spark.operators import text as TX
from ddataframeoperation_spark.operators.timeseries import (
    multi_granularity_rollup,
    time_bucket,
)


def test_rollup_levels_consistent(spark):
    rows = [
        ("2024-03-01 10:15:00", 1.0),
        ("2024-03-01 10:45:00", 2.0),
        ("2024-03-01 11:15:00", 4.0),
        ("2024-03-02 09:00:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = multi_granularity_rollup(
        df, "ts", ["hour", "day", "month"],
        [F.round(F.sum("value"), 4).alias("s"), F.count("*").alias("n")],
    )
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["granularity"], []).append((str(r["bucket_start"]), r["s"], r["n"]))
    # Every level totals the same mass.
    for g in ("hour", "day", "month"):
        assert sum(s for _, s, _ in by_g[g]) == 15.0
        assert sum(n for _, _, n in by_g[g]) == 4
    assert len(by_g["hour"]) == 3 and len(by_g["day"]) == 2 and len(by_g["month"]) == 1


def test_time_bucket_rejects_unknown():
    with pytest.raises(ValueError):
        time_bucket("ts", "fortnight")


def test_vocabulary_df_filter(spark):
    rows = [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v = {r["token"]: (r["tf"], r["doc_freq"])
         for r in TX.vocabulary(df, min_df=2).collect()}
    assert v == {"banana": (3, 3)}  # apple df=1, cherry df=1 pruned


def test_prepare_corpus_filters_and_dedups(spark):
    good = "The quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, good),
        (2, good + "!"),          # near-normalization dup of 1 -> dropped
        (3, "x@@@###"),           # junk -> quality-filtered
        (4, "Another perfectly reasonable document with plenty of normal words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in TX.prepare_training_corpus(df).collect())
    assert kept == [1, 4]


def test_bpe_merges_actually_merge(spark):
    """'the' collapses to one subword via t+h -> th, th+e -> the; a word
    with no table pairs stays at character count."""
    from ddataframeoperation_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "the"), (2, "xq"), (3, "thermal units")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_pretokens"], r["n_subwords"])
        for r in TX.bpe_subword_stats(df).collect()
    }
    assert got[1] == (1, 1)       # t h e -> th e -> the
    assert got[2] == (1, 2)       # no merge pair for x,q
    # 'thermal' = t h e r m a l -> the r m al -> ther m al (the+r rank 23)
    # 'units'   = u n i t s -> u n it s  (i+t rank 19; no u+n pair)
    assert got[3] == (2, 3 + 4)


def test_resample_ffill_single_observation(spark):
    from ddataframeoperation_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00", 7.0)], "k long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(df, "k", "ts", "v", granularity="day", step="1 day").collect()
    # grid spans exactly the key's own single bucket
    assert len(out) == 1 and out[0]["value"] == 7.0 and out[0]["is_gap"] is False


def test_chunk_documents_windows_and_tail(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b"), (3, "!!!")],
        "doc_id long, text string",
    )
    out = TX.chunk_documents(df, window=4, stride=3)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    # 10 tokens, starts 0/3/6/9: three full windows plus a 1-token tail.
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert got[(1, 3)] == ("t9", 1)
    # Short doc: single partial window.
    assert got[(2, 0)] == ("a b", 2)
    # No alphanumeric content: one chunk holding the single empty token
    # (the word_stats token-count contract on both engines).
    assert got[(3, 0)] == ("", 1)
    assert len(got) == 6
    with pytest.raises(ValueError):
        TX.chunk_documents(df, window=0, stride=3)


def test_bm25_prefers_term_dense_short_docs(spark):
    from ddataframeoperation_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "spark spark spark"),             # dense in the query term
            (2, "spark filler filler filler filler filler filler filler"),
            (3, "nothing relevant here"),
            (4, "common common common"),          # no query term
        ],
        "doc_id long, text string",
    )
    out = TX.bm25_topk(df, ["spark"], k=3).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1            # tf-dense short doc wins
    assert set(ids) == {1, 2}     # docs without the term score nothing
    assert all(r["bm25"] > 0 for r in out)
