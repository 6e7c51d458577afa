"""Runnable demo: an LLM training-data prep pipeline on this engine.

The north-star workload: profile a raw corpus, score quality, identify
language, drop near-duplicates (exact fingerprint + MinHash LSH), build a
vocabulary, and attach embedding-similarity metadata — all declarative
Spark, all of it scale-shaped (see SCALE.md).

Run: python examples/training_data_pipeline.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import dedup, relational as R, similarity
from ddataframeoperation_spark.operators import text as TX
from ddataframeoperation_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("pipeline-demo")
    docs = read_fixture_table(spark, SF_DIR, "documents")
    emb = read_fixture_table(spark, SF_DIR, "embeddings")

    print("== 1. profile the raw corpus")
    R.profile(docs, ["lang", "source", "n_chars"]).show(truncate=False)

    print("== 2. quality + language scoring")
    scored = docs.select(
        "doc_id",
        TX.quality_score("text").alias("quality"),
        TX.language_id("text").alias("pred_lang"),
    )
    scored.groupBy("pred_lang").agg(
        F.count("*").alias("n"), F.round(F.avg("quality"), 3).alias("avg_q")
    ).show()

    print("== 3. cleaned + deduped corpus (quality>=0.5, keep-first)")
    corpus = TX.prepare_training_corpus(docs, min_quality=0.5)
    print("   kept", corpus.count(), "of", docs.count(), "docs")

    print("== 4. MinHash LSH near-duplicate candidates -> clustered dedup")
    cands = dedup.minhash_candidates(docs)
    print("   candidate pairs:", cands.count())
    survivors = dedup.cluster_dedup(docs, cands)
    print("   after cluster dedup:", survivors.count(), "docs")

    print("== 5. vocabulary (df >= 5)")
    TX.vocabulary(docs, min_df=5).orderBy(F.desc("tf")).show(5)

    print("== 6. embedding similarity: top-5 neighbors of vec 0")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    similarity.cosine_topk(emb, q, k=5).show()

    print("== 7. benchmark decontamination (5-gram overlap vs held-out set)")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    tgt = docs.filter(F.col("doc_id") % 20 != 0)
    cont = TX.ngram_contamination(tgt, bench, n=5)
    cont.groupBy((F.col("contamination") >= 0.5).alias("contaminated")).count().show()

    print("== 8. deterministic 80/10/10 split (md5-hash; partitioning-stable)")
    from ddataframeoperation_spark.operators import sampling

    train, val, test = sampling.hash_split(docs, [0.8, 0.1, 0.1], ["doc_id"], "demo")
    print("   train/val/test:", train.count(), val.count(), test.count())

    print("== 9. sequence packing (512-token bins per source shard)")
    packed = TX.pack_sequences(train, budget=512, shard_col="source")
    packed.groupBy("source").agg(
        (F.max("bin") + 1).alias("n_bins"), F.sum("n_tokens").alias("tokens")
    ).orderBy("source").show(5)

    print("== 10. token-budgeted mixture (1,000 tokens per source)")
    mix = sampling.token_budget_mix(train, 1000, salt="demo", count_out="ntok")
    mix.groupBy("source").agg(
        F.count("*").alias("docs"), F.sum("ntok").alias("tokens")
    ).orderBy("source").show(5)

    print("== 11. epoch-0 shard/position order for 4 training readers")
    order = sampling.epoch_shard_order(mix, epoch=0, n_shards=4)
    order.groupBy("shard").agg(
        F.count("*").alias("docs"), F.max("position").alias("last_pos")
    ).orderBy("shard").show()

    print("== 12. DPO preference pairs (best-vs-worst quality per prompt)")
    cands = docs.select(
        (F.col("doc_id") % 97).alias("prompt_id"),
        "doc_id",
        F.round(TX.quality_score("text") * 10000, 0)
        .cast("long")
        .alias("score"),
    )
    pairs = TX.preference_pairs(
        cands, group_col="prompt_id", id_col="doc_id", score_col="score"
    )
    pairs.orderBy(F.desc("margin")).show(5)

    print("== 13. corpus keywords (TextRank / exact fixed-point PageRank)")
    TX.keyword_pagerank(docs, min_count=5, n_iter=4, k=8).show()


if __name__ == "__main__":
    main()
