"""Runnable demo: the round-7 retrieval loop on this engine.

Hybrid search end-to-end: lexical BM25 and dense cosine candidates for a
query, reciprocal-rank fusion, MMR diversification of the dense run, and
a recall/MRR/nDCG report card against label-match relevance judgments —
the retrieve → fuse → diversify → evaluate cycle of a RAG or
training-data curation pipeline, all of it candidate-list-sized after
the two corpus scans.

Run: python examples/hybrid_retrieval.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ddataframeoperation_spark.catalog import read_fixture_table
from ddataframeoperation_spark.operators import retrieval as RT
from ddataframeoperation_spark.operators import similarity
from ddataframeoperation_spark.operators import text as TX
from ddataframeoperation_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("retrieval-demo")
    docs = read_fixture_table(spark, SF_DIR, "documents")
    emb = read_fixture_table(spark, SF_DIR, "embeddings")

    print("== 1. lexical candidates (BM25 top-10)")
    lex = TX.bm25_topk(docs, ["join", "spark", "window"], k=10)
    lex.show()

    print("== 2. dense candidates (exact cosine top-10, query = vec 0)")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    dense = similarity.cosine_topk(emb, qvec, k=10)
    dense.show()

    print("== 3. hybrid fusion (reciprocal-rank)")
    fused = RT.rrf_fusion(
        [
            dense.select(F.col("vec_id").alias("doc_id"), F.col("cos_sim").alias("s")),
            lex.select("doc_id", F.col("bm25").alias("s")),
        ],
        id_col="doc_id",
        score_col="s",
    )
    fused.orderBy(F.col("rrf_score").desc()).show()

    print("== 4. MMR diversification of a 3-query dense run (top-5 each)")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    pred = similarity.cosine_topk_multi(emb, queries, k=10)
    RT.mmr_diversify(pred, emb, k=5, lamb=0.7).orderBy(
        "query_id", "mmr_rank"
    ).show()

    print("== 5. report card vs label-match judgments")
    q_labels = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "label"
    )
    qrels = (
        emb.select("vec_id", "label")
        .join(F.broadcast(q_labels), on="label")
        .select("query_id", "vec_id", F.lit(1).alias("grade"))
    )
    RT.retrieval_metrics(
        pred, qrels, k=10, id_col="vec_id", score_col="cos_sim"
    ).orderBy("query_id").show()

    spark.stop()


if __name__ == "__main__":
    main()
