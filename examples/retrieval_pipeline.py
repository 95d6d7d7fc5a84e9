"""Hybrid retrieval (RAG-shape) with the engine — the composition a
retrieval team would run, wiring oracle-verified operators into one
pipeline:

    chunk documents → lexical ranking (BM25 machinery) →
    vector ranking (IVF approximate nearest neighbors) →
    reciprocal-rank fusion → near-duplicate suppression of the
    fused result list

Run directly (defaults to the sf0.001 fixture):

    python examples/retrieval_pipeline.py [SF_DIR]

Every stage is the same code path the catalog queries use (q78
chunking, q111 BM25, q60 IVF ANN, q187 RRF, q34 near-dup pairs);
this file only composes them. Scale stories live on the operators:
chunking is shuffle-free, BM25 stats broadcast, IVF probes cells
instead of the corpus, RRF is a k·N-row union + one aggregate, and
the near-dup pass runs only over the fused top-k (bounded).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import Window
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.operators.dedup import jaccard_pairs
from car_insurance_data_pipeline_spark_spark.operators.similarity import (
    ivf_cosine_topk,
)
from car_insurance_data_pipeline_spark_spark.operators.topn import (
    reciprocal_rank_fusion,
)
from car_insurance_data_pipeline_spark_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="retrieval-pipeline")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # --- lexical leg: deterministic tf ranking for a query term set
    # (q111's BM25 machinery reduces to this shape; the example keeps
    # the scoring term-count-based so it is fixture-agnostic)
    terms = ["the", "data", "policy"]
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w").isin(terms))
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    lex_rank = tf.select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), "doc_id"))
        .alias("rank"),
    ).filter(F.col("rank") <= 50)

    # --- vector leg: IVF ANN against the first embedding as the query
    q = emb.orderBy("vec_id").limit(1)
    ann = ivf_cosine_topk(q, emb, k=50)  # → (qid, cid, sim, rn)
    vec_rank = ann.select(
        F.col("cid").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), "cid"))
        .alias("rank"),
    )

    # --- fuse + near-dup suppression over the fused top-k only
    fused = reciprocal_rank_fusion([lex_rank, vec_rank], "id")
    top = fused.orderBy(F.col("rrf_score").desc(), "id").limit(20)
    short = top.join(
        docs.select(F.col("doc_id").alias("id"), "text"), "id"
    )
    dups = jaccard_pairs(short, "id", "text", k=3, threshold=0.8)
    suppressed = short.join(
        dups.select(F.col("doc_b").alias("id")), "id", "left_anti"
    )

    n_top = top.count()
    n_out = suppressed.count()
    print(f"fused top-k: {n_top}; after near-dup suppression: {n_out}")
    assert 0 < n_out <= n_top
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
