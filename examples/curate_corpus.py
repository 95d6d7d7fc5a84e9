"""End-to-end corpus curation with the engine — the composition a
training-data team would actually run, wiring the catalog's
operators into one pipeline:

    read → PII scrub → exact dedup → near-dup survivor selection →
    length quality gate → token-budget selection →
    shuffle-shard parquet export (counts reconciled)

(The catalog holds the richer variants of each stage — full q89
quality gate, temperature mixture q87, packing q79, manifest
exports — this example keeps one representative per stage.)

Run directly (defaults to the sf0.001 fixture):

    python examples/curate_corpus.py [SF_DIR] [OUT_DIR]

Every step is the same code path the oracle-verified catalog
queries use; this file only composes them. At 100 TB the composition
is unchanged — each stage's scale story is documented on the
operator itself.
"""

from __future__ import annotations

import os
import sys
import tempfile

# runnable from a checkout without installation
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    token_budget_parts: tuple[int, int] = (1, 2),
    seq_len: int = 512,
    n_shards: int = 8,
) -> dict:
    """Run the full curation pipeline; returns a stage-by-stage
    row-count audit dict (the numbers a data card reports)."""
    from car_insurance_data_pipeline_spark_spark.functions.text import (
        pii_scrub,
    )
    from car_insurance_data_pipeline_spark_spark.operators.dedup import (
        exact_dedup,
        near_dup_pairs,
    )
    from car_insurance_data_pipeline_spark_spark.operators.graph import (
        connected_components,
    )
    from car_insurance_data_pipeline_spark_spark.plans.corpusops import (
        token_budget_select,
    )
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_table,
    )

    audit: dict[str, int] = {}
    docs = read_table(spark, sf_dir, "documents")
    audit["input"] = docs.count()

    # 1. PII scrub — narrow codegen map, no shuffle
    counts, masked = pii_scrub(F.col("text"))
    docs = docs.withColumn(
        "n_pii", sum(counts.values(), F.lit(0)).cast("int")
    ).withColumn("text", masked)

    # 2. exact dedup on content (deterministic min-doc_id survivor)
    docs = exact_dedup(docs, key_cols=["text"], order_cols="doc_id")
    audit["after_exact_dedup"] = docs.count()

    # 3. near-dup survivor selection: cost-dispatched pair mining →
    #    components → keep the longest doc per cluster (q88
    #    semantics). dispatch='auto' MEASURES the prefix-candidate
    #    volume and routes lossless prefix-Jaccard vs MinHash-LSH
    #    (round-11; at 100 TB the same line routes to the sketch
    #    without an edit — the budget note lives on the operator).
    #    NOTE: this stage's SEMANTICS also changed with the round-11
    #    switch, deliberately: the old jaccard_pairs call mined at
    #    threshold 0.1 with a max_postings=1000 df-cut (approximate
    #    on boilerplate); this mines EXACTLY at 0.3 — the dispatch
    #    family's calibrated regime — so audit counts differ from
    #    pre-round-11 runs (fewer, higher-confidence merges).
    pairs = near_dup_pairs(
        docs, "doc_id", "text", k=3, threshold=0.3, dispatch="auto"
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    labeled = docs.join(
        comp, docs["doc_id"] == comp["node"], "left"
    ).select(
        docs["*"],
        F.coalesce(comp["component"], docs["doc_id"]).alias("component"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    docs = (
        labeled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "component")
    )
    audit["after_neardup"] = docs.count()

    # 4. quality gate: repetition ratio + length band (cheap JVM
    #    columns; thresholds from the q89 gate)
    toks = F.split(F.trim(F.lower(F.coalesce("text", F.lit("")))), r"\s+")
    docs = docs.withColumn("__n_tok", F.size(toks)).filter(
        F.col("__n_tok").between(12, 4000)
    )
    audit["after_quality"] = docs.count()

    # 5. token-budget selection (greedy by type-token quality under
    #    half the surviving corpus's tokens — bucket-prefix plan)
    num, den = token_budget_parts
    flagged = token_budget_select(
        docs, budget_parts=(num, den), id_col="doc_id", text_col="text"
    )
    docs = docs.join(
        flagged.filter(F.col("selected") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    audit["after_budget"] = docs.count()

    # 6. shuffle-shard export with manifest (deterministic md5
    #    shards; manifest rows reconcile against written files)
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_parquet,
    )

    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("int"),
        F.lit(n_shards),
    ).alias("shard")
    final = docs.select("doc_id", "text", "lang", "source", shard)
    write_parquet(final, out_dir, partition_by=["shard"])
    back = spark.read.parquet(out_dir)
    audit["exported"] = back.count()
    assert audit["exported"] == audit["after_budget"], "export lost rows"
    return audit


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="curated_corpus_")
    )
    from car_insurance_data_pipeline_spark_spark.session import get_session

    spark = get_session()
    audit = curate(spark, sf_dir, out_dir)
    for k, v in audit.items():
        print(f"{k:>20s}: {v}")
    print(f"curated corpus written to {out_dir}")


if __name__ == "__main__":
    main()
