"""Corpus-export catalog queries: the last mile of a training-data
pipeline. Deterministic global shuffle + shard assignment (the
"shuffle the corpus, write numbered shards" step every pretraining
run needs), per-source contribution capping (skew-resistant grouped
top-N), and sketch-based quantile profiling for corpus QA.

North-star extensions (not in the reference — no reference cite
possible). Determinism rules: shuffle keys and shard ids derive from
md5 hex prefixes (byte-compatible across Spark and DuckDB — see
functions/sampling.py), never rand(); window orders always end in a
unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.operators.topn import topn_per_group
from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table
from car_insurance_data_pipeline_spark_spark.plans.relational import events_with_us

_N_SHARDS = 8
_SOURCE_CAP = 10


@query(
    "q90_shuffle_shards",
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
)
SELECT doc_id,
  CAST(CAST('0x' || substring(hx, 1, 4) AS INT) % {_N_SHARDS} AS INT)
    AS shard_id,
  CAST(row_number() OVER (
    PARTITION BY CAST('0x' || substring(hx, 1, 4) AS INT) % {_N_SHARDS}
    ORDER BY substring(hx, 5, 28), doc_id) AS INT) AS pos
FROM h
""",
)
def q90_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data export: every
    document gets a pseudorandom (but reproducible) position —
    (shard_id, pos) — derived solely from md5('shuffle:' || doc_id).
    Bits 1-4 of the hex pick the shard; the remaining bits order rows
    within the shard. Same corpus → same shard layout on every run,
    engine, and partitioning, which is what makes the export step
    resumable and oracle-checkable (a rand()-based shuffle is
    neither).

    Scale: the per-shard row_number is a window partitioned by
    shard_id — at 100 TB you raise ``_N_SHARDS`` to O(thousands) so
    each shard's sort is a few tens of GB and all shards sort in
    parallel (total work = one global sort, no single-task funnel).
    The actual write is then ``repartition(shard_id).
    sortWithinPartitions(sort_key)`` + partitioned parquet sink —
    same plan shape, sink instead of rank."""
    d = table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard_id").orderBy("sort_key", "doc_id")
    return (
        d.select(
            "doc_id",
            F.pmod(
                F.conv(F.substring(hx, 1, 4), 16, 10).cast("int"),
                F.lit(_N_SHARDS),
            )
            .cast("int")
            .alias("shard_id"),
            F.substring(hx, 5, 28).alias("sort_key"),
        )
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .drop("sort_key")
    )


@query(
    "q91_source_cap",
    oracle=f"""
SELECT source, doc_id, n_chars, CAST(rn AS INT) AS rn FROM (
  SELECT source, doc_id, n_chars,
    row_number() OVER (
      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) t
WHERE rn <= {_SOURCE_CAP}
""",
)
def q91_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution capping: keep at most N documents per
    source, preferring the longest (quality proxy), doc_id
    tie-break — the "no single domain dominates the corpus" step of
    a pretraining mix.

    The point is HOW it ranks: ``topn_per_group`` (operators/topn.py)
    computes per-source top-N with a two-phase salted window, so the
    per-source sort state is bounded at N·B rows even when one source
    is 100× the others — the exact skew profile web corpora have.
    Result (and the oracle) is identical to the naive single-window
    row_number; only the physical plan differs."""
    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return topn_per_group(
        d,
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        n=_SOURCE_CAP,
        tie_col="doc_id",
        salt_buckets=8,
    ).select("source", "doc_id", "n_chars", "rn")


@query("q92_quantile_sketch")  # rows-only: sketch output is
# engine-specific by construction; accuracy is bounds-tested in
# tests/test_export_queries.py against exact percentiles.
def q92_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus QA profile: per event_type, KLL-style
    approximate quantiles (``percentile_approx``, accuracy 1000) of
    the value column plus an HLL++ distinct-user estimate. The
    mergeable-sketch path for 100 TB profiling — one pass, fixed
    sketch memory per group, partial-aggregable — complementing
    q46_exact_percentiles (exact single-node semantics) and
    q47_approx_distinct (HLL on lineitem).

    No oracle by design: sketch internals (GK/KLL compaction, HLL
    register layout) differ across engines, so values are
    rank-error-bound-tested instead (tests/test_export_queries.py
    asserts each approximate quantile falls within the ±1/accuracy
    rank window of the exact order statistics)."""
    e = events_with_us(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 1000).alias("value_q"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
