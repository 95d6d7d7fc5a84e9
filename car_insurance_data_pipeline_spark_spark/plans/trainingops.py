"""Training-set assembly queries (round 4): deterministic
train/val/test splitting, curriculum difficulty binning, and
rank-profile window analytics. All north-star extensions (not in the
reference — no reference cite possible), all oracle-checked.

Cross-engine determinism notes specific to this module:

- Split membership hangs on md5 hex digests of the primary key
  (identical lowercase hex in Spark and DuckDB) — the q75
  hash-sampling discipline extended to a 3-way partition, so the
  EXACT split assignment is oracle-checked, reproducible across
  runs, engines and repartitionings, and stable when new documents
  arrive (old docs never change split).
- Curriculum bin edges are exact interpolated percentiles: both
  engines apply the same lower+(pos-floor(pos))*(upper-lower)
  formula over integer inputs, so the threshold doubles are
  bit-identical and the boundary comparisons agree.
- Character sums stay BIGINT end to end (exact integer addition,
  order-independent); no float aggregation anywhere.
- Window orderings carry a unique tie-break key (c_custkey), which
  makes percent_rank/cume_dist/ntile deterministic: with no
  order-by ties, rank == row_number and both engines evaluate the
  same (k-1)/(n-1) and k/n integer-ratio divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table


@query(
    "q127_dataset_split",
    oracle="""
WITH s AS (
  SELECT lang, n_chars,
    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'ef'
           THEN 'train'
         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'f7'
           THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
GROUP BY split, lang
""",
)
def q127_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: the first md5 byte of the
    document key routes ~93.75% of documents to train (<= 0xef),
    ~3.125% to val (0xf0-0xf7) and ~3.125% to test (0xf8-0xff),
    then per-(split, lang) doc counts and character totals audit the
    split's language balance. Hash routing (vs rand()) is what a
    training pipeline needs: membership is a pure function of the
    key, so re-runs, engine swaps, and incremental corpus additions
    never migrate an old document across the train/test boundary
    (no eval contamination from resplitting).

    Scale: the split label is a narrow codegen'd map evaluated at
    the scan; the only exchange is the partial-aggregated
    (split, lang) rollup — ~3 x n_langs rows.
    """
    d = table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b <= "ef", "train").when(b <= "f7", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@query(
    "q128_curriculum_bins",
    oracle="""
WITH th AS (
  SELECT lang,
    quantile_cont(n_chars, 0.25) AS p25,
    quantile_cont(n_chars, 0.50) AS p50,
    quantile_cont(n_chars, 0.75) AS p75
  FROM documents GROUP BY lang
)
SELECT d.lang,
  CAST(CASE WHEN d.n_chars <= th.p25 THEN 1
            WHEN d.n_chars <= th.p50 THEN 2
            WHEN d.n_chars <= th.p75 THEN 3
            ELSE 4 END AS INTEGER) AS stage,
  COUNT(*) AS n_docs,
  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM documents d JOIN th ON d.lang = th.lang
GROUP BY 1, 2
""",
)
def q128_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: per-language length quartiles split each
    language's documents into 4 difficulty stages (1 = shortest
    quartile ... 4 = longest), with per-(lang, stage) doc counts and
    character totals — the binning step of curriculum-ordered
    training (short/easy first, long/hard last).

    Binning is THRESHOLD-based, not ntile-based, on purpose: ntile
    needs a full per-language sort (one task per language at 100 TB
    — exactly the q79 shard-skew trap), while threshold assignment
    is a narrow map against 3 broadcast doubles per language.
    Thresholds come from exact interpolated percentiles here
    (deterministic cross-engine, hash-matchable); the 100 TB path
    swaps in percentile_approx exactly as q114 documents — same
    plan shape, sketch-merged instead of sort-buffered.

    Scale: one grouped percentile pass (partial-aggregated), a
    broadcast join of the n_langs x 3 threshold table back onto the
    scan, then a partial-aggregated (lang, stage) rollup. No
    full-table sort, no skewed window.
    """
    d = table(spark, sf_dir, "documents")
    th = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.25)).alias("p25"),
        F.percentile("n_chars", F.lit(0.50)).alias("p50"),
        F.percentile("n_chars", F.lit(0.75)).alias("p75"),
    )
    j = d.join(F.broadcast(th), "lang")
    stage = (
        F.when(F.col("n_chars") <= F.col("p25"), 1)
        .when(F.col("n_chars") <= F.col("p50"), 2)
        .when(F.col("n_chars") <= F.col("p75"), 3)
        .otherwise(4)
        .cast("int")
    )
    return (
        j.select("lang", stage.alias("stage"), "n_chars")
        .groupBy("lang", "stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@query(
    "q129_rank_profile",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
  PERCENT_RANK() OVER w AS pr,
  CUME_DIST() OVER w AS cd,
  CAST(NTILE(10) OVER w AS INTEGER) AS decile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q129_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-profile window analytics: percent_rank, cume_dist and
    ntile(10) of customer account balance within market segment —
    the remaining rank-family window functions the catalog didn't
    yet exercise (row_number: q16/W1, lag: q14/W2, rank-cut top-k:
    q16). The unique c_custkey tie-break makes all three
    deterministic (rank == row_number, so pr = (k-1)/(n-1) and
    cd = k/n are exact integer-ratio divisions in both engines).

    Scale: customer is a DIMENSION table, so the per-segment sort
    this query semantically requires (5 segment values -> 5 sort
    tasks) is bounded by dim size, not corpus size. For rank
    profiles over a 100 TB FACT table this exact shape would be the
    q79 skew trap — the scale path is threshold binning against
    percentile sketches (q128) or the two-phase salted top-N
    (operators/topn.py), both of which avoid the per-key global
    sort; this query exists to pin the window-function surface on
    dim-sized inputs.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )
