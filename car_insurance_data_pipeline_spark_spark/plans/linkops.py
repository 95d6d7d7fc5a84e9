"""Record-linkage and interval-analytics catalog queries (round 4):
blocked fuzzy-matching (entity resolution) and sweep-line interval
concurrency. Both are north-star extensions (not in the reference —
no reference cite possible), both oracle-checked.

Cross-engine determinism notes specific to this module:

- Fuzzy matching normalizes text identically in both engines
  (trim → lower → collapse ``\\s+`` to one space; DuckDB needs the
  explicit ``'g'`` flag to match Spark's replace-all default) and
  compares fixed 40-char prefixes, so ``levenshtein`` sees the same
  byte sequences. Edit distance is exact integer arithmetic — no
  float parity concerns.
- All interval arithmetic is integer epoch-µs (the ts_us_expr
  discipline); the day key is an integer epoch-day (``ts_us div
  86_400_000_000``), never a session-timezone DATE cast.
- Window orderings carry a unique tie-break: (t_us, delta, event_id)
  is unique because each event contributes exactly one +1 and one -1
  boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table

# Blocking caps the per-block pair count at _MAX_BLOCK^2/2 — the
# standard record-linkage guard against a degenerate block (e.g. all
# docs sharing a boilerplate opening) going quadratic.
_FUZZY_PREFIX = 40
_FUZZY_BLOCK = 8
_FUZZY_MAX_DIST = 5
_MAX_BLOCK = 50


@query(
    "q133_fuzzy_pairs",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
    substring(regexp_replace(trim(lower(COALESCE(text, ''))),
              '\\s+', ' ', 'g'), 1, {_FUZZY_PREFIX}) AS pfx
  FROM documents
), blocked AS (
  SELECT doc_id, pfx, substring(pfx, 1, {_FUZZY_BLOCK}) AS blk,
    COUNT(*) OVER (PARTITION BY substring(pfx, 1, {_FUZZY_BLOCK})) AS blk_n
  FROM p
), kept AS (
  SELECT * FROM blocked WHERE blk_n <= {_MAX_BLOCK}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(levenshtein(a.pfx, b.pfx) AS INT) AS dist
FROM kept a JOIN kept b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {_FUZZY_MAX_DIST}
ORDER BY doc_a, doc_b
""",
)
def q133_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-duplicate pairs (entity resolution): normalize
    each document's 40-char prefix, block on the first 8 chars, and
    emit within-block pairs whose prefix edit distance is ≤ 5. The
    edit-distance complement to the token-set (q34 Jaccard) and
    hash-signature (q35/q36) dedup families — catches small
    character-level mutations those miss.

    Cross-engine determinism: identical normalization (see module
    docstring); levenshtein is exact integer DP in both engines.

    Scale: blocking bounds the candidate set — one hash exchange on
    the block key for the window count, and the self-join reuses that
    same partitioning (join key = blk), so no block's pairs ever
    leave one task. The blk_n ≤ 50 df-cut (mirrored in the oracle)
    caps per-task work at 50²/2 ≈ 1.2k distance computations; the
    Spark side passes a threshold to levenshtein so the DP early-
    terminates at distance 6 (band algorithm), which the DuckDB
    oracle cannot express but which never changes kept-pair values.
    """
    docs = table(spark, sf_dir, "documents")
    pfx = F.substring(
        F.regexp_replace(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
        ),
        1,
        _FUZZY_PREFIX,
    )
    p = docs.select("doc_id", pfx.alias("pfx")).withColumn(
        "blk", F.substring("pfx", 1, _FUZZY_BLOCK)
    )
    kept = (
        p.withColumn("blk_n", F.count("*").over(Window.partitionBy("blk")))
        .filter(F.col("blk_n") <= _MAX_BLOCK)
        .select("doc_id", "pfx", "blk")
    )
    a, b = kept.alias("a"), kept.alias("b")
    # threshold=+1 lets the banded DP bail out early; it returns -1
    # for "above threshold", so keep the filter on the real distance.
    dist = F.levenshtein(F.col("a.pfx"), F.col("b.pfx"), _FUZZY_MAX_DIST + 1)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter((dist >= 0) & (dist <= _FUZZY_MAX_DIST))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


_DAY_US = 86_400_000_000


@query(
    "q134_max_concurrency",
    oracle=f"""
WITH iv AS (
  SELECT event_id, event_type,
    epoch_us(ts) AS s_us,
    epoch_us(ts) // {_DAY_US} AS eday,
    LEAST(epoch_us(ts)
            + CAST(FLOOR(COALESCE(value, 0) * 60) AS BIGINT) * 1000000,
          (epoch_us(ts) // {_DAY_US} + 1) * {_DAY_US}) AS e_us
  FROM events
), b AS (
  SELECT event_type, eday, s_us AS t_us, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT event_type, eday, e_us, -1, event_id FROM iv
)
SELECT event_type,
  strftime(DATE '1970-01-01' + CAST(eday AS INT), '%Y-%m-%d') AS day,
  CAST(MAX(run) AS INT) AS max_concurrent
FROM (
  SELECT event_type, eday,
    SUM(delta) OVER (PARTITION BY event_type, eday
                     ORDER BY t_us, delta, event_id) AS run
  FROM b
)
GROUP BY event_type, eday
ORDER BY event_type, day
""",
)
def q134_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent in-flight events per (event_type, day) via the
    sweep-line +1/−1 boundary trick: each event is an interval
    [ts, ts + value minutes) clamped to its start day; the max of the
    running boundary sum is the day's peak concurrency. The classic
    ops/telemetry interval-overlap aggregation (server sessions,
    concurrent claims, call-center load).

    Cross-engine determinism: integer epoch-µs throughout; duration
    is FLOOR(value·60) whole seconds (identical IEEE multiply + floor
    in both engines); NULL value coalesces to 0 so no NULL boundary
    times reach the window ordering (engines disagree on NULL sort
    position); at equal timestamps the −1 boundary sorts before the
    +1 (delta ascending), so touching intervals never count as
    concurrent — and (delta, event_id) completes a unique tie-break.

    Scale: the sweep is windowed per (event_type, eday) — state for
    one day of one type per task, never a global sort (day-clamping
    is what makes the partition key exact rather than approximate).
    At extreme per-day volumes the same range-slice + prefix-offset
    stitching used by token_budget_select (plans/corpusops.py)
    decomposes a day; the catalog shape keeps the declarative form.
    """
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    e = events_with_us(spark, sf_dir)
    iv = e.select(
        "event_id",
        "event_type",
        F.col("ts_us").alias("s_us"),
        F.expr(f"ts_us div {_DAY_US}").alias("eday"),
        F.least(
            F.col("ts_us")
            + F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 60).cast("bigint")
            * F.lit(1_000_000).cast("bigint"),
            (F.expr(f"ts_us div {_DAY_US}") + 1) * F.lit(_DAY_US),
        ).alias("e_us"),
    )
    starts = iv.select(
        "event_type",
        "eday",
        F.col("s_us").alias("t_us"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    ends = iv.select(
        "event_type",
        "eday",
        F.col("e_us").alias("t_us"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "eday").orderBy("t_us", "delta", "event_id")
    return (
        starts.unionByName(ends)
        .withColumn("run", F.sum("delta").over(w))
        .groupBy("event_type", "eday")
        .agg(F.max("run").cast("int").alias("max_concurrent"))
        .select(
            "event_type",
            # ISO string, not DATE: no catalog query emits a raw DATE
            # (engines surface dates differently through Arrow/pandas)
            F.date_format(
                F.date_from_unix_date(F.col("eday").cast("int")), "yyyy-MM-dd"
            ).alias("day"),
            "max_concurrent",
        )
        .orderBy("event_type", "day")
    )
