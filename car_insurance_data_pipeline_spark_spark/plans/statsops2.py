"""Statistics catalog, continuation module (round-9 queue).

Same discipline as :mod:`statsops` (see its module docstring and the
determinism rules in :mod:`catalog`): exact integer/decimal moments,
portable signed floor division, FLOOR-ppm quantization only over
identically-derived doubles, unique tie-breaks, and a plain-Python
replay in ``tests/test_statsops_replays.py`` for every query whose
oracle shares algorithm structure with the Spark plan.

Reference parity note: the reference repo (an 11-script insurance
ETL) has no statistics layer at all — this module is part of the
"operations a large-scale training-data pipeline would need"
extension surface (drift metrics, change-point detection, series
diagnostics), not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table


def _signed_ppm_div(num: str, den: str, scale: int = 1_000_000) -> str:
    """Portable floor((num*scale)/den) for signed ``num``, positive
    ``den`` — Spark DIV truncates while DuckDB ``//`` floors, so the
    negative branch is made explicit on positive operands (the q304
    portability menu). Emits a SQL fragment valid in BOTH dialects
    (Spark DIV spelled via the caller's dialect)."""
    return (
        f"CASE WHEN {num} >= 0 THEN CAST({num} * {scale} DIV {den} AS BIGINT)"
        f" ELSE -CAST(((-({num})) * {scale} + {den} - 1) DIV {den} AS BIGINT)"
        f" END"
    )


# --------------------------------------------------------------------------
# q326: Ljung-Box portmanteau test
# --------------------------------------------------------------------------


@query(
    "q326_ljung_box",
    oracle="""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
    CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS tot
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, hr,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) * tot
      - SUM(CAST(tot AS HUGEINT)) OVER (PARTITION BY event_type) AS cd
  FROM h
), lagged AS (
  SELECT event_type, n, cd,
    LAG(cd, 1) OVER w AS c1,
    LAG(cd, 2) OVER w AS c2,
    LAG(cd, 3) OVER w AS c3
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), m AS (
  SELECT event_type, MAX(n) AS n,
    SUM(cd * cd) AS den,
    SUM(cd * c1) AS num1,
    SUM(cd * c2) AS num2,
    SUM(cd * c3) AS num3
  FROM lagged GROUP BY event_type
), r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_hours,
    CASE WHEN num1 >= 0 THEN CAST(num1 * 1000000 // den AS BIGINT)
      ELSE -CAST(((-(num1)) * 1000000 + den - 1) // den AS BIGINT) END
      AS acf1_ppm,
    CASE WHEN num2 >= 0 THEN CAST(num2 * 1000000 // den AS BIGINT)
      ELSE -CAST(((-(num2)) * 1000000 + den - 1) // den AS BIGINT) END
      AS acf2_ppm,
    CASE WHEN num3 >= 0 THEN CAST(num3 * 1000000 // den AS BIGINT)
      ELSE -CAST(((-(num3)) * 1000000 + den - 1) // den AS BIGINT) END
      AS acf3_ppm
  FROM m
)
SELECT event_type, n_hours, acf1_ppm, acf2_ppm, acf3_ppm,
  CAST(n_hours * (n_hours + 2)
    * (acf1_ppm * acf1_ppm // (n_hours - 1)
     + acf2_ppm * acf2_ppm // (n_hours - 2)
     + acf3_ppm * acf3_ppm // (n_hours - 3)) AS BIGINT) AS lb_q_scaled
FROM r
ORDER BY event_type
""",
)
def q326_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the hourly event-value series —
    the "is there ANY serial structure left" gate run on forecast
    residuals and on raw series before q214's per-lag ACF read. Per
    event type, the lag-1..3 autocorrelations of the hourly totals
    (observed hours only) and the portmanteau statistic
    Q = n(n+2)·Σ_k r_k²/(n−k), computed on the ppm-quantized r_k so
    every term is exact integer arithmetic (documented quantized
    semantics; the replay test reproduces it digit-for-digit). Large
    lb_q_scaled (≈ Q×10¹²) vs the χ²₃ tail ⇒ autocorrelated.
    Columns: event_type, n_hours, acf1_ppm, acf2_ppm, acf3_ppm,
    lb_q_scaled.

    Determinism: hourly totals are exact integer milli-sums; the
    centered series n·x_t − S is exact DECIMAL(38,0) (scaling by n
    cancels in the ratio); r_k uses the portable signed-floor ppm
    division; Q is integer-only from the quantized r_k.

    Scale: identical shape to q214 — one parallel hash-agg collapses
    the fact to |types|×|hours| rows; windows and moments run on
    that tiny frame. At 100 TB the pre-aggregation is still the only
    fact-sized exchange.
    """
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    h = (
        events_with_us(spark, sf_dir)
        .select(
            "event_type",
            F.expr("ts_us DIV 3600000000").alias("hr"),
            F.round(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .groupBy("event_type", "hr")
        .agg(F.sum("v").cast("bigint").alias("tot"))
    )
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("hr")
    c = h.select(
        "event_type",
        "hr",
        F.count("*").over(wp).cast("decimal(38,0)").alias("n"),
        (
            F.count("*").over(wp).cast("decimal(38,0)") * F.col("tot")
            - F.sum(F.col("tot").cast("decimal(38,0)")).over(wp)
        )
        .cast("decimal(38,0)")
        .alias("cd"),
    )
    lagged = c.select(
        "event_type",
        "n",
        "cd",
        F.lag("cd", 1).over(wo).alias("c1"),
        F.lag("cd", 2).over(wo).alias("c2"),
        F.lag("cd", 3).over(wo).alias("c3"),
    )
    m = lagged.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("cd") * F.col("cd")).cast("decimal(38,0)").alias("den"),
        F.sum(F.col("cd") * F.col("c1")).cast("decimal(38,0)").alias("num1"),
        F.sum(F.col("cd") * F.col("c2")).cast("decimal(38,0)").alias("num2"),
        F.sum(F.col("cd") * F.col("c3")).cast("decimal(38,0)").alias("num3"),
    )
    r = m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        F.expr(_signed_ppm_div("num1", "den")).alias("acf1_ppm"),
        F.expr(_signed_ppm_div("num2", "den")).alias("acf2_ppm"),
        F.expr(_signed_ppm_div("num3", "den")).alias("acf3_ppm"),
    )
    return r.select(
        "event_type",
        "n_hours",
        "acf1_ppm",
        "acf2_ppm",
        "acf3_ppm",
        F.expr(
            "CAST(n_hours * (n_hours + 2)"
            " * (acf1_ppm * acf1_ppm DIV (n_hours - 1)"
            "  + acf2_ppm * acf2_ppm DIV (n_hours - 2)"
            "  + acf3_ppm * acf3_ppm DIV (n_hours - 3)) AS BIGINT)"
        ).alias("lb_q_scaled"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q327: 1-D Wasserstein (earth mover's) drift distance
# --------------------------------------------------------------------------


@query(
    "q327_wasserstein_drift",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c,
    epoch_us(ts) // 86400000000 AS day
  FROM events
), thr AS (
  SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e
), pts AS (
  SELECT event_type, c,
    CAST(SUM(CASE WHEN day < (SELECT mid FROM thr) THEN 1 ELSE 0 END)
      AS BIGINT) AS na,
    CAST(SUM(CASE WHEN day < (SELECT mid FROM thr) THEN 0 ELSE 1 END)
      AS BIGINT) AS nb
  FROM e GROUP BY event_type, c
), cum AS (
  SELECT event_type,
    CAST(SUM(na) OVER w AS HUGEINT) AS ca,
    CAST(SUM(nb) OVER w AS HUGEINT) AS cb,
    CAST(SUM(na) OVER (PARTITION BY event_type) AS HUGEINT) AS tot_a,
    CAST(SUM(nb) OVER (PARTITION BY event_type) AS HUGEINT) AS tot_b,
    LEAD(c) OVER w - c AS gap
  FROM pts WINDOW w AS (PARTITION BY event_type ORDER BY c)
)
SELECT event_type,
  CAST(MAX(tot_a) AS BIGINT) AS n_early,
  CAST(MAX(tot_b) AS BIGINT) AS n_late,
  CAST(SUM(ABS(ca * tot_b - cb * tot_a) * gap) AS BIGINT)
    AS w1_scaled,
  CAST(SUM(ABS(ca * tot_b - cb * tot_a) * gap) * 1000
    // (MAX(tot_a) * MAX(tot_b)) AS BIGINT) AS w1_millicents
FROM cum WHERE gap IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def q327_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the early
    and late halves of each event type's value distribution — the
    drift metric that, unlike KS (q219) and PSI (q235), weighs HOW
    FAR mass moved, not just that it moved; the standard feature- and
    score-drift measure for retraining triggers. The time split is
    the integer midpoint day of the observed range; W1 is the exact
    ECDF-difference integral Σ|F_a−F_b|·gap over the pooled support,
    kept integral by cross-multiplying with the group sizes
    (|c_a·n_b − c_b·n_a| per point). Columns: event_type, n_early,
    n_late, w1_scaled (cents × n_early·n_late), w1_millicents
    (W1 in thousandths of a cent, floor).

    Determinism: values are exact cent integers; cumulative counts
    and cross-products are exact HUGEINT/DECIMAL; the final ratio is
    a non-negative floor division.

    Scale: one hash-agg collapses the fact to |types|×|distinct
    cents| points; the ECDF windows run on that collapsed frame (the
    same pre-bucket-then-window shape as q214/q326). The support
    could be histogram-bucketed first if values were continuous at
    100 TB — here cents already bound it.
    """
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    e = events_with_us(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
        F.expr("ts_us DIV 86400000000").alias("day"),
    )
    thr = e.agg(
        F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("mid")
    )
    pts = (
        e.crossJoin(F.broadcast(thr))
        .groupBy("event_type", "c")
        .agg(
            F.sum(F.when(F.col("day") < F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("na"),
            F.sum(F.when(F.col("day") < F.col("mid"), 0).otherwise(1))
            .cast("bigint")
            .alias("nb"),
        )
    )
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("c")
    cum = pts.select(
        "event_type",
        F.sum("na").over(wo).cast("decimal(38,0)").alias("ca"),
        F.sum("nb").over(wo).cast("decimal(38,0)").alias("cb"),
        F.sum("na").over(wp).cast("decimal(38,0)").alias("tot_a"),
        F.sum("nb").over(wp).cast("decimal(38,0)").alias("tot_b"),
        (F.lead("c").over(wo) - F.col("c")).alias("gap"),
    )
    term = F.abs(
        F.col("ca") * F.col("tot_b") - F.col("cb") * F.col("tot_a")
    ) * F.col("gap")
    return (
        cum.filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.max("tot_a").cast("bigint").alias("n_early"),
            F.max("tot_b").cast("bigint").alias("n_late"),
            F.sum(term).cast("decimal(38,0)").alias("w1s"),
            F.max("tot_a").cast("decimal(38,0)").alias("ta"),
            F.max("tot_b").cast("decimal(38,0)").alias("tb"),
        )
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.col("w1s").cast("bigint").alias("w1_scaled"),
            F.expr("CAST(w1s * 1000 DIV (ta * tb) AS BIGINT)").alias(
                "w1_millicents"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q328: Pettitt change-point test
# --------------------------------------------------------------------------


@query(
    "q328_pettitt_test",
    oracle="""
WITH mo AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
    AS mid,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS v
  FROM orders GROUP BY 1
), rk AS (
  SELECT mid,
    2 * RANK() OVER (ORDER BY v)
      + COUNT(*) OVER (PARTITION BY v) - 1 AS r2,
    CAST(COUNT(*) OVER () AS BIGINT) AS n,
    ROW_NUMBER() OVER (ORDER BY mid) AS t
  FROM mo
), u AS (
  SELECT mid, t, n,
    SUM(r2 - (n + 1)) OVER (ORDER BY t) AS u2
  FROM rk
)
SELECT CAST(n AS BIGINT) AS n_months,
  CAST(t AS BIGINT) AS cp_pos,
  mid AS cp_month,
  CAST(ABS(u2) AS BIGINT) AS k_x2
FROM u WHERE t < n
ORDER BY ABS(u2) DESC, t ASC LIMIT 1
""",
)
def q328_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based change-point test on the monthly revenue
    series — the nonparametric partner to q290's AMOC mean-shift
    scan (no normality assumption, robust to outlier months). Uses
    the exact midrank identity Σ_j sgn(x_i−x_j) = 2R_i − (n+1), so
    the Mann-Whitney-type statistic U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i−x_j)
    is the cumulative sum of (2R_i − (n+1)) — all integers (the
    doubled midrank 2R is integral even under ties). Reports the
    split position maximizing |U_t| (K = max|U_t|, doubled as k_x2;
    smallest position on ties). Columns: n_months, cp_pos, cp_month,
    k_x2.

    Determinism: exact integer cent sums; midranks via
    2·RANK + tie-count − 1 (pure integer); unique (|U|, t) tie-break.

    Scale: the fact collapses to one row per month in a single
    hash-agg; ranks/cumsums run on the dimension-sized series frame.
    """
    o = table(spark, sf_dir, "orders")
    mo = (
        o.select(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("mid"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("vc"),
        )
        .groupBy("mid")
        .agg(F.sum("vc").cast("bigint").alias("v"))
    )
    rk = mo.select(
        "mid",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count("*").over(Window.partitionBy("v"))
            - 1
        ).alias("r2"),
        F.count("*")
        .over(Window.partitionBy(F.lit(1)))
        .cast("bigint")
        .alias("n"),
        F.row_number().over(Window.orderBy("mid")).alias("t"),
    )
    u = rk.select(
        "mid",
        "t",
        "n",
        F.sum(F.col("r2") - (F.col("n") + 1))
        .over(Window.orderBy("t"))
        .alias("u2"),
    )
    return (
        u.filter(F.col("t") < F.col("n"))
        .orderBy(F.abs(F.col("u2")).desc(), F.col("t").asc())
        .limit(1)
        .select(
            F.col("n").cast("bigint").alias("n_months"),
            F.col("t").cast("bigint").alias("cp_pos"),
            F.col("mid").alias("cp_month"),
            F.abs(F.col("u2")).cast("bigint").alias("k_x2"),
        )
    )
