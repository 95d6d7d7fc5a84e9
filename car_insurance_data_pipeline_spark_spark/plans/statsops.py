"""Nonparametric / fixed-point statistics batch.

- q218 Mann-Whitney U (Wilcoxon rank-sum) with tie correction —
  the distribution-free complement to q202's two-proportion z-test:
  compares the event-value distributions of md5-routed A/B cohorts
  without assuming normality,
- q219 Kolmogorov-Smirnov two-sample statistic — max CDF gap
  between the same two cohorts, with the gap location,
- q220 fixed-point gradient-descent linear regression — three
  unrolled distributed GD steps where every gradient is an exact
  integer sum (micro-unit weights), so the iterative-ML training
  loop is bit-deterministic across engines and partitionings.

Scale design shared by q218/q219: the fact collapses in ONE
parallel hash-agg exchange to the distinct-value histogram
(per-variant counts), and ranks/CDFs come from a window over that
aggregated frame — the single-partition sort is bounded by
|distinct quantized values| (value range × 10³), never the corpus.
This is the standard scalable rank transform: rank arithmetic on
(value, count) histograms instead of per-row row_numbers.

Determinism: rank sums and tie terms are exact integers
(doubled-rank trick keeps half-ranks integral), accumulated in
DECIMAL(38,0); the only float work is one fixed IEEE closed form
(+,-,*,/,sqrt are all correctly rounded) followed by FLOOR-ppm
quantization; integer DIV is used only on non-negative operands
(Spark DIV truncates toward zero, DuckDB // floors — they agree
only at ≥0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table

_VARIANT = (
    "CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'"
    " THEN 'A' ELSE 'B' END"
)


def _variant_col():
    return (
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7", "A"
        )
        .otherwise("B")
        .alias("variant")
    )


def _value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-value histogram of milli-quantized event values with
    per-variant counts — the shared scalable substrate for rank
    statistics (one fact exchange on v; |rows| = |distinct values|).
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = ev.select(
        _variant_col(),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    return vals.groupBy("v").agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_b"),
        F.count("*").cast("bigint").alias("cnt"),
    )


_HIST_SQL = f"""
  SELECT CAST(ROUND(value * 1000) AS BIGINT) AS v,
    CAST(SUM(CASE WHEN {_VARIANT} = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      AS cnt_a,
    CAST(SUM(CASE WHEN {_VARIANT} = 'B' THEN 1 ELSE 0 END) AS BIGINT)
      AS cnt_b,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1
"""


@query(
    "q218_mann_whitney_u",
    oracle=f"""
WITH g AS ({_HIST_SQL}
), r AS (
  SELECT cnt_a, cnt_b, cnt,
    COALESCE(SUM(cnt) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM g
), m AS (
  SELECT
    CAST(SUM(cnt_a) AS BIGINT) AS n_a,
    CAST(SUM(cnt_b) AS BIGINT) AS n_b,
    SUM(CAST(cnt_a * (2 * cum + cnt + 1) AS DECIMAL(38, 0))) AS two_r_a,
    SUM(CAST(cnt * cnt * cnt - cnt AS DECIMAL(38, 0))) AS ties
  FROM r
)
SELECT n_a, n_b,
  CAST(two_r_a - CAST(n_a AS DECIMAL(38, 0)) * (n_a + 1) AS BIGINT)
    AS u2_a,
  CASE WHEN n_a > 0 AND n_b > 0 AND
    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
    * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
       - CAST(ties AS DOUBLE)
         / (CAST(n_a + n_b AS DOUBLE)
            * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0.0
  THEN CAST(FLOOR(
    (CAST(two_r_a - CAST(n_a AS DECIMAL(38, 0)) * (n_a + 1) AS DOUBLE)
     - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
    / (2.0 * SQRT(
        (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
        * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
           - CAST(ties AS DOUBLE)
             / (CAST(n_a + n_b AS DOUBLE)
                * (CAST(n_a + n_b AS DOUBLE) - 1.0)))
      )) * 1000000
  ) AS BIGINT) ELSE NULL END AS z_ppm
FROM m
""",
)
def q218_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the A/B
    cohorts' event-value distributions, with the normal
    approximation's tie-corrected z. Ranks are never assigned
    per row: the doubled average rank of a tied group is the exact
    integer 2·cum_before + cnt + 1, so the doubled rank sum 2R_A is
    an integer accumulated from the value histogram, and
    2U_A = 2R_A − n_a(n_a+1). Columns: n_a, n_b, u2_a, z_ppm.

    Determinism: all rank arithmetic is exact integer/DECIMAL; the
    z closed form uses only IEEE-exact ops on identical doubles,
    FLOOR-ppm quantized; a zero tie-corrected variance (all values
    identical) yields NULL z in both engines.

    Scale: one exchange on v collapses the fact to the distinct-
    value histogram (map-side partial agg); the cumulative window
    sorts only that bounded frame (quantized value range), the
    documented single-reducer-on-aggregate trade. Tie terms stay
    in int64 (cnt³ ≤ 8·10¹⁸ needs cnt < 2·10⁶ per distinct value —
    beyond that, pre-cast the cube to DECIMAL) and accumulate in
    DECIMAL(38,0).
    """
    g = _value_histogram(spark, sf_dir)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "cnt_a",
        "cnt_b",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum"),
    )
    m = r.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
        F.sum(
            (F.col("cnt_a") * (2 * F.col("cum") + F.col("cnt") + 1)).cast(
                "decimal(38,0)"
            )
        ).alias("two_r_a"),
        F.sum(
            (F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).cast(
                "decimal(38,0)"
            )
        ).alias("ties"),
    )
    u2 = (
        F.col("two_r_a")
        - F.col("n_a").cast("decimal(38,0)") * (F.col("n_a") + 1)
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nd = (F.col("n_a") + F.col("n_b")).cast("double")
    sig2 = (nad * nbd / F.lit(12.0)) * (
        (nd + F.lit(1.0)) - F.col("ties").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    z = (u2.cast("double") - nad * nbd) / (F.lit(2.0) * F.sqrt(sig2))
    return m.select(
        "n_a",
        "n_b",
        u2.cast("bigint").alias("u2_a"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (sig2 > 0.0),
            F.floor(z * 1000000).cast("bigint"),
        ).alias("z_ppm"),
    )


@query(
    "q219_ks_two_sample",
    oracle=f"""
WITH g AS ({_HIST_SQL}
), c AS (
  SELECT v,
    SUM(cnt_a) OVER w AS ca,
    SUM(cnt_b) OVER w AS cb
  FROM g
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), d0 AS (
  SELECT v, ca, cb,
    ABS(ca * MAX(cb) OVER () - cb * MAX(ca) OVER ()) AS d_num,
    MAX(ca) OVER () AS n_a, MAX(cb) OVER () AS n_b
  FROM c
), d AS (
  SELECT v, n_a, n_b, d_num, MAX(d_num) OVER () AS d_max FROM d0
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
  CAST(MAX(n_b) AS BIGINT) AS n_b,
  CAST(MAX(d_num) * 1000000 // (MAX(n_a) * MAX(n_b)) AS BIGINT)
    AS d_ppm,
  CAST(MIN(v) AS BIGINT) AS ks_at_milli,
  CAST(FLOOR(
    CAST(MAX(d_num) AS DOUBLE)
    / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE))
    * SQRT(CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)
           / (CAST(MAX(n_a) AS DOUBLE) + CAST(MAX(n_b) AS DOUBLE)))
    * 1000000
  ) AS BIGINT) AS ks_scaled_ppm
FROM d WHERE d_num = d_max
""",
)
def q219_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the A/B
    cohorts: the maximum empirical-CDF gap D, its location (smallest
    value achieving it), and the scaled statistic D·√(n_a·n_b/N).
    The gap is kept exact as the integer cross-multiply
    |ca·n_b − cb·n_a| until the final ppm quantization. Columns:
    n_a, n_b, d_ppm, ks_at_milli, ks_scaled_ppm.

    Determinism: cumulative counts are exact integers; the argmax
    tie-breaks to the smallest value; d_ppm uses integer DIV on
    non-negative operands; the scaled form is one IEEE closed form,
    FLOOR-ppm quantized.

    Scale: identical substrate to q218 — one fact exchange to the
    value histogram, then cumulative/total windows over the bounded
    aggregated frame in a single sort (totals are MAX of the
    inclusive cumulative, so no second pass and no branch that
    would re-scan the fact).
    """
    g = _value_histogram(spark, sf_dir)
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "v",
        F.sum("cnt_a").over(wcum).alias("ca"),
        F.sum("cnt_b").over(wcum).alias("cb"),
    )
    d = c.select(
        "v",
        (F.abs(
            F.col("ca") * F.max("cb").over(wall)
            - F.col("cb") * F.max("ca").over(wall)
        )).alias("d_num"),
        F.max("ca").over(wall).alias("n_a"),
        F.max("cb").over(wall).alias("n_b"),
    ).withColumn("d_max", F.max("d_num").over(wall))
    nad = F.max("n_a").cast("double")
    nbd = F.max("n_b").cast("double")
    return (
        d.filter(F.col("d_num") == F.col("d_max"))
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "CAST(MAX(d_num) * 1000000 DIV (MAX(n_a) * MAX(n_b))"
                " AS BIGINT)"
            ).alias("d_ppm"),
            F.min("v").cast("bigint").alias("ks_at_milli"),
            F.floor(
                F.max("d_num").cast("double")
                / (nad * nbd)
                * F.sqrt(nad * nbd / (nad + nbd))
                * 1000000
            )
            .cast("bigint")
            .alias("ks_scaled_ppm"),
        )
    )


def _gd_step(li: DataFrame, prev: DataFrame) -> DataFrame:
    """One distributed GD pass: broadcast the 1-row (w_micro,
    b_micro) state onto the fact, accumulate the exact integer
    gradients in DECIMAL(38,0), and emit the next 1-row state."""
    r_u = (
        F.col("w_micro") * F.col("x")
        + F.col("b_micro")
        - F.lit(1000000) * F.col("y")
    )
    stepped = (
        li.crossJoin(F.broadcast(prev))
        .select(
            "w_micro",
            "b_micro",
            r_u.alias("r_u"),
            "x",
        )
        .agg(
            F.max("w_micro").alias("w_prev"),
            F.max("b_micro").alias("b_prev"),
            F.sum((F.col("r_u") * F.col("x")).cast("decimal(38,0)")).alias("gw"),
            F.sum(F.col("r_u").cast("decimal(38,0)")).alias("gb"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    nd = F.col("n").cast("double")
    return stepped.select(
        (
            F.col("w_prev")
            - F.floor(F.col("gw").cast("double") / nd / F.lit(1024.0))
        ).alias("w_micro"),
        (
            F.col("b_prev")
            - F.floor(F.col("gb").cast("double") / nd / F.lit(1024.0))
        ).alias("b_micro"),
        "n",
    )


_GD_STEP_SQL = """
  SELECT
    CAST(w_micro - FLOOR(CAST(SUM(CAST(
        (w_micro * x + b_micro - 1000000 * y) * x AS DECIMAL(38, 0)))
      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1024.0) AS BIGINT)
      AS w_micro,
    CAST(b_micro - FLOOR(CAST(SUM(CAST(
        w_micro * x + b_micro - 1000000 * y AS DECIMAL(38, 0)))
      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1024.0) AS BIGINT)
      AS b_micro,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM xy, {prev}
  GROUP BY w_micro, b_micro
"""


@query(
    "q220_gd_linear_regression",
    oracle="""
WITH xy AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), it0 AS (
  SELECT CAST(0 AS BIGINT) AS w_micro, CAST(0 AS BIGINT) AS b_micro
), it1 AS (%s), it2 AS (%s), it3 AS (%s)
SELECT n, w_micro, b_micro FROM it3
"""
    % (
        _GD_STEP_SQL.format(prev="it0"),
        _GD_STEP_SQL.format(prev="it1"),
        _GD_STEP_SQL.format(prev="it2"),
    ),
)
def q220_gd_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point distributed gradient descent: three unrolled GD
    passes fitting price_cents ≈ w·quantity + b, with weights held
    in integer micro-units. Each pass broadcasts the 1-row (w, b)
    state onto the fact, the per-row scaled residual
    r = w_µ·x + b_µ − 10⁶·y stays in int64, gradients accumulate
    EXACTLY in DECIMAL(38,0), and the update quantizes once through
    a fixed IEEE closed form (η = 1/1024, an exact binary double).
    This is the iterative-ML training shape (same loop skeleton as
    q136's k-means) made bit-deterministic: no float accumulation
    ever crosses a partition boundary, so the result is independent
    of partitioning and reduce order. Columns: n, w_micro, b_micro.

    Determinism: gradients are exact integer sums in DECIMAL; the
    only float work is decimal→double (correctly rounded, exact
    integers well inside 2^1024) then two IEEE divisions and FLOOR —
    identical expression trees in both engines; the learning rate is
    a negative power of two, exactly representable.

    Scale: each iteration is one map-side-combined global aggregate
    (a broadcast of the 1-row state, zero shuffle of the fact beyond
    the partial-agg tree). Three passes = three fact scans — the
    inherent cost of synchronous GD, the same trade q136 documents;
    at 100 TB you cache the (x, y) projection once and the passes
    reuse it. int64 bounds: |r| ≤ w_µ·x_max + 10⁶·y_max ≈ 10¹³·50 —
    per-row products stay under 2^63; the DECIMAL sums carry the
    corpus factor.
    """
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    state = spark.range(1).select(
        F.lit(0).cast("bigint").alias("w_micro"),
        F.lit(0).cast("bigint").alias("b_micro"),
    )
    for _ in range(3):
        state = _gd_step(li, state)
    return state.select("n", "w_micro", "b_micro")
