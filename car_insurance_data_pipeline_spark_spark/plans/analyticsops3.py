"""Round-6 continuation: growth/product-analytics batch.

- q199 cohort retention matrix (first-activity cohorts × month
  offsets, the standard subscription/engagement retention grid),
- q200 strict ordered funnel over the event stream (signup → view
  → click → purchase with each stage strictly after the previous),
- q201 per-segment OLS revenue trend (closed-form least squares
  from exact integer moment sums).

Same determinism discipline as the rest of the catalog: integer
epoch days/micros for time, cents for money, exact decimal moment
sums cast to double only for the final closed-form expression, ppm
floor-quantization for every ratio, identical aliases in both
dialects."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table
from car_insurance_data_pipeline_spark_spark.plans.relational import events_with_us


@query(
    "q199_cohort_retention",
    oracle="""
WITH cm AS (
  SELECT DISTINCT o_custkey,
    date_diff('month', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      AS mnum
  FROM orders
), off AS (
  SELECT o_custkey, mnum,
    mnum - MIN(mnum) OVER (PARTITION BY o_custkey) AS month_offset,
    MIN(mnum) OVER (PARTITION BY o_custkey) AS cohort_month
  FROM cm
), grid AS (
  SELECT CAST(cohort_month AS INT) AS cohort_month,
    CAST(month_offset AS INT) AS month_offset,
    CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM off GROUP BY 1, 2
)
SELECT cohort_month, month_offset, n_customers,
  CAST(n_customers * 1000000 // MAX(
      CASE WHEN month_offset = 0 THEN n_customers END
    ) OVER (PARTITION BY cohort_month) AS BIGINT) AS retention_ppm
FROM grid
WHERE month_offset <= 24
""",
)
def q199_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers are assigned to the
    calendar month of their FIRST order (the cohort), and each later
    active month becomes an offset cell — the classic
    subscription/engagement retention grid (cohort × months-since ×
    share-still-active). Offsets capped at 24 months. Columns:
    cohort_month (integer months since 1970-01), month_offset,
    n_customers, retention_ppm (vs the cohort's offset-0 size).

    Determinism: month numbers are exact integers ((year-1970)*12 +
    month-1 == DuckDB ``date_diff('month', epoch, d)``), retention is
    an integer ppm floor division against the offset-0 cell pulled
    from a window over the ALREADY-AGGREGATED grid.

    Scale: one exchange on o_custkey serves the (customer, month)
    dedup and both cohort windows (same partitioning, Catalyst
    reuses it); the grid aggregate is partial map-side. The final
    ppm window runs over the tiny aggregated frame — never a join
    back to the per-customer rows. The grid is bounded by
    months² / 2 cells regardless of fact size.
    """
    mnum = (
        (F.year("o_orderdate") - F.lit(1970)) * 12 + F.month("o_orderdate") - 1
    ).cast("bigint")
    cm = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", mnum.alias("mnum"))
        .distinct()
    )
    w = Window.partitionBy("o_custkey")
    off = cm.select(
        (F.col("mnum") - F.min("mnum").over(w)).alias("month_offset"),
        F.min("mnum").over(w).alias("cohort_month"),
    )
    grid = (
        off.groupBy(
            F.col("cohort_month").cast("int").alias("cohort_month"),
            F.col("month_offset").cast("int").alias("month_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .filter(F.col("month_offset") <= 24)
    )
    wg = Window.partitionBy("cohort_month")
    base = F.max(
        F.when(F.col("month_offset") == 0, F.col("n_customers"))
    ).over(wg)
    return grid.select(
        "cohort_month",
        "month_offset",
        "n_customers",
        F.expr(
            "CAST(n_customers * 1000000 DIV "
            "(MAX(CASE WHEN month_offset = 0 THEN n_customers END) "
            "OVER (PARTITION BY cohort_month)) AS BIGINT)"
        ).alias("retention_ppm"),
    )


@query(
    "q200_funnel_stages",
    oracle="""
WITH t1 AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      OVER (PARTITION BY user_id) AS s1
  FROM events
), t2 AS (
  SELECT user_id, event_type, us, s1,
    MIN(CASE WHEN event_type = 'view' AND us > s1 THEN us END)
      OVER (PARTITION BY user_id) AS s2
  FROM t1
), t3 AS (
  SELECT user_id, event_type, us, s1, s2,
    MIN(CASE WHEN event_type = 'click' AND us > s2 THEN us END)
      OVER (PARTITION BY user_id) AS s3
  FROM t2
), t4 AS (
  SELECT user_id, s1, s2, s3,
    MIN(CASE WHEN event_type = 'purchase' AND us > s3 THEN us END)
      OVER (PARTITION BY user_id) AS s4
  FROM t3
), u AS (
  SELECT user_id, MAX(s1) AS s1, MAX(s2) AS s2, MAX(s3) AS s3,
    MAX(s4) AS s4
  FROM t4 GROUP BY user_id
), c AS (
  SELECT CAST(COUNT(s1) AS BIGINT) AS n1,
    CAST(COUNT(s2) AS BIGINT) AS n2,
    CAST(COUNT(s3) AS BIGINT) AS n3,
    CAST(COUNT(s4) AS BIGINT) AS n4
  FROM u
)
SELECT stage, stage_name, n_users,
  CAST(n_users * 1000000 // NULLIF(prev_users, 0) AS BIGINT)
    AS conv_ppm
FROM (
  SELECT 1 AS stage, 'signup' AS stage_name, n1 AS n_users,
    n1 AS prev_users FROM c
  UNION ALL
  SELECT 2, 'view', n2, n1 FROM c
  UNION ALL
  SELECT 3, 'click', n3, n2 FROM c
  UNION ALL
  SELECT 4, 'purchase', n4, n3 FROM c
)
""",
)
def q200_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel over the event stream: signup → view →
    click → purchase, where each stage must occur STRICTLY after the
    user's earliest time of reaching the previous stage (the product
    funnel that e.g. ad-attribution and onboarding dashboards
    compute). Returns one row per stage with the user count and the
    step conversion in ppm.

    Determinism: stage times are integer epoch-micros; each stage is
    the MIN qualifying time, which is well-defined under timestamp
    ties; conversion is integer ppm floor division. "Strictly after"
    compares µs only — an event sharing the exact µs of the prior
    stage does not advance the funnel, identically in both engines.

    Scale: ONE exchange on user_id serves all four chained stage
    windows (same partitioning — Catalyst runs them in one Window
    stage pipeline); per-user state collapses to four timestamps,
    then a four-row aggregate. No joins, no per-stage re-scans of
    the fact; adding stages adds window expressions, not passes.
    """
    ev = events_with_us(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts_us").alias("us")
    )
    w = Window.partitionBy("user_id")
    s1 = F.min(
        F.when(F.col("event_type") == "signup", F.col("us"))
    ).over(w)
    t1 = ev.withColumn("s1", s1)
    s2 = F.min(
        F.when(
            (F.col("event_type") == "view") & (F.col("us") > F.col("s1")),
            F.col("us"),
        )
    ).over(w)
    t2 = t1.withColumn("s2", s2)
    s3 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("us") > F.col("s2")),
            F.col("us"),
        )
    ).over(w)
    t3 = t2.withColumn("s3", s3)
    s4 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("us") > F.col("s3")),
            F.col("us"),
        )
    ).over(w)
    t4 = t3.withColumn("s4", s4)
    u = t4.groupBy("user_id").agg(
        F.max("s1").alias("s1"),
        F.max("s2").alias("s2"),
        F.max("s3").alias("s3"),
        F.max("s4").alias("s4"),
    )
    c = u.agg(
        F.count("s1").cast("bigint").alias("n1"),
        F.count("s2").cast("bigint").alias("n2"),
        F.count("s3").cast("bigint").alias("n3"),
        F.count("s4").cast("bigint").alias("n4"),
    )
    stages = c.selectExpr(
        "stack(4, "
        "1, 'signup',   n1, n1, "
        "2, 'view',     n2, n1, "
        "3, 'click',    n3, n2, "
        "4, 'purchase', n4, n3"
        ") AS (stage, stage_name, n_users, prev_users)"
    )
    return stages.select(
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.expr(
            "CAST(n_users * 1000000 DIV NULLIF(prev_users, 0) AS BIGINT)"
        ).alias("conv_ppm"),
    )


@query(
    "q201_trend_ols",
    oracle="""
WITH pts AS (
  SELECT c.c_mktsegment AS segment,
    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
      AS x,
    CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), m AS (
  SELECT segment,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(x AS DECIMAL(18, 0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(18, 0))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(18, 0)) * CAST(x AS DECIMAL(18, 0)))
      AS DOUBLE) AS sxx,
    CAST(SUM(CAST(x AS DECIMAL(18, 0)) * CAST(y AS DECIMAL(18, 0)))
      AS DOUBLE) AS sxy,
    CAST(SUM(CAST(y AS DECIMAL(18, 0)) * CAST(y AS DECIMAL(18, 0)))
      AS DOUBLE) AS syy
  FROM pts GROUP BY segment
)
SELECT segment, n,
  CAST(FLOOR(
    (CAST(n AS DOUBLE) * sxy - sx * sy)
    / (CAST(n AS DOUBLE) * sxx - sx * sx) * 1000000
  ) AS BIGINT) AS slope_ppm,
  CAST(FLOOR(
    (CAST(n AS DOUBLE) * sxy - sx * sy)
    * (CAST(n AS DOUBLE) * sxy - sx * sy)
    / ((CAST(n AS DOUBLE) * sxx - sx * sx)
       * (CAST(n AS DOUBLE) * syy - sy * sy)) * 1000000
  ) AS BIGINT) AS r2_ppm
FROM m
""",
)
def q201_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS revenue trend: for every market segment, the
    least-squares slope of order value (cents) against order date
    (epoch days) and the fit's R² — closed-form regression from the
    five moment sums (n, Σx, Σy, Σx², Σxy, Σy²), the way a
    distributed engine should fit millions of tiny models: one
    aggregate, no solver, no iterations.

    Determinism: x and y are exact integers; every moment sum
    accumulates in DECIMAL(38,0) (exact, order-independent) and is
    cast to double only once; the closed-form expression then uses
    only IEEE-exact +,-,*,/ on identical doubles, and the result is
    FLOOR-ppm-quantized before the bigint cast. No libm calls
    (pow/exp/log), whose last-ulp behavior differs across engines.

    Scale: AQE broadcasts the smaller customer side at moderate SF
    (observed BroadcastHashJoin) and falls back to one shuffled
    hash join when both sides outgrow the threshold; the moment
    aggregate is partial map-side and its output is |segments| rows.
    Fitting per-key models this way is shuffle-optimal: adding
    moments (cubic fits, more regressors' normal equations) adds
    columns, not passes.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    pts = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.unix_date(F.col("o_orderdate").cast("date")).alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    m = pts.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "segment",
        "n",
        F.floor(cov / varx * 1000000).cast("bigint").alias("slope_ppm"),
        F.floor(cov * cov / (varx * vary) * 1000000)
        .cast("bigint")
        .alias("r2_ppm"),
    )
