"""Round-6 continuation: growth/product-analytics batch.

- q199 cohort retention matrix (first-activity cohorts × month
  offsets, the standard subscription/engagement retention grid),
- q200 strict ordered funnel over the event stream (signup → view
  → click → purchase with each stage strictly after the previous),
- q201 per-segment OLS revenue trend (closed-form least squares
  from exact integer moment sums),
- q202 two-proportion A/B z-test (md5-routed assignment, pooled
  closed-form statistic),
- q203 bitmap-exact distinct (bit_or bucket masks + popcount,
  verified against a plain COUNT DISTINCT oracle),
- q204 seasonal hour-of-day 3σ anomaly counts (exact-moment
  threshold algebra),
- q205 sequential-pattern support (per-user trigram collapse on
  the window's own partitioning),
- q206 temperature-balanced source mixture (√count weights
  integer-quantized before allocation).

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


@query(
    "q202_ab_ztest",
    oracle="""
WITH u AS (
  SELECT user_id,
    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
         THEN 'A' ELSE 'B' END AS variant,
    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         >= 15 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1, 2
), c AS (
  SELECT
    CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(SUM(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, n_b, conv_a, conv_b,
  CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
  CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
  CAST(FLOOR(
    (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
     - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
    / NULLIF(SQRT(
        (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
      ), 0.0) * 1000000
  ) AS BIGINT) AS z_ppm
FROM c
""",
)
def q202_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test over the event stream: users are
    hash-assigned to variants (first md5 hex digit, 50/50), the
    conversion metric is "≥15 purchase events" (mid-range at the
    fixture's event density), and the pooled two-proportion z
    statistic is computed in closed form — the experimentation-
    platform readout every growth team runs. A degenerate pooled
    rate (0% or 100%) yields NULL z via the NULLIF guard rather
    than an engine-specific division-by-zero behavior.

    Determinism: assignment is md5-routed (identical digests both
    engines); counts are exact integers; the z expression uses only
    IEEE-exact ops (+,-,*,/,sqrt — sqrt is correctly rounded per
    IEEE-754, unlike pow/exp/log) on identical doubles, then
    FLOOR-ppm quantization.

    Scale: one exchange on user_id for the per-user conversion
    collapse (partial map-side), then a four-integer global
    aggregate. The statistic is O(1) driver-side arithmetic on the
    aggregate row — the pattern extends to thousands of concurrent
    experiments by adding an experiment_id grouping key, not passes.
    """
    ev = table(spark, sf_dir, "events")
    u = (
        ev.select(
            "user_id",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                <= "7",
                "A",
            )
            .otherwise("B")
            .alias("variant"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_purchase"),
        )
        .groupBy("user_id", "variant")
        .agg(
            F.when(F.sum("is_purchase") >= 15, 1)
            .otherwise(0)
            .alias("conv")
        )
    )
    c = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return c.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("CAST(conv_a * 1000000 DIV n_a AS BIGINT)").alias(
            "rate_a_ppm"
        ),
        F.expr("CAST(conv_b * 1000000 DIV n_b AS BIGINT)").alias(
            "rate_b_ppm"
        ),
        F.floor((pa - pb) / F.nullif(se, F.lit(0.0)) * 1000000)
        .cast("bigint")
        .alias("z_ppm"),
    )


@query(
    "q203_bitmap_distinct",
    oracle="""
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
""",
)
def q203_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via BITMAP aggregation:
    each user maps to (bucket = id DIV 60, bit = id MOD 60), masks
    within a bucket combine with bit_or, and popcounts sum — the
    roaring-bitmap-style distinct that warehouses use when
    COUNT(DISTINCT) over billions of members must stay exact but
    cheap and re-aggregable (bitmaps union across time slices;
    count-distincts don't).

    The DuckDB oracle is a plain COUNT(DISTINCT user_id) — a
    DIFFERENT algorithm, so parity proves the bitmap identity, not
    a mirrored implementation.

    Determinism: pure integer arithmetic end to end (bit 59 max
    keeps every mask positive in the signed bigint range both
    engines share).

    Scale: the shuffle key is (event_type, bucket) — 60 users
    collapse per row BEFORE the exchange via partial bit_or, and
    re-aggregation is associative, so the same bitmaps serve
    rollups across types/time without touching the fact again.
    COUNT(DISTINCT) by contrast expands to a two-exchange
    distinct+count every time it's asked.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    masks = ev.groupBy(
        "event_type",
        (F.col("user_id") / 60).cast("bigint").alias("bucket"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), "
            "CAST(user_id % 60 AS INT)))"
        ).alias("mask"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    return (
        masks.groupBy("event_type")
        .agg(
            F.sum(F.bit_count("mask")).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )


@query(
    "q204_seasonal_anomaly",
    oracle="""
WITH e AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
    CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT hr, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(c AS DECIMAL(18, 0))) AS DOUBLE) AS sd,
    CAST(SUM(CAST(c AS DECIMAL(18, 0)) * CAST(c AS DECIMAL(18, 0)))
      AS DOUBLE) AS ssd,
    CAST(SUM(CAST(c AS DECIMAL(18, 0))) AS BIGINT) AS si
  FROM e GROUP BY hr
)
SELECT s.hr, s.n,
  CAST(s.si // s.n AS BIGINT) AS mean_cents,
  CAST(SUM(CASE WHEN
      (CAST(e.c AS DOUBLE) * CAST(s.n AS DOUBLE) - s.sd)
      * (CAST(e.c AS DOUBLE) * CAST(s.n AS DOUBLE) - s.sd)
      > 9.0 * (CAST(s.n AS DOUBLE) * s.ssd - s.sd * s.sd)
    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM e JOIN s ON e.hr = s.hr
GROUP BY s.hr, s.n, s.si
""",
)
def q204_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly counting: build an hour-of-day
    baseline (mean/variance of event value) and count events more
    than 3σ from their hour's mean — the time-of-day-aware outlier
    monitor that naive global z-scores get wrong (a 3am spike is
    normal at 3pm).

    Determinism: the 3σ test is evaluated as (c·n − Σ)² > 9(nΣ² −
    Σ²) with Σ/Σ² accumulated exactly in DECIMAL(18,0) and the
    comparison computed on identical doubles in both engines —
    boundary events land on the same side everywhere because every
    operand is bit-identical. Mean is an integer floor division.

    Scale: the baseline is a 24-row aggregate (partial map-side);
    the re-join of facts to their hour's stats broadcasts those 24
    rows — no second fact shuffle; the anomaly count then partial-
    aggregates again. Two scans of the fact (one to build the
    baseline, one to score) is the floor for this pattern without
    approximation.
    """
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.hour("ts").cast("int").alias("hr"),
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
    )
    cd = F.col("c").cast("decimal(18,0)")
    s = e.groupBy("hr").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(cd).cast("double").alias("sd"),
        F.sum(cd * cd).cast("double").alias("ssd"),
        F.sum(cd).cast("bigint").alias("si"),
    )
    dev = F.col("c").cast("double") * F.col("n").cast("double") - F.col("sd")
    thr = 9.0 * (
        F.col("n").cast("double") * F.col("ssd") - F.col("sd") * F.col("sd")
    )
    return (
        e.join(F.broadcast(s), "hr")
        .groupBy("hr", "n", "si")
        .agg(
            F.sum(F.when(dev * dev > thr, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies")
        )
        .select(
            "hr",
            "n",
            F.expr("CAST(si DIV n AS BIGINT)").alias("mean_cents"),
            "n_anomalies",
        )
    )


@query(
    "q205_sequence_support",
    oracle="""
WITH s AS (
  SELECT user_id, event_type AS s1,
    LEAD(event_type, 1) OVER w AS s2,
    LEAD(event_type, 2) OVER w AS s3
  FROM events
  WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), pu AS (
  SELECT user_id, s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS c
  FROM s WHERE s3 IS NOT NULL
  GROUP BY 1, 2, 3, 4
)
SELECT s1, s2, s3,
  CAST(SUM(c) AS BIGINT) AS n_occurrences,
  CAST(COUNT(*) AS BIGINT) AS support_users
FROM pu GROUP BY 1, 2, 3
HAVING SUM(c) >= 5
""",
)
def q205_sequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support: every length-3 event-type
    sequence (consecutive, per user, time-ordered) with its total
    occurrence count and its USER support (how many distinct users
    exhibit it) — the GSP/PrefixSpan-style statistic behind
    "users who view→click→purchase" journey mining; support ≥5
    occurrences.

    Determinism: sequence order is epoch-µs with the unique
    event_id tie-break; both outputs are exact integer counts.

    Scale: ONE scan and one exchange on user_id build the lead
    windows; the per-(user, trigram) collapse then needs NO
    exchange (its grouping keys contain the window's partitioning
    key, so Catalyst reuses the distribution), and only the final
    |types|³-key rollup shuffles — an aggregate frame bounded by
    users × patterns, never joined back to the fact. Longer
    patterns extend the LEAD chain inside the same window exchange.
    """
    ev = (
        events_with_us(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts_us", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = ev.select(
        "user_id",
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    pu = s.groupBy("user_id", "s1", "s2", "s3").agg(
        F.count("*").cast("bigint").alias("c")
    )
    return (
        pu.groupBy("s1", "s2", "s3")
        .agg(
            F.sum("c").cast("bigint").alias("n_occurrences"),
            F.count("*").cast("bigint").alias("support_users"),
        )
        .filter(F.col("n_occurrences") >= 5)
    )


@query(
    "q206_temperature_mixture",
    oracle="""
WITH stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT)
      AS weight_milli
  FROM documents GROUP BY source
), alloc AS (
  SELECT source, n_docs, weight_milli,
    CAST(1000 * weight_milli // SUM(weight_milli) OVER () AS BIGINT)
      AS target_docs
  FROM stats
), ranked AS (
  SELECT d.source,
    ROW_NUMBER() OVER (
      PARTITION BY d.source
      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
    ) AS rk,
    d.n_chars
  FROM documents d
)
SELECT a.source, a.n_docs, a.weight_milli, a.target_docs,
  CAST(COUNT(r.rk) AS BIGINT) AS n_selected,
  CAST(COALESCE(SUM(r.n_chars), 0) AS BIGINT) AS selected_chars
FROM alloc a
LEFT JOIN ranked r ON r.source = a.source AND r.rk <= a.target_docs
GROUP BY a.source, a.n_docs, a.weight_milli, a.target_docs
""",
)
def q206_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced source mixture (the α=0.5 sampling of
    multilingual/multi-source LLM corpora — upweight small sources,
    damp giant ones): per-source weights ∝ √count, a 1000-document
    budget allocated by integer proportion, and the selected docs
    picked as each source's lowest-md5 ranks (a deterministic
    uniform draw).

    Determinism: √count is quantized to milli-units per source
    BEFORE summing (integer sum — no order-dependent double
    accumulation; sqrt itself is IEEE-correctly-rounded), the
    allocation is integer floor division, and the per-source pick
    is rank-over-md5 with the doc_id tie-break.

    Scale: stats is |sources| rows; the allocation window runs over
    that aggregated frame; ranking shuffles documents once on
    source (the window's own exchange) and the target join
    broadcasts the |sources|-row allocation. Budget changes touch
    only the broadcast side. Per-source rank windows do serialize a
    giant source through one task — at real corpus scale swap the
    rank pick for the md5-threshold filter (q127's machinery) at
    the cost of ±1 doc rounding.
    """
    d = table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.floor(F.sqrt(F.count("*").cast("double")) * 1000)
        .cast("bigint")
        .alias("weight_milli"),
    )
    wall = Window.partitionBy()
    alloc = stats.select(
        "source",
        "n_docs",
        "weight_milli",
        F.expr(
            "CAST(1000 * weight_milli DIV "
            "(SUM(weight_milli) OVER ()) AS BIGINT)"
        ).alias("target_docs"),
    )
    wr = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "source",
        F.row_number().over(wr).alias("rk"),
        "n_chars",
    )
    joined = alloc.join(
        ranked,
        (ranked["source"] == alloc["source"])
        & (ranked["rk"] <= F.col("target_docs")),
        "left",
    ).drop(ranked["source"])
    return joined.groupBy(
        "source", "n_docs", "weight_milli", "target_docs"
    ).agg(
        F.count("rk").cast("bigint").alias("n_selected"),
        F.coalesce(F.sum("n_chars"), F.lit(0))
        .cast("bigint")
        .alias("selected_chars"),
    )


@query(
    "q207_cube_revenue",
    oracle="""
SELECT
  COALESCE(l_returnflag, '<all>') AS rflag,
  COALESCE(l_linestatus, '<all>') AS lstatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
    AS gid,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q207_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup surface: revenue and counts for every combination
    of (returnflag, linestatus) INCLUDING the three marginal levels
    and the grand total, tagged with the grouping id — the OLAP
    subtotal lattice (complements q121's explicit GROUPING SETS
    with the full-cube shorthand a BI layer emits).

    Determinism: dimension NULLs from the rollup levels are
    disambiguated via GROUPING() (never by testing the column for
    NULL — a NULL data value and a rollup subtotal are different
    things) and coalesced to a sentinel; money is exact cents.

    Scale: Spark compiles CUBE to ONE scan + Expand (4 rows per
    input) + a single hash aggregate — partial aggregation applies
    to every lattice level, so the exchange carries |groups|·4
    partials, not the fact. The expansion factor is 2^dims: fine at
    2-3 dims, and the reason high-dim cubes should enumerate
    GROUPING SETS explicitly instead.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.expr(
                "CAST(grouping(l_returnflag) * 2 "
                "+ grouping(l_linestatus) AS INT)"
            ).alias("gid"),
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("lstatus"),
            "gid",
            "n_items",
            "revenue_cents",
        )
    )


@query(
    "q208_corr_matrix",
    oracle="""
WITH v AS (
  SELECT l_returnflag AS rflag,
    CAST(l_quantity AS BIGINT) AS q,
    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
    CAST(ROUND(l_discount * 10000) AS BIGINT) AS d
  FROM lineitem
), m AS (
  SELECT rflag, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(q AS DECIMAL(18, 0))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(p AS DECIMAL(18, 0))) AS DOUBLE) AS sp,
    CAST(SUM(CAST(d AS DECIMAL(18, 0))) AS DOUBLE) AS sd,
    CAST(SUM(CAST(q AS DECIMAL(18, 0)) * CAST(q AS DECIMAL(18, 0)))
      AS DOUBLE) AS sqq,
    CAST(SUM(CAST(p AS DECIMAL(18, 0)) * CAST(p AS DECIMAL(18, 0)))
      AS DOUBLE) AS spp,
    CAST(SUM(CAST(d AS DECIMAL(18, 0)) * CAST(d AS DECIMAL(18, 0)))
      AS DOUBLE) AS sdd,
    CAST(SUM(CAST(q AS DECIMAL(18, 0)) * CAST(p AS DECIMAL(18, 0)))
      AS DOUBLE) AS sqp,
    CAST(SUM(CAST(q AS DECIMAL(18, 0)) * CAST(d AS DECIMAL(18, 0)))
      AS DOUBLE) AS sqd,
    CAST(SUM(CAST(p AS DECIMAL(18, 0)) * CAST(d AS DECIMAL(18, 0)))
      AS DOUBLE) AS spd
  FROM v GROUP BY rflag
)
SELECT rflag, pair, CAST(FLOOR(
    (CAST(n AS DOUBLE) * sxy - sx * sy)
    / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
         * (CAST(n AS DOUBLE) * syy - sy * sy)) * 1000000
  ) AS BIGINT) AS corr_ppm
FROM (
  SELECT rflag, n, 'qty_price' AS pair, sq AS sx, sp AS sy,
    sqq AS sxx, spp AS syy, sqp AS sxy FROM m
  UNION ALL
  SELECT rflag, n, 'qty_disc', sq, sd, sqq, sdd, sqd FROM m
  UNION ALL
  SELECT rflag, n, 'price_disc', sp, sd, spp, sdd, spd FROM m
)
""",
)
def q208_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix per group: for every
    return-flag cohort, the correlation of (quantity, price),
    (quantity, discount), (price, discount) — the feature-drift /
    multicollinearity screen run before model training, computed
    the moment-sum way: one aggregate pass yields every pairwise
    correlation, however many metrics there are.

    Determinism: metrics quantize to integers (units, cents,
    basis points); all nine moment sums accumulate exactly in
    DECIMAL(18,0); each correlation is one fixed IEEE expression
    (+,-,*,/,sqrt) over identical doubles, FLOOR-ppm quantized.
    The matrix is unpivoted from the single aggregate row — there
    is NO order-dependent cross-row summation anywhere.

    Scale: one scan, one partial-aggregated exchange of
    |groups| × 10 moment columns; k metrics need k(k+1)/2 moment
    columns but still exactly one pass — versus k² separate
    corr() aggregates each rescanning the fact.
    """
    v = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rflag"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("d"),
    )
    qd = F.col("q").cast("decimal(18,0)")
    pd_ = F.col("p").cast("decimal(18,0)")
    dd = F.col("d").cast("decimal(18,0)")
    m = v.groupBy("rflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(qd).cast("double").alias("sq"),
        F.sum(pd_).cast("double").alias("sp"),
        F.sum(dd).cast("double").alias("sd"),
        F.sum(qd * qd).cast("double").alias("sqq"),
        F.sum(pd_ * pd_).cast("double").alias("spp"),
        F.sum(dd * dd).cast("double").alias("sdd"),
        F.sum(qd * pd_).cast("double").alias("sqp"),
        F.sum(qd * dd).cast("double").alias("sqd"),
        F.sum(pd_ * dd).cast("double").alias("spd"),
    )
    pairs = m.selectExpr(
        "rflag",
        "n",
        "stack(3, "
        "'qty_price',  sq, sp, sqq, spp, sqp, "
        "'qty_disc',   sq, sd, sqq, sdd, sqd, "
        "'price_disc', sp, sd, spp, sdd, spd"
        ") AS (pair, sx, sy, sxx, syy, sxy)",
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return pairs.select(
        "rflag",
        "pair",
        F.floor(num / den * 1000000).cast("bigint").alias("corr_ppm"),
    )


@query(
    "q209_chi_square",
    oracle="""
WITH u AS (
  SELECT user_id,
    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
         THEN 'A' ELSE 'B' END AS variant,
    event_type
  FROM events WHERE user_id IS NOT NULL
), o AS (
  SELECT variant, event_type, CAST(COUNT(*) AS BIGINT) AS obs
  FROM u GROUP BY 1, 2
), t AS (
  SELECT variant, event_type, obs,
    SUM(obs) OVER (PARTITION BY variant) AS rt,
    SUM(obs) OVER (PARTITION BY event_type) AS ct,
    SUM(obs) OVER () AS g
  FROM o
), cell AS (
  SELECT variant, event_type, obs,
    CAST(FLOOR(
      (CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
         / CAST(g AS DOUBLE))
      * (CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
         / CAST(g AS DOUBLE))
      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(g AS DOUBLE))
      * 1000000
    ) AS BIGINT) AS contrib_micro
  FROM t
)
SELECT variant, event_type, obs, contrib_micro,
  CAST(SUM(contrib_micro) OVER () AS BIGINT) AS chi2_micro_total
FROM cell
""",
)
def q209_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of the variant × event-type
    contingency table (does hash-assignment correlate with behavior
    — the experiment sample-ratio-mismatch / independence check
    that pairs with q202's z-test). Emits every cell with its
    observed count and chi² contribution, plus the table-wide
    statistic.

    Determinism: observed/row/column/grand totals are exact
    integers; each cell's (O−E)²/E is one fixed IEEE expression
    FLOOR-quantized to micro-units PER CELL, and the total is an
    INTEGER sum of those — never an order-dependent double
    accumulation across cells.

    Scale: one exchange for the contingency aggregate (partial
    map-side — the grid is |variants|×|types| regardless of fact
    size); the marginal totals are windows over that tiny
    aggregated frame, and the final integer total a window over
    the same. The fact is read once.
    """
    u = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                <= "7",
                "A",
            )
            .otherwise("B")
            .alias("variant"),
            "event_type",
        )
    )
    o = u.groupBy("variant", "event_type").agg(
        F.count("*").cast("bigint").alias("obs")
    )
    wv = Window.partitionBy("variant")
    wc = Window.partitionBy("event_type")
    wall = Window.partitionBy()
    t = o.select(
        "variant",
        "event_type",
        "obs",
        F.sum("obs").over(wv).alias("rt"),
        F.sum("obs").over(wc).alias("ct"),
        F.sum("obs").over(wall).alias("g"),
    )
    od = F.col("obs").cast("double")
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("g").cast("double")
    )
    cell = t.select(
        "variant",
        "event_type",
        "obs",
        F.floor((od - e) * (od - e) / e * 1000000)
        .cast("bigint")
        .alias("contrib_micro"),
    )
    return cell.select(
        "variant",
        "event_type",
        "obs",
        "contrib_micro",
        F.sum("contrib_micro").over(wall).cast("bigint").alias(
            "chi2_micro_total"
        ),
    )


def _interleave_expr(lon_col: str, lat_col: str, bits: int, div: str) -> str:
    """Morton/geohash bit-interleave as pure integer arithmetic —
    the SAME generated expression serves Spark SQL (div='DIV') and
    DuckDB (div='//'), so the two engines can't drift: cell =
    Σ_i bit_i(lon)·2^(2i+1) + bit_i(lat)·2^(2i)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(({lon_col} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(({lat_col} {div} {1 << i}) % 2) * {1 << (2 * i)}"
        )
    return " + ".join(terms)


_GEO_BITS = 6  # 6 bits/axis → 4096 cells (precision is a parameter)

_GEO_PRE = """
  SELECT c_custkey,
    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
    ((c_custkey * 2654435761) % 180000000 - 90000000) AS lat_mdeg,
    ((c_custkey * 40503) % 360000000 - 180000000) AS lon_mdeg
  FROM customer
"""

_GEO_QUANT = f"""
  SELECT bal_cents,
    (lat_mdeg + 90000000) * {1 << _GEO_BITS} {{div}} 180000001 AS lat_q,
    (lon_mdeg + 180000000) * {1 << _GEO_BITS} {{div}} 360000001 AS lon_q
  FROM pts
"""


@query(
    "q210_geohash_cells",
    oracle=f"""
WITH pts AS ({_GEO_PRE}),
q AS ({_GEO_QUANT.format(div='//')}),
cells AS (
  SELECT CAST({_interleave_expr('lon_q', 'lat_q', _GEO_BITS, '//')}
    AS BIGINT) AS cell, bal_cents
  FROM q
)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(bal_cents) AS BIGINT) AS balance_cents
FROM cells GROUP BY cell HAVING COUNT(*) >= 2
""",
)
def q210_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash/Morton spatial cell aggregation: synthetic
    closed-form coordinates (milli-degrees derived from the
    customer key, so both engines build identical points) are
    quantized to a 6-bit-per-axis grid and BIT-INTERLEAVED into a
    Z-order cell id — the spatial bucketing that makes geo
    aggregation, neighbor search, and range pruning work as plain
    integer group-bys/range scans at any scale. Returns cells
    holding ≥2 customers with counts and balance totals.

    Determinism: the interleave is generated integer arithmetic
    (``_interleave_expr`` emits the SAME expression text for both
    dialects — only the floor-division token differs); quantization
    divides by range+1 so the max coordinate stays in the top cell.

    Scale: zero joins — encode is per-row compute fused into the
    scan (whole-stage codegen), the aggregate partial-combines on
    the bounded cell keyspace. Z-order's property (prefix truncation
    = coarser cell) means ONE encoded column serves every zoom
    level via cell DIV 4^k rollups without touching the fact again.
    """
    div_expr = _interleave_expr("lon_q", "lat_q", _GEO_BITS, "DIV")
    pts = table(spark, sf_dir, "customer").selectExpr(
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents",
        "((c_custkey * 2654435761) % 180000000 - 90000000) AS lat_mdeg",
        "((c_custkey * 40503) % 360000000 - 180000000) AS lon_mdeg",
    )
    q = pts.selectExpr(
        "bal_cents",
        f"(lat_mdeg + 90000000) * {1 << _GEO_BITS} DIV 180000001 AS lat_q",
        f"(lon_mdeg + 180000000) * {1 << _GEO_BITS} DIV 360000001 AS lon_q",
    )
    cells = q.selectExpr(
        f"CAST({div_expr} AS BIGINT) AS cell", "bal_cents"
    )
    return (
        cells.groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("bal_cents").cast("bigint").alias("balance_cents"),
        )
        .filter(F.col("n_customers") >= 2)
    )
