"""TPC-H decision-support shapes beyond the earlier Q1/Q3/Q5/Q17
ports, plus series autocorrelation.

- q211 large-volume orders (TPC-H Q18's HAVING-on-aggregate
  semi-join shape: orders whose total quantity exceeds a threshold,
  joined back to customer),
- q212 sole-late-supplier (TPC-H Q21's EXISTS / NOT EXISTS shape,
  decorrelated into per-order counts — the reference fixture has no
  receipt/commit dates, so "late" is shipdate > orderdate + 100
  days; the SHAPE — multi-supplier order, exactly one late supplier
  — is Q21's),
- q213 idle rich customers (TPC-H Q22's scalar-average filter +
  anti-join shape: above-average balance, no recent orders),
- q214 hourly-series autocorrelation at lags 1/2/3/24 (the
  seasonality diagnostic behind q204's hour-of-day model, computed
  the moment-sum way over the hourly-total series).

Determinism discipline: thresholds are integer cross-multiplies
(never float averages), money is cents, series values are exact
integer milli-sums, moment sums accumulate in DECIMAL before one
fixed IEEE closed form, FLOOR-ppm quantization, identical aliases
in both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table
from car_insurance_data_pipeline_spark_spark.plans.relational import events_with_us


@query(
    "q211_large_volume_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
    AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
)
SELECT c.c_name AS cust_name,
  o.o_orderkey AS orderkey,
  strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
  CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_price_cents,
  b.sum_qty
FROM orders o
JOIN big b ON b.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q211_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18's large-volume-customer shape: orders whose summed
    line quantity exceeds 250 units, with the owning customer — the
    classic HAVING-filtered aggregate used as a semi-join key set
    back into the fact it came from.
    Columns: cust_name, orderkey, order_date, total_price_cents,
    sum_qty.

    Determinism: quantities are integral in the fixtures (exact
    BIGINT sums), money is cents, dates are ISO strings.

    Scale: the qty rollup is one orderkey-hash exchange with
    map-side combine; the surviving key set is tiny (threshold
    cuts >98% of orders), so AQE converts the orders join to a
    broadcast of the AGGREGATED side — the fact is never shuffled
    twice. The customer dimension joins via the orders side's
    custkey; at dimension scale it broadcasts.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "order_date"
            ),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "total_price_cents"
            ),
            "sum_qty",
        )
    )


@query(
    "q212_sole_late_supplier",
    oracle="""
WITH l AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 100
         THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
), os AS (
  SELECT ok, sk, MAX(late) AS late FROM l GROUP BY ok, sk
), agg AS (
  SELECT ok, CAST(COUNT(*) AS BIGINT) AS nsupp,
    CAST(SUM(late) AS BIGINT) AS nlate
  FROM os GROUP BY ok
)
SELECT s.s_name AS supp_name,
  CAST(COUNT(*) AS BIGINT) AS numwait
FROM os JOIN agg USING (ok)
JOIN supplier s ON s.s_suppkey = os.sk
WHERE os.late = 1 AND agg.nsupp >= 2 AND agg.nlate = 1
GROUP BY s.s_name
""",
)
def q212_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's suppliers-who-kept-orders-waiting shape: count,
    per supplier, the multi-supplier orders on which THIS supplier
    shipped late (shipdate > orderdate + 100 days — the fixture has
    no receipt/commit dates) and no other supplier did. Q21 states
    this as EXISTS (another supplier) AND NOT EXISTS (another late
    supplier); both correlated subqueries decorrelate into one
    per-order (supplier-count, late-count) aggregate — the form a
    1000-executor plan wants anyway, since it replaces two
    correlated self-joins of the fact with one orderkey-partitioned
    rollup. Columns: supp_name, numwait.

    Determinism: lateness is an integer day difference; all
    outputs are exact counts.

    Scale: ONE fact-wide exchange. The joined fact repartitions on
    ok once; the (ok, sk) collapse runs on that distribution
    (HashPartitioning(ok) satisfies the (ok, sk) clustering), and
    the per-order (nsupp, nlate) totals ride a WINDOW over the same
    distribution rather than a groupBy+self-join — the branch form
    would recompute the whole fact⋈orders subtree twice (the round-5
    q164 lesson; plan-asserted at 3 scans / 1 fact exchange).
    Supplier joins broadcast at dimension size; state never exceeds
    distinct (order, supplier) pairs.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        F.when(
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            > 100,
            1,
        )
        .otherwise(0)
        .alias("late"),
    )
    os_ = (
        l.repartition("ok")
        .groupBy("ok", "sk")
        .agg(F.max("late").alias("late"))
    )
    w = Window.partitionBy("ok")
    flagged = os_.select(
        "ok",
        "sk",
        "late",
        F.count("*").over(w).cast("bigint").alias("nsupp"),
        F.sum("late").over(w).cast("bigint").alias("nlate"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("late") == 1) & (F.col("nsupp") >= 2) & (F.col("nlate") == 1)
        )
        .join(s, flagged["sk"] == s["s_suppkey"])
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )


@query(
    "q213_idle_rich_customers",
    oracle="""
WITH pos AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s
  FROM customer WHERE c_acctbal > 0.0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
)
SELECT CAST(c.c_nationkey AS INT) AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_cust,
  CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
    AS total_bal_cents
FROM customer c, pos
WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c.c_nationkey
""",
)
def q213_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's global-relationship-opportunity shape: customers
    whose balance beats the average positive balance but who placed
    no order since 2000-01-01, rolled up by nation. The scalar
    average arrives as a 1-row (count, sum) broadcast and the
    comparison is the integer cross-multiply bal·n > Σbal (no float
    average); the NOT EXISTS is a left-anti join against the
    recent-order key set. Columns: nation, n_cust, total_bal_cents.

    Scale: the anti-join shuffles both sides on custkey (the recent
    key set is NOT broadcastable at fact scale); the positive-
    balance anchor is a 1-row broadcast cross join — the sanctioned
    pattern for scalar anchors over a DIFFERENT filter of the same
    scan (a window can't express it without keeping unfiltered rows
    in the frame).
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
        "c_acctbal",
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("bal_cents").cast("bigint").alias("s"),
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
        )
    )


@query(
    "q214_hourly_acf",
    oracle="""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
    CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS tot
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, tot AS x,
    LAG(tot, 1) OVER w AS y1,
    LAG(tot, 2) OVER w AS y2,
    LAG(tot, 3) OVER w AS y3,
    LAG(tot, 24) OVER w AS y24
  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), pairs AS (
  SELECT event_type, 1 AS lag_h, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2, x, y2 FROM lagged WHERE y2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3, x, y3 FROM lagged WHERE y3 IS NOT NULL
  UNION ALL
  SELECT event_type, 24, x, y24 FROM lagged WHERE y24 IS NOT NULL
), m AS (
  SELECT event_type, lag_h, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(x AS DECIMAL(18, 0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(18, 0))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(18, 0)) * CAST(x AS DECIMAL(18, 0)))
      AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y AS DECIMAL(18, 0)) * CAST(y AS DECIMAL(18, 0)))
      AS DOUBLE) AS syy,
    CAST(SUM(CAST(x AS DECIMAL(18, 0)) * CAST(y AS DECIMAL(18, 0)))
      AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag_h, n AS n_pairs,
  CAST(FLOOR(
    (CAST(n AS DOUBLE) * sxy - sx * sy)
    / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
         * (CAST(n AS DOUBLE) * syy - sy * sy)) * 1000000
  ) AS BIGINT) AS acf_ppm
FROM m
WHERE (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
  AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
""",
)
def q214_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series autocorrelation: per event type, the sample Pearson
    autocorrelation of the hourly-total series at lags 1, 2, 3 and
    24 hours — the seasonality screen run before fitting q204's
    hour-of-day model (a strong lag-24 ACF says "daily cycle").
    Pairs come from LAG over the hourly frame (observed hours only);
    each lag's correlation uses the moment-sum closed form.
    Columns: event_type, lag_h, n_pairs, acf_ppm.

    Determinism: series values are exact integer milli-sums; hour
    buckets are integer epoch-µs DIV; moments accumulate in
    DECIMAL(18,0); one fixed IEEE closed form, FLOOR-ppm quantized;
    degenerate (zero-variance) slices are filtered identically in
    both engines.

    Scale: the hourly pre-aggregation is the whole trick — the fact
    collapses in ONE parallel hash-agg exchange to |types|·|hours|
    rows, and the LAG window then sorts only that tiny frame (the
    per-type window partition count is small, but its input is the
    aggregate, never the fact). The same shape holds at 100 TB:
    series analytics run over pre-bucketed totals, not raw events.
    """
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
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = h.select(
        "event_type",
        F.col("tot").alias("x"),
        F.lag("tot", 1).over(w).alias("y1"),
        F.lag("tot", 2).over(w).alias("y2"),
        F.lag("tot", 3).over(w).alias("y3"),
        F.lag("tot", 24).over(w).alias("y24"),
    )
    pairs = lagged.selectExpr(
        "event_type",
        "stack(4, 1, x, y1, 2, x, y2, 3, x, y3, 24, x, y24)"
        " AS (lag_h, x, y)",
    ).filter(F.col("y").isNotNull())
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    m = pairs.groupBy("event_type", "lag_h").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((varx > 0) & (vary > 0))
        .select(
            "event_type",
            "lag_h",
            F.col("n").alias("n_pairs"),
            F.floor(num / F.sqrt(varx * vary) * 1000000).cast("bigint").alias(
                "acf_ppm"
            ),
        )
    )


@query(
    "q215_custdist",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey,
    CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority NOT LIKE '1-%'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def q215_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13's customer-distribution shape: how many customers
    placed exactly N qualifying orders, INCLUDING the zero bucket —
    the filter lives INSIDE the outer-join condition (a WHERE would
    silently delete the no-order customers Q13 exists to count).
    Q13 excludes "special requests" comments; the fixture has no
    comment column, so the qualifying filter is o_orderpriority NOT
    LIKE '1-%' — same join-conditioned-predicate shape.
    Columns: c_count, custdist.

    Determinism: pure counts.

    Scale: the outer join shuffles both sides on custkey; the
    per-customer count reuses that distribution (no extra
    exchange), and the histogram rollup exchanges only
    |distinct counts| rows. NULL-priority orders fail the LIKE in
    both engines (three-valued logic → not joined).
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (~F.col("o_orderpriority").like("1-%")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@query(
    "q216_market_share",
    oracle="""
WITH sales AS (
  SELECT CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT)
      AS o_year,
    CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
      AS rev_cents,
    CASE WHEN sn.n_name = 'BRAZIL' THEN 1 ELSE 0 END AS is_target
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
    AND r.r_name = 'AMERICA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
)
SELECT o_year,
  CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
  CAST(SUM(CASE WHEN is_target = 1 THEN rev_cents ELSE 0 END)
    AS BIGINT) AS nation_cents,
  CAST(SUM(CASE WHEN is_target = 1 THEN rev_cents ELSE 0 END)
    * 1000000 // SUM(rev_cents) AS BIGINT) AS share_ppm
FROM sales GROUP BY o_year
HAVING SUM(rev_cents) > 0
""",
)
def q216_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8's national-market-share shape: within the AMERICA
    region's PROMO-part market, what fraction of yearly revenue did
    Brazilian suppliers capture. The numerator is a conditional sum
    in the SAME aggregate as the denominator — one pass, no
    share-vs-total self-join. Columns: o_year, total_cents,
    nation_cents, share_ppm.

    Determinism: revenue is cents (identical double expression tree
    then one ROUND — IEEE multiply is bit-identical cross-engine);
    the share is an integer cross-multiply floor-division
    (nation_cents·10⁶ DIV total_cents), never a float ratio.

    Scale: part/customer-side dims chain-broadcast after their
    filters; the fact shuffles only for the orderkey join; the
    year rollup is a tiny final exchange. The region filter prunes
    before the fact join (Catalyst pushes the dim filters below the
    join), so the shuffled fact subset is the market, not the
    corpus.
    """
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("sn_name")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sales = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c.join(F.broadcast(cn), c["c_nationkey"] == cn["cn_nationkey"]).join(F.broadcast(r), cn["cn_regionkey"] == r["r_regionkey"]).select("c_custkey")), o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sn_nationkey"])
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_cents"),
            F.when(F.col("sn_name") == "BRAZIL", 1).otherwise(0).alias("is_target"),
        )
    )
    tgt = F.sum(F.when(F.col("is_target") == 1, F.col("rev_cents")).otherwise(0))
    agg = sales.groupBy("o_year").agg(
        F.sum("rev_cents").cast("bigint").alias("total_cents"),
        tgt.cast("bigint").alias("nation_cents"),
        F.expr(
            "CAST(SUM(CASE WHEN is_target = 1 THEN rev_cents ELSE 0 END)"
            " * 1000000 DIV SUM(rev_cents) AS BIGINT)"
        ).alias("share_ppm"),
    )
    return agg.filter(F.col("total_cents") > 0)


@query(
    "q217_top_revenue_suppliers",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
      AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
), ranked AS (
  SELECT l_suppkey, rev_cents,
    MAX(rev_cents) OVER () AS max_rev
  FROM rev
)
SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
  r.rev_cents
FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_cents = r.max_rev
""",
)
def q217_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's top-supplier shape: suppliers whose quarterly
    revenue EQUALS the maximum (Q15 phrases it as a view joined to
    its own scalar MAX — here the anchor rides an empty-frame window
    over the aggregated revenue table, never a second scan of the
    fact). Columns: suppkey, supp_name, rev_cents.

    Determinism: per-row cents rounding inside the sum (exact BIGINT
    accumulation); ties all surface (Q15 semantics), no arbitrary
    pick needed.

    Scale: ONE fact exchange (the suppkey rollup, shipdate filter
    pushed to the scan); the MAX-anchor window runs over the
    |suppliers|-row aggregate — its single-partition collapse is
    bounded by the supplier dimension, not the fact (documented
    single-reducer-on-dim trade, same as q129's rank profile).
    Supplier names broadcast.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("rev_cents")
    )
    ranked = rev.select(
        "l_suppkey",
        "rev_cents",
        F.max("rev_cents").over(Window.partitionBy()).alias("max_rev"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ranked.filter(F.col("rev_cents") == F.col("max_rev"))
        .join(F.broadcast(s), ranked["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "rev_cents",
        )
    )
