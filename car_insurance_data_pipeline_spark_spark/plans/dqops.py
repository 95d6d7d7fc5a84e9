"""Data-quality catalog queries: column profiling and referential
integrity — the Deequ-shaped completion of the DQ surface started by
q68's rule validation (reference 06_validate_data_quality.py prints
ad-hoc checks; these are reusable report operators).

Cross-engine determinism: profiled min/max go through string casts
of canonically-formatted types only (integers, strings); orphan
counts are exact integers. No floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table


@query(
    "q98_column_profile",
    oracle="""
SELECT 'l_linenumber' AS column, count(*) AS n_rows,
  CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nulls,
  CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
  CAST(min(l_linenumber) AS VARCHAR) AS min_str,
  CAST(max(l_linenumber) AS VARCHAR) AS max_str
FROM lineitem
UNION ALL
SELECT 'l_orderkey', count(*),
  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT l_orderkey) AS BIGINT),
  CAST(min(l_orderkey) AS VARCHAR), CAST(max(l_orderkey) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*),
  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT l_returnflag) AS BIGINT),
  min(l_returnflag), max(l_returnflag)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', count(*),
  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT l_shipdate) AS BIGINT),
  CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
FROM lineitem
""",
)
def q98_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style single-pass column profile of four lineitem
    columns: row count, null count, exact distinct count, min/max as
    canonical strings. Columns: column, n_rows, n_nulls, n_distinct,
    min_str, max_str. Profiled columns are integer/string typed so
    the string forms are canonical in both engines (float formatting
    is not). The operator's ``exact_distinct=False`` switch is the
    100 TB path (HLL, no Expand); the exact form is the oracle-able
    one used here.
    """
    from car_insurance_data_pipeline_spark_spark.operators.dq import (
        column_profile,
    )

    return column_profile(
        table(spark, sf_dir, "lineitem"),
        ["l_linenumber", "l_orderkey", "l_returnflag", "l_shipdate"],
    )


@query(
    "q99_referential_integrity",
    oracle="""
WITH o AS (
  SELECT o_custkey AS fk FROM orders
  UNION ALL
  -- three injected orphans: keys guaranteed outside customer
  SELECT - (c + 1) FROM (SELECT unnest(range(0, 3)) AS c)
), chk1 AS (
  SELECT 'orders.o_custkey->customer' AS relation,
    count(*) AS n_children,
    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_orphans
  FROM o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.fk = c.c_custkey
  WHERE o.fk IS NOT NULL
), chk2 AS (
  SELECT 'lineitem.l_orderkey->orders' AS relation,
    count(*) AS n_children,
    CAST(sum(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_orphans
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) oo
    ON l.l_orderkey = oo.o_orderkey
  WHERE l.l_orderkey IS NOT NULL
), chk3 AS (
  SELECT 'lineitem.l_partkey->part' AS relation,
    count(*) AS n_children,
    CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_orphans
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
    ON l.l_partkey = p.p_partkey
  WHERE l.l_partkey IS NOT NULL
)
SELECT relation, n_children, n_orphans,
  CAST(CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END AS INT) AS ok
FROM (SELECT * FROM chk1 UNION ALL SELECT * FROM chk2
      UNION ALL SELECT * FROM chk3)
""",
)
def q99_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan report over the TPC-H-ish fixture:
    orders→customer (with three injected orphan keys so a nonzero
    count is exercised), lineitem→orders, lineitem→part. Columns:
    relation, n_children, n_orphans, ok. Each check is one left join
    against the parent's distinct keys (broadcast when small) with a
    map-side collapsed count; the report is a lazy 3-row union.
    """
    from car_insurance_data_pipeline_spark_spark.operators.dq import (
        referential_integrity,
    )

    orders = table(spark, sf_dir, "orders")
    orphans = spark.range(3).select(
        (-(F.col("id") + 1)).alias("o_custkey")
    )
    child1 = orders.select("o_custkey").unionByName(orphans)
    return referential_integrity(
        [
            (
                child1,
                "o_custkey",
                table(spark, sf_dir, "customer"),
                "c_custkey",
                "orders.o_custkey->customer",
            ),
            (
                table(spark, sf_dir, "lineitem"),
                "l_orderkey",
                orders,
                "o_orderkey",
                "lineitem.l_orderkey->orders",
            ),
            (
                table(spark, sf_dir, "lineitem"),
                "l_partkey",
                table(spark, sf_dir, "part"),
                "p_partkey",
                "lineitem.l_partkey->part",
            ),
        ]
    )


@query(
    "q101_histogram",
    oracle="""
WITH b AS (
  SELECT CAST(LEAST(GREATEST(n_chars // 200, 0), 11) AS INT) AS bin
  FROM documents WHERE n_chars IS NOT NULL
), c AS (
  SELECT bin, count(*) AS n FROM b GROUP BY bin
)
SELECT CAST(r.bin AS INT) AS bin,
  CAST(r.bin * 200 AS BIGINT) AS lo_edge,
  CAST((r.bin + 1) * 200 AS BIGINT) AS hi_edge,
  CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM (SELECT unnest(range(0, 12)) AS bin) r
LEFT JOIN c ON c.bin = r.bin
""",
)
def q101_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of document lengths: 12 bins of 200
    chars over documents.n_chars, top bin clamps the tail, empty
    bins emitted with n=0. Columns: bin, lo_edge, hi_edge, n. Pure
    integer bin arithmetic — bit-identical across engines; one
    ≤12-group aggregate at any corpus size.
    """
    from car_insurance_data_pipeline_spark_spark.operators.dq import (
        histogram_int,
    )

    return histogram_int(
        table(spark, sf_dir, "documents"), "n_chars", lo=0, width=200, n_bins=12
    )


@query("q139_hll_incremental")  # rows-only: DataSketches HLL binary
# sketches are Spark-library-specific (no DuckDB equivalent); the
# merge==direct identity and the accuracy bound are pytest-pinned
# (tests/test_hll_incremental.py)
def q139_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the incremental companion
    to q126's exact aggregate maintenance and q47's one-shot
    approx_count_distinct: per-(event_type, epoch-day) HLL sketches
    (what a daily ingest would persist) are UNION-merged into
    per-type estimates and compared in-plan against the direct
    whole-table sketch and the exact distinct count. Columns:
    event_type, est_merged, est_direct, n_exact.

    The mergeability identity est_merged == est_direct is the whole
    point at 100 TB: yesterday's sketches never recompute — a new
    day unions in O(sketch size), while exact distinct re-scans
    history. Sketch estimates are deterministic for a fixed input
    set (DataSketches HLL has no run-time randomness), so the
    identity is exact, not approximate.

    Scale: per-day sketching is one map-side-combined exchange on
    (event_type, day); the merge exchanges |types|·|days| sketches
    of ~KB each. The exact count here exists only as the test's
    accuracy yardstick.
    """
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    e = events_with_us(spark, sf_dir).select(
        "event_type",
        (F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint").alias("day"),
        "user_id",
    )
    daily = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("est_direct"),
        F.countDistinct("user_id").cast("bigint").alias("n_exact"),
    )
    return merged.join(direct, "event_type").select(
        "event_type", "est_merged", "est_direct", "n_exact"
    )


@query(
    "q146_kanonymity",
    oracle="""
WITH banded AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS INT) AS bal_band
  FROM customer
)
SELECT
  CAST(c_nationkey AS INT) AS nation,
  c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS group_size,
  CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_diversity,
  CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS INT) AS k_violation,
  CAST(CASE WHEN COUNT(DISTINCT bal_band) < 3 THEN 1 ELSE 0 END AS INT)
    AS l_violation
FROM banded
GROUP BY c_nationkey, c_mktsegment
""",
)
def q146_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: k-anonymity (k=5) and l-diversity (l=3) over
    the quasi-identifier pair (nation, market segment), with the
    account-balance thousand-band as the sensitive attribute. Every
    QI group is reported with its size, its sensitive-value
    diversity, and violation flags — the per-release audit a privacy
    gate runs before data leaves the pipeline (complement of q84's
    PII scrub: scrubbing removes direct identifiers, this measures
    re-identification risk from the quasi-identifiers that remain).
    Columns: nation, segment, group_size, l_diversity, k_violation,
    l_violation.

    Determinism: group sizes and distinct-band counts are exact
    integers; FLOOR on an IEEE double divide is bit-identical in
    both engines. Scale: one partial-agg group-by (COUNT DISTINCT
    expands to a two-phase agg on (QI, band)) — QI-key partitioned,
    no skew hazard at 125 groups × any row count.
    """
    c = table(spark, sf_dir, "customer")
    banded = c.select(
        F.col("c_nationkey").cast("int").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
    )
    return banded.groupBy("nation", "segment").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("bal_band").alias("l_diversity"),
        F.when(F.count("*") < 5, 1).otherwise(0).cast("int").alias(
            "k_violation"
        ),
        F.when(F.countDistinct("bal_band") < 3, 1).otherwise(0).cast(
            "int"
        ).alias("l_violation"),
    )


@query(
    "q147_source_overlap",
    oracle="""
WITH fp AS (
  SELECT DISTINCT source, substr(trim(lower(text)), 1, 60) AS h
  FROM documents
), per_src AS (
  SELECT source, COUNT(*) AS n FROM fp GROUP BY source
)
SELECT a.source AS src_a, b.source AS src_b,
  CAST(COUNT(*) AS BIGINT) AS shared,
  CAST(COUNT(*) AS DOUBLE) / LEAST(pa.n, pb.n) AS containment
FROM fp a
JOIN fp b ON a.h = b.h AND a.source < b.source
JOIN per_src pa ON pa.source = a.source
JOIN per_src pb ON pb.source = b.source
GROUP BY a.source, b.source, pa.n, pb.n
""",
)
def q147_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, how many normalized 60-char document PREFIXES they
    share (shared boilerplate/openings — the signal a mixture
    designer checks before weighting sources, since double-counted
    content inflates a source's effective weight), plus the
    containment ratio against the smaller side. Exact-duplicate
    overlap is the degenerate case (full-text fingerprint instead of
    prefix); the fixture's exact dups never cross sources, so the
    prefix key is what makes the matrix non-empty AND is the
    realistic boilerplate-overlap diagnostic.
    Columns: src_a, src_b, shared, containment.

    Scale: distinct (source, prefix) pairs → self-equi-join on the
    prefix hash — key-partitioned, bounded by sources-per-prefix
    (≤ n_sources per key, no quadratic blowup), then a 20-row
    broadcast of per-source counts. The prefix plays the role of a
    blocking key exactly like q133's.
    """
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        F.substring(F.trim(F.lower(F.col("text"))), 1, 60).alias("h"),
    ).distinct()
    per_src = fp.groupBy("source").agg(F.count("*").alias("n"))
    a = fp.alias("a")
    b = fp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    pa = per_src.select(
        F.col("source").alias("src_a"), F.col("n").alias("n_a")
    )
    pb = per_src.select(
        F.col("source").alias("src_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            (
                F.col("shared").cast("double")
                / F.least(F.col("n_a"), F.col("n_b"))
            ).alias("containment"),
        )
    )


@query(
    "q157_distribution_drift",
    oracle="""
WITH b AS (
  SELECT event_type,
         -- '//': DuckDB's '/' on integers is FLOAT division
         CAST(ROUND(value * 100) AS BIGINT) // 2000 AS bucket,
         event_id % 2 AS cohort
  FROM events WHERE value IS NOT NULL
), cell AS (
  SELECT event_type, bucket,
    SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS o_a,
    SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS o_b
  FROM b GROUP BY event_type, bucket
), tot AS (
  SELECT event_type,
    SUM(o_a) AS n_a, SUM(o_b) AS n_b,
    SUM(o_a + o_b) AS grand
  FROM cell GROUP BY event_type
), term AS (
  SELECT c.event_type,
    CAST(FLOOR((
      (c.o_a - CAST(t.n_a AS DOUBLE) * (c.o_a + c.o_b) / t.grand)
        * (c.o_a - CAST(t.n_a AS DOUBLE) * (c.o_a + c.o_b) / t.grand)
        / (CAST(t.n_a AS DOUBLE) * (c.o_a + c.o_b) / t.grand)
      + (c.o_b - CAST(t.n_b AS DOUBLE) * (c.o_a + c.o_b) / t.grand)
        * (c.o_b - CAST(t.n_b AS DOUBLE) * (c.o_a + c.o_b) / t.grand)
        / (CAST(t.n_b AS DOUBLE) * (c.o_a + c.o_b) / t.grand)
    ) * 1000000) AS BIGINT) AS term_micro
  FROM cell c JOIN tot t USING (event_type)
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_buckets,
  CAST(SUM(term_micro) AS BIGINT) AS chi2_micro
FROM term GROUP BY event_type
""",
)
def q157_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: a two-sample chi-square statistic
    per event type between the even- and odd-id cohorts (stand-ins
    for week-over-week snapshots), over $20 value buckets — the DQ
    gate that catches a silent upstream distribution change before
    it poisons a training mixture. Complements q114/q103 (row-level
    outliers) with a POPULATION-level test.

    Determinism: every input to the float expression is an exact
    small integer, the expression tree is written identically in
    both dialects (IEEE ops on identical inputs are bit-identical),
    and each bucket's term is floor-quantized to integer micro-units
    BEFORE the cross-bucket sum — so the aggregate is an
    order-independent integer sum (the q96/q125 discipline; a raw
    double SUM would be partial-agg-order dependent).
    Columns: event_type, n_buckets, chi2_micro.

    Scale: two partial-agg exchanges (cells, then per-type totals
    broadcast back via a 5-row join) — cardinality-bounded
    throughout.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100).cast("bigint")
    b = ev.select(
        "event_type",
        (cents / F.lit(2000)).cast("bigint").alias("bucket"),
        (F.col("event_id") % 2).alias("cohort"),
    )
    cell = b.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("o_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("o_b"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("o_a").alias("n_a"),
        F.sum("o_b").alias("n_b"),
        F.sum(F.col("o_a") + F.col("o_b")).alias("grand"),
    )
    j = cell.join(F.broadcast(tot), "event_type")
    row_tot = F.col("o_a") + F.col("o_b")
    e_a = F.col("n_a").cast("double") * row_tot / F.col("grand")
    e_b = F.col("n_b").cast("double") * row_tot / F.col("grand")
    term = (F.col("o_a") - e_a) * (F.col("o_a") - e_a) / e_a + (
        F.col("o_b") - e_b
    ) * (F.col("o_b") - e_b) / e_b
    terms = j.select(
        "event_type",
        F.floor(term * 1_000_000).cast("bigint").alias("term_micro"),
    )
    return terms.groupBy("event_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum("term_micro").alias("chi2_micro"),
    )


@query(
    "q160_pseudonymize",
    oracle="""
WITH c AS (
  SELECT md5('cust:' || CAST(c_custkey AS VARCHAR)) AS pid, c_mktsegment
  FROM customer
), o AS (
  SELECT md5('cust:' || CAST(o_custkey AS VARCHAR)) AS pid,
         TRY_CAST(o_totalprice AS DECIMAL(27,6)) AS price
  FROM orders
)
SELECT c.c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(COUNT(DISTINCT c.pid) AS BIGINT) AS n_customers,
  CAST(SUM(o.price) AS DOUBLE) AS revenue
FROM c JOIN o ON o.pid = c.pid
GROUP BY c.c_mktsegment
""",
)
def q160_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization with referential integrity (privacy
    engineering): natural keys are replaced by a deterministic keyed
    digest (md5 over a salted rendering — HMAC-shaped; the salt
    'cust:' stands in for a secret key) INDEPENDENTLY in each table,
    and the tables are then joined ON THE PSEUDONYMS. The hash pins
    the property that matters: pseudonymization preserved every join
    relationship (same cardinalities and aggregates as joining on
    the raw keys) while the raw key never appears in the output —
    the transform a pipeline applies before handing data to a
    training/analytics tenant. Complements q84 (PII scrub) and q146
    (re-identification risk audit). Columns: segment, n_orders,
    n_customers, revenue.

    Scale: the digest is a narrow codegen'd map on both sides; the
    join shuffles on the pseudonym exactly as it would on the raw
    key (hash distribution preserved — md5 output is uniform).
    Decimal-sum determinism per catalog rules.
    """
    c = table(spark, sf_dir, "customer").select(
        F.md5(F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")))
        .alias("pid"),
        "c_mktsegment",
    )
    o = table(spark, sf_dir, "orders").select(
        F.md5(F.concat(F.lit("cust:"), F.col("o_custkey").cast("string")))
        .alias("pid"),
        F.col("o_totalprice").try_cast("decimal(27,6)").alias("price"),
    )
    return (
        c.join(o, "pid")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("pid").alias("n_customers"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


@query(
    "q161_deletion_propagation",
    oracle="""
WITH del AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
), del_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM del)
)
SELECT * FROM (
  SELECT 'customer' AS tbl,
    CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS n_deleted,
    CAST((SELECT COUNT(*) FROM customer) -
         (SELECT COUNT(*) FROM del) AS BIGINT) AS n_kept
  UNION ALL
  SELECT 'orders',
    CAST((SELECT COUNT(*) FROM del_orders) AS BIGINT),
    CAST((SELECT COUNT(*) FROM orders) -
         (SELECT COUNT(*) FROM del_orders) AS BIGINT)
  UNION ALL
  SELECT 'lineitem',
    CAST((SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
         AS BIGINT),
    CAST((SELECT COUNT(*) FROM lineitem) -
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
         AS BIGINT)
) t
""",
)
def q161_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade (data lifecycle): a deletion
    list of customers propagates down the FK chain
    (customer → orders → lineitem) via semi/anti joins, and the
    audit reports deleted/kept counts per table — the verification
    artifact a GDPR erasure job must produce. The engine side
    computes each table's survivors with LEFT ANTI joins against the
    broadcast deletion frontier (the erasure plan itself, not just
    the counts); the oracle states the same cascade as IN-subqueries.
    Columns: tbl, n_deleted, n_kept.

    Scale: the deletion list is broadcast (erasure batches are
    small); each fact table is ONE scan + anti/semi join, no
    shuffle of the big side; the per-table counts partial-aggregate.
    At petabyte scale the same plan runs per partition-pruned slice.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    del_c = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_o = orders.join(
        del_c,
        orders["o_custkey"] == del_c["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    del_l = li.join(
        del_o, li["l_orderkey"] == del_o["o_orderkey"],
        "left_semi",
    )

    def audit(tbl: str, total_df: DataFrame, deleted_df: DataFrame) -> DataFrame:
        total = total_df.agg(F.count("*").alias("t"))
        deleted = deleted_df.agg(F.count("*").alias("d"))
        return total.crossJoin(deleted).select(
            F.lit(tbl).alias("tbl"),
            F.col("d").alias("n_deleted"),
            (F.col("t") - F.col("d")).alias("n_kept"),
        )

    return (
        audit("customer", cust, del_c)
        .unionByName(audit("orders", orders, del_o))
        .unionByName(audit("lineitem", li, del_l))
    )


_FK_CANDIDATES = [
    # (child_table, child_col, parent_table, parent_col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    # deliberate decoys: dense synthetic key ranges make these fully
    # contained too — the report exposes them via the cardinality
    # ratio, which is the realistic FK-inference signal
    ("orders", "o_custkey", "supplier", "s_suppkey"),
    ("lineitem", "l_suppkey", "customer", "c_custkey"),
]


def _fk_oracle() -> str:
    blocks = []
    for ct, cc, pt, pc in _FK_CANDIDATES:
        blocks.append(
            f"""
SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
  (SELECT CAST(COUNT(DISTINCT {cc}) AS BIGINT) FROM {ct}
     WHERE {cc} IS NOT NULL) AS n_child,
  (SELECT CAST(COUNT(DISTINCT {pc}) AS BIGINT) FROM {pt}
     WHERE {pc} IS NOT NULL) AS n_parent,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM
     (SELECT DISTINCT {cc} FROM {ct} WHERE {cc} IS NOT NULL) c
     WHERE EXISTS (SELECT 1 FROM {pt} p WHERE p.{pc} = c.{cc}))
    AS n_contained,
  (SELECT CAST(COUNT(*) AS BIGINT) = COUNT(DISTINCT {pc})
     FROM {pt}) AS parent_unique
FROM (SELECT 1) one"""
        )
    body = "\nUNION ALL".join(blocks)
    return f"""
WITH raw AS ({body})
SELECT child, parent, n_child, n_parent, n_contained,
  CAST(n_contained * 1000000 // n_child AS BIGINT) AS containment_ppm,
  CAST(CASE WHEN n_contained = n_child AND parent_unique
            AND n_child * 2 >= n_parent
       THEN 1 ELSE 0 END AS INT) AS fk_plausible
FROM raw
"""


@query("q281_fk_inference", oracle=_fk_oracle())
def q281_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key inference report — the schema-discovery DQ
    operator (Deequ/metanome's containment-based IND detection) over
    a fixed candidate list: per (child column, parent column) pair,
    distinct cardinalities, the exactly-counted containment
    |distinct(child) ∩ parent| via a semi-join (never a pair
    expansion), parent-key uniqueness, and a plausibility verdict
    that requires full containment AND a cardinality ratio — the
    decoy pairs (dense synthetic key ranges are fully contained in
    each other) stay flagged 0, which is the point: containment
    alone is NOT an FK signal. Columns: child, parent, n_child,
    n_parent, n_contained, containment_ppm, fk_plausible.

    Determinism: exact distinct counts and integer DIV ppm on
    non-negative operands; the candidate list is fixed.

    Scale: per candidate, two distinct-aggregates and one semi-join
    on the key — each a single keyed exchange, map-side combined;
    candidates are independent plan branches (a real system fans
    hundreds of candidate pairs into one job the same way). No
    posting lists, no pair expansion, nothing driver-side.
    """
    out = None
    for ct, cc, pt, pc in _FK_CANDIDATES:
        child = table(spark, sf_dir, ct).select(cc).filter(
            F.col(cc).isNotNull()
        )
        parent_tbl = table(spark, sf_dir, pt)
        parent = parent_tbl.select(pc).filter(F.col(pc).isNotNull())
        cdist = child.distinct()
        contained = cdist.join(
            parent.distinct().withColumnRenamed(pc, cc), cc, "leftsemi"
        )
        # ONE aggregate over the parent table serves both n_parent
        # (countDistinct ignores NULLs, so the isNotNull pre-filter
        # is redundant for it) and the uniqueness verdict — the
        # split form scanned the parent twice per candidate (8 extra
        # scan+agg branches across the report; optimization r11).
        pstats = parent_tbl.agg(
            F.countDistinct(pc).cast("bigint").alias("n_parent"),
            (F.count("*") == F.countDistinct(pc)).alias("parent_unique"),
        )
        row = (
            cdist.agg(F.count("*").cast("bigint").alias("n_child"))
            .crossJoin(pstats)
            .crossJoin(
                contained.agg(
                    F.count("*").cast("bigint").alias("n_contained")
                )
            )
            .select(
                F.lit(f"{ct}.{cc}").alias("child"),
                F.lit(f"{pt}.{pc}").alias("parent"),
                "n_child",
                "n_parent",
                "n_contained",
                "parent_unique",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "child",
        "parent",
        "n_child",
        "n_parent",
        "n_contained",
        F.expr("CAST(n_contained * 1000000 DIV n_child AS BIGINT)").alias(
            "containment_ppm"
        ),
        F.when(
            (F.col("n_contained") == F.col("n_child"))
            & F.col("parent_unique")
            & (F.col("n_child") * 2 >= F.col("n_parent")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("fk_plausible"),
    )
