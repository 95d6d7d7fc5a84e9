"""q139 mergeable-HLL sketch properties (rows-only entry — the
binary sketches are Spark-library-specific, so these pins replace an
oracle).
"""

from __future__ import annotations

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries

SF = "/root/testdata/sf0.01"


def test_merge_equals_direct_and_accuracy(spark):
    rows = all_queries()["q139_hll_incremental"](spark, SF).collect()
    assert rows, "expected per-event_type estimates"
    for r in rows:
        # mergeability identity: unioning the per-day sketches must
        # give EXACTLY the whole-table sketch's estimate (DataSketches
        # HLL is deterministic for a fixed input set)
        assert r.est_merged == r.est_direct, r
        # lgConfigK=12 -> ~1.6% relative standard error; 5σ bound
        assert abs(r.est_merged - r.n_exact) <= max(5, 0.08 * r.n_exact), r


def test_incremental_day_addition_only_touches_new_day(spark):
    """The operational claim: adding one day = sketch that day,
    union with the SAVED sketches — no history rescan. Simulated by
    splitting days into old/new, sketching separately, and checking
    the union equals the all-at-once sketch."""
    from pyspark.sql import functions as F

    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    e = events_with_us(spark, SF).select(
        "event_type",
        (F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint").alias("day"),
        "user_id",
    )
    split_day = e.agg(F.expr("percentile_approx(day, 0.8)")).collect()[0][0]
    old_sk = (
        e.filter(F.col("day") <= split_day)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    new_sk = (
        e.filter(F.col("day") > split_day)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    merged = {
        r.event_type: r.est
        for r in old_sk.unionByName(new_sk)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    direct = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct
