"""Checks for extended-surface queries without SQL oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries


def test_approx_distinct_accuracy(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 5% of the exact counts."""
    approx = {
        r.l_returnflag: (r.approx_orders, r.approx_parts)
        for r in all_queries()["q47_approx_distinct"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: (r.o, r.p)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("o"),
            F.countDistinct("l_partkey").alias("p"),
        )
        .collect()
    }
    for flag, (ao, ap) in approx.items():
        eo, ep = exact[flag]
        assert abs(ao - eo) / eo < 0.05
        assert abs(ap - ep) / ep < 0.05


def test_salted_join_equals_plain(spark, sf_dir):
    """The salted join must be result-identical to the plain join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r.o_orderstatus: r.n
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r.o_orderstatus: r.n_items
        for r in all_queries()["q53_salted_join"](spark, sf_dir).collect()
    }
    assert salted == plain


def test_multimodal_features_deterministic(spark, sf_dir):
    q = all_queries()["q59_multimodal_features"]
    a = sorted((r.doc_id, r.n_bytes, r.byte_checksum) for r in q(spark, sf_dir).collect())
    b = sorted((r.doc_id, r.n_bytes, r.byte_checksum) for r in q(spark, sf_dir).collect())
    assert a == b and len(a) > 0


def test_recursive_hierarchy_depth_semantics(spark, sf_dir):
    """The synthetic halving hierarchy has closed-form structure:
    chain_len == chain_depth + 1 for every customer, depth(c) ==
    floor(log2(c)), and root customer 1 has a single-node chain —
    pinning the recursion's termination and step logic independent
    of the oracle."""
    import math

    from car_insurance_data_pipeline_spark_spark.plans.relational_ext import (
        q141_recursive_hierarchy,
    )

    rows = q141_recursive_hierarchy(spark, sf_dir).collect()
    assert len(rows) > 0
    by_key = {r.start_key: r for r in rows}
    assert by_key[1].chain_depth == 0 and by_key[1].chain_len == 1
    for r in rows:
        assert r.chain_len == r.chain_depth + 1
        # keys <= 1 terminate immediately (node > 1 guard); above
        # that the halving chain has closed-form depth floor(log2 k)
        want = 0 if r.start_key <= 1 else int(math.floor(math.log2(r.start_key)))
        assert r.chain_depth == want
