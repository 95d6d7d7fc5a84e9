"""Misra-Gries heavy hitters (operators/frequent.py) — the superset
guarantee and exactness under adversarial partitionings (the oracle
mirrors the brute-force query, so it can't distinguish a lucky
partition layout from the guarantee holding).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.operators.frequent import (
    heavy_hitters,
    mg_candidates,
)

SF = "/root/testdata/sf0.001"
K = 50


def _words(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")


def _true_hitters(spark) -> dict[str, int]:
    rows = _words(spark).collect()
    c = Counter(r.w for r in rows)
    n = sum(c.values())
    return {w: cnt for w, cnt in c.items() if cnt * K > n}


def test_candidates_superset_under_adversarial_partitionings(spark):
    """The MG union must contain every true heavy hitter no matter
    how rows are laid out: hash-random, single partition, sorted (so
    one item's occurrences are contiguous — the layout that starves
    per-partition counters of diversity), and skew-concentrated."""
    words = _words(spark)
    truth = set(_true_hitters(spark))
    assert truth, "fixture should have heavy words at k=50"
    layouts = {
        "hash": words.repartition(13),
        "single": words.coalesce(1),
        "sorted": words.repartition(7).sortWithinPartitions("w"),
        "range": words.repartitionByRange(5, "w"),
    }
    for name, df in layouts.items():
        cands = {r.w for r in mg_candidates(df, "w", K).collect()}
        missing = truth - cands
        assert not missing, (name, missing)


def test_heavy_hitters_exact_counts_any_layout(spark):
    truth = _true_hitters(spark)
    words = _words(spark)
    for df in (words, words.repartition(17), words.coalesce(1)):
        got = {r.w: r.cnt for r in heavy_hitters(df, "w", K).collect()}
        assert got == truth


def test_heavy_hitters_fully_lazy(spark):
    """Constructing the heavy-hitters DataFrame must trigger NO Spark
    job (the total is an in-plan broadcast, not a driver count) —
    the cosine_topk lazy-dispatch discipline."""
    words = _words(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = heavy_hitters(words, "w", K)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert df.count() >= 1


def test_heavy_hitters_non_string_key(spark):
    """Round-6 advice fix: the MG output schema derives from the
    input column's type, so bigint (and other non-string) keys work
    without casts."""
    from car_insurance_data_pipeline_spark_spark.operators.frequent import heavy_hitters

    rows = [(7,)] * 40 + [(i,) for i in range(30)]
    df = spark.createDataFrame(rows, "item bigint").repartition(5)
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", 4).collect()}
    assert got == {(7, 41)}
    out_type = heavy_hitters(df, "item", 4).schema["item"].dataType.simpleString()
    assert out_type == "bigint"
