"""Bloom pre-filter join: exactness under false positives, bitmap
semantics, and the never-drops-a-true-match guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.operators.bloom import (
    bloom_might_contain,
    bloom_prefilter_semi_join,
    build_bloom_words,
)


def test_bloom_admits_all_members(spark):
    """Zero false negatives by construction: every inserted key
    passes the probe."""
    small = spark.range(0, 500).select(F.col("id").alias("k"))
    words = build_bloom_words(small, "k", n_bits=1 << 12)
    back = spark.range(0, 500).filter(
        bloom_might_contain(F.col("id"), words, 1 << 12)
    )
    assert back.count() == 500


def test_bloom_saturated_filter_still_exact(spark):
    """An undersized bitmap (256 bits for 300 keys) produces heavy
    false positives — the closing semi-join must still return
    exactly the true matches."""
    large = spark.range(0, 20000).select(F.col("id").alias("k"))
    small = spark.range(0, 900, 3).select(F.col("id").alias("k"))  # 300 keys
    n_bits = 256
    words = build_bloom_words(small, "k", n_bits=n_bits)
    prefiltered = large.filter(
        bloom_might_contain(F.col("k"), words, n_bits)
    ).count()
    exact = bloom_prefilter_semi_join(
        large, small, "k", "k", n_bits=n_bits
    )
    truth = large.join(small, "k", "left_semi")
    assert prefiltered > 300  # saturation produced false positives
    got = sorted(r["k"] for r in exact.collect())
    want = sorted(r["k"] for r in truth.collect())
    assert got == want


def test_bloom_high_bits_round_trip(spark):
    """Bit positions landing in the top word bits (b >= 32, and the
    sign bit b = 63) must round-trip through the long bitmap — a
    32-bit mask or sign mishandling would lose them."""
    small = spark.range(0, 5000).select(F.col("id").alias("k"))
    # tiny word count concentrates positions across all 64 bit slots
    words = build_bloom_words(small, "k", n_bits=128)
    assert any(w < 0 for w in words)  # sign bit used somewhere
    back = spark.range(0, 5000).filter(
        bloom_might_contain(F.col("id"), words, 128)
    )
    assert back.count() == 5000
