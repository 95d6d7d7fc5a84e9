"""Surrogate-key operators (SURVEY.md §2.5 W1 and its scale hazard).

The reference generates dimension surrogate keys with
``row_number().over(Window.orderBy(nk))`` — an UNPARTITIONED window
(04_load_dimension_tables.py:118-123) that funnels the whole table
through one task. Three alternatives, by contract strength:

- surrogate_key_ordered: same dense 1..N ordered contract, still a
  global sort but executed as range-partitioned sort + per-partition
  offsets (zipWithIndex-style) — no single-task bottleneck.
- surrogate_key_hash: xxhash64 of the natural key — fully parallel,
  stable across loads (same NK → same SK), the 100 TB default.
- monotonic ids (Spark built-in) are intentionally NOT exposed:
  values depend on partition layout, breaking reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def surrogate_key_ordered(
    df: DataFrame, order_cols: list[str], key_name: str = "sk"
) -> DataFrame:
    """Dense 1..N keys in ``order_cols`` order, computed scalably:
    range-partition sort, count rows per partition, then add the
    per-partition base offset to an in-partition row number.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    sorted_df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    sorted_df.persist()  # counted once, re-read once for assignment

    def with_index(pid: int, it):
        i = 0
        for row in it:
            yield (pid, i, row)
            i += 1

    # RDD zipWithIndex-equivalent with deterministic ordering from the
    # range partitioner; per-partition counts are tiny driver state.
    rdd = sorted_df.rdd.mapPartitionsWithIndex(
        lambda pid, it: (((pid, sum(1 for _ in it)),) for _ in [0])
    ).flatMap(lambda x: x)
    counts = dict(rdd.collect())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boffsets = spark.sparkContext.broadcast(offsets)

    # Build a NEW StructType: StructType.add mutates the receiver,
    # and df.schema returns the DataFrame's cached schema object —
    # mutating it corrupts the caller's df.
    out_schema = StructType(
        list(df.schema.fields) + [StructField(key_name, LongType(), False)]
    )

    def assign(pid: int, it):
        base = boffsets.value.get(pid, 0)
        for i, row in enumerate(it):
            yield (*row, base + i + 1)

    indexed = sorted_df.rdd.mapPartitionsWithIndex(assign)
    out = spark.createDataFrame(indexed, out_schema)
    out = out.localCheckpoint(eager=True)  # cut lineage before unpersist
    sorted_df.unpersist()
    return out


def surrogate_key_hash(
    df: DataFrame, natural_key_cols: list[str], key_name: str = "sk"
) -> DataFrame:
    """Stable hash surrogate key from the natural key — narrow map,
    no shuffle, reproducible across loads. Collision probability for
    64-bit keys is ~n²/2⁶⁵ (≈0.003 at a billion rows); pair with
    ``assert_unique`` when loading dimensions.
    """
    return df.withColumn(key_name, F.xxhash64(*natural_key_cols))


def assert_unique(df: DataFrame, cols: list[str]) -> None:
    """Raise if ``cols`` are not unique (collision / bad NK guard)."""
    dupes = df.groupBy(*cols).count().filter(F.col("count") > 1).limit(1).count()
    if dupes:
        raise ValueError(f"uniqueness violated on {cols}")
