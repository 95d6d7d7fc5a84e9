"""Source/sink format round trips beyond Parquet/CSV/JDBC: ORC and
JSON-lines. Each round trip is exact — write the fixture slice out,
read it back, and compare full contents against the Parquet
original — plus a plan assertion that ORC scans keep predicate
pushdown (the property that makes it a peer columnar format, not
just an export format).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.sources.readers import (
    read_json,
    read_orc,
)
from car_insurance_data_pipeline_spark_spark.sources.writers import (
    write_json,
    write_orc,
)


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(*key).collect()]


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    assert _sorted_rows(back, ["o_orderkey"]) == _sorted_rows(
        src, ["o_orderkey"]
    )


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_orc_f")
    write_orc(src, out)
    q = read_orc(spark, out).filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan
    # column pruning reaches the ORC scan too
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_totalprice" not in read


def test_orc_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    out = str(tmp_path / "orders_orc_p")
    write_orc(src, out, partition_by=["status"])
    back = read_orc(spark, out).filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters: [isnotnull(status" in plan
    n = src.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == n


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    """JSON is schema-on-read: with the writer's schema passed back to
    the reader, every value (including bigint/double/date types JSON
    itself can't distinguish) round-trips exactly."""
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_json")
    write_json(src, out)
    back = read_json(spark, out, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back, ["doc_id"]) == _sorted_rows(src, ["doc_id"])


def test_json_roundtrip_inferred_counts(spark, sf_dir, tmp_path):
    """Without a schema, inference still lands the same row count and
    keys — the inspection/interchange use case."""
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_json")
    write_json(src, out, compression=None)
    back = read_json(spark, out)
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)
    assert set(
        r.n_nationkey for r in back.select("n_nationkey").collect()
    ) == set(r.n_nationkey for r in src.select("n_nationkey").collect())


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on a long-lived dataset: later files gained a
    column. merge_schema=True must union the schemas (old rows NULL
    in the new column); the default read keeps whichever footer
    Spark samples — pinned here only as 'does not crash'; and an
    explicit read schema is the scale path (no footer sweep) with
    identical results to the merged read."""
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_parquet,
    )

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(p)
    spark.createDataFrame(
        [(3, "c", 30.0)], "k long, v string, score double"
    ).write.mode("append").parquet(p)

    merged = read_parquet(spark, p, merge_schema=True)
    assert set(merged.columns) == {"k", "v", "score"}
    rows = {r.k: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] is None and rows[3] == 30.0

    assert read_parquet(spark, p).count() == 3  # default read survives

    pinned = spark.read.schema("k long, v string, score double").parquet(p)
    key = lambda df: sorted(  # noqa: E731
        (r.k, r.v, r.score) for r in df.collect()
    )
    assert key(pinned) == key(merged.select("k", "v", "score"))


# ---------------------------------------------------------------------------
# Python DataSource API connector (q154's source)
# ---------------------------------------------------------------------------


def test_python_datasource_partition_planning(spark):
    """n_parts is the task-parallelism contract; ragged final range
    must not drop or duplicate rows."""
    from car_insurance_data_pipeline_spark_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("sensor_synth")
        .option("n_rows", 103)  # not divisible by 8
        .option("n_parts", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 103
    assert sorted(r["reading_id"] for r in rows) == list(range(103))
    one = next(r for r in rows if r["reading_id"] == 99)
    assert one["device"] == 99 % 97
    assert one["temp_d"] == (99 * 99) % 4000 - 1000


def test_python_datasource_single_partition_and_reregister(spark):
    from car_insurance_data_pipeline_spark_spark.sources import pydatasource

    pydatasource.register(spark)
    pydatasource.register(spark)  # idempotent
    df = (
        spark.read.format("sensor_synth")
        .option("n_rows", 10)
        .option("n_parts", 1)
        .load()
    )
    assert df.count() == 10


def test_streaming_datasource_multi_batch_and_replay(spark):
    """The streaming connector must (a) page through the feed in
    chunk-sized micro-batches, (b) replay identical rows for a
    committed offset span (readBetweenOffsets), which is what a
    checkpoint recovery relies on."""
    from pyspark.sql import functions as F

    from car_insurance_data_pipeline_spark_spark.sources import pydatasource
    from car_insurance_data_pipeline_spark_spark.sources.pydatasource import (
        SensorStreamReader,
    )

    pydatasource.register_stream(spark)
    s = (
        spark.readStream.format("sensor_stream")
        .option("n_rows", 1000)
        .option("chunk", 300)
        .load()
    )
    agg = s.groupBy().agg(
        F.count("*").alias("n"), F.sum("temp_d").alias("s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sds")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    row = spark.sql("SELECT * FROM t_sds").collect()[0]
    assert row["n"] == 1000
    assert row["s"] == sum((3 * r * r + 7) % 5000 - 2500 for r in range(1000))
    # ceil(1000/300) = 4 data batches (a trailing empty batch may add 1)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 4

    # replay determinism: same span -> same rows, twice
    r1 = list(SensorStreamReader({}).readBetweenOffsets({"pos": 100}, {"pos": 200}))
    r2 = list(SensorStreamReader({}).readBetweenOffsets({"pos": 100}, {"pos": 200}))
    assert r1 == r2 and len(r1) == 100 and r1[0][0] == 100
