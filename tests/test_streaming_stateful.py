"""Stateful-streaming smoke: applyInPandasWithState operators driven
by multiple micro-batches (maxFilesPerTrigger=1 over several files)
so state genuinely carries across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.streaming.stateful import (
    running_device_stats,
    streaming_dedup,
)
from car_insurance_data_pipeline_spark_spark.streaming.telematics import (
    run_to_memory,
)


def _write_batches(spark, path, rows, schema):
    # one file per batch → multiple availableNow triggers
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(path))


def test_running_device_stats_across_batches(spark, tmp_path):
    schema = "deviceId string, sensor_value double"
    src = tmp_path / "src"
    _write_batches(
        spark,
        src,
        [
            [("a", 1.0), ("a", 3.0), ("b", 10.0)],
            [("a", 5.0), ("b", 2.0), ("b", 4.0)],
        ],
        schema,
    )
    stream = (
        spark.readStream.schema("deviceId string, sensor_value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(running_device_stats(stream), "stats_out", "update")
    # last emitted row per key carries the full running totals
    final = {
        r.deviceId: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY deviceId ORDER BY n DESC) rn
                 FROM stats_out) WHERE rn = 1"""
        ).collect()
    }
    assert final["a"].n == 3 and final["a"].total == 9.0 and final["a"].peak == 5.0
    assert final["b"].n == 3 and final["b"].total == 16.0 and final["b"].peak == 10.0


def test_streaming_dedup_first_seen(spark, tmp_path):
    schema = "k string, v long"
    src = tmp_path / "src2"
    _write_batches(
        spark,
        src,
        [
            [("x", 1), ("y", 1), ("x", 2)],
            [("x", 3), ("z", 1)],
        ],
        schema,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(streaming_dedup(stream, "k"), "dedup_out", "update")
    rows = spark.sql("SELECT k FROM dedup_out").collect()
    # each key emitted exactly once, on first sight
    keys = [r.k for r in rows]
    assert sorted(keys) == ["x", "y", "z"]


def test_foreachbatch_idempotent_sink(spark, tmp_path):
    """The foreachBatch sink must not duplicate on replay: running
    the stream twice over the same source with the same checkpoint
    produces the same output rows (second run is a no-op)."""
    from car_insurance_data_pipeline_spark_spark.streaming.telematics import (
        read_stream,
        write_stream_idempotent,
    )

    src = tmp_path / "src3"
    _write_batches(
        spark,
        src,
        [[("a", 1.0), ("b", 2.0)], [("c", 3.0)]],
        "k string, v double",
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_stream(spark, str(src), "k string, v double", max_files=1)
    q = write_stream_idempotent(stream, out, ckpt)
    q.awaitTermination()
    first = sorted(
        (r.k, r.v) for r in spark.read.parquet(out).select("k", "v").collect()
    )
    assert first == [("a", 1.0), ("b", 2.0), ("c", 3.0)]

    # replay: same checkpoint → no new batches → identical output
    stream2 = read_stream(spark, str(src), "k string, v double", max_files=1)
    q2 = write_stream_idempotent(stream2, out, ckpt)
    q2.awaitTermination()
    second = sorted(
        (r.k, r.v) for r in spark.read.parquet(out).select("k", "v").collect()
    )
    assert second == first

    # guard: fresh checkpoint against an existing out_dir is rejected
    import pytest as _pytest

    stream3 = read_stream(spark, str(src), "k string, v double", max_files=1)
    with _pytest.raises(ValueError, match="stale partitions"):
        write_stream_idempotent(stream3, out, str(tmp_path / "ckpt_new"))

    # guard: partition_col collision is rejected
    with _pytest.raises(ValueError, match="collides"):
        write_stream_idempotent(stream3, out, ckpt, partition_col="k")
