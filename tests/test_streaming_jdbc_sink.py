"""foreachBatch JDBC upsert sink: a real multi-batch stream lands in
embedded Derby through the idempotent staged-merge transaction, keys
arriving in later batches OVERWRITE earlier rows (upsert, not
append), and a replayed batch_id is a no-op (the exactly-once
contract under sink/checkpoint races)."""

from __future__ import annotations

import pytest

from car_insurance_data_pipeline_spark_spark.sources.readers import read_jdbc
from car_insurance_data_pipeline_spark_spark.streaming.sinks import (
    jdbc_upsert_writer,
    upsert_batch_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PROPS = {"driver": DRIVER}


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_sink") / "sink_db"
    url = f"jdbc:derby:{db};create=true"
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("Derby driver not on Spark classpath")
    return url


def _write_batches(spark, path, batches, schema):
    for batch in batches:
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(path))


def _rows(spark, url, table):
    df = read_jdbc(spark, url, table, properties=PROPS)
    return {
        r.DEVICE_ID: (r.N, r.TOTAL)
        for r in df.toDF(*[c.upper() for c in df.columns]).collect()
    }


def test_stream_upserts_and_replay_is_noop(spark, tmp_path, derby_url):
    schema = "device_id string, n long, total double"
    src = tmp_path / "src"
    # batch 1 inserts a+b; batch 2 updates a and inserts c
    _write_batches(
        spark,
        src,
        [
            [("a", 1, 10.0), ("b", 1, 5.0)],
            [("a", 2, 30.0), ("c", 1, 7.0)],
        ],
        schema,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            jdbc_upsert_writer(derby_url, "device_stats", ["device_id"], PROPS)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(spark, derby_url, "device_stats") == {
        "a": (2, 30.0),  # batch-2 value overwrote batch-1 (upsert)
        "b": (1, 5.0),
        "c": (1, 7.0),
    }

    # replay: re-apply batch 1's content under its committed batch_id
    replay = spark.createDataFrame([("a", 1, 10.0)], schema)
    applied = upsert_batch_jdbc(
        replay, 0, derby_url, "device_stats", ["device_id"], PROPS
    )
    assert applied is False  # ledger recognized the batch
    assert _rows(spark, derby_url, "device_stats")["a"] == (2, 30.0)

    # a NEW batch_id with the same rows IS applied (it's not a replay)
    applied = upsert_batch_jdbc(
        replay, 99, derby_url, "device_stats", ["device_id"], PROPS
    )
    assert applied is True
    assert _rows(spark, derby_url, "device_stats")["a"] == (1, 10.0)


def test_within_batch_dedup_last_wins_one_row_per_key(spark, derby_url):
    schema = "device_id string, n long, total double"
    dup = spark.createDataFrame(
        [("x", 1, 1.0), ("x", 2, 2.0), ("y", 1, 3.0)], schema
    )
    upsert_batch_jdbc(dup, 0, derby_url, "dedup_tgt", ["device_id"], PROPS)
    got = _rows(spark, derby_url, "dedup_tgt")
    assert set(got) == {"x", "y"}  # exactly one row per key survived
