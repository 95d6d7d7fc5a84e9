"""Streaming ingest → warehouse, end to end: a file-source stream
(standing in for kafka/kinesis) of telematics-style events is
cleaned with the SAME Column expressions the batch path uses,
aggregated per device, and landed in a relational warehouse through
the idempotent foreachBatch JDBC upsert sink — with observed-metrics
DQ counters riding each micro-batch for free.

    read stream → clean → per-device aggregate →
    foreachBatch: observe DQ + idempotent JDBC upsert

Run directly (uses embedded Derby, no server needed):

    python examples/stream_to_warehouse.py

The upsert sink is exactly-once under replays: each batch stages
through the distributed JDBC writer, then one database transaction
merges it and records the batch_id — a replayed batch is a no-op
(see streaming/sinks.py and tests/test_streaming_jdbc_sink.py).
At scale the only changes are the source (kafka), the JDBC URL, and
the state-store partition sizing documented in ARCHITECTURE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.operators.dq import (
    ValidationRules,
    observation_report,
    observe_rules,
)
from car_insurance_data_pipeline_spark_spark.session import get_session
from car_insurance_data_pipeline_spark_spark.sources.readers import read_jdbc
from car_insurance_data_pipeline_spark_spark.streaming.sinks import (
    upsert_batch_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
SCHEMA = "device_id string, speed double, ts timestamp"
RULES = ValidationRules(min_rows=1, not_null=["device_id"], positive=["n"])


def run_stream(spark, work: str) -> dict:
    """Drive the full ingest; returns the final warehouse rows and
    per-batch apply/DQ results (testable surface)."""
    src = os.path.join(work, "src")
    url = f"jdbc:derby:{work}/wh_db;create=true"
    props = {"driver": DRIVER}

    # three arriving files -> three micro-batches
    batches = [
        [("a", 42.0, "2026-01-01 10:00:00"), ("b", 55.0, "2026-01-01 10:00:10")],
        [("a", 61.0, "2026-01-01 10:01:00"), ("c", -1.0, "2026-01-01 10:01:30")],
        [("b", 48.0, "2026-01-01 10:02:00"), ("a", 44.0, "2026-01-01 10:02:20")],
    ]
    for rows in batches:
        spark.createDataFrame(
            [(d, s, t) for d, s, t in rows], "device_id string, speed double, ts string"
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # same cleaning discipline as the batch path: drop unparseable
    # speeds, keep event-time
    cleaned = stream.filter(F.col("speed") >= 0)
    per_device = cleaned.groupBy("device_id").agg(
        F.count("*").alias("n"),
        F.max("speed").alias("peak_speed"),
    )

    batch_log: list[dict] = []

    def land(batch_df, batch_id):
        observed, obs = observe_rules(batch_df, RULES)
        applied = upsert_batch_jdbc(
            observed, batch_id, url, "device_stats", ["device_id"], props
        )
        report = observation_report(batch_df.sparkSession, obs.get, RULES)
        warns = report.filter(F.col("status") == "WARN").count()
        entry = {
            "batch_id": batch_id,
            "applied": applied,
            "dq_warns": warns,
            "rows": int(obs.get["__n"]),
        }
        batch_log.append(entry)
        print(
            f"batch {entry['batch_id']}: applied={entry['applied']} "
            f"dq_warns={entry['dq_warns']} rows={entry['rows']}"
        )

    q = (
        per_device.writeStream.outputMode("complete")
        .foreachBatch(land)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = read_jdbc(spark, url, "device_stats", properties=props)
    rows = {
        r[0]: (r[1], r[2])
        for r in final.toDF("device_id", "n", "peak_speed").collect()
    }
    return {"warehouse": rows, "batches": batch_log, "url": url}


def main() -> None:
    spark = get_session(app_name="stream-to-warehouse")
    spark.sparkContext.setLogLevel("ERROR")
    out = run_stream(spark, tempfile.mkdtemp(prefix="stream_wh_"))
    print("warehouse table:")
    for k in sorted(out["warehouse"]):
        n, peak = out["warehouse"][k]
        print(f"  {k}: n={n} peak_speed={peak}")
    spark.stop()


if __name__ == "__main__":
    main()
