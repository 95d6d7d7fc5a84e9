#!/usr/bin/env python3
"""Pure micro-batch scheduler floor for the streaming suite
(r11 verdict #9): time availableNow streams over the SAME split
source / trigger / state-partition settings as the verification
queries, with (a) a stateless pass-through projection (zero state,
zero shuffle — the irreducible per-batch scheduling + source
listing + sink cost) and (b) a minimal one-aggregation stateful
query (adds one state-store task round per batch).

Whatever a real streaming query's wall shows ABOVE (b) is
query-owned work; the gap between the suite's per-query walls and
these floors is what further streaming optimization could recover.
Record the output in BASELINE.md.

Usage: python tools/stream_floor.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from car_insurance_data_pipeline_spark_spark.plans import (
        streaming_queries as sq,
    )
    from car_insurance_data_pipeline_spark_spark.session import get_session

    spark = get_session(app_name="stream-floor")
    spark.sparkContext.setLogLevel("ERROR")

    src, schema = sq._split_events(spark, sf_dir)

    def run(label: str, build, mode: str) -> float:
        best = float("inf")
        for _ in range(reps):
            spark.catalog.dropTempView("floor_sink")
            prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
            prev_ndmb = spark.conf.get(
                "spark.sql.streaming.noDataMicroBatches.enabled", "true"
            )
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                sq._STREAM_SHUFFLE_PARTITIONS,
            )
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", "false"
            )
            t0 = time.perf_counter()
            try:
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                )
                q = (
                    build(stream)
                    .writeStream.outputMode(mode)
                    .format("memory")
                    .queryName("floor_sink")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
                spark.conf.set(
                    "spark.sql.streaming.noDataMicroBatches.enabled",
                    prev_ndmb,
                )
            spark.table("floor_sink").count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    floors = {
        # stateless pass-through: per-batch scheduling + file-source
        # listing + memory sink, no shuffle, no state store
        "stateless_passthrough_sec": run(
            "stateless",
            lambda s: s.select("event_id"),
            "append",
        ),
        # minimal stateful: ONE global-ish aggregation → one state
        # round per batch at the suite's 8 state partitions
        "one_agg_stateful_sec": run(
            "stateful",
            lambda s: s.groupBy(F.col("event_type")).count(),
            "complete",
        ),
    }
    floors["sf_dir"] = sf_dir
    floors["reps"] = reps
    floors["state_partitions"] = sq._STREAM_SHUFFLE_PARTITIONS
    print(json.dumps({"metric": "stream_floor", **floors}))
    spark.stop()


if __name__ == "__main__":
    main()
