"""Structured Streaming variant of the telematics path (SURVEY.md
§2.9 — an explicit parity-plus extension; the reference processes
events strictly in batch).

Same cleaning/scoring Column expressions as plans/insurance.py, but
over readStream with event-time watermarks:

- tumbling/sliding window aggregation (F.window)
- session windows (F.session_window)
- late-data handling via withWatermark
- memory-sink smoke runner for tests (processAllAvailable drives a
  parquet directory through the streaming engine synchronously)

Scale: per-device state partitions by deviceId; watermark bounds
state size; sinks would be kafka/delta in production — the memory
sink is for deterministic tests only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_stream(
    spark: SparkSession, path: str, schema: StructType, max_files: int = 16
) -> DataFrame:
    """File-source stream over a parquet directory (stands in for the
    kafka/kinesis source a deployment would use)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "deviceId",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) window counts + value stats per device,
    watermarked for late data."""
    w = (
        F.window(ts_col, window, slide)
        if slide
        else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("variable") == "POSITION", 1).otherwise(0)).alias(
                "n_position"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "n_position",
        )
    )


def session_event_counts(
    events: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "deviceId",
    gap: str = "30 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session-window aggregation (dynamic gap-based windows) — the
    streaming form of the batch sessionization in q24."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def write_stream_idempotent(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_col: str = "batch_id",
    **trigger,
):
    """Exactly-once file sink via foreachBatch: each micro-batch
    overwrites ITS OWN partition directory (dynamic partition
    overwrite keyed by batch id), so a replayed batch after failure
    rewrites the same partition instead of duplicating rows — the
    standard idempotent-sink pattern for non-transactional targets.

    CONTRACT: ``out_dir`` is owned by ``checkpoint_dir`` — batch ids
    are only unique per checkpoint, so pairing an existing out_dir
    with a fresh checkpoint would strand stale high-numbered
    partitions next to new data. That pairing is rejected here.

    ``trigger`` kwargs pass through to ``writeStream.trigger``
    (default ``availableNow=True`` — override with e.g.
    ``processingTime="10 seconds"`` for a continuous query).
    Returns the started StreamingQuery (caller stops/awaits).
    """
    if partition_col in stream_df.columns:
        raise ValueError(
            f"partition_col {partition_col!r} collides with an input column; "
            "pass a different name"
        )

    def _fs_exists(path: str) -> bool:
        # Hadoop FS API: works for s3a://, hdfs://, file:, ... —
        # a driver-local os.path.exists would silently skip the guard
        # for any non-local filesystem.
        spark = stream_df.sparkSession
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(hpath)

    if _fs_exists(out_dir) and not _fs_exists(checkpoint_dir):
        raise ValueError(
            f"out_dir {out_dir!r} exists but checkpoint_dir "
            f"{checkpoint_dir!r} does not: batch ids would restart at 0 and "
            "leave stale partitions. Clear the output or reuse the original "
            "checkpoint."
        )
    if not trigger:
        trigger = {"availableNow": True}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(partition_col, F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion over the files currently
    in the source directory and leave results in the in-memory table
    ``name``. Returns the stopped query."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    ).start()
    q.awaitTermination()
    return q
