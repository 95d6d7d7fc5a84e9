"""Streaming catalog query: batch-equivalent sessionization.

Puts Structured Streaming (SURVEY.md §2.9) under the driver's hard
correctness signal: the events fixture is driven through a REAL
streaming query (readStream → session_window aggregation → memory
sink, availableNow trigger), and the result is oracle-checked
against a batch SQL formulation of the same session semantics.

Session semantics: Spark's session_window(ts, gap) merges an event
into the current session iff its timestamp is STRICTLY inside the
previous event's [t, t + gap) extension — i.e. a gap >= 30 min
starts a new session. The oracle mirrors that with a lag-window
cumulative-sum formulation (strict >= on the gap).

Scale: session-window state partitions by user_id and is bounded by
the watermark; the memory sink + availableNow trigger exist for the
verification path — a deployment points the same DataFrame at a
kafka/delta sink with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.plans.catalog import query

_GAP = "30 minutes"


@query(
    "q71_streaming_sessions",
    oracle="""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
  SELECT user_id, ts_us,
    SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id,
  MIN(ts_us) AS session_start_us,
  COUNT(*) AS n_events,
  MAX(ts_us) - MIN(ts_us) AS duration_us
FROM s
GROUP BY user_id, sid
""",
)
def q71_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization driven to completion inside the call:
    file-source stream over the events parquet → session_window
    (30-min gap) per user → complete-mode memory sink. Returns the
    materialized session table; the oracle is the equivalent batch
    formulation, so the streaming engine's windows are value-checked,
    not just smoke-tested.

    Complete output mode is used deliberately: with availableNow the
    watermark never passes the final sessions, so append mode would
    drop them; complete emits every closed-and-open session, which is
    exactly the batch answer once the source is exhausted.
    """
    # ts is nanosecond parquet — same conf contract as events_with_us
    # (a no-op for sessions built by get_session, which sets it up
    # front).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema  # metadata-only batch read
    # The file source requires a DIRECTORY base path; stream the
    # fixture dir with a glob filter selecting the events file.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # timestamp_micros builds an absolute instant (TimestampType) —
    # no ntz round trip, so the session timezone of the (possibly
    # externally created) session can never shift the arithmetic.
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    sessions = (
        stream.withColumn("event_ts", ts)
        .groupBy(F.session_window("event_ts", _GAP).alias("win"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_ts").alias("first_ts"),
            F.max("event_ts").alias("last_ts"),
        )
    )
    # Fixed sink name + drop-after-materialize: a per-call uuid name
    # would leave every invocation's complete-mode result pinned in
    # driver memory for the session's lifetime.
    sink = "q71_sessions"
    spark.catalog.dropTempView(sink)
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(sink).select(
        "user_id",
        F.unix_micros("first_ts").alias("session_start_us"),
        "n_events",
        (F.unix_micros("last_ts") - F.unix_micros("first_ts")).alias(
            "duration_us"
        ),
    )
    # localCheckpoint decouples the result from the memory sink so the
    # temp view can be dropped immediately; the checkpoint blocks are
    # released by the ContextCleaner when the DataFrame is dropped.
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


@query(
    "q80_streaming_window_counts",
    oracle="""
SELECT user_id,
  (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
  COUNT(*) AS n_events
FROM events
GROUP BY user_id, (epoch_us(ts) // 3600000000) * 3600000000
""",
)
def q80_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation under the oracle: the
    events fixture streamed through readStream → 1-hour window
    groupBy → complete-mode memory sink (availableNow), checked
    against the batch hour-bucket SQL. Complements q71 (session
    windows): together the two cover Structured Streaming's
    time-window aggregation surface with value-level verification.

    Scale: window-aggregation state partitions by (user, window) and
    is bounded by the watermark in a live deployment; the memory
    sink exists for verification — production points the same frame
    at a kafka/delta sink.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    counts = (
        stream.withColumn("event_ts", ts)
        .groupBy(F.window("event_ts", "1 hour").alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    sink = "q80_window_counts"
    spark.catalog.dropTempView(sink)
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(sink).select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("window_start_us"),
        "n_events",
    )
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
