"""Session factory (SURVEY.md §2.11 X1/X3).

The reference builds a session per numbered script
(e.g. /root/reference/scripts/02_clean_contracts_data.py:25-32); here one
factory centralizes scale-aware defaults:

- AQE on (runtime re-plan, skew-join handling, partition coalescing)
- Arrow on (vectorized pandas interchange for the few Pandas-UDF ops)
- UTC session timezone (deterministic date semantics vs. the oracle)
- shuffle partitions sized to local cores (overridable; on a real
  cluster this is set to ~2-3x total executor cores)

Engine code NEVER depends on session-level conf for correctness: all
queries use try_cast/try_to_timestamp-style expressions so they behave
identically under ANSI mode (Spark 4 default) and legacy mode, and under
any session timezone when the host is UTC.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "car_insurance_data_pipeline_spark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Nanosecond parquet timestamps read as int64 nanos from the
        # FIRST read — set here (not lazily by the first events query)
        # so dtype behavior never depends on query execution order.
        # events_with_us() also sets it at runtime for externally
        # created sessions (e.g. the verification driver's).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_session(spark: SparkSession) -> None:
    """Teardown (reference: scripts/11_cleanup_spark_session.py:25-41)."""
    spark.stop()
