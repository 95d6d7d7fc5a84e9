"""Cleaning-function catalog queries (SURVEY.md §2.8 F1-F5, F19-F22).

The driver only registers the TPC-H-ish fixture tables, so these
queries synthesize the reference's dirty-data pathologies
deterministically FROM those tables (currency-tagged numbers, mixed
date formats, null/negative pollution) and then apply the engine's
cleaning functions. The full insurance pipeline over CSV fixtures is
exercised in tests/test_insurance_pipeline.py.

Determinism note: dirty strings are built via decimal→string casts
('1013.70'), never double→string (whose shortest-repr formatting is
engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.functions.cleaning import (
    currency_to_double,
    null_or_negative_to,
    parse_date_multi,
)
from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table


@query(
    "q25_dirty_cleaning",
    oracle="""
WITH d AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 3 = 0
           THEN CAST(TRY_CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '€'
         WHEN o_orderkey % 3 = 1
           THEN '€' || CAST(TRY_CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
         ELSE '$' || CAST(TRY_CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
    END AS dirty_premium,
    CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
         WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
         ELSE strftime(o_orderdate, '%d-%m-%Y')
    END AS dirty_date
  FROM orders
)
SELECT o_orderkey, dirty_premium,
  TRY_CAST(regexp_replace(trim(dirty_premium), '[€$£,\\s]', '', 'g') AS DOUBLE)
    AS premium,
  COALESCE(
    TRY_CAST(regexp_replace(trim(dirty_premium), '[€]', '', 'g') AS DOUBLE),
    0.0) AS premium_compat,
  dirty_date,
  strftime(CAST(CASE WHEN dirty_date LIKE '____-__-__'
              THEN try_strptime(dirty_date, '%Y-%m-%d')
            WHEN dirty_date LIKE '__-__-____'
              THEN try_strptime(dirty_date, '%d-%m-%Y')
            WHEN dirty_date LIKE '__/__/____'
              THEN try_strptime(dirty_date, '%m/%d/%Y')
       END AS DATE), '%Y-%m-%d') AS parsed_date,
  strftime(CAST(CASE WHEN dirty_date LIKE '____-__-__'
              THEN try_strptime(dirty_date, '%Y-%m-%d')
            WHEN dirty_date LIKE '__-__-____'
              THEN try_strptime(dirty_date, '%d-%m-%Y')
       END AS DATE), '%Y-%m-%d') AS parsed_date_compat
FROM d
""",
)
def q25_dirty_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data cleaning surface in one per-row pass over orders
    (merged r01 q25_currency_clean + q26_multiformat_dates so both
    stay inside the driver's checked-query window).

    Currency (F2) — 02_clean_contracts_data.py:54: ``premium`` is the
    engine default (strips €/$/£/commas); ``premium_compat``
    reproduces the reference exactly: only '€' is stripped, so '$...'
    rows cast to NULL and are coerced to 0.0 (02:86-89) — the
    documented faithful-bug compat mode.

    Dates (F5/P8) — 02:60-65 / 03_clean_multisource_data.py:171-173:
    LIKE-dispatch parsing; ``parsed_date_compat`` reproduces the
    reference's claims cleaner, which lacks the MM/dd/yyyy branch →
    those rows are NULL.
    """
    o = table(spark, sf_dir, "orders")
    d2s = F.col("o_totalprice").try_cast("decimal(18,2)").cast("string")
    dirty_premium = (
        F.when(F.col("o_orderkey") % 3 == 0, F.concat(d2s, F.lit("€")))
        .when(F.col("o_orderkey") % 3 == 1, F.concat(F.lit("€"), d2s))
        .otherwise(F.concat(F.lit("$"), d2s))
    )
    dirty_date = (
        F.when(
            F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd")
        )
        .when(
            F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "MM/dd/yyyy")
        )
        .otherwise(F.date_format("o_orderdate", "dd-MM-yyyy"))
    )
    df = o.select(
        "o_orderkey",
        dirty_premium.alias("dirty_premium"),
        dirty_date.alias("dirty_date"),
    )
    return df.select(
        "o_orderkey",
        "dirty_premium",
        currency_to_double("dirty_premium").alias("premium"),
        F.coalesce(
            currency_to_double("dirty_premium", compat_euro_only=True), F.lit(0.0)
        ).alias("premium_compat"),
        "dirty_date",
        F.date_format(parse_date_multi("dirty_date"), "yyyy-MM-dd").alias(
            "parsed_date"
        ),
        F.date_format(
            parse_date_multi("dirty_date", compat_reference=True), "yyyy-MM-dd"
        ).alias("parsed_date_compat"),
    )


@query(
    "q28_null_negative_coercion",
    oracle="""
WITH d AS (
  SELECT l_orderkey, l_linenumber,
    CASE WHEN l_orderkey % 7 = 0 THEN NULL
         WHEN l_orderkey % 5 = 0 THEN -l_quantity
         ELSE l_quantity END AS dirty_qty
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, dirty_qty,
  CASE WHEN dirty_qty IS NULL OR dirty_qty < 0 THEN 0.0
       ELSE dirty_qty END AS clean_qty
FROM d
""",
)
def q28_null_negative_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/negative coercion (F21/P10) —
    02_clean_contracts_data.py:86-89 (isNull | < 0 → 0.0)."""
    li = table(spark, sf_dir, "lineitem")
    dirty = (
        F.when(F.col("l_orderkey") % 7 == 0, F.lit(None).cast("double"))
        .when(F.col("l_orderkey") % 5 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
    )
    df = li.select("l_orderkey", "l_linenumber", dirty.alias("dirty_qty"))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        "dirty_qty",
        null_or_negative_to("dirty_qty", 0.0).alias("clean_qty"),
    )


@query(
    "q66_telematics_parsing",
    oracle="""
WITH packed AS (
  SELECT event_id, ts,
    CAST(TRY_CAST(value / 10.0 - 24.5 AS DECIMAL(12,6)) AS VARCHAR) || ',' ||
    CAST(TRY_CAST(value / 3.0 + 1.0 AS DECIMAL(12,6)) AS VARCHAR) || ',' ||
    CAST(TRY_CAST(value AS DECIMAL(12,1)) AS VARCHAR) AS gps
  FROM events
)
SELECT event_id, gps,
  TRY_CAST(string_split(gps, ',')[1] AS DOUBLE) AS latitude,
  TRY_CAST(string_split(gps, ',')[2] AS DOUBLE) AS longitude,
  TRY_CAST(string_split(gps, ',')[3] AS DOUBLE) AS altitude,
  epoch_us(ts) // 1000000 AS epoch_s,
  strftime(make_timestamp((epoch_us(ts) // 1000000) * 1000000),
           '%Y-%m-%d %H:%M:%S') AS event_time_str
FROM packed
""",
)
def q66_telematics_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telematics polymorphic-value parsing in one per-row pass over
    events (merged r01 q66_packed_gps_split + q67_epoch_roundtrip so
    both stay inside the driver's checked-query window).

    GPS (F3) — the 'lat,lon,alt' packed column
    (03_clean_multisource_data.py:230, 240-244), built
    deterministically from events via decimal→string formatting and
    split back with the engine cleaner. Epoch (F6/F12) — the
    timeMili path (03:229), second granularity, rendered as a string
    for engine-neutral hashing.
    """
    from car_insurance_data_pipeline_spark_spark.functions.cleaning import (
        split_packed_gps,
    )
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    e = events_with_us(spark, sf_dir)
    packed = F.concat_ws(
        ",",
        (F.col("value") / 10.0 - 24.5).try_cast("decimal(12,6)").cast("string"),
        (F.col("value") / 3.0 + 1.0).try_cast("decimal(12,6)").cast("string"),
        F.col("value").try_cast("decimal(12,1)").cast("string"),
    )
    df = e.select("event_id", "ts_us", packed.alias("gps"))
    lat, lon, alt = split_packed_gps("gps")
    epoch_s = F.expr("ts_us div 1000000")
    ts = F.timestamp_seconds(epoch_s).cast("timestamp_ntz")
    return df.select(
        "event_id",
        "gps",
        lat.alias("latitude"),
        lon.alias("longitude"),
        alt.alias("altitude"),
        epoch_s.alias("epoch_s"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("event_time_str"),
    )
