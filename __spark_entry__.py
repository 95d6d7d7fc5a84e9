"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(car_insurance_data_pipeline_spark_spark.plans.catalog): every
implemented operator from SURVEY.md §2 (plus the north-star dedup /
similarity / text / multimodal extensions) is registered there as a
named query with, where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from car_insurance_data_pipeline_spark_spark.plans.catalog import (
    all_oracle_sql,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: customer-segment
    revenue analytics (join + agg + sort; the shape of the reference's
    10_analyze_customer_segments.py)."""
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        q02_market_segment_revenue,
    )

    return q02_market_segment_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only entries (hash-based
    signatures, approximate ANN, Pandas-UDF variants) are omitted and
    instead cross-checked in tests/."""
    return all_oracle_sql()
