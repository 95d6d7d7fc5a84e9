"""Query catalog: named queries + DuckDB oracle SQL.

Every operator from SURVEY.md §2 (and the north-star extensions) is
registered here as a named query over the driver's fixture tables
(/root/testdata/sf*/ — region nation customer supplier part orders
lineitem events documents embeddings). The driver runs the Spark
query and the oracle SQL side by side at sf=0.01 and compares
row-count + schema + order-insensitive value hash.

Cross-engine determinism rules used throughout the catalog:

- Money sums go through decimal: ``sum(try_cast(x AS DECIMAL(18,2)))``
  then cast to double. Decimal addition is exact and
  order-independent, so Spark and DuckDB produce bit-identical
  doubles no matter how partial aggregation is scheduled. A raw
  ``sum(double)`` is order-dependent and WILL hash-mismatch.
- Averages are computed as (exact decimal sum cast to double) /
  count — division of identical doubles is deterministic.
- Time arithmetic uses integer epoch micros (unix_micros /
  epoch_us), never float seconds.
- Window orderings always include a unique tie-break key.
- Every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a catalog query. ``oracle`` is the DuckDB-flavored
    ANSI SQL equivalent; omit only for genuinely non-SQL-expressible
    operators (the driver then records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect registration; kept lazy so importing the
    # package root stays cheap.
    from car_insurance_data_pipeline_spark_spark.plans import (  # noqa: F401
        cleaning_queries,
        relational,
        relational_ext,
        textops,
        textops2,
        vectorops,
    )


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    return specs()[name]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in specs().items()}


def all_oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in specs().items() if s.oracle is not None}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table (columnar Parquet scan, pushdown-capable)."""
    from car_insurance_data_pipeline_spark_spark.sources.readers import read_table

    return read_table(spark, sf_dir, name)
