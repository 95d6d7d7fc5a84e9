from car_insurance_data_pipeline_spark_spark.plans.catalog import (
    all_oracle_sql,
    all_queries,
    get_spec,
    query,
    specs,
)

__all__ = ["all_oracle_sql", "all_queries", "get_spec", "query", "specs"]
