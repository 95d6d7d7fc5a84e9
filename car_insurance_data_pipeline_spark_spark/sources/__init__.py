from car_insurance_data_pipeline_spark_spark.sources.readers import (
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_table,
)
from car_insurance_data_pipeline_spark_spark.sources.writers import (
    write_jdbc,
    write_json,
    write_orc,
    write_parquet,
    write_table,
)

__all__ = [
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_table",
    "write_jdbc",
    "write_json",
    "write_orc",
    "write_parquet",
    "write_table",
]
