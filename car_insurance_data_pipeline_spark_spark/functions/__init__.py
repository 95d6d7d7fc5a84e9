from car_insurance_data_pipeline_spark_spark.functions import (
    cleaning,
    dates,
    geo,
    text,
    vectors,
)

__all__ = ["cleaning", "dates", "geo", "text", "vectors"]
