from car_insurance_data_pipeline_spark_spark.operators import (
    dedup,
    dq,
    keys,
    multimodal,
    similarity,
)

__all__ = ["dedup", "dq", "keys", "multimodal", "similarity"]
