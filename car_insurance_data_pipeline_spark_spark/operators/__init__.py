from car_insurance_data_pipeline_spark_spark.operators import (
    bloom,
    dedup,
    dq,
    graph,
    keys,
    multimodal,
    similarity,
    tokenizer,
    topn,
)

__all__ = [
    "bloom",
    "dedup",
    "dq",
    "graph",
    "keys",
    "multimodal",
    "similarity",
    "tokenizer",
    "topn",
]
