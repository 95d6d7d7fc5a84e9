"""car_insurance_data_pipeline_spark_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference pipeline (satyadeep11singh/
car-insurance-data-pipeline-spark, surveyed in /root/repo/SURVEY.md), plus
the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) required by the north star.

Design stance (SURVEY.md §7): a library-style engine — declarative
source specs, reusable cleaning/modeling/analytics operators, one
session factory, DataFrame + SQL surfaces. Everything is public-API
Spark; the logical plan is declared with the DataFrame API and
Catalyst/Tungsten/AQE pick the physical strategy.
"""

from car_insurance_data_pipeline_spark_spark.session import get_session, stop_session

__all__ = ["get_session", "stop_session"]
__version__ = "0.1.0"
