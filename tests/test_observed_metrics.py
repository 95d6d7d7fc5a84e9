"""observe_rules: DQ counters ride the caller's OWN action (a write,
a count) as observed metrics — no dedicated validation scan — and the
resulting report matches the dedicated-pass ``validate`` exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.operators.dq import (
    ValidationRules,
    observation_report,
    observe_rules,
    validate,
)


RULES = ValidationRules(
    min_rows=10,
    not_null=["doc_id", "lang"],
    positive=["n_chars"],
)


def test_metrics_materialize_on_the_export_write(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed, obs = observe_rules(docs, RULES)
    # the ONLY action is the export itself — validation rides along
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["__n"] == docs.count()
    assert m["__null__doc_id"] == 0.0
    assert m["__neg__n_chars"] == 0.0
    # and the export is untouched by the observation
    assert spark.read.parquet(str(tmp_path / "out")).count() == m["__n"]


def test_report_matches_dedicated_validate_pass(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed, obs = observe_rules(docs, RULES)
    observed.count()
    via_obs = {
        (r.check, r.metric): (r.value, r.status)
        for r in observation_report(spark, obs.get, RULES).collect()
    }
    via_validate = {
        (r.check, r.metric): (r.value, r.status)
        for r in validate(docs, RULES).collect()
    }
    assert via_obs == via_validate


def test_warn_statuses_propagate(spark):
    df = spark.createDataFrame(
        [(1, None, -5.0), (2, "x", 3.0)], "id long, k string, v double"
    )
    observed, obs = observe_rules(
        df, ValidationRules(min_rows=10, not_null=["k"], positive=["v"])
    )
    observed.count()
    rows = {
        (r.check, r.metric): r.status
        for r in observation_report(
            spark, obs.get, ValidationRules(
                min_rows=10, not_null=["k"], positive=["v"]
            )
        ).collect()
    }
    assert rows[("row_count", "rows")] == "WARN"  # 2 < 10
    assert rows[("not_null", "k")] == "WARN"
    assert rows[("non_negative", "v")] == "WARN"
