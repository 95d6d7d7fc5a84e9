"""Data-quality validation as a report DataFrame (SURVEY.md §2.11 X5).

The reference's 06_validate_data_quality.py prints [OK]/[WARN] lines;
here validation is a reusable operator returning an assertable
DataFrame (check, metric, value, status), so it composes with sinks
and alerting instead of stdout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ValidationRules:
    """Declarative DQ rules for one table."""

    min_rows: int = 1
    not_null: list[str] = field(default_factory=list)
    positive: list[str] = field(default_factory=list)
    stats: list[str] = field(default_factory=list)  # sum/avg/min/max reported


def validate(df: DataFrame, rules: ValidationRules) -> DataFrame:
    """Run all rules in ONE aggregation pass (the reference re-scans
    per check; at 100 TB every extra pass matters).

    Returns rows (check string, metric string, value double, status
    'OK'|'WARN').
    """
    aggs = [F.count("*").cast("double").alias("__n")]
    for c in rules.not_null:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double")
            .alias(f"__null__{c}")
        )
    for c in rules.positive:
        aggs.append(
            F.sum(F.when(F.col(c) < 0, 1).otherwise(0))
            .cast("double")
            .alias(f"__neg__{c}")
        )
    for c in rules.stats:
        aggs += [
            F.sum(F.col(c).try_cast("decimal(27,6)")).cast("double").alias(f"__sum__{c}"),
            F.min(c).cast("double").alias(f"__min__{c}"),
            F.max(c).cast("double").alias(f"__max__{c}"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()

    spark = df.sparkSession
    n = row["__n"]
    out: list[tuple[str, str, float, str]] = [
        ("row_count", "rows", n, "OK" if n >= rules.min_rows else "WARN")
    ]
    for c in rules.not_null:
        v = row[f"__null__{c}"]
        out.append(("not_null", c, v, "OK" if v == 0 else "WARN"))
    for c in rules.positive:
        v = row[f"__neg__{c}"]
        out.append(("non_negative", c, v, "OK" if v == 0 else "WARN"))
    for c in rules.stats:
        s = row[f"__sum__{c}"]
        # s is None when the column is entirely NULL / unparseable —
        # the report flags it (WARN) instead of crashing on None / n.
        status = "OK" if s is not None else "WARN"
        out.append(("sum", c, s, status))
        out.append(("min", c, row[f"__min__{c}"], status))
        out.append(("max", c, row[f"__max__{c}"], status))
        out.append(("avg", c, (s / n) if (n and s is not None) else None, status))
    return spark.createDataFrame(
        out, "check string, metric string, value double, status string"
    )
