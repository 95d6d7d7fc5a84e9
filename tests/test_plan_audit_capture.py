"""The plan-audit action intercept (round-8 verdict #3/#4) must keep
capturing pre-action plans for driver-recurrence queries. It broke
silently once during development: patching the public
``pyspark.sql.DataFrame`` facade intercepts NOTHING in PySpark 4
because the classic DataFrame overrides every action — the tool now
patches the concrete class, and this test pins that fact so a
PySpark upgrade or refactor can't quietly re-open the audit blind
spot (an all-zero PLAN_AUDIT row hiding a forced broadcast)."""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(_REPO, "tools", "plan_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_action_intercept_captures_executed_plans(spark):
    pa = _load_tool()
    captured: list[str] = []
    # build a frame with a real exchange so the captured plan is
    # recognizably distributed
    from pyspark.sql import functions as F

    agg = (
        spark.range(0, 1000)
        .select((F.col("id") % 7).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )
    with pa.capture_action_plans(captured):
        rows = agg.collect()
        n = agg.count()
    assert len(rows) == 7 and n == 7  # actions still ran
    assert len(captured) == 2, captured
    assert any("Exchange" in p or "AdaptiveSparkPlan" in p for p in captured)
    # the patch must be fully unwound afterwards: actions run
    # OUTSIDE any capture window must append to no list. Prove it by
    # holding a reference to a list that a leaked patch would write
    # into — enter/exit a window with `extra`, then act outside it.
    extra: list[str] = []
    with pa.capture_action_plans(extra):
        pass
    n_inside = len(extra)
    agg.count()  # outside any capture window
    assert len(extra) == n_inside == 0
    # ... and a leak from the FIRST window would write into
    # `captured` (its wrapper closes over that list), which the
    # `extra` check above cannot see — re-assert `captured` is
    # unchanged after the outside-window action so a leak from
    # EITHER window fails here.
    assert len(captured) == 2, captured


def test_driver_recurrence_query_shows_action_plans(spark):
    """End-to-end: q355 (bounded MM recurrence over a collected duel
    matrix) must expose at least one pre-collect distributed plan
    with an exchange — the exact row class that was all-zero in the
    round-8 PLAN_AUDIT."""
    pa = _load_tool()
    from car_insurance_data_pipeline_spark_spark.plans.catalog import (
        all_queries,
    )

    captured: list[str] = []
    with pa.capture_action_plans(captured):
        all_queries()["q355_bradley_terry"](spark, "/root/testdata/sf0.001")
    assert captured, "q355 built without any captured action plan"
    assert any("Exchange" in p for p in captured), (
        "pre-collect plans captured but none shows distributed work"
    )
