"""Mirror of the driver's t2 correctness gate: every catalog query
with an oracle must match DuckDB on row-count + schema + values at
sf=0.01. Rows-only queries are smoke-checked for shape/determinism.
"""

from __future__ import annotations

import pytest

from car_insurance_data_pipeline_spark_spark.plans.catalog import specs
from car_insurance_data_pipeline_spark_spark.testing import compare_query

ALL_SPECS = specs()
WITH_ORACLE = sorted(n for n, s in ALL_SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in ALL_SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir):
    # strict=True replicates the driver's raw value hash semantics:
    # an int64 28740 and a float64 28740.0 are a FAILURE even though
    # they compare numerically equal (round-7's q232 red row — the
    # mirror's numeric normalization was blind to exactly the class
    # the driver checks)
    res = compare_query(name, spark, sf_dir, strict=True)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    df = ALL_SPECS[name].fn(spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_queries_oracle_keys_align():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_driver_window_is_all_oracle_bearing():
    """The verification driver hard-checks only the FIRST 50
    registered queries (registration order is part of the contract —
    plans/catalog.py:_PRIORITY). Every slot in that window must carry
    an oracle; a rows-only query inside the window would waste a
    hard-signal slot, and an oracle query pushed past 50 silently
    loses its driver row. Oracle-bearing queries parked beyond the
    window stay covered by the parametrized mirror above.

    Round-11 (r10 verdict #4): the composition is GENERATED —
    tools/rotate_window.py encodes the slot policy (new-with-
    growth-rule > plan-changed-since-last-driver-row >
    oldest-proof) and writes both the catalog prefix and the
    committed expectation (plans/window_expect.py). This pin
    asserts the live registration order equals that expectation
    EXACTLY, so a hand-edit of catalog.py that strands a changed
    plan (or evicts a growth-rule entry) fails here instead of
    silently costing a driver row."""
    from car_insurance_data_pipeline_spark_spark.plans import window_expect as we

    names = list(ALL_SPECS)
    window = names[:50]
    assert window == we.WINDOW
    rows_only_in_window = [n for n in window if not ALL_SPECS[n].oracle]
    assert rows_only_in_window == []
    # the growth rule and the plan-changed rule, re-asserted from
    # the expectation's own records
    for n in we.NEW:
        assert n in window, f"growth-rule entry evicted: {n}"
    for n in we.PLAN_CHANGED:
        assert n in window, f"changed plan stranded without a row: {n}"
