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
    window stay covered by the parametrized mirror above."""
    names = list(ALL_SPECS)
    window = names[:50]
    rows_only_in_window = [n for n in window if not ALL_SPECS[n].oracle]
    assert rows_only_in_window == []
    # round-10 rotation (r9 verdict #1+#2): the window leads with the
    # 7-query provenance-queue remainder (q360-q366 — takes the queue
    # to zero), then the 23 queries whose static plans changed in the
    # round-9 de-hinting sweep but carried pre-change driver rows,
    # then 20 refresh slots (q178 drift watch + oldest-proof r1/r2
    # queries). Parked queries stay covered by the mirror above.
    overflow = [f"q{i}_" for i in range(360, 367)]
    for prefix in overflow:
        assert any(n.startswith(prefix) for n in window[:7]), prefix
    dehinted = [
        "q02_", "q08_", "q65_", "q105_", "q135_", "q161_", "q170_",
        "q216_", "q217_", "q228_", "q239_", "q240_", "q241_", "q243_",
        "q244_", "q245_", "q246_", "q247_", "q248_", "q279_", "q299_",
        "q303_", "q345_",
    ]
    for prefix in dehinted:
        assert any(n.startswith(prefix) for n in window), prefix
    assert any(n.startswith("q178_") for n in window)
    # round-10 new entries: post-freeze growth ships with
    # same-round driver rows, so all three hold window slots
    for prefix in ("q367_", "q368_", "q369_"):
        assert any(n.startswith(prefix) for n in window), prefix
