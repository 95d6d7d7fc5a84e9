"""Driver-faithful strict mode for the oracle mirror (round-8 brief #2).

Round 7's only red driver row (q232) was an int64-vs-float64
representation drift: the DuckDB oracle's final projection emitted
uncast window SUMs (HUGEINT -> fetchdf float64 ``28740.0``) while
Spark emitted int64 ``28740``. The driver hashes raw values so it
failed; the local mirror normalized int/float dtype kinds so it could
NEVER fail. ``compare_frames(strict=True)`` closes that blind spot;
these tests prove it by deliberate mutation.
"""

from __future__ import annotations

import pandas as pd

from car_insurance_data_pipeline_spark_spark.plans.catalog import get_spec
from car_insurance_data_pipeline_spark_spark.testing import (
    compare_frames,
    duckdb_connect,
)


def test_strict_fails_int_vs_float_column():
    spark_pdf = pd.DataFrame({"grp": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    oracle_pdf = pd.DataFrame({"grp": ["a", "b"], "n": [1.0, 2.0]})
    assert compare_frames("t", spark_pdf, oracle_pdf).ok
    res = compare_frames("t", spark_pdf, oracle_pdf, strict=True)
    assert not res.ok
    assert any("strict-drift[n]" in d for d in res.detail)


def test_strict_fails_bool_vs_int_column():
    # lenient mode already rejects this at the dtype check ('b' is not
    # normalized to "num"); strict must reject it too
    spark_pdf = pd.DataFrame({"f": [True, False]})
    oracle_pdf = pd.DataFrame({"f": pd.array([1, 0], dtype="int64")})
    assert not compare_frames("t", spark_pdf, oracle_pdf).ok
    assert not compare_frames("t", spark_pdf, oracle_pdf, strict=True).ok


def test_strict_fails_object_column_value_drift():
    # object dtype on both sides hides the drift from the dtype-kind
    # check; the per-value pass must still catch it
    spark_pdf = pd.DataFrame({"v": pd.Series([1, None], dtype=object)})
    oracle_pdf = pd.DataFrame({"v": pd.Series([1.0, None], dtype=object)})
    assert compare_frames("t", spark_pdf, oracle_pdf).ok
    res = compare_frames("t", spark_pdf, oracle_pdf, strict=True)
    assert not res.ok


def test_strict_passes_matching_dtypes():
    a = pd.DataFrame({"x": pd.array([3, 4], dtype="int64"), "y": [0.5, 1.5]})
    b = pd.DataFrame({"x": pd.array([3, 4], dtype="int64"), "y": [0.5, 1.5]})
    assert compare_frames("t", a, b, strict=True).ok


def test_strict_tolerates_int_width_drift():
    # int32 vs int64 hashes the same raw value (28740 == 28740);
    # only the int-vs-float representation class must fail
    a = pd.DataFrame({"x": pd.array([3, 4], dtype="int32")})
    b = pd.DataFrame({"x": pd.array([3, 4], dtype="int64")})
    assert compare_frames("t", a, b, strict=True).ok


def test_q232_mutation_caught_by_strict(spark, sf_dir):
    """Re-introduce round 7's exact oracle bug (drop the BIGINT casts
    from the final projection) and assert the strict mirror now FAILS
    where the old mirror passed — then assert the shipped oracle is
    strict-green."""
    spec = get_spec("q232_best_split_gini")
    fixed = spec.oracle
    assert "CAST(ln_ AS BIGINT) AS n_left" in fixed
    broken = fixed.replace(
        "CAST(ln_ AS BIGINT) AS n_left, CAST(tn - ln_ AS BIGINT) AS n_right",
        "ln_ AS n_left, tn - ln_ AS n_right",
    )
    assert broken != fixed
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        broken_pdf = con.execute(broken).fetchdf()
        fixed_pdf = con.execute(fixed).fetchdf()
    finally:
        con.close()
    # the round-7 mirror verdict: lenient mode passes the broken oracle
    assert compare_frames("q232", spark_pdf, broken_pdf).ok
    # the driver's verdict: strict mode fails it
    res = compare_frames("q232", spark_pdf, broken_pdf, strict=True)
    assert not res.ok, "strict mirror must catch the HUGEINT escape"
    # and the shipped (cast) oracle is green under strict
    assert compare_frames("q232", spark_pdf, fixed_pdf, strict=True).ok
