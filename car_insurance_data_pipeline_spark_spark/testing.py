"""Oracle-parity harness mirroring the driver's correctness gate.

The driver runs each catalog query on Spark AND its DuckDB oracle SQL
over the same parquet fixtures, then compares row-count + schema +
order-insensitive value hash. This module reproduces that comparison
locally (with better diagnostics) so parity breaks are caught in
pytest before a round is submitted.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values (None-safe) —
    the order-insensitive normal form both engines are reduced to."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            # rebuild with dtype=object explicitly: Series.map would
            # RE-INFER the dtype, silently coercing [1, None] ->
            # float64 [1.0, nan] and erasing exactly the int-vs-float
            # representation the driver's value hash distinguishes
            out[c] = pd.Series(
                [None if v is None else v for v in out[c]],
                dtype=object,
                index=out.index,
            )
    key = out.astype(str)
    order = key.sort_values(by=list(out.columns), kind="mergesort").index
    return out.loc[order].reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    row_match: bool
    schema_match: bool
    values_match: bool
    detail: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.row_match and self.schema_match and self.values_match


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return (a is None or (isinstance(a, float) and math.isnan(a))) and (
                b is None or (isinstance(b, float) and math.isnan(b))
            )
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


# dtype kinds the driver's value hash distinguishes: an int64 28740
# and a float64 28740.0 hash DIFFERENTLY (round-7's q232 red row),
# so in strict mode an integer-vs-float column pairing is a failure
# even when every value compares numerically equal.
_INT_KINDS = frozenset("iu")
_FLOAT_KINDS = frozenset("f")
_BOOL_KINDS = frozenset("b")


def _representation_drift(sk: str, ok_: str) -> str | None:
    """Classify a (spark, oracle) dtype-kind pair that the local
    numeric normalization would accept but the driver's raw value
    hash would not. Returns a reason string, or None when safe."""
    pair = {sk, ok_}
    if pair & _INT_KINDS and pair & _FLOAT_KINDS:
        return "int-vs-float"
    if pair & _BOOL_KINDS and pair & (_INT_KINDS | _FLOAT_KINDS):
        return "bool-vs-numeric"
    return None


def _strict_value_drift(x, y) -> bool:
    """True when two numerically-equal values would hash differently
    under the driver's raw value hash (int 28740 vs float 28740.0,
    bool True vs int 1)."""
    if x is None or y is None:
        return False
    xb, yb = isinstance(x, bool), isinstance(y, bool)
    if xb != yb and (_is_number(y) if xb else _is_number(x)):
        return True
    if xb or yb:
        return False
    if _is_number(x) and _is_number(y):
        return _is_float(x) != _is_float(y)
    return False


def _is_number(v) -> bool:
    import numpy as np

    return isinstance(v, (int, float, np.integer, np.floating))


def _is_float(v) -> bool:
    import numpy as np

    return isinstance(v, (float, np.floating))


def compare_frames(
    name: str,
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    strict: bool = False,
) -> CompareResult:
    detail: list[str] = []
    row_match = len(spark_pdf) == len(oracle_pdf)
    if not row_match:
        detail.append(f"rows: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")

    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    schema_match = s_cols == o_cols
    if not schema_match:
        detail.append(f"columns: spark={s_cols} oracle={o_cols}")
    else:
        s = canonicalize(spark_pdf)
        o = canonicalize(oracle_pdf)
        for c in s.columns:
            sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
            norm = {"i": "num", "u": "num", "f": "num"}
            if norm.get(sk, sk) != norm.get(ok_, ok_) and not (
                {sk, ok_} <= {"O", "b"} or {sk, ok_} <= {"O", "M"}
            ):
                schema_match = False
                detail.append(f"dtype[{c}]: spark={s[c].dtype} oracle={o[c].dtype}")
            # exact dtype mismatch (int32 vs int64 etc.) is recorded as
            # a warning but not a failure — the driver hashes values.
            elif sk != ok_ or s[c].dtype != o[c].dtype:
                drift = _representation_drift(sk, ok_)
                if strict and drift is not None:
                    schema_match = False
                    detail.append(
                        f"strict-drift[{c}] ({drift}): spark={s[c].dtype} "
                        f"oracle={o[c].dtype} — driver hashes raw values, "
                        f"28740 != 28740.0; cast the oracle projection"
                    )
                else:
                    detail.append(
                        f"dtype-warn[{c}]: spark={s[c].dtype} oracle={o[c].dtype}"
                    )

    values_match = row_match and schema_match
    if values_match and len(spark_pdf):
        s = canonicalize(spark_pdf)
        o = canonicalize(oracle_pdf)
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            bad = [
                (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
            ]
            if not bad and strict:
                # object columns can hide per-value int-vs-float drift
                # that the dtype-kind check above cannot see
                bad = [
                    (i, x, y)
                    for i, (x, y) in enumerate(zip(sv, ov))
                    if _strict_value_drift(x, y)
                ]
            if bad:
                values_match = False
                i, x, y = bad[0]
                detail.append(
                    f"values[{c}]: {len(bad)}/{len(sv)} differ; first at row {i}: "
                    f"spark={x!r} oracle={y!r}"
                )
    return CompareResult(name, row_match, schema_match, values_match, detail)


def compare_query(
    name: str,
    spark,
    sf_dir: str,
    con: duckdb.DuckDBPyConnection | None = None,
    strict: bool = False,
) -> CompareResult:
    """Run catalog query ``name`` on Spark and its oracle on DuckDB
    over ``sf_dir`` and compare."""
    from car_insurance_data_pipeline_spark_spark.plans.catalog import get_spec

    spec = get_spec(name)
    if spec.oracle is None:
        raise ValueError(f"{name} has no oracle (rows-only)")
    own = con is None
    if own:
        con = duckdb_connect(sf_dir)
    try:
        spark_pdf = spec.fn(spark, sf_dir).toPandas()
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        if own:
            con.close()
    return compare_frames(name, spark_pdf, oracle_pdf, strict=strict)
