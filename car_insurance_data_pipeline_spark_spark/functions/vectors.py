"""Vector/embedding functions for similarity search.

Built-in higher-order functions (zip_with/aggregate) keep the dot
product JVM-side; no Python round trip per row. For very wide
vectors or batched model scoring, the Pandas-UDF path in
operators/similarity.py is the Arrow-vectorized alternative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def with_vector_dim(df, vec_col: str, dim: int):
    """Stamp the vector width into the column's schema metadata
    (key ``"dim"``) so downstream dispatchers (cosine_topk auto) can
    read it WITHOUT running a job — array columns carry no length in
    their Spark type. Pure projection: no data moves.
    """
    cols = [
        F.col(c).alias(c, metadata={"dim": int(dim)}) if c == vec_col else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def vector_dim_from_schema(df, vec_col: str) -> int | None:
    """Read a ``with_vector_dim`` stamp back off the schema; None when
    the column carries no dim metadata."""
    try:
        meta = df.schema[vec_col].metadata or {}
    except KeyError:
        return None
    d = meta.get("dim")
    return int(d) if d is not None else None


def random_hyperplane_bucket(a: Column | str, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = 1 iff dot(a, planes[b]) >= 0.

    ``planes`` are driver-provided (seeded numpy), embedded as array
    literals — deterministic and broadcast with the plan, so bucket
    assignment is a narrow map at any scale.
    """
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(a, plane_col) >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return bucket
