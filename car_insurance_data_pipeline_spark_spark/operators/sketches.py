"""Bounded-size cardinality sketches.

KMV (k-minimum values, Bar-Yossef et al. RANDOM'02 — public
literature): hash every distinct value to a uniform draw, keep the k
smallest hashes; the k-th smallest normalized hash U(k) estimates the
cardinality as (k-1)/U(k). Uniformity comes from the catalog-wide
md5-hex trick (round-5 discipline): lowercase hex orders
lexicographically exactly as the underlying 128-bit integer, so "the
k smallest hex strings" IS "the k smallest uniform draws" in Spark
and DuckDB alike, and the estimator reduces to exact integer
arithmetic on the first 12 hex chars (48 bits) — no floats anywhere,
so the sketch is oracle-checkable bit-for-bit, unlike HLL whose
register math has no SQL-exact form.

Scale: the distinct-hash frame partial-aggregates map-side; the
ORDER BY h LIMIT k is TakeOrdered (per-partition top-k, then a
k-row driver merge — never a global sort); state is k hashes ≈
32·k bytes regardless of input size. Relative error ~1/sqrt(k)
(6% at k=256), the textbook KMV bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX48 = 1 << 48  # normalization base for the 12-hex-char prefix


def kmv_distinct(df: DataFrame, col: str, k: int) -> DataFrame:
    """One-row DataFrame (k, est_distinct): the KMV cardinality
    estimate of ``col``. When fewer than k distinct hashes exist the
    estimate IS the exact count (the sketch saw everything)."""
    h = (
        df.select(F.md5(F.col(col).cast("string")).alias("h"))
        .where(F.col(col).isNotNull())
        .distinct()
    )
    topk = h.orderBy("h").limit(k)
    agg = topk.agg(F.count("*").alias("cnt"), F.max("h").alias("mh"))
    # integer DIV, not float division: (k-1)·2^48 ≈ 7e16 exceeds
    # float64's 2^53 integer range, so a double intermediate would
    # drift from DuckDB's exact // — the floor division must stay in
    # int64 end to end
    est = F.when(F.col("cnt") < k, F.col("cnt").cast("bigint")).otherwise(
        F.expr(f"CAST({(k - 1) * _HEX48} DIV "
               "CAST(conv(substr(mh, 1, 12), 16, 10) AS BIGINT) AS BIGINT)")
    )
    return agg.select(
        F.lit(k).cast("int").alias("k"), est.alias("est_distinct")
    )
