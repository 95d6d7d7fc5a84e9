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


def kmv_set_ops(
    a: DataFrame, b: DataFrame, col: str, k: int
) -> DataFrame:
    """One-row DataFrame of KMV SET ALGEBRA between two sides
    (Beyer et al. SIGMOD'07, public literature): columns (k, est_a,
    est_b, est_union, k_common, est_intersection). The union sketch
    is the k smallest hashes of the MERGED distinct-hash stream
    (KMV sketches are mergeable — union of sketches re-cut to k IS
    the sketch of the union); the Jaccard estimator is the fraction
    of that merged sketch present in BOTH sides, and the
    intersection estimate is J·|A∪B| as exact integer arithmetic
    (k_common·est_union DIV cnt). Same md5-hex uniform-draw
    discipline as kmv_distinct, so every output is
    oracle-checkable bit-for-bit.

    Scale: three TakeOrdered top-k passes over distinct-hash
    partial aggregates; the membership flags ride the merged
    stream as a 2-bit max — state is O(k) everywhere. This is the
    sketch-algebra path for "how much do two 100 TB corpora
    overlap" without ever joining them.
    """

    def hashes(df: DataFrame, flag: str) -> DataFrame:
        other = "in_b" if flag == "in_a" else "in_a"
        return (
            df.select(F.md5(F.col(col).cast("string")).alias("h"))
            .where(F.col(col).isNotNull())
            .distinct()
            .select(
                "h",
                F.lit(1).alias(flag),
                F.lit(0).alias(other),
            )
        )

    ha, hb = hashes(a, "in_a"), hashes(b, "in_b")

    def est(cnt_col: str, mh_col: str) -> F.Column:
        return F.when(
            F.col(cnt_col) < k, F.col(cnt_col).cast("bigint")
        ).otherwise(
            F.expr(
                f"CAST({(k - 1) * _HEX48} DIV CAST(conv(substr({mh_col},"
                f" 1, 12), 16, 10) AS BIGINT) AS BIGINT)"
            )
        )

    sa = (
        ha.orderBy("h")
        .limit(k)
        .agg(F.count("*").alias("cnt_a"), F.max("h").alias("mh_a"))
    )
    sb = (
        hb.orderBy("h")
        .limit(k)
        .agg(F.count("*").alias("cnt_b"), F.max("h").alias("mh_b"))
    )
    merged = (
        ha.unionByName(hb)
        .groupBy("h")
        .agg(
            F.max("in_a").alias("in_a"),
            F.max("in_b").alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    su = merged.agg(
        F.count("*").alias("cnt_u"),
        F.max("h").alias("mh_u"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias(
            "k_common"
        ),
    )
    return (
        su.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            F.lit(k).cast("int").alias("k"),
            est("cnt_a", "mh_a").alias("est_a"),
            est("cnt_b", "mh_b").alias("est_b"),
            est("cnt_u", "mh_u").alias("est_union"),
            F.col("k_common").cast("bigint").alias("k_common"),
            F.col("cnt_u"),
        )
        .select(
            "k",
            "est_a",
            "est_b",
            "est_union",
            "k_common",
            # J·|A∪B| with J = k_common/cnt_u, as one integer
            # floor-division on non-negative operands
            F.expr(
                "CAST(k_common * est_union DIV cnt_u AS BIGINT)"
            ).alias("est_intersection"),
        )
    )
