"""Skew-resistant grouped top-N (the scale-safe form of
row_number-then-filter).

A plain ``row_number().over(Window.partitionBy(group).orderBy(...))``
sorts EVERY row of a group inside one task — the q79-class hazard
when the group key is low-cardinality or skewed (one giant source or
language drags a single straggler partition at 100 TB).
``topn_per_group`` runs the classic two-phase refinement instead:

1. **salt phase** — partition by (group, salt) where salt =
   ``xxhash64(tie_col) mod salt_buckets``; each bucket computes its
   local top-N. Any row of the true global top-N is also in its own
   bucket's top-N (removing rows from a bucket can only improve the
   rank of the ones that remain), so phase 1 never discards a final
   answer row.
2. **merge phase** — re-rank only the ≤ N·B survivors per group.

Phase 2 still partitions by the (possibly skewed) group key, but its
input is bounded at N·B rows per group *regardless of the group's
true size* — sort state no longer scales with data volume. The final
ranks are identical to the single-window formulation, which is what
makes the operator oracle-checkable against a plain ``row_number``
SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topn_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    n: int,
    tie_col: str,
    salt_buckets: int = 32,
    rank_name: str = "rn",
) -> DataFrame:
    """Top ``n`` rows per group under ``order_by``, with a bounded
    per-group sort. ``order_by`` must define a TOTAL order (end it
    with a unique tie-break column) or ranks are nondeterministic.
    ``tie_col`` is any high-cardinality column (usually the tie-break
    key) whose hash spreads a group's rows across salt buckets.

    Equivalent to ``row_number().over(partitionBy(group))`` filtered
    to ``rank <= n`` — but executed in two bounded phases (module
    docstring). The rank column is cast to int (cross-engine: DuckDB
    row_number yields BIGINT, Spark int).
    """
    salt = F.pmod(F.xxhash64(F.col(tie_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
        .drop("__r1", "__salt")
        .withColumn(rank_name, F.row_number().over(w2).cast("int"))
        .filter(F.col(rank_name) <= n)
    )


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09 — public
    literature) of N deterministic rankings: score(id) =
    Σ ⌊10⁶ / (k + rank_i)⌋ over the rankings that contain the id.
    The textbook formula sums floats 1/(k+r); quantizing each term
    to integer micro-units BEFORE the sum makes the fused score a
    pure integer — exact under any aggregation order and
    oracle-checkable (the catalog ppm discipline). With k=60 the
    quantization error per term is < 1e-6/(k+r)² of the term — far
    below any realistic rank-separation.

    Input frames carry (id_col, rank_col) with rank ≥ 1 and must be
    deterministic (unique tie-broken row_numbers). Output:
    (id_col, rrf_score) — one row per id appearing in ≥1 ranking.

    Scale: a union + one hash aggregate on the id — rankings are
    typically top-k slices (TakeOrdered), so the union is k·N rows.
    """
    parts = [
        r.select(
            F.col(id_col),
            F.expr(f"CAST(1000000 DIV ({k} + {rank_col}) AS BIGINT)").alias(
                "term"
            ),
        )
        for r in rankings
    ]
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy(id_col).agg(
        F.sum("term").cast("bigint").alias("rrf_score")
    )
