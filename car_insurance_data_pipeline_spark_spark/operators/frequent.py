"""Heavy hitters: Misra-Gries candidate sketch + exact verification.

The frequent-items primitive of a corpus pipeline (stop-word
discovery, boilerplate-token detection, skew diagnostics over any
key) built on the same make-it-exact pattern as the bloom join and
the LSH dedup: a bounded sketch PRUNES, an exact pass CLOSES, so the
result is exactly the brute-force answer and therefore
oracle-checkable.

Guarantee (why the candidate set is a superset): an item with global
frequency > n/k has per-partition frequency > n_p/k in at least one
partition (if it were ≤ n_p/k in every one, summing gives ≤ n/k),
and a Misra-Gries summary with k-1 counters retains every item whose
partition frequency exceeds n_p/k. So the union of per-partition
summaries contains every global heavy hitter; the exact
count-and-filter pass then removes the false candidates. Asserted
under adversarial partitionings in tests/test_frequent.py — and by
q138's oracle, which is the plain exact query: a dropped true heavy
hitter would hash-mismatch.

Scale: each partition's summary is ≤ k-1 items regardless of data
volume (the MG bound), so candidates total ≤ partitions × (k-1) —
broadcast-sized by construction. The exact pass is one broadcast
semi-join + one map-side-combined count; the threshold compare uses
integer cross-multiplication (cnt · k > n), never division.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries (k-1 counters), unioned +
    deduped: a SUPERSET of every item with global frequency > n/k."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for x in pdf[item_col]:
                if x is None:
                    continue
                if x in counters:
                    counters[x] += 1
                elif len(counters) < k - 1:
                    counters[x] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({item_col: list(counters.keys())})

    # output schema mirrors the input item column's type — hardcoding
    # string would break Arrow conversion (or force lossy casts in the
    # exact-count join) for numeric/date keys
    item_type = df.schema[item_col].dataType.simpleString()
    return df.select(item_col).mapInPandas(
        run, f"{item_col} {item_type}"
    ).distinct()


def heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """EXACT heavy hitters: every item with frequency strictly above
    n/k, with its exact count — computed by counting ONLY the MG
    candidate superset. Columns: <item_col>, cnt. Fully lazy: the
    total n joins in as an in-plan 1-row broadcast."""
    cands = mg_candidates(df, item_col, k)
    total = df.select(item_col).agg(
        F.count("*").cast("bigint").alias("n_total")
    )
    counts = (
        df.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("n_total"))
        .select(item_col, "cnt")
    )
