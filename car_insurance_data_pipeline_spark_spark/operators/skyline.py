"""2-D skyline (Pareto frontier) operator.

A point survives the skyline iff no other point in its group is at
least as good on both axes and strictly better on one (here: lower
price, larger size — duplicates of a frontier point all survive,
matching the SQL NOT EXISTS formulation exactly).

Scale design: skyline is DISTRIBUTIVE —
skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — because a point
dominated within any subset is dominated in the union, and a union
survivor survives in its own subset. So the operator runs two
phases: (1) a narrow mapInPandas pass computes the frontier of each
physical partition slice per group (no shuffle, prunes the bulk —
frontier size is bounded by the number of distinct size values,
≤ 50 here, regardless of row count), then (2) one grouped
applyInPandas pass merges the ≤ partitions × frontier survivors per
group exactly. The only exchange carries pre-pruned frontiers, not
the input — the same two-phase shape as the salted top-N exporter.
A global (ungrouped) skyline is the group_cols=[] degenerate case
of phase 2 with a constant key.

The pandas kernel is exact and vectorized: sort-free group-max plus
a price-ordered prefix max, no O(n²) dominance scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def skyline_kernel(
    pdf: pd.DataFrame, price_col: str, size_col: str
) -> pd.DataFrame:
    """Exact 2-D skyline of one group (minimize price, maximize
    size). Survivors: size equals its price-level max AND exceeds
    every strictly-cheaper price level's max. Duplicate frontier
    points all survive."""
    if len(pdf) == 0:
        return pdf
    level_max = pdf.groupby(price_col)[size_col].max().sort_index()
    # max size over strictly cheaper price levels, -inf for the min
    strict_cheaper = level_max.cummax().shift(1, fill_value=-(2**62))
    grp_max = pdf[price_col].map(level_max)
    cheaper_max = pdf[price_col].map(strict_cheaper)
    keep = (pdf[size_col] == grp_max) & (pdf[size_col] > cheaper_max)
    return pdf[keep]


def skyline2d(
    df: DataFrame,
    group_cols: list[str],
    price_col: str,
    size_col: str,
) -> DataFrame:
    """Two-phase distributed grouped skyline (see module docstring).
    Returns the input columns, skyline rows only."""
    schema = df.schema
    cols = [f.name for f in schema.fields]
    gcols = list(group_cols)

    def local_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if gcols:
                yield (
                    pdf.groupby(gcols, group_keys=False, sort=False)
                    .apply(lambda g: skyline_kernel(g, price_col, size_col))
                    [cols]
                )
            else:
                yield skyline_kernel(pdf, price_col, size_col)[cols]

    pruned = df.mapInPandas(local_pass, schema)

    def merge_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        return skyline_kernel(pdf, price_col, size_col)[cols]

    if gcols:
        return pruned.groupBy(*gcols).applyInPandas(merge_pass, schema)

    # global skyline: the pruned set is tiny (≤ partitions × distinct
    # sizes) — a single-partition exact merge over pre-pruned rows,
    # the q95 boundary-stitch discipline (bounded by construction)
    def global_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            yield skyline_kernel(
                pd.concat(pdfs, ignore_index=True), price_col, size_col
            )[cols]

    return pruned.coalesce(1).mapInPandas(global_merge, schema)
