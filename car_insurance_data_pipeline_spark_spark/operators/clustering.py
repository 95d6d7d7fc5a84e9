"""Distributed k-means clustering (Lloyd iterations) with
EXACT cross-engine determinism — the clustering step of a semantic
training-data pipeline (SemDeDup-style cluster-then-dedup, mixture
balancing over semantic clusters, IVF coarse quantizer training).

Why this is oracle-checkable when float k-means normally isn't:

- **Init is a pure function of the data**: the k lowest-id vectors.
- **Centroid updates are exact**: per-(cluster, dimension) sums
  accumulate in DECIMAL(38,12) — exact, order-independent addition,
  so the reduce schedule can't perturb them — then one double
  division by the (integer) member count. Both engines therefore
  hold BIT-IDENTICAL centroids at every iteration.
- **Assignments compare distances computed from identical operands**;
  ties break on the lower cluster id via struct ordering. The two
  engines may round the distance fold in different orders (a ~1-ulp
  wobble), which can only flip an argmin on a near-exact distance
  tie — measure-zero for continuous embeddings, same argument as the
  q113 ppm quantization.

Scale: the per-iteration shuffle is the (cluster, dim) decimal
partial-sum aggregate — map-side combined, k×dim result rows. Only
k×dim decimals ever reach the driver (the IVF-trainer contract);
assignment is a narrow map against plan-literal centroids. The
driver loop runs n_iter bounded collects, exactly like production
Lloyd implementations (centroids ARE driver state).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(
    v: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-vectorized narrow map
    (the engine's standard trade: Catalyst interprets HOF dot
    products per element, measured ~5× slower than a numpy matmul —
    see embedding_dup_pairs_lsh). np.argmin returns the FIRST
    minimum, which IS the lowest-cluster-id tie-break. The two
    engines' distance summation orders differ in the last ulp, which
    can flip an argmin only on a measure-zero exact distance tie —
    the q113 argument; centroid EXACTNESS is never at stake here
    (sums stay JVM-decimal)."""
    cmat = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    vec_type = v.schema[vec_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            # full |x-c|^2 per pair (not the |x|^2-2xc expansion: the
            # subtraction-first form is what the oracle folds)
            d = ((m[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    "c": np.argmin(d, axis=1).astype("int32"),
                }
            )

    return v.mapInPandas(run, f"{id_col} long, {vec_col} {vec_type}, c int")


def kmeans_fit_predict(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """Lloyd k-means → (id_col, cluster int). Deterministic by
    construction (see module docstring); empty clusters keep their
    previous centroid (no reseeding — reseeding would need a
    data-dependent random draw, breaking the pure-function
    contract)."""
    spark = df.sparkSession
    v = df.select(id_col, vec_col)

    init_rows = v.orderBy(id_col).limit(k).collect()
    centroids = [
        [float(x) for x in r[vec_col]] for r in init_rows
    ]  # k×dim driver floats — bounded by contract

    for _ in range(n_iter):
        assigned = _assign(v, id_col, vec_col, centroids)
        sums = (
            assigned.select(
                "c",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "dim", "val"
                ),
            )
            .groupBy("c", "dim")
            .agg(
                F.sum(F.col("val").cast("decimal(38,12)")).alias("s"),
                F.count("*").cast("bigint").alias("n"),
            )
            .collect()  # k×dim rows — bounded by contract
        )
        new = [list(c) for c in centroids]
        per_dim: dict[tuple[int, int], tuple] = {
            (r["c"], r["dim"]): (r["s"], r["n"]) for r in sums
        }
        for (c, dim), (s, n) in per_dim.items():
            # exact decimal sum → double, then one double division by
            # the integer count: bit-identical in any engine
            new[c][dim] = float(s) / float(n)
        centroids = new

    return _assign(v, id_col, vec_col, centroids).select(
        id_col, F.col("c").alias("cluster")
    )
