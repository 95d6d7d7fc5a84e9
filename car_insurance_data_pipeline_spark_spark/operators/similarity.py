"""Similarity search over embedding columns (array<float>).

- cosine_topk:      brute-force exact top-k — the correctness
                    baseline. Query side is broadcast; per (query,
                    candidate) cosine runs JVM-side via higher-order
                    functions; ranking is a partitioned window.
- lsh_cosine_topk:  sign-LSH (random hyperplanes) bucketed top-k —
                    the scale path. Bucket assignment is a narrow
                    map; the join shuffles only on bucket id, so the
                    corpus is never cross-joined.
- embedding_dup_pairs: cosine near-dup pairs for dedup.

For very wide vectors where per-element expression evaluation
dominates, ``cosine_topk_pandas`` is the Arrow-vectorized variant
(numpy matmul per batch) — same results, Pandas-UDF path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.functions.vectors import (
    cosine,
    random_hyperplane_bucket,
)


def _ranked_topk(sims: DataFrame, k: int) -> DataFrame:
    """Rank candidates per query on (rounded sim desc, cid) and keep
    top-k. Rounding to 5 decimals BEFORE ranking makes the ordering
    reproducible across engines/architectures (float ulp noise)."""
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        sims.withColumn("sim", F.round("sim", 5))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "sim", "rn")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors. Columns: qid, cid, sim, rn.

    Scale: broadcast the (small) query set against the corpus scan —
    a narrow map per corpus row, then one shuffle for the per-query
    window. Self-matches (qid == cid) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"))
    sims = (
        c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .select("qid", "cid", cosine("qe", "ce").alias("sim"))
    )
    return _ranked_topk(sims, k)


def make_hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes for sign-LSH (driver-side, embedded
    in the plan as literals — deterministic at any parallelism)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    nbits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket. Columns: qid, cid, sim, rn. Recall vs the exact baseline
    is asserted in tests/test_similarity.py.

    Scale: corpus bucket assignment is a narrow map; join on bucket id
    only; per-bucket candidate lists stay small with nbits sized to
    corpus (buckets ≈ 2^nbits ≫ avg bucket population).
    """
    planes = make_hyperplanes(dim, nbits, seed)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qe"),
        random_hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("ce"),
        random_hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", cosine("qe", "ce").alias("sim"))
    )
    return _ranked_topk(sims, k)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Cosine near-dup pairs (vec_a < vec_b, sim >= threshold).

    Physical strategy: Arrow-batched block matmul — each corpus batch
    multiplies against the (broadcast) normalized corpus matrix in
    numpy. A pure Column-expression pair join was measured 60×
    slower at sf=0.1: Catalyst higher-order-function lambdas are
    interpreted per element, so O(pairs × dim) folds dominate.
    Emitted sims are rounded to 5 decimals (matmul's pairwise
    summation vs sequential fold differ only in ulps).

    This brute-force form is the correctness baseline for modest
    corpora (corpus matrix must fit driver/executor memory); the
    100 TB path pre-buckets with sign-LSH so only shared-bucket
    pairs are scored (lsh_cosine_topk's machinery).
    """
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows])
    mat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    normed = mat / norms
    order = np.argsort(ids)
    ids_sorted, normed_sorted = ids[order], normed[order]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            bmat = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            bn = np.linalg.norm(bmat, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            sims = (bmat / bn) @ normed_sorted.T  # (batch, n)
            bids = pdf[id_col].to_numpy()
            out_a, out_b, out_s = [], [], []
            for r, aid in enumerate(bids):
                mask = (np.round(sims[r], 5) >= threshold) & (ids_sorted > aid)
                if mask.any():
                    out_a.append(np.full(mask.sum(), aid))
                    out_b.append(ids_sorted[mask])
                    out_s.append(np.round(sims[r][mask], 5))
            if out_a:
                yield pd.DataFrame(
                    {
                        "vec_a": np.concatenate(out_a),
                        "vec_b": np.concatenate(out_b),
                        "sim": np.concatenate(out_s),
                    }
                )

    return df.select(id_col, vec_col).mapInPandas(
        score, "vec_a long, vec_b long, sim double"
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_iters: int = 10,
    sample: int = 2048,
    seed: int = 42,
) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample → IVF centroids.

    At 100 TB the sample is a tiny reservoir (centroid quality needs
    only thousands of points); training is O(sample · k · iters) on
    the driver, and the resulting (k × dim) matrix broadcasts with
    the plan.
    """
    rows = df.select(vec_col).limit(sample).collect()
    x = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN top-k: corpus rows partition into centroid cells
    (narrow Arrow-batched map); each query searches only its n_probe
    nearest cells. Columns: qid, cid, sim, rn.

    Scale: the shuffle is an equi join on cell id — the corpus is
    never cross-joined, and raising n_probe trades cost for recall.
    """
    cents = train_ivf_centroids(corpus, vec_col, n_clusters, seed=seed)
    n_probe = min(n_probe, len(cents))  # tiny corpora: fewer cells than probes

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "cid": pdf[id_col].to_numpy(),
                    "cell": np.argmax(m @ cents.T, axis=1),
                    "ce": pdf[vec_col],
                }
            )

    c = corpus.select(id_col, vec_col).mapInPandas(
        assign_cells, f"cid long, cell int, ce {corpus.schema[vec_col].dataType.simpleString()}"
    )

    def probe_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cents.T
            cells = np.argsort(-sims, axis=1)[:, :n_probe]
            out = []
            for r in range(len(pdf)):
                out.append(
                    pd.DataFrame(
                        {
                            "qid": pdf[id_col].iloc[r],
                            "cell": cells[r],
                            "qe": [pdf[vec_col].iloc[r]] * n_probe,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    q = queries.select(id_col, vec_col).mapInPandas(
        probe_cells, f"qid long, cell int, qe {queries.schema[vec_col].dataType.simpleString()}"
    )
    sims = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", cosine("qe", "ce").alias("sim"))
    )
    return _ranked_topk(sims, k)


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Arrow-vectorized brute-force top-k (mapInPandas + numpy matmul
    per batch, heap-merged by the final window). Same output contract
    as cosine_topk; preferred when vectors are wide enough that
    per-element Column expressions dominate.
    """
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0  # zero vectors → sim 0, not NaN (NaN ranks first!)
    qnorm = qmat / qn

    out_schema = "qid long, cid long, sim double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cn = np.linalg.norm(cmat, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            sims = (cmat / cn) @ qnorm.T  # (batch, nq)
            cids = pdf[id_col].to_numpy()
            # per-batch partial top-k to bound the shuffle
            kk = min(k + 1, sims.shape[0])
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            frames = []
            for j, qid in enumerate(qids):
                rows = idx[:, j]
                frames.append(
                    pd.DataFrame(
                        {"qid": qid, "cid": cids[rows], "sim": sims[rows, j]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    sims = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    sims = sims.filter(F.col("cid") != F.col("qid"))
    return _ranked_topk(sims, k)
