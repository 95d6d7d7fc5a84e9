"""Semantic invariants for the round-4 pipeline-lifecycle operators
(q107–q111) — properties the DuckDB oracle equality cannot state
directly (interval algebra, set reconciliation, rank consistency).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    """Per customer: runs are contiguous (valid_to == next
    valid_from), exactly one open interval, adjacent runs change
    priority, and n_orders reconciles with the order table."""
    hist = all_queries()["q108_scd2_history"](spark, sf_dir).collect()
    orders_per_cust = {
        r["o_custkey"]: r["cnt"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    by_cust = defaultdict(list)
    for r in hist:
        by_cust[r["o_custkey"]].append(r)
    assert set(by_cust) == set(orders_per_cust)
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r["run_id"])
        assert [r["run_id"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["n_orders"] for r in rows) == orders_per_cust[cust]
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] == 1 and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]  # contiguous
            assert a["valid_from"] <= a["valid_to"]
            assert a["priority"] != b["priority"]  # a run is maximal


def test_snapshot_diff_reconciles_set_algebra(spark, sf_dir):
    """Statuses partition the id universe: added = B\\A,
    removed = A\\B, changed ∪ unchanged = A∩B, and every %7==0
    surviving doc is 'changed'."""
    out = all_queries()["q107_snapshot_diff"](spark, sf_dir).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))  # one verdict per doc
    by_status = defaultdict(set)
    for r in out:
        by_status[r["status"]].add(r["doc_id"])
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    universe = set(range(n_docs))
    a = {i for i in universe if i % 10 != 0}
    b = {i for i in universe if i % 10 != 1}
    assert by_status["added"] == b - a
    assert by_status["removed"] == a - b
    both = a & b
    assert by_status["changed"] | by_status["unchanged"] == both
    assert by_status["changed"] == {i for i in both if i % 7 == 0}


def test_key_skew_report_ranks_and_ratios(spark, sf_dir):
    """Top-10 is the true top-10 by (n desc, key); ppm and vs-avg
    ratios reproduce from independently computed totals."""
    rep = sorted(
        all_queries()["q110_key_skew_report"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    truth = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    total, n_keys = sum(truth.values()), len(truth)
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["user_id"], r["n"]) for r in rep] == expect
    assert [r["rank"] for r in rep] == list(range(1, 11))
    for r in rep:
        assert r["ppm"] == r["n"] * 1_000_000 // total
        assert r["x1000_vs_avg"] == r["n"] * n_keys * 1000 // total


def test_semdedup_reunites_planted_duplicates(spark, sf_dir):
    """Every planted duplicate (vec_id + 1e6) lands in its
    original's component with the original as canonical; vectors
    without a planted twin stay singleton-canonical."""
    out = {
        r["vec_id"]: r
        for r in all_queries()["q109_semdedup_survivors"](
            spark, sf_dir
        ).collect()
    }
    planted = [v for v in out if v >= 1_000_000]
    assert planted
    for v in planted:
        orig = v - 1_000_000
        assert out[v]["component"] == orig
        assert out[v]["is_canonical"] == 0
        assert out[orig]["component"] == orig
        assert out[orig]["is_canonical"] == 1
    n_canonical = sum(r["is_canonical"] for r in out.values())
    assert n_canonical == len(out) - len(planted)  # keep-one survivor set


def test_bm25_ranks_follow_scores_and_terms(spark, sf_dir):
    """Ranks are the (score desc, doc_id) order, scores are
    positive, and every ranked doc actually contains a query term."""
    from car_insurance_data_pipeline_spark_spark.plans.pipelineops import (
        _BM25_TERMS,
    )

    out = sorted(
        all_queries()["q111_bm25_rank"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    keys = [(-r["bm25_micro"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    assert all(r["bm25_micro"] > 0 for r in out)
    texts = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in out]))
        .select("doc_id", "text")
        .collect()
    )
    for r in out:
        toks = set(texts[r["doc_id"]].lower().split())
        assert toks & set(_BM25_TERMS)
