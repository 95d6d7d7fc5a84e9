"""Corpus-shaping operators: boilerplate-strip semantics and the
token-budget selection's bucket-prefix ≡ naive-global-cumsum proof
(plus the plan property the two-phase scheme exists for: no window
over the full corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.plans.catalog import get_spec, table
from car_insurance_data_pipeline_spark_spark.plans.corpusops import (
    boilerplate_strip,
    token_budget_select,
)


def test_boilerplate_strip_drops_exactly_frequent_segments(spark, sf_dir):
    """Independent recompute: a segment survives iff its exact
    content occurs in < min_df distinct documents; reassembly
    preserves original segment order."""
    d = table(spark, sf_dir, "documents")
    out = boilerplate_strip(d, seg_len=4, min_df=3)
    rows = {r.doc_id: r for r in out.collect()}

    docs = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    segs_by_doc = {}
    for doc_id, text in docs.items():
        toks = text.strip().lower().split()
        segs_by_doc[doc_id] = [
            " ".join(toks[i : i + 4]) for i in range(0, len(toks), 4)
        ]
    df_count: dict[str, set] = {}
    for doc_id, segs in segs_by_doc.items():
        for s in set(segs):
            df_count.setdefault(s, set()).add(doc_id)
    boiler = {s for s, ids in df_count.items() if len(ids) >= 3}

    assert any(r.n_dropped > 0 for r in rows.values()), "fixture never fires"
    for doc_id, segs in segs_by_doc.items():
        keep = [s for s in segs if s not in boiler]
        r = rows[doc_id]
        assert r.clean_text == " ".join(keep), doc_id
        assert r.n_segments == len(segs)
        assert r.n_dropped == len(segs) - len(keep)


def test_token_budget_select_equals_naive_prefix(spark, sf_dir):
    """The bucket-prefix plan must reproduce the naive semantics
    exactly: order by (quality desc, doc_id), admit while the
    inclusive running token total fits the budget."""
    d = table(spark, sf_dir, "documents")
    rows = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"),
        (
            F.size(F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+")))
            .cast("double")
            / F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("double")
        ).alias("q"),
    ).collect()
    total = sum(r.n for r in rows)
    for budget in (total * 6 // 10, 0, total, total // 100):
        out = {
            r.doc_id: r.selected
            for r in token_budget_select(d, budget=budget).collect()
        }
        cum, want = 0, {}
        for r in sorted(rows, key=lambda r: (-r.q, r.doc_id)):
            cum += r.n
            want[r.doc_id] = 1 if cum <= budget else 0
        assert out == want, f"budget={budget}"


def test_token_budget_window_never_sees_full_corpus(spark, sf_dir):
    """The scale property the bucket-prefix scheme exists for: the
    only windowed branch is the boundary bucket, and even that window
    partitions on the range SLICE id — never on the bucket value
    alone (quality ties clustering into one bucket would make a
    bucket-keyed window a single giant task)."""
    import re

    df = token_budget_select(
        table(spark, sf_dir, "documents"),
        budget=1000,  # small budget forces a boundary bucket to exist
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the cumsum window partitions on __slice, not on bucket: each
    # task sorts at most ~bucket/boundary_parts rows
    spec = plan.split("windowspecdefinition(", 1)[1]
    assert spec.startswith("__slice#"), spec[:120]
    assert not re.search(r"windowspecdefinition\(bucket#", plan)


def test_token_budget_boundary_is_range_sliced(spark, sf_dir):
    """The boundary-bucket exchange must be a RangePartitioning on
    the (quality DESC, id) total order — more than the bucket key —
    so no task ever holds more than ~bucket/boundary_parts rows.
    Asserted on the pre-checkpoint helper (the checkpoint in
    token_budget_select truncates lineage in the final plan)."""
    from car_insurance_data_pipeline_spark_spark.plans.corpusops import (
        _boundary_slices,
    )

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    scored = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("quality"),
    ).withColumn("bucket", F.floor(F.col("quality") * 1000).cast("int"))
    plan = _boundary_slices(
        scored, boundary=7, boundary_parts=32, id_col="doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    range_args = plan.split("rangepartitioning(", 1)[1].split("REPARTITION")[0]
    assert "quality#" in range_args and "doc_id#" in range_args, plan[:800]


def test_q94_q95_catalog_rows(spark, sf_dir):
    for name in ("q94_boilerplate_strip", "q95_token_budget_select"):
        df = get_spec(name).fn(spark, sf_dir)
        assert df.count() == table(spark, sf_dir, "documents").count()


def test_bigram_lm_hand_computed(spark):
    """Exact MLE check on a corpus small enough to hand-count:
    quantized conditional probs sum to the expected integers."""
    from car_insurance_data_pipeline_spark_spark.plans.corpusops import (
        bigram_lm_quality,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c"), (4, "  ")],
        ["doc_id", "text"],
    )
    # unigram counts: a=3, b=3, c=2
    # bigram counts: (a,b)=3, (b,a)=1, (b,c)=1
    # doc1 bigrams: ab ba ab -> q = 1e6 (3*1e6//3) + 333333 + 1e6
    # doc2 bigrams: ab bc    -> q = 1e6 + 333333
    out = {r.doc_id: r for r in bigram_lm_quality(docs).collect()}
    assert set(out) == {1, 2}  # doc3 has 1 token, doc4 empty
    assert out[1].n_bigrams == 3 and out[1].cond_sum == 2333333
    assert out[2].n_bigrams == 2 and out[2].cond_sum == 1333333
    assert abs(out[1].avg_cond_p - 2333333 / 3e6) < 1e-8


def test_bigram_lm_word_salad_scores_lower(spark):
    """On a corpus WITH sequence structure, scrambled word order must
    collapse the score: the fluent docs share one word chain (every
    bigram near-certain given its prefix), the salad reverses it
    (every transition rare relative to a common prefix). The fixture
    documents table can't host this test — it is itself built from
    near-independent word draws, so every doc's conditional prob sits
    at ~1/vocab and order carries no signal. (Converse trap, also by
    design: RARE words score HIGH under a corpus-MLE conditional
    model — a unique prefix predicts its unique continuation — so
    the gate targets disfluency, not rarity.)"""
    from car_insurance_data_pipeline_spark_spark.plans.corpusops import (
        bigram_lm_quality,
    )

    fluent = [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)]
    salad = [(99, "zeta epsilon delta gamma beta alpha")]
    out = {
        r.doc_id: r.avg_cond_p
        for r in bigram_lm_quality(
            spark.createDataFrame(fluent + salad, ["doc_id", "text"])
        ).collect()
    }
    assert out[0] > 0.9  # forward chain is near-deterministic
    assert out[99] < 0.1  # reversed transitions are rare
    assert all(out[i] == out[0] for i in range(20))


def test_stream_static_enrich_multi_batch(spark, sf_dir):
    """q97 must consume >=3 micro-batches (split source,
    maxFilesPerTrigger=1) and agree with the equivalent batch plan —
    incremental window state over an enriched stream, not a one-shot."""
    from car_insurance_data_pipeline_spark_spark.plans.relational import dsum
    from car_insurance_data_pipeline_spark_spark.plans.streaming_queries import (
        _run_complete,
    )

    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    out, n_batches = _run_complete(
        spark,
        sf_dir,
        lambda s: s.join(dim, s["user_id"] == dim["c_custkey"])
        .groupBy(F.window("event_ts", "1 hour").alias("win"), F.col("segment"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("sum_value")),
        lambda t: t.select(
            "segment",
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        ),
        sink="q97_enrich_test",
    )
    assert n_batches >= 3
    assert out.count() > 0
    assert out.groupBy().sum("n_events").collect()[0][0] == 10000
