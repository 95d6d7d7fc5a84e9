"""Semantic invariants of the statistics/model-eval family — the
mathematical properties that must hold regardless of data, which
the DuckDB parity oracle (same formula, other engine) cannot catch
if both sides share a formula bug.
"""

from __future__ import annotations

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries


def test_mann_whitney_u_sums_to_product(spark, sf_dir):
    """U_A + U_B = n_a·n_b (rank-sum identity) ⇒ with doubled U:
    2U_A ≤ 2·n_a·n_b, and recomputing U_B by symmetry closes the
    identity. Also |z| must be small for hash-routed cohorts (same
    distribution by construction)."""
    row = all_queries()["q218_mann_whitney_u"](spark, sf_dir).first()
    u2a = row["u2_a"]
    assert 0 <= u2a <= 2 * row["n_a"] * row["n_b"]
    # md5-routing splits ONE distribution: no real effect exists
    assert abs(row["z_ppm"]) < 3_000_000  # |z| < 3


def test_ks_statistic_bounds_and_location(spark, sf_dir):
    """D ∈ [0, 1]; the reported location must be a value where the
    gap is attainable (d_ppm consistent with integer gap bound)."""
    row = all_queries()["q219_ks_two_sample"](spark, sf_dir).first()
    assert 0 <= row["d_ppm"] <= 1_000_000
    assert row["ks_scaled_ppm"] >= 0


def test_gd_regression_reduces_sse_vs_zero_model(spark, sf_dir):
    """After 3 GD steps the fitted line must beat the zero model
    (w=0, b=0) on SSE — gradient descent with a stable step size
    must make progress from a cold start."""
    import pyspark.sql.functions as F

    row = all_queries()["q220_gd_linear_regression"](spark, sf_dir).first()
    w, b = row["w_micro"], row["b_micro"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    r_fit = (F.lit(w) * F.col("x") + F.lit(b)) / 1e6 - F.col("y")
    sse = li.agg(
        F.sum(r_fit * r_fit).alias("fit"),
        F.sum(F.col("y").cast("double") * F.col("y").cast("double")).alias(
            "zero"
        ),
    ).first()
    assert sse["fit"] < sse["zero"]


def test_textrank_mass_conservation(spark, sf_dir):
    """Total rank mass stays ≈ the injected 10¹² (integer DIV
    truncation only ever loses mass, bounded by #nodes + #edges per
    iteration) and every rank is positive."""
    import pyspark.sql.functions as F

    # top-20 only is returned; recompute bounds from the full state
    # by running the query and checking the visible slice
    df = all_queries()["q221_textrank_keywords"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert all(r["rank_scaled"] > 0 for r in rows)
    # top-20 of a ~vocabulary-sized graph can't exceed total mass
    assert sum(r["rank_scaled"] for r in rows) <= 1_000_000_000_000


def test_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ log₂(max distinct tokens per doc); averages must sit
    inside the same bounds."""
    rows = all_queries()["q222_token_entropy_filter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_low_entropy"] <= r["n_docs"]
        assert 0 <= r["avg_h_pico"] < 20 * 10**12  # < 20 bits


def test_mutual_information_bounds(spark, sf_dir):
    """0 ≤ MI ≤ min(H_type, H_hour) (quantization slack ≤ #cells
    pico-units); NMI in [0, 1]."""
    r = all_queries()["q223_mutual_information"](spark, sf_dir).first()
    slack = 200  # pico-units: ≤ 1 per FLOOR'd cell term
    assert r["mi_pico"] >= -slack
    assert r["mi_pico"] <= min(r["h_type_pico"], r["h_hour_pico"]) + slack
    assert -1 <= r["nmi_ppm"] <= 1_000_001


def test_weighted_sample_is_deterministic_and_ranked(spark, sf_dir):
    """Two runs select identical rows; ranks are 1..k per language."""
    q = all_queries()["q224_weighted_sample"]
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b
    per_lang = {}
    for r in q(spark, sf_dir).collect():
        per_lang.setdefault(r["lang"], []).append(r["rn"])
    for lang, rns in per_lang.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), lang


def test_theil_sen_between_min_max_slopes(spark, sf_dir):
    """The median pairwise slope lies between the extreme pairwise
    slopes — and for these series it must be finite."""
    rows = all_queries()["q225_theil_sen_slope"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] > 0


def test_centroid_cosine_in_range_and_symmetric_pairs(spark, sf_dir):
    """cos ∈ [−1, 1]; exactly one row per unordered label pair."""
    rows = all_queries()["q226_label_centroid_cosine"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert -1_000_001 <= r["cos_ppm"] <= 1_000_001
        key = (r["label_a"], r["label_b"])
        assert r["label_a"] < r["label_b"]
        assert key not in seen
        seen.add(key)
    n_labels = len({x for k in seen for x in k})
    assert len(seen) == n_labels * (n_labels - 1) // 2


def test_power_iteration_matches_numpy(spark, sf_dir):
    """The integer power iteration must agree with a float numpy
    power iteration on the dominant direction (cosine > 0.99 after
    3 steps on the same quantized matrix)."""
    import numpy as np
    import pandas as pd

    out = (
        all_queries()["q227_power_iteration_pca"](spark, sf_dir)
        .toPandas()
        .sort_values("dim")
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1e6
    )
    v = np.ones(X.shape[1])
    for _ in range(3):
        w = X.T @ (np.floor((X @ (v * 1e6)) / 1e6))
        v = w / np.abs(w).max()
    got = out["v_micro"].to_numpy().astype("float64")
    cos = (got @ v) / (np.linalg.norm(got) * np.linalg.norm(v))
    assert cos > 0.99


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    """S(t) is non-increasing in t, starts ≤ 1, stays ≥ 0; risk
    sets shrink monotonically."""
    rows = sorted(
        all_queries()["q229_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r["dur_days"],
    )
    assert rows
    prev_s, prev_risk = 1_000_000, None
    for r in rows:
        assert 0 <= r["s_ppm"] <= prev_s
        prev_s = r["s_ppm"]
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk
        prev_risk = r["n_risk"]


def test_mann_kendall_s_bounds(spark, sf_dir):
    """|S| ≤ n(n−1)/2 for a series of n observations."""
    for r in all_queries()["q230_mann_kendall"](spark, sf_dir).collect():
        n = r["n_days"]
        assert abs(r["s_stat"]) <= n * (n - 1) // 2


def test_jsd_bounds(spark, sf_dir):
    """JSD ∈ [0, 1] bit (base-2), up to per-term FLOOR slack."""
    r = all_queries()["q231_js_divergence"](spark, sf_dir).first()
    n_terms_slack = 100_000  # ≤ 1 pico per histogram row
    assert -n_terms_slack <= r["jsd_pico"] <= 10**12 + n_terms_slack


def test_gini_split_beats_or_ties_no_split(spark, sf_dir):
    """The selected split's weighted Gini can never exceed the
    parent impurity (splitting never hurts Gini)."""
    import pyspark.sql.functions as F

    rows = all_queries()["q232_best_split_gini"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for r in rows:
        g = li.filter(F.col("l_linestatus") == r["grp"]).agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("p"),
            F.count("*").alias("n"),
        ).first()
        p = g["p"] / g["n"]
        parent = 1.0 - p * p - (1.0 - p) * (1.0 - p)
        assert r["gini_ppm"] <= parent * 1e6 + 1


def test_auc_of_perfect_and_random_signals(spark, sf_dir):
    """Sanity anchors: the reported AUC must be in [0, 1]; the
    hash-label signal in the fixture is near-random so AUC ≈ 0.5,
    far from both degenerate ends."""
    r = all_queries()["q233_exact_auc"](spark, sf_dir).first()
    assert 0 <= r["auc_ppm"] <= 1_000_000
    assert 300_000 < r["auc_ppm"] < 700_000
    assert r["gini_ppm"] == r["auc_ppm"] * 2 - 1_000_000 or abs(
        r["gini_ppm"] - (2 * r["auc_ppm"] - 1_000_000)
    ) <= 1


def test_calibration_partitions_population(spark, sf_dir):
    """Bins partition the scored rows exactly; rates bounded."""
    import pyspark.sql.functions as F

    rows = all_queries()["q234_calibration_bins"](spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = ev.filter(F.col("value").isNotNull()).count()
    assert total == expected
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["obs_rate_ppm"] <= 1_000_000


def test_psi_nonnegative(spark, sf_dir):
    """PSI is a sum of (p−q)ln(p/q) terms, each ≥ 0 — up to FLOOR
    slack per bin."""
    r = all_queries()["q235_psi_drift"](spark, sf_dir).first()
    assert r["psi_pico"] >= -20  # ≤ 1 pico slack per bin
    assert r["n_ref"] + r["n_cur"] > 0


def test_als_factors_positive_and_bounded(spark, sf_dir):
    """With all-positive ratings and factors initialized positive,
    one alternation keeps every factor positive; the top item list
    is strictly rank-ordered."""
    rows = all_queries()["q236_als_one_step"](spark, sf_dir).collect()
    assert rows
    vals = [r["v_micro"] for r in rows]
    assert all(v > 0 for v in vals)
    assert vals == sorted(vals, reverse=True)


def test_average_precision_bounds_and_random_anchor(spark, sf_dir):
    """AP ∈ [0, 1]; for the near-random fixture signal AP ≈ base
    rate (the random-classifier anchor), far from 1."""
    r = all_queries()["q250_average_precision"](spark, sf_dir).first()
    ap = r["ap_pico"] / 1e12
    base = r["n_pos"] / (r["n_pos"] + r["n_neg"])
    assert 0.0 <= ap <= 1.0
    assert abs(ap - base) < 0.15  # random signal stays near base rate


def test_group_kfold_is_leakage_free(spark, sf_dir):
    """THE invariant: no user appears in two folds — recomputed
    directly from the assignment function over the raw table."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id").isNotNull()
    )
    fold = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
        ).cast("bigint")
        % 5
    ).cast("int")
    leaks = (
        ev.select("user_id", fold.alias("fold"))
        .groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert leaks == 0
    # and the query's per-fold user counts sum to the distinct total
    rows = all_queries()["q251_group_kfold"](spark, sf_dir).collect()
    assert sum(r["n_users"] for r in rows) == ev.select("user_id").distinct().count()


def test_qq_table_monotone_and_complete(spark, sf_dir):
    """Deciles are monotone non-decreasing within each cohort and
    all nine are present; for hash-routed cohorts the two quantile
    curves track each other closely."""
    rows = sorted(
        all_queries()["q252_qq_table"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for col in ("qa_milli", "qb_milli"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)


def test_effect_size_near_zero_for_hash_split(spark, sf_dir):
    """Hash routing splits ONE distribution: |d| must be tiny."""
    r = all_queries()["q253_effect_size"](spark, sf_dir).first()
    assert abs(r["cohens_d_ppm"]) < 100_000  # |d| < 0.1
