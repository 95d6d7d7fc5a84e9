#!/usr/bin/env python3
"""Weak-scaling spot-check of the heavy query families (round-5
brief #4): run the shuffle-heavy / iterative / stateful queries at
sf0.1 and at the deterministic 10× synthetic fixture
(tools/make_scale_fixture.py) and report wall time and shuffle
read/write bytes per query, plus the 10×/1× ratios.

A design that is linear in data volume should show a wall-time
ratio ≈ 10 or less (fixed per-query overheads — micro-batch
scheduling, bounded driver steps — make heavy queries SUB-linear
locally); a quadratic hazard shows up as a ratio ≈ 100. Shuffle
bytes growing ~10× confirms the exchanges carry data volume, not a
blown-up candidate set.

Usage: python tools/bench_scale.py [sf1_dir]
Prints one JSON line; paste/record the result in SCALE_CHECK.md.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

HEAVY = [
    "q34_jaccard_pairs",
    "q73_dedup_clusters",
    # round-10 new entries
    "q367_cronbach_alpha",
    "q368_morans_i",
    "q369_kendalls_w",
    "q109_semdedup_survivors",
    "q113_pagerank_centrality",
    "q116_stateful_running_stats",
    # relational family (FK-consistent 10x TPC-H-ish scale-up):
    # 6-table join tree, star fact build, triangle counting over the
    # co-purchase graph, k-means over the scaled embeddings
    "q65_local_supplier_volume",
    "q105_fact_snapshot",
    "q135_triangle_copurchase",
    "q136_kmeans_clusters",
    # round-5 late entrants: recursive-CTE frontier joins (depth
    # grows log(keys)), 4-leg incremental join merge
    "q141_recursive_hierarchy",
    "q142_incremental_join_merge",
    # round-5 session additions: per-hop BFS frontier joins, k-core
    # peeling rounds, two-phase skyline prune+merge
    "q144_shortest_paths",
    "q145_kcore",
    "q148_skyline",
    # round-5 analytics batch: sequence windows, basket self-join,
    # exact-quantile segment windows, benchmark-shingle broadcast
    # probe, global ntile triple
    "q164_markov_transitions",
    "q171_association_rules",
    "q170_revenue_concentration",
    "q173_contamination_score",
    "q172_rfm_segments",
    # round-6: de-skewed prefix-filtered exact Jaccard (self-join
    # candidates), per-doc winnowing windows, wedge-expansion node
    # similarity, grid-bucketed DBSCAN, entropy-coded JPEG decode
    "q178_prefix_jaccard",
    "q183_winnowing",
    "q184_node_similarity",
    "q185_dbscan_labels",
    "q181_jpeg_decode",
    # round-6 continuation: LPM broadcast-join stack, cohort/funnel/
    # sequence window families, bitmap distinct, baseline re-join
    # anomaly scan, OLS moment aggregate, mixture rank window
    "q198_lpm_routing",
    "q199_cohort_retention",
    "q200_funnel_stages",
    "q201_trend_ols",
    "q202_ab_ztest",
    "q203_bitmap_distinct",
    "q204_seasonal_anomaly",
    "q205_sequence_support",
    "q206_temperature_mixture",
    # round-6 tpchplus + stats batch: HAVING semi-join back to the
    # fact (AQE broadcast of the aggregated side), windowed Q21
    # decorrelation, fact-scale anti join, outer-join histogram,
    # broadcast-star share, quarterly top-supplier anchor, hourly
    # ACF, histogram rank transforms, three-pass broadcast-state GD
    "q211_large_volume_orders",
    "q212_sole_late_supplier",
    "q213_idle_rich_customers",
    "q214_hourly_acf",
    "q215_custdist",
    "q216_market_share",
    "q217_top_revenue_suppliers",
    "q218_mann_whitney_u",
    "q219_ks_two_sample",
    "q220_gd_linear_regression",
    # text/info-theory continuation: iterative vocab-graph TextRank,
    # token-entropy screen, contingency MI
    "q221_textrank_keywords",
    "q222_token_entropy_filter",
    "q223_mutual_information",
    "q224_weighted_sample",
    "q225_theil_sen_slope",
    "q226_label_centroid_cosine",
    "q227_power_iteration_pca",
    "q228_l_diversity",
    "q229_kaplan_meier",
    "q230_mann_kendall",
    "q231_js_divergence",
    "q232_best_split_gini",
    "q233_exact_auc",
    "q234_calibration_bins",
    "q235_psi_drift",
    "q236_als_one_step",
    # TPC-H completion batch: EXISTS semi-join, pure-pushdown Q6,
    # nation-pair star, profit rollup, returned top-k, priority
    # split, promo share, disjunctive Q19, pseudo-partsupp Q2/Q11/
    # Q16/Q20
    "q237_order_priority_check",
    "q238_forecast_revenue",
    "q239_shipping_volume",
    "q240_product_profit",
    "q241_returned_item_report",
    "q242_shipping_priority_split",
    "q243_promo_revenue_share",
    "q244_disjunctive_revenue",
    "q245_min_cost_supplier",
    "q246_important_stock",
    "q247_supplier_relationship_count",
    "q248_excess_stock_suppliers",
    "q249_stream_psi",
    "q250_average_precision",
    "q251_group_kfold",
    "q252_qq_table",
    "q253_effect_size",
    "q255_containment_pairs",
    # round-7 additions: dual-window NDCG, broadcast-centroid HOF
    # silhouette, vocab-join PMI collocations, bounded-grid BH/PAV
    "q256_ndcg",
    "q257_bh_fdr",
    "q258_silhouette",
    "q259_isotonic_calibration",
    "q260_pmi_collocations",
    "q261_spearman",
    "q262_permutation_test",
    "q263_mrr_recall",
    "q265_kmv_set_ops",
    "q266_stream_topk",
    "q267_adamic_adar",
    "q268_quota_allocation",
    "q269_wilson_ci",
    "q270_vocab_richness",
    "q271_fim_transform",
    "q272_zipf_fit",
    "q273_neyman_allocation",
    "q274_clustering_coefficient",
    "q275_diff_in_diff",
    "q276_trimmed_mean",
    # round-8 additions: star-edge verbatim clustering, LSH-sketched
    # node similarity (the wedge family's scale path), recursive Holt
    # recurrence, modularity reduction, EMD privacy audit, fanned
    # semi-join FK inference, SAX rollup
    "q83_verbatim_clusters",
    "q277_adjacency_sketch_pairs",
    "q278_holt_linear",
    "q279_brand_modularity",
    "q280_t_closeness",
    "q281_fk_inference",
    "q282_sax_symbols",
    "q283_ngram_novelty",
    "q284_waterfill_mixture",
    "q285_conformal_band",
    "q286_stream_cusum",
    "q287_tga_decode",
    "q288_woe_iv",
    "q289_seasonal_decompose",
    "q290_amoc_changepoint",
    "q291_brier_decomposition",
    "q292_simpson_audit",
    "q293_kendall_tau",
    "q294_lift_table",
    "q295_qoi_decode",
    "q296_degree_assortativity",
    "q297_ips_offpolicy",
    "q298_doubly_robust_ope",
    "q299_fairness_audit",
    "q300_logrank_test",
    "q301_page_hinkley",
    "q302_nelson_aalen",
    "q303_cmh_test",
    "q304_rater_agreement",
    "q305_sprt_monitor",
    "q306_cuped_adjustment",
    "q307_expected_calibration_error",
    "q308_cramer_von_mises",
    "q309_mase_backtest",
    "q310_anova_oneway",
    "q311_welch_ttest",
    "q312_partial_correlation",
    "q313_kruskal_wallis",
    "q314_brown_forsythe",
    "q315_durbin_watson",
    "q316_pcx_decode",
    "q317_nb_langid",
    "q318_luhn_pan_audit",
    "q319_markov_stationary",
    "q320_shapley_attribution",
    "q321_stream_sprt",
    "q322_rank_biased_overlap",
    "q323_binary_segmentation",
    "q324_seasonal_mann_kendall",
    "q325_decomposition_strength",
    # round-9 completeness sweep: every bench query >2 s now has a
    # measured scale row (r8 verdict #5 spirit) — iterative HITS and
    # LPA rounds, the Count-Min map-side collapse, the 10-moment
    # corr matrix, the two stream-stream joins (micro-batch-bound
    # cost class), the animated-GIF frame sampler, and the KM-curve
    # RMST reduction
    "q100_stream_stream_join",
    "q137_label_propagation",
    "q140_stream_outer_join",
    "q174_countmin_sketch",
    "q180_hits_scores",
    "q208_corr_matrix",
    "q359_gif_frame_sample",
    "q360_rmst",
    # round-9 window completeness: the ten rotated-in queries that
    # had no scale row yet (rank/agreement/forecast/codec families)
    "q328_pettitt_test",
    "q330_somers_gamma",
    "q331_hodges_lehmann",
    "q332_friedman_test",
    "q334_soundex_blocking",
    "q337_ico_decode",
    "q338_theta_forecast",
    "q340_mcnemar_test",
    "q342_page_trend",
    "q344_cochran_q",
    # round-11 new entries (growth rule: driver rows AND scale rows
    # at catalog entry) — planted-dup ANN promotions
    "q370_lsh_topk_planted",
    "q371_ivf_topk_planted",
    "q372_verbatim_dup_lsh",
    # (q178/q267/q274 — the round-11 dispatch consumers — already
    # appear earlier in this list; q178 flips to the minhash sketch
    # at 10x under its pinned 3.2M budget, q274 flips to the
    # oriented edge iteration (both routes exact), q267 pins the
    # exact route per the top-k fidelity measurement. Do NOT
    # re-append them: duplicate HEAVY entries re-run the 10x
    # measurements warm and overwrite the cold rows — round-11
    # review finding.)
]


def _shuffle_totals(spark) -> tuple[int, int]:
    """Sum shuffle read/write bytes over all completed stages via
    the local UI's REST API (cumulative since session start)."""
    base = spark.sparkContext.uiWebUrl
    apps = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        )
    )
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def run(sf1_dir: str) -> dict:
    sys.path.insert(0, "/root/repo")
    from car_insurance_data_pipeline_spark_spark.plans.catalog import (
        all_queries,
    )
    from car_insurance_data_pipeline_spark_spark.session import get_session

    # get_session defaults to spark.ui.enabled=false; this harness
    # needs the UI's REST API for stage-level shuffle metrics
    spark = get_session(
        app_name="bench-scale", extra_conf={"spark.ui.enabled": "true"}
    )
    qs = all_queries()
    # warm JVM + Python workers
    qs["q34_jaccard_pairs"](spark, "/root/testdata/sf0.001").count()

    import os

    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    heavy = (
        [n for n in HEAVY if n in set(only.split(","))] if only else HEAVY
    )
    out: dict[str, dict] = {}
    for name in heavy:
        out[name] = {}
        for tag, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
            rd0, wr0 = _shuffle_totals(spark)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            rd1, wr1 = _shuffle_totals(spark)
            out[name][tag] = {
                "wall_sec": round(wall, 2),
                "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
                "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
            }
        a, b = out[name]["sf0.1"], out[name]["sf1"]
        out[name]["wall_ratio_10x"] = round(
            b["wall_sec"] / max(a["wall_sec"], 1e-9), 1
        )
        out[name]["shuffle_write_ratio_10x"] = round(
            b["shuffle_write_mb"] / max(a["shuffle_write_mb"], 1e-9), 1
        )
    spark.stop()
    return out


if __name__ == "__main__":
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    print(json.dumps({"metric": "weak_scaling_10x", "queries": run(sf1)}))
