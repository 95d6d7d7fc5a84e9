#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline suite, where each
query's time is the MIN of $SPARK_GRAFT_BENCH_REPS interleaved runs
(default 3 up to 210 queries, 2 beyond — see the reps note in
main()). Min, not median (round-5 change): the round-4 "drift"
on q01/q08/q09 (+60% vs r3, unchanged plans) reproduced as pure
measurement noise — an isolated fresh-JVM rerun gave medians of
0.57/0.57/0.48 s, while the SAME queries after a full warmed-suite
pass ran 0.27/0.37/0.39 s (faster than any recorded round). Sub-
second queries are dominated by JIT/compilation state and ambient
load, and the median tracks that noise; the min of interleaved reps
(the last rep runs fully warmed) estimates the PLAN's cost, which
is what round-over-round comparison is for. Medians are still
emitted under "queries_median". Results are consumed via count() so
driver-side collect overhead never dominates the measurement.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline queries: the flagship join+agg, the heavy scan agg, the
# window/sessionization pipeline, dedup, and similarity search —
# one per major operator family.
HEADLINE = [
    "q01_pricing_summary",
    "q02_market_segment_revenue",
    "q08_nation_revenue",
    "q09_datekey_join",
    "q14_trip_stats",
    "q16_topk",
    "q21_driver_risk_scores",
    "q24_sessionization",
    "q29_fingerprint",
    "q31_text_metrics",
    "q34_jaccard_pairs",
    "q73_dedup_clusters",
    "q35_minhash_lsh_pairs",
    "q38_cosine_topk",
    "q41_embedding_dup_pairs",
    "q51_asof_join",
    "q65_local_supplier_volume",
    "q72_embedding_dup_lsh",
    "q79_pack_sequences",
    "q83_verbatim_clusters",
    "q84_pii_scrub",
    "q85_incremental_dedup",
    "q86_unigram_quality",
    "q87_temperature_mixture",
    "q90_shuffle_shards",
    "q91_source_cap",
    "q94_boilerplate_strip",
    "q95_token_budget_select",
    "q96_bigram_lm_quality",
    "q98_column_profile",
    "q99_referential_integrity",
    # streaming state + Arrow UDAF: cost classes the suite didn't
    # time before round 4
    "q100_stream_stream_join",
    "q103_mad_by_lang",
    # round-4 operators: star fact build, cross-doc span removal
    "q105_fact_snapshot",
    "q106_span_removal",
    # round-4 lifecycle operators: snapshot diff, SCD2 history,
    # SemDeDup survivors, key-skew diagnostics, BM25 ranking
    "q107_snapshot_diff",
    "q108_scd2_history",
    "q109_semdedup_survivors",
    "q110_key_skew_report",
    "q111_bm25_rank",
    "q112_oversample",
    "q114_mad_outliers",
    "q115_retention_cohorts",
    # custom-state streaming (applyInPandasWithState): its own cost
    # class — Arrow state round-trips per micro-batch
    "q116_stateful_running_stats",
    # round-4 late additions: funnel, BPE merge pairs, int8 ANN,
    # incremental aggregate maintenance
    "q123_funnel_conversion",
    "q124_bpe_merge_pairs",
    "q125_quantized_ann",
    "q126_incremental_agg_merge",
    # multimodal decode (mapInPandas over binary columns): the
    # Arrow-batched Python decode path is its own cost class
    "q118_image_decode",
    # round-5: REAL compressed-codec decode (zlib inflate + PNG
    # filter reconstruction) — per-row Python decode cost class
    "q143_png_decode",
    # round-6: entropy-coded DCT codec (Huffman + IDCT per payload) —
    # the per-row Python decode cost class at its heaviest
    "q181_jpeg_decode",
    # training-set assembly: hash split, curriculum binning, window
    # rank profile
    "q127_dataset_split",
    "q128_curriculum_bins",
    "q129_rank_profile",
    # tokenizer apply: vocab-bounded train + Arrow segment + join-back
    "q132_bpe_tokenize",
    # record linkage (blocked levenshtein self-join) + sweep-line
    # interval concurrency — the edit-distance and interval-overlap
    # cost classes
    "q133_fuzzy_pairs",
    "q134_max_concurrency",
    # iterative graph centrality (adaptive numpy/Pregel pagerank over
    # the mined near-dup graph)
    "q113_pagerank_centrality",
    # round-5 window entrants with distinct cost classes: bloom-bitmap
    # build+probe, Expand-based grouping sets, JSON parse codegen,
    # degree-oriented wedge join
    "q117_bloom_prefilter_join",
    "q121_grouping_sets",
    "q130_json_extract",
    "q135_triangle_copurchase",
    # round-5 addition: iterative clustering (driver-loop Lloyd with
    # bounded k×dim collects) — the multi-job iterative cost class
    "q136_kmeans_clusters",
    # round-5: bounded-depth BFS (frontier join + anti-join per hop)
    # and fixed-round k-core peeling (degree agg + two semi-joins
    # per round, monotonically shrinking edge state)
    "q144_shortest_paths",
    "q145_kcore",
    # round-5: two-phase distributive Pareto frontier (mapInPandas
    # prune + grouped exact merge)
    "q148_skyline",
    # round-5 additions: synchronous LPA rounds, MG sketch + exact close
    "q137_label_propagation",
    "q138_heavy_hitters",
    # outer stream-stream join: watermark-driven null emission is its
    # own cost class (no-data micro-batch flush on top of q100's)
    "q140_stream_outer_join",
    # recursive CTE: iterated frontier-join execution (UnionLoop)
    "q141_recursive_hierarchy",
    # incremental join-view maintenance: four delta-algebra legs over
    # one orderkey exchange family
    "q142_incremental_join_merge",
    # round-5 analytics batch, one per new cost class: sequence lead
    # window (transitions), co-located basket self-join (association
    # rules), per-segment exact-quantile windows (Lorenz deciles),
    # benchmark-shingle broadcast LEFT probe (contamination score),
    # map-side-collapsing sketch build (Count-Min)
    "q164_markov_transitions",
    "q171_association_rules",
    "q170_revenue_concentration",
    "q173_contamination_score",
    "q174_countmin_sketch",
    # lossless prefix-filtered exact Jaccard: rarity-ordered prefix
    # postings + candidate-scale verify joins — the exact-dedup cost
    # class without q34's df-cut
    "q178_prefix_jaccard",
    # round-6 additions, one per new cost class: TakeOrdered sketch
    # top-k (KMV), per-doc lead+min windows (winnowing), wedge-
    # expansion join (adjacency Jaccard), grid-bucketed density join
    # (DBSCAN)
    "q182_kmv_distinct",
    "q183_winnowing",
    "q184_node_similarity",
    "q185_dbscan_labels",
    # round-6 late: SCD2 point-in-time residual-range join, native
    # session_window, grid-explode linear interpolation
    "q192_pit_join",
    "q193_session_window",
    "q194_linear_interp",
    # round-6 continuation, one per new cost class: cohort window
    # family over orders, four-stage chained funnel windows (one
    # exchange), per-user trigram collapse reusing the window
    # distribution, CUBE Expand aggregate, 10-moment-column wide
    # aggregate, integer Z-order encode fused into the scan
    "q199_cohort_retention",
    "q200_funnel_stages",
    "q205_sequence_support",
    "q207_cube_revenue",
    "q208_corr_matrix",
    "q210_geohash_cells",
    # TPC-H-plus batch: double orderkey rollup reusing one hash
    # distribution (Q21 shape); hourly pre-agg + 4-lag stack ACF
    "q212_sole_late_supplier",
    "q214_hourly_acf",
    # seven-table broadcast-star conditional share (Q8 shape);
    # histogram rank transform (MW-U); three-pass broadcast-state GD
    "q216_market_share",
    "q218_mann_whitney_u",
    "q220_gd_linear_regression",
    # iterative vocab-graph rank over a checkpointed edge frame;
    # fact-wide token explode + single-exchange entropy rollup
    "q221_textrank_keywords",
    "q222_token_entropy_filter",
    # time-bound quadratic pair join over the checkpointed daily
    # series (Theil-Sen median slope); three checkpointed matvec
    # rounds (power-iteration PCA)
    "q225_theil_sen_slope",
    "q227_power_iteration_pca",
    # recursive product-limit survival curve (UnionLoop over the
    # risk table)
    "q229_kaplan_meier",
    # TPC-H completion: TakeOrdered returned-revenue rollup; window-
    # decorrelated min-cost supplier over the pseudo-partsupp build
    "q241_returned_item_report",
    "q245_min_cost_supplier",
    # streaming drift monitor: multi-batch windowed aggregation +
    # batch-side PSI grid arithmetic
    "q249_stream_psi",
    # round-7 additions, one per new cost class: dual row_number
    # windows on one user exchange (NDCG), per-row HOF fold against
    # a broadcast centroid struct (silhouette), vocab-scale unigram
    # attach joins + TakeOrdered (PMI collocations)
    "q256_ndcg",
    "q258_silhouette",
    "q260_pmi_collocations",
    # round-7 continuation: histogram rank-attach joins (Spearman),
    # entity-level permutation grid (K×users partial agg), IFD-walk
    # TIFF decode (Arrow narrow map), merged-sketch set algebra
    # (three TakeOrdered passes)
    "q261_spearman",
    "q262_permutation_test",
    "q264_tiff_decode",
    "q265_kmv_set_ops",
    # streaming per-window leaderboard (cross-batch keyed state +
    # batch-side rank); degree-weighted wedge rollup
    "q266_stream_topk",
    "q267_adamic_adar",
    # zero-shuffle narrow transform (FIM) and vocab-histogram OLS
    "q271_fim_transform",
    "q272_zipf_fit",
    # per-node wedge+closure joins (local clustering coefficient)
    "q274_clustering_coefficient",
    # the wedge family's LSH sketch path (banded candidates, exact
    # verify) — what 100 TB actually runs instead of q184/q267/q274
    "q277_adjacency_sketch_pairs",
    # round-8: time-bound recurrences (Holt driver step, conformal
    # rank), one-pass graph/grid reductions (modularity, t-closeness,
    # FK containment, SAX), the shingle-substrate novelty screen,
    # and the streaming CUSUM monitor
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
    "q326_ljung_box",
    "q327_wasserstein_drift",
    "q328_pettitt_test",
    "q329_cliffs_delta",
    "q330_somers_gamma",
    "q331_hodges_lehmann",
    "q332_friedman_test",
    "q333_rake_keywords",
    "q334_soundex_blocking",
    "q335_fellegi_sunter",
    "q336_ulaw_audio_decode",
    "q337_ico_decode",
    "q338_theta_forecast",
    "q339_hoeffding_d",
    "q340_mcnemar_test",
    "q341_jonckheere_terpstra",
    "q342_page_trend",
    "q343_burrows_delta",
    "q344_cochran_q",
    "q345_knn_loo_accuracy",
    "q346_matrix_profile",
    "q347_stream_wasserstein",
    "q348_good_turing",
    "q349_dedup_capture_recapture",
    "q350_texttiling_boundaries",
    "q351_rendezvous_rebalance",
    "q352_holm_hochberg",
    "q353_james_stein",
    "q354_krippendorff_alpha",
    "q355_bradley_terry",
    "q356_theil_inequality",
    "q357_dtw_distance",
    "q358_randomness_tests",
    "q359_gif_frame_sample",
    "q360_rmst",
    "q361_goodman_kruskal_lambda",
    "q362_stuart_maxwell",
    "q363_tail_index",
    "q364_term_burstiness",
    "q365_embedding_isotropy",
    "q366_fleiss_kappa",
    # round-10 new entries: reliability/concordance closes, lattice
    # autocorrelation (one corpus exchange + grid-sized joins each)
    "q367_cronbach_alpha",
    "q368_morans_i",
    "q369_kendalls_w",
    # round-11 new entries: planted-dup ANN promotions (LSH top-1
    # and IVF top-1 against brute-force oracles). q370's wall is
    # bucket-hash bound (4 OR-amplified tables × nbits interpreted
    # hyperplane dots per corpus row) — measured sub-linear at 10×
    # (1.5× wall, ~0 shuffle; SCALE_CHECK.md round-11 rows).
    "q370_lsh_topk_planted",
    "q371_ivf_topk_planted",
    "q372_verbatim_dup_lsh",
    # round-9 suite widening (r8 verdict #5): every parked batch
    # family that wasn't yet in the headline suite earns a bench row
    # so round-over-round regressions on parked queries are caught
    # by the DRIVER's bench, not only the local SCALE_CHECK probes.
    # Exclusion rule for what remains outside the suite: (a) parked
    # STREAMING queries (q71/q80/q93/q97/q102/q155) — micro-batch
    # wall is scheduler-bound, each streaming cost class already has
    # a benched representative (q100/q116/q140/q249/q266/q286/q321/
    # q347); (b) rows-only ANN/sketch variants sharing a benched
    # sibling's plan shape (q36/q39/q40/q47/q59/q60/q92/q139/q176 vs
    # q35/q38/q41/q125); (c) sub-second relational singletons from
    # rounds 1-2 whose exact plan family (scan+filter+agg/window) is
    # benched via q01-q24 (q03/q04/q05/q07/q10/q11/q13/q15/q22/...).
    "q232_best_split_gini",
    "q263_mrr_recall",
    "q268_quota_allocation",
    "q269_wilson_ci",
    "q270_vocab_richness",
    "q273_neyman_allocation",
    "q275_diff_in_diff",
    "q276_trimmed_mean",
    "q211_large_volume_orders",
    "q213_idle_rich_customers",
    "q215_custdist",
    "q217_top_revenue_suppliers",
    "q219_ks_two_sample",
    "q223_mutual_information",
    "q224_weighted_sample",
    "q226_label_centroid_cosine",
    "q228_l_diversity",
    "q230_mann_kendall",
    "q231_js_divergence",
    "q233_exact_auc",
    "q234_calibration_bins",
    "q235_psi_drift",
    "q236_als_one_step",
    "q237_order_priority_check",
    "q238_forecast_revenue",
    "q239_shipping_volume",
    "q240_product_profit",
    "q242_shipping_priority_split",
    "q243_promo_revenue_share",
    "q244_disjunctive_revenue",
    "q246_important_stock",
    "q247_supplier_relationship_count",
    "q248_excess_stock_suppliers",
    "q250_average_precision",
    "q251_group_kfold",
    "q252_qq_table",
    "q253_effect_size",
    "q254_bmp_decode",
    "q255_containment_pairs",
    "q257_bh_fdr",
    "q259_isotonic_calibration",
    "q163_benford_digits",
    "q165_attribution_matrix",
    "q166_time_weighted_avg",
    "q167_sentence_stats",
    "q172_rfm_segments",
    "q177_bootstrap_ci",
    "q179_quantile_normalize",
    "q180_hits_scores",
    "q187_rank_fusion",
    "q190_unpivot",
    "q191_listagg",
    "q195_sql_scripting",
    "q196_hash_classifier",
    "q197_sampled_quantiles",
    "q201_trend_ols",
    "q202_ab_ztest",
]


def compute_movers(
    prev_path: str, timings: dict[str, float], load_factor: float
) -> dict:
    """Round-over-round mover detection (r9 verdict #5): the carried-
    query comparison used to be hand-written prose in BASELINE.md —
    emit it mechanically instead. Compare each carried query's
    load-corrected min against the PREVIOUS BENCH_DETAIL.json (read
    before this run overwrites it) and list everything that moved
    >1.5x in either direction. The noise floor skips queries under
    0.5 s (load-corrected) in both rounds: sub-second timings are
    JIT/GC-dominated (the module-docstring r4 evidence) and a
    0.1 -> 0.2 s "2x" is ambient, not a plan change."""
    movers: dict[str, dict] = {}
    carried_ratios: list[float] = []
    n_bad_prev = 0
    # "carried" = present in BOTH rounds, whether or not a ratio
    # could be computed; "new" = absent from the previous round.
    # Counting skipped-carried entries (malformed / non-positive
    # prev values) as "new" overstated n_new whenever
    # n_bad_prev_entries > 0 (round-10 advice) — track presence
    # separately so the accounting matches the labels.
    n_carried_present = 0
    # narrow try: only the file read/parse may abort the whole diff
    # (first run / unreadable file). Per-entry problems must NOT —
    # a single malformed prev value aborting the loop mid-iteration
    # would silently truncate the regression gate (round-10 code
    # review F5), so each entry gets its own guard below.
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = None
    if prev is not None:
        prev_q = prev.get("queries", {}) or {}
        try:
            prev_load = float(prev.get("load_factor", 1.0)) or 1.0
        except (TypeError, ValueError):
            prev_load = 1.0
        for name, cur_t in timings.items():
            if name not in prev_q:
                continue
            n_carried_present += 1
            try:
                prev_norm = float(prev_q[name]) / prev_load
            except (TypeError, ValueError):
                n_bad_prev += 1
                continue
            cur_norm = cur_t / load_factor
            if prev_norm <= 0:
                n_bad_prev += 1
                continue
            ratio = cur_norm / prev_norm
            carried_ratios.append(ratio)
            if (ratio > 1.5 or ratio < (1 / 1.5)) and max(
                prev_norm, cur_norm
            ) >= 0.5:
                movers[name] = {
                    "prev_norm_sec": round(prev_norm, 3),
                    "cur_norm_sec": round(cur_norm, 3),
                    "ratio": round(ratio, 2),
                    # raw ratio beside the corrected one: when the two
                    # runs' load factors differ a lot, linear load
                    # correction over-corrects scheduling-bound
                    # queries (iterative/driver-loop walls do not
                    # scale with CPU contention) — a "mover" whose
                    # raw ratio is ~1 is a normalization-regime
                    # artifact, not a plan change (round-10 q136
                    # isolation evidence in BASELINE.md).
                    "raw_ratio": round(cur_t / float(prev_q[name]), 2),
                }
    return {
        "n_carried": len(carried_ratios),
        "n_bad_prev_entries": n_bad_prev,
        "n_new": len(timings) - n_carried_present,
        "carried_median_ratio": (
            round(statistics.median(carried_ratios), 3)
            if carried_ratios
            else None
        ),
        "threshold": "load-corrected ratio >1.5x either way, >=0.5s",
        "movers": dict(
            sorted(movers.items(), key=lambda kv: -kv[1]["ratio"])
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries
    from car_insurance_data_pipeline_spark_spark.session import get_session

    spark = get_session(app_name="bench")
    qs = all_queries()

    # Warm the JVM/session on the smallest fixture so first-query cost
    # reflects the plan, not JIT/classloading — and warm the Python
    # worker pool (an Arrow query) so the first applyInPandas query
    # isn't charged the one-time ~3 s worker/fork startup either.
    qs["q02_market_segment_revenue"](spark, "/root/testdata/sf0.001").count()
    qs["q41_embedding_dup_pairs"](spark, "/root/testdata/sf0.001").count()

    # Default reps: 3 up to ~210 queries (the historical suite size),
    # 2 for the round-9 widened 262-query suite — a full 3-rep pass
    # at 262 queries measured ~20-27 min on a 2×-loaded machine,
    # uncomfortably close to harness timeouts, while min-of-2
    # interleaved reps (the second fully warmed) still estimates plan
    # cost (the min metric's purpose; see module docstring). Explicit
    # SPARK_GRAFT_BENCH_REPS always wins.
    default_reps = "3" if len(HEADLINE) <= 210 else "2"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", default_reps))
    timings: dict[str, float] = {}
    # Interleave rounds (ABC ABC ABC, not AAA BBB CCC) so one query's
    # repeats don't all land in the same GC/compilation window.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    import gc

    from pyspark.sql import functions as F

    def calibration() -> float:
        """Fixed-cost machine-load probe (r6 verdict #4): a
        data-independent 50M-row range aggregation whose plan never
        changes round to round. BENCH_r06 ran ~17-30% above the
        repo's own back-to-back band purely from driver-machine
        co-tenancy; this row lets readers normalize — divide suite
        wall by (calibration_sec / the idle-machine value pinned in
        BASELINE.md) before comparing rounds."""
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).select(
            F.sum(F.col("id") % 7)
        ).collect()
        return time.perf_counter() - t0

    cal_samples: list[float] = []

    def release_blocks() -> None:
        # Each bench query is an independent job; in production each
        # would run in its own session.  localCheckpoint() persists
        # its RDD, and those blocks outlive the query (1–4 per dedup/
        # packing query, ×48 queries ×3 reps) — the accumulated
        # storage-memory pressure measurably inflates the matmul
        # queries (q41 2.2 s isolated → 5.2 s under suite pressure).
        # Unpersist everything between queries so each timing reflects
        # the plan, not its neighbours' leftovers.
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in m.values():
            jrdd.unpersist(False)
        spark.catalog.clearCache()
        gc.collect()

    for _ in range(reps):
        cal_samples.append(calibration())
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
            release_blocks()
    cal_samples.append(calibration())
    medians: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(min(samples[name]), 3)
        medians[name] = round(statistics.median(samples[name]), 3)

    total = round(sum(timings.values()), 3)
    # Round-6 output restructure: BENCH_r05.json came back
    # ``parsed: null`` because the single 70-query JSON line (min +
    # median maps + notes) outgrew the driver's tail-capture buffer
    # and was truncated mid-line. The driver keeps the TAIL of
    # stdout, so the LAST line must be the one guaranteed to parse:
    # print the full per-query detail first (and persist it to
    # BENCH_DETAIL.json for round-over-round diffing), then a
    # compact headline line — suite wall, query count, sf, the ten
    # slowest queries — sized well under any plausible tail buffer.
    cal = {
        "min": round(min(cal_samples), 3),
        "median": round(statistics.median(cal_samples), 3),
        "max": round(max(cal_samples), 3),
    }
    # Load-normalized wall (r7 verdict #7): divide the raw suite wall
    # by how hot the machine ran relative to the pinned idle
    # calibration band (BASELINE.md: 0.20 s median), so round-over-
    # round comparisons need no manual correction. A 1.7x-hot driver
    # machine (r7: median 0.336) reads the same normalized number an
    # idle one would.
    IDLE_CALIBRATION_SEC = 0.20
    load_factor = max(cal["median"] / IDLE_CALIBRATION_SEC, 1.0)
    normalized = round(total / load_factor, 3)
    movers_block = compute_movers(
        os.path.join(REPO, "BENCH_DETAIL.json"), timings, load_factor
    )
    detail = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "value_normalized": normalized,
        "load_factor": round(load_factor, 3),
        "queries": timings,
        "queries_median": medians,
        "calibration_sec": cal,
        "movers": movers_block,
        "sf": sf,
        "notes": (
            "per-query time = min of interleaved reps (plan-cost "
            "estimator; see module docstring for the r4 q01/q08/q09 "
            "drift isolation evidence)."
        ),
    }
    print(json.dumps(detail))
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout detail line still has it
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    # r11 verdict #8: the r10 driver capture truncated mid-JSON
    # because this line's size was unbounded (the movers dict grows
    # with however many queries moved that round). Cap the compact
    # line's movers at the 8 largest |log ratio| — the FULL movers
    # block is in BENCH_DETAIL.json and the detail stdout line above.
    _mv = movers_block.get("movers", {})
    capped_movers = dict(movers_block)
    capped_movers["movers"] = dict(
        sorted(
            _mv.items(),
            key=lambda kv: -abs(math.log(max(kv[1]["ratio"], 1e-9))),
        )[:8]
    )
    capped_movers["n_movers_total"] = len(_mv)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "value_normalized": normalized,
                "load_factor": round(load_factor, 3),
                "sf": sf,
                "queries": slowest,
                "queries_count": len(timings),
                "calibration_sec": cal,
                "movers": capped_movers,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
