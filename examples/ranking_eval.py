"""Ranking / model-quality evaluation pack — the metrics page a
search or recommender team reads per model version, composed from
oracle-verified catalog queries over one scored event stream:

    ranking:      NDCG@10 (graded relevance)        (q256)
    first hit:    MRR + recall@10                   (q263)
    PR summary:   exact average precision           (q250)
    ROC summary:  exact AUC + Gini                  (q233)
    calibration:  reliability bins + isotonic fit   (q234, q259)
    stability:    PSI vs the reference window       (q235)
    significance: BH-FDR over segment deltas        (q257)

Run directly (defaults to the sf0.001 fixture):

    python examples/ranking_eval.py [SF_DIR]

Every metric is the deterministic form the catalog verifies against
DuckDB — pico-floored discount/ratio terms before integer sums,
histogram substrates instead of per-row sorts — so the readout is
bit-reproducible across runs and partitionings. At 100 TB the same
pack is per-model_version: each metric's substrate (user windows,
score histogram, 10-bin grid) costs one exchange regardless of how
many versions share the stream.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries
from car_insurance_data_pipeline_spark_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="ranking-eval")
    qs = all_queries()

    ndcg = qs["q256_ndcg"](spark, sf_dir).collect()[0]
    mrr = qs["q263_mrr_recall"](spark, sf_dir).collect()[0]
    ap = qs["q250_average_precision"](spark, sf_dir).collect()[0]
    auc = qs["q233_exact_auc"](spark, sf_dir).collect()[0]
    iso = sorted(
        qs["q259_isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    psi = qs["q235_psi_drift"](spark, sf_dir).collect()[0]
    fdr = qs["q257_bh_fdr"](spark, sf_dir).collect()

    print("== ranking quality ==")
    print(
        f"NDCG@10  mean {ndcg.mean_ndcg_ppm / 1e6:.4f}"
        f"  (min {ndcg.min_ndcg_ppm / 1e6:.4f},"
        f" max {ndcg.max_ndcg_ppm / 1e6:.4f},"
        f" n_users {ndcg.n_users})"
    )
    print(
        f"MRR      {mrr.mrr_ppm / 1e6:.4f}"
        f"   recall@10 {mrr.mean_recall10_ppm / 1e6:.4f}"
    )
    print("== classifier quality ==")
    print(f"AP       {ap.ap_pico / 1e12:.6f}   (n_pos {ap.n_pos})")
    print(
        f"AUC      {auc.auc_ppm / 1e6:.4f}   Gini {auc.gini_ppm / 1e6:.4f}"
    )
    print("== calibration (observed -> isotonic fit, per score bin) ==")
    for r in iso:
        bar = "#" * max(1, r.iso_rate_ppm // 50_000)
        print(
            f"  bin {r.bin}: obs {r.obs_rate_ppm / 1e6:.3f}"
            f" -> iso {r.iso_rate_ppm / 1e6:.3f}  {bar}"
        )
    print("== stability & significance ==")
    verdict = (
        "stable"
        if psi.psi_pico < 100_000_000_000
        else ("watch" if psi.psi_pico < 250_000_000_000 else "action")
    )
    print(f"PSI      {psi.psi_pico / 1e12:.4f}  ({verdict})")
    n_rej = sum(1 for r in fdr if r.rejected == 1)
    print(
        f"BH-FDR   {n_rej}/{len(fdr)} segment deltas significant"
        f" at FDR 0.1"
    )
    spark.stop()


if __name__ == "__main__":
    main()
