"""Model-governance readout — the pre-deployment review pack an ML
platform runs before promoting a policy/classifier, composed from
oracle-verified catalog queries over one logged event stream:

    counterfactual value:  IPS + SNIPS off-policy estimate  (q297)
    robust value:          doubly-robust estimate           (q298)
    group fairness:        demographic parity + equalized
                           odds ppm gaps per segment        (q299)
    label quality:         Cohen's kappa + McNemar between
                           the cheap rule and the reference (q304)
    calibration:           Brier score + Murphy terms       (q291)
    targeting power:       cumulative gains / lift deciles  (q294)
    confounding:           CMH stratified association test  (q303)
    credit assignment:     exact Shapley channel attribution (q320)

Run directly (defaults to the sf0.001 fixture):

    python examples/model_governance_readout.py [SF_DIR]

Every number is the deterministic integer/ppm form the catalog
verifies against DuckDB. At 100 TB the whole pack is a handful of
broadcast joins plus dimension-sized aggregates over ONE scan of
the logged fact — adding a governance gate to a deployment pipeline
costs no additional fact passes.
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
    spark = get_session(app_name="model-governance-readout")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    ips = qs["q297_ips_offpolicy"](spark, sf_dir).collect()[0]
    print(
        f"off-policy   IPS {ips.ips_nano / 1e9:,.3f}  "
        f"SNIPS {ips.snips_micro / 1e6:,.3f}  "
        f"(matched {ips.n_matched}/{ips.n} logged rows)"
    )

    dr = qs["q298_doubly_robust_ope"](spark, sf_dir).collect()[0]
    print(
        f"doubly-robust DR {dr.dr_sum_micro / dr.n / 1e6:,.3f}  "
        f"(direct {dr.dm_nano / 1e9:,.3f}, "
        f"correction {dr.corr_sum_micro / dr.n / 1e6:+,.3f})"
    )

    fair = qs["q299_fairness_audit"](spark, sf_dir).collect()
    gaps = fair[0]
    print(
        f"fairness     dp gap {gaps.dp_gap_ppm / 1e4:.2f}pp  "
        f"tpr gap {gaps.tpr_gap_ppm / 1e4:.2f}pp  "
        f"fpr gap {gaps.fpr_gap_ppm / 1e4:.2f}pp "
        f"across {len(fair)} segments"
    )
    for r in sorted(fair, key=lambda r: r.segment):
        print(
            f"  {r.segment:<12} ppr {r.ppr_ppm / 1e4:5.2f}%  "
            f"tpr {r.tpr_ppm / 1e4:5.2f}%  fpr {r.fpr_ppm / 1e4:5.2f}%"
        )

    agree = qs["q304_rater_agreement"](spark, sf_dir).collect()[0]
    print(
        f"agreement    kappa {agree.kappa_ppm / 1e6:+.4f}  "
        f"McNemar chi2 {agree.mcnemar_chi2_milli / 1e3:,.1f}  "
        f"(discordant {agree.n10}+{agree.n01} of {agree.n})"
    )

    brier = qs["q291_brier_decomposition"](spark, sf_dir).collect()[0]
    print(
        f"calibration  Brier {brier.bs_ppm / 1e6:.4f}  "
        f"reliability {brier.rel_pico / 1e12:.4f}  "
        f"resolution {brier.res_pico / 1e12:.4f}  "
        f"uncertainty {brier.unc_ppm / 1e6:.4f}"
    )

    lift = qs["q294_lift_table"](spark, sf_dir).collect()
    top = min(lift, key=lambda r: r.decile)
    print(
        f"targeting    top decile lift {top.lift_ppm / 1e6:.2f}x, "
        f"captures {top.capture_ppm / 1e4:.1f}% of outcomes"
    )

    cmh = qs["q303_cmh_test"](spark, sf_dir).collect()[0]
    print(
        f"confounding  CMH chi2 {cmh.cmh_chi2_micro / 1e6:.3f}  "
        f"MH odds ratio {cmh.or_mh_milli / 1e3:.3f} "
        f"across {cmh.n_strata} strata"
    )

    shap = sorted(
        qs["q320_shapley_attribution"](spark, sf_dir).collect(),
        key=lambda r: -r.share_ppm,
    )
    print(
        "attribution  "
        + "  ".join(
            f"{r.channel} {r.share_ppm / 1e4:.1f}%" for r in shap
        )
        + "  (exact Shapley credit)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
