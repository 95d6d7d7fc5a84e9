"""A/B experiment readout with the engine — the decision pack an
experimentation platform produces per experiment, composed from
oracle-verified catalog queries over one event stream:

    conversion:  two-proportion z-test           (q202)
    magnitude:   Mann-Whitney U on raw values    (q218)
    shape:       Kolmogorov-Smirnov max CDF gap  (q219)
    sanity:      type x hour mutual information  (q223 — a high MI
                 against assignment-correlated features flags a
                 broken randomizer; here it profiles the metric's
                 own seasonality)
    whole-curve: Cramér-von Mises integrated gap (q308)
    sequential:  Wald SPRT early-stopping walk    (q305)
    sensitivity: CUPED variance reduction         (q306)

Run directly (defaults to the sf0.001 fixture):

    python examples/experiment_readout.py [SF_DIR]

Every statistic is the deterministic form the catalog verifies
against DuckDB: exact integer rank/count arithmetic end to end,
one IEEE closed form per statistic, FLOOR-ppm quantization. At
100 TB the same pack runs per experiment_id by adding it as a
grouping key — the substrates (per-user collapse, distinct-value
histogram, contingency grid) each cost ONE exchange regardless of
how many experiments share the stream.
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
    spark = get_session(app_name="experiment-readout")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    z = qs["q202_ab_ztest"](spark, sf_dir).first()
    print(
        f"conversion  A {z['rate_a_ppm'] / 1e4:.2f}%  "
        f"B {z['rate_b_ppm'] / 1e4:.2f}%  "
        f"z = {(z['z_ppm'] or 0) / 1e6:+.3f}"
    )

    u = qs["q218_mann_whitney_u"](spark, sf_dir).first()
    print(
        f"magnitude   n_a {u['n_a']}  n_b {u['n_b']}  "
        f"U_A = {u['u2_a'] / 2:.1f}  z = {(u['z_ppm'] or 0) / 1e6:+.3f}"
    )

    k = qs["q219_ks_two_sample"](spark, sf_dir).first()
    print(
        f"shape       D = {k['d_ppm'] / 1e6:.4f} at value "
        f"{k['ks_at_milli'] / 1e3:.3f}  "
        f"scaled = {k['ks_scaled_ppm'] / 1e6:.3f}"
    )

    m = qs["q223_mutual_information"](spark, sf_dir).first()
    print(
        f"seasonality MI(type; hour) = {m['mi_pico'] / 1e12:.5f} bits  "
        f"(NMI {m['nmi_ppm'] / 1e4:.2f}%)"
    )

    c = qs["q308_cramer_von_mises"](spark, sf_dir).first()
    print(
        f"whole-curve CvM T = {c['cvm_t_micro'] / 1e6:.4f}  "
        f"(integrates the squared CDF gap KS takes the max of)"
    )

    s = qs["q305_sprt_monitor"](spark, sf_dir).first()
    state = {1: "accept H1", -1: "accept H0", 0: "keep sampling"}[
        s["decision"]
    ]
    print(
        f"sequential  SPRT LLR = {s['final_llr_micro'] / 1e6:+.3f} "
        f"after {s['n_days']} days -> {state}"
        + (
            f" (crossed on day {s['decision_rn']})"
            if s["decision"] != 0
            else ""
        )
    )

    cu = qs["q306_cuped_adjustment"](spark, sf_dir).first()
    print(
        f"sensitivity CUPED theta = {cu['theta_micro'] / 1e6:+.4f}, "
        f"variance cut {cu['rho2_ppm'] / 1e4:.2f}% "
        f"({cu['n_users']} users)"
    )

    verdict = "SHIP" if abs((z["z_ppm"] or 0)) > 1_960_000 else "NO DECISION"
    print(f"verdict     {verdict} (two-sided 5% gate on the z statistic)")
    spark.stop()


if __name__ == "__main__":
    main()
