"""Survival-analysis readout — the time-to-event pack a growth /
reliability team runs over an event stream, composed from
oracle-verified catalog queries:

    survival curve:     Kaplan-Meier product limit     (q229)
    cumulative hazard:  Nelson-Aalen prefix sum        (q302)
    group comparison:   log-rank (Mantel-Cox) test     (q300)

All three share ONE substrate: the per-user (duration, event,
censored) collapse and the duration-ordered risk table. The pack
demonstrates the scale trade the catalog encodes: the KM PRODUCT
needs an integer recursive CTE (UnionLoop over the time dimension),
while the NA hazard SUM is a plain window prefix — at 100 TB both
cost the same two exchanges, but only the sum is recursion-free.

Run directly (defaults to the sf0.001 fixture):

    python examples/survival_analysis.py [SF_DIR]
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
    spark = get_session(app_name="survival-analysis")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    km = sorted(
        qs["q229_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.dur_days,
    )
    na = {
        r.dur_days: r
        for r in qs["q302_nelson_aalen"](spark, sf_dir).collect()
    }
    print(
        f"{'day':>4} {'at risk':>8} {'events':>7} {'censored':>9} "
        f"{'KM S(t)':>8} {'NA H(t)':>8}"
    )
    for r in km[:12]:
        h = na[r.dur_days]
        print(
            f"{r.dur_days:>4} {r.n_risk:>8} {r.d_events:>7} "
            f"{r.c_censored:>9} {r.s_ppm / 1e6:>8.4f} "
            f"{h.h_cum_micro / 1e6:>8.4f}"
        )
    if len(km) > 12:
        last = km[-1]
        print(
            f"  ... {len(km) - 12} more rows; final S = "
            f"{last.s_ppm / 1e6:.4f} at day {last.dur_days}"
        )

    lr = qs["q300_logrank_test"](spark, sf_dir).collect()[0]
    print(
        f"\nlog-rank A(n={lr.n1}, events={lr.d1_total}) vs "
        f"B(n={lr.n2}, events={lr.d2_total}): "
        f"chi2 = {lr.chi2_micro / 1e6:.4f}  "
        f"(O-E = {lr.oe_sum_micro / 1e6:+.3f}, "
        f"Var = {lr.var_sum_micro / 1e6:.3f}; 1 df, "
        f"5% critical value 3.841)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
