"""Drift-monitoring panel — the distribution-shift readout a data
platform runs per feed before retraining decisions, composed from
oracle-verified catalog queries over one event stream:

    mass distance:     1-D Wasserstein early/late per type   (q327)
    shape test:        two-sample Kolmogorov-Smirnov         (q219)
    reweighting index: PSI against the reference histogram   (q235)
    location test:     Mann-Whitney U (+ effect size via
                       Cliff's delta on the return flags)    (q218/q329)
    regime break:      Pettitt rank change-point             (q328)
    serial structure:  Ljung-Box portmanteau per type        (q326)
    shape anomaly:     matrix-profile top discord            (q346)
    live monitors:     streaming W1 + PSI per 3-day window   (q347/q249)

Run directly (defaults to the sf0.001 fixture):

    python examples/drift_monitoring_panel.py [SF_DIR]

Every number is the deterministic integer/ppm form the catalog
verifies against DuckDB. The batch battery is histogram/dimension
-bound after one fact scan each; the two live monitors share one
(window, bin) streaming state shape — at production volume the
whole panel is a fixed-size state store plus grid arithmetic.
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
    spark = get_session(app_name="drift-monitoring-panel")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    w1 = qs["q327_wasserstein_drift"](spark, sf_dir).collect()
    print("wasserstein  early-vs-late W1 per event type:")
    for r in sorted(w1, key=lambda r: -r.w1_millicents):
        print(
            f"  {r.event_type:<10} W1 {r.w1_millicents / 1e3:8.3f} cents  "
            f"(n {r.n_early}/{r.n_late})"
        )

    ks = qs["q219_ks_two_sample"](spark, sf_dir).collect()[0]
    print(
        f"ks           D {ks.d_ppm / 1e6:.4f}  "
        f"(n {ks.n_a}x{ks.n_b})"
    )

    psi = qs["q235_psi_drift"](spark, sf_dir).collect()[0]
    print(f"psi          {psi.psi_pico / 1e12:.6f} (10-bin reference)")

    mw = qs["q218_mann_whitney_u"](spark, sf_dir).collect()[0]
    cd = qs["q329_cliffs_delta"](spark, sf_dir).collect()[0]
    print(
        f"location     MW-U z {0 if mw.z_ppm is None else mw.z_ppm / 1e6:+.3f}  "
        f"Cliff's delta {cd.delta_ppm / 1e6:+.4f} "
        f"(ties {cd.tie_pairs})"
    )

    pt = qs["q328_pettitt_test"](spark, sf_dir).collect()[0]
    print(
        f"pettitt      change-point at month {pt.cp_month} "
        f"(pos {pt.cp_pos}/{pt.n_months}, K x2 = {pt.k_x2})"
    )

    lb = qs["q326_ljung_box"](spark, sf_dir).collect()
    worst = max(lb, key=lambda r: r.lb_q_scaled)
    print(
        f"ljung-box    max Q(3) = {worst.lb_q_scaled / 1e12:.2f} "
        f"({worst.event_type}; acf1 {worst.acf1_ppm / 1e6:+.3f})"
    )

    mp = qs["q346_matrix_profile"](spark, sf_dir).collect()
    discord = max(mp, key=lambda r: r.d2_min)
    print(
        f"discord      window #{discord.idx} is the series' most "
        f"anomalous year-shape (d2 {discord.d2_min})"
    )

    sw = qs["q347_stream_wasserstein"](spark, sf_dir).collect()
    sp = {
        r.window_start_us: r.psi_pico
        for r in qs["q249_stream_psi"](spark, sf_dir).collect()
    }
    print("streaming    per-3-day-window W1 + PSI monitors:")
    for r in sorted(sw, key=lambda r: r.window_start_us):
        print(
            f"  win@{r.window_start_us // 86_400_000_000:>6}d  "
            f"W1 {r.w1_micro / 1e6:8.4f}  "
            f"PSI {sp.get(r.window_start_us, 0) / 1e12:.6f}  "
            f"(n {r.n_rows})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
