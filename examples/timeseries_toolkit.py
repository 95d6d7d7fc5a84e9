"""Revenue time-series toolkit — the monthly-close analysis a
finance/forecasting team runs end to end, composed from
oracle-verified catalog queries over one orders table:

    seasonality screen:  hourly/lag ACF            (q214)
    decomposition:       trend + seasonal + resid  (q289)
    level forecast:      Holt linear smoothing     (q278)
    uncertainty:         split-conformal 90% band  (q285)
    change detection:    streaming CUSUM monitor   (q286)
    symbolization:       SAX words for indexing    (q282)

Run directly (defaults to the sf0.001 fixture):

    python examples/timeseries_toolkit.py [SF_DIR]

Every series statistic is the deterministic form the catalog
verifies against DuckDB: exact integer cent sums, window prefix
arithmetic, FLOOR-quantized IEEE trees. At 100 TB each step costs
one fact-collapsing exchange to the time dimension; everything after
is months-bound.
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
    spark = get_session(app_name="timeseries-toolkit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    acf = {
        (r.event_type, r.lag_h): r.acf_ppm
        for r in qs["q214_hourly_acf"](spark, sf_dir).collect()
    }
    lag24 = [v for (_, lag), v in acf.items() if lag == 24]
    if lag24:
        print(
            f"seasonality  lag-24 ACF across types: "
            f"{min(lag24) / 1e6:+.3f} .. {max(lag24) / 1e6:+.3f}"
        )

    dec = qs["q289_seasonal_decompose"](spark, sf_dir).collect()
    if dec:
        worst = max(dec, key=lambda r: abs(r.resid24))
        print(
            f"decompose    {len(dec)} interior months; largest residual "
            f"{worst.resid24 / 24 / 100:+,.0f} at month {worst.month_id}"
        )
        for r in dec:
            assert 24 * r.v_cents == r.trend24 + r.seasonal24 + r.resid24

    holt = sorted(
        qs["q278_holt_linear"](spark, sf_dir).collect(),
        key=lambda r: r.month_id,
    )
    last = holt[-1]
    print(
        f"holt         level {last.level_c / 100:,.0f}  trend "
        f"{last.trend_c / 100:+,.0f}/mo  next "
        f"{(last.level_c + last.trend_c) / 100:,.0f}"
    )

    band = qs["q285_conformal_band"](spark, sf_dir).collect()
    if band:
        b = band[0]
        print(
            f"conformal    seasonal-naive next = {b.forecast_cents / 100:,.0f} "
            f"in [{b.lo_cents / 100:,.0f}, {b.hi_cents / 100:,.0f}] "
            f"(90%, n={b.n_resid})"
        )

    cu = qs["q286_stream_cusum"](spark, sf_dir).collect()
    n_alarm = sum(r.alarm for r in cu)
    print(f"cusum        {len(cu)} stream windows, {n_alarm} level-shift alarms")

    sax = sorted(
        qs["q282_sax_symbols"](spark, sf_dir).collect(),
        key=lambda r: r.seg_id,
    )
    word = "".join(r.symbol for r in sax)
    print(f"sax          {len(sax)} weekly segments -> '{word[:60]}'")
    spark.stop()


if __name__ == "__main__":
    main()
