"""TPC-H runbook — every one of the 22 decision-support query
shapes, run end to end from the catalog in one session. This is the
migration demonstration: a user of a hand-coded per-query pipeline
points this at their parquet directory and gets the full suite,
each query oracle-verified elsewhere in CI (tests/test_oracle_parity
checks all of them against DuckDB on every run).

Run directly (defaults to the sf0.001 fixture):

    python examples/tpch_runbook.py [SF_DIR]

Mapping (TPC-H number → catalog query). Q2/Q11/Q16/Q20 run over a
lineitem-derived pseudo-partsupp (the fixture ships no partsupp
table) with their defining shapes intact; Q4/Q12/Q21 adapt the
lateness predicate to shipdate-vs-orderdate (no commit/receipt
dates in the fixture).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries
from car_insurance_data_pipeline_spark_spark.session import get_session

TPCH = [
    ("Q1", "q01_pricing_summary"),
    ("Q2", "q245_min_cost_supplier"),
    ("Q3", "q02_market_segment_revenue"),
    ("Q4", "q237_order_priority_check"),
    ("Q5", "q65_local_supplier_volume"),
    ("Q6", "q238_forecast_revenue"),
    ("Q7", "q239_shipping_volume"),
    ("Q8", "q216_market_share"),
    ("Q9", "q240_product_profit"),
    ("Q10", "q241_returned_item_report"),
    ("Q11", "q246_important_stock"),
    ("Q12", "q242_shipping_priority_split"),
    ("Q13", "q215_custdist"),
    ("Q14", "q243_promo_revenue_share"),
    ("Q15", "q217_top_revenue_suppliers"),
    ("Q16", "q247_supplier_relationship_count"),
    ("Q17", "q188_small_qty_revenue"),
    ("Q18", "q211_large_volume_orders"),
    ("Q19", "q244_disjunctive_revenue"),
    ("Q20", "q248_excess_stock_suppliers"),
    ("Q21", "q212_sole_late_supplier"),
    ("Q22", "q213_idle_rich_customers"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="tpch-runbook")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    total = 0.0
    for tag, name in TPCH:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{tag:>4}  {name:36s} {n:7d} rows  {dt:6.2f} s")
    print(f"suite: 22 queries, {total:.1f} s at {sf_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
