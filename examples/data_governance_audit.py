"""Data-governance audit pack — the pre-publication review a data
platform runs before releasing a table or a pooled statistic,
composed from oracle-verified catalog queries:

    schema discovery:   FK inference report          (q281)
    privacy triad:      k-anonymity floor            (q146)
                        l-diversity violations       (q228)
                        t-closeness EMD              (q280)
    aggregation bias:   Simpson's-paradox audit      (q292)
    column health:      profile (nulls/distincts)    (q98)

Run directly (defaults to the sf0.001 fixture):

    python examples/data_governance_audit.py [SF_DIR]

Every verdict is the deterministic integer form the catalog verifies
against DuckDB. At 100 TB each audit is one or two keyed exchanges
to a dimension-sized grid — the whole pack rides shared scans.
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
    spark = get_session(app_name="governance-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    fk = qs["q281_fk_inference"](spark, sf_dir).collect()
    plausible = [r for r in fk if r.fk_plausible]
    decoys = [
        r for r in fk if r.containment_ppm == 1_000_000 and not r.fk_plausible
    ]
    print(
        f"fk-discovery {len(plausible)}/{len(fk)} candidate pairs plausible; "
        f"{len(decoys)} fully-contained decoys rejected by cardinality"
    )

    ka = qs["q146_kanonymity"](spark, sf_dir).collect()
    kmin = min(r.group_size for r in ka) if ka else 0
    kviol = sum(r.k_violation for r in ka)
    print(
        f"k-anonymity  {len(ka)} QI groups, worst k = {kmin}, "
        f"{kviol} below k=5"
    )

    ld = qs["q228_l_diversity"](spark, sf_dir).collect()
    viol = sum(r.violates_l3 for r in ld)
    print(f"l-diversity  {len(ld)} groups, {viol} violate l=3")

    tc = qs["q280_t_closeness"](spark, sf_dir).collect()
    worst = max(tc, key=lambda r: r.t_ppm)
    print(
        f"t-closeness  {len(tc)} groups, worst t = "
        f"{worst.t_ppm / 1e6:.4f} (nation {worst.nation})"
    )

    sa = qs["q292_simpson_audit"](spark, sf_dir).collect()
    flips = [r.stratum for r in sa if r.reversed]
    print(
        f"simpson      pooled sign {sa[0].pooled_sign:+d}; "
        f"{len(flips)} reversed strata {flips}"
    )

    prof = qs["q98_column_profile"](spark, sf_dir).collect()
    nullable = [r for r in prof if r.n_nulls > 0]
    print(
        f"profile      {len(prof)} columns profiled, "
        f"{len(nullable)} with nulls"
    )

    gates = {
        "k >= 2": kmin >= 2,
        "l3 violations == 0": viol == 0,
        "t <= 0.35": worst.t_ppm <= 350_000,
        "no reversed strata": not flips,
    }
    verdict = "RELEASE" if all(gates.values()) else "HOLD"
    failed = [k for k, v in gates.items() if not v]
    print(f"verdict      {verdict}" + (f" (failed: {failed})" if failed else ""))
    spark.stop()


if __name__ == "__main__":
    main()
