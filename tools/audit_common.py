#!/usr/bin/env python3
"""Shared core of the two dynamic OOM guards (broadcast_audit /
bnl_audit): the calibrated growth-violation rule, the two probe SFs,
and the engine call-site resolver. Extracted in round 10 (code
review F6) so a future change to the rule — a new SF pair, a
re-calibrated limit — lands in ONE place; the per-(site,query)
re-keying had to be patched into both files simultaneously, which
is exactly the drift this module prevents. The guards keep their
own classify()/artifact semantics (hint vs build side, whitelist
flavors); only the measured rule itself is shared.
"""

from __future__ import annotations

import traceback

# Most fixture tables grow 10x between the probe SFs, but documents
# grows 10x only from sf0.01→sf0.1 and EMBEDDINGS grows just 4x
# (500 → 2000 rows) — a first-cut limit of 6 MISSED a genuine
# corpus-scaling hint (q345's label map, ratio exactly 4.0).
# Measured across all exercised sites, every legitimate
# bounded/model frame has ratio <= 1.11, so 3.0 separates the
# classes with a wide margin on both sides.
GROWTH_LIMIT = 3.0

# Measured calibration (round 9, full 217-site sweep): every frame
# with ratio > 6 had >= 100 rows at sf0.1 — all genuinely
# customer/supplier/part/orders-derived (linear in TPC-H SF; at
# 100 TB supplier alone is ~1e9 rows). No bounded grid that merely
# fills in crossed 100 rows at ratio > 6; a looser floor of 2000
# MISSED 11 supplier/part-scaled sites.
ROWS_FLOOR = 100

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

PKG = "car_insurance_data_pipeline_spark_spark"


def growth_violation(small: int, big: int) -> bool:
    """The calibrated corpus-tracking rule shared by both guards:
    a measured frame is an OOM hazard iff its rows grow more than
    GROWTH_LIMIT between the probe SFs AND it is at least
    ROWS_FLOOR rows at the big SF."""
    ratio = big / max(small, 1)
    return ratio > GROWTH_LIMIT and big >= ROWS_FLOOR


def call_site() -> str:
    """First stack frame inside the engine package (file:line)."""
    for fr in reversed(traceback.extract_stack()):
        if PKG in fr.filename and "pyspark" not in fr.filename:
            rel = fr.filename.split(PKG, 1)[-1].lstrip("/\\")
            return f"{PKG}/{rel}:{fr.lineno}"
    return "<outside-package>"
