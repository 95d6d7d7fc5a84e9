#!/usr/bin/env python3
"""Dynamic audit of every F.broadcast() call site (round-8 verdict
#3): a forced broadcast whose input grows with corpus rows is a
guaranteed 100 TB OOM (the q317 doc-map / q355 part-hint class), so
every hinted frame must be 1-row, dimension-bounded, or
model-bounded.

Method — measure, don't classify by eye: patch
``pyspark.sql.functions.broadcast`` (every repo site calls
``F.broadcast(...)`` through the module attribute; there are no
``from ... import broadcast`` sites and no ``.hint("broadcast")``
sites) with a recording wrapper, build EVERY catalog query at
sf0.01 and sf0.1 (most fixture tables grow 10× between the two;
embeddings grows 4× — hence GROWTH_LIMIT below), and count the rows
of each hinted frame at both scales. A site whose hinted row count
tracks its tables' growth is a violation; dimension/model frames
stay flat or grow sublinearly (Heaps-law vocabularies).

Violation rule (shared with tests/test_broadcast_guard.py, which
imports run_sweep/violations_of from this file):
    ratio > GROWTH_LIMIT  and  rows@sf0.1 >= ROWS_FLOOR
The floor keeps tiny frames that cross e.g. 8 → 60 rows (bounded
grids that fill in with data) out of scope; the ratio keeps
legitimately large-but-fixed model frames in scope only if they
actually scale.

Usage: python tools/broadcast_audit.py [query ...]
Writes BROADCAST_AUDIT.md and prints one JSON line; exit 1 on any
violation.
"""

from __future__ import annotations

import json
import os
import sys
import traceback  # noqa: F401 (shared via audit_common)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

def _load_common():
    import importlib.util as _ilu
    _spec = _ilu.spec_from_file_location(
        "audit_common",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "audit_common.py"),
    )
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    return _mod


_COMMON = _load_common()
# Single source of truth for the calibrated rule + probe SFs
# (tools/audit_common.py); kept as module attributes so the guard
# tests and docstrings keep their existing references.
GROWTH_LIMIT = _COMMON.GROWTH_LIMIT
ROWS_FLOOR = _COMMON.ROWS_FLOOR
SF_SMALL = _COMMON.SF_SMALL
SF_BIG = _COMMON.SF_BIG
PKG = _COMMON.PKG
_call_site = _COMMON.call_site
_growth_violation = _COMMON.growth_violation


# Hinted frames that are PROVABLY capped by construction but still
# growing toward their cap at fixture scales (so the growth-ratio
# rule alone would false-positive). Each entry declares the hard cap
# and the sweep VERIFIES the measured rows never exceed it — a stale
# line number after an edit re-flags the site as a violation, which
# is the safe failure mode.
# Keys are either a full "file:line" site or the line-stable
# "file|query" form (round 12): line-keyed entries went stale on
# ANY edit above the site (vectorops 506→623 in r11, statsops
# 4394→4400 turned the r11 driver suite red), so caps tied to a
# specific query now survive line drift. The cap itself is still
# verified against the measured rows every sweep.
CAPPED_SITES: dict[str, int] = {
    # q345 probe panel label map: probes = vec_id % 5 == 0 AND
    # vec_id < 5000 → ≤ 1000 rows at ANY corpus size (the docstring's
    # bounded-panel contract); 100 → 400 rows at the fixture SFs is
    # pre-cap fill-in, not corpus tracking.
    "car_insurance_data_pipeline_spark_spark/plans/vectorops.py"
    "|q345_knn_loo_accuracy": 1000,
}





def run_sweep(
    spark,
    names: list[str] | None = None,
    queries: dict | None = None,
) -> tuple[dict[str, dict], dict[str, str]]:
    """Build each named catalog query at both probe SFs with
    F.broadcast intercepted; return (sites, build_errors).

    sites: "call-site|query" -> {"site": s, "query": q, "rows":
    {"sf0.01": n, "sf0.1": n}}. Keyed per (site, query) pair — NOT
    per site — because a shared operator call site (e.g. a
    similarity helper) can be exercised by several queries with
    differently-sized frames: maxing counts across queries before
    computing the ratio would let one query's larger-but-bounded
    frame mask another query's corpus-scaling frame (a
    false-negative path in the OOM guard). Within one (site, query)
    pair the max across repeated calls is kept (loop iterations of
    the same frame shape). Every recorded frame is counted at BOTH
    SFs — classify() treats a missing count as a VIOLATION
    (measurement incomplete), so there is deliberately no
    partial-count mode."""
    import pyspark.sql.functions as SF

    if queries is None:
        from car_insurance_data_pipeline_spark_spark.plans.catalog import (
            all_queries,
        )

        queries = all_queries()
    qs = queries
    names = names or list(qs)

    orig_broadcast = SF.broadcast
    recorded: list[tuple[str, object]] = []

    def recording_broadcast(df):
        recorded.append((_call_site(), df))
        return orig_broadcast(df)

    sites: dict[str, dict] = {}
    errors: dict[str, str] = {}
    SF.broadcast = recording_broadcast
    try:
        for sf_tag, sf_dir in (("sf0.01", SF_SMALL), ("sf0.1", SF_BIG)):
            for name in names:
                recorded.clear()
                try:
                    qs[name](spark, sf_dir)
                except Exception as ex:  # streaming/eager paths
                    errors[name] = str(ex)[:100]
                for site, df in recorded:
                    ent = sites.setdefault(
                        f"{site}|{name}",
                        {"site": site, "query": name, "rows": {}},
                    )
                    try:
                        n = df.count()
                    except Exception:
                        continue
                    ent["rows"][sf_tag] = max(
                        ent["rows"].get(sf_tag, 0), n
                    )
                recorded.clear()
    finally:
        SF.broadcast = orig_broadcast
    return sites, errors


def classify(sites: dict[str, dict]) -> list[dict]:
    rows = []
    for key, ent in sorted(sites.items()):
        site = ent.get("site", key.split("|", 1)[0])
        small = ent["rows"].get("sf0.01")
        big = ent["rows"].get("sf0.1")
        if small is None or big is None:
            # A recorded hint whose frame count failed (or that was
            # exercised at only one SF) is NOT clean — defaulting the
            # missing side to 0 would label a corpus-scaling frame
            # "1-row" (missing big) or fabricate a violation (missing
            # small). Fail loudly so the sweep gets fixed.
            rows.append(
                {
                    "key": key,
                    "site": site,
                    "query": ent["query"],
                    "rows_sf001": small if small is not None else -1,
                    "rows_sf01": big if big is not None else -1,
                    "ratio": 0.0,
                    "class": "MEASUREMENT INCOMPLETE (VIOLATION)",
                    "violation": True,
                }
            )
            continue
        ratio = big / max(small, 1)
        cap = CAPPED_SITES.get(site)
        if cap is None:
            cap = CAPPED_SITES.get(
                site.rsplit(":", 1)[0] + "|" + ent["query"]
            )
        if cap is not None:
            bad = big > cap  # cap declared → verify it actually holds
            klass = (
                f"CAP EXCEEDED (declared <= {cap}) (VIOLATION)"
                if bad
                else f"capped (<= {cap} by construction)"
            )
        else:
            bad = _growth_violation(small, big)
            klass = (
                "CORPUS-SCALING (VIOLATION)"
                if bad
                else "1-row"
                if big <= 1
                else "dimension/model-bounded"
            )
        rows.append(
            {
                "key": key,
                "site": site,
                "query": ent["query"],
                "rows_sf001": small,
                "rows_sf01": big,
                "ratio": round(ratio, 2),
                "class": klass,
                "violation": bad,
            }
        )
    return rows


def violations_of(sites: dict[str, dict]) -> list[str]:
    """Keys ("site|query") of violating pairs — per-pair, so a
    shared call site is flagged if ANY single query's frame pair
    violates, even when another query's bounded frame is larger."""
    return [r.get("key", r["site"]) for r in classify(sites) if r["violation"]]


def main(names: list[str] | None) -> dict:
    from car_insurance_data_pipeline_spark_spark.session import get_session

    spark = get_session(app_name="broadcast-audit")
    sites, errors = run_sweep(spark, names)
    rows = classify(sites)
    out = [
        "# BROADCAST_AUDIT — every dynamically-exercised F.broadcast site",
        "",
        "One row per (call site, query) pair — NOT per site (round-10:",
        "per-site maxing could mask a corpus-scaling frame behind a",
        "larger-but-bounded one from another query sharing the site).",
        "Hinted-frame row counts measured while building every catalog",
        "query at sf0.01 and sf0.1 (most fixture tables grow 10x between",
        "the two; embeddings grows 4x, 500 -> 2000 - which is why the",
        "growth limit sits at 3). A broadcast input that tracks growth is",
        f"a 100 TB OOM hazard: violation = ratio > {GROWTH_LIMIT} and",
        f"rows@sf0.1 >= {ROWS_FLOOR}. Sublinear growth is Heaps-law",
        "vocabulary/model frames — bounded by the value domain, not the",
        "corpus. Guarded continuously by tests/test_broadcast_guard.py.",
        "",
        "| call site | query | rows@sf0.01 | rows@sf0.1 |"
        " ratio | class |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            "| {site} | {query} | {rows_sf001} | {rows_sf01} |"
            " {ratio} | {class} |".format(**r)
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # explicit names audit a SUBSET — write the partial artifact so
    # a spot-check can't clobber the committed whole-catalog table
    # (the plan_audit discipline; a round-11 single-query re-check
    # did exactly that before this guard)
    fname = "BROADCAST_AUDIT_PARTIAL.md" if names else "BROADCAST_AUDIT.md"
    with open(os.path.join(repo, fname), "w") as f:
        f.write("\n".join(out) + "\n")
    summary = {
        "metric": "broadcast_audit",
        "n_queries": len(names) if names else "all",
        "n_sites_exercised": len(sites),
        "n_build_errors": len(errors),
        "violations": violations_of(sites),
        "detail": fname,
    }
    print(json.dumps(summary))
    spark.stop()
    return summary


if __name__ == "__main__":
    s = main(sys.argv[1:] or None)
    sys.exit(1 if s["violations"] else 0)
