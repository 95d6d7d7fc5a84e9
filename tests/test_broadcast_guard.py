"""Broadcast-size invariant (round-8 verdict #3): no F.broadcast()
input anywhere in the engine may grow with corpus rows. A forced
broadcast of a corpus-row-sized frame is a guaranteed 100 TB OOM —
the class hit twice in round 8 (q355's part hint, removed; q317's
doc_id→lang map, removed in round 9).

The guard is DYNAMIC, in the spirit of
test_dedup_candidates_have_no_posting_arrays: it intercepts every
``F.broadcast(...)`` call while building the driver-window queries
at sf0.01 AND sf0.1 (most fixture tables grow 10× between the two;
embeddings grows 4× — which sets the tool's growth limit), counts
each hinted frame at both scales, and fails any site whose row
count tracks the corpus growth. Dimension frames
stay flat; model/vocabulary frames grow sublinearly (Heaps law);
only a corpus-scaling frame rides the full 10×.

Scope: the 50-slot driver window (the set the grading driver runs
this round; the window rotates, so coverage accumulates round over
round) plus the two historical-hazard queries pinned explicitly.
The exhaustive whole-catalog sweep is tools/broadcast_audit.py →
BROADCAST_AUDIT.md, regenerated each round.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_audit_tool():
    spec = importlib.util.spec_from_file_location(
        "broadcast_audit", os.path.join(_REPO, "tools", "broadcast_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Queries where a corpus-scaling broadcast has actually shipped (and
# been removed) — pinned forever regardless of window rotation.
_HAZARD_HISTORY = ["q317_nb_langid", "q355_bradley_terry"]


def test_driver_window_has_no_corpus_scaling_broadcasts(spark):
    from car_insurance_data_pipeline_spark_spark.plans.catalog import specs

    ba = _load_audit_tool()
    names = list(specs())[:50]
    names += [n for n in _HAZARD_HISTORY if n not in names]
    sites, errors = ba.run_sweep(spark, names)
    # Every window query must BUILD at both SFs — a query that errors
    # out of the sweep contributes zero sites and would otherwise be
    # silently unaudited (all 349 catalog queries build cleanly in
    # the full tools/broadcast_audit.py sweep, so any error here is a
    # regression, not an expected streaming/eager case).
    assert not errors, f"window queries failed to build in the sweep: {errors}"
    # The sweep must actually observe hinted frames (q317 alone has
    # five sites); an empty capture means the intercept broke, not
    # that the repo is clean.
    assert len(sites) >= 5, f"broadcast intercept captured too little: {sites}"
    bad = ba.violations_of(sites)
    detail = {
        s: r["rows"] for s, r in sites.items() if s in set(bad)
    }
    assert not bad, (
        "corpus-scaling F.broadcast() inputs (rows track the 10x "
        f"fixture growth — 100 TB OOM hazard): {detail}"
    )


def test_guard_catches_a_forced_corpus_broadcast(spark):
    """Mutation self-test: re-introduce the exact q317 bug shape —
    F.broadcast of a one-row-per-document frame — and prove the
    sweep flags it. Guards the guard: if the intercept or the
    violation rule regresses, this fails first."""
    import pyspark.sql.functions as F

    from car_insurance_data_pipeline_spark_spark.plans.catalog import table

    ba = _load_audit_tool()

    def bad_query(spark, sf_dir):
        docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
        return docs.join(F.broadcast(docs.select("doc_id")), "doc_id")

    sites, errors = ba.run_sweep(
        spark, names=["bad"], queries={"bad": bad_query}
    )
    assert not errors
    assert ba.violations_of(sites), (
        f"guard failed to flag a per-document broadcast: {sites}"
    )


def test_all_broadcast_sites_go_through_the_module_attribute():
    """The dynamic intercept patches pyspark.sql.functions.broadcast,
    which only sees calls spelled F.broadcast(...). Fail if anyone
    introduces a broadcast spelling that dodges the sweep: a direct
    `from pyspark.sql.functions import broadcast` (binds the original
    function before the patch) or a `.hint("broadcast")` string hint
    (never touches the function at all). Matched structurally on
    import lines / hint-call text, not bare substrings, so comments
    quoting the API and non-broadcast hints don't false-positive;
    exotic dodges (getattr(F, "broadcast"), aliasing the module) are
    out of scope — the dynamic window sweep still measures their
    frames whenever they resolve to the module attribute."""
    import re

    pkg = os.path.join(_REPO, "car_insurance_data_pipeline_spark_spark")
    import_re = re.compile(
        r"^\s*from\s+pyspark\.sql\.functions\s+import\s+.*\bbroadcast\b",
        re.MULTILINE,
    )
    hint_re = re.compile(r"\.hint\(\s*[\"\']broadcast[\"\']")
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            src = open(path, encoding="utf-8").read()
            if import_re.search(src) or hint_re.search(src):
                offenders.append(path)
    assert not offenders, (
        "broadcast usage that dodges the dynamic guard (use "
        f"F.broadcast(...) only): {offenders}"
    )
