"""The user-facing pre-ship check (examples/scale_safety_audit.py)
must actually run and enforce: round-9 advice flagged that it
ignored build errors and crashed on non-catalog names — both paths
are now load-bearing, so pin them (the example composes all three
governance tools; silent rot here would ship a broken recipe)."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "examples", "scale_safety_audit.py")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, _SCRIPT, *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=_REPO,
    )


def test_example_passes_on_clean_queries():
    # two cheap queries spanning both sweeps: a broadcast-hint user
    # and a crossJoin-anchor user
    r = _run("q38_cosine_topk", "q310_anova_oneway")
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "broadcast-size invariant" in r.stdout
    assert "nested-loop build-side invariant" in r.stdout
    assert "OK:" in r.stdout


def test_example_fails_on_unknown_query():
    """A name the catalog doesn't know must FAIL the check (it used
    to crash the plan-visibility loop uncaught) — an unaudited query
    reported as OK is the exact false-negative the advice flagged."""
    r = _run("q38_cosine_topk", "not_a_query")
    assert r.returncode == 1, r.stdout[-2000:] + r.stderr[-2000:]
    assert "NOT A CATALOG QUERY" in r.stdout
