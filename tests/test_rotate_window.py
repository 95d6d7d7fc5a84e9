"""The window-rotation policy (round-10 verdict #4) is now a tool,
so its composition rules are pinned as pure logic — no Spark, no
catalog import: new-with-growth-rule first, plan-changed next
(oldest proof first), oldest-proof refresh fills, rows-only queries
can never take slots, and policy violations are loud errors."""

from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(_REPO, "tools", "rotate_window.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compose_orders_new_then_changed_then_oldest():
    rw = _load_tool()
    rw_size = rw.WINDOW_SIZE
    order = [f"q{i:03d}" for i in range(rw_size + 20)]
    oracles = set(order)
    # everyone proven in round 5 except a few older proofs
    last = {n: 5 for n in order}
    last["q060"] = 1
    last["q061"] = 2
    last["q010"] = 9  # plan-changed but recently proven
    w = rw.compose_window(
        order, oracles, last, new=["q063"], plan_changed=["q010", "q061"]
    )
    assert len(w) == rw_size
    assert w[0] == "q063"                  # growth rule leads
    assert w[1:3] == ["q061", "q010"]      # changed, oldest proof first
    assert w[3] == "q060"                  # oldest-proof refresh next
    # no duplicates, all oracle-bearing
    assert len(set(w)) == rw_size


def test_compose_rejects_rows_only_and_unknown():
    rw = _load_tool()
    order = [f"q{i:03d}" for i in range(rw.WINDOW_SIZE + 5)]
    oracles = set(order) - {"q001"}
    last = {n: 1 for n in order}
    with pytest.raises(SystemExit):
        rw.compose_window(order, oracles, last, new=["q001"], plan_changed=[])
    with pytest.raises(SystemExit):
        rw.compose_window(order, oracles, last, new=["q_nope"], plan_changed=[])
    # rows-only queries never fill refresh slots either
    w = rw.compose_window(order, oracles, last, new=[], plan_changed=[])
    assert "q001" not in w


def test_never_proven_queries_lead_the_refresh():
    """A query with NO green row ever (a new query the caller forgot
    to pass as --new) must sort FIRST in the refresh fill — it can
    never silently sink below the window."""
    rw = _load_tool()
    order = [f"q{i:03d}" for i in range(rw.WINDOW_SIZE + 5)]
    oracles = set(order)
    last = {n: 3 for n in order}
    del last["q050"]
    w = rw.compose_window(order, oracles, last, new=[], plan_changed=[])
    assert w[0] == "q050"


def test_last_green_rounds_reads_committed_history():
    """Sanity over the real artifacts: r10's fresh rows map to 10,
    and a green row never maps to a later round than exists."""
    rw = _load_tool()
    last = rw.last_green_rounds()
    assert last.get("q367_cronbach_alpha") == 10
    assert last.get("q01_pricing_summary") == 10  # r10 refresh slot
    assert 1 <= min(last.values())
