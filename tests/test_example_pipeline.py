"""The end-to-end curation example must run and its stage audit must
be monotone non-increasing with exact export reconciliation."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_curate_corpus_end_to_end(spark, sf_dir, tmp_path):
    from examples.curate_corpus import curate

    audit = curate(spark, sf_dir, str(tmp_path / "out"))
    stages = ["input", "after_exact_dedup", "after_neardup",
              "after_quality", "after_budget", "exported"]
    assert list(audit) == stages
    counts = [audit[s] for s in stages]
    assert all(a >= b for a, b in zip(counts[:-2], counts[1:-1]))
    assert audit["exported"] == audit["after_budget"]
    assert 0 < audit["after_budget"] < audit["input"]


def test_stream_to_warehouse_end_to_end(spark, tmp_path):
    from examples.stream_to_warehouse import run_stream

    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
    except Exception:
        import pytest

        pytest.skip("Derby driver not on Spark classpath")

    out = run_stream(spark, str(tmp_path))
    # negative-speed event for device c was cleaned out; a/b aggregated
    # across micro-batches and upserted (last complete state wins)
    assert out["warehouse"] == {"a": (3, 61.0), "b": (2, 55.0)}
    assert [b["applied"] for b in out["batches"]] == [True, True, True]
    assert all(b["dq_warns"] == 0 for b in out["batches"])
