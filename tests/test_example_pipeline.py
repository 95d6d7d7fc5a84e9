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


def test_warehouse_to_postgres_example(spark, tmp_path):
    """The pg warehouse example's load_star must put the star schema
    into a live server with constraints enforced and a matching
    rollup (reuses the test module's embedded-cluster fixture
    machinery through the example's own helpers)."""
    import pytest

    from examples.warehouse_to_postgres import INITDB, PG_CTL, _pg

    if not (os.path.exists(PG_CTL) and os.path.exists(INITDB)):
        pytest.skip("PostgreSQL server binaries not installed")
    if _pg("true").returncode != 0:
        pytest.skip("no postgres OS user")

    import shutil
    import tempfile

    import tests.fixtures as fx
    from examples.warehouse_to_postgres import load_star

    base = tempfile.mkdtemp(prefix="pg_ex_", dir="/tmp")
    os.chmod(base, 0o755)
    shutil.chown(base, "postgres", "postgres")
    data = f"{base}/data"
    try:
        assert _pg(f"{INITDB} -D {data} -A trust").returncode == 0
        assert (
            _pg(
                f"{PG_CTL} -D {data} -o '-k {base} -c listen_addresses=' "
                f"-l {base}/pg.log -w start"
            ).returncode
            == 0
        )
        raw = tmp_path / "raw"
        raw.mkdir()
        fx.contracts_csv(f"{raw}/contracts.csv")
        fx.vehicles_csv(f"{raw}/vehicles.csv")
        fx.claims_csv(f"{raw}/claims.csv")
        fx.telematics_csv(f"{raw}/telematics.csv")
        fx.device_mapping_csv(f"{raw}/device_mapping.csv")
        counts = load_star(spark, str(raw), str(tmp_path / "work"), base)
        assert counts["dim_customer"] > 0
        assert counts["fact_policy_snapshot"] >= counts["dim_policy"] > 0
        assert counts["rollup_groups"] > 1
    finally:
        _pg(f"{PG_CTL} -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def test_cli_list_run_oracle(tmp_path):
    """The CLI surface: list shows the catalog, run executes a query
    end-to-end in a fresh process, oracle prints SQL, and unknown
    names exit non-zero."""
    import subprocess
    import sys

    def cli(*args):
        return subprocess.run(
            [sys.executable, "-m", "car_insurance_data_pipeline_spark_spark", *args],
            capture_output=True,
            text=True,
            timeout=180,
            cwd="/root/repo",
        )

    r = cli("list")
    assert r.returncode == 0
    assert "q01_pricing_summary" in r.stdout and "[oracle]" in r.stdout

    r = cli(
        "run", "q03_global_stats", "--sf-dir", "/root/testdata/sf0.001",
        "--limit", "3",
    )
    assert r.returncode == 0 and "rows: 1" in r.stdout

    r = cli("oracle", "q03_global_stats")
    assert r.returncode == 0 and "SELECT" in r.stdout

    assert cli("oracle", "nope").returncode == 2
    assert cli("run", "nope").returncode == 2


def test_timeseries_toolkit_example():
    """The time-series toolkit example must run end to end as a real
    subprocess (its own vanilla-adjacent session) and print every
    stage line — the q256 overflow class was caught by exactly this
    kind of example-driven run."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "timeseries_toolkit.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for key in ("seasonality", "decompose", "holt", "conformal",
                "cusum", "sax"):
        assert key in out.stdout, (key, out.stdout)


def test_data_governance_audit_example():
    """The governance audit pack must run end to end as a real
    subprocess and print every stage line plus a verdict."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable,
         os.path.join(repo, "examples", "data_governance_audit.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for key in ("fk-discovery", "k-anonymity", "l-diversity",
                "t-closeness", "simpson", "profile", "verdict"):
        assert key in out.stdout, (key, out.stdout)
    assert ("RELEASE" in out.stdout) or ("HOLD" in out.stdout)


def test_drift_monitoring_panel_example():
    """The drift panel example must run end to end as a real
    subprocess and print every battery line."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "drift_monitoring_panel.py"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for key in ("wasserstein", "ks", "psi", "location", "pettitt",
                "ljung-box", "discord", "streaming"):
        assert key in out.stdout, (key, out.stdout)
