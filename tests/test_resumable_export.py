"""Resumable sharded export (round-5, r4 verdict #6): idempotent
skip-already-written-shards resume, marker atomicity, and a REAL
mid-run SIGKILL with recovery.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.sources.writers import (
    completed_shards,
    write_sharded_resumable,
)

N_SHARDS = 8


def _shard_files(path: str) -> dict[str, tuple[int, float]]:
    """{file: (size, mtime)} of every data file under shard dirs."""
    out = {}
    for root, _dirs, files in os.walk(path):
        if "_shard_manifests" in root or "_temporary" in root:
            continue
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime)
    return out


def test_export_then_rerun_is_noop(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "exp")
    man = write_sharded_resumable(df, path, "c_custkey", N_SHARDS)
    rows = {r["shard"]: r["n_rows"] for r in man.collect()}
    assert set(rows) == set(range(N_SHARDS))
    assert sum(rows.values()) == df.count()
    # manifest counts match the actual files
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    before = _shard_files(path)
    assert before, "expected data files"
    # rerun: everything marked complete -> nothing rewritten
    man2 = write_sharded_resumable(df, path, "c_custkey", N_SHARDS)
    assert {r["shard"]: r["n_rows"] for r in man2.collect()} == rows
    assert _shard_files(path) == before


def test_resume_rewrites_only_markerless_shards(spark, sf_dir, tmp_path):
    """Simulated failure states: a shard whose data vanished (marker
    deleted too) and a shard with data but NO marker (killed between
    data commit and marker commit) must both be rewritten; marked
    shards must not be touched."""
    import shutil

    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "exp")
    write_sharded_resumable(df, path, "c_custkey", N_SHARDS)
    want = df.count()
    # shard 2: lose data AND marker; shard 5: lose marker only
    shutil.rmtree(f"{path}/shard=2")
    os.remove(f"{path}/_shard_manifests/shard-00002.json")
    os.remove(f"{path}/_shard_manifests/shard-00005.json")
    before = _shard_files(path)
    untouched = {
        p: v for p, v in before.items() if "/shard=2/" not in p
        and "/shard=5/" not in p
    }
    man = write_sharded_resumable(df, path, "c_custkey", N_SHARDS)
    assert sum(r["n_rows"] for r in man.collect()) == want
    after = _shard_files(path)
    # completed shards bit-untouched (size+mtime)
    for p, v in untouched.items():
        assert after[p] == v
    # the lost shard came back with the right rows
    assert spark.read.parquet(path).count() == want
    got_keys = {
        r["c_custkey"] for r in spark.read.parquet(path).collect()
    }
    assert got_keys == {r["c_custkey"] for r in df.collect()}


_KILL_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from car_insurance_data_pipeline_spark_spark.session import get_session
from car_insurance_data_pipeline_spark_spark.sources.writers import (
    write_sharded_resumable,
)
sf_dir, path, n_shards = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_session(app_name="kill-victim", shuffle_partitions=4)
df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
    "c_custkey", "c_name", "c_acctbal"
)
# one shard per job -> markers appear incrementally; the parent
# SIGKILLs this process partway through
write_sharded_resumable(df, path, "c_custkey", n_shards, shards_per_job=1)
spark.stop()
"""


def test_sigkill_mid_export_then_resume(spark, sf_dir, tmp_path):
    """Kill a real export process (SIGKILL, no cleanup) after some
    shards committed, then resume in another session: completed
    shards stay byte-identical, the rest get written, and the final
    dataset is exact."""
    path = str(tmp_path / "exp")
    script = tmp_path / "victim.py"
    script.write_text(_KILL_SCRIPT)
    n_shards = 16
    proc = subprocess.Popen(
        [sys.executable, str(script), sf_dir, path, str(n_shards)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            done = completed_shards(spark, path) if os.path.isdir(path) else {}
            if len(done) >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    "victim finished before the kill fired — raise n_shards"
                )
            time.sleep(0.1)
        else:
            raise AssertionError("no shards completed within the deadline")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    done = completed_shards(spark, path)
    assert 2 <= len(done) < n_shards, done
    survivors = {
        p: v
        for p, v in _shard_files(path).items()
        if any(f"/shard={s}/" in p for s in done)
    }
    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    man = write_sharded_resumable(df, path, "c_custkey", n_shards)
    rows = {r["shard"]: r["n_rows"] for r in man.collect()}
    assert set(rows) == set(range(n_shards))
    assert sum(rows.values()) == df.count()
    after = _shard_files(path)
    for p, v in survivors.items():
        assert after[p] == v, f"completed shard file rewritten: {p}"
    got = {
        (r["c_custkey"], r["c_name"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(r["c_custkey"], r["c_name"]) for r in df.collect()}
    # shard routing is the documented pure key function
    check = df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col("c_custkey")), F.lit(n_shards)).cast("int"),
    )
    want_counts = {
        r["shard"]: r["n"]
        for r in check.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    for s in range(n_shards):
        assert rows[s] == want_counts.get(s, 0)
