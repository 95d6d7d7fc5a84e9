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

import pytest
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


def test_merge_into_sharded_upsert_delete_and_pruning(spark, sf_dir, tmp_path):
    """Copy-on-write MERGE over the sharded layout: upsert + delete
    semantics must equal the full anti-join∪union reference, and —
    the point of the layout — shards containing no touched key must
    keep their files byte-identical (shard pruning)."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        merge_into_sharded,
    )

    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "tbl")
    write_sharded_resumable(df, path, "c_custkey", N_SHARDS)

    # updates: rewrite 5 existing keys + insert 3 new; delete 2
    some = [r.c_custkey for r in df.orderBy("c_custkey").limit(7).collect()]
    upd_keys, del_keys = some[:5], some[5:7]
    updates = spark.createDataFrame(
        [(k, f"upd-{k}", 1.5) for k in upd_keys]
        + [(90_000_001 + i, f"new-{i}", 2.5) for i in range(3)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    deletes = spark.createDataFrame(
        [(k,) for k in del_keys], "c_custkey long"
    )

    touched = {
        r.s
        for r in updates.select("c_custkey")
        .union(deletes)
        .select(
            F.pmod(F.xxhash64("c_custkey"), F.lit(N_SHARDS))
            .cast("int")
            .alias("s")
        )
        .distinct()
        .collect()
    }
    before = _shard_files(path)
    untouched_files = {
        p: v
        for p, v in before.items()
        if not any(f"/shard={s}/" in p for s in touched)
    }
    assert untouched_files, "expected at least one untouched shard"

    man = merge_into_sharded(
        None, path, updates, "c_custkey", N_SHARDS, delete_keys=deletes
    )

    # reference semantics
    expect = {
        (r.c_custkey, r.c_name, float(r.c_acctbal))
        for r in df.join(
            updates.select("c_custkey"), "c_custkey", "left_anti"
        )
        .unionByName(updates)
        .join(deletes, "c_custkey", "left_anti")
        .collect()
    }
    got = {
        (r.c_custkey, r.c_name, float(r.c_acctbal))
        for r in spark.read.parquet(path).drop("shard").collect()
    }
    assert got == expect
    # pruning: untouched shard files byte-identical
    after = _shard_files(path)
    for p, v in untouched_files.items():
        assert after[p] == v, f"untouched shard rewritten: {p}"
    # manifest totals agree with the data
    assert sum(r["n_rows"] for r in man.collect()) == len(expect)


def test_merge_delete_only_empties_shard(spark, tmp_path):
    """A delete-only merge that removes EVERY key routed to some
    shard must leave that shard truly empty — the dynamic-overwrite
    blind spot (old files surviving an empty rewrite) is the bug
    this pins."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        completed_shards,
        merge_into_sharded,
        write_sharded_resumable,
    )

    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(40)], "k long, v string"
    )
    path = str(tmp_path / "tbl")
    write_sharded_resumable(df, path, "k", 4)
    # delete every key of shard 2
    sh = {
        r.k: r.s
        for r in df.select(
            "k",
            F.pmod(F.xxhash64("k"), F.lit(4)).cast("int").alias("s"),
        ).collect()
    }
    victims = [k for k, s in sh.items() if s == 2]
    assert victims
    deletes = spark.createDataFrame([(k,) for k in victims], "k long")
    empty_updates = spark.createDataFrame([], "k long, v string")
    merge_into_sharded(None, path, empty_updates, "k", 4, delete_keys=deletes)
    back = spark.read.parquet(path)
    assert back.filter(F.col("shard") == 2).count() == 0
    assert back.count() == 40 - len(victims)
    assert completed_shards(spark, path)[2] == 0


def _merge_inputs(spark, path):
    """Shared setup: a 40-row 4-shard table plus an update/delete
    set, returning (base_df, updates, deletes, expected_rows)."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_sharded_resumable,
    )

    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(40)], "k long, v string"
    )
    write_sharded_resumable(df, path, "k", 4)
    updates = spark.createDataFrame(
        [(3, "upd-3"), (11, "upd-11"), (100, "new-100")], "k long, v string"
    )
    deletes = spark.createDataFrame([(7,)], "k long")
    expect = {
        (r.k, r.v)
        for r in df.join(updates.select("k"), "k", "left_anti")
        .unionByName(updates)
        .join(deletes, "k", "left_anti")
        .collect()
    }
    return df, updates, deletes, expect


def test_merge_crash_before_commit_aborts(spark, tmp_path):
    """Staging data WITHOUT the commit record (crash in phase 1):
    repair must discard the staging and leave the table bytes
    untouched — the merge never happened."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        repair_sharded_merge,
    )

    path = str(tmp_path / "tbl")
    df, updates, _, _ = _merge_inputs(spark, path)
    before = _shard_files(path)
    # phase-1 crash state: staged bytes exist, no _COMMIT.json
    updates.withColumn("shard", F.lit(0)).write.parquet(
        f"{path}/_merge_staging/data"
    )
    assert repair_sharded_merge(spark, path) == "aborted"
    assert not os.path.exists(f"{path}/_merge_staging")
    assert _shard_files(path) == before
    assert {tuple(r) for r in spark.read.parquet(path).drop("shard").collect()} == {
        (r.k, r.v) for r in df.collect()
    }
    assert repair_sharded_merge(spark, path) == "clean"


def test_merge_crash_after_commit_repairs(spark, tmp_path):
    """Committed merge interrupted MID-SWAP (one touched shard's
    marker and directory already deleted, nothing moved in): repair
    must finish idempotently to exactly the merge result — no lost
    rows, markers rebuilt, staging cleared. This is the crash the
    pre-WAL implementation could not survive (the merged rows lived
    only in a localCheckpoint)."""
    import shutil as _shutil

    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        _stage_merge,
        completed_shards,
        repair_sharded_merge,
    )

    path = str(tmp_path / "tbl")
    df, updates, deletes, expect = _merge_inputs(spark, path)
    shard_of = F.pmod(F.xxhash64(F.col("k")), F.lit(4)).cast("int")
    keys = updates.select("k").unionByName(deletes)
    touched = sorted(
        r.s for r in keys.select(shard_of.alias("s")).distinct().collect()
    )
    old = (
        spark.read.parquet(path)
        .filter(F.col("shard").isin(touched))
        .drop("shard")
    )
    merged = (
        old.join(keys.distinct(), "k", "left_anti")
        .unionByName(updates)
        .join(deletes.select("k").distinct(), "k", "left_anti")
    )
    _stage_merge(spark, path, merged.withColumn("shard", shard_of), touched)
    # simulate the swap dying after mutilating ONE touched shard
    s0 = touched[0]
    os.unlink(f"{path}/_shard_manifests/shard-{s0:05d}.json")
    _shutil.rmtree(f"{path}/shard={s0}")

    assert repair_sharded_merge(spark, path) == "finished"
    got = {tuple(r) for r in spark.read.parquet(path).drop("shard").collect()}
    assert got == expect
    man = completed_shards(spark, path)
    assert set(man) == set(range(4))
    per_shard = {
        r.shard: r.n
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(man[s] == per_shard.get(s, 0) for s in man)
    assert not os.path.exists(f"{path}/_merge_staging")
    assert repair_sharded_merge(spark, path) == "clean"


def test_audit_sharded_statuses(spark, tmp_path):
    """The fsck helper must report ok for a healthy table, unmarked
    after a marker loss, mismatch after data corruption, and flag a
    pending merge staging area."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        _write_marker,
        audit_sharded,
        write_sharded_resumable,
    )

    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(40)], "k long, v string"
    )
    path = str(tmp_path / "tbl")
    write_sharded_resumable(df, path, "k", 4)
    a = audit_sharded(spark, path)
    assert {r.status for r in a.collect()} == {"ok"}
    assert not a.collect()[0].merge_pending

    os.unlink(f"{path}/_shard_manifests/shard-00001.json")
    by = {r.shard: r.status for r in audit_sharded(spark, path).collect()}
    assert by[1] == "unmarked" and by[0] == "ok"

    _write_marker(spark, path, 2, 999)
    by = {r.shard: r.status for r in audit_sharded(spark, path).collect()}
    assert by[2] == "mismatch"

    os.makedirs(f"{path}/_merge_staging", exist_ok=True)
    assert audit_sharded(spark, path).collect()[0].merge_pending


def test_sharded_change_feed_ops(spark, tmp_path):
    """CDF classification: present update keys -> update, absent ->
    insert, present delete keys -> delete (with NULL values), absent
    delete keys -> no event; and the feed agrees with the table
    state the merge then produces."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        merge_into_sharded,
        sharded_change_feed,
    )

    path = str(tmp_path / "tbl")
    df, updates, deletes, expect = _merge_inputs(spark, path)
    # add a no-op delete of an absent key
    deletes2 = deletes.unionByName(
        spark.createDataFrame([(9999,)], "k long")
    )
    feed = sharded_change_feed(
        spark, path, updates, "k", 4, delete_keys=deletes2
    ).cache()
    ops = {(r.op, r.k): r.v for r in feed.collect()}
    assert ops[("update", 3)] == "upd-3"
    assert ops[("update", 11)] == "upd-11"
    assert ops[("insert", 100)] == "new-100"
    assert ops[("delete", 7)] is None
    assert ("delete", 9999) not in ops
    assert len(ops) == 4

    merge_into_sharded(None, path, updates, "k", 4, delete_keys=deletes2)
    got = {tuple(r) for r in spark.read.parquet(path).drop("shard").collect()}
    assert got == expect
    # feed/table agreement: every insert/update value is in the
    # table, every deleted key is gone
    for (op, k), v in ops.items():
        if op in ("insert", "update"):
            assert (k, v) in got
        else:
            assert all(kk != k for kk, _ in got)


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    """Round-6 advice fix: lakehouse MERGE semantics reject a source
    with more than one row per key instead of silently inserting
    both versions. The check must fire BEFORE any file is touched."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        merge_into_sharded,
        write_sharded_resumable,
    )

    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(20)], "k long, v string"
    )
    path = str(tmp_path / "tbl")
    write_sharded_resumable(df, path, "k", 4)
    before = {(r.k, r.v) for r in spark.read.parquet(path).drop("shard").collect()}
    dup_updates = spark.createDataFrame(
        [(3, "new-a"), (3, "new-b"), (5, "new-c")], "k long, v string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into_sharded(None, path, dup_updates, "k", 4)
    after = {(r.k, r.v) for r in spark.read.parquet(path).drop("shard").collect()}
    assert after == before  # table untouched


def test_read_pruned_empty_manifest_raises_clearly(spark):
    from car_insurance_data_pipeline_spark_spark.sources.readers import read_pruned

    empty_manifest = spark.createDataFrame(
        [], "path string, min_k long, max_k long"
    )
    with pytest.raises(ValueError, match="manifest lists no files"):
        read_pruned(spark, empty_manifest, "k", 0, 10)
