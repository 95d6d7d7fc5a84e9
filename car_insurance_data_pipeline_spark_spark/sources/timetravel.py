"""Versioned (MVCC) sharded tables: snapshot isolation, time travel,
and vacuum — the remaining lakehouse semantics the engine's
copy-on-write MERGE (sources/writers.merge_into_sharded) does not
provide, emulated with the table-format jars absent.

Layout (single writer by contract, like the formats' default):

    <path>/d-<version>-<shard>/   immutable parquet data directories
    <path>/_vlog/v-<version>.json atomic version manifests

A version manifest maps every shard to the data directory holding
its rows AS OF that version, plus row counts. Commits are
write-then-rename of the manifest — the manifest either exists
complete or not at all, so the manifest IS the transaction:

- a MERGE writes NEW directories for touched shards only, then
  publishes a manifest that references them plus the PREVIOUS
  directories for untouched shards. A crash before the rename
  leaves orphan directories (cleaned by vacuum) and the table
  exactly at the previous version — no repair protocol needed,
  which is the structural advantage MVCC has over the in-place
  swap (`repair_sharded_merge`).
- readers resolve a manifest once and then read immutable
  directories — a concurrent merge can never change or delete the
  files under a reader (snapshot isolation), and any historical
  version stays readable until `vacuum_versions` retires it
  (time travel).

This mirrors how Delta/Iceberg actually work (immutable data files
+ an atomic log pointer + retention-based vacuum), with the shard
hash standing in for file-level pruning statistics.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), jvm


def _write_atomic(spark: SparkSession, path: str, payload: dict) -> None:
    """Write-then-rename: the file either exists complete or not at
    all. Refuses to overwrite — two writers racing to the same
    version is a caller bug surfaced loudly, not silently resolved."""
    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    tmp = P(path + ".tmp")
    dst = P(path)
    # RawLocalFileSystem.rename delegates to POSIX rename, which
    # silently REPLACES an existing destination — without this probe
    # a duplicate/racing commit to the same version would clobber a
    # committed manifest instead of raising (HDFS/object stores fail
    # the rename themselves; local filesystems need the guard)
    if fs.exists(dst):
        raise RuntimeError(
            f"version commit refused: {path} already exists — "
            "concurrent writer, or a duplicate commit to the same version"
        )
    stream = fs.create(tmp, True)
    try:
        stream.write(json.dumps(payload).encode())
    finally:
        stream.close()
    if not fs.rename(tmp, dst):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"version commit failed (exists?): {path} — concurrent "
            "writer, or a crashed commit to the same version"
        )


def _read_json(spark: SparkSession, path: str) -> dict:
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        buf = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream)
        )
        parts = []
        line = buf.readLine()
        while line is not None:
            parts.append(line)
            line = buf.readLine()
    finally:
        stream.close()
    return json.loads("".join(parts))


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending. Incomplete commits never
    appear (rename atomicity)."""
    fs, jvm = _fs(spark, f"{path}/_vlog")
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_vlog")
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("v-") and name.endswith(".json"):
            out.append(int(name[2:-5]))
    return sorted(out)


def _manifest(spark: SparkSession, path: str, version: int) -> dict:
    return _read_json(spark, f"{path}/_vlog/v-{version:05d}.json")


def _shard_expr(key_col: str, n_shards: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")


def write_versioned(
    df: DataFrame, path: str, key_col: str, n_shards: int
) -> int:
    """Create version 0 of a versioned sharded table. Returns 0."""
    if list_versions(df.sparkSession, path):
        raise ValueError(f"versioned table already exists at {path}")
    spark = df.sparkSession
    shard = _shard_expr(key_col, n_shards)
    staged = df.withColumn("__shard", shard)
    dirs: dict[str, str] = {}
    counts: dict[str, int] = {}
    # one write, partitioned by shard, then REGISTER each partition
    # directory under its versioned name via rename
    tmp = f"{path}/_stage-v0"
    staged.write.mode("overwrite").partitionBy("__shard").parquet(tmp)
    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    got = {
        int(r["__shard"]): int(r["n"])
        for r in spark.read.parquet(tmp)
        .groupBy("__shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for s in range(n_shards):
        d = f"d-00000-{s:05d}"
        src = P(f"{tmp}/__shard={s}")
        if fs.exists(src):
            fs.rename(src, P(f"{path}/{d}"))
        else:
            # empty shard: an empty directory keeps the manifest
            # uniform (readers skip empty dirs via the counts)
            fs.mkdirs(P(f"{path}/{d}"))
        dirs[str(s)] = d
        counts[str(s)] = got.get(s, 0)
    fs.delete(P(tmp), True)
    _write_atomic(
        spark,
        f"{path}/_vlog/v-00000.json",
        {
            "version": 0,
            "key_col": key_col,
            "n_shards": n_shards,
            "dirs": dirs,
            "counts": counts,
        },
    )
    return 0


def merge_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    delete_keys: DataFrame | None = None,
) -> int:
    """MERGE (upsert + optional delete) producing a NEW version:
    touched shards get fresh immutable directories, untouched shards
    are carried by reference — the manifest rename is the atomic
    commit, so a crash at any earlier point leaves the table exactly
    at the previous version with only orphan directories to vacuum.
    Returns the new version number.

    Same one-row-per-key precondition as the table formats' MERGE.
    """
    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"no versioned table at {path}")
    cur = _manifest(spark, path, versions[-1])
    key_col, n_shards = cur["key_col"], cur["n_shards"]
    dup = (
        updates.groupBy(key_col)
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "merge_versioned: updates contain duplicate keys; MERGE "
            "requires one source row per key"
        )
    shard = _shard_expr(key_col, n_shards)
    keys = updates.select(F.col(key_col))
    if delete_keys is not None:
        keys = keys.unionByName(delete_keys.select(F.col(key_col)))
    touched = sorted(
        r["s"] for r in keys.select(shard.alias("s")).distinct().collect()
    )  # bounded by n_shards
    newv = versions[-1] + 1
    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    dirs = dict(cur["dirs"])
    counts = dict(cur["counts"])
    for s in touched:
        old_dir = f"{path}/{cur['dirs'][str(s)]}"
        old_rows = (
            spark.read.parquet(old_dir)
            if int(cur["counts"][str(s)]) > 0
            else updates.limit(0)  # empty frame, updates schema
        )
        merged = old_rows.join(
            keys.distinct(), key_col, "left_anti"
        ).unionByName(updates.filter(shard == s))
        if delete_keys is not None:
            merged = merged.join(
                delete_keys.select(key_col).distinct(), key_col, "left_anti"
            )
        d = f"d-{newv:05d}-{s:05d}"
        # overwrite, not errorifexists: single-writer is contractual,
        # so an existing d-<newv>-<shard> can only be debris from a
        # CRASHED commit of this same version (the manifest rename
        # never happened, or _write_atomic would have bumped newv) —
        # a crashed merge must not wedge the next one until vacuum
        merged.write.mode("overwrite").parquet(f"{path}/{d}")
        n = spark.read.parquet(f"{path}/{d}").count()
        dirs[str(s)] = d
        counts[str(s)] = n
    _write_atomic(
        spark,
        f"{path}/_vlog/v-{newv:05d}.json",
        {
            "version": newv,
            "key_col": key_col,
            "n_shards": n_shards,
            "dirs": dirs,
            "counts": counts,
        },
    )
    return newv


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read AS OF ``version`` (default: latest). The
    resolved directories are immutable, so the returned frame is a
    consistent snapshot no concurrent merge can disturb — and any
    retained historical version reads identically forever."""
    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"no versioned table at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not available (have {versions}) — vacuumed?"
        )
    man = _manifest(spark, path, v)
    dirs = [
        f"{path}/{d}"
        for s, d in sorted(man["dirs"].items(), key=lambda kv: int(kv[0]))
        if int(man["counts"][s]) > 0
    ]
    if not dirs:
        raise ValueError(f"version {v} is empty")
    return spark.read.parquet(*dirs)


def vacuum_versions(
    spark: SparkSession, path: str, keep_last: int = 2
) -> list[int]:
    """Retire all but the last ``keep_last`` versions: delete their
    manifests, then every data directory no retained manifest
    references (orphans from crashed merges included). Returns the
    versions removed. Readers of retained versions are unaffected —
    their directories are still referenced."""
    versions = list_versions(spark, path)
    keep = versions[-keep_last:] if keep_last > 0 else []
    drop = [v for v in versions if v not in keep]
    referenced = set()
    for v in keep:
        referenced.update(_manifest(spark, path, v)["dirs"].values())
    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    latest = versions[-1] if versions else -1
    for v in drop:
        fs.delete(P(f"{path}/_vlog/v-{v:05d}.json"), False)
    for st in fs.listStatus(P(path)):
        name = st.getPath().getName()
        if not name.startswith("d-") or name in referenced:
            continue
        # directories versioned PAST the latest committed manifest
        # belong to an in-flight merge that has written data but not
        # yet committed — deleting them would leave the manifest it
        # is about to publish referencing missing directories. They
        # become vacuumable once a newer manifest exists (committed:
        # retained or droppable; crashed: superseded by the next
        # commit's version number).
        try:
            dir_version = int(name.split("-")[1])
        except (IndexError, ValueError):
            continue  # not ours; never delete unrecognized names
        if dir_version > latest:
            continue
        fs.delete(st.getPath(), True)
    return drop
