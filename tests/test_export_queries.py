"""Corpus-export layer: skew-resistant grouped top-N equivalence +
plan shape, sketch-quantile accuracy bounds, and the streaming
exactly-once dedup's multi-batch redelivery proof.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.operators.topn import topn_per_group
from car_insurance_data_pipeline_spark_spark.plans.catalog import get_spec, table


def _plain_topn(df, group_cols, order_by, n):
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= n
    )


def test_topn_matches_plain_window(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    for n in (1, 3, 10):
        two_phase = topn_per_group(
            d, ["source"], order, n=n, tie_col="doc_id", salt_buckets=4
        ).select("source", "doc_id", "n_chars", "rn")
        plain = _plain_topn(d, ["source"], order, n).select(
            "source", "doc_id", "n_chars", "rn"
        )
        assert two_phase.exceptAll(plain).count() == 0
        assert plain.exceptAll(two_phase).count() == 0


def test_topn_multi_group_cols(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "source", "lang", "doc_id", "n_chars"
    )
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    two_phase = topn_per_group(
        d, ["source", "lang"], order, n=2, tie_col="doc_id", salt_buckets=4
    ).select("source", "lang", "doc_id", "rn")
    plain = _plain_topn(d, ["source", "lang"], order, 2).select(
        "source", "lang", "doc_id", "rn"
    )
    assert two_phase.exceptAll(plain).count() == 0
    assert plain.exceptAll(two_phase).count() == 0


def test_q91_plan_salts_first_window(spark, sf_dir):
    """The scale property q91 exists for: phase 1's exchange must
    partition on (source, __salt), not source alone — the bounded
    per-group sort. If __salt vanishes from the physical plan the
    operator silently degraded to the single-window skew hazard."""
    df = get_spec("q91_source_cap").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_quantile_sketch_rank_bounds(spark, sf_dir):
    """percentile_approx guarantees rank error <= n/accuracy; assert
    every reported quantile lies within that window of the exact
    order statistics (computed per event_type on the driver — the
    fixture is small)."""
    res = {
        r["event_type"]: r
        for r in get_spec("q92_quantile_sketch").fn(spark, sf_dir).collect()
    }
    from car_insurance_data_pipeline_spark_spark.plans.relational import (
        events_with_us,
    )

    e = events_with_us(spark, sf_dir).select("event_type", "value", "user_id")
    pdf = e.toPandas()
    for etype, grp in pdf.groupby("event_type"):
        vals = sorted(grp["value"].tolist())
        n = len(vals)
        slack = math.ceil(n / 1000) + 1
        row = res[etype]
        assert row["n_events"] == n
        for q, approx in zip((0.5, 0.9, 0.99), row["value_q"]):
            r = q * n
            lo = vals[max(0, math.floor(r) - slack)]
            hi = vals[min(n - 1, math.ceil(r) + slack)]
            assert lo <= approx <= hi, (etype, q, approx, lo, hi)
        exact_users = grp["user_id"].nunique()
        assert abs(row["approx_users"] - exact_users) <= 0.1 * exact_users


def test_streaming_dedup_is_multi_batch_and_needed(spark, sf_dir):
    """The redelivery staging must (a) actually inflate the source
    (dedup has work to do), and (b) run >= 4 micro-batches so the
    duplicates arrive across batch boundaries — otherwise q93's
    oracle equality would hold vacuously."""
    from car_insurance_data_pipeline_spark_spark.plans.streaming_queries import (
        _run_complete,
        _split_events_with_redelivery,
    )

    src, schema = _split_events_with_redelivery(spark, sf_dir)
    staged = spark.read.schema(schema).parquet(src)
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_staged, n_base = staged.count(), base.count()
    assert n_staged > n_base  # duplicates present
    assert staged.select("event_id").distinct().count() == n_base

    out, n_batches = _run_complete(
        spark,
        sf_dir,
        lambda s: s.withWatermark("event_ts", "60 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events")),
        lambda t: t,
        sink="t_dedup_probe",
        stage=_split_events_with_redelivery,
    )
    assert n_batches >= 4
    assert sum(r["n_events"] for r in out.collect()) == n_base


def test_compact_parquet_file_counts(spark, tmp_path):
    """64 tiny files -> ceil(1000/400)=3 files, rows preserved."""
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        compact_parquet,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    spark.range(1000).repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 64
    man = compact_parquet(spark, src, dst, target_rows_per_file=400)
    assert man.count() == 3  # manifest: one row per written file
    assert len(glob.glob(f"{dst}/part-*")) == 3
    assert spark.read.parquet(dst).count() == 1000
    # manifest reconciles against the actual files
    got = {r["path"].replace("file://", ""): r["n_rows"] for r in man.collect()}
    for f in glob.glob(f"{dst}/part-*"):
        assert got[f] == spark.read.parquet(f).count()


def test_write_range_sorted_global_order(spark, tmp_path):
    """Files carry disjoint ascending key ranges and rows inside
    each file are sorted — i.e. the concatenation in filename order
    is globally sorted, with no single-partition sort anywhere."""
    import glob

    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_range_sorted,
    )

    dst = str(tmp_path / "sorted")
    df = spark.range(10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("k"), F.col("id")
    )
    man = write_range_sorted(df, dst, ["k"], n_files=8)
    files = sorted(glob.glob(f"{dst}/part-*"))
    assert len(files) == 8
    prev_max = None
    total = 0
    stats = {}
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        total += len(pdf)
        ks = pdf["k"].tolist()
        assert ks == sorted(ks), f  # sorted within file
        if prev_max is not None and ks:
            assert ks[0] >= prev_max  # disjoint ascending ranges
        if ks:
            prev_max = ks[-1]
        stats[f] = (len(pdf), min(ks), max(ks))
    assert total == 10_000
    # the returned manifest reconciles file for file: row counts and
    # (min, max) key per file match the actual parquet contents
    got = {
        r["path"].replace("file://", ""): (r["n_rows"], r["min_k"], r["max_k"])
        for r in man.collect()
    }
    assert got == stats


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    import pytest

    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        compact_parquet,
    )

    src = str(tmp_path / "d")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="NEW directory"):
        compact_parquet(spark, src, src, target_rows_per_file=5)
    assert spark.read.parquet(src).count() == 10  # source untouched


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files must cover compact regions of BOTH columns:
    the mean per-file span of the SECONDARY column is far below the
    global span (a plain sort by x leaves y's per-file span at
    ~the full range — also asserted, as the contrast)."""
    import glob

    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_range_sorted,
        write_zordered,
    )

    n = 1 << 14
    # two independent-ish uniform dimensions from a hash mix
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("x"),
        (F.col("id") * 40503 % n).alias("y"),
    )

    def mean_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/part-*"):
            pdf = spark.read.parquet(f).toPandas()
            spans.append(int(pdf[col].max()) - int(pdf[col].min()))
        return sum(spans) / len(spans)

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zdir, "x", "y", (0, n - 1), (0, n - 1), n_files=16)
    write_range_sorted(df, sdir, ["x"], n_files=16)

    # plain sort: x is tight, y is ~global
    assert mean_span(sdir, "x") < n / 8
    assert mean_span(sdir, "y") > n * 0.8
    # z-order: BOTH dimensions well below global span
    assert mean_span(zdir, "x") < n / 2
    assert mean_span(zdir, "y") < n / 2


def test_read_pruned_skips_files_and_matches_full_scan(spark, tmp_path):
    """Manifest-driven data skipping closed-loop: read_pruned must
    (a) return exactly the rows a full-scan filter returns, (b)
    decide to open strictly fewer files than the export holds, and
    (c) on a z-ordered layout do so for EITHER cluster column —
    the whole point of the Morton layout. Also pins the
    empty-overlap path (schema-stable empty result)."""
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_pruned,
    )
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_zordered,
    )

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("x"),
        (F.col("id") * 40503 % n).alias("y"),
    )
    zdir = str(tmp_path / "z")
    manifest = write_zordered(
        df, zdir, "x", "y", (0, n - 1), (0, n - 1), n_files=16
    ).cache()
    n_files = manifest.count()
    full = spark.read.parquet(zdir)
    lo, hi = 100, n // 10
    for col in ("x", "y"):
        opened = manifest.filter(
            (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
        ).count()
        assert opened < n_files, f"{col}: no file-level pruning happened"
        got = read_pruned(spark, manifest, col, lo, hi)
        exp = full.filter(F.col(col).between(lo, hi))
        assert got.count() == exp.count()
        g = got.agg(F.sum("x").alias("sx"), F.sum("y").alias("sy")).collect()[0]
        e = exp.agg(F.sum("x").alias("sx"), F.sum("y").alias("sy")).collect()[0]
        assert (g.sx, g.sy) == (e.sx, e.sy)
    nothing = read_pruned(spark, manifest, "x", n * 10, n * 20)
    assert nothing.count() == 0
    assert nothing.schema == full.schema


def test_read_pruned_random_intervals_match_full_scan(spark, tmp_path):
    """Seeded sweep of 12 arbitrary intervals (including degenerate
    point and clamped-past-domain ranges) per dimension over one
    z-ordered layout: pruned reads must equal the full-scan filter
    on count and column sums every time — the invariant a data-
    skipping bug would break first."""
    import random

    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_pruned,
    )
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_zordered,
    )

    n = 1 << 13
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("x"),
        (F.col("id") * 40503 % n).alias("y"),
    )
    zdir = str(tmp_path / "z")
    manifest = write_zordered(
        df, zdir, "x", "y", (0, n - 1), (0, n - 1), n_files=8
    ).cache()
    full = spark.read.parquet(zdir)
    rng = random.Random(11)
    cases = [(0, 0), (n - 1, 2 * n)]  # point at origin; clamp past domain
    cases += [
        tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(10)
    ]
    for col in ("x", "y"):
        for lo, hi in cases:
            got = read_pruned(spark, manifest, col, lo, hi)
            exp = full.filter(F.col(col).between(lo, hi))
            g = got.agg(
                F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
            ).collect()[0]
            e = exp.agg(
                F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
            ).collect()[0]
            assert tuple(g) == tuple(e), (col, lo, hi)


def test_zorder_n_dims_cluster_all_columns(spark, tmp_path):
    """3-d Morton layout: per-file span of EVERY dimension must sit
    well below the global span (a lexicographic sort only helps its
    leading column), and the 2-d n-ary key must equal the dedicated
    2-d implementation bit for bit."""
    import glob

    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        zorder_key,
        zorder_key_n,
    )

    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("x"),
        (F.col("id") * 40503 % n).alias("y"),
        (F.col("id") * 69069 % n).alias("z"),
    )
    # bit-equality of the 2-d specialization
    eq = df.select(
        (
            zorder_key("x", "y", (0, n - 1), (0, n - 1))
            == zorder_key_n(["x", "y"], [(0, n - 1), (0, n - 1)])
        ).alias("same")
    )
    assert eq.filter(~F.col("same")).count() == 0

    zc = zorder_key_n(
        ["x", "y", "z"], [(0, n - 1)] * 3, bits=10
    ).alias("__z")
    out = str(tmp_path / "z3")
    (
        df.withColumn("__z", zc)
        .repartitionByRange(64, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(out)
    )
    for col in ("x", "y", "z"):
        spans = []
        for f in glob.glob(f"{out}/part-*"):
            pdf = spark.read.parquet(f).toPandas()
            spans.append(int(pdf[col].max()) - int(pdf[col].min()))
        assert sum(spans) / len(spans) < n / 2, col
