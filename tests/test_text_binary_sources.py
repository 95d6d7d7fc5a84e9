"""Raw text and binaryFile ingest (sources/readers.py round-9
additions): the two built-in Spark sources the reader layer lacked —
`text` is the raw-corpus ingest shape (one line or one file per
row), `binaryFile` is the object-storage edge of the multimodal
column model (file → BINARY content column → Arrow decoder). The
binaryFile test runs the FULL path end-to-end: files on disk →
binaryFile scan → the engine's real PPM decoder — proving payload
columns can enter the engine from a directory, not only from
fixture parquet."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_read_text_lines_and_wholetext(spark, tmp_path):
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_text,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha\nbeta\n")
    (d / "b.txt").write_text("gamma\n")

    lines = read_text(spark, str(d))
    assert lines.columns == ["value"]
    got = sorted(r.value for r in lines.collect())
    assert got == ["alpha", "beta", "gamma"]

    whole = read_text(spark, str(d), wholetext=True)
    docs = sorted(r.value for r in whole.collect())
    assert docs == ["alpha\nbeta\n", "gamma\n"]


def test_read_text_glob_and_linesep(spark, tmp_path):
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_text,
    )

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "keep.txt").write_text("k1|k2|k3")
    (d / "skip.log").write_text("nope")

    df = read_text(spark, str(d), line_sep="|", path_glob="*.txt")
    assert sorted(r.value for r in df.collect()) == ["k1", "k2", "k3"]


def test_binary_files_to_real_decoder(spark, tmp_path):
    """Disk → binaryFile scan → extract doc id from the path →
    mapInPandas PPM decode. The decoded means must match decoding
    the same payload directly (byte-identical content through the
    scan)."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_ppm_bytes,
        extract_image_features,
        synthesize_ppm,
    )
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_binary_files,
    )

    d = tmp_path / "images"
    d.mkdir()
    expected = {}
    for i in (1, 2, 3):
        payload = synthesize_ppm(seed=i)
        (d / f"img_{i}.ppm").write_bytes(payload)
        expected[i] = decode_ppm_bytes(payload)
    (d / "notes.txt").write_text("not an image")

    files = read_binary_files(spark, str(d), path_glob="*.ppm")
    assert set(files.columns) == {
        "path", "modificationTime", "length", "content",
    }
    assert files.count() == 3  # the glob pruned notes.txt

    with_id = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.ppm$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = {
        r.doc_id: r
        for r in extract_image_features(
            with_id, "doc_id", "payload"
        ).collect()
    }
    assert set(feats) == {1, 2, 3}
    for i, (w, h, r_, g, b) in expected.items():
        row = feats[i]
        assert (row.width, row.height) == (w, h)
        assert abs(row.mean_r - r_) < 1e-9
        assert abs(row.mean_g - g) < 1e-9
        assert abs(row.mean_b - b) < 1e-9


def test_binary_files_length_matches_disk(spark, tmp_path):
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_binary_files,
    )

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x00\x01\x02" * 100)
    df = read_binary_files(spark, str(d))
    row = df.collect()[0]
    assert row.length == os.path.getsize(d / "x.bin") == 300
    assert bytes(row.content) == b"\x00\x01\x02" * 100


def test_read_text_gzip_transparent(spark, tmp_path):
    """gzip text decodes transparently (one task per .gz file — the
    non-splittable contract the reader docstring pins)."""
    import gzip

    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_text,
    )

    d = tmp_path / "gz"
    d.mkdir()
    with gzip.open(d / "part-0.txt.gz", "wt") as f:
        f.write("one\ntwo\n")
    df = read_text(spark, str(d))
    assert sorted(r.value for r in df.collect()) == ["one", "two"]


def test_streaming_text_ingest(spark, tmp_path):
    """readStream.text over a watched directory — the streaming twin
    of read_text for continuously-arriving corpora: files dropped in
    the directory become rows; availableNow drains what exists and
    stops (the batch-backfill trigger)."""
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.txt").write_text("alpha\nbeta\n")
    (src / "b.txt").write_text("gamma\n")

    stream = spark.readStream.format("text").load(str(src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("txt_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r.value for r in spark.sql("SELECT value FROM txt_ingest").collect()
    )
    assert got == ["alpha", "beta", "gamma"]
