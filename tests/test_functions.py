"""Unit tests for the Column-composed function library and the
operators not covered by catalog oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.functions.text import (
    char_ngrams,
    fingerprint,
    hamming64,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)
from car_insurance_data_pipeline_spark_spark.operators.keys import (
    assert_unique,
    surrogate_key_hash,
    surrogate_key_ordered,
)
from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    with_media_metadata,
)


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("a",), ("",)], "t string"
    )
    out = df.select(word_shingles("t", 3).alias("s")).collect()
    assert out[0].s == ["a b c", "b c d"]
    assert out[1].s == []
    assert out[2].s == []
    assert out[3].s == []


def test_char_ngrams(spark):
    df = spark.createDataFrame([("Spark",)], "t string")
    out = df.select(char_ngrams("t", 3).alias("g")).collect()[0].g
    assert out == ["spa", "par", "ark"]


def test_token_count_multispace(spark):
    df = spark.createDataFrame([("  a   b \t c  ",), ("",)], "t string")
    out = [r[0] for r in df.select(token_count("t")).collect()]
    assert out == [3, 0]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("HELLO   WORLD.",)], "t string"
    )
    fps = [r[0] for r in df.select(fingerprint("t")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_lang_id_phrases(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("le chat et la maison est dans les arbres",),
            ("der hund ist nicht mit der katze",),
            ("xyzzy plugh qwerty",),
        ],
        "t string",
    )
    out = [r[0] for r in df.select(lang_id("t")).collect()]
    assert out == ["en", "fr", "de", "und"]


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is here and it is fine",), ("!!!",)], "t string"
    )
    out = [r[0] for r in df.select(quality_score("t")).collect()]
    assert out[0] == 1.0
    assert out[1] < 0.5


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0110)], "a long, b long")
    # 1011 ^ 0110 = 1101 → 3 bits
    assert df.select(hamming64(F.col("a"), F.col("b"))).collect()[0][0] == 3


def test_surrogate_key_ordered(spark):
    df = spark.createDataFrame(
        [(x,) for x in ["d", "a", "c", "b", "e"]], "nk string"
    )
    out = {r.nk: r.sk for r in surrogate_key_ordered(df, ["nk"]).collect()}
    assert out == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}


def test_surrogate_key_hash_stable_unique(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "nk string")
    out = surrogate_key_hash(df, ["nk"])
    assert_unique(out, ["sk"])
    # stable across invocations
    a = {r.nk: r.sk for r in out.collect()}
    b = {r.nk: r.sk for r in surrogate_key_hash(df, ["nk"]).collect()}
    assert a == b


def test_multimodal_metadata_and_features(spark):
    rows = [
        (1, bytearray(b"\xff\xd8\xffrest-of-jpeg")),
        (2, bytearray(b"\x89PNGrest-of-png")),
        (3, bytearray(b"plain bytes")),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    meta = {r.id: r.media_meta for r in with_media_metadata(df, "payload", "image").collect()}
    assert meta[1].format == "jpeg" and meta[2].format == "png"
    assert meta[3].format == "unknown"
    assert meta[1].n_bytes == len(rows[0][1])

    feats = {r.id: r for r in extract_features(df, "id", "payload").collect()}
    assert feats[1].first_byte == 0xFF
    assert feats[3].n_bytes == len(b"plain bytes")

    samples = frame_sample_plan(df, "id", "payload", every_n_bytes=4).collect()
    per_id = {}
    for r in samples:
        per_id.setdefault(r.id, []).append(r.sample_offset)
    assert per_id[3] == [0, 4, 8]


def test_codec_adapter_seam_injects_through_workers(spark):
    """The documented 'swap a codec in, nothing else changes' claim
    (operators/multimodal.py): inject a FAKE codec — a local callable
    with a different feature set and schema — and verify it executes
    on the Python workers (captured by value through cloudpickle, no
    module patching) while the Spark-side plumbing (Arrow batching,
    id threading, schema declaration) is untouched."""
    import pandas as pd

    rows = [
        (1, bytearray(b"\x01\x02\x03\x04")),
        (2, bytearray(b"")),
        (3, None),  # NULL payload must reach the codec as None
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")

    def fake_codec(pdf: pd.DataFrame, payload_col: str) -> pd.DataFrame:
        payloads = pdf[payload_col]
        return pd.DataFrame(
            {
                "fake_width": payloads.map(
                    lambda b: len(b) * 10 if b is not None else -1
                ),
                "fake_tag": payloads.map(
                    lambda b: "null" if b is None else f"ok{len(b)}"
                ),
            }
        )

    out = {
        r.id: r
        for r in extract_features(
            df,
            "id",
            "payload",
            decoder=fake_codec,
            feature_schema="fake_width int, fake_tag string",
        ).collect()
    }
    assert out[1].fake_width == 40 and out[1].fake_tag == "ok4"
    assert out[2].fake_width == 0 and out[2].fake_tag == "ok0"
    assert out[3].fake_width == -1 and out[3].fake_tag == "null"
    # and the default stub path is unchanged by the seam's existence
    stub = {r.id: r for r in extract_features(df, "id", "payload").collect()}
    assert stub[1].n_bytes == 4 and stub[3].n_bytes == 0


def test_streaming_window_and_session(spark, tmp_path):
    """Streaming smoke: drive cleaned telematics through tumbling and
    session windows via the availableNow trigger, compare totals with
    batch."""
    from car_insurance_data_pipeline_spark_spark.plans.insurance import clean_telematics
    from car_insurance_data_pipeline_spark_spark.sources.readers import read_csv
    from car_insurance_data_pipeline_spark_spark.streaming.telematics import (
        read_stream,
        run_to_memory,
        session_event_counts,
        windowed_event_counts,
    )
    from tests import fixtures as fx

    csv = tmp_path / "telematics.csv"
    fx.telematics_csv(str(csv))
    cleaned = clean_telematics(read_csv(spark, str(csv)))
    src = tmp_path / "stream_src"
    cleaned.write.mode("overwrite").parquet(str(src))
    batch_total = cleaned.count()

    stream = read_stream(spark, str(src), cleaned.schema)
    # complete mode: append-mode windows withhold results until the
    # watermark passes them, which a single availableNow batch never does
    run_to_memory(
        windowed_event_counts(stream, window="1 minute"), "win_out", "complete"
    )
    win = spark.sql("SELECT sum(n_events) AS n FROM win_out").collect()[0].n
    assert win == batch_total  # availableNow flushes all windows

    stream2 = read_stream(spark, str(src), cleaned.schema)
    run_to_memory(
        session_event_counts(stream2, gap="30 seconds"), "sess_out", "complete"
    )
    sess = spark.sql(
        "SELECT sum(n_events) AS n, count(*) AS k FROM sess_out"
    ).collect()[0]
    assert sess.n == batch_total
    assert sess.k >= 3  # at least one session per device


def test_pii_scrub_masks_and_counts(spark):
    """pii_scrub as a reusable operator: literal mask verification on
    hand-built rows (the catalog query q84 only hash-checks). Counts
    must equal the tags in the masked output — an IP inside an email
    is consumed by the email mask and never counted as an IP."""
    from car_insurance_data_pipeline_spark_spark.functions.text import pii_scrub

    rows = [
        (1, "mail me at jo.doe+x@sub.example.org today"),
        (2, "server 192.168.1.254 then call +12025550142"),
        (3, "no pii here at all"),
        (4, "two mails a@b.io and c.d@e-f.co plus 8.8.8.8"),
        (5, "ping a@1.2.3.4.com now"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    counts, masked = pii_scrub("t")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            counts["n_emails"].alias("e"),
            counts["n_ips"].alias("i"),
            counts["n_phones"].alias("p"),
            masked.alias("m"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 0, 0)
    assert out[1]["m"] == "mail me at [EMAIL] today"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 1, 1)
    assert out[2]["m"] == "server [IP] then call [PHONE]"
    assert out[3]["m"] == "no pii here at all"
    assert (out[4]["e"], out[4]["i"]) == (2, 1)
    assert out[4]["m"] == "two mails [EMAIL] and [EMAIL] plus [IP]"
    # overlap: the email mask consumes the embedded dotted quad
    assert (out[5]["e"], out[5]["i"], out[5]["p"]) == (1, 0, 0)
    assert out[5]["m"] == "ping [EMAIL] now"
