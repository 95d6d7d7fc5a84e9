"""Baseline-JPEG codec (stdlib+numpy): exact law round-trip across
seeds and shapes, error containment on malformed payloads, and the
decoder's generality knobs (DHT-driven Huffman, multi-block DC
prediction, ZRL handling — all exercised by construction)."""

from __future__ import annotations

import math

import pytest

from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
    decode_jpeg_bytes,
    jpeg_block_law,
    synthesize_jpeg,
)

_POS = {0, 3, 4, 7}


def _law_features(seed: int, width: int, height: int):
    bw = width // 8
    tot = dev2 = 0
    for y in range(height):
        for x in range(width):
            bi = (y // 8) * bw + (x // 8)
            dc, ac = jpeg_block_law(seed, bi)
            sx = 1 if (x % 8) in _POS else -1
            sy = 1 if (y % 8) in _POS else -1
            p = 128 + dc + ac * sx * sy
            tot += p
            dev2 += (p - 128) ** 2
    n = width * height
    return tot / float(n), math.sqrt(dev2 / float(n))


@pytest.mark.parametrize("seed", [0, 1, 7, 123, 9999, 123456789])
def test_decode_matches_generation_law(seed):
    w, h, mean, rms = decode_jpeg_bytes(synthesize_jpeg(seed))
    em, er = _law_features(seed, 16, 16)
    assert (w, h) == (16, 16)
    assert mean == em  # exact: power-of-two divisions, integer sums
    assert rms == er


def test_non_square_multi_block_shapes():
    for width, height in [(8, 8), (24, 8), (16, 32)]:
        w, h, mean, rms = decode_jpeg_bytes(
            synthesize_jpeg(42, width=width, height=height)
        )
        em, er = _law_features(42, width, height)
        assert (w, h) == (width, height)
        assert mean == em and rms == er


def test_malformed_payloads_raise():
    good = synthesize_jpeg(5)
    with pytest.raises(ValueError):
        decode_jpeg_bytes(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg_bytes(good[:40])  # truncated mid-segment
    # corrupt a byte inside the entropy stream: either an invalid
    # Huffman code / exhausted bitstream (ValueError) or a decode to
    # DIFFERENT features — never a silent identical result
    body = bytearray(good)
    body[-12] ^= 0x55
    try:
        out = decode_jpeg_bytes(bytes(body))
        assert out != decode_jpeg_bytes(good)
    except ValueError:
        pass


def test_progressive_and_color_rejected():
    good = synthesize_jpeg(5)
    # flip SOF0 marker to SOF2 (progressive): find FFC0
    i = good.index(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_bytes(prog)


def test_spark_extract_jpeg_features(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_jpeg_features,
    )

    rows = [(i, synthesize_jpeg(i)) for i in range(6)] + [(99, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.mean_lum, r.rms_dev)
        for r in extract_jpeg_features(df, "doc_id", "payload").collect()
    }
    for i in range(6):
        em, er = _law_features(i, 16, 16)
        assert got[i] == (16, 16, em, er)
    assert got[99] == (None, None, None, None)  # contained, not raised
