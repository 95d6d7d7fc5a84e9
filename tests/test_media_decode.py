"""Real PPM/WAV decoders: byte-level parsing properties that the
closed-form oracle (tests via q118/q119 parity) cannot isolate —
header comments, malformed input containment, resize semantics."""

from __future__ import annotations

import numpy as np
import pytest

from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
    _png_chunk,
    _PNG_SIG,
    decode_png_bytes,
    decode_ppm_bytes,
    decode_wav_bytes,
    resize_nearest,
    synthesize_png,
    synthesize_ppm,
    synthesize_wav,
)


def _handmade_png(width, height, scanlines):
    """Build a PNG from explicit (filter_byte, filtered_bytes) rows —
    independent of synthesize_png's encoder, so filter math is
    pinned by hand-computed vectors, not encoder/decoder symmetry."""
    import struct
    import zlib

    plain = b"".join(bytes([f]) + bytes(row) for f, row in scanlines)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(plain))
        + _png_chunk(b"IEND", b"")
    )


def test_ppm_round_trip_matches_generation_law():
    w, h, r, g, b = decode_ppm_bytes(synthesize_ppm(42))
    n = 16 * 8
    assert (w, h) == (16, 8)
    assert r == sum((42 * 7 + 3 * j) % 256 for j in range(n)) / n
    assert g == sum((42 * 7 + 3 * j + 1) % 256 for j in range(n)) / n
    assert b == sum((42 * 7 + 3 * j + 2) % 256 for j in range(n)) / n


def test_ppm_header_comments_are_skipped():
    body = bytes(range(2 * 1 * 3))
    payload = b"P6\n# a comment\n2 1\n# another\n255\n" + body
    w, h, r, g, b = decode_ppm_bytes(payload)
    assert (w, h) == (2, 1)
    assert (r, g, b) == ((0 + 3) / 2, (1 + 4) / 2, (2 + 5) / 2)


def test_ppm_rejects_non_p6_and_16bit():
    with pytest.raises(ValueError):
        decode_ppm_bytes(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError):
        decode_ppm_bytes(b"P6\n1 1\n65535\n" + bytes(6))


def test_wav_round_trip_and_chunk_walk():
    rate, n, rms, peak = decode_wav_bytes(synthesize_wav(7))
    assert (rate, n) == (8000, 256)
    samples = [((7 * 13 + j) % 256 - 128) * 256 for j in range(256)]
    assert peak == max(abs(s) for s in samples)
    assert rms == pytest.approx(
        (sum(s * s for s in samples) / 256) ** 0.5, rel=0, abs=0
    )


def test_wav_skips_unknown_chunks_with_alignment():
    """An odd-sized unknown chunk before data must be skipped with
    word alignment (the RIFF rule a naive parser breaks on)."""
    import struct

    base = synthesize_wav(3)
    # splice an odd-length junk chunk right after the fmt chunk
    fmt_end = 12 + 8 + 16
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    patched = base[:fmt_end] + junk + base[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav_bytes(patched) == decode_wav_bytes(base)


def test_wav_rejects_stereo_and_truncated():
    with pytest.raises(ValueError):
        decode_wav_bytes(b"RIFF\x00\x00\x00\x00AVI ")
    import struct
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # stereo
    bad = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt)
    with pytest.raises(ValueError):
        decode_wav_bytes(bad)


def test_resize_nearest_shapes_and_gather():
    arr = np.arange(8 * 16 * 3, dtype=np.uint8).reshape(8, 16, 3)
    out = resize_nearest(arr, 4, 4)
    assert out.shape == (4, 4, 3)
    # pure gather: every output pixel is an exact input pixel
    assert all(
        (out[i, j] == arr[(i * 8) // 4, (j * 16) // 4]).all()
        for i in range(4) for j in range(4)
    )
    # upscale repeats pixels, never interpolates
    up = resize_nearest(arr, 16, 16)
    assert up.shape == (16, 16, 3)
    assert set(np.unique(up)) <= set(np.unique(arr))


def test_png_round_trip_matches_generation_law():
    w, h, r, g, b = decode_png_bytes(synthesize_png(42))
    n = 16 * 8
    assert (w, h) == (16, 8)
    assert r == sum((42 * 11 + 15 * j) % 256 for j in range(n)) / n
    assert g == sum((42 * 11 + 15 * j + 5) % 256 for j in range(n)) / n
    assert b == sum((42 * 11 + 15 * j + 10) % 256 for j in range(n)) / n


def test_png_sub_and_paeth_filters_hand_vectors():
    """Hand-computed reconstruction: row 0 Sub (recon = filt + left),
    row 1 Paeth (first pixel predicts from Up, second resolves the
    three-way predictor to Up via smallest |p - up|)."""
    png = _handmade_png(
        2, 2,
        [(1, [10, 20, 30, 5, 5, 5]), (4, [1, 1, 1, 1, 1, 1])],
    )
    w, h, r, g, b = decode_png_bytes(png)
    # pixels: (10,20,30),(15,25,35) / (11,21,31),(16,26,36)
    assert (w, h) == (2, 2)
    assert (r, g, b) == (13.0, 23.0, 33.0)


def test_png_average_filter_floors():
    """Average filter must use floor((left + up)/2) — integer
    truncation, not rounding."""
    png = _handmade_png(
        2, 2,
        [(0, [4, 0, 0, 8, 0, 0]), (3, [1, 0, 0, 1, 0, 0])],
    )
    w, h, r, g, b = decode_png_bytes(png)
    # row1: (0+4)//2+1 = 3; (3+8)//2+1 = 6
    assert r == (4 + 8 + 3 + 6) / 4
    assert (g, b) == (0.0, 0.0)


def test_png_up_filter_and_multi_idat():
    """Up filter adds the prior scanline byte; IDAT may be split
    across chunks (decoder must concatenate before inflating)."""
    import struct
    import zlib

    plain = bytes([0]) + bytes([7, 8, 9]) + bytes([2]) + bytes([250, 250, 250])
    ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 2, 0, 0, 0)
    z = zlib.compress(plain)
    split = len(z) // 2
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:split])
        + _png_chunk(b"IDAT", z[split:])
        + _png_chunk(b"IEND", b"")
    )
    w, h, r, g, b = decode_png_bytes(png)
    # row1 wraps mod 256: (250+7)%256=1, (250+8)%256=2, (250+9)%256=3
    assert (w, h) == (1, 2)
    assert (r, g, b) == ((7 + 1) / 2, (8 + 2) / 2, (9 + 3) / 2)


def test_png_rejects_bad_crc_magic_and_filter():
    good = synthesize_png(5)
    with pytest.raises(ValueError):
        decode_png_bytes(b"\x89PNX" + good[4:])
    corrupt = bytearray(good)
    corrupt[60] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png_bytes(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png_bytes(_handmade_png(1, 1, [(9, [1, 2, 3])]))


def test_png_undecodable_payload_yields_null_row(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_png_features,
    )

    rows = [(1, bytearray(synthesize_png(1))), (2, bytearray(b"\x89PNG junk"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           extract_png_features(df, "doc_id", "payload").collect()}
    assert out[1]["width"] == 16 and out[1]["mean_r"] is not None
    assert out[2]["width"] is None and out[2]["mean_r"] is None


def test_undecodable_payload_yields_null_row(spark):
    """The Spark-side feature extractor contains per-row failures as
    NULL feature rows instead of failing the batch."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_image_features,
    )

    rows = [(1, bytearray(synthesize_ppm(1))), (2, bytearray(b"not a ppm"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           extract_image_features(df, "doc_id", "payload").collect()}
    assert out[1]["width"] == 16 and out[1]["mean_r"] is not None
    assert out[2]["width"] is None and out[2]["mean_r"] is None


# ---------------------------------------------------------------------------
# GIF / LZW (q152's codec)
# ---------------------------------------------------------------------------


def test_lzw_kwkwk_hand_vector():
    """Decoder-independent vector: codes [CLEAR,0,6,EOI] at
    min_code=2 (width 3, LSB-first) pack to 0x84 0x0B; code 6 is the
    not-yet-defined next slot — the KwKwK case — and must expand to
    prev + prev[0], giving output [0,0,0]."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import _lzw_decode

    assert _lzw_decode(b"\x84\x0b", 2, 3) == [0, 0, 0]


def test_lzw_fixed_width_literal_stream():
    """'Uncompressed GIF' style stream: literals only, CLEAR emitted
    before the dictionary would force a width change — decoder must
    track the resets. Codes (min_code=2, width stays 3):
    CLEAR 1 2 CLEAR 3 1 EOI -> [1,2,3,1]."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import _lzw_decode

    codes = [4, 1, 2, 4, 3, 1, 5]
    acc = 0
    nacc = 0
    out = bytearray()
    for c in codes:
        acc |= c << nacc
        nacc += 3
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    assert _lzw_decode(bytes(out), 2, 4) == [1, 2, 3, 1]


def test_lzw_roundtrip_crosses_width_boundaries():
    import random

    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    for seed in range(25):
        rng = random.Random(seed)
        n = rng.randrange(1, 600)
        idx = [rng.randrange(16) for _ in range(n)]
        assert _lzw_decode(_lzw_encode(idx, 4), 4, n) == idx


def test_lzw_rejects_truncated_and_overlong():
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    enc = _lzw_encode([1, 2, 3, 1, 2, 3], 4)
    with pytest.raises(ValueError):
        _lzw_decode(enc[:2], 4, 6)  # truncated, no EOI
    with pytest.raises(ValueError):
        _lzw_decode(enc, 4, 3)  # more pixels than declared


def test_gif_round_trip_matches_generation_law():
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_gif_bytes,
        synthesize_gif,
    )

    w, h, r, g, b = decode_gif_bytes(synthesize_gif(42))
    n = 128
    idx = [(42 + j * j) % 16 for j in range(n)]
    assert (w, h) == (16, 8)
    assert r == sum((42 + 17 * i) % 256 for i in idx) / n
    assert g == sum((84 + 29 * i) % 256 for i in idx) / n
    assert b == sum((126 + 41 * i) % 256 for i in idx) / n


def test_gif_skips_extension_blocks():
    """GIF89a graphic-control extension before the image descriptor
    must be skipped by the sub-block walk."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_gif_bytes,
        synthesize_gif,
    )

    base = synthesize_gif(7)
    # splice an extension (0x21 0xF9, one 4-byte sub-block, term)
    insert_at = 13 + 16 * 3  # after header + GCT
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = base[:insert_at] + ext + base[insert_at:]
    assert decode_gif_bytes(patched) == decode_gif_bytes(base)


def test_gif_rejects_bad_magic_and_missing_descriptor():
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_gif_bytes,
        synthesize_gif,
    )

    good = synthesize_gif(3)
    with pytest.raises(ValueError):
        decode_gif_bytes(b"JIF87a" + good[6:])
    with pytest.raises(ValueError):
        decode_gif_bytes(good[: 13 + 48])  # ends after the palette


def test_gif_undecodable_payload_yields_null_row(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_gif_features,
        synthesize_gif,
    )

    rows = [(1, bytearray(synthesize_gif(1))), (2, bytearray(b"GIF87a junk"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           extract_gif_features(df, "doc_id", "payload").collect()}
    assert out[1]["width"] == 16 and out[1]["mean_g"] is not None
    assert out[2]["width"] is None and out[2]["mean_g"] is None


class TestBmpDecode:
    def test_roundtrip_matches_generation_law(self):
        import numpy as np

        from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
            decode_bmp_bytes,
            synthesize_bmp,
        )

        for seed in (0, 3, 255, 99999):
            w, h, r, g, b, trs = decode_bmp_bytes(synthesize_bmp(seed))
            ks = np.arange(10 * 6 * 3)
            vals = (seed * 19 + ks) % 256
            exp = [vals[c::3].sum() / 60.0 for c in range(3)]
            assert (w, h) == (10, 6)
            assert (r, g, b) == tuple(exp)
            assert trs == int(vals[: 10 * 3].sum())

    def test_every_layout_trap_is_load_bearing(self):
        """Skipping ANY of the three BMP layout steps (row flip,
        BGR swap, padding strip) must change the channel means — so
        the oracle hash genuinely pins all three."""
        import numpy as np

        from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
            synthesize_bmp,
        )

        seed = 7
        b = synthesize_bmp(seed)
        width, height, stride = 10, 6, 32
        raw = np.frombuffer(b, np.uint8, count=stride * height, offset=54)

        def feats(flip: bool, swap: bool, strip_pad: bool):
            if strip_pad:
                px = raw.reshape(height, stride)[:, : width * 3].reshape(
                    height, width, 3
                )
            else:
                # a decoder that forgets stride reads the pixel area
                # as a contiguous 30-byte-row stream, bleeding into
                # the padding bytes
                px = raw[: height * width * 3].reshape(height, width, 3)
            if flip:
                px = px[::-1]
            if swap:
                px = px[:, :, ::-1]
            means = tuple(px.astype(np.int64).mean(axis=(0, 1)))
            return means + (int(px[0].astype(np.int64).sum()),)

        good = feats(True, True, True)
        # the top-row checksum pins the flip (means are row-order
        # invariant); the means pin the swap and the padding
        assert feats(False, True, True) != good  # forgot bottom-up flip
        assert feats(True, False, True) != good  # forgot BGR swap
        assert feats(True, True, False) != good  # forgot row padding

    def test_malformed_payloads_yield_null_rows(self, spark):
        import pandas as pd

        from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
            extract_bmp_features,
            synthesize_bmp,
        )

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "payload": [
                        synthesize_bmp(1),
                        b"not a bmp",
                        synthesize_bmp(3),
                    ],
                }
            )
        )
        rows = {
            r["doc_id"]: r
            for r in extract_bmp_features(df, "doc_id", "payload").collect()
        }
        assert rows[1]["width"] == 10 and rows[3]["width"] == 10
        assert rows[2]["width"] is None and rows[2]["mean_r"] is None


def test_tiff_roundtrip_and_traps(spark):
    """TIFF decode: generation-law round trip, plus each parsing
    trap proven load-bearing — strip ORDER (strip2_sum flips when
    the strip tables are swapped) and OFFSET indirection (pointing
    BitsPerSample at garbage must raise, not silently parse the
    slot as an inline value)."""
    import struct

    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_tiff_bytes,
        synthesize_tiff,
    )

    b = synthesize_tiff(9)
    w, h, r, g, bl, s2 = decode_tiff_bytes(b)
    assert (w, h) == (8, 6)
    exp = [
        sum((9 * 23 + 3 * j + c) % 256 for j in range(48)) / 48.0
        for c in range(3)
    ]
    assert [r, g, bl] == exp
    assert s2 == sum((9 * 23 + k) % 256 for k in range(96, 144))

    # trap 1: swapped strip tables change strip2_sum (means do not)
    bb = bytearray(b)
    soffs = 8 + 96 + 48 + 6
    o0, o1 = struct.unpack_from("<2I", b, soffs)
    c0, c1 = struct.unpack_from("<2I", b, soffs + 8)
    struct.pack_into("<2I", bb, soffs, o1, o0)
    struct.pack_into("<2I", bb, soffs + 8, c1, c0)
    w2, h2, r2, g2, b2, s2_swapped = decode_tiff_bytes(bytes(bb))
    assert (r2, g2, b2) == (r, g, bl)  # means are strip-order blind
    assert s2_swapped != s2  # the checksum is not

    # trap 2: offset indirection — BitsPerSample offset into garbage
    bb = bytearray(b)
    off_bits = 8 + 96 + 48
    # find the IFD entry for tag 258 and corrupt its offset slot
    ifd_off = struct.unpack_from("<I", b, 4)[0]
    n = struct.unpack_from("<H", b, ifd_off)[0]
    for i in range(n):
        tag = struct.unpack_from("<H", b, ifd_off + 2 + 12 * i)[0]
        if tag == 258:
            struct.pack_into(
                "<I", bb, ifd_off + 2 + 12 * i + 8, len(b) - 2
            )
    try:
        decode_tiff_bytes(bytes(bb))
        raise AssertionError("corrupt BitsPerSample offset must raise")
    except ValueError:
        pass


def test_tiff_extract_null_payload_rows(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_tiff_features,
        synthesize_tiff,
    )

    rows = [(1, synthesize_tiff(1)), (2, b"not a tiff"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_tiff_features(
        df, "doc_id", "payload").collect()}
    assert got[1].width == 8 and got[1].strip2_sum is not None
    assert got[2].width is None
    assert got[3].width is None


def test_tga_roundtrip_and_traps(spark):
    """TGA decode: generation-law round trip, plus each trap proven
    load-bearing — the bottom-up origin bit (top_row_sum changes
    when the descriptor claims top-down; means do not), the RLE
    count bias, and truncation."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_tga_bytes,
        synthesize_tga,
    )

    b = synthesize_tga(9)
    w, h, r, g, bl, trs = decode_tga_bytes(b)
    assert (w, h) == (8, 6)
    exp = [
        sum((9 * 13 + 3 * (j // 4) + c) % 256 for j in range(48)) / 48.0
        for c in range(3)
    ]
    assert [r, g, bl] == exp
    assert trs == sum(
        (9 * 13 + 3 * (j // 4) + c) % 256 for j in range(8) for c in range(3)
    )

    # trap 1: flipping the origin bit must change top_row_sum, not
    # the means — proving the decoder honors the descriptor
    bb = bytearray(b)
    bb[17] |= 0x20  # claim top-down
    w2, h2, r2, g2, b2, trs2 = decode_tga_bytes(bytes(bb))
    assert (r2, g2, b2) == (r, g, bl)
    assert trs2 != trs

    # trap 2: the stream mixes packet kinds — the raw packet (the
    # logical top row, stored LAST bottom-up) must decode literally.
    # If the decoder treated RAW headers as RLE, the raster would
    # overrun (8 pixels expected, 8x repetition of one) and raise.
    assert b[18 + (6 - 1) * 2 * 4] == 8 - 1  # raw header, count-1

    # trap 3: truncation raises, never a silent partial raster
    try:
        decode_tga_bytes(b[:-4])
        raise AssertionError("truncated TGA must raise")
    except ValueError:
        pass


def test_tga_extract_null_payload_rows(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_tga_features,
        synthesize_tga,
    )

    rows = [(1, synthesize_tga(1)), (2, b"nope"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_tga_features(
        df, "doc_id", "payload").collect()}
    assert got[1].width == 8 and got[1].top_row_sum is not None
    assert got[2].width is None
    assert got[3].width is None


def test_qoi_roundtrip_opcodes_and_traps(spark):
    """QOI decode: generation-law roundtrip over many seeds, ALL
    FIVE opcodes present in every payload, sequencing pinned by the
    position-weighted checksum, and truncation/end-marker traps."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        _qoi_pixel_law,
        decode_qoi_bytes,
        synthesize_qoi,
    )

    for seed in (0, 1, 9, 255, 4096):
        b = synthesize_qoi(seed)
        w, h, r, g, bl, ws = decode_qoi_bytes(b)
        exp = [_qoi_pixel_law(seed, p) for p in range(48)]
        assert (w, h) == (8, 6)
        assert r == sum(e[0] for e in exp) / 48
        assert g == sum(e[1] for e in exp) / 48
        assert bl == sum(e[2] for e in exp) / 48
        assert ws == sum((p + 1) * exp[p][0] for p in range(48))
        # opcode census: the law must exercise the full machine
        ops = set()
        pos = 14
        while pos < len(b) - 8:
            op = b[pos]
            if op == 0xFE:
                ops.add("RGB"); pos += 4
            elif op == 0xFF:
                ops.add("RGBA"); pos += 5
            elif op >> 6 == 0:
                ops.add("INDEX"); pos += 1
            elif op >> 6 == 1:
                ops.add("DIFF"); pos += 1
            elif op >> 6 == 2:
                ops.add("LUMA"); pos += 2
            else:
                ops.add("RUN"); pos += 1
        assert {"RGB", "INDEX", "DIFF", "LUMA", "RUN"} <= ops

    b = synthesize_qoi(9)
    # trap 1: truncating the stream raises
    try:
        decode_qoi_bytes(b[:20])
        raise AssertionError("truncated QOI must raise")
    except ValueError:
        pass
    # trap 2: corrupting the end marker raises
    bb = bytearray(b)
    bb[-1] = 0x02
    try:
        decode_qoi_bytes(bytes(bb))
        raise AssertionError("bad end marker must raise")
    except ValueError:
        pass
    # trap 3: inflating a RUN length must shift wsum_r (sequencing)
    # or overrun the raster — find a run byte and bump its count
    pos = 14
    while pos < len(b) - 8:
        op = b[pos]
        if op >> 6 == 3 and op not in (0xFE, 0xFF) and (op & 0x3F) < 61:
            bb = bytearray(b)
            bb[pos] = op + 1
            try:
                got = decode_qoi_bytes(bytes(bb))
                assert got[5] != decode_qoi_bytes(b)[5]
            except ValueError:
                pass  # overran the raster — also a correct failure
            break
        pos += 4 if op == 0xFE else 5 if op == 0xFF else \
            2 if op >> 6 == 2 else 1


def test_qoi_extract_null_payload_rows(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_qoi_features,
        synthesize_qoi,
    )

    rows = [(1, synthesize_qoi(1)), (2, b"qoif\x00junk"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_qoi_features(
        df, "doc_id", "payload").collect()}
    assert got[1].width == 8 and got[1].wsum_r is not None
    assert got[2].width is None
    assert got[3].width is None


def test_qoi_roundtrip_random_rasters():
    """Property test: encode->decode is the identity on ARBITRARY
    rasters, not just the q295 generation law — random pixels,
    constant rasters (max-length runs), gradient rasters (DIFF/LUMA
    regimes), and adversarial near-index-collision patterns."""
    import random

    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_qoi_bytes,
        encode_qoi,
    )

    rng = random.Random(42)

    def check(pixels, w, h):
        b = encode_qoi(pixels, w, h)
        gw, gh, mr, mg, mb, ws = decode_qoi_bytes(b)
        n = w * h
        assert (gw, gh) == (w, h)
        assert mr == sum(p[0] for p in pixels) / n
        assert mg == sum(p[1] for p in pixels) / n
        assert mb == sum(p[2] for p in pixels) / n
        assert ws == sum((i + 1) * p[0] for i, p in enumerate(pixels))

    for trial in range(60):
        w = rng.randint(1, 17)
        h = rng.randint(1, 13)
        kind = trial % 4
        if kind == 0:  # fully random
            px = [
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(w * h)
            ]
        elif kind == 1:  # constant (runs > 62 exercised when n > 62)
            c = (rng.randrange(256),) * 3
            px = [c] * (w * h)
        elif kind == 2:  # smooth gradient (DIFF/LUMA heavy)
            base = rng.randrange(256)
            px = [
                ((base + i) % 256, (base + i + 1) % 256, (base + i) % 256)
                for i in range(w * h)
            ]
        else:  # two alternating colors (INDEX heavy)
            a = (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            c = (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            px = [a if i % 2 == 0 else c for i in range(w * h)]
        check(px, w, h)


def test_pcx_roundtrip_and_traps(spark):
    """PCX decode: generation-law round trip, plus the traps proven
    load-bearing — plane separation (channel means differ by the
    +3/+6 law offsets; a plane swap is visible), the 0xC0 literal
    escape (the last-row law produces bytes >= 0xC0, so bare
    literals with run-header bits MUST be run-coded), and wsum_g
    sensitivity to scanline order."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        _pcx_pixel_law,
        decode_pcx_bytes,
        synthesize_pcx,
    )

    b = synthesize_pcx(9)
    w, h, r, g, bl, ws = decode_pcx_bytes(b)
    assert (w, h) == (8, 6)
    px = [_pcx_pixel_law(9, p) for p in range(48)]
    assert r == sum(p[0] for p in px) / 48.0
    assert g == sum(p[1] for p in px) / 48.0
    assert bl == sum(p[2] for p in px) / 48.0
    assert ws == sum((i + 1) * p[1] for i, p in enumerate(px))

    # the law must actually exercise the escape path: some byte in
    # some plane is >= 0xC0 on the literal row
    assert any(
        c >= 0xC0 for p in range(40, 48) for c in _pcx_pixel_law(9, p)
    )
    # and the encoder never leaks a bare literal with run-header
    # bits: every byte >= 0xC0 in the body is a run header whose
    # count is 1..63 (decode would otherwise misparse — the round
    # trip above already proves it, this pins the intent)
    body = b[128:]
    i = 0
    seen_run = seen_literal = False
    while i < len(body):
        v = body[i]
        if (v & 0xC0) == 0xC0:
            seen_run = True
            i += 2
        else:
            seen_literal = True
            i += 1
    assert seen_run and seen_literal

    # truncation raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_pcx_bytes(b[:-3])
    with _pytest.raises(ValueError):
        decode_pcx_bytes(b"\x00" + b[1:])


def test_pcx_extract_null_payload_rows(spark):
    """Undecodable PCX payloads produce NULL feature rows, never a
    crashed batch (same contract as the other nine codecs)."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_pcx_features,
        synthesize_pcx,
    )

    df = spark.createDataFrame(
        [(1, bytearray(synthesize_pcx(1))), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in extract_pcx_features(
        df, "doc_id", "payload"
    ).collect()}
    assert rows[1].width == 8 and rows[1].wsum_g is not None
    assert rows[2].width is None and rows[2].wsum_g is None


def test_au_ulaw_roundtrip_and_traps(spark):
    """AU/mu-law codec #11: generation-law roundtrip, an independent
    table-based expansion, big-endian header traps, and truncation."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_au_bytes,
        synthesize_au_ulaw,
        ulaw_expand,
    )

    b = synthesize_au_ulaw(7)
    rate, n, s, ss, peak = decode_au_bytes(b)
    assert (rate, n) == (8000, 256)

    # independent scalar expansion (no numpy, straight from G.711)
    def expand_one(e):
        u = (~e) & 0xFF
        mag = (((u & 0x0F) * 8 + 0x84) << ((u >> 4) & 0x07)) - 0x84
        return -mag if u & 0x80 else mag

    lin = [expand_one((7 * 17 + j) % 256) for j in range(256)]
    assert s == sum(lin)
    assert ss == sum(v * v for v in lin)
    assert peak == max(abs(v) for v in lin)

    # the vectorized expansion agrees with the scalar law on every
    # possible byte
    import numpy as np

    all_bytes = np.arange(256, dtype=np.uint8)
    assert ulaw_expand(all_bytes).tolist() == [
        expand_one(i) for i in range(256)
    ]
    # extremes of the segment law
    assert expand_one(0xFF) == 0 and expand_one(0x7F) == 0
    assert expand_one(0x00) == -32124 and expand_one(0x80) == 32124

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_au_bytes(b"RIFF" + b[4:])  # wrong magic
    with _pytest.raises(ValueError):
        decode_au_bytes(b[:-5])  # truncated payload
    # non-mu-law encoding id rejected
    bad = bytearray(b)
    bad[15] = 2  # encoding field (big-endian u32 at offset 12)
    with _pytest.raises(ValueError):
        decode_au_bytes(bytes(bad))


def test_au_extract_null_payload_rows(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_ulaw_features,
        synthesize_au_ulaw,
    )

    df = spark.createDataFrame(
        [(1, bytearray(synthesize_au_ulaw(1))), (2, bytearray(b"x"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in extract_ulaw_features(
        df, "doc_id", "payload"
    ).collect()}
    assert rows[1].sample_rate == 8000 and rows[1].sumsq_linear > 0
    assert rows[2].sample_rate is None and rows[2].sumsq_linear is None


def test_ico_roundtrip_and_traps(spark):
    """ICO codec #12: generation-law roundtrip plus proof that every
    container trap (offset, doubled height, bottom-up rows, mask bit
    order, 32-bit mask padding) is load-bearing."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_ico_bytes,
        synthesize_ico,
    )

    b = synthesize_ico(3)
    w, h, no, nt, sr, sg, sb = decode_ico_bytes(b)
    assert (w, h, no, nt) == (8, 4, 27, 5)
    exp_r = sum(
        (3 * 5 + 4 * k + 2) % 256 for k in range(32) if k % 7 != 0
    )
    exp_g = sum(
        (3 * 5 + 4 * k + 1) % 256 for k in range(32) if k % 7 != 0
    )
    exp_b = sum((3 * 5 + 4 * k) % 256 for k in range(32) if k % 7 != 0)
    assert (sr, sg, sb) == (exp_r, exp_g, exp_b)

    # mask parsing is load-bearing: flip one mask bit → counts move
    import struct

    off = 22 + 40 + 32 * 4  # header + DIB + XOR
    flipped = bytearray(b)
    flipped[off] ^= 0x40  # second pixel of the BOTTOM row
    w2, h2, no2, nt2, *_ = decode_ico_bytes(bytes(flipped))
    assert nt2 == nt + 1 and no2 == no - 1

    # doubled-height quirk is load-bearing: writing the real height
    # breaks the directory/DIB consistency check
    bad = bytearray(b)
    bad[22 + 8 : 22 + 12] = struct.pack("<i", 4)  # biHeight = h, not 2h
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ico_bytes(bytes(bad))

    with _pytest.raises(ValueError):
        decode_ico_bytes(b[:30])
    with _pytest.raises(ValueError):
        decode_ico_bytes(b"\x01" + b[1:])


def test_ico_extract_null_payload_rows(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_ico_features,
        synthesize_ico,
    )

    df = spark.createDataFrame(
        [(1, bytearray(synthesize_ico(1))), (2, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in extract_ico_features(
        df, "doc_id", "payload"
    ).collect()}
    assert rows[1].n_opaque == 27 and rows[1].sum_r is not None
    assert rows[2].n_opaque is None and rows[2].sum_r is None


def test_gif_animation_roundtrip_and_traps(spark):
    """Animated GIF sampler: frame count, stride selection, per-
    frame generation-law means, and container traps."""
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        decode_gif_frames,
        synthesize_gif_animated,
    )

    b = synthesize_gif_animated(5)
    w, h, nf, frames = decode_gif_frames(b, 2)
    assert (w, h, nf) == (16, 8, 6)
    assert [f[0] for f in frames] == [0, 2, 4]
    for fi, mr, mg, mb in frames:
        idxs = [(5 + j * j + 7 * fi) % 16 for j in range(128)]
        assert mr == sum((5 + 17 * i) % 256 for i in idxs) / 128.0
        assert mg == sum((2 * 5 + 29 * i) % 256 for i in idxs) / 128.0
        assert mb == sum((3 * 5 + 41 * i) % 256 for i in idxs) / 128.0
    # stride 1 decodes every frame; stride 6 only the first
    assert len(decode_gif_frames(b, 1)[3]) == 6
    assert len(decode_gif_frames(b, 6)[3]) == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_gif_frames(b"JIF89a" + b[6:], 2)
    with _pytest.raises((ValueError, IndexError)):
        decode_gif_frames(b[:40], 2)
    # static single-frame GIF87a parses as a 1-frame animation
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        synthesize_gif,
    )

    w1, h1, nf1, fr1 = decode_gif_frames(synthesize_gif(3), 2)
    assert nf1 == 1 and fr1[0][0] == 0


def test_gif_frame_sample_null_payload_rows(spark):
    from car_insurance_data_pipeline_spark_spark.operators.multimodal import (
        extract_gif_frame_samples,
        synthesize_gif_animated,
    )

    df = spark.createDataFrame(
        [(1, bytearray(synthesize_gif_animated(1))), (2, bytearray(b"x"))],
        "doc_id long, payload binary",
    )
    rows = extract_gif_frame_samples(df, "doc_id", "payload", 2).collect()
    good = [r for r in rows if r.doc_id == 1]
    bad = [r for r in rows if r.doc_id == 2]
    assert len(good) == 3 and all(r.n_frames == 6 for r in good)
    assert len(bad) == 1 and bad[0].frame_idx is None
