"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's multimodal data model (north star): media are opaque
``binary`` columns with a struct of typed metadata alongside
(modality, byte length, format sniffed from magic bytes). Decode /
feature-extract run as Arrow-batched Pandas UDFs over mapInPandas —
the image/audio libraries are NOT in this container, so the decode
kernel is a deterministic STUB (clearly marked) while the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff",  # wav/avi containers
    b"GIF8": "gif",
    b"%PDF": "pdf",
}


def with_media_metadata(
    df: DataFrame, payload_col: str, modality: str = "unknown"
) -> DataFrame:
    """Attach a typed metadata struct next to a binary payload column
    (JVM-side: length + magic-byte format sniff via Column exprs)."""
    p = F.col(payload_col)
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        hexlit = magic.hex()
        fmt = F.when(
            F.hex(F.substring(p, 1, len(magic))) == F.lit(hexlit.upper()),
            F.lit(name),
        ).otherwise(fmt)
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.octet_length(p).alias("n_bytes"),
        fmt.alias("format"),
    )
    return df.withColumn("media_meta", meta)


def decode_media_batch(pdf: pd.DataFrame, payload_col: str) -> pd.DataFrame:
    """STUB decode kernel — deterministic fake features.

    In production this calls the real decoder (PIL/librosa/pyav);
    those libraries are not in this container, so the stub derives
    reproducible pseudo-features from the bytes themselves: byte
    length, first/last byte, and a simple byte-sum "checksum
    feature". The UDF signature, Arrow batch shape, and output schema
    are exactly what a real decoder would use.
    """
    # NULL payloads arrive as None — treat as empty media, don't crash
    payloads = pdf[payload_col].map(lambda b: b if b is not None else b"")
    return pd.DataFrame(
        {
            "n_bytes": payloads.map(len),
            "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
            "byte_checksum": payloads.map(lambda b: sum(b[:1024]) % 65536),
        }
    )


def extract_features(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Output: <id_col>, n_bytes int, first_byte int, byte_checksum int.
    Scale: Arrow batches stream through Python per partition — no
    per-row pickling; repartition upstream to bound batch memory for
    large media.
    """
    schema = f"{id_col} long, n_bytes int, first_byte int, byte_checksum int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_media_batch(pdf, payload_col)
            feats.insert(0, id_col, pdf[id_col].to_numpy())
            yield feats

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample_plan(
    df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 4096
) -> DataFrame:
    """'Frame sampling' plumbing demo: derive per-sample offsets from
    payload size (as a video frame sampler would derive timestamps),
    explode to one row per sample. Real decoders slot into
    decode_media_batch; the partitioning/explode shape is the point.
    """
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return df.select(
        F.col(id_col), F.explode(offsets).alias("sample_offset")
    )
