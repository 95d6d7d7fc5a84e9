"""Deterministic hash-based sampling primitives.

All sampling in the engine is md5-membership based, never rand():
the same row makes the same keep/drop decision on every run, engine,
and partitioning — which is what makes sample membership
oracle-checkable and pipelines resumable. These helpers are the ONE
canonical form of the md5-prefix recipes; the DuckDB mirror of each
is noted inline and must stay byte-compatible (q75/q77 additionally
use the raw hex-prefix threshold-compare form directly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_bucket(col: Column | str, hex_digits: int = 4, mod: int = 10) -> Column:
    """Deterministic int bucket in [0, mod): the first ``hex_digits``
    md5 hex digits of the stringified key, as an integer, mod ``mod``.
    DuckDB mirror:
    ``CAST(CAST('0x' || substring(md5(CAST(x AS VARCHAR)), 1, n) AS INT)
    % mod AS INT)``. hex_digits <= 7 keeps the value inside int32 in
    both engines.
    """
    return F.pmod(
        F.conv(
            F.substring(F.md5(_c(col).cast("string")), 1, hex_digits), 16, 10
        ).cast("int"),
        F.lit(mod),
    ).cast("int")


def md5_uniform(col: Column | str, hex_digits: int = 6) -> Column:
    """Deterministic uniform double in [0, 1): the first
    ``hex_digits`` md5 hex digits over 16^hex_digits. The standard
    keep-if-u<p coin for sampling with oracle-checkable membership.
    DuckDB mirror:
    ``CAST('0x' || substring(md5(CAST(x AS VARCHAR)), 1, n) AS INT)
    / CAST(16**n AS DOUBLE)`` (exact integer operands → identical
    IEEE division in both engines).
    """
    return F.conv(
        F.substring(F.md5(_c(col).cast("string")), 1, hex_digits), 16, 10
    ).cast("int") / F.lit(float(16**hex_digits))
