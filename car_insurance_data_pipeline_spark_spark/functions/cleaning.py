"""Dirty-data cleaning functions (SURVEY.md §2.8 F1-F5, F19-F22).

All are compositions of built-in Column expressions — no UDFs — so
every one stays inside Catalyst/whole-stage codegen and vectorized
Parquet scans. Casts use try_cast so semantics (unparseable → NULL)
are identical under ANSI mode (Spark 4 default) and legacy mode.

Reference parity notes (citations into /root/reference):
- currency strip: scripts/02_clean_contracts_data.py:54 strips only
  "€"; the raw data also has "$1568.11" rows, which the reference
  silently turns into 0.0. ``currency_to_double(compat_euro_only=True)``
  reproduces that; the default strips [€$£,] and keeps the value.
- multi-format dates: scripts/02_clean_contracts_data.py:60-65 and
  scripts/03_clean_multisource_data.py:171-173 dispatch on LIKE
  patterns; stray formats fall through to NULL.
- name split: scripts/02_clean_contracts_data.py:50-51
  (substring_index on space, tokens 1 and -1).
- null/negative coercion: scripts/02_clean_contracts_data.py:86-89.
- packed GPS triple: scripts/03_clean_multisource_data.py:230,240-244.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def currency_to_double(col: Column | str, compat_euro_only: bool = False) -> Column:
    """Strip currency symbols/separators and cast to double.

    Handles suffix "1974.98€", prefix "€620.93", "$1568.11" and
    thousands separators. With ``compat_euro_only`` only "€" is
    stripped (reference behavior: "$..." -> NULL after cast).
    """
    pattern = "[€]" if compat_euro_only else "[€$£,\\s]"
    return F.regexp_replace(F.trim(_c(col)), pattern, "").try_cast("double")


def strip_unit_to_int(col: Column | str, unit_pattern: str = "\\s*HP\\s*$") -> Column:
    """'128 HP' → 128 (scripts/03_clean_multisource_data.py:90)."""
    return F.regexp_replace(_c(col), unit_pattern, "").try_cast("double").try_cast("int")


def parse_date_multi(col: Column | str, compat_reference: bool = False) -> Column:
    """Parse mixed-format date strings by LIKE-dispatch.

    Formats seen in the data: ``yyyy-MM-dd``, ``MM/dd/yyyy``,
    ``dd-MM-yyyy``. The reference handles only a subset per column
    (02:60-65 handles ISO + MM/dd/yyyy; 03:171-173 handles ISO +
    dd-MM-yyyy, so "08/03/2025" claims rows parse to NULL). With
    ``compat_reference=True`` the slash format is dropped, matching
    scripts/03_clean_multisource_data.py:171-173.
    """
    c = F.trim(_c(col))
    iso = F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).try_cast("date")
    slash = F.try_to_timestamp(c, F.lit("MM/dd/yyyy")).try_cast("date")
    dash = F.try_to_timestamp(c, F.lit("dd-MM-yyyy")).try_cast("date")
    out = (
        F.when(c.like("____-__-__"), iso)
        .when(c.like("__-__-____"), dash)
    )
    if not compat_reference:
        out = out.when(c.like("__/__/____"), slash)
    return out.otherwise(F.lit(None).cast("date"))


def name_first(col: Column | str) -> Column:
    """First whitespace token (02:50)."""
    return F.substring_index(F.trim(_c(col)), " ", 1)


def name_last(col: Column | str) -> Column:
    """Last whitespace token (02:51)."""
    return F.substring_index(F.trim(_c(col)), " ", -1)


def null_or_negative_to(col: Column | str, default: float = 0.0) -> Column:
    """NULL or negative → default (02:86-89)."""
    c = _c(col)
    return F.when(c.isNull() | (c < 0), F.lit(default)).otherwise(c)


def split_packed_gps(col: Column | str) -> tuple[Column, Column, Column]:
    """'lat,lon,alt' packed string → (lat, lon, alt) doubles
    (scripts/03_clean_multisource_data.py:230,240-244).
    """
    parts = F.split(_c(col), ",")
    return (
        parts.getItem(0).try_cast("double"),
        parts.getItem(1).try_cast("double"),
        parts.getItem(2).try_cast("double"),
    )


def normalize_category(col: Column | str, mapping: dict[str, str]) -> Column:
    """Map raw category spellings onto canonical values, else pass
    through (e.g. gender {F, Female}→F, {M, Male}→M; the raw domain is
    un-normalized per FIXTURES.md B1).
    """
    c = _c(col)
    out = None
    for raw, canon in mapping.items():
        cond = c == F.lit(raw)
        out = F.when(cond, F.lit(canon)) if out is None else out.when(cond, F.lit(canon))
    return out.otherwise(c) if out is not None else c


def parse_xml_column(
    col: Column | str, schema: str, options: dict[str, str] | None = None
) -> Column:
    """In-column XML parse (Spark 4 built-in ``from_xml`` — JVM-side
    codegen, no UDF): an XML-payload STRING column → typed STRUCT,
    the XML twin of the q22 JSON-props path. Always pass an explicit
    DDL ``schema`` (e.g. ``"amount bigint, vehicle struct<make:
    string, year:int>"``); schema inference per-row is a scan-time
    cost and non-deterministic across samples. Malformed payloads
    yield a NULL struct (PERMISSIVE), matching the engine's
    clean-later contract."""
    return F.from_xml(_c(col), schema, options or {})
