"""Semi-structured function surface (round 4): JSON parsing /
extraction and map-typed aggregation. The reference has no JSON or
map functions anywhere (SURVEY.md §2.8 notes the gap); these are
north-star extensions pinning Spark's semi-structured surface
(from_json / get_json_object / map_from_entries / map_filter /
explode(map)) under the cross-engine oracle.

Cross-engine determinism notes specific to this module:

- Both engines PARSE THE SAME JSON TEXT: the documents are built by
  deterministic string concatenation (identical byte-for-byte in
  Spark and DuckDB) before parsing, so the queries compare JSON
  *readers*, not JSON *writers* (serializer key order / whitespace
  / float formatting would otherwise diverge).
- JSON payloads carry only BIGINT and VARCHAR fields — double→text
  formatting is engine-specific and never enters the JSON path.
- The map rollup pre-aggregates (source, lang) counts BEFORE
  collecting per-source maps, so map size is bounded by language
  cardinality (not corpus size) and the collected entries are
  sort_array-ordered (deterministic map construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table


@query(
    "q130_json_extract",
    oracle="""
WITH j AS (
  SELECT '{"k":' || CAST(o_orderkey AS VARCHAR)
      || ',"st":"' || o_orderstatus
      || '","pr":"' || o_orderpriority || '"}' AS js
  FROM orders
)
SELECT json_extract_string(js, '$.st') AS st,
  json_extract_string(js, '$.pr') AS pr,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(json_extract(js, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM j
GROUP BY 1, 2
""",
)
def q130_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ingestion surface: each order is serialized to a JSON
    document by deterministic string concat (identical text in both
    engines), then parsed back — ``from_json`` with an explicit
    schema for the typed fields, ``get_json_object`` for the ad-hoc
    path extraction — and aggregated on the EXTRACTED values. This
    is the schema-on-read pattern for JSON event feeds: parse with a
    declared schema (one pass, no inference), aggregate JVM-side.

    Scale: from_json is a narrow codegen'd map at the scan (no
    Python, no shuffle); the only exchange is the partial-aggregated
    (st, pr) rollup. Malformed documents yield NULL structs rather
    than task failures (PERMISSIVE mode default).
    """
    o = table(spark, sf_dir, "orders")
    js = F.concat(
        F.lit('{"k":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"st":"'),
        F.col("o_orderstatus"),
        F.lit('","pr":"'),
        F.col("o_orderpriority"),
        F.lit('"}'),
    )
    parsed = o.select(
        F.from_json(js, "k BIGINT, st STRING").alias("doc"),
        F.get_json_object(js, "$.pr").alias("pr"),
    )
    return (
        parsed.groupBy(F.col("doc.st").alias("st"), "pr")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("doc.k").cast("bigint").alias("sum_k"),
        )
    )


@query(
    "q131_map_rollup",
    oracle="""
SELECT source, lang, n_docs FROM (
  SELECT source, lang, COUNT(*) AS n_docs
  FROM documents
  GROUP BY source, lang
) WHERE n_docs >= 2
""",
)
def q131_map_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed aggregation state: per-source language histograms
    are carried as a ``map<string,bigint>`` column —
    ``map_from_entries`` over sort_array'd (lang, count) structs —
    filtered with ``map_filter`` (keep languages with >= 2 docs),
    then re-flattened with ``explode``. The map detour is the point:
    it pins Spark's map construction / lambda-filter / explode
    surface against an oracle computing the same relation directly,
    so the semi-structured path is proven equivalent to the
    relational one.

    Scale: counts pre-aggregate per (source, lang) BEFORE the
    per-source collect, so each map holds at most n_langs entries —
    map size is bounded by language cardinality, never corpus size.
    Two partial-aggregated exchanges, no window, no Python.
    """
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    maps = counts.groupBy("source").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("lang", "n")))
        ).alias("lang_counts")
    )
    filtered = maps.select(
        "source",
        F.map_filter(
            F.col("lang_counts"), lambda _, v: v >= F.lit(2)
        ).alias("lang_counts"),
    )
    return filtered.select(
        "source", F.explode("lang_counts").alias("lang", "n_docs")
    )


@query(
    "q150_variant",
    oracle="""
WITH j AS (
  SELECT '{"e":{"t":"' || event_type || '","vc":'
      || CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
      || '},"id":' || CAST(event_id AS VARCHAR) || '}' AS js
  FROM events
)
SELECT json_extract_string(js, '$.e.t') AS etype,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(json_extract(js, '$.e.vc') AS BIGINT)) AS BIGINT)
    AS sum_vc,
  CAST(MAX(CAST(json_extract(js, '$.id') AS BIGINT)) AS BIGINT)
    AS max_id
FROM j
GROUP BY 1
""",
)
def q150_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: the semi-structured type built for
    schema-less JSON at scale (binary-encoded, typed-path access
    without a declared struct schema — the engine-native answer to
    "shred JSON once, query many paths"). Each event is serialized
    to a nested JSON document (identical text both engines), parsed
    with ``parse_json`` into a VARIANT column, and read back with
    typed ``variant_get`` paths ($.e.t string, $.e.vc long,
    $.id long), then aggregated on the extracted values. q130 covers
    the declared-schema ``from_json`` pattern; this is its
    schema-LESS dual on the round-5 engine surface, mirrored by
    DuckDB's JSON path functions.

    Determinism: all extracted values are strings/ints (the value
    field is pre-quantized to cents BEFORE serialization, so no
    float-to-text round trip exists anywhere). Scale: parse_json and
    variant_get are narrow codegen'd maps; the only exchange is the
    partial-aggregated per-type rollup.
    """
    ev = table(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"e":{"t":"'),
        F.col("event_type"),
        F.lit('","vc":'),
        F.round(F.col("value") * 100).cast("bigint").cast("string"),
        F.lit('},"id":'),
        F.col("event_id").cast("string"),
        F.lit("}"),
    )
    v = ev.select(F.parse_json(js).alias("doc"))
    return (
        v.select(
            F.variant_get("doc", "$.e.t", "string").alias("etype"),
            F.variant_get("doc", "$.e.vc", "bigint").alias("vc"),
            F.variant_get("doc", "$.id", "bigint").alias("id"),
        )
        .groupBy("etype")
        .agg(
            F.count("*").alias("n"),
            F.sum("vc").alias("sum_vc"),
            F.max("id").alias("max_id"),
        )
    )
