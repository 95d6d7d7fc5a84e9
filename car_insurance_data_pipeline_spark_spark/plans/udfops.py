"""Python-boundary showcase queries: the grouped-agg pandas UDAF and
the UDTF — completing the §2.10 surface (scalar pandas UDFs,
mapInPandas, applyInPandas, and applyInPandasWithState already run
the vector kernels, multimodal plumbing, and stateful streaming).

Policy reminder: Python is the SLOW path. These two queries exist so
a user migrating UDAF/UDTF workloads has a tested pattern — each
docstring names the JVM-side formulation to prefer when the logic is
expressible (q104's chunking, for instance, IS q78 JVM-side). Core
catalog queries stay Column-only (plan-asserted in
tests/test_scale_plans.py).

Cross-engine determinism: the MAD values are medians of integer (or
half-integer) deviations — small dyadic rationals, exactly
representable as doubles, and pandas' and DuckDB's even-count median
(mean of the two middle values) agree bit-for-bit on them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table


_MAD_UDF = None


def _mad_udaf():
    """Median absolute deviation — a grouped-agg pandas UDAF (Series
    → scalar): Arrow ships each group's column once, the robust
    statistic runs vectorized in pandas. MAD needs two ordered passes
    over the group (median, then median of deviations), which plain
    SQL aggregates can't express in one; this is the legitimate UDAF
    use case, unlike sums/means that belong JVM-side.

    Created lazily (and cached): the pandas_udf decorator parses its
    DDL return type through the ACTIVE session, so a module-level
    decoration would crash any import that happens before a
    SparkSession exists (e.g. pytest collection).
    """
    global _MAD_UDF
    if _MAD_UDF is None:

        @pandas_udf("double")
        def _mad(v: pd.Series) -> float:
            med = v.median()
            return float((v - med).abs().median())

        _MAD_UDF = _mad
    return _MAD_UDF


@query(
    "q103_mad_by_lang",
    oracle="""
WITH m AS (
  SELECT lang, median(n_chars) AS med FROM documents GROUP BY lang
)
SELECT d.lang,
  CAST(m.med AS DOUBLE) AS med_chars,
  CAST(median(abs(d.n_chars - m.med)) AS DOUBLE) AS mad_chars,
  COUNT(*) AS n_docs
FROM documents d JOIN m USING (lang)
GROUP BY d.lang, m.med
""",
)
def q103_mad_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language document-length profile: exact median via
    the JVM percentile aggregate, MAD via the grouped-agg pandas
    UDAF. Columns: lang, med_chars, mad_chars, n_docs.

    Scale: Spark disallows mixing a group-agg pandas UDF with JVM
    aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    JVM stats and the UDAF are two aggs joined on lang — both
    shuffle on the same key and the frames are group-cardinality
    sized. The UDAF's cost is Arrow transfer of one bigint column
    per group plus two pandas sorts — fine for per-group robust
    stats, but never put a UDAF where a built-in aggregate
    (sum/avg/percentile_approx) expresses the semantics.
    """
    d = table(spark, sf_dir, "documents")
    jvm = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med_chars"),
        F.count("*").alias("n_docs"),
    )
    udaf = d.groupBy("lang").agg(
        _mad_udaf()(F.col("n_chars")).alias("mad_chars")
    )
    return jvm.join(udaf, "lang").select(
        "lang", "med_chars", "mad_chars", "n_docs"
    )


class _ChunkSplitter:
    """UDTF (table function): one input row → N chunk rows. The
    Python generator form is the API-surface showcase; the SAME
    semantics JVM-side is q78's sequence+explode (prefer that at
    scale — this exists for workloads whose row-expansion logic
    genuinely needs Python). Wrapped with @udtf lazily in
    ``_chunk_udtf`` for the same import-before-session reason as
    ``_mad_udaf``."""

    # the catalog's whitespace convention is ASCII \s (Java and RE2
    # agree); Python str.split()/strip() are Unicode-aware, so split
    # explicitly on the ASCII class to match the oracle byte-for-byte
    _WS = " \t\n\r\f\v"

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            # oracle: len(split(NULL)) is NULL -> zero rows
            return
        import re

        stripped = text.strip(self._WS).lower()
        toks = re.split(r"[ \t\n\r\f\v]+", stripped) if stripped else []
        if not toks:
            # mirror split('') -> [''] : one empty chunk
            yield 0, ""
            return
        for i in range(0, len(toks), n):
            yield i // n, " ".join(toks[i : i + n])


_CHUNK_UDTF = None


def _chunk_udtf():
    global _CHUNK_UDTF
    if _CHUNK_UDTF is None:
        _CHUNK_UDTF = udtf(_ChunkSplitter, returnType="chunk_idx int, chunk string")
    return _CHUNK_UDTF


@query(
    "q104_udtf_chunks",
    oracle="""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
  array_to_string(list_slice(a, i*25+1, i*25+25), ' ') AS chunk
FROM arr, unnest(range(0, CAST(ceil(len(a)/25.0) AS BIGINT))) AS r(i)
""",
)
def q104_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking through the UDTF surface (25-token chunks,
    lateral join), value-checked against the same chunking stated in
    SQL. Columns: doc_id, chunk_idx, chunk. q78 is the JVM-side
    scale path for identical semantics; this query exists to keep
    the UDTF pattern tested."""
    spark.udtf.register("chunk_splitter", _chunk_udtf())
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__udtf_docs")
    try:
        # returned lazily: analysis resolves the view at creation, so
        # dropping the temp view below does not invalidate the frame
        # (unlike the streaming memory sink, whose DATA lives in the
        # view — there a checkpoint before the drop is mandatory)
        return spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.chunk "
            "FROM __udtf_docs d, LATERAL chunk_splitter(d.text, 25) c"
        )
    finally:
        spark.catalog.dropTempView("__udtf_docs")
