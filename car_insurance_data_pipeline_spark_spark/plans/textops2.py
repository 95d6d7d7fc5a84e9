"""Corpus statistics and time-series catalog queries: TF-IDF,
n-gram counts, gap-filled resampling. All oracle-checked; the usual
determinism rules plus rounded logarithms (ln ulps differ across
libm implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.functions.text import tokens
from car_insurance_data_pipeline_spark_spark.plans.catalog import query, table
from car_insurance_data_pipeline_spark_spark.plans.relational import events_with_us


@query(
    "q61_tfidf_top_terms",
    oracle="""
WITH tok AS (
  -- the '' guard mirrors tokens(): an empty document has ZERO terms
  -- (unguarded regexp_split would emit one '' phantom term); NULL
  -- text unnests to no rows in both engines
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) != ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
    ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, CAST(rn AS INT) AS rn FROM (
  SELECT doc_id, term, tfidf,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
""",
)
def q61_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document — the classic text-
    weighting operator, composed from two aggregations and a window.

    Scale: tf shuffles on (doc, term); df is a second agg on term
    with the (tiny) result broadcast back; ln rounded to 6 decimals
    so libm ulp differences can't flip ranks (term tie-break).
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # driver-side scalar; O(1) to embed in the plan
    scored = tf.join(F.broadcast(dfreq), ["term"]).select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


@query(
    "q62_bigram_counts",
    oracle="""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
), bg AS (
  SELECT a[i] || ' ' || a[i+1] AS bigram
  FROM arr, unnest(range(1, len(a))) AS r(i)
)
SELECT bigram, COUNT(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 50
""",
)
def q62_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics: top-50 bigrams. One explode +
    one agg; at 100 TB the long tail is partial-aggregated map-side
    before the shuffle, and the limit is TakeOrdered."""
    from car_insurance_data_pipeline_spark_spark.functions.text import word_shingles

    d = table(spark, sf_dir, "documents")
    bg = d.select(F.explode(word_shingles(F.col("text"), 2)).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@query(
    "q63_gapfill_minutes",
    oracle="""
WITH bounds AS (
  SELECT user_id,
    date_trunc('minute', min(ts)) AS mn,
    date_trunc('minute', max(ts)) AS mx
  FROM events WHERE user_id < 10 GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute
  FROM bounds
), actual AS (
  SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS n
  FROM events WHERE user_id < 10 GROUP BY 1, 2
)
SELECT g.user_id, strftime(g.minute, '%Y-%m-%d %H:%M') AS minute,
  COALESCE(a.n, 0) AS n_events
FROM grid g LEFT JOIN actual a
  ON g.user_id = a.user_id AND g.minute = a.minute
""",
)
def q63_gapfill_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-filling (hypertable-style resample): per-user
    minute grid from sequence(), left-joined against actual counts,
    missing minutes zero-filled.

    Scale: the grid generates per user from its own [min, max] span
    (sequence+explode — no driver loop), so grid size tracks actual
    activity spans; both sides shuffle once on (user, minute).
    """
    e = events_with_us(spark, sf_dir).filter(F.col("user_id") < 10)
    ts = F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz")
    minute = F.date_trunc("minute", ts)
    bounds = e.groupBy("user_id").agg(
        F.min(minute).alias("mn"), F.max(minute).alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 minute"))
        ).alias("minute"),
    )
    actual = e.groupBy("user_id", minute.alias("minute")).agg(
        F.count("*").alias("n")
    )
    return (
        grid.join(actual, ["user_id", "minute"], "left")
        .select(
            "user_id",
            F.date_format("minute", "yyyy-MM-dd HH:mm").alias("minute"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@query(
    "q73_dedup_clusters",
    oracle="""
WITH RECURSIVE arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS s
  FROM arr, unnest(range(1, len(a) - 1)) AS r(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), ok AS (
  -- mirrors the Spark side's max_postings=1000 df-cut: shingles
  -- shared by more docs are excluded from candidate generation
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
), inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  JOIN ok ON ok.s = x.s
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.1
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) AS nodes(u)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
)
SELECT d.doc_id,
  COALESCE(c.component, d.doc_id) AS component,
  CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
       THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM documents d LEFT JOIN comp c USING (doc_id)
""",
)
def q73_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup CLUSTERS: jaccard_pairs (k=3, j>=0.1)
    edges fed through distributed connected components (alternating
    large/small-star, operators/graph.py), then every document
    labeled with its cluster's min doc_id and an is_canonical
    keep-one flag — the survivor-selection step of a corpus dedup
    pipeline.

    Scale: the pair miner never cross-joins (inverted index), and
    the component step is O(log n) rounds of grouped aggregations
    over the EDGE list only — no driver-side graph. The oracle walks
    the same edges with a recursive-CTE transitive closure (fine at
    oracle scale; the closure is exactly what the star algorithm
    avoids materializing at 100 TB).
    """
    from car_insurance_data_pipeline_spark_spark.operators.dedup import (
        jaccard_pairs,
    )

    d = table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        d, "doc_id", "text", k=3, threshold=0.1, max_postings=1000
    )
    return _label_clusters(d, pairs)


def _label_clusters(d: DataFrame, pairs: DataFrame) -> DataFrame:
    """Edge pairs → per-document (doc_id, component, is_canonical)
    via distributed connected components; singletons (docs in no
    pair) label themselves."""
    from car_insurance_data_pipeline_spark_spark.operators.graph import (
        connected_components,
    )

    comp = connected_components(pairs, "doc_a", "doc_b")
    out = (
        d.select("doc_id")
        .join(comp, d["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    return out.withColumn(
        "is_canonical",
        (F.col("doc_id") == F.col("component")).cast("int"),
    )


@query(
    "q74_winnow_fingerprints",
    oracle="""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
), g AS (
  SELECT doc_id, i,
    substring(md5(a[i] || ' ' || a[i+1] || ' ' || a[i+2]), 1, 8) AS h
  FROM arr, unnest(range(1, len(a) - 1)) AS r(i)
), win AS (
  SELECT doc_id,
    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM g
)
SELECT DISTINCT doc_id, fp FROM win
""",
)
def q74_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS-style): hash every
    3-word shingle, slide a 4-hash window per document, keep each
    window's MIN hash, emit the distinct (doc_id, fingerprint) set.
    Winnowing guarantees any shared run of >= window+k-1 words
    yields a shared fingerprint, at ~2/(window+1) the density of
    full shingle sets.

    Hashes are substring(md5(shingle), 1, 8) — md5 is identical in
    Spark and DuckDB, so the fingerprints themselves (not just
    counts) are oracle-checked. Scale: one shuffle on doc_id (the
    position window); everything else is codegen'd projection; the
    sliding-window min is 3 leads over the SAME window spec, so it
    reuses the shingle builder's exchange — no second shuffle.

    Duplicate-id safety: each lead is masked by a same-source-row
    check (lead(__r) == __r), so a window never mixes hashes across
    independent source rows sharing a doc_id — every row winnows on
    its own (with the oracle's shrinking tail frames at row end),
    matching positioned_shingles' per-row contract instead of
    silently depending on doc_id uniqueness.
    """
    return _winnow_fingerprints(table(spark, sf_dir, "documents"))


def _winnow_fingerprints(d: DataFrame) -> DataFrame:
    """Winnowing core over a (doc_id, text) frame — see
    q74_winnow_fingerprints for semantics and the scale notes."""
    from car_insurance_data_pipeline_spark_spark.operators.dedup import (
        positioned_shingles,
    )

    # the shared audited shingle builder: duplicate-id-safe, one
    # shuffle on doc_id, codegen'd gram strings
    hashed = positioned_shingles(d, "doc_id", "text", 3).select(
        "doc_id", "__r", "__i", F.substring(F.md5("s"), 1, 8).alias("h")
    )
    w = Window.partitionBy("doc_id").orderBy("__r", "__i")

    def _same_row_lead(j: int):
        # least() skips nulls, so an out-of-row (or out-of-partition)
        # lead simply drops out of that window's min
        return F.when(
            F.lead("__r", j).over(w) == F.col("__r"), F.lead("h", j).over(w)
        )

    fp = F.least(F.col("h"), *[_same_row_lead(j) for j in range(1, 4)])
    return (
        hashed.select("doc_id", fp.alias("fp"))
        .distinct()
    )


@query(
    "q76_stratified_sample",
    oracle="""
SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
    ) AS rk
  FROM documents
) WHERE rk <= 5
""",
)
def q76_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified exact-N sampling: exactly 5 documents per language,
    chosen by ranking each stratum on an md5 hash of the key — a
    deterministic, engine-independent 'random' order, so the SAME
    sample comes back on every run/cluster/engine (what a resumable
    training-data pipeline needs; rand()-based sampling can't
    hash-match an oracle). Columns: doc_id, lang, rk.

    Scale: one shuffle on the stratum key; the per-stratum sort is
    a top-N window (rank <= 5 prunes early under AQE).
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@query(
    "q77_source_mixture",
    oracle="""
WITH kept AS (
  SELECT lang, source FROM documents
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
    CASE lang WHEN 'en' THEN '33' WHEN 'de' THEN '7f' ELSE 'ff' END
)
SELECT lang, source, COUNT(*) AS n_kept
FROM kept GROUP BY lang, source
""",
)
def q77_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture construction: downsample each language to a
    target proportion (en 20%, de 50%, others 100%) with the same
    deterministic md5-threshold membership as q75 — the
    rebalance-before-training step of an LLM data pipeline, exact
    sample membership oracle-checked. Columns: lang, source, n_kept.

    Scale: a narrow map predicate at the scan plus one aggregation;
    changing the mixture never reshuffles the corpus.
    """
    d = table(spark, sf_dir, "documents")
    cutoff = (
        F.when(F.col("lang") == "en", "33")
        .when(F.col("lang") == "de", "7f")
        .otherwise("ff")
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        d.filter(h <= cutoff)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_kept"))
    )


@query(
    "q78_chunk_documents",
    oracle="""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents WHERE trim(text) <> ''
), chunks AS (
  SELECT doc_id,
    CAST((start - 1) / 30 AS INT) AS chunk_id,
    list_slice(a, start, LEAST(start + 39, len(a))) AS c
  FROM arr, unnest(range(1, len(a) + 1, 30)) AS r(start)
)
SELECT doc_id, chunk_id,
  CAST(len(c) AS INT) AS n_tokens,
  md5(array_to_string(c, ' ')) AS chunk_md5
FROM chunks
""",
)
def q78_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into 40-token
    chunks with stride 30 (10-token overlap) — the packing step that
    turns raw documents into training-window-sized pieces. Emits the
    md5 of each chunk (compact, and the chunk CONTENT is what gets
    oracle-checked). Columns: doc_id, chunk_id, n_tokens, chunk_md5.

    Scale: sequence+explode generates starts per document (no driver
    loop); slice/array_join are codegen'd; no shuffle at all — the
    whole query is a narrow map over the documents scan.
    """
    d = table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    toks = tokens(F.lower(F.col("text")))
    base = d.select("doc_id", toks.alias("a"), F.size(toks).alias("n"))
    starts = base.select(
        "doc_id",
        "a",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(30))
        ).alias("start"),
    )
    chunk = F.slice(F.col("a"), F.col("start"), 40)
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / 30).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@query(
    "q79_pack_sequences",
    oracle="""
WITH t AS (
  SELECT doc_id, lang,
    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
         % 8 AS INT) AS bucket,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, bucket, n_tokens,
    SUM(n_tokens) OVER (
      PARTITION BY lang, bucket ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - n_tokens AS cum_before
  FROM t
)
SELECT doc_id, lang, bucket, CAST(n_tokens AS INT) AS n_tokens,
  -- explicit floor: DuckDB's / is float division and its double->int
  -- cast ROUNDS (Spark truncates); floor agrees in both engines
  CAST(FLOOR(cum_before / 2048.0) AS INT) AS pack_id,
  CAST(cum_before % 2048 AS INT) AS pack_offset
FROM c
""",
)
def q79_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concatenate each shard's
    documents in deterministic (doc_id) order and cut every 2048
    tokens — each document gets the pack it STARTS in (within its
    shard) and its token offset within that pack (the GPT-style
    concatenate-then-chunk regime; pair with q78 to materialize the
    chunk text). Columns: doc_id, lang, bucket, n_tokens, pack_id,
    pack_offset.

    Scale: the shard key is (lang, hash_bucket) — lang alone is
    low-cardinality and skewed (one task would accumulate a whole
    language's running sum at 100 TB), so an md5-derived bucket of
    the doc id fans each language out over 8 independent cumsum
    shards. The bucket is a cross-engine deterministic hash
    (first 4 md5 hex digits mod 8 — same recipe both engines), so
    the exact shard assignment is oracle-checked. Packing stays
    embarrassingly parallel; the one shuffle is on the shard key.
    """
    from car_insurance_data_pipeline_spark_spark.functions.text import (
        token_count,
    )

    from car_insurance_data_pipeline_spark_spark.functions.sampling import (
        md5_bucket,
    )

    d = table(spark, sf_dir, "documents")
    bucket = md5_bucket("doc_id", hex_digits=4, mod=8)
    w = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return (
        d.select(
            "doc_id",
            "lang",
            bucket.alias("bucket"),
            token_count("text").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "lang",
            "bucket",
            "n_tokens",
            F.floor(cum_before / 2048).cast("int").alias("pack_id"),
            (cum_before % 2048).cast("int").alias("pack_offset"),
        )
    )


@query(
    "q81_decontaminate",
    oracle="""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS s
  FROM arr, unnest(range(1, len(a) - 1)) AS r(i)
), bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id < 20
), hits AS (
  SELECT sh.doc_id, COUNT(*) AS n_shared
  FROM sh JOIN bench USING (s)
  WHERE sh.doc_id >= 20
  GROUP BY sh.doc_id
)
SELECT doc_id, n_shared,
  CAST(CASE WHEN n_shared >= 5 THEN 1 ELSE 0 END AS INT) AS contaminated
FROM hits
""",
)
def q81_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing
    >= 5 distinct 3-gram shingles with a held-out benchmark set —
    the n-gram overlap scrub every LLM data pipeline runs before
    training. Columns: doc_id, n_shared, contaminated.

    The operator (``decontaminate``) takes the benchmark as an
    ARBITRARY DataFrame; this catalog entry passes the fixture
    stand-in (docs 0-19) at the call site so the oracle can mirror
    the exact split.
    """
    d = table(spark, sf_dir, "documents")
    # filter BEFORE shingling: positioned_shingles injects a
    # nondeterministic __r projection that Catalyst won't push
    # predicates below, so a post-shingle filter would full-scan the
    # corpus for the 20-doc benchmark branch too
    return decontaminate(
        d.filter(F.col("doc_id") >= 20),
        d.filter(F.col("doc_id") < 20),
        "doc_id",
        "text",
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_shared: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing >= ``min_shared`` distinct
    word-``k``-gram shingles with ``benchmark`` (any frame carrying
    ``text_col``; its other columns are ignored). Columns: id_col,
    n_shared, contaminated. Docs with zero overlap are omitted —
    anti-join the ids to build the clean set.

    Scale: the benchmark shingle set is TINY relative to the corpus
    (broadcast side of the join), so the corpus streams through one
    broadcast-hash probe — no corpus shuffle beyond the per-doc
    count; shingles travel as the shared audited builder's strings
    (cross-engine oracle-checkable), xxhash64 in pure-Spark paths.
    """
    from car_insurance_data_pipeline_spark_spark.operators.dedup import (
        positioned_shingles,
    )

    # the benchmark needs only text: synthesize a per-row id so the
    # shingle window parallelizes per benchmark row regardless of
    # what columns the caller's frame carries
    b = benchmark.select(F.col(text_col)).withColumn(
        "__bid", F.monotonically_increasing_id()
    )
    bench = positioned_shingles(b, "__bid", text_col, k).select("s").distinct()
    shingled = positioned_shingles(corpus, id_col, text_col, k).dropDuplicates(
        [id_col, "s"]
    )
    hits = (
        shingled.join(F.broadcast(bench), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return hits.select(
        id_col,
        "n_shared",
        (F.col("n_shared") >= min_shared).cast("int").alias("contaminated"),
    )


@query(
    "q82_repetition_ratio",
    oracle="""
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
), g AS (
  SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS s
  FROM arr, unnest(range(1, len(a) - 1)) AS r(i)
), m AS (
  SELECT doc_id, COUNT(*) AS n_grams,
    COUNT(DISTINCT s) AS n_distinct
  FROM g GROUP BY doc_id
)
SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
  ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) AS rep_ratio,
  CAST(CASE WHEN 1.0 - CAST(n_distinct AS DOUBLE) / n_grams > 0.2
       THEN 1 ELSE 0 END AS INT) AS flagged
FROM m
""",
)
def q82_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (Gopher-style quality rule):
    fraction of repeated 3-grams per document, flagging docs above
    20% — catches boilerplate/looping text that dedup across
    documents misses. Columns: doc_id, n_grams, rep_ratio, flagged.

    Scale: one grouped aggregation over the shared shingle builder's
    output; count + count_distinct in a single pass, partial-agg'd
    map-side.
    """
    from car_insurance_data_pipeline_spark_spark.operators.dedup import (
        positioned_shingles,
    )

    d = table(spark, sf_dir, "documents")
    g = positioned_shingles(d, "doc_id", "text", 3)
    rep = 1.0 - F.col("n_distinct").cast("double") / F.col("n_grams")
    return (
        g.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count_distinct("s").alias("n_distinct"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.round(rep, 6).alias("rep_ratio"),
            (rep > 0.2).cast("int").alias("flagged"),
        )
    )


@query(
    "q83_verbatim_clusters",
    oracle="""
WITH RECURSIVE arr AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS a
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
    md5(array_to_string(list_slice(a, i, i + 19), ' ')) AS h
  FROM arr, unnest(range(1, len(a) - 18)) AS r(i)
), ok AS (
  -- mirrors the Spark side's max_postings=1000 df-cut
  SELECT h FROM sh GROUP BY h HAVING count(*) BETWEEN 2 AND 1000
), pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id
  JOIN ok ON ok.h = x.h
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) AS nodes(u)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
)
SELECT d.doc_id,
  COALESCE(c.component, d.doc_id) AS component,
  CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
       THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM documents d LEFT JOIN comp c USING (doc_id)
""",
)
def q83_verbatim_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (paragraph-level) dedup: cluster documents
    sharing a VERBATIM run of 20 consecutive tokens — the
    copied-passage dedup class that shingle-Jaccard/MinHash miss
    (they score topical overlap; a long exact run means literal
    copying). span_star_edges mines connectivity-preserving star
    edges per shared span (one shuffle on the span hash, df-cut at
    1000 postings, O(postings) expansion — components provably equal
    to the all-pairs miner's), and the edges feed the same
    alternating-star connected components as q73 for
    survivor-selection labels. Columns: doc_id, component,
    is_canonical.

    The oracle re-walks the same spans with md5 string hashes and a
    recursive-CTE closure — hash functions differ across engines
    (xxhash64 vs md5) but only within-engine equality matters for
    the pair set, so the CLUSTERS are value-checked.
    """
    from car_insurance_data_pipeline_spark_spark.operators.dedup import (
        span_star_edges,
    )

    d = table(spark, sf_dir, "documents")
    pairs = span_star_edges(d, "doc_id", "text", k=20, max_postings=1000)
    return _label_clusters(d, pairs)
