"""Record-linkage / interval-analytics operator tests (plans/linkops).

The catalog oracles for q133-q135 mirror the Spark algorithms, so a
shared algorithmic bug would pass the parity gate — these tests
verify against INDEPENDENT formulations instead (naive 3-way join
for triangles, brute-force pair scan for fuzzy matching, per-second
occupancy scan for concurrency).
"""

from __future__ import annotations

import duckdb
import pytest

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def test_triangles_match_naive_unoriented_join(spark, ddb):
    """The degree-oriented wedge enumeration must count exactly the
    triangles the naive id-oriented 3-way join finds — the wedge
    ordering and the closing-edge orientation must use the SAME
    total order, or triangles whose closing edge points 'the wrong
    way' are silently dropped (an undercount parity can't catch,
    because the oracle runs the same oriented algorithm)."""
    naive = dict(
        ddb.execute(
            """
WITH e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), tri AS MATERIALIZED (
  SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
  FROM e e1 JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT part, count(*) AS c
FROM (SELECT n1 FROM tri UNION ALL SELECT n2 FROM tri
      UNION ALL SELECT n3 FROM tri) t(part)
GROUP BY part ORDER BY c DESC, part LIMIT 20
"""
        ).fetchall()
    )
    got = {
        r["part"]: r["n_triangles"]
        for r in all_queries()["q135_triangle_copurchase"](spark, SF).collect()
    }
    assert got == naive


def test_fuzzy_pairs_equal_expected_blocked_set(spark, ddb):
    """The emitted pair set must EQUAL the independently-computed
    blocked subset of the brute-force scan — brute-force pairs
    restricted to a shared 8-char block key within kept (≤50-member)
    blocks. Subset-only checking would pass a bug that silently
    dropped most in-block pairs; set equality pins both soundness
    (no fabricated/mis-scored pairs) and completeness (every
    in-block close pair is found). The blocking restriction is
    recomputed here in plain Python, NOT by mirroring the SQL
    blocking join."""
    prefixes = dict(
        ddb.execute(
            """
SELECT doc_id,
  substring(regexp_replace(trim(lower(
      regexp_replace(COALESCE(text,''), '[^\\x00-\\x7f]', '', 'g'))),
            '\\s+', ' ', 'g'), 1, 40) AS pfx
FROM documents
"""
        ).fetchall()
    )
    brute = {
        (a, b): d
        for a, b, d in ddb.execute(
            """
WITH p AS (
  SELECT doc_id,
    substring(regexp_replace(trim(lower(
        regexp_replace(COALESCE(text,''), '[^\\x00-\\x7f]', '', 'g'))),
              '\\s+', ' ', 'g'), 1, 40) AS pfx
  FROM documents
)
SELECT a.doc_id, b.doc_id, levenshtein(a.pfx, b.pfx)
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 5
"""
        ).fetchall()
    }
    from collections import Counter

    blk = {doc: pfx[:8] for doc, pfx in prefixes.items()}
    blk_sizes = Counter(blk.values())
    expected = {
        pair: dist
        for pair, dist in brute.items()
        if blk[pair[0]] == blk[pair[1]]
        and blk_sizes[blk[pair[0]]] <= 50
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in all_queries()["q133_fuzzy_pairs"](spark, SF).collect()
    }
    assert got, "fixture should produce at least one fuzzy pair"
    assert got == expected


def test_fuzzy_prefix_parity_on_non_ascii_text(spark):
    """The q133 parity contract must hold for NON-ASCII input, not
    just the (all-ASCII) fixtures: DuckDB's levenshtein is
    byte-based while Spark's is codepoint-based, so the shared
    normalization strips non-ASCII before lowering. Run both
    engines' normalization + levenshtein over accented/multibyte
    strings and require identical distances."""
    import duckdb

    from pyspark.sql import functions as F

    rows = [
        ("a", "Café au lait"),
        ("b", "Cafe au lait"),
        ("c", "naïve  résumé\tdraft"),
        ("d", "naive resume draft"),
        ("e", "日本語テキスト mixed ascii tail"),
        ("f", "mixed ascii tail"),
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    ascii_text = F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), r"[^\x00-\x7f]", ""
    )
    pfx = F.substring(
        F.regexp_replace(F.trim(F.lower(ascii_text)), r"\s+", " "), 1, 40
    )
    p = sdf.select("doc_id", pfx.alias("pfx"))
    a, b = p.alias("a"), p.alias("b")
    spark_dist = {
        (r["da"], r["db"]): r["dist"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx")).alias("dist"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    duck_dist = {
        (da, db): d
        for da, db, d in con.execute(
            """
WITH p AS (
  SELECT doc_id,
    substring(regexp_replace(trim(lower(
        regexp_replace(COALESCE(text,''), '[^\\x00-\\x7f]', '', 'g'))),
              '\\s+', ' ', 'g'), 1, 40) AS pfx
  FROM docs
)
SELECT a.doc_id, b.doc_id, levenshtein(a.pfx, b.pfx)
FROM p a JOIN p b ON a.doc_id < b.doc_id
"""
        ).fetchall()
    }
    assert spark_dist == duck_dist
    # stripping é makes 'café' → 'caf': one edit from 'cafe' — and
    # crucially the SAME one edit in both engines (byte-based DuckDB
    # would have said 2 against the raw 'é')
    assert spark_dist[("a", "b")] == 1


def test_max_concurrency_matches_pointwise_scan(spark, ddb):
    """The sweep-line maximum must equal a brute-force occupancy
    count evaluated AT every interval start (the running maximum of
    a step function is attained at some event start, with half-open
    [s, e) intervals)."""
    rows = ddb.execute(
        """
SELECT event_id, event_type,
  epoch_us(ts) AS s_us,
  epoch_us(ts) // 86400000000 AS eday,
  LEAST(epoch_us(ts)
          + CAST(FLOOR(COALESCE(value,0) * 60) AS BIGINT) * 1000000,
        (epoch_us(ts) // 86400000000 + 1) * 86400000000) AS e_us
FROM events
"""
    ).fetchall()
    by_group: dict[tuple, list] = {}
    for _eid, et, s, eday, e in rows:
        by_group.setdefault((et, eday), []).append((s, e))
    expect = {}
    for key, ivs in by_group.items():
        best = 0
        for s, _ in ivs:
            best = max(best, sum(1 for a, b in ivs if a <= s < b))
        expect[key] = best
    got = {}
    for r in all_queries()["q134_max_concurrency"](spark, SF).collect():
        eday = (
            __import__("datetime").date.fromisoformat(r["day"])
            - __import__("datetime").date(1970, 1, 1)
        ).days
        got[(r["event_type"], eday)] = r["max_concurrent"]
    assert got == expect
