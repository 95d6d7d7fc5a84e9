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


def test_fuzzy_pairs_subset_of_bruteforce(spark, ddb):
    """Every blocked pair must appear in the un-blocked brute-force
    all-pairs scan with the SAME distance (blocking may only lose
    recall, never fabricate or mis-score a pair)."""
    brute = {
        (a, b): d
        for a, b, d in ddb.execute(
            """
WITH p AS (
  SELECT doc_id,
    substring(regexp_replace(trim(lower(COALESCE(text,''))),
              '\\s+', ' ', 'g'), 1, 40) AS pfx
  FROM documents
)
SELECT a.doc_id, b.doc_id, levenshtein(a.pfx, b.pfx)
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 5
"""
        ).fetchall()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in all_queries()["q133_fuzzy_pairs"](spark, SF).collect()
    }
    assert got, "fixture should produce at least one fuzzy pair"
    for pair, dist in got.items():
        assert brute.get(pair) == dist


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
