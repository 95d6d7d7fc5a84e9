"""Third-implementation checks for the round-7 evaluation queries:
the DuckDB oracles were written by the same author as the Spark
plans, so a correlated misunderstanding would pass the mirror. These
tests replay the MATH independently in plain Python (exact Fraction
arithmetic / hashlib md5) and compare against the engine's output."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import duckdb

from car_insurance_data_pipeline_spark_spark.plans.catalog import all_queries


def test_hamilton_allocation_matches_python_replay(spark, sf_dir):
    """q268 vs an independent largest-remainder implementation over
    the same stratum histogram."""
    con = duckdb.connect()
    hist = con.execute(
        f"SELECT lang, COUNT(*) AS n FROM "
        f"'{sf_dir}/documents.parquet' WHERE lang IS NOT NULL "
        f"GROUP BY lang"
    ).fetchall()
    con.close()
    total = sum(n for _, n in hist)
    base = {lang: 1000 * n // total for lang, n in hist}
    rem = sorted(
        ((-(1000 * n - base[lang] * total), lang) for lang, n in hist),
    )
    extra = 1000 - sum(base.values())
    want = dict(base)
    for _, lang in rem[:extra]:
        want[lang] += 1
    got = {
        r.lang: r.alloc
        for r in all_queries()["q268_quota_allocation"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def _pav_exact(bins: list[tuple[int, int]]) -> list[Fraction]:
    """Textbook pool-adjacent-violators over (n, n_pos) bins with
    exact rational arithmetic — provably equal to the minimax
    closed form the query uses."""
    blocks: list[list[int]] = []  # [n_rows, n_pos, n_bins]
    for n, pos in bins:
        blocks.append([n, pos, 1])
        while len(blocks) >= 2:
            n2, p2, b2 = blocks[-1]
            n1, p1, b1 = blocks[-2]
            if Fraction(p1, n1) <= Fraction(p2, n2):
                break
            blocks[-2:] = [[n1 + n2, p1 + p2, b1 + b2]]
    out: list[Fraction] = []
    for n, pos, nb in blocks:
        out.extend([Fraction(pos, n)] * nb)
    return out


def test_isotonic_fit_equals_exact_pav(spark, sf_dir):
    """Monotone functions commute with max/min, so the query's
    minimax over FLOOR-ppm pooled rates must equal
    FLOOR(exact-Fraction PAV · 1e6) bin for bin."""
    rows = sorted(
        all_queries()["q259_isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    bins = [(r.n, r.n_pos) for r in rows]
    exact = _pav_exact(bins)
    assert len(exact) == len(rows)
    for r, f in zip(rows, exact):
        assert r.iso_rate_ppm == (f.numerator * 1_000_000) // f.denominator


def test_permutation_test_matches_python_replay(spark, sf_dir):
    """q262 vs an independent hashlib replay of the md5 assignment
    rule over the same per-user sufficient statistics."""
    con = duckdb.connect()
    us = con.execute(
        f"SELECT user_id, COUNT(*) AS n, "
        f"SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS s "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE value IS NOT NULL AND user_id IS NOT NULL "
        f"GROUP BY user_id"
    ).fetchall()
    con.close()

    import math

    def diff_nano(assign) -> int | None:
        na = sa = nb = sb = 0
        for (u, n, s) in us:
            if assign(u):
                na, sa = na + n, sa + s
            else:
                nb, sb = nb + n, sb + s
        if na == 0 or nb == 0:
            return None
        return math.floor((sa / na - sb / nb) * 1_000_000_000.0)

    def md5a(text: str) -> bool:
        return hashlib.md5(text.encode()).hexdigest()[0] <= "7"

    obs = diff_nano(lambda u: md5a(str(u)))
    n_ge = 0
    for pid in range(1, 201):
        d = diff_nano(lambda u, p=pid: md5a(f"{p}|{u}"))
        if d is None or abs(d) >= abs(obs):
            n_ge += 1
    row = all_queries()["q262_permutation_test"](spark, sf_dir).collect()[0]
    assert row.diff_obs_nano == obs
    assert row.n_ge == n_ge
    assert row.p_value_ppm == (1 + n_ge) * 1_000_000 // 201


def test_kmv_set_ops_matches_python_replay_above_k(spark):
    """Above the sketch size the estimators are no longer exact
    counts, but they ARE deterministic functions of the md5 order —
    replay them with hashlib and require exact equality."""
    from car_insurance_data_pipeline_spark_spark.operators.sketches import (
        kmv_set_ops,
    )

    k = 64
    A = list(range(0, 900))
    B = list(range(600, 1500))
    a = spark.createDataFrame([(i,) for i in A], "v long")
    b = spark.createDataFrame([(i,) for i in B], "v long")
    got = kmv_set_ops(a, b, "v", k).collect()[0]

    def h(x: int) -> str:
        return hashlib.md5(str(x).encode()).hexdigest()

    def est(hashes: list[str]) -> int:
        top = sorted(hashes)[:k]
        if len(top) < k:
            return len(top)
        return (k - 1) * (1 << 48) // int(top[-1][:12], 16)

    ha = {h(x) for x in A}
    hb = {h(x) for x in B}
    merged = sorted(ha | hb)[:k]
    k_common = sum(1 for x in merged if x in ha and x in hb)
    est_u = est(list(ha | hb))
    assert got.est_a == est(list(ha))
    assert got.est_b == est(list(hb))
    assert got.est_union == est_u
    assert got.k_common == k_common
    assert got.est_intersection == k_common * est_u // len(merged)
