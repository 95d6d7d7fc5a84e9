"""skyline2d: exact kernel semantics (ties, duplicates, strictness)
plus the distributive two-phase operator vs a brute-force dominance
scan — and the phase-1 prune invariant the 100 TB design rests on."""

from __future__ import annotations

import random

import pandas as pd
import pytest


def brute_skyline(rows):
    """O(n²) reference: keep (p, s) iff no other (p2, s2) with
    p2 <= p and s2 >= s and (p2 < p or s2 > s)."""
    out = []
    for i, (p, s) in enumerate(rows):
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for j, (p2, s2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((p, s))
    return sorted(out)


def run_kernel(rows):
    from car_insurance_data_pipeline_spark_spark.operators.skyline import skyline_kernel

    pdf = pd.DataFrame(rows, columns=["price", "size"])
    got = skyline_kernel(pdf, "price", "size")
    return sorted(map(tuple, got.to_numpy()))


def test_kernel_simple_frontier():
    rows = [(1, 1), (2, 5), (3, 3), (4, 9), (5, 9)]
    # (3,3) dominated by (2,5); (5,9) dominated by (4,9)
    assert run_kernel(rows) == [(1, 1), (2, 5), (4, 9)]


def test_kernel_duplicate_frontier_points_all_survive():
    rows = [(2, 5), (2, 5), (1, 1), (2, 4)]
    assert run_kernel(rows) == [(1, 1), (2, 5), (2, 5)]


def test_kernel_equal_price_keeps_only_max_size():
    rows = [(2, 5), (2, 7), (2, 6)]
    assert run_kernel(rows) == [(2, 7)]


def test_kernel_equal_size_keeps_only_min_price():
    rows = [(1, 5), (2, 5), (3, 5)]
    assert run_kernel(rows) == [(1, 5)]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kernel_matches_bruteforce_random(seed):
    rng = random.Random(seed)
    rows = [(rng.randrange(10), rng.randrange(10)) for _ in range(80)]
    assert run_kernel(rows) == brute_skyline(rows)


def test_distributivity_of_kernel(spark):
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the
    algebraic fact phase 1's prune relies on."""
    rng = random.Random(9)
    a = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    b = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    direct = brute_skyline(a + b)
    via_parts = brute_skyline(brute_skyline(a) + brute_skyline(b))
    assert direct == via_parts


def test_skyline2d_grouped_matches_bruteforce(spark):
    from car_insurance_data_pipeline_spark_spark.operators.skyline import skyline2d

    rng = random.Random(4)
    rows = [
        (f"g{rng.randrange(3)}", i, rng.randrange(15), rng.randrange(15))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "grp string, id long, price long, size int"
    ).repartition(7)  # force multi-partition phase 1
    got = skyline2d(df, ["grp"], "price", "size").collect()
    by_grp = {}
    for g, _, p, s in rows:
        by_grp.setdefault(g, []).append((p, s))
    for g, pts in by_grp.items():
        expect = brute_skyline(pts)
        mine = sorted((r["price"], r["size"]) for r in got if r["grp"] == g)
        assert mine == expect, g


def test_skyline2d_global_variant(spark):
    from car_insurance_data_pipeline_spark_spark.operators.skyline import skyline2d

    rng = random.Random(5)
    rows = [(i, rng.randrange(30), rng.randrange(30)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, price long, size int").repartition(5)
    got = sorted(
        (r["price"], r["size"])
        for r in skyline2d(df, [], "price", "size").collect()
    )
    assert got == brute_skyline([(p, s) for _, p, s in rows])


def test_phase1_output_is_bounded_by_distinct_sizes(spark):
    """The prune bound: a partition slice's frontier has at most one
    price level per distinct size — so phase 2's input is tiny no
    matter how many input rows."""
    from car_insurance_data_pipeline_spark_spark.operators.skyline import skyline_kernel

    rng = random.Random(6)
    pdf = pd.DataFrame(
        [(rng.randrange(10_000), rng.randrange(5)) for _ in range(5_000)],
        columns=["price", "size"],
    )
    assert len(skyline_kernel(pdf, "price", "size")) <= 5
