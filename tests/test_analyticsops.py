"""Semantics tests for the analytics batch (q162-q175): brute-force
pandas cross-checks and algebraic invariants that hold independently
of the DuckDB oracle mirror (which verifies cross-engine parity, not
that both engines compute the RIGHT thing)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def sf_small() -> str:
    return SF_SMOKE


def run(spark, sf, name):
    from car_insurance_data_pipeline_spark_spark.plans.catalog import specs

    return specs()[name].fn(spark, sf).toPandas()


# ---------------------------------------------------------------------------
# q162 gaps-and-islands
# ---------------------------------------------------------------------------


def test_gaps_islands_brute_force(spark, sf_small):
    got = run(spark, sf_small, "q162_gaps_islands")
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    days = (
        orders.assign(
            day=(orders.o_orderdate.dt.normalize() - pd.Timestamp(0)).dt.days
        )[["o_custkey", "day"]]
        .drop_duplicates()
        .sort_values(["o_custkey", "day"])
    )
    expect = {}
    for ck, grp in days.groupby("o_custkey"):
        d = grp.day.to_numpy()
        runs = np.split(d, np.where(np.diff(d) != 1)[0] + 1)
        lens = [len(r) for r in runs]
        if max(lens) >= 2:
            expect[ck] = (len(lens), max(lens), sum(lens))
    got_map = {
        r.o_custkey: (r.n_islands, r.max_streak, r.active_days)
        for r in got.itertuples()
    }
    assert got_map == expect


# ---------------------------------------------------------------------------
# q163 Benford
# ---------------------------------------------------------------------------


def test_benford_counts_and_ppm_sum(spark, sf_small):
    got = run(spark, sf_small, "q163_benford_digits")
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    first = (
        orders.loc[orders.o_totalprice >= 1, "o_totalprice"]
        .apply(lambda x: int(str(int(np.floor(x)))[0]))
        .value_counts()
    )
    got_counts = dict(zip(got.digit, got.observed))
    assert got_counts == first.to_dict()
    # floor-ppm shares must sum to within 9 ulp-of-ppm of 1e6
    assert 1_000_000 - 9 <= got.obs_ppm.sum() <= 1_000_000
    # Benford expectations are a fixed distribution summing to ~1e6
    assert got.exp_ppm.sum() == 1_000_000


# ---------------------------------------------------------------------------
# q164 transitions / q165 attribution
# ---------------------------------------------------------------------------


def test_transition_row_probabilities_complete(spark, sf_small):
    got = run(spark, sf_small, "q164_markov_transitions")
    # every from-row's ppm sums to 1e6 minus at most (k-1) floor losses
    for _, grp in got.groupby("from_type"):
        assert 1_000_000 - len(grp) < grp.ppm.sum() <= 1_000_000
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    # total transitions = total events - number of users
    assert got.n.sum() == len(ev) - ev.user_id.nunique()


def test_attribution_covers_every_user_once(spark, sf_small):
    got = run(spark, sf_small, "q165_attribution_matrix")
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    assert got.n_users.sum() == ev.user_id.nunique()
    ev = ev.sort_values(["ts", "event_id"])
    first = ev.groupby("user_id").event_type.first()
    last = ev.groupby("user_id").event_type.last()
    expect = (
        pd.DataFrame({"first_type": first, "last_type": last})
        .value_counts()
        .to_dict()
    )
    got_map = {
        (r.first_type, r.last_type): r.n_users for r in got.itertuples()
    }
    assert got_map == expect


# ---------------------------------------------------------------------------
# q166 time-weighted average
# ---------------------------------------------------------------------------


def test_twa_brute_force_one_user(spark, sf_small):
    got = run(spark, sf_small, "q166_time_weighted_avg")
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    ev = ev[ev.value.notna()].copy()
    ev["us"] = (ev.ts - pd.Timestamp(0)).dt.total_seconds().mul(1e6).round()
    uid = int(got.user_id.iloc[0])
    g = ev[ev.user_id == uid].sort_values(["us", "event_id"])
    cents = np.round(g.value.to_numpy() * 100).astype(np.int64)
    us = g.us.to_numpy().astype(np.int64)
    dt_s = (us[1:] - us[:-1]) // 1_000_000
    wsum = int((cents[:-1] * dt_s).sum())
    tot = int(dt_s.sum())
    row = got[got.user_id == uid].iloc[0]
    assert (row.wsum_cent_s, row.total_s, row.twa_cents) == (
        wsum,
        tot,
        wsum // tot,
    )
    # TWA lies within the value range of the user's readings
    assert cents.min() <= row.twa_cents <= cents.max()


# ---------------------------------------------------------------------------
# q169 weighted median
# ---------------------------------------------------------------------------


def test_weighted_median_brute_force(spark, sf_small):
    got = run(spark, sf_small, "q169_weighted_median")
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet")
    li["price_cents"] = np.round(li.l_extendedprice * 100).astype(np.int64)
    li["w"] = li.l_quantity.astype(np.int64)
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values(["price_cents", "l_orderkey", "l_linenumber"])
        cw = g.w.cumsum()
        tw = int(g.w.sum())
        median = int(g.price_cents.to_numpy()[(2 * cw >= tw).argmax()])
        row = got[got.flag == flag].iloc[0]
        assert (row.wmedian_cents, row.total_weight) == (median, tw)


# ---------------------------------------------------------------------------
# q170 Lorenz deciles
# ---------------------------------------------------------------------------


def test_lorenz_deciles_invariants(spark, sf_small):
    got = run(spark, sf_small, "q170_revenue_concentration")
    for seg, grp in got.groupby("segment"):
        g = grp.sort_values("decile")
        # cumulative share is monotone and ends at 1e6 (floor-exact:
        # the last cum equals the total)
        assert (g.cum_share_ppm.diff().dropna() >= 0).all()
        assert g.cum_share_ppm.iloc[-1] == 1_000_000
        # Lorenz convexity: later deciles carry >= share (ntile by
        # revenue ascending), modulo uneven bucket sizes of +-1 row
        assert g.share_ppm.iloc[-1] == g.share_ppm.max()
        # decile populations differ by at most 1 (NTILE contract)
        assert g.n_cust.max() - g.n_cust.min() <= 1


# ---------------------------------------------------------------------------
# q171 association rules
# ---------------------------------------------------------------------------


def test_association_rules_brute_force(spark, sf_small):
    got = run(spark, sf_small, "q171_association_rules")
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    ev["us"] = (ev.ts - pd.Timestamp(0)).dt.total_seconds().mul(1e6).round()
    ev["day"] = ev.us.astype(np.int64) // 86_400_000_000
    it = ev[["user_id", "day", "event_type"]].drop_duplicates()
    baskets = it.groupby(["user_id", "day"]).event_type.agg(frozenset)
    n_baskets = len(baskets)
    from collections import Counter

    n_ab: Counter = Counter()
    n_a: Counter = Counter()
    for s in baskets:
        for x in s:
            n_a[x] += 1
        items = sorted(s)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                n_ab[(items[i], items[j])] += 1
    for r in got.itertuples():
        assert r.n_ab == n_ab[(r.item_a, r.item_b)]
        assert r.support_ppm == int(
            np.floor(r.n_ab / n_baskets * 1_000_000)
        )
        assert r.confidence_ppm == int(
            np.floor(r.n_ab / n_a[r.item_a] * 1_000_000)
        )
        assert r.lift_ppm == int(
            np.floor(
                r.n_ab * n_baskets / (n_a[r.item_a] * n_a[r.item_b]) * 1e6
            )
        )


# ---------------------------------------------------------------------------
# q172 RFM
# ---------------------------------------------------------------------------


def test_rfm_grid_complete_and_balanced(spark, sf_small):
    got = run(spark, sf_small, "q172_rfm_segments")
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    n_cust = orders.o_custkey.nunique()
    assert got.n_customers.sum() == n_cust
    # every axis is a 1..5 quintile with balanced marginals
    for axis in ("r_score", "f_score", "m_score"):
        marg = got.groupby(axis).n_customers.sum()
        assert set(marg.index) == {1, 2, 3, 4, 5}
        assert marg.max() - marg.min() <= 1


# ---------------------------------------------------------------------------
# q173 contamination score
# ---------------------------------------------------------------------------


def test_contamination_score_bounds_and_benchmark_self(spark, sf_small):
    got = run(spark, sf_small, "q173_contamination_score")
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    # one row per corpus doc that has at least one 3-gram
    n_corpus = (
        docs[docs.doc_id >= 20]
        .text.str.lower()
        .str.strip()
        .str.split()
        .str.len()
        .ge(3)
        .sum()
    )
    assert len(got) == n_corpus
    assert (got.n_shared <= got.n_shingles).all()
    assert (got.score_ppm <= 1_000_000).all()
    assert (got.score_ppm >= 0).all()
    # brute-force one document's score
    def shingles(t):
        w = t.lower().strip().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    bench = set()
    for t in docs[docs.doc_id < 20].text:
        bench |= shingles(t)
    row = got.sort_values("doc_id").iloc[0]
    doc = docs[docs.doc_id == row.doc_id].text.iloc[0]
    mine = shingles(doc)
    shared = len(mine & bench)
    assert (row.n_shingles, row.n_shared) == (len(mine), shared)
    assert row.score_ppm == shared * 1_000_000 // len(mine)


# ---------------------------------------------------------------------------
# q174 Count-Min
# ---------------------------------------------------------------------------


def test_countmin_one_sided_error(spark, sf_small):
    got = run(spark, sf_small, "q174_countmin_sketch")
    # CM never underestimates, and the top key's exact count matches
    # a pandas count
    assert (got.overcount >= 0).all()
    assert (got.cm_est == got.exact_n + got.overcount).all()
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet")
    vc = li.l_partkey.value_counts()
    top = got.sort_values(
        ["exact_n", "partkey"], ascending=[False, True]
    ).iloc[0]
    assert vc[top.partkey] == top.exact_n == vc.max()


# ---------------------------------------------------------------------------
# q175 readability
# ---------------------------------------------------------------------------


def test_readability_brute_force(spark, sf_small):
    import math
    import re

    got = run(spark, sf_small, "q175_readability")
    docs = pd.read_parquet(f"{sf_small}/documents.parquet")
    docs = docs[docs.text.notna() & (docs.text.str.strip() != "")]
    assert len(got) == len(docs)
    for _, doc in docs.head(5).iterrows():
        t = doc.text
        w = len(re.split(r"\s+", t.strip().lower()))
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        v = len(re.findall(r"[aeiouy]+", t.lower()))
        score = math.floor((206.835 - 1.015 * (w / s) - 84.6 * (v / w)) * 1e6)
        row = got[got.doc_id == doc.doc_id].iloc[0]
        assert (row.n_words, row.n_sents, row.n_vgroups) == (w, s, v)
        assert row.flesch_micro == score


# ---------------------------------------------------------------------------
# q177 Poisson bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_weights_behave_like_poisson(spark, sf_small):
    got = run(spark, sf_small, "q177_bootstrap_ci")
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    n = len(orders)
    assert len(got) == 32
    # E[n_eff] = n per replicate; Poisson(1) sum concentrates hard —
    # allow 5 sigma (sigma = sqrt(n))
    sd = np.sqrt(n)
    assert ((got.n_eff - n).abs() <= 5 * sd).all()
    # every replicate mean stays near the true mean (cents)
    true_mean = int(np.round(orders.o_totalprice * 100).astype(np.int64).sum() // n)
    assert ((got.mean_cents - true_mean).abs() / true_mean < 0.2).all()
    # replicates genuinely differ (resampling, not 32 copies)
    assert got.n_eff.nunique() > 1 and got.mean_cents.nunique() > 1
    # exact integer identity
    assert (got.mean_cents == got.sum_cents // got.n_eff).all()
