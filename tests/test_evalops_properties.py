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


def test_ndcg_matches_python_replay(spark, sf_dir):
    """q256 vs an independent Python replay: ranking, discount
    terms, nano quantization, integer means."""
    import math

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_id, "
        f"CAST(ROUND(value * 1000) AS BIGINT) AS v, event_type "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE value IS NOT NULL AND user_id IS NOT NULL"
    ).fetchall()
    con.close()
    gain_of = {"purchase": 3, "click": 2, "view": 1}
    by_user: dict[int, list] = {}
    for u, eid, v, t in ev:
        by_user.setdefault(u, []).append((v, eid, gain_of.get(t, 0)))

    def dcg(items, key) -> int:
        ranked = sorted(items, key=key)
        total = 0
        for i, (_, _, g) in enumerate(ranked[:10], start=1):
            if g > 0:
                total += math.floor(
                    g * (math.log(2.0) / math.log(i + 1.0)) * 1e9
                )
        return total

    nds = []
    for items in by_user.values():
        d = dcg(items, key=lambda x: (-x[0], x[1]))
        ideal = dcg(items, key=lambda x: (-x[2], x[1]))
        if ideal > 0:
            nds.append(d * 1_000_000 // ideal)
    row = all_queries()["q256_ndcg"](spark, sf_dir).collect()[0]
    assert row.n_users == len(nds)
    assert row.mean_ndcg_ppm == sum(nds) // len(nds)
    assert row.min_ndcg_ppm == min(nds)
    assert row.max_ndcg_ppm == max(nds)


def test_spearman_matches_python_replay(spark, sf_dir):
    """q261 vs a doubled-average-rank Pearson replay in exact
    Python ints + one float tree."""
    import math

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(ROUND(l_quantity) AS BIGINT), "
        f"CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    con.close()

    def doubled_ranks(vals):
        from collections import Counter

        cnt = Counter(vals)
        r2 = {}
        below = 0
        for v in sorted(cnt):
            r2[v] = 2 * below + cnt[v] + 1
            below += cnt[v]
        return r2

    qs = [q for q, _ in rows]
    ps = [p for _, p in rows]
    rq, rp = doubled_ranks(qs), doubled_ranks(ps)
    n = len(rows)
    sx = sum(rq[q] for q in qs)
    sy = sum(rp[p] for p in ps)
    sxy = sum(rq[q] * rp[p] for q, p in rows)
    sxx = sum(rq[q] ** 2 for q in qs)
    syy = sum(rp[p] ** 2 for p in ps)
    rho = math.floor(
        float(n * sxy - sx * sy)
        / (math.sqrt(float(n * sxx - sx * sx))
           * math.sqrt(float(n * syy - sy * sy)))
        * 1_000_000
    )
    row = all_queries()["q261_spearman"](spark, sf_dir).collect()[0]
    assert row.n == n
    assert row.rho_ppm == rho


def test_zipf_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' "
        f"WHERE text IS NOT NULL"
    ).fetchall()
    con.close()
    cnt: Counter = Counter()
    for (t,) in texts:
        cnt.update(t.strip().lower().split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    pts = [
        (
            math.floor(math.log(i) * 1e6),
            math.floor(math.log(c) * 1e6),
        )
        for i, (_, c) in enumerate(ranked, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = math.floor(
        float(n * sxy - sx * sy) / float(n * sxx - sx * sx) * 1_000_000
    )
    row = all_queries()["q272_zipf_fit"](spark, sf_dir).collect()[0]
    assert row.n == n
    assert row.zipf_slope_ppm == slope


def test_silhouette_matches_python_replay(spark, sf_dir):
    import math

    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT vec_id, label, embedding "
        f"FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    con.close()
    q = {
        vid: [math.floor(float(x) * 1_000_000) for x in emb]
        for vid, _, emb in vecs
    }
    lab = {vid: l for vid, l, _ in vecs}
    # integer micro centroids: FLOOR-over-float of exact sums
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for vid, l, _ in vecs:
        counts[l] = counts.get(l, 0) + 1
        acc = sums.setdefault(l, [0] * len(q[vid]))
        for i, x in enumerate(q[vid]):
            acc[i] += x
    cent = {
        l: [math.floor(s / counts[l]) for s in acc]
        for l, acc in sums.items()
    }
    per_label: dict[int, list[int]] = {}
    for vid, l, _ in vecs:
        d2 = {
            cl: sum((a - b) ** 2 for a, b in zip(q[vid], c))
            for cl, c in cent.items()
        }
        a2 = d2[l]
        b2 = min(v for cl, v in d2.items() if cl != l)
        hi = max(math.sqrt(a2), math.sqrt(b2))
        s = (
            0
            if hi == 0
            else math.floor(
                (math.sqrt(b2) - math.sqrt(a2)) / hi * 1_000_000
            )
        )
        per_label.setdefault(l, []).append(s)
    got = {
        r.label: (r.n_vecs, r.sum_sil_ppm, r.mean_sil_ppm)
        for r in all_queries()["q258_silhouette"](spark, sf_dir).collect()
    }
    for l, ss in per_label.items():
        assert got[l] == (
            len(ss),
            sum(ss),
            math.floor(sum(ss) / len(ss)),
        )


def test_pmi_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' "
        f"WHERE text IS NOT NULL"
    ).fetchall()
    con.close()
    uni: Counter = Counter()
    big: Counter = Counter()
    nt = nb = 0
    for (t,) in texts:
        ws = t.strip().lower().split()
        uni.update(ws)
        nt += len(ws)
        if len(ws) >= 2:
            big.update(zip(ws, ws[1:]))
            nb += len(ws) - 1
    scored = [
        (
            math.floor(
                math.log(
                    (float(c12) * float(nt) * float(nt))
                    / (float(uni[w1]) * float(uni[w2]) * float(nb))
                )
                * 1e12
            ),
            w1,
            w2,
            c12,
        )
        for (w1, w2), c12 in big.items()
        if c12 >= 5
    ]
    want = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[:50]
    got = [
        (r.pmi_pico, r.w1, r.w2, r.c12)
        for r in all_queries()["q260_pmi_collocations"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want


def test_bh_fdr_matches_python_replay(spark, sf_dir):
    """q257 vs a full Python replay: day index, md5 cohorts,
    Chebyshev p-values (same float tree), BH step-up."""
    import math

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, "
        f"(epoch_us(ts) // 86400000000) % 7 AS dow, "
        f"user_id, CAST(ROUND(value * 1000) AS BIGINT) AS v "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE value IS NOT NULL AND user_id IS NOT NULL"
    ).fetchall()
    con.close()
    g: dict[tuple, list[int]] = {}
    for t, dow, u, v in ev:
        is_a = hashlib.md5(str(u).encode()).hexdigest()[0] <= "7"
        g.setdefault((t, int(dow), is_a), []).append(v)
    cells = sorted({(t, d) for (t, d, _) in g})
    ps = []
    for (t, d) in cells:
        A = g.get((t, d, True), [])
        B = g.get((t, d, False), [])
        na, nb = len(A), len(B)
        p = 1_000_000
        if na >= 2 and nb >= 2:
            sa, sb = sum(A), sum(B)
            s2a = sum(x * x for x in A)
            s2b = sum(x * x for x in B)
            ma, mb = sa / na, sb / nb
            se2 = (s2a - sa * ma) / (na - 1) / na + (
                s2b - sb * mb
            ) / (nb - 1) / nb
            d2 = (ma - mb) * (ma - mb)
            if d2 > 0 and se2 > 0:
                p = min(1_000_000, math.floor(1_000_000.0 * se2 / d2))
        ps.append((p, t, d))
    ps.sort()
    m = len(ps)
    k_max = 0
    for k, (p, _, _) in enumerate(ps, start=1):
        if p * m <= k * 100_000:
            k_max = k
    want = {
        (t, d): (p, k, 1 if k <= k_max else 0)
        for k, (p, t, d) in enumerate(ps, start=1)
    }
    got = {
        (r.event_type, r.dow): (r.p_ppm, r.k, r.rejected)
        for r in all_queries()["q257_bh_fdr"](spark, sf_dir).collect()
    }
    assert got == want


def test_mrr_recall_matches_python_replay(spark, sf_dir):
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_id, "
        f"CAST(ROUND(value * 1000) AS BIGINT) AS v, event_type "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE value IS NOT NULL AND user_id IS NOT NULL"
    ).fetchall()
    con.close()
    by_user: dict[int, list] = {}
    for u, eid, v, t in ev:
        by_user.setdefault(u, []).append((v, eid, t == "purchase"))
    rrs, recs = [], []
    for items in by_user.values():
        ranked = sorted(items, key=lambda x: (-x[0], x[1]))
        rel_ranks = [i for i, (_, _, r) in enumerate(ranked, 1) if r]
        if not rel_ranks:
            continue
        rrs.append(1_000_000 // rel_ranks[0])
        in10 = sum(1 for r in rel_ranks if r <= 10)
        recs.append(in10 * 1_000_000 // len(rel_ranks))
    row = all_queries()["q263_mrr_recall"](spark, sf_dir).collect()[0]
    assert row.n_users == len(rrs)
    assert row.mrr_ppm == sum(rrs) // len(rrs)
    assert row.mean_recall10_ppm == sum(recs) // len(recs)


def test_wilson_matches_python_replay(spark, sf_dir):
    import math

    con = duckdb.connect()
    g = con.execute(
        f"SELECT (epoch_us(ts) // 3600000000) % 24 AS hour, "
        f"COUNT(*) AS n, "
        f"SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1"
    ).fetchall()
    con.close()
    got = {
        r.hour: (r.lo_ppm, r.hi_ppm)
        for r in all_queries()["q269_wilson_ci"](spark, sf_dir).collect()
    }
    for hour, n, k in g:
        p = k / n
        half = 1.96 * math.sqrt(p * (1.0 - p) / n + 0.9604 / (float(n) * n))
        denom = 1.0 + 3.8416 / n
        lo = math.floor((p + 1.9208 / n - half) / denom * 1_000_000)
        hi = math.floor((p + 1.9208 / n + half) / denom * 1_000_000)
        assert got[int(hour)] == (lo, hi)


def test_vocab_richness_matches_python_replay(spark, sf_dir):
    from collections import Counter

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' "
        f"WHERE text IS NOT NULL"
    ).fetchall()
    con.close()
    cnt: Counter = Counter()
    for (t,) in texts:
        cnt.update(t.strip().lower().split())
    f1 = sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    n = sum(cnt.values())
    row = all_queries()["q270_vocab_richness"](spark, sf_dir).collect()[0]
    assert (row.n_tokens, row.vocab, row.f1, row.f2) == (
        n, len(cnt), f1, f2,
    )
    assert row.chao1_est == len(cnt) + f1 * (f1 - 1) // (2 * (f2 + 1))
    assert row.unseen_mass_ppm == f1 * 1_000_000 // n


def test_neyman_matches_python_replay(spark, sf_dir):
    import math

    con = duckdb.connect()
    g = con.execute(
        f"SELECT lang, COUNT(*) AS n, SUM(n_chars) AS s1, "
        f"SUM(CAST(n_chars AS HUGEINT) * n_chars) AS s2 "
        f"FROM '{sf_dir}/documents.parquet' "
        f"WHERE lang IS NOT NULL AND n_chars IS NOT NULL GROUP BY lang"
    ).fetchall()
    con.close()
    wt = {}
    for lang, n, s1, s2 in g:
        if n >= 2:
            var = max(
                (float(s2) - float(s1) * (float(s1) / n)) / (n - 1), 0.0
            )
            wt[lang] = math.floor(n * math.sqrt(var) * 1000)
        else:
            wt[lang] = 0
    tw = sum(wt.values())
    base = {lang: 1000 * w // tw for lang, w in wt.items()}
    rem = sorted(
        ((-(1000 * w - base[lang] * tw), lang) for lang, w in wt.items())
    )
    extra = 1000 - sum(base.values())
    want = dict(base)
    for _, lang in rem[:extra]:
        want[lang] += 1
    got = {
        r.lang: r.alloc
        for r in all_queries()["q273_neyman_allocation"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_clustering_coefficient_matches_python_replay(spark, sf_dir):
    con = duckdb.connect()
    edges = con.execute(
        f"""
WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey
            FROM '{sf_dir}/lineitem.parquet')
SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey
 AND b.l_linenumber = a.l_linenumber + 1
 AND a.l_partkey <> b.l_partkey
"""
    ).fetchall()
    con.close()
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    rows = []
    for node, ns in nbrs.items():
        d = len(ns)
        if d < 2:
            continue
        ns_sorted = sorted(ns)
        tri = 0
        for i, w1 in enumerate(ns_sorted):
            for w2 in ns_sorted[i + 1 :]:
                if w2 in nbrs.get(w1, ()):  # closing edge
                    tri += 1
        rows.append(
            (node, d, tri, tri * 2 * 1_000_000 // (d * (d - 1)))
        )
    want = sorted(rows, key=lambda r: (-r[3], r[0]))[:100]
    got = [
        (r.node, r.degree, r.n_triangles, r.cc_ppm)
        for r in all_queries()["q274_clustering_coefficient"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want


def test_trimmed_mean_matches_python_replay(spark, sf_dir):
    """q276 vs plain sorted-list trimming — the histogram interval
    intersections must equal literal order-statistic trimming."""
    con = duckdb.connect()
    vals = sorted(
        v
        for (v,) in con.execute(
            f"SELECT CAST(ROUND(value * 1000) AS BIGINT) "
            f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"
        ).fetchall()
    )
    con.close()
    n = len(vals)
    k = n // 20
    inner = vals[k : n - k]
    trimmed = sum(inner) * 1000 // len(inner)
    v_lo, v_hi = vals[k], vals[n - k - 1]
    wins = (sum(inner) + k * v_lo + k * v_hi) * 1000 // n
    row = all_queries()["q276_trimmed_mean"](spark, sf_dir).collect()[0]
    assert (row.n, row.k) == (n, k)
    assert row.trimmed_mean_micro == trimmed
    assert row.winsorized_mean_micro == wins
    assert (row.p05_milli, row.p95_milli) == (v_lo, v_hi)


def test_did_matches_python_replay(spark, sf_dir):
    import math

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT epoch_us(ts), user_id, "
        f"CAST(ROUND(value * 1000) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE value IS NOT NULL AND user_id IS NOT NULL"
    ).fetchall()
    con.close()
    t0 = min(t for t, _, _ in ev)
    t1 = max(t for t, _, _ in ev)
    cells: dict[tuple, list[int]] = {}
    for t, u, v in ev:
        post = 0 if 2 * t <= t0 + t1 else 1
        in_a = hashlib.md5(str(u).encode()).hexdigest()[0] <= "7"
        cells.setdefault((post, in_a), []).append(v)

    def mean(post, in_a):
        xs = cells[(post, in_a)]
        return sum(xs) / len(xs)

    did = math.floor(
        ((mean(1, True) - mean(0, True)) - (mean(1, False) - mean(0, False)))
        * 1_000_000_000.0
    )
    row = all_queries()["q275_diff_in_diff"](spark, sf_dir).collect()[0]
    assert row.did_nano == did
    assert row.na_pre == len(cells[(0, True)])
    assert row.nb_post == len(cells[(1, False)])


# ---------------------------------------------------------------------------
# Replays for the highest-risk IN-WINDOW statistics queries: these
# earn first driver rows this round, so a correlated Spark/oracle
# bug would produce a green-but-wrong row. The q276 catch proved
# this class exists.
# ---------------------------------------------------------------------------


def _ab_values(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, CAST(ROUND(value * 1000) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    con.close()
    A, B = [], []
    for u, v in rows:
        if u is not None and hashlib.md5(
            str(u).encode()
        ).hexdigest()[0] <= "7":
            A.append(v)
        else:
            B.append(v)
    return A, B


def test_mann_whitney_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    A, B = _ab_values(sf_dir)
    ca, cb = Counter(A), Counter(B)
    vals = sorted(set(A) | set(B))
    cum = 0
    two_r_a = 0
    ties = 0
    for v in vals:
        cnt = ca[v] + cb[v]
        two_r_a += ca[v] * (2 * cum + cnt + 1)
        ties += cnt ** 3 - cnt
        cum += cnt
    na, nb = len(A), len(B)
    u2 = two_r_a - na * (na + 1)
    n = na + nb
    sig2 = (na * nb / 12.0) * ((n + 1.0) - float(ties) / (n * (n - 1.0)))
    z = (float(u2) - float(na) * nb) / (2.0 * math.sqrt(sig2))
    row = all_queries()["q218_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b, row.u2_a) == (na, nb, u2)
    assert row.z_ppm == math.floor(z * 1_000_000)


def test_auc_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(ROUND(value * 1000) AS BIGINT), "
        f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    con.close()
    pos, neg = Counter(), Counter()
    for v, y in rows:
        (pos if y else neg)[v] += 1
    neg_below = 0
    u2 = 0
    for v in sorted(set(pos) | set(neg)):
        u2 += pos[v] * (2 * neg_below + neg[v])
        neg_below += neg[v]
    n_pos = sum(pos.values())
    n_neg = sum(neg.values())
    row = all_queries()["q233_exact_auc"](spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert row.auc_ppm == math.floor(
        float(u2) / (2.0 * float(n_pos) * float(n_neg)) * 1_000_000
    )
    assert row.gini_ppm == math.floor(
        float(u2) / (float(n_pos) * float(n_neg)) * 1_000_000
    ) - 1_000_000


def test_average_precision_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(ROUND(value * 1000) AS BIGINT), "
        f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    con.close()
    pos, neg = Counter(), Counter()
    for v, y in rows:
        (pos if y else neg)[v] += 1
    cum_pos = cum_all = 0
    ap_num = 0
    for v in sorted(set(pos) | set(neg), reverse=True):
        cum_pos += pos[v]
        cum_all += pos[v] + neg[v]
        if pos[v] > 0:
            ap_num += math.floor(
                float(pos[v]) * (float(cum_pos) / float(cum_all)) * 1e12
            )
    n_pos = sum(pos.values())
    row = all_queries()["q250_average_precision"](spark, sf_dir).collect()[0]
    assert row.n_pos == n_pos
    assert row.ap_pico == ap_num // n_pos


def test_ks_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    A, B = _ab_values(sf_dir)
    ca_c, cb_c = Counter(A), Counter(B)
    na, nb = len(A), len(B)
    ca = cb = 0
    best = -1
    at = None
    for v in sorted(set(A) | set(B)):
        ca += ca_c[v]
        cb += cb_c[v]
        d = abs(ca * nb - cb * na)
        if d > best:
            best, at = d, v
    row = all_queries()["q219_ks_two_sample"](spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.d_ppm == best * 1_000_000 // (na * nb)
    assert row.ks_at_milli == at
    assert row.ks_scaled_ppm == math.floor(
        float(best) / (float(na) * float(nb))
        * math.sqrt(float(na) * float(nb) / (float(na) + float(nb)))
        * 1_000_000
    )


def test_calibration_bins_match_python_replay(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(ROUND(value * 1000) AS BIGINT), "
        f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    con.close()
    lo = min(v for v, _ in rows)
    hi = max(v for v, _ in rows)
    want: dict[int, list[int]] = {}
    for v, y in rows:
        b = 0 if hi == lo else min((v - lo) * 10 // (hi - lo), 9)
        acc = want.setdefault(b, [0, 0, 0])
        acc[0] += 1
        acc[1] += y
        acc[2] += v
    got = {
        r.bin: (r.n, r.n_pos, r.obs_rate_ppm, r.sum_score_milli)
        for r in all_queries()["q234_calibration_bins"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(want)
    for b, (n, npos, sv) in want.items():
        assert got[b] == (n, npos, npos * 1_000_000 // n, sv)


def test_mann_kendall_matches_python_replay(spark, sf_dir):
    import math
    from collections import Counter

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, epoch_us(ts) // 86400000000 AS d, "
        f"SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS tot "
        f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL "
        f"GROUP BY 1, 2"
    ).fetchall()
    con.close()
    series: dict[str, list[tuple[int, int]]] = {}
    for t, d, tot in rows:
        series.setdefault(t, []).append((int(d), int(tot)))
    want = {}
    for t, pts in series.items():
        pts.sort()
        s_stat = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                if pts[j][1] > pts[i][1]:
                    s_stat += 1
                elif pts[j][1] < pts[i][1]:
                    s_stat -= 1
        n = len(pts)
        tie_counts = Counter(v for _, v in pts)
        tie_term = sum(c * (c - 1) * (2 * c + 5) for c in tie_counts.values())
        var18 = (
            float(n) * (float(n) - 1.0) * (2.0 * float(n) + 5.0)
            - float(tie_term)
        )
        if var18 <= 0:
            continue
        cc = 1.0 if s_stat > 0 else (-1.0 if s_stat < 0 else 0.0)
        z = (float(s_stat) - cc) / math.sqrt(var18 / 18.0)
        want[t] = (n, s_stat, math.floor(z * 1_000_000))
    got = {
        r.event_type: (r.n_days, r.s_stat, r.z_ppm)
        for r in all_queries()["q230_mann_kendall"](spark, sf_dir).collect()
    }
    assert got == want


def test_cohens_d_matches_python_replay(spark, sf_dir):
    import math

    A, B = _ab_values(sf_dir)
    na, nb = len(A), len(B)
    sa, sb = sum(A), sum(B)
    sqa = sum(v * v for v in A)
    sqb = sum(v * v for v in B)
    pooled = (
        (float(sqa) - float(sa) * float(sa) / float(na))
        + (float(sqb) - float(sb) * float(sb) / float(nb))
    ) / (float(na) + float(nb) - 2.0)
    d = (float(sa) / float(na) - float(sb) / float(nb)) / math.sqrt(pooled)
    row = all_queries()["q253_effect_size"](spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.cohens_d_ppm == math.floor(d * 1_000_000)


def test_power_iteration_pca_matches_python_replay(spark, sf_dir):
    """q227 was structurally rewritten this round (array-row matvec)
    — replay the exact integer fixed-point recurrence in plain
    Python ints (no numpy, no floats except the two FLOOR trees the
    query defines) and require bit-equality of the final state."""
    import math

    con = duckdb.connect()
    embs = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    con.close()
    Q = [
        [math.floor(float(x) * 1_000_000) for x in emb] for (emb,) in embs
    ]
    dims = len(Q[0])
    v = [1_000_000] * dims
    for _ in range(3):
        w = [0] * dims  # exact Python ints (the engine uses DECIMAL)
        for q in Q:
            u = math.floor(
                float(sum(a * b for a, b in zip(q, v))) / 1_000_000.0
            )
            for i, a in enumerate(q):
                w[i] += a * u
        m = max(abs(x) for x in w)
        v = [
            math.floor(float(x) / float(m) * 1_000_000.0) for x in w
        ]
    got = {
        r.dim: r.v_micro
        for r in all_queries()["q227_power_iteration_pca"](
            spark, sf_dir
        ).collect()
    }
    assert got == {i: v[i] for i in range(dims)}
