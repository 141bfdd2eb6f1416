"""Hypothesis pins for the wave-25/27 evaluation-metric SQL spellings
(DuckDB-side, scalar python references): heavy score ties, single-class
corpora, and disjoint supports are exactly the inputs the fixtures cannot
plant and where rank-based metrics go wrong."""

from __future__ import annotations

import duckdb
from hypothesis import assume, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# q342: AUC via distinct-value average ranks == pairwise definition
# ---------------------------------------------------------------------------

_AUC_SQL = """
    WITH g AS (
        SELECT v, count_if(y) AS cp, COUNT(*) AS m FROM pts GROUP BY v),
    r AS (
        SELECT cp, m,
               SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS before
        FROM g),
    s AS (
        SELECT SUM(cp) AS np, SUM(m - cp) AS nn,
               SUM(cp * (before + (m + 1) / 2.0)) AS rp
        FROM r)
    SELECT (rp - CAST(np AS DOUBLE) * (np + 1) / 2.0) / (CAST(np AS DOUBLE) * nn)
    FROM s
"""


@settings(max_examples=60, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 6), st.booleans()), min_size=2, max_size=60
    )
)
def test_auc_rank_spelling_equals_pairwise(pts):
    labels = {y for _, y in pts}
    assume(len(labels) == 2)  # both classes present
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (v INT, y BOOLEAN)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    got = con.execute(_AUC_SQL).fetchone()[0]
    con.close()
    pos = [v for v, y in pts if y]
    neg = [v for v, y in pts if not y]
    score = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    assert abs(got - score / (len(pos) * len(neg))) < 1e-12


# ---------------------------------------------------------------------------
# q343: PR-AUC step integral + best-F1 == scalar threshold sweep
# ---------------------------------------------------------------------------

_PR_SQL = """
    WITH g AS (
        SELECT v, count_if(y) AS cp, COUNT(*) AS m FROM pts GROUP BY v),
    tot AS (SELECT SUM(cp) AS np FROM g),
    c AS (
        SELECT v,
               SUM(cp) OVER (ORDER BY v DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               SUM(m) OVER (ORDER BY v DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        FROM g),
    pr AS (
        SELECT v, tp / CAST(pp AS DOUBLE) AS prec, tp / CAST(tot.np AS DOUBLE) AS rec,
               LAG(tp, 1, 0) OVER (ORDER BY v DESC) / CAST(tot.np AS DOUBLE) AS rec_prev
        FROM c, tot),
    f1 AS (SELECT v, ROUND(2.0 * prec * rec / NULLIF(prec + rec, 0), 9) AS f1 FROM pr)
    SELECT (SELECT SUM((rec - rec_prev) * prec) FROM pr),
           (SELECT MAX(f1) FROM f1),
           (SELECT MIN(v) FROM f1 WHERE f1 = (SELECT MAX(f1) FROM f1))
"""


@settings(max_examples=60, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 6), st.booleans()), min_size=2, max_size=60
    )
)
def test_pr_auc_spelling_equals_scalar_sweep(pts):
    assume(any(y for _, y in pts))  # at least one positive
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (v INT, y BOOLEAN)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    pr_auc, best_f1, best_t = con.execute(_PR_SQL).fetchone()
    con.close()
    np_pos = sum(1 for _, y in pts if y)
    thresholds = sorted({v for v, _ in pts}, reverse=True)
    tp = pp = 0
    rec_prev = 0.0
    exp_auc = 0.0
    f1s = []
    for t in thresholds:
        tp += sum(1 for v, y in pts if v == t and y)
        pp += sum(1 for v, _ in pts if v == t)
        prec, rec = tp / pp, tp / np_pos
        exp_auc += (rec - rec_prev) * prec
        rec_prev = rec
        f1s.append(
            (round(2 * prec * rec / (prec + rec), 9) if prec + rec else None, t)
        )
    exp_best = max(f for f, _ in f1s if f is not None)
    exp_t = min(t for f, t in f1s if f == exp_best)
    assert abs(pr_auc - exp_auc) < 1e-12
    assert best_f1 == exp_best
    assert best_t == exp_t


# ---------------------------------------------------------------------------
# q337: Wasserstein distinct-value spelling == merged-grid CDF integral
# ---------------------------------------------------------------------------

_W1_SQL = """
    WITH g AS (
        SELECT v, count_if(a) AS ca, count_if(NOT a) AS cb FROM pts GROUP BY v),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g),
    c AS (
        SELECT v,
               SUM(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
               SUM(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb,
               LEAD(v) OVER (ORDER BY v) AS v_next
        FROM g)
    SELECT SUM(abs(c.cca / CAST(tot.na AS DOUBLE) - c.ccb / CAST(tot.nb AS DOUBLE))
               * (c.v_next - c.v))
    FROM c, tot WHERE c.v_next IS NOT NULL
"""


@settings(max_examples=60, deadline=None)
@given(
    a=st.lists(st.integers(0, 10), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 10), min_size=1, max_size=40),
)
def test_wasserstein_spelling_equals_cdf_integral(a, b):
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (v INT, a BOOLEAN)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?)",
        [(v, True) for v in a] + [(v, False) for v in b],
    )
    got = con.execute(_W1_SQL).fetchone()[0]
    con.close()
    grid = sorted(set(a) | set(b))
    expected = 0.0
    for lo, hi in zip(grid, grid[1:]):
        fa = sum(1 for v in a if v <= lo) / len(a)
        fb = sum(1 for v in b if v <= lo) / len(b)
        expected += abs(fa - fb) * (hi - lo)
    if len(grid) == 1:
        assert got is None  # single shared support point: zero-width integral
    else:
        assert abs(got - expected) < 1e-12
        # W1 for integer distributions also equals the mean-sorted-quantile
        # gap when sizes match -- cross-check on that case
        if len(a) == len(b):
            q = sum(abs(x - y) for x, y in zip(sorted(a), sorted(b))) / len(a)
            assert abs(expected - q) < 1e-9
