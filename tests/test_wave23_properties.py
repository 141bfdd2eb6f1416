"""Hypothesis pins for the wave-23/24 SQL spellings (DuckDB-side, scalar
python references).  The Spark-vs-oracle equality is proven by the value
oracles at three scale factors; these pins prove the SPELLINGS implement
the intended scalar semantics on adversarial inputs the fixtures cannot
plant — tied cosines, degenerate graphs, heavy rank ties, even/odd median
positions."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# q322: per-node triangle credit + clustering coefficient spelling
# ---------------------------------------------------------------------------

_CLUSTERING_SQL = """
    WITH edges AS (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs),
    tri AS (
        SELECT ab.d1 AS a, ab.d2 AS b, bc.d2 AS c
        FROM prs ab JOIN prs bc ON ab.d2 = bc.d1
        JOIN prs ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
    node_tri AS (
        SELECT n, COUNT(*) AS t FROM (
            SELECT a AS n FROM tri UNION ALL
            SELECT b FROM tri UNION ALL SELECT c FROM tri)
        GROUP BY n),
    deg AS (SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY u)
    SELECT deg.n, deg.d, COALESCE(node_tri.t, 0),
           ROUND(CASE WHEN deg.d >= 2
                      THEN 2.0 * COALESCE(node_tri.t, 0) / (deg.d * (deg.d - 1))
                      ELSE 0.0 END, 6) + 0.0
    FROM deg LEFT JOIN node_tri ON deg.n = node_tri.n
    ORDER BY deg.n
"""


@settings(max_examples=60, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] != e[1]
        ),
        max_size=30,
    )
)
def test_clustering_spelling_equals_bruteforce(edges):
    prs = sorted({(min(a, b), max(a, b)) for a, b in edges})
    con = duckdb.connect()
    con.execute("CREATE TABLE prs (d1 INT, d2 INT)")
    if prs:
        con.executemany("INSERT INTO prs VALUES (?, ?)", prs)
    got = con.execute(_CLUSTERING_SQL).fetchall()
    con.close()
    adj: dict[int, set[int]] = {}
    for a, b in prs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert len(got) == len(adj)
    for n, d, t, c in got:
        nb = adj[n]
        assert d == len(nb)
        tri = sum(1 for u in nb for v in nb if u < v and v in adj[u])
        assert t == tri
        expect = round(2.0 * tri / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert c == expect + 0.0


# ---------------------------------------------------------------------------
# q335: distinct-value average-rank Kruskal-Wallis spelling
# ---------------------------------------------------------------------------

_KW_SQL = """
    WITH g AS (SELECT v, grp, COUNT(*) AS c FROM vals GROUP BY v, grp),
    m AS (SELECT v, SUM(c) AS m FROM g GROUP BY v),
    r AS (
        SELECT v, m,
               SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS before
        FROM m),
    rl AS (
        SELECT g.grp, SUM(g.c) AS n_l,
               SUM(g.c * (r.before + (r.m + 1) / 2.0)) AS r_l
        FROM g JOIN r ON g.v = r.v GROUP BY g.grp),
    tot AS (SELECT SUM(n_l) AS nn, SUM(r_l * r_l / n_l) AS s FROM rl),
    ties AS (SELECT SUM(CAST(m AS DOUBLE) * m * m - m) AS tsum FROM m)
    SELECT nn, 12.0 / (nn * (nn + 1.0)) * s - 3.0 * (nn + 1.0), tsum
    FROM tot, ties
"""


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 3)), min_size=2, max_size=60
    )
)
def test_kruskal_wallis_spelling_equals_scalar_ranks(vals):
    con = duckdb.connect()
    con.execute("CREATE TABLE vals (v INT, grp INT)")
    con.executemany("INSERT INTO vals VALUES (?, ?)", vals)
    nn_sql, h_sql, tsum_sql = con.execute(_KW_SQL).fetchone()
    con.close()
    # scalar average ranks over the raw rows
    svals = sorted(range(len(vals)), key=lambda i: vals[i][0])
    ranks = [0.0] * len(vals)
    i = 0
    tie_sum = 0.0
    while i < len(svals):
        j = i
        while j < len(svals) and vals[svals[j]][0] == vals[svals[i]][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for idx in svals[i:j]:
            ranks[idx] = avg
        t = j - i
        tie_sum += t**3 - t
        i = j
    nn = len(vals)
    groups: dict[int, list[float]] = {}
    for (v, g), r in zip(vals, ranks):
        groups.setdefault(g, []).append(r)
    h = 12.0 / (nn * (nn + 1.0)) * sum(
        sum(rs) ** 2 / len(rs) for rs in groups.values()
    ) - 3.0 * (nn + 1.0)
    assert nn_sql == nn
    assert tsum_sql == tie_sum
    assert abs(h_sql - h) < 1e-9


# ---------------------------------------------------------------------------
# q334: quantile_disc median == smallest value at cumulative fraction >= 0.5
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60))
def test_quantile_disc_median_is_lower_median(vals):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    got = con.execute("SELECT quantile_disc(v, 0.5) FROM t").fetchone()[0]
    con.close()
    s = sorted(vals)
    assert got == float(s[math.ceil(0.5 * len(s)) - 1])


# ---------------------------------------------------------------------------
# q329: mutual-kNN oracle spelling (round-9 ties, zero-norm exclusion)
# ---------------------------------------------------------------------------

_KNN_SQL = """
    WITH e AS (
        SELECT vec_id, CAST(v AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(v AS DOUBLE[]), CAST(v AS DOUBLE[]))) AS nrm
        FROM vecs),
    valid AS (SELECT * FROM e WHERE nrm > 0),
    ranked AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) DESC,
                            b.vec_id) AS rn
        FROM valid a JOIN valid b ON a.vec_id <> b.vec_id),
    knn AS (SELECT i, j FROM ranked WHERE rn <= {k}),
    mutual AS (
        SELECT k1.i, k1.j FROM knn k1 JOIN knn k2 ON k1.i = k2.j AND k1.j = k2.i),
    mdeg AS (
        SELECT v.vec_id, COUNT(m.j) AS md
        FROM valid v LEFT JOIN mutual m ON v.vec_id = m.i
        GROUP BY v.vec_id)
    SELECT md, COUNT(*) FROM mdeg GROUP BY md ORDER BY md
"""


@settings(max_examples=40, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(st.integers(-3, 3), st.integers(-3, 3)), min_size=2, max_size=12
    ),
    k=st.integers(1, 4),
)
def test_mutual_knn_spelling_equals_bruteforce(vecs, k):
    """Small integer vectors force exact cosine TIES (collinear pairs), so
    the round-9 + vec_id tie-break path is actually exercised; zero
    vectors exercise the nrm > 0 exclusion."""
    con = duckdb.connect()
    con.execute("CREATE TABLE vecs (vec_id INT, v DOUBLE[])")
    con.executemany(
        "INSERT INTO vecs VALUES (?, ?)",
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)],
    )
    got = dict(con.execute(_KNN_SQL.format(k=k)).fetchall())
    con.close()
    valid = [
        (i, (a, b))
        for i, (a, b) in enumerate(vecs)
        if math.sqrt(a * a + b * b) > 0
    ]
    knn: dict[int, set[int]] = {}
    for i, (a, b) in valid:
        na = math.sqrt(a * a + b * b)
        scored = []
        for j, (c, d) in valid:
            if j == i:
                continue
            nb = math.sqrt(c * c + d * d)
            scored.append((-round((a * c + b * d) / (na * nb), 9), j))
        scored.sort()
        knn[i] = {j for _, j in scored[:k]}
    hist: dict[int, int] = {}
    for i, nb in knn.items():
        md = sum(1 for j in nb if i in knn[j])
        hist[md] = hist.get(md, 0) + 1
    assert got == hist


# ---------------------------------------------------------------------------
# q324: Cramer's V full-grid densify (empty cells still contribute (0-E)^2/E)
# ---------------------------------------------------------------------------


def _cramers_sql() -> str:
    from sparkstreaming_quickstart_spark.queries import all_queries

    return all_queries()["q324_cramers_v"].sql


@settings(max_examples=50, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3)), min_size=4, max_size=40
    ).filter(
        lambda rs: len({t for t, _ in rs}) >= 2 and len({b for _, b in rs}) >= 2
    )
)
def test_cramers_v_spelling_counts_empty_cells(rows):
    """The registered q324 SQL must match the numpy crosstab chi2 (which
    densifies to the FULL types x bands grid) even when some (type, band)
    cell has ZERO observations — the round-8 spelling dropped those cells'
    (0-E)^2/E contributions (round-9 advice fix).  Values land mid-band
    (band*50+25) so floor(value/50) is exact."""
    import numpy as np
    import pandas as pd

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [(f"t{t}", b * 50.0 + 25.0) for t, b in rows],
    )
    got = con.execute(_cramers_sql()).fetchone()
    con.close()
    ct = pd.crosstab(
        pd.Series([t for t, _ in rows]), pd.Series([b for _, b in rows])
    )
    o = ct.to_numpy().astype(np.float64)
    exp = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    chi2 = (((o - exp) ** 2) / exp).sum()
    n = int(o.sum())
    v = math.sqrt(chi2 / (n * min(o.shape[0] - 1, o.shape[1] - 1)))
    assert got[0] == n
    assert got[1] == o.shape[0]
    assert got[2] == o.shape[1]
    assert abs(got[3] - round(chi2, 6)) <= 2e-6
    assert abs(got[4] - round(v, 6)) <= 2e-6
