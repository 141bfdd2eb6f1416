"""Hypothesis pins for the wave-28/30/32 SQL spellings (DuckDB-side,
scalar python references): adversarial graphs for the wedge join, budget
boundaries for the greedy fill, and skewed clusters for the purity
entropy."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# q349: Adamic-Adar wedge-join spelling
# ---------------------------------------------------------------------------

_AA_SQL = """
    WITH edges AS (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs),
    deg AS (SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY u),
    wedges AS (
        SELECT e1.u AS a, e2.v AS b, e1.v AS z
        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        WHERE e1.u < e2.v),
    scored AS (
        SELECT a, b, COUNT(*) AS cn, SUM(1.0 / ln(dz.d)) AS aa
        FROM wedges JOIN deg dz ON wedges.z = dz.n
        WHERE dz.d >= 2
        GROUP BY a, b)
    SELECT a, b, cn, aa FROM scored ORDER BY a, b
"""


@settings(max_examples=60, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 10), st.integers(0, 10)).filter(
            lambda e: e[0] != e[1]
        ),
        max_size=25,
    )
)
def test_adamic_adar_spelling_equals_bruteforce(edges):
    prs = sorted({(min(a, b), max(a, b)) for a, b in edges})
    con = duckdb.connect()
    con.execute("CREATE TABLE prs (d1 INT, d2 INT)")
    if prs:
        con.executemany("INSERT INTO prs VALUES (?, ?)", prs)
    got = {(a, b): (cn, aa) for a, b, cn, aa in con.execute(_AA_SQL).fetchall()}
    con.close()
    adj: dict[int, set[int]] = {}
    for a, b in prs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict[tuple, list] = {}
    for z, nb in adj.items():
        if len(nb) < 2:
            continue
        for a in nb:
            for b in nb:
                if a < b:
                    e = expected.setdefault((a, b), [0, 0.0])
                    e[0] += 1
                    e[1] += 1.0 / math.log(len(nb))
    assert set(got) == set(expected)
    for k, (cn, aa) in expected.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - aa) < 1e-12


# ---------------------------------------------------------------------------
# q346: greedy fill spelling -- budget conservation + monotone prefix
# ---------------------------------------------------------------------------

_FILL_SQL = """
    WITH tot AS (SELECT SUM(tokens) AS total FROM src),
    ranked AS (
        SELECT name, tokens, quality,
               SUM(tokens) OVER (ORDER BY quality DESC, name
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM src),
    b AS (SELECT (total // 1000000) * {ppm}
                 + ((total % 1000000) * {ppm}) // 1000000 AS budget FROM tot)
    SELECT name, tokens, cum,
           CASE WHEN cum <= b.budget THEN 1.0
                WHEN cum - tokens >= b.budget THEN 0.0
                ELSE (b.budget - (cum - tokens)) / CAST(tokens AS DOUBLE) END,
           b.budget
    FROM ranked, b ORDER BY quality DESC, name
"""


@settings(max_examples=60, deadline=None)
@given(
    srcs=st.lists(
        st.tuples(st.integers(1, 10_000_000), st.integers(0, 100)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t,
    ),
    ppm=st.integers(0, 1_000_000),
)
def test_greedy_fill_conserves_budget(srcs, ppm):
    rows = [(f"s{i}", tk, q) for i, (tk, q) in enumerate(srcs)]
    con = duckdb.connect()
    con.execute("CREATE TABLE src (name VARCHAR, tokens BIGINT, quality INT)")
    con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
    got = con.execute(_FILL_SQL.format(ppm=ppm)).fetchall()
    con.close()
    total = sum(tk for _, tk, _ in rows)
    budget = (total // 1_000_000) * ppm + ((total % 1_000_000) * ppm) // 1_000_000
    assert budget == total * ppm // 1_000_000  # the overflow-safe split is exact
    filled = sum(tk * frac for _, tk, _, frac, _ in got)
    assert abs(filled - budget) < 1e-6 * max(total, 1)
    # take fractions are monotone non-increasing down the quality ranking
    fracs = [frac for _, _, _, frac, _ in got]
    assert all(x >= y - 1e-12 for x, y in zip(fracs, fracs[1:]))
    assert got[0][4] == budget


# ---------------------------------------------------------------------------
# q352: purity/entropy spelling on adversarial cluster compositions
# ---------------------------------------------------------------------------

_PURITY_SQL = """
    WITH tot AS (SELECT cluster_id, SUM(c) AS n FROM m GROUP BY cluster_id)
    SELECT m.cluster_id, MAX(tot.n), COUNT(*),
           ROUND(MAX(m.c) / CAST(MAX(tot.n) AS DOUBLE), 6),
           ROUND(SUM(-(m.c / CAST(tot.n AS DOUBLE))
                     * ln(m.c / CAST(tot.n AS DOUBLE))), 6) + 0.0
    FROM m JOIN tot ON m.cluster_id = tot.cluster_id
    GROUP BY m.cluster_id ORDER BY m.cluster_id
"""


@settings(max_examples=60, deadline=None)
@given(
    clusters=st.dictionaries(
        st.integers(0, 5),
        st.lists(st.integers(1, 20), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )
)
def test_purity_entropy_spelling_equals_scalar(clusters):
    rows = [
        (cid, f"src{j}", c)
        for cid, counts in clusters.items()
        for j, c in enumerate(counts)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE m (cluster_id INT, source VARCHAR, c BIGINT)")
    con.executemany("INSERT INTO m VALUES (?, ?, ?)", rows)
    got = {r[0]: r[1:] for r in con.execute(_PURITY_SQL).fetchall()}
    con.close()
    for cid, counts in clusters.items():
        n = sum(counts)
        purity = round(max(counts) / n, 6)
        ent = round(sum(-(c / n) * math.log(c / n) for c in counts), 6) + 0.0
        nm, ns, p, e = got[cid]
        assert (nm, ns) == (n, len(counts))
        assert p == purity
        assert e == ent
        # pure cluster => entropy exactly 0 and never "-0"
        if len(counts) == 1:
            assert e == 0.0 and math.copysign(1.0, e) == 1.0
