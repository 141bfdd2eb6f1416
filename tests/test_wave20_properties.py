"""Property-based pin for the wave-20 gaps-and-islands spelling.

q308/q312's island reconstruction is the same two-window SQL in both engines
(prev-max-end break flag, running-sum island id).  The fixture test proves
engine/oracle agreement on the corpus; this additionally proves the SPELLING
itself against a scalar interval merger on adversarial generated position
sets (duplicates across docs, touching/overlapping/nested intervals, single
positions) -- if the window phrasing mishandled any adjacency case, both
engines would agree on the same wrong answer and the fixture oracle would
never notice.  DuckDB executes the spelling here (no Spark session needed);
the Spark side is the structurally identical plan pinned by
tests/test_wave20.py's full-corpus scalar re-derivation.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=60, deadline=None)

_ISLAND_SQL = """
    WITH dup AS (SELECT * FROM positions),
    marked AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(MAX(pos + {w}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                    THEN 1 ELSE 0 END AS brk
        FROM dup),
    isl AS (
        SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                              ) AS island_id
        FROM marked),
    per_island AS (
        SELECT doc_id, island_id, MIN(pos) AS s, MAX(pos) + {w} AS e
        FROM isl GROUP BY doc_id, island_id)
    SELECT doc_id,
           COUNT(*) AS n_islands,
           MAX(e - s + 1) AS longest_span,
           SUM(e - s + 1) AS covered_tokens
    FROM per_island GROUP BY doc_id ORDER BY doc_id
"""


def _scalar_merge(positions, width):
    """Reference interval merger: [p, p+width] per position, merge
    overlapping-or-adjacent."""
    islands = []
    s = e = None
    for p in sorted(positions):
        if s is None:
            s, e = p, p + width
        elif p <= e + 1:
            e = max(e, p + width)
        else:
            islands.append((s, e))
            s, e = p, p + width
    if s is not None:
        islands.append((s, e))
    return islands


@_SETTINGS
@given(
    docs=st.lists(
        st.sets(st.integers(1, 60), min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    ),
    width=st.integers(0, 6),
)
def test_island_sql_spelling_equals_scalar_merge(docs, width):
    con = duckdb.connect()
    rows = [(i, p) for i, ps in enumerate(docs) for p in ps]
    con.execute("CREATE TABLE positions (doc_id INT, pos INT)")
    con.executemany("INSERT INTO positions VALUES (?, ?)", rows)
    got = con.execute(_ISLAND_SQL.format(w=width)).fetchall()
    con.close()
    assert len(got) == len(docs)
    for doc_id, n_islands, longest, covered in got:
        islands = _scalar_merge(docs[doc_id], width)
        spans = [hi - lo + 1 for lo, hi in islands]
        assert n_islands == len(islands)
        assert longest == max(spans)
        assert covered == sum(spans)
        # islands are disjoint and non-adjacent by construction
        flat = sorted(islands)
        for (s1, e1), (s2, _) in zip(flat, flat[1:]):
            assert s2 > e1 + 1


_PARETO_SQL = """
    WITH by_ppm AS (SELECT ppm, MAX(tok) AS max_tok FROM pts GROUP BY ppm),
    front_ppm AS (
        SELECT ppm, max_tok,
               COALESCE(MAX(max_tok) OVER (ORDER BY ppm DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) AS better_q_tok
        FROM by_ppm)
    SELECT p.id FROM pts p JOIN front_ppm f
      ON p.ppm = f.ppm AND p.tok = f.max_tok
    WHERE f.max_tok > f.better_q_tok
"""


@_SETTINGS
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(1, 8)), min_size=1, max_size=40
    )
)
def test_pareto_sql_spelling_equals_naive_dominance(pts):
    """q317's 2-D reduction (group-max per quality level + running max over
    descending quality) must equal the O(n^2) dominance definition on
    adversarial point sets -- in particular when several points tie on BOTH
    axes (all of them qualify: domination needs one strict axis) and when a
    strictly-better point shares one axis value."""
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (id INT, ppm INT, tok INT)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?, ?)", [(i, p, t) for i, (p, t) in enumerate(pts)]
    )
    got = {r[0] for r in con.execute(_PARETO_SQL).fetchall()}
    con.close()
    expected = set()
    for i, (pi, ti) in enumerate(pts):
        dominated = any(
            pj >= pi and tj >= ti and (pj > pi or tj > ti)
            for j, (pj, tj) in enumerate(pts)
            if j != i
        )
        if not dominated:
            expected.add(i)
    assert got == expected


def _lpa_rounds_sql(rounds):
    sql = """
    WITH edges AS MATERIALIZED (
        SELECT u, v FROM g UNION ALL SELECT v, u FROM g),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges)"""
    prev = "l0"
    for r in range(1, rounds + 1):
        sql += f""",
    l{r} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT e.u AS node, l.label AS label, COUNT(*) AS c,
                   ROW_NUMBER() OVER (PARTITION BY e.u
                                      ORDER BY COUNT(*) DESC, l.label) AS rn
            FROM edges e JOIN {prev} l ON e.v = l.node
            GROUP BY e.u, l.label)
        WHERE rn = 1)"""
        prev = f"l{r}"
    return sql + f"\n    SELECT node, label FROM {prev} ORDER BY node"


@_SETTINGS
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    ),
    rounds=st.integers(1, 4),
)
def test_lpa_sql_spelling_equals_scalar_rounds(edges, rounds):
    """q319's unrolled-round spelling must equal a scalar synchronous LPA
    on arbitrary graphs -- especially where a node's neighbor labels tie in
    count (min label must win) and where parallel edges collapse (the set
    strategy guarantees simple edges; u-v and v-u both present still count
    each direction once per round, same as the UNION ALL doubling)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE g (u INT, v INT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", sorted(edges))
    got = dict(con.execute(_lpa_rounds_sql(rounds)).fetchall())
    con.close()
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            counts = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = new
    assert got == labels


def _peel_rounds_sql(rounds):
    sql = """
    WITH e0 AS MATERIALIZED (SELECT u, v FROM g UNION ALL SELECT v, u FROM g)"""
    prev = "e0"
    for r in range(1, rounds + 1):
        sql += f""",
    k{r} AS (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= 2),
    e{r} AS MATERIALIZED (
        SELECT e.u, e.v FROM {prev} e
        JOIN k{r} a ON e.u = a.u JOIN k{r} b ON e.v = b.u)"""
        prev = f"e{r}"
    return sql + f"\n    SELECT u, COUNT(*) FROM {prev} GROUP BY u ORDER BY u"


@_SETTINGS
@given(
    edges=st.sets(
        # canonical u < v pairs: the real input (minhash_lsh_pairs /
        # _jaccard_oracle) emits d1 < d2 only, so (v, u) mirrors -- which
        # would become multiplicity-2 edges under the UNION ALL doubling --
        # cannot occur
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] < e[1]),
        min_size=1,
        max_size=40,
    ),
    rounds=st.integers(1, 5),
)
def test_peel_sql_spelling_equals_scalar_peel(edges, rounds):
    """q321's unrolled degree-prune rounds must equal scalar synchronous
    peeling on arbitrary simple graphs for ANY fixed round count --
    including graphs that have not converged yet (chains) and ones that
    empty out."""
    con = duckdb.connect()
    con.execute("CREATE TABLE g (u INT, v INT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", sorted(edges))
    got = dict(con.execute(_peel_rounds_sql(rounds)).fetchall())
    con.close()
    es = set()
    for u, v in edges:
        es.add((u, v))
        es.add((v, u))
    for _ in range(rounds):
        deg = {}
        for u, _ in es:
            deg[u] = deg.get(u, 0) + 1
        keep = {u for u, d in deg.items() if d >= 2}
        es = {(u, v) for u, v in es if u in keep and v in keep}
    expected = {}
    for u, _ in es:
        expected[u] = expected.get(u, 0) + 1
    assert got == expected
