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
