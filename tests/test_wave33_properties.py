"""Hypothesis pins for the wave-33 SQL spellings (DuckDB-only, scalar
python references) -- adversarial inputs the fixtures cannot plant: PAV on
anti-monotone and constant bin profiles, KMV at the exact sub-k boundary,
Theil-Sen with heavy slope ties."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _pav_minimax_sql(bins):
    """Run the registered q353 minimax lattice over explicit (band, n, s)
    rows and return the fitted rates in band order."""
    con = duckdb.connect()
    con.execute("CREATE TABLE b (band BIGINT, n BIGINT, s BIGINT)")
    con.executemany("INSERT INTO b VALUES (?, ?, ?)", bins)
    got = con.execute(
        """
        WITH p AS (
            SELECT band, n, s,
                   SUM(n) OVER (ORDER BY band) AS cn,
                   SUM(s) OVER (ORDER BY band) AS cs
            FROM b),
        pr AS (
            SELECT a.band AS i, c.band AS j,
                   CAST(c.cs - (a.cs - a.s) AS DOUBLE) / (c.cn - (a.cn - a.n)) AS avg_ij
            FROM p a JOIN p c ON a.band <= c.band),
        lo AS (
            SELECT pr.i, k.band AS k, MIN(pr.avg_ij) AS m
            FROM pr JOIN p k ON pr.i <= k.band AND k.band <= pr.j
            GROUP BY pr.i, k.band)
        SELECT k, MAX(m) FROM lo GROUP BY k ORDER BY k
        """
    ).fetchall()
    con.close()
    return [v for _, v in got]


def _pav_pool(ns, ss):
    stack: list[list[float]] = []
    for n, s in zip(ns, ss):
        stack.append([n, s])
        while len(stack) >= 2 and (
            stack[-2][1] / stack[-2][0] >= stack[-1][1] / stack[-1][0]
        ):
            n2, s2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
    out = []
    i = 0
    for n, s in stack:
        acc = 0
        while acc < n:
            acc += ns[i]
            out.append(s / n)
            i += 1
    return out


@settings(max_examples=80, deadline=None)
@given(
    bins=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0] + t[1], t[1])  # n >= s >= 0
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pav_minimax_equals_classic_pooling(bins):
    """The q353 minimax lattice (max_{i<=k} min_{j>=k} pooled avg) must
    equal the classic PAV pooling algorithm on every profile, including
    strictly decreasing (full pool) and constant (all ties) ones."""
    rows = [(k, n, s) for k, (n, s) in enumerate(bins)]
    got = _pav_minimax_sql(rows)
    ref = _pav_pool([n for n, _ in bins], [s for _, s in bins])
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert abs(g - r) < 1e-12
    assert got == sorted(got)  # isotonic by construction


@settings(max_examples=60, deadline=None)
@given(
    tokens=st.sets(st.integers(0, 10_000), min_size=1, max_size=80),
    k=st.integers(2, 12),
)
def test_kmv_bottom_k_merge_law(tokens, k):
    """Bottom-k of the union of two bottom-k sketches equals the bottom-k
    of the union -- incl. the sub-k boundary where a part holds its whole
    set.  Pure spelling-level pin of the q356 merge argument."""
    import hashlib

    us = {t: int(hashlib.md5(f"kmv9|{t}".encode()).hexdigest()[:15], 16) for t in tokens}
    a = {t for t in tokens if t % 2 == 0}
    b = tokens - a
    sk_a = sorted(us[t] for t in a)[:k]
    sk_b = sorted(us[t] for t in b)[:k]
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    direct = sorted(us[t] for t in tokens)[:k]
    assert merged == direct


# ---------------------------------------------------------------------------
# q357: Theil-Sen explicit middle-rows median spelling
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    ys=st.lists(st.integers(-1000, 1000), min_size=2, max_size=12, unique=False)
)
def test_theil_sen_middle_rows_median_spelling(ys):
    """The rn IN ((cnt+1)//2, (cnt+2)//2) + AVG spelling must equal the
    textbook median of pairwise slopes on adversarial tied inputs (many
    equal slopes, even and odd pair counts)."""
    days = list(range(len(ys)))
    con = duckdb.connect()
    con.execute("CREATE TABLE daily (d BIGINT, y BIGINT)")
    con.executemany("INSERT INTO daily VALUES (?, ?)", list(zip(days, ys)))
    got = con.execute(
        """
        WITH slopes AS (
            SELECT CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS s
            FROM daily a JOIN daily b ON a.d < b.d),
        sr AS (
            SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM slopes)
        SELECT AVG(s) FROM sr WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
        """
    ).fetchone()[0]
    con.close()
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    n = len(slopes)
    want = (slopes[(n - 1) // 2] + slopes[n // 2]) / 2
    assert abs(got - want) < 1e-12


# ---------------------------------------------------------------------------
# q365: systematic PPS hit-count conservation
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    ws=st.lists(st.integers(1, 10_000), min_size=1, max_size=40),
    k=st.integers(1, 50),
)
def test_pps_interval_hits_conserve_k(ws, k):
    """floor((cum - 0.5*step)/step) interval differences must allocate
    EXACTLY k selection points across the weight axis for any weight
    profile -- including a giant certainty unit that swallows many
    points -- and per-unit hits must be >= floor(w/step)."""
    total = sum(ws)
    step = total / k
    cum = 0
    hits = []
    import math as m

    for w in ws:
        cum += w
        hi = m.floor((cum - 0.5 * step) / step)
        lo = m.floor((cum - w - 0.5 * step) / step)
        hits.append(hi - lo)
    assert sum(hits) == k
    for w, h in zip(ws, hits):
        assert h >= m.floor(w / step) - 1e-9
        assert h <= w / step + 1
