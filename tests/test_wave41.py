"""Round-13 pins.

Covers the round-12 ADVICE hardening (half-away rounding in the value-
emitting pair kernel, tag_dictionary input validation + NULL-corpus branch
agreement) and the round-13 additions as they land.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from sparkstreaming_quickstart_spark.operators.similarity import (
    _round_half_away,
)


def test_round_half_away_matches_duckdb_at_half_boundaries():
    """The pair kernel emits ROUND'd cosines, so its rounding must be the
    oracle's: DuckDB ROUND is half-AWAY-from-zero while np.round is
    banker's.  Pin on constructed representable half-integers at the 9th
    digit -- where np.round provably diverges (228/500 on this seed) --
    plus a random sweep and the sign/zero/non-finite edges."""
    rng = np.random.default_rng(0)
    ks = rng.integers(0, 2_000_000_000, 500)
    halves = [float((2 * k + 1) / 2 / 1e9) for k in ks]
    vals = (
        halves
        + [-v for v in halves]
        + list(rng.uniform(-1, 1, 2000))
        + [0.0, -0.0, 1.0, -1.0, 0.5e-9, -0.5e-9, 1.5e-9]
    )
    got = _round_half_away(np.array(vals), 9)
    con = duckdb.connect()
    want = np.array(
        [r[0] for r in con.execute(
            "SELECT round(v, 9) FROM (SELECT unnest(?) AS v)", [vals]
        ).fetchall()]
    )
    bad = np.nonzero(got != want)[0]
    assert len(bad) == 0, [(vals[i], got[i], want[i]) for i in bad[:5]]
    # non-vacuity: np.round must actually disagree on this construction
    assert (np.round(np.array(halves), 9) != want[: len(halves)]).any()
    # NaN/inf pass through (try_divide upstream already nulls 0/0)
    weird = _round_half_away(np.array([np.nan, np.inf, -np.inf]), 9)
    assert np.isnan(weird[0]) and weird[1] == np.inf and weird[2] == -np.inf


def test_tag_dictionary_rejects_malformed_input(spark):
    """Empty terms (ANSI div-by-zero in the fast branch) and duplicate
    (term, category) entries (double-counted in the fast branch, two rows
    in the automaton branch) are rejected up front so the two branches can
    never diverge on them."""
    from sparkstreaming_quickstart_spark.operators.text_scan import (
        tag_dictionary,
    )

    d = spark.createDataFrame([(1, "abc")], "id long, text string")
    with pytest.raises(ValueError, match="empty term"):
        tag_dictionary(d, "text", [("", "cat")])
    with pytest.raises(ValueError, match="duplicate"):
        tag_dictionary(d, "text", [("a", "x"), ("a", "x")])


def test_tag_dictionary_branches_agree_on_null_corpus(spark):
    """An all-NULL (and a mixed-NULL) text corpus must produce identical
    rows from the JVM replace-diff branch and the automaton branch --
    round-12 ADVICE found NULL max_occ fast-path vs 0 slow-path."""
    from sparkstreaming_quickstart_spark.operators.text_scan import (
        tag_dictionary,
    )

    dic = [("ab", "x"), ("zz", "y")]
    for rows in ([(1, None), (2, None)], [(1, None), (2, "abab zz")]):
        d = spark.createDataFrame(rows, "id long, text string")
        fast = [tuple(r) for r in tag_dictionary(d, "text", dic).collect()]
        slow = [
            tuple(r)
            for r in tag_dictionary(d, "text", dic, crossover=1)
            .orderBy("term")
            .collect()
        ]
        assert fast == slow, (rows, fast, slow)
