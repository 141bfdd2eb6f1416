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


def test_nbits_rule_matches_duckdb_across_decades():
    """nbits_for (integer bit-twiddling, exact) == sql_nbits_expr (double
    ceil/log2) for every corpus size the rule could see, plus the exact
    bucket-count boundaries where a 1-ulp log2 error would flip the CEIL
    -- the wave-40 nlist pin applied to the hyperplane family."""
    from sparkstreaming_quickstart_spark.operators.similarity import (
        nbits_for,
        sql_nbits_expr,
    )

    con = duckdb.connect()
    for target, floor in [(1024, 4), (256, 8)]:
        expr = sql_nbits_expr(target, floor).replace("cnt", "n")
        rows = con.execute(
            f"SELECT n, {expr} FROM range(1, 300000) t(n)"
        ).fetchall()
        bad = [
            (n, got, nbits_for(n, target, floor))
            for n, got in rows
            if got != nbits_for(n, target, floor)
        ]
        assert not bad, (target, floor, bad[:5])
        edges = [
            v
            for k in range(1, 31)
            for v in ((1 << k) * target - 1, (1 << k) * target, (1 << k) * target + 1)
        ]
        rows = con.execute(
            f"SELECT n, {expr} FROM (SELECT unnest({edges}) AS n)"
        ).fetchall()
        bad = [
            (n, got, nbits_for(n, target, floor))
            for n, got in rows
            if got != nbits_for(n, target, floor)
        ]
        assert not bad, (target, floor, bad)


def test_formula_hyperplanes_bitwise_equal_to_sql():
    """adaptive_hyperplanes == the planes CTE double-for-double, and the
    offset stream never collides with the centroid stream (growing bits
    only APPENDS planes -- prefix property)."""
    from sparkstreaming_quickstart_spark.operators.similarity import (
        HP_MAX_BITS,
        adaptive_centroids,
        adaptive_hyperplanes,
        sql_adaptive_hyperplane_ctes,
    )

    dim = 64
    con = duckdb.connect()
    # pin all HP_MAX_BITS planes: splice a literal bit count in place of the
    # COUNT(*)-derived scalar (a count large enough to reach the cap would
    # need a 1e11-row range table; the bits RULE itself is pinned separately
    # above) -- the formula expr under test is untouched
    ctes = sql_adaptive_hyperplane_ctes(
        dim, src="e", target_bucket=256, floor_bits=8
    ).replace("(SELECT bits FROM hb)", str(HP_MAX_BITS))
    rows = con.execute(
        f"WITH e AS (SELECT 1), {ctes} SELECT i, w FROM planes ORDER BY i"
    ).fetchall()
    assert len(rows) == HP_MAX_BITS
    got = np.array([r[1] for r in rows])
    want = adaptive_hyperplanes(dim, HP_MAX_BITS)
    assert np.array_equal(got, want), np.argwhere(got != want)[:5]
    # prefix property + stream disjointness
    assert np.array_equal(adaptive_hyperplanes(dim, 4), want[:4])
    cents = adaptive_centroids(dim, 16)
    assert not np.isin(want[:, 0], cents[:, 0]).any()


def test_adaptive_buckets_engine_matches_oracle(spark, sf_dir):
    """The JVM sign-bit bucket expression over adaptive_hyperplanes
    reproduces the oracle's planes/bkt CTE assignment row-for-row on the
    real fixture (COUNT(*)-derived bit count on both sides)."""
    from pyspark.sql import functions as F

    from sparkstreaming_quickstart_spark.operators.similarity import (
        adaptive_hyperplanes,
        bucketize,
        nbits_for,
        sql_adaptive_bucket_cte,
        sql_adaptive_hyperplane_ctes,
    )
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    bits = nbits_for(e.count(), 256, 8)
    got = {
        (r["vec_id"], r["bucket"])
        for r in bucketize(
            e.select("vec_id", F.col("embedding").alias("v")),
            "v", 64, planes=adaptive_hyperplanes(64, bits),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = set(
        con.execute(
            f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                           FROM embeddings),
            {sql_adaptive_hyperplane_ctes(64, src="e", target_bucket=256, floor_bits=8)},
            {sql_adaptive_bucket_cte("e")}
            SELECT vec_id, bucket FROM bkt"""
        ).fetchall()
    )
    assert got == want


def test_panel_exact_topk_fold_values_bitwise_equals_jvm(spark, sf_dir):
    """panel_exact_topk(fold_values=True) must reproduce the JVM
    topk_cosine rows INCLUDING the emitted cosine values bit-for-bit
    (fold association + half-away rounding) -- the q65/q395 pin
    discipline for the q307 port, whose output averages cos_full."""
    from pyspark.sql import functions as F

    from sparkstreaming_quickstart_spark.operators.similarity import (
        panel_exact_topk,
        topk_cosine,
    )
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") % 50 == 0)
    want = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in topk_cosine(q, e, "vec_id", "v", "vec_id", "v", k=5).collect()
    }
    got = {
        tuple(r)
        for r in panel_exact_topk(
            e, "vec_id", "v", q, "vec_id", "v", k=5, fold_values=True
        ).collect()
    }
    assert got == want


def test_lockstep_scan_bordered_terms_and_packing():
    """The round-13 lockstep kernel's two count paths (np.unique for
    borderless terms, greedy loop for bordered) both equal str.count, and
    lane packing (docs >> lanes, separator resets, empty docs) preserves
    per-doc attribution."""
    from sparkstreaming_quickstart_spark.operators.text_scan import (
        AhoCorasick,
        AhoCorasickDense,
        _has_proper_border,
    )

    assert _has_proper_border(b"aa") and _has_proper_border(b"abab")
    assert not _has_proper_border(b"ab") and not _has_proper_border(b"a")
    terms = ["aa", "abab", "ab", "ba", "x"]
    texts = [
        "aaaa",            # "aa" x2 non-overlapping (3 raw matches)
        "ababab",          # "abab" greedy = 1, "ab" = 3, "ba" = 2
        "",                # empty doc
        "xaaxabab",        # mixed
        "a" * 100,         # long run: "aa" = 50
    ] * 7  # 35 docs
    dense = AhoCorasickDense(terms)
    classic = AhoCorasick(terms)
    for lanes in (1, 2, 3, 35, 4096):
        dis, tis, occ = dense.count_batch_sparse(texts, n_lanes=lanes)
        got = {(int(d), int(t)): int(c) for d, t, c in zip(dis, tis, occ)}
        want = {}
        for di, tx in enumerate(texts):
            for ti, c in enumerate(classic.count_nonoverlapping(tx)):
                if c:
                    want[(di, ti)] = c
            for ti, t in enumerate(terms):  # and the str.count ground truth
                assert tx.count(t) == classic.count_nonoverlapping(tx)[ti]
        assert got == want, lanes


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
