"""Semantic pins for the wave-17 operators: the invariants that make each
design correct, exercised beyond the oracle value-match.

- The cluster-safe split is leakage-free BY CONSTRUCTION (leaked_groups = 0
  always), while the naive split demonstrably leaks on this corpus.
- BH-adjusted q-values are monotone in p and never below the raw p-value
  (the step-up procedure's defining properties).
- Simplified silhouette stays in [-1, 1] and Davies-Bouldin components are
  positive.
- The curriculum selection is a prefix of the quality ranking (greedy
  take-while, never a gap), and the budget is respected.
- ACF at any lag stays in [-1, 1]; lag-k pair counts shrink with k.
- Every n-gram is novel in exactly one decile per source: novel_ngrams sums
  to the distinct-gram count, and instances sum to the corpus gram total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.queries.wave17 import (
    q292_dsir_importance,
    q286_fdr_bh_correction,
    q287_cluster_quality,
    q288_leakage_safe_split,
    q289_token_budget_curriculum,
    q290_acf_lags,
    q291_ngram_novelty,
)


def test_cluster_safe_split_never_leaks(spark, sf_dir):
    rows = {r["scheme"]: r for r in q288_leakage_safe_split(spark, sf_dir).collect()}
    safe, naive = rows["cluster_safe"], rows["naive"]
    assert safe["leaked_groups"] == 0, "cluster-safe split must be leakage-free"
    # Identical duplicate-group census under both schemes (the sf0.001
    # fixture has no exact-dup texts -- the leak contrast below only
    # materializes where duplicates exist, e.g. sf0.01+).
    assert safe["dup_groups"] == naive["dup_groups"]
    assert safe["n_train"] + safe["n_val"] == naive["n_train"] + naive["n_val"]
    if naive["dup_groups"] > 200:
        # With hundreds of 2+-doc groups under an 80/20 split, at least one
        # group straddling the boundary is a statistical certainty -- the
        # contrast the report exists to show.
        assert naive["leaked_groups"] > 0


def test_bh_qvalues_dominate_p_and_are_monotone(spark, sf_dir):
    rows = q286_fdr_bh_correction(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert 0.0 <= r["p_value"] <= 1.0
        assert r["q_bh"] >= r["p_value"] - 1e-9, "BH can only inflate p"
        assert r["q_bh"] <= 1.0
    by_p = sorted(rows, key=lambda r: (r["p_value"], r["event_type"]))
    qs = [r["q_bh"] for r in by_p]
    assert qs == sorted(qs), "adjusted q-values must be monotone in p"


def test_cluster_quality_bounds(spark, sf_dir):
    rows = q287_cluster_quality(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert -1.0 <= r["avg_silhouette"] <= 1.0
        assert r["scatter"] > 0.0
        assert r["db_component"] > 0.0
        assert r["n_points"] > 0


def test_curriculum_selection_is_a_ranking_prefix(spark, sf_dir):
    rows = q289_token_budget_curriculum(spark, sf_dir).orderBy("rnk").collect()
    flags = [r["selected"] for r in rows]
    # prefix property: once deselected, never selected again
    assert flags == sorted(flags, reverse=True)
    total = sum(r["tokens"] for r in rows)
    picked = sum(r["tokens"] for r in rows if r["selected"])
    assert picked * 10 <= total * 6, "selected mass exceeds the 60% budget"
    # cum_tokens is the running sum of the ranking
    run = 0
    for r in rows:
        run += r["tokens"]
        assert r["cum_tokens"] == run


def test_acf_bounds_and_pair_counts(spark, sf_dir):
    rows = q290_acf_lags(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
    by_type: dict[str, dict[int, int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["lag"]] = r["n_pairs"]
    for lags in by_type.values():
        assert lags[1] >= lags[2] >= lags[3], "lag-k loses k boundary pairs"


def test_ngram_novelty_partitions_the_gram_census(spark, sf_dir):
    from sparkstreaming_quickstart_spark.functions.text import tokens
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    rows = q291_ngram_novelty(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    grams = d.select(
        "source",
        F.explode(
            F.when(
                F.size(t) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 2),
                    lambda i: F.concat_ws(" ", F.slice(t, i, 3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ngram"),
    )
    census = {
        r["source"]: (r["inst"], r["dst"])
        for r in grams.groupBy("source")
        .agg(F.count("*").alias("inst"), F.countDistinct("ngram").alias("dst"))
        .collect()
    }
    agg: dict[str, list[int]] = {}
    for r in rows:
        a = agg.setdefault(r["source"], [0, 0])
        a[0] += r["instances"]
        a[1] += r["novel_ngrams"]
    assert set(agg) == set(census)
    for src, (inst, novel) in agg.items():
        assert inst == census[src][0], f"{src}: instance total mismatch"
        assert novel == census[src][1], f"{src}: every distinct gram is novel exactly once"


def test_wave17_float_paths_are_partition_order_invariant(spark, sf_dir):
    """The wave-17 queries that sum floats (centroid averages, log-ratio
    sums, bucket-mean corr) must produce identical normalized results under
    different shuffle partitionings -- the partition-order sensitivity that
    the ROUND-6 discipline claims to absorb, exercised directly."""
    from sparkstreaming_quickstart_spark.oracle import _normalize

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for n in ("5", "27"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(
                {
                    fn.__name__: _normalize(fn(spark, sf_dir).toPandas())
                    for fn in (
                        q287_cluster_quality,
                        q289_token_budget_curriculum,
                        q290_acf_lags,
                        q292_dsir_importance,
                    )
                }
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    a, b = results
    for name in a:
        assert a[name] == b[name], f"{name} drifts with shuffle partitioning"


def test_kcenter_radius_is_monotone_nonincreasing(spark, sf_dir):
    """Farthest-point property: each added center covers the previous worst
    point, so the selection radius can only shrink (or stay) as k grows --
    and the selected ids are distinct."""
    from sparkstreaming_quickstart_spark.queries.wave17 import q293_kcenter_coreset

    rows = q293_kcenter_coreset(spark, sf_dir).orderBy("step").collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)), "a center was selected twice"
    radii = [r["radius"] for r in rows[1:]]
    assert all(r > 0 for r in radii)
    assert all(a >= b for a, b in zip(radii, radii[1:])), (
        "covering radius must be non-increasing in k"
    )


def test_kanon_level_is_minimal_and_flags_consistent(spark, sf_dir):
    """The chosen generalization width must be the FIRST lattice level whose
    classes all reach k (or the coarsest); at_risk/l_diverse flags must
    restate the counts."""
    from pyspark.sql import functions as F

    from sparkstreaming_quickstart_spark.queries.wave17 import (
        _KANON_K,
        _KANON_L,
        _KANON_WIDTHS,
        q294_k_anonymity_generalize,
    )
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    rows = q294_k_anonymity_generalize(spark, sf_dir).collect()
    width = rows[0]["bucket_width"]
    for r in rows:
        assert r["at_risk"] == (r["n_docs"] < _KANON_K)
        assert r["l_diverse"] == (r["n_sources"] >= _KANON_L)
    d = load_table(spark, sf_dir, "documents")

    def violations(w):
        return (
            d.groupBy("lang", (F.col("n_chars") / w).cast("long"))
            .count()
            .filter(F.col("count") < _KANON_K)
            .count()
        )

    finer = [w for w in _KANON_WIDTHS if w < width]
    assert all(violations(w) > 0 for w in finer), (
        "a finer level already satisfied k; the search is not minimal"
    )
    if width != _KANON_WIDTHS[-1]:
        assert violations(width) == 0
