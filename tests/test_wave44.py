"""Round-13 optimization pins, second batch: restructures that removed
duplicate subtree evaluation (Spark re-executes a non-materialized subtree
once per consumer) must be VALUE-IDENTICAL to the join spellings they
replaced.  Each test replays the old spelling inline on inputs that include
the edge cases the rewrite could plausibly break (asymmetric edges, hot
posting lists, singleton buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _new_mutual_degree(knn, valid):
    """The round-13 q329 tail: canonical-pair groupBy, count == 2."""
    mutual_pairs = (
        knn.groupBy(F.least("i", "j").alias("a"), F.greatest("i", "j").alias("b"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 2)
    )
    endpoints = mutual_pairs.select(F.explode(F.array("a", "b")).alias("vec_id"))
    deg = endpoints.groupBy("vec_id").agg(F.count("*").alias("d"))
    return valid.join(deg, "vec_id", "left").select(
        "vec_id", F.coalesce("d", F.lit(0)).alias("md")
    )


def _old_mutual_degree(knn, valid):
    """The pre-round-13 q329 tail: self-join with the reversed edge list."""
    rev = knn.select(F.col("j").alias("i"), F.col("i").alias("j"))
    mutual = knn.join(rev, ["i", "j"])
    return (
        valid.join(mutual.withColumnRenamed("i", "vec_id"), "vec_id", "left")
        .groupBy("vec_id")
        .agg(F.count("j").alias("md"))
    )


def test_q329_mutual_via_canonical_count_matches_self_join(spark):
    # Directed kNN-style edges: each (i, j) unique, mix of mutual pairs
    # (1<->2, 3<->4), one-sided edges (1->3, 5->1, 6->2), an isolated node
    # (7) and a hub (2) with several incident mutual/one-sided edges.
    edges = [(1, 2), (2, 1), (3, 4), (4, 3), (1, 3), (5, 1), (6, 2), (2, 4), (4, 2)]
    knn = spark.createDataFrame(edges, "i long, j long")
    valid = spark.createDataFrame([(v,) for v in range(1, 8)], "vec_id long")
    old = sorted((r.vec_id, r.md) for r in _old_mutual_degree(knn, valid).collect())
    new = sorted((r.vec_id, r.md) for r in _new_mutual_degree(knn, valid).collect())
    assert new == old
    # and the expected values, by hand: mutual edges {1,2},{3,4},{2,4}
    assert new == [(1, 1), (2, 2), (3, 1), (4, 2), (5, 0), (6, 0), (7, 0)]


def test_q379_posting_groupby_matches_self_join(spark):
    from sparkstreaming_quickstart_spark.queries.wave38 import (
        _WIN_CAP,
        _WIN_MIN_SHARED,
    )

    # Distinct (doc, h) fingerprints: h=100 shared by a qualifying pair
    # multiple times is impossible (distinct), so n_shared accumulates
    # across DIFFERENT h values; h=999 is hotter than the cap and must be
    # dropped by BOTH spellings; h=5 is a singleton.
    rows = []
    for h in range(_WIN_MIN_SHARED + 1):  # docs 1,2 share min_shared+1 prints
        rows += [(1, 100 + h), (2, 100 + h)]
    rows += [(3, 100), (3, 101)]  # doc 3 shares 2 prints with 1 and 2
    rows += [(4, 5)]  # singleton fingerprint
    rows += [(d, 999) for d in range(1, _WIN_CAP + 2)]  # hot print > cap
    fp = spark.createDataFrame(rows, "doc_id long, h long").distinct()

    # old: df-filter + posting self-join
    kept = (
        fp.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter((F.col("c") >= 2) & (F.col("c") <= _WIN_CAP))
        .select("h")
    )
    fk = fp.join(kept, "h")
    a = fk.select(F.col("doc_id").alias("d1"), "h")
    b = fk.select(F.col("doc_id").alias("d2"), "h")
    old = (
        a.join(b, "h")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )

    # new: posting-list groupBy (the committed q379 tail)
    posts = (
        fp.groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= _WIN_CAP))
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    new = (
        posts.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )

    got_old = sorted((r.d1, r.d2, r.n_shared) for r in old.collect())
    got_new = sorted((r.d1, r.d2, r.n_shared) for r in new.collect())
    assert got_new == got_old
    assert got_old  # non-vacuous: the qualifying pair survived


def test_q329_kernel_runs_once_in_plan(spark, sf_dir):
    """The whole point of the q329 rewrite: exactly ONE MapInPandas node in
    the physical plan (the old self-join inlined the kernel subtree twice)."""
    from sparkstreaming_quickstart_spark.plans.inspect import explain_str
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        q329_mutual_knn_graph,
    )

    plan = explain_str(q329_mutual_knn_graph(spark, sf_dir), "simple")
    assert plan.count("MapInPandas") == 1


def test_q142_indoc_triangle_matches_self_join(spark, sf_dir):
    """The q142 pair expansion moved from a token-stream self-join to a
    packed dictionary-code aggregation; the decoded (w1, w2, c12) table and
    the top-20 cut must be identical (ids are assigned in ascending string
    order, so code order == (w1, w2) order)."""
    from sparkstreaming_quickstart_spark.functions.text import tokens
    from sparkstreaming_quickstart_spark.queries.traindata import q142_token_pmi
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("w"))
    a = tok.select("doc_id", F.col("w").alias("w1"))
    b = tok.select("doc_id", F.col("w").alias("w2"))
    old_pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    from pyspark.sql import Window

    unig = tok.groupBy("w").agg(F.count("*").alias("cw"))
    vids = unig.select(
        "w", F.row_number().over(Window.orderBy("w")).cast("long").alias("tid")
    )
    enc = (
        tok.join(F.broadcast(vids), "w")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("tid")).alias("ids"))
    )
    pair_codes = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.shiftleft(x, 31).bitwiseOR(y),
            ),
        )
    )
    codes = (
        enc.select(F.explode(pair_codes).alias("code"))
        .groupBy("code")
        .agg(F.count("*").alias("c12"))
        .select(
            F.shiftright("code", 31).alias("tid1"),
            F.col("code").bitwiseAND(F.lit((1 << 31) - 1)).alias("tid2"),
            "c12",
        )
        .join(F.broadcast(vids.select(F.col("tid").alias("tid1"), F.col("w").alias("w1"))), "tid1")
        .join(F.broadcast(vids.select(F.col("tid").alias("tid2"), F.col("w").alias("w2"))), "tid2")
        .select("w1", "w2", "c12")
    )
    got_old = sorted((r.w1, r.w2, r.c12) for r in old_pairs.collect())
    got_new = sorted((r.w1, r.w2, r.c12) for r in codes.collect())
    assert got_new == got_old and got_old
    # the packed-code ordering must equal the (c12 DESC, w1, w2) ordering
    # the query cuts its top-20 on: ids ascend in string order, so
    # (code asc) == (w1, w2) lexicographic.
    top_old = sorted(got_old, key=lambda r: (-r[2], r[0], r[1]))[:20]
    top_new = [
        (r.w1, r.w2, r.c12) for r in q142_token_pmi(spark, sf_dir).collect()
    ]
    assert [t[:3] for t in top_new] == top_old


def test_q327_derived_c1_matches_direct_count(spark, sf_dir):
    """q327's c1 (bigram-instance count by first word) now folds out of the
    bigram vocabulary instead of a third corpus pass; counts must match the
    direct groupBy exactly."""
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    docs = d.filter(F.size(t) >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 2)),
            )
        ).alias("bigram"),
    )
    bw = docs.withColumn("w1", F.split("bigram", " ")[0])
    old_c1 = bw.groupBy("w1").agg(F.count("*").alias("c1"))
    new_c1 = (
        docs.groupBy("bigram")
        .agg(F.count("*").alias("c2"))
        .withColumn("w1", F.split("bigram", " ")[0])
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    got_old = sorted((r.w1, r.c1) for r in old_c1.collect())
    got_new = sorted((r.w1, r.c1) for r in new_c1.collect())
    assert got_new == got_old and got_old


def test_q140_single_eval_projection_matches_old_spelling(spark, sf_dir):
    """q140 was restructured so each interpreted HOF is aliased once and
    referenced as an attribute (the old single projection re-evaluated the
    gram window ~4x and the top-token scan 2x); every output value must be
    bit-identical to the old spelling."""
    from sparkstreaming_quickstart_spark.functions.text import tokens
    from sparkstreaming_quickstart_spark.queries.traindata import (
        q140_repetition_score,
    )
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("toks") - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
    )
    g = t.select("doc_id", "toks", grams.alias("grams"))
    n_grams = F.size("grams").cast("long")
    n_distinct = F.size(F.array_distinct("grams")).cast("long")
    dup_frac = F.lit(1.0) - n_distinct.cast("double") / n_grams
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda w: F.size(F.filter("toks", lambda x: x == w)),
        )
    )
    top_frac = top_cnt.cast("double") / F.size("toks")
    old = g.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        dup_frac.alias("dup_frac"),
        top_frac.alias("top_tok_frac"),
        ((dup_frac > 0.2) | (top_frac > 0.3)).alias("repetitive"),
    ).orderBy("doc_id")
    got_old = [tuple(r) for r in old.collect()]
    got_new = [tuple(r) for r in q140_repetition_score(spark, sf_dir).collect()]
    assert got_new == got_old and got_old
