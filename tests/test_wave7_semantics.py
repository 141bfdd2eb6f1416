"""Semantic pins for the wave-7 corpus-hygiene operators: planted cases the
fixture oracle can't distinguish, exercised on synthetic inline frames.

- Containment (q185) catches a short doc embedded in a long one -- the pair
  class Jaccard misses by construction -- and its prefix filter loses
  nothing on the planted pair.
- SemDeDup (q186's kernel semantics) flags near-identical vectors only
  INSIDE a cluster; identical vectors in different clusters survive (the
  cluster-scoping that bounds its cost is also its semantic contract).
- C4 span dedup (q183) keeps exactly the first occurrence (doc_id, pos) of
  a boilerplate span shared by many docs and reassembles the survivors in
  order.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _containment_and_jaccard(spark, rows):
    from sparkstreaming_quickstart_spark.queries.wave7 import containment_pairs

    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = containment_pairs(d, 0.8).collect()
    return pairs


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    base = " ".join(f"w{i}" for i in range(10))          # the short doc
    long = base + " " + " ".join(f"x{i}" for i in range(90))  # 10x longer
    rows = [(1, base), (2, long), (3, " ".join(f"z{i}" for i in range(20)))]
    pairs = _containment_and_jaccard(spark, rows)
    assert [(p.id1, p.id2) for p in pairs] == [(1, 2)]
    assert pairs[0].containment == 1.0
    # the same pair's Jaccard is far below any near-dup threshold
    sh_small, sh_big = 10 - 2, 100 - 2
    jaccard = sh_small / (sh_small + sh_big - sh_small)
    assert jaccard < 0.1


def test_containment_boundary_pair_at_exact_threshold(spark):
    """Planted boundary pin for the round-6 prefix fix (round-7 advice):
    a pair at containment EXACTLY 0.8 with a shingle count divisible by
    den=5, whose two unshared shingles are the globally rarest.  The exact
    integer prefix (n - ceil(t*n) + 1 = 10 - 8 + 1 = 3) reaches the first
    SHARED shingle, so the pair survives; the float spelling
    floor((1-t)*n)+1 = 2 keeps only the two unshared (df=1) shingles and
    silently drops the pair.  Reverting the integer arithmetic fails here."""
    # 12 distinct tokens -> 10 distinct 3-word shingles per doc; the docs
    # differ only in the last two tokens, so they share 8 shingles
    # (containment = 8/10 = 0.8) and each holds 2 private (df=1, rarest).
    t1 = " ".join(f"w{i}" for i in range(12))
    t2 = " ".join(f"w{i}" for i in range(10)) + " a10 a11"
    d = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    from sparkstreaming_quickstart_spark.queries.wave7 import containment_pairs

    pairs = containment_pairs(d, 0.8).collect()
    assert [(p.id1, p.id2, p.containment) for p in pairs] == [(1, 2, 0.8)]


def test_containment_arbitrary_threshold_no_bigint_blowup(spark):
    """A threshold with a huge decimal expansion (1/3) must not feed a ~1e16
    numerator into the BIGINT prefix arithmetic: the denominator guard
    rounds it down to the nearest millionth, which can only lengthen the
    (lossless) prefix.  Pin: the doc-in-doc pair still comes back and no
    overflow surfaces at a realistic shingle count."""
    base = " ".join(f"w{i}" for i in range(10))
    long = base + " " + " ".join(f"x{i}" for i in range(90))
    d = spark.createDataFrame([(1, base), (2, long)], "doc_id long, text string")
    from sparkstreaming_quickstart_spark.queries.wave7 import containment_pairs

    pairs = containment_pairs(d, 1 / 3).collect()
    assert [(p.id1, p.id2) for p in pairs] == [(1, 2)]


def test_semdedup_scopes_pruning_to_the_cluster(spark):
    from sparkstreaming_quickstart_spark.queries import all_queries  # noqa: F401
    import numpy as np

    v = [float(x) for x in np.arange(8)]
    rows = [
        (1, 0, v),          # kept: lowest id in cluster 0
        (2, 0, v),          # dropped: identical to 1, same cluster
        (3, 1, v),          # kept: identical vector but DIFFERENT cluster
        (4, 1, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]),  # kept: orthogonal-ish
    ]
    d = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")

    # run the same grouped kernel q186 registers, on the inline frame
    from sparkstreaming_quickstart_spark.queries.wave7 import _SEMDEDUP_T
    import pandas as pd

    def prune(pdf):
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        nrm[nrm == 0.0] = np.nan
        sims = np.round((m @ m.T) / np.outer(nrm, nrm), 9)
        n = len(pdf)
        mask = np.tril(np.ones((n, n), dtype=bool), k=-1)
        is_dup = np.nansum((sims >= _SEMDEDUP_T) & mask.T, axis=0) > 0
        return pd.DataFrame(
            {"vec_id": pdf["vec_id"], "label": pdf["label"], "is_dup": is_dup}
        )

    out = {
        r.vec_id: r.is_dup
        for r in d.groupBy("label")
        .applyInPandas(prune, "vec_id long, label int, is_dup boolean")
        .collect()
    }
    assert out == {1: False, 2: True, 3: False, 4: False}


def test_span_dedup_keeps_first_occurrence_and_reassembles_in_order(spark, sf_dir, monkeypatch, tmp_path):
    from sparkstreaming_quickstart_spark.queries.wave7 import q183_c4_span_dedup, _SPAN

    boiler = " ".join(["b"] * _SPAN)            # one exact span of boilerplate
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(_SPAN))
    rows = [
        (1, uniq("a") + " " + boiler),          # boiler at pos 1 of doc 1
        (2, boiler + " " + uniq("c")),          # boiler at pos 0 of doc 2
        (3, boiler),                            # doc 3 is ONLY the boiler
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text"]).assign(
        lang="en", source="t", n_chars=0
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r.doc_id: r for r in q183_c4_span_dedup(spark, str(tmp_path)).collect()}
    # doc 1 (lowest doc_id) keeps its copy; docs 2 and 3 lose theirs
    assert out[1].n_kept == 2 and out[1].clean_text == rows[0][1]
    assert out[2].n_kept == 1 and out[2].clean_text == uniq("c")
    assert out[3].n_kept == 0 and out[3].clean_text == ""


def test_streaming_asof_enrichment_carries_dimension_state_across_batches(spark, tmp_path):
    """Streaming as-of enrichment via applyInPandasWithState: dimension
    updates ('dim' rows) persist in per-key state; event rows enrich with
    the latest dimension value seen so far -- ACROSS micro-batches, which
    is exactly what per-batch joins cannot do.  Planted three batches:
    the same user's plan flips free -> pro between batches, and a user
    with no dimension row ever enriches to None."""
    import os
    import time

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [(0, 1, "dim", "free"), (1, 1, "event", None)],
        [(2, 1, "event", None), (3, 1, "dim", "pro")],
        [(4, 1, "event", None), (5, 2, "event", None)],
    ]
    for i, rows in enumerate(batches):
        (
            spark.createDataFrame(
                rows, "seq long, user_id long, kind string, plan string"
            )
            .coalesce(1)
            .write.parquet(os.path.join(src, f"b{i}"))
        )
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    def enrich(key, pdfs, state):
        import pandas as pd

        (current,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdfs:
            for row in pdf.sort_values("seq").itertuples():
                if row.kind == "dim":
                    current = row.plan
                else:
                    out.append((row.seq, key[0], current))
        state.update((current,))
        return iter(
            [pd.DataFrame(out, columns=["seq", "user_id", "plan_at_event"])]
        )

    stream = (
        spark.readStream.schema("seq long, user_id long, kind string, plan string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    enriched = stream.groupBy("user_id").applyInPandasWithState(
        enrich,
        "seq long, user_id long, plan_at_event string",
        "plan string",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    table = f"asof_enrich_{os.getpid()}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.seq: r.plan_at_event for r in spark.table(table).collect()}
    assert got == {1: "free", 2: "free", 4: "pro", 5: None}, got


def test_decimal_accumulation_survives_magnitude_skew(spark):
    """The repo-wide DECIMAL-accumulate / double-publish policy, pinned on
    the case that breaks naive double sums: one 1e16 row plus ten thousand
    0.01 rows.  float64 has 52 mantissa bits, so each 0.01 added to 1e16
    rounds to nothing -- the double sum loses the entire tail, DECIMAL
    keeps every cent.  (Partial-aggregation order makes the double loss
    nondeterministic too; decimal is exact under ANY aggregation tree,
    which is why associativity-safe money math is non-negotiable at
    100 TB.)"""
    # Single partition, big value FIRST: the sequential double fold starts
    # at 1e16 and each 0.01 rounds to nothing.  (With default partitioning
    # the map-side partials happen to sum the small values together first
    # and mask the loss -- which is itself the nondeterminism: the double
    # answer depends on the aggregation tree, the decimal answer never.)
    df = (
        spark.range(1)
        .selectExpr("1e16 AS v")
        .unionAll(spark.range(10_000).selectExpr("0.01D AS v"))
        .coalesce(1)
    )
    dec_sum = df.selectExpr(
        "CAST(SUM(CAST(v AS DECIMAL(38,2))) AS STRING) AS s"
    ).collect()[0].s
    assert dec_sum == "10000000000000100.00", dec_sum
    dbl_sum = df.selectExpr("SUM(v) AS s").collect()[0].s
    assert dbl_sum == 1e16, dbl_sum  # the whole 100.00 tail vanished
