"""Scale-critical physical-plan assertions: pushdown, broadcast, shuffle
bounds.  These encode the "would this survive 100x data" checks from the
charter as regression tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.plans.inspect import (
    broadcast_join_count,
    explain_str,
    shuffle_count,
)
from sparkstreaming_quickstart_spark.queries.joins import q11_join_multiway
from sparkstreaming_quickstart_spark.queries.relational import q01_pricing_summary
from sparkstreaming_quickstart_spark.sources.catalog import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    plan = explain_str(df, "formatted")
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1].split("\n")[0]


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    plan = explain_str(df, "formatted")
    read = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read, "scan reads columns the query never uses"


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    df = q11_join_multiway(spark, sf_dir)
    assert broadcast_join_count(df) >= 3, explain_str(df, "simple")


def test_flagship_plan_is_single_agg_shuffle(spark, sf_dir):
    # filter -> partial agg -> exchange -> final agg -> sort: exactly the agg
    # shuffle plus the output range-partition for orderBy.
    df = q01_pricing_summary(spark, sf_dir)
    assert shuffle_count(df) <= 2, explain_str(df, "simple")


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE hides codegen spans until execution; the codegen explain mode shows
    # the generated subtrees regardless.
    df = q01_pricing_summary(spark, sf_dir)
    assert "WholeStageCodegen" in explain_str(df, "codegen")


def test_minhash_signatures_computed_once(spark, sf_dir):
    # The LSH pipeline must evaluate the (expensive) signature expression
    # exactly once: candidate pairs come from a bucket groupBy, not a
    # signature self-join, so the plan may contain only a single instance of
    # the minhash fold.  (Spark re-evaluates non-materialized subtrees per
    # consumer; a duplicated fold means a join-shaped regression.)
    #
    # Round-14: exact_jaccard_verify consumes the candidate frame exactly
    # ONCE (pair occurrences group per member doc before the text join), so
    # the whole operator is back to a single checkpoint-free plan and the
    # original single-kernel pin applies to the final executed plan again.
    from sparkstreaming_quickstart_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.5)
    pairs.collect()
    executed = pairs._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-execution plan under "== Initial Plan ==";
    # only the final plan reflects what actually ran.
    final_plan = executed.split("== Initial Plan ==")[0]
    # The signature stage is one Arrow mapInPandas kernel; a join-shaped
    # regression (signatures evaluated per join side) would show two, and a
    # reintroduced checkpoint would show zero plus an ExistingRDD scan.
    assert final_plan.count("MapInPandas") == 1, executed
    assert "ExistingRDD" not in final_plan, executed


def test_embedding_prefilter_is_equijoin_and_subset(spark, sf_dir):
    # The 100 TB path for embedding near-dup: LSH-bucket prefilter must turn
    # the O(n^2) pair space into an equi-join on bucket (no nested-loop join),
    # and its output must be a subset of the exact all-pairs result.
    from sparkstreaming_quickstart_spark.operators.similarity import embedding_cosine_pairs

    e = load_table(spark, sf_dir, "embeddings")
    pre = embedding_cosine_pairs(e, "vec_id", "embedding", 0.3, prefilter_bits=4, dim=64)
    exact = embedding_cosine_pairs(e, "vec_id", "embedding", 0.3)
    got = {(r.id1, r.id2) for r in pre.collect()}
    want = {(r.id1, r.id2) for r in exact.collect()}
    assert got and got <= want
    assert "NestedLoop" not in pre._jdf.queryExecution().executedPlan().toString()


def test_tpch_q10_pushes_filter_and_broadcasts_dim(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.tpch import q80_tpch_q10_returns

    df = q80_tpch_q10_returns(spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "l_returnflag" in plan.split("PushedFilters", 2)[-1].split("\n")[0] or "EqualTo(l_returnflag,R)" in plan
    assert broadcast_join_count(df) >= 1, explain_str(df, "simple")


def test_tpch_q8_broadcasts_all_five_dims(spark, sf_dir):
    """The 8-way Q8 join must broadcast every dimension (part, supplier,
    nation x2, region) so the only shuffles are the fact-side equi-joins --
    at 100 TB the lineitem/orders/customer joins shuffle on their keys and
    nothing else moves."""
    from sparkstreaming_quickstart_spark.queries.tpch_more import q95_tpch_q8_market_share

    df = q95_tpch_q8_market_share(spark, sf_dir)
    assert broadcast_join_count(df) >= 4, explain_str(df, "simple")
    plan = explain_str(df, "formatted")
    assert "PROMO" in plan  # p_type filter reached the part scan side


def test_tpch_q9_broadcasts_dims_and_pushes_like(spark, sf_dir):
    """Q9's 5-way join: part/supplier/nation broadcast, the LIKE filter
    reaches the part scan -- only lineitem-orders shuffles at 100 TB."""
    from sparkstreaming_quickstart_spark.queries.tpch_full import q116_tpch_q9_profit

    df = q116_tpch_q9_profit(spark, sf_dir)
    assert broadcast_join_count(df) >= 3, explain_str(df, "simple")
    plan = explain_str(df, "formatted")
    assert "gear" in plan  # p_name LIKE pushed toward the part scan


def test_tpch_q21_semi_anti_no_cartesian(spark, sf_dir):
    """Q21's EXISTS / NOT EXISTS self-joins must plan as semi/anti joins on
    the order key (never a cartesian): the non-equi supplier inequality is a
    residual condition on an equi-join."""
    from sparkstreaming_quickstart_spark.queries.tpch_full import q120_tpch_q21_waiting

    df = q120_tpch_q21_waiting(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert "Cartesian" not in plan, plan


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """q139: the eval-set shingle side must broadcast (benchmarks are small
    by construction); the corpus side's only shuffle is the per-doc count.
    A sort-merge join here would shuffle the full exploded corpus at 100 TB."""
    from sparkstreaming_quickstart_spark.queries.traindata import q139_decontaminate

    df = q139_decontaminate(spark, sf_dir)
    assert broadcast_join_count(df) >= 1, explain_str(df, "simple")
    assert "SortMergeJoin" not in explain_str(df, "simple")


def test_dataset_mixing_broadcasts_rate_table(spark, sf_dir):
    # q143's per-source rate table is dozens of rows; it must broadcast back
    # onto the corpus scan (a shuffle join here would shuffle the whole
    # corpus at 100 TB to join against ~20 rows).
    from sparkstreaming_quickstart_spark.queries.traindata import q143_dataset_mixing

    df = q143_dataset_mixing(spark, sf_dir)
    assert broadcast_join_count(df) >= 1, explain_str(df, "simple")


def test_sequence_packing_single_group_shuffle(spark, sf_dir):
    # q145: one shuffle to group by lang for the packing kernel, one for the
    # (lang, bin) reaggregation, plus the output sort -- no hidden extras.
    from sparkstreaming_quickstart_spark.queries.traindata import q145_sequence_packing

    df = q145_sequence_packing(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan, plan
    assert shuffle_count(df) <= 3, plan


def test_gram_matrix_shuffles_partials_not_rows(spark, sf_dir):
    # q148 must reduce each partition to dim^2 partial cells BEFORE any
    # shuffle: the plan is scan -> MapInPandas -> (partial agg) -> exchange.
    # A Generate (explode) node would mean the dim^2 expansion happens
    # row-wise JVM-side -- the O(rows x dim^2) shuffle this operator exists
    # to avoid.
    from sparkstreaming_quickstart_spark.queries.llm_extras import q148_embedding_gram

    df = q148_embedding_gram(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "MapInPandas" in plan, plan
    assert "Generate" not in plan, plan
    assert shuffle_count(df) <= 2, plan


def test_salted_join_spreads_salt_before_shuffle(spark, sf_dir):
    # q147: the salt column must exist on both shuffle inputs (key spreading
    # happens before the exchange, otherwise salting did nothing).
    from sparkstreaming_quickstart_spark.queries.joins import q147_salted_skew_join

    df = q147_salted_skew_join(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "__salt" in plan, plan


def test_jl_projection_is_shuffle_free_codegen(spark, sf_dir):
    # q156: the JL sketch must be one narrow projection -- no shuffle (the
    # sign matrix is a plan-time constant, not a broadcast join) and inside
    # whole-stage codegen (512 additions is well under the janino limit).
    from sparkstreaming_quickstart_spark.queries.vectors import q156_random_projection

    df = q156_random_projection(spark, sf_dir)
    # the only exchange allowed is the final orderBy's range partition
    assert shuffle_count(df) <= 1, explain_str(df, "simple")
    assert "WholeStageCodegen" in explain_str(df, "codegen")


def test_pq_codes_single_arrow_kernel_and_broadcast_lut(spark, sf_dir):
    # q161: code assignment must be ONE Arrow kernel pass over the corpus
    # (the Column-expression spelling of 8x16x8 distance terms breaks janino
    # codegen and falls back to interpreted -- measured ~20x slower), and the
    # per-query LUTs must arrive via broadcast, never a shuffle of the corpus.
    from sparkstreaming_quickstart_spark.queries.vectors import q161_pq_topk

    df = q161_pq_topk(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("MapInPandas") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # corpus-side DATA shuffles: only the top-k window's partition-by-query
    # exchange and the final orderBy (the LUT BroadcastExchange is not a
    # data shuffle); the partial WindowGroupLimit must pre-filter to
    # per-partition top-k BEFORE that exchange (map-side top-k).
    data_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert data_shuffles <= 2, plan
    assert "WindowGroupLimit" in plan, plan


def test_cms_counter_grid_is_bounded_aggregation(spark, sf_dir):
    # q157: the sketch build must aggregate into the fixed 4x512 counter grid
    # (key domain 2048 regardless of vocabulary) and the candidate probe must
    # broadcast against it -- if the counters ever shuffle per-token the
    # sketch has lost its bounded-memory point.
    from sparkstreaming_quickstart_spark.queries.corpus_quality import (
        q157_countmin_heavy_hitters,
    )

    df = q157_countmin_heavy_hitters(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" in plan, plan


def test_triangle_joins_broadcast_the_edge_set(spark, sf_dir):
    # q169: the LSH edge set is sparse by construction, so the triangle
    # double-join must be broadcast-hash (zero shuffle) -- through a cached
    # relation AQE does not re-coalesce, so a shuffle here would run at full
    # spark.sql.shuffle.partitions width on a few hundred rows.
    from sparkstreaming_quickstart_spark.queries.wave5 import q169_neardup_triangles

    df = q169_neardup_triangles(spark, sf_dir)
    assert broadcast_join_count(df) >= 2, explain_str(df, "simple")


def test_span_dedup_shuffles_are_bounded(spark, sf_dir):
    # q183: spans build in a narrow projection; the whole pipeline is the
    # span-key window shuffle + the doc_id reassembly agg (plus AQE reads).
    # A span explode that shuffled per token, or a self-join, would blow this
    # bound.
    from sparkstreaming_quickstart_spark.queries.wave7 import q183_c4_span_dedup

    df = q183_c4_span_dedup(spark, sf_dir)
    assert shuffle_count(df) <= 3, explain_str(df, "simple")
    assert "Join" not in explain_str(df, "simple")


def test_gopher_quality_is_shuffle_free_scan(spark, sf_dir):
    # q184 is a pure per-row filter stage: zero exchanges before the output
    # sort, no Python, whole-stage codegen active.
    from sparkstreaming_quickstart_spark.queries.wave7 import q184_gopher_quality

    df = q184_gopher_quality(spark, sf_dir)
    simple = explain_str(df, "simple")
    # the only exchange allowed is the rangepartitioning for the final orderBy
    assert simple.count("Exchange") <= 1, simple
    assert "BatchEvalPython" not in simple and "ArrowEvalPython" not in simple
    assert "WholeStageCodegen" in explain_str(df, "codegen")


def test_containment_prefix_filter_shrinks_probe_side(spark, sf_dir):
    # q185's candidate join must probe from the rarest-first PREFIX (about
    # (1-t)|d|+1 shingles per doc), not the full posting list: measured on
    # the fixture the prefix is a small fraction of the index, which is the
    # whole point of the PPJoin-style filter.  Recall stays exact (the
    # registered oracle proves it); this pins the cost side.
    from pyspark.sql import Window
    from sparkstreaming_quickstart_spark.functions.text import tokens, word_shingles
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", word_shingles("text", 3).alias("sh")).filter(
        F.size(tokens("text")) >= 3
    )
    tok = sh.select("doc_id", F.explode("sh").alias("shingle"))
    freq = tok.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        tok.join(freq, "shingle")
        .withColumn(
            "r",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "shingle")),
        )
        .join(sh.select("doc_id", F.size("sh").alias("n")), "doc_id")
    )
    n_full = tok.count()
    n_prefix = ranked.filter(F.col("r") <= F.floor(0.2 * F.col("n")) + 1).count()
    assert n_prefix < 0.35 * n_full, (n_prefix, n_full)


def test_semdedup_is_single_shuffle_grouped_kernel(spark, sf_dir):
    # q186: the SemDeDup engine path is ONE shuffle on label feeding the
    # per-cluster Arrow matmul kernel -- no pair join (a join would square
    # the shuffled volume) and exactly one grouped-Python operator.
    from sparkstreaming_quickstart_spark.queries.wave7 import q186_semdedup

    df = q186_semdedup(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "Join" not in simple, simple
    assert simple.count("FlatMapGroupsInPandas") == 1, simple
    # label hash exchange + output sort range exchange (plus AQE reads)
    assert shuffle_count(df) <= 2, simple


def test_bm25_broadcasts_stats_and_filters_before_shuffle(spark, sf_dir):
    # q191: corpus stats and per-term df must broadcast (no shuffle join for
    # tiny sides), and the query-term filter must land on the generator
    # output BEFORE the tf aggregation shuffle.
    from sparkstreaming_quickstart_spark.queries.wave7 import q191_bm25_search

    df = q191_bm25_search(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert simple.count("BroadcastExchange") >= 2, simple
    # the single-partition window for global top-20 ranks only the scored
    # docs (already reduced); no SortMergeJoin should appear anywhere.
    assert "SortMergeJoin" not in simple, simple


def test_contiguous_ids_has_no_global_single_partition_window_over_data(spark, sf_dir):
    # q193's whole point: the per-row rank window partitions by bucket; the
    # only SinglePartition exchange feeds the 16-row offsets frame, never
    # the data path.  Count windows with an empty partition spec over the
    # full data: the naive row_number() spelling would show one.
    from sparkstreaming_quickstart_spark.queries.wave7 import q193_contiguous_ids

    df = q193_contiguous_ids(spark, sf_dir)
    # offsets aggregate over at most _ID_BUCKETS rows: its window is allowed;
    # assert the expensive side (row_number over doc_id) is bucket-partitioned
    simple = explain_str(df, "simple")
    import re

    rn_specs = re.findall(r"row_number\(\) windowspecdefinition\(([^,]+),", simple)
    assert rn_specs and all("b#" in s for s in rn_specs), simple


def test_binned_interval_join_avoids_nested_loop(spark, sf_dir):
    # q215: the binned fact-fact interval join must plan as a hashable
    # equi-join on (user, bin) -- any BroadcastNestedLoopJoin means the
    # non-equi condition leaked back into the join strategy.
    from sparkstreaming_quickstart_spark.queries.wave8 import (
        q215_binned_interval_join,
    )

    df = q215_binned_interval_join(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in simple, simple
    assert "CartesianProduct" not in simple, simple


def test_market_basket_pair_join_is_equi_on_basket_key(spark, sf_dir):
    # q217: the pair expansion must be an equi-join on l_orderkey (quadratic
    # only in basket size); support/stats sides broadcast.  A cartesian or
    # nested-loop here would be item-catalog-squared.
    from sparkstreaming_quickstart_spark.queries.wave8 import q217_market_basket

    df = q217_market_basket(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "CartesianProduct" not in simple, simple
    # the 1-row corpus-stats scalar legitimately attaches via a broadcast
    # nested loop; the DATA joins (pair expansion + two support lookups)
    # must all be hashable
    assert simple.count("BroadcastNestedLoopJoin") <= 1, simple
    assert simple.count("BroadcastHashJoin") + simple.count("SortMergeJoin") >= 3, simple


def test_rag_index_chain_has_no_joins(spark, sf_dir):
    # q226's whole pipeline (chunk -> hash-embed -> bucket -> rollup) is a
    # narrow generator chain plus two hash-aggs; any Join in the plan means
    # an accidental reshuffle crept into the composition.
    from sparkstreaming_quickstart_spark.queries.wave9 import q226_rag_index_build

    df = q226_rag_index_build(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "Join" not in simple, simple
    assert "BatchEvalPython" not in simple, simple  # hashing stays in codegen


def test_dedup_provenance_report_joins_are_hashable(spark, sf_dir):
    # q233: the three stage results attach to the doc spine via equi left
    # joins -- no nested loop anywhere despite composing three operators.
    from sparkstreaming_quickstart_spark.queries.wave9 import q233_dedup_provenance

    df = q233_dedup_provenance(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in simple and "CartesianProduct" not in simple, simple


def test_gini_rank_is_bucket_partitioned_no_global_window_over_data(spark, sf_dir):
    # q230: the customer-rank row_number must partition by the width_bucket
    # column; the only single-partition window feeds the 1024-row bucket
    # offsets frame.  n/total must arrive as broadcasts, not global windows.
    import re

    from sparkstreaming_quickstart_spark.queries.wave9 import q230_gini_concentration

    df = q230_gini_concentration(spark, sf_dir)
    simple = explain_str(df, "simple")
    rn_specs = re.findall(r"row_number\(\) windowspecdefinition\(([^,]+),", simple)
    assert rn_specs and all("b#" in s for s in rn_specs), simple


def test_zipf_fit_never_sorts_vocabulary(spark, sf_dir):
    # q238: the vocabulary rank is generated arithmetically from the
    # distinct-frequency frame -- the plan must contain NO row_number at
    # all, and the only window (the offsets cumulative sum) runs over the
    # grouped-by-frequency frame, never the per-token frame.
    from sparkstreaming_quickstart_spark.queries.wave9 import q238_zipf_fit

    df = q238_zipf_fit(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "row_number" not in simple, simple
    # rank-run generation must be distributed: the chunk explode feeds a
    # repartition exchange, so generation never serializes on one task.
    assert "hashpartitioning(f#" in simple or "RoundRobin" in simple, simple


def test_quantile_normalize_has_no_per_row_window(spark, sf_dir):
    # q259: percent_rank must derive from the (source, n_chars) histogram --
    # the raw document rows are never sorted or windowed; they attach to the
    # small cumulative frame via a broadcast hash join.
    from sparkstreaming_quickstart_spark.queries.wave10 import (
        q259_quantile_normalize,
    )

    df = q259_quantile_normalize(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "percent_rank" not in simple, simple
    assert "BroadcastHashJoin" in simple, simple


def test_ks_and_mwu_window_only_over_distinct_value_frame(spark, sf_dir):
    # q250/q251: the only window (the ECDF / rank-offset cumulative sum)
    # runs AFTER the group-by-value hash-agg, so the single-partition
    # exchange carries the bounded distinct-length frame, never raw docs.
    import re

    from sparkstreaming_quickstart_spark.queries.wave10 import (
        q250_ks_test,
        q251_mannwhitney_u,
    )

    for fn in (q250_ks_test, q251_mannwhitney_u):
        plan = explain_str(fn(spark, sf_dir), "simple")
        # every Window sits above a HashAggregate in the operator chain
        win_idx = [m.start() for m in re.finditer(r"\bWindow\b", plan)]
        agg_idx = [m.start() for m in re.finditer(r"HashAggregate", plan)]
        assert win_idx and agg_idx, plan
        # plans print top-down: the aggregate feeding the window appears
        # BELOW (after) it in the string
        assert all(any(a > w for a in agg_idx) for w in win_idx), plan


def test_lateness_profile_prefix_max_is_bucket_partitioned(spark, sf_dir):
    # q275: the running max must be the two-phase form -- the only window
    # over the event frame partitions by the width_bucket column; the
    # single-partition window feeds only the 1024-row bucket-maxima frame.
    import re

    from sparkstreaming_quickstart_spark.queries.wave13 import q275_lateness_profile

    df = q275_lateness_profile(spark, sf_dir)
    simple = explain_str(df, "simple")
    mx_specs = re.findall(r"max\([^)]*\) windowspecdefinition\(([^,]+),", simple)
    # every max-window over a non-empty partition spec must key on the bucket
    partitioned = [s for s in mx_specs if "#" in s]
    assert any("b#" in s for s in partitioned), simple


def test_exponential_gof_lag_is_bucket_stitched(spark, sf_dir):
    # q262: the gap lag must partition by (event_type, day) -- the plain
    # per-type spelling caps parallelism at |event_types|.  The only window
    # partitioned by event_type alone is the carry over the tiny
    # types x days frame.
    import re

    from sparkstreaming_quickstart_spark.queries.wave11 import q262_exponential_gof

    df = q262_exponential_gof(spark, sf_dir)
    simple = explain_str(df, "simple")
    lag_specs = re.findall(r"lag\([^)]*\) windowspecdefinition\(([^)]+?), [a-z]+\(", simple)
    assert lag_specs and all("day#" in s for s in lag_specs), simple


def test_cluster_quality_distance_scan_never_shuffles_points(spark, sf_dir):
    # q287: the N x k distance pass must join the k-row centroid-array frame
    # via broadcast (nested-loop over a broadcast k-row build is fine; a
    # SortMergeJoin would shuffle every point row) and the fold must stay
    # JVM-side.
    from sparkstreaming_quickstart_spark.queries.wave17 import q287_cluster_quality

    df = q287_cluster_quality(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "SortMergeJoin" not in simple, simple
    assert "CartesianProduct" not in simple, simple
    assert "BatchEvalPython" not in simple, simple


def test_fdr_bh_single_pass_over_events(spark, sf_dir):
    # q286: all statistics derive from ONE sufficient-statistic hash-agg --
    # the events table must be scanned exactly once, and no Python ever runs.
    from sparkstreaming_quickstart_spark.queries.wave17 import q286_fdr_bh_correction

    df = q286_fdr_bh_correction(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert simple.count("Scan parquet") == 1, simple
    assert "BatchEvalPython" not in simple, simple


def test_ngram_novelty_final_join_is_on_rollup_frames(spark, sf_dir):
    # q291: the instances/novel join touches only the sources x deciles
    # rollup frames -- no cartesian anywhere (the 1-row maxid attach is a
    # broadcast), and the gram expansion stays in codegen.
    from sparkstreaming_quickstart_spark.queries.wave17 import q291_ngram_novelty

    df = q291_ngram_novelty(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert "CartesianProduct" not in simple, simple
    assert "BatchEvalPython" not in simple, simple


def test_dsir_is_two_scans_no_sort_merge(spark, sf_dir):
    # q292: one gram pass builds both histograms, one builds the per-doc
    # weights (lang/source ride the gram rows, so there is no join back to
    # documents) -- exactly two scans, and the only join is the broadcast
    # 64-row ratio table.
    from sparkstreaming_quickstart_spark.queries.wave17 import q292_dsir_importance

    df = q292_dsir_importance(spark, sf_dir)
    simple = explain_str(df, "simple")
    assert simple.count("Scan parquet") == 2, simple
    assert "SortMergeJoin" not in simple, simple
    assert "BatchEvalPython" not in simple, simple


def test_headline_plans_match_committed_audit(spark, sf_dir):
    # Registry-wide plan baseline: tools/plan_audit.json records every
    # query's plan-shape metrics; this pins the bench-headline subset so a
    # helper/session change that silently worsens a headline plan (extra
    # scan, new sort-merge join, a Python boundary) fails fast.  Regenerate
    # with `python tools/plan_audit.py` after an intentional plan change.
    import json
    import os
    import sys

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    audit_path = os.path.join(repo, "tools", "plan_audit.json")
    if not os.path.exists(audit_path):
        pytest.skip("no committed plan audit")
    sys.path.insert(0, os.path.join(repo, "tools"))
    from plan_audit import SF_DIR as AUDIT_SF_DIR
    from plan_audit import plan_metrics

    from bench import HEADLINE
    from sparkstreaming_quickstart_spark.queries import all_queries

    if os.path.realpath(sf_dir) != os.path.realpath(AUDIT_SF_DIR):
        pytest.skip(
            f"test sf_dir {sf_dir} != audit baseline sf_dir {AUDIT_SF_DIR}; "
            "size-dependent join strategies would differ legitimately"
        )

    with open(audit_path) as fh:
        committed = json.load(fh)
    registry = all_queries()
    diffs = {}
    for name in HEADLINE:
        got = plan_metrics(registry[name].fn(spark, sf_dir))
        if got != committed.get(name):
            diffs[name] = {"committed": committed.get(name), "current": got}
    assert not diffs, f"headline plan drift vs tools/plan_audit.json: {diffs}"


def test_dup_span_islands_plan_shape(spark, sf_dir):
    """q308: no all-pairs anywhere -- the gram join-back must be a hash
    join (broadcast or shuffled), and every window must partition by
    doc_id (a global island merge would serialize the corpus)."""
    import re

    from sparkstreaming_quickstart_spark.queries.wave20 import q308_dup_span_islands

    simple = explain_str(q308_dup_span_islands(spark, sf_dir), "simple")
    assert "CartesianProduct" not in simple, simple
    assert "BroadcastNestedLoopJoin" not in simple, simple
    specs = re.findall(r"windowspecdefinition\(([^,]+),", simple)
    assert specs and all("doc_id#" in s for s in specs), simple


def test_pipeline_v4_plan_is_python_free_single_chain(spark, sf_dir):
    """q312: the flag-chain fusion must keep the whole pipeline JVM-side
    (no Python eval) with no cartesian blowup; the three stage windows
    partition by source/h, never globally."""
    import re

    from sparkstreaming_quickstart_spark.queries.wave20 import q312_corpus_pipeline_v4

    simple = explain_str(q312_corpus_pipeline_v4(spark, sf_dir), "simple")
    assert "CartesianProduct" not in simple, simple
    assert "BatchEvalPython" not in simple and "ArrowEvalPython" not in simple, simple
    specs = re.findall(r"windowspecdefinition\(([^,]+),", simple)
    assert specs and all(
        "doc_id#" in s or "source#" in s or "h#" in s for s in specs
    ), simple


def test_stream_asof_static_side_broadcasts(spark, sf_dir):
    """q311: the validity-interval static side must reach the stream join
    as a broadcast (the stateless dimension-enrichment contract); the
    interval window runs on the dimension side only, before the join."""
    from sparkstreaming_quickstart_spark.queries.wave20 import q311_stream_asof_enrich

    df = q311_stream_asof_enrich(spark, sf_dir)
    # the returned frame is the drained memory table; assert on the plan the
    # stream ran by rebuilding the join statically (same builder path).
    from sparkstreaming_quickstart_spark.sources.catalog import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("p_user").orderBy("v_start", "ref_event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("v_start"),
            F.col("event_id").alias("ref_event_id"),
            F.col("value").alias("ref_value"),
        )
        .withColumn("v_end", F.lead("v_start").over(w))
    )
    stream = ev.filter(F.col("event_type") != "purchase")
    joined = stream.join(
        F.broadcast(purchases),
        (stream["user_id"] == purchases["p_user"])
        & (stream["ts"] >= purchases["v_start"])
        & (purchases["v_end"].isNull() | (stream["ts"] < purchases["v_end"])),
        "left_outer",
    )
    simple = explain_str(joined, "simple")
    assert "BroadcastHashJoin" in simple, simple
    assert "SortMergeJoin" not in simple, simple
    # each event matched at most once: guaranteed by the interval partition,
    # pinned value-side by tests/test_wave20.py::test_q311_matches_scalar_asof
    assert df.count() > 0


def test_truncation_loss_tokenizes_once(spark, sf_dir):
    """q313 (README rule 8): the ctx budgets join as a 3-row broadcast
    dimension so size(split(text)) evaluates once per document, BELOW the
    join -- the explode spelling re-tokenized the corpus per ctx row."""
    from sparkstreaming_quickstart_spark.queries.wave21 import q313_truncation_loss

    simple = explain_str(q313_truncation_loss(spark, sf_dir), "simple")
    assert "Generate" not in simple, simple
    assert simple.count("split(") == 1, simple


def test_dup_graph_clustering_no_cartesian(spark, sf_dir):
    """q322: triangle enumeration must be equi-joins on the pair list --
    a CartesianProduct would mean the corpus (or the full node set) is
    being paired instead of the bounded near-dup edge list."""
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        q322_dup_graph_clustering,
    )

    simple = explain_str(q322_dup_graph_clustering(spark, sf_dir), "simple")
    assert "CartesianProduct" not in simple, simple


def test_mutual_knn_no_allpairs_join(spark, sf_dir):
    """q329: neighbor scoring happens inside the Arrow kernel against the
    broadcast matrix -- the PLAN must contain no n^2 join (cartesian or
    non-equi nested loop); the only joins are the (i, j) equi-join for the
    mutual filter and the left join onto the node list."""
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        q329_mutual_knn_graph,
    )

    simple = explain_str(q329_mutual_knn_graph(spark, sf_dir), "simple")
    assert "CartesianProduct" not in simple, simple
    assert "MapInPandas" in simple, simple


def test_subsample_ci_single_scan(spark, sf_dir):
    """q328: all 16 replicates must fuse into ONE events scan as
    conditional aggregates -- a second scan means the replicate loop
    regressed to per-replicate passes."""
    from sparkstreaming_quickstart_spark.queries.wave23 import q328_subsample_ci

    simple = explain_str(q328_subsample_ci(spark, sf_dir), "simple")
    assert simple.count("Scan parquet") == 1, simple


def test_rule9_multiconsumer_queries_materialize_shared_subtrees(spark, sf_dir):
    """Round-9 rule-9 fix pin: q230/q282/q287/q233 each had a shared
    aggregate subtree feeding 3+ consumers that re-ran the corpus scan per
    consumer (audit: 15/8/8/9 scans).  After eager materialization the
    final plan must read the checkpointed frame -- at most ONE residual
    parquet scan anywhere (zero for the fully staged ones)."""
    from sparkstreaming_quickstart_spark.queries.wave9 import (
        q230_gini_concentration,
        q233_dedup_provenance,
    )
    from sparkstreaming_quickstart_spark.queries.wave16 import (
        q282_distribution_reweight,
    )
    from sparkstreaming_quickstart_spark.queries.wave17 import q287_cluster_quality

    for fn, max_scans in [
        (q230_gini_concentration, 0),
        (q282_distribution_reweight, 1),
        (q287_cluster_quality, 0),
        (q233_dedup_provenance, 0),
    ]:
        simple = explain_str(fn(spark, sf_dir), "simple")
        n = simple.count("Scan parquet")
        assert n <= max_scans, (fn.__name__, n, simple[:2000])


def test_bench_sentinels_derived_from_latest_sweep():
    """Round-9: bench.py auto-times the top-5 slowest committed-sweep
    entries as single-pass sentinels so q178/q114/q222-class regressions
    show in BENCH_rN deltas, not only in the sweep log.  The derivation
    must yield 5 registered, non-headline queries and include the known
    slow parity twins."""
    from bench import HEADLINE, _sentinels_from_sweep
    from sparkstreaming_quickstart_spark.queries import all_queries

    s = _sentinels_from_sweep()
    assert len(s) == 5
    registry = all_queries()
    assert all(name in registry for name in s)
    assert not set(s) & set(HEADLINE)
    assert {"q178_brp_lsh_euclidean", "q114_dedup_embedding_exact"} <= set(s)
