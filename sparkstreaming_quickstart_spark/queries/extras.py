"""Remaining surface: multiset ops, percentiles, from_json struct decode,
IVF-style ANN."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q09_multiset_ops",
    sql="""
    SELECT 'common' AS tag, x AS flag FROM (
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'F'
        INTERSECT ALL
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'O')
    UNION ALL
    SELECT 'f_surplus' AS tag, x AS flag FROM (
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'F'
        EXCEPT ALL
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'O')
    ORDER BY tag, flag
    """,
    doc="Multiset set-ops (intersectAll / exceptAll) preserving duplicates.",
)
def q09_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_linestatus") == "F").select(F.col("l_returnflag").alias("x"))
    o = li.filter(F.col("l_linestatus") == "O").select(F.col("l_returnflag").alias("x"))
    common = f.intersectAll(o).select(F.lit("common").alias("tag"), F.col("x").alias("flag"))
    surplus = f.exceptAll(o).select(F.lit("f_surplus").alias("tag"), F.col("x").alias("flag"))
    return common.unionByName(surplus).orderBy("tag", "flag")


@register(
    "q36_percentiles",
    sql="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont, rounded vs interpolation ulp); the 100 TB variant is "
    "approx_percentile (see q24 pattern).",
)
def q36_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q62_from_json_struct",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    ORDER BY event_id
    """,
    doc="Typed JSON decode: from_json with an explicit schema (vs the "
    "path-extraction in q44), struct field access.",
)
def q62_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("j", F.from_json("props", "k BIGINT"))
    return (
        parsed.filter(F.col("j.k").isNotNull())
        .select(
            "event_id",
            F.col("j.k").alias("k"),
            (F.col("j.k") % 10).alias("k_mod"),
        )
        .orderBy("event_id")
    )


@register(
    "q64_similarity_ivf",
    sql=None,  # centroid assignment is seed-specific -> rows-only
    doc="IVF-style ANN: vectors assigned to nearest of 16 seeded random "
    "centroids (coarse quantizer); per-query search restricted to the "
    "query's cell. The k-means-trained variant swaps the centroid source.",
)
def q64_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(q, e, "vec_id", "embedding", "vec_id", "embedding", dim=64, k=5, n_cells=16)


@register(
    "q87_stratified_sample",
    sql=None,  # sample membership is partition-layout-dependent -> rows-only
    doc="Stratified subsampling (sampleBy, seeded): per-language fractions "
    "over documents -- the training-data downsampling primitive.  Bernoulli "
    "per-row draws keyed by a fixed seed; reproducible under a fixed "
    "partitioning, rows-only because no SQL oracle can replay Spark's RNG.",
)
def q87_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    # downsample the two largest strata hard, keep the rest
    fractions = {lang: (0.1 if i % 2 == 0 else 0.8) for i, lang in enumerate(sorted(langs))}
    sampled = d.sampleBy("lang", fractions, seed=42)
    return (
        sampled.groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("chars_kept"))
        .orderBy("lang")
    )


@register(
    "q88_freq_items",
    sql=None,  # one-pass heavy-hitters sketch (false positives allowed) -> rows-only
    doc="Frequent-items sketch (DataFrame.freqItems, single pass): heavy-"
    "hitter event types and users -- the hot-key / hot-token detection "
    "primitive for skew diagnosis at scale.",
)
def q88_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = e.freqItems(["event_type", "user_id"], support=0.1)
    return out.select(
        F.sort_array("event_type_freqItems").alias("hot_event_types"),
        F.sort_array("user_id_freqItems").alias("hot_users"),
    )
