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
