"""Core relational queries: scan, project, filter, sort, limit, set ops, distinct.

Reference parity: the reference's only projection is key/value access on Kafka
records (Processor.java:144); everything beyond that is charter surface
(SURVEY.md section 2.B).  All queries here are pure Catalyst built-ins --
filters and projections reach the parquet scan (verified via explain:
PushedFilters / ReadSchema), so they scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec, dsum, davg, sql_dsum, sql_davg
from ..sources.catalog import load_table
from . import register


@register(
    "q01_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: filter -> hash-agg -> sort (flagship).",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast("double").alias("sum_disc_price"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax"))).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_filter_project",
    sql="""
    SELECT o_orderkey,
           o_orderpriority,
           year(o_orderdate) AS order_year,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price,
           CASE WHEN o_totalprice >= 200000 THEN 'big'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'small' END AS price_band
    FROM orders
    WHERE o_orderstatus IN ('O','F')
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
    ORDER BY o_orderkey
    """,
    doc="Predicate surface: IN / BETWEEN / LIKE / IS NOT NULL + computed projection.",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
            )
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.year("o_orderdate").alias("order_year"),
            (dec("o_totalprice") * F.lit(2)).cast("double").alias("double_price"),
            F.when(F.col("o_totalprice") >= 200000, "big")
            .when(F.col("o_totalprice") >= 50000, "mid")
            .otherwise("small")
            .alias("price_band"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q03_sort_limit",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
    doc="Global top-k: total order with deterministic tie-break, then limit.",
)
def q03_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(20)
    )


@register(
    "q04_distinct",
    sql="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
    doc="Distinct over a low-cardinality pair (map-side partial dedup).",
)
def q04_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


@register(
    "q05_set_ops",
    sql="""
    SELECT 'both' AS tag, x AS nationkey FROM (
        SELECT c_nationkey AS x FROM customer INTERSECT SELECT s_nationkey AS x FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS tag, x AS nationkey FROM (
        SELECT c_nationkey AS x FROM customer EXCEPT SELECT s_nationkey AS x FROM supplier)
    UNION ALL
    SELECT 'either' AS tag, x AS nationkey FROM (
        SELECT c_nationkey AS x FROM customer UNION SELECT s_nationkey AS x FROM supplier)
    ORDER BY tag, nationkey
    """,
    doc="Set operations: INTERSECT / EXCEPT / UNION(distinct) with tags.",
)
def q05_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("x"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("x"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), F.col("x").alias("nationkey"))
    conly = c.subtract(s).select(F.lit("customer_only").alias("tag"), F.col("x").alias("nationkey"))
    either = c.union(s).distinct().select(F.lit("either").alias("tag"), F.col("x").alias("nationkey"))
    return both.unionByName(conly).unionByName(either).orderBy("tag", "nationkey")
