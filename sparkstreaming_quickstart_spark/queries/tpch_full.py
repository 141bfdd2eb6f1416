"""The six remaining TPC-H classic shapes (Q2, Q9, Q11, Q16, Q20, Q21),
completing all 22 -- adapted to the driver's star schema like tpch_more.py.

The synthetic schema has no partsupp table; lineitem carries (l_partkey,
l_suppkey), so supply relationships derive from observed lineitems: the
"offer cost" for (part, supplier) is MIN(l_extendedprice) as exact DECIMAL
(no division -- a unit-price divide would put a float boundary between the
engines).  What matters for the engine grade is the plan topology each shape
exercises:

  Q2  -- min-per-group scalar subquery joined back on exact equality,
         3-dim snowflake (supplier -> nation -> region), top-k output.
  Q9  -- 5-way join with LIKE-filtered dim, profit expression in exact
         decimals, two-level group-by.
  Q11 -- global-total scalar subquery in a HAVING, cross-multiplied
         (value * 1000 > total) so neither engine divides.
  Q16 -- count-distinct over a NOT IN (anti-join) exclusion.
  Q20 -- nested IN chain gated by a grouped-sum threshold (semi-joins).
  Q21 -- EXISTS / NOT EXISTS double self-join on the fact table.

Reference context: the reference implements no relational operators
(SURVEY.md 2.A); these are charter-driven engine surface (SURVEY.md 2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec, dsum
from ..sources.catalog import load_table
from . import register


@register(
    "q115_tpch_q2_min_cost",
    sql="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY 1, 2),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
    scoped AS (
        SELECT o.l_partkey, o.cost, eu.s_name, eu.s_acctbal, eu.n_name
        FROM offers o JOIN eu ON o.l_suppkey = eu.s_suppkey),
    best AS (SELECT l_partkey, MIN(cost) AS best_cost FROM scoped GROUP BY 1)
    SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
           CAST(s.cost AS DOUBLE) AS cost
    FROM scoped s
    JOIN best b ON s.l_partkey = b.l_partkey AND s.cost = b.best_cost
    JOIN part p ON s.l_partkey = p.p_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'ECONOMY'
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: cheapest-supplier-per-part via a min-per-group "
    "subquery joined back on exact DECIMAL equality, snowflake dims "
    "(supplier->nation->region, all broadcast), deterministic top-100.",
)
def q115_tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(F.min(dec("l_extendedprice")).alias("cost"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    scoped = offers.join(F.broadcast(eu), offers.l_suppkey == eu.s_suppkey).select(
        "l_partkey", "cost", "s_name", "s_acctbal", "n_name"
    )
    best = scoped.groupBy("l_partkey").agg(F.min("cost").alias("best_cost"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    )
    return (
        scoped.join(best, ["l_partkey"])
        .filter(F.col("cost") == F.col("best_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q116_tpch_q9_profit",
    sql="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(l.l_quantity AS DECIMAL(18,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: product-type profit -- 5-way join (LIKE-filtered "
    "part dim broadcast), exact-decimal profit expression (retailprice "
    "stands in for ps_supplycost), nation x year rollup.",
)
def q116_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    one = F.lit(1).cast("decimal(18,2)")
    amount = dec("l_extendedprice") * (one - dec("l_discount")) - dec("l_quantity") * dec(
        "p_retailprice"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q117_tpch_q11_important_stock",
    sql="""
    WITH nat_lines AS (
        SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS v
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey = 3),
    total AS (SELECT SUM(v) AS t FROM nat_lines)
    SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS value
    FROM nat_lines, total
    GROUP BY l_partkey, t
    HAVING SUM(v) * 1000 > t
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: per-part inventory value for one nation's "
    "suppliers, kept when above 1/1000 of the nation total -- the "
    "global-total scalar subquery in a HAVING, cross-multiplied so neither "
    "engine divides.",
)
def q117_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    nat = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).select(
        "l_partkey", dec("l_extendedprice").alias("v")
    )
    total = nat.agg(F.sum("v").alias("t"))
    return (
        nat.groupBy("l_partkey")
        .agg(F.sum("v").alias("pv"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("pv") * 1000 > F.col("t"))
        .select("l_partkey", F.col("pv").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q118_tpch_q16_supplier_cnt",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: supplier variety per (brand, type, size) with a "
    "NOT IN exclusion (anti-join against the complaint-supplier stand-in: "
    "negative account balance).",
)
def q118_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q119_tpch_q20_promotion",
    sql="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 20)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: promotion-candidate suppliers -- nested IN chain "
    "(part name prefix -> grouped quantity threshold -> supplier semi-join) "
    "restricted to one region.",
)
def q119_tpch_q20_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 20)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q120_tpch_q21_waiting",
    sql="""
    WITH failed AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F' AND l.l_returnflag = 'R')
    SELECT s.s_name, COUNT(DISTINCT f.l_orderkey) AS numwait
    FROM failed f
    JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = f.l_orderkey AND l2.l_suppkey <> f.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM failed f3
                      WHERE f3.l_orderkey = f.l_orderkey AND f3.l_suppkey <> f.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers who alone 'failed' multi-supplier "
    "orders -- EXISTS (another supplier participated) + NOT EXISTS (no "
    "other supplier failed), both as self-joins on the fact table "
    "(returnflag='R' stands in for the late-commit predicate).",
)
def q120_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    failed = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other_exists = li.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    f = failed.alias("f")
    with_other = f.join(
        other_exists,
        (F.col("f.l_orderkey") == F.col("o_k")) & (F.col("f.l_suppkey") != F.col("o_s")),
        "left_semi",
    )
    f3 = failed.select(F.col("l_orderkey").alias("f3_k"), F.col("l_suppkey").alias("f3_s"))
    sole_failed = with_other.join(
        f3,
        (F.col("l_orderkey") == F.col("f3_k")) & (F.col("l_suppkey") != F.col("f3_s")),
        "left_anti",
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_failed.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
