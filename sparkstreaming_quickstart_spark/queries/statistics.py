"""Statistical-aggregate operators (round 2, wave 4): built-in linear
regression aggregates and the ordered-string/median aggregate family.

Reference context: the reference has no analytics surface (SURVEY.md 2.A);
these extend the section-2.B aggregate-function-library row with the
`regr_*` family (Spark 3.5+/4.x) and `listagg` (Spark 4.0+), both of which
a training-data pipeline reaches for when profiling label/feature
relationships.  All JVM-side declarative aggregates: one hash-agg shuffle,
partial aggregation map-side, nothing leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q153_regr_aggregates",
    sql="""
    SELECT l_returnflag,
           regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS n,
           ROUND(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 3) AS slope,
           ROUND(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) AS intercept,
           ROUND(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS r2,
           ROUND(regr_avgx(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4) AS avg_qty,
           ROUND(regr_avgy(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Built-in OLS regression aggregates (regr_slope/intercept/r2/avgx/"
    "avgy/count) of extendedprice on quantity per returnflag -- the "
    "feature-vs-label profiling aggregate.  Single hash-agg with map-side "
    "partials; moments accumulate in one pass (no second scan).  Rounded "
    "because Spark and DuckDB factor the normal equations differently "
    "(covar/var vs direct sums): identical math, ~1e-12 relative ulp skew.",
)
def q153_regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_slope(y, x), 3).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.regr_avgx(y, x), 4).alias("avg_qty"),
            F.round(F.regr_avgy(y, x), 2).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q154_listagg_median",
    sql="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
           floor(median(CAST(c_acctbal AS DOUBLE)) * 100) / 100 AS median_bal,
           bool_and(c_acctbal > -1000.0) AS all_above_floor,
           bool_or(c_acctbal < 0.0) AS any_negative,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="Ordered-string aggregation (listagg WITHIN GROUP, Spark 4.0) plus "
    "median and bool_and/bool_or per nation.  listagg's deterministic "
    "ORDER BY contract is the point: unordered string_agg output is "
    "partitioning-dependent and would never hash-match an oracle.  Median "
    "interpolates on even counts in both engines (probed); one hash-agg.",
)
def q154_listagg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.expr(
                "listagg(DISTINCT c_mktsegment, '|') WITHIN GROUP (ORDER BY c_mktsegment)"
            ).alias("segments"),
            # floor-at-2-digits, not ROUND: the median is the SAME double in
            # both engines (average of two identical doubles), but a .xx5
            # tie rounds differently (Spark half-up via BigDecimal string,
            # DuckDB half-even on the binary double); floor is a pure
            # function of the shared double, so it can never disagree.
            (F.floor(F.median(F.col("c_acctbal").cast("double")) * 100) / 100).alias(
                "median_bal"
            ),
            F.bool_and(F.col("c_acctbal") > -1000.0).alias("all_above_floor"),
            F.bool_or(F.col("c_acctbal") < 0.0).alias("any_negative"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q182_width_bucket_histogram",
    sql="""
    SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                     WHEN l_extendedprice >= 80000 THEN 21
                     ELSE floor(l_extendedprice / 4000.0) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Equi-width feature binning via width_bucket (Spark 3.5+): histogram "
    "of extendedprice into 20 [0, 80000) buckets with under/overflow bins "
    "0 and 21 -- the deterministic discretization step for feature "
    "engineering and drift monitoring (equi-DEPTH binning would ride "
    "approxQuantile, whose GK-sketch merge is partition-order dependent "
    "and therefore not oracle-able; equi-width is exact).  One hash-agg "
    "over a 22-value key domain; the oracle spells the bucket arithmetic "
    "explicitly (floor((x-lo)/width)+1, clamped).",
)
def q182_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.expr("width_bucket(l_extendedprice, 0.0, 80000.0, 20)").alias("bucket"),
            "l_quantity",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("bucket")
    )
