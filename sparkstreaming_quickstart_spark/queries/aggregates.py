"""Aggregation queries: hash-agg, count-distinct, approx, rollup/cube, stats.

All group-bys are Catalyst HashAggregateExec with map-side partial
aggregation; at 100 TB the reduce-side width is bounded by group cardinality,
not input rows.  Float accumulations that feed the oracle use the decimal
trick (functions/money.py); genuinely approximate ops (HLL++) register
without an oracle -> driver records a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dsum, davg, sql_dsum, sql_davg
from ..sources.catalog import load_table
from . import register


@register(
    "q20_agg_groupby",
    sql=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum('value')} AS sum_value,
           {sql_davg('value')} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Hash aggregation with exact count-distinct and min/max.",
)
def q20_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
            davg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q21_agg_rollup",
    sql="""
    SELECT year(o_orderdate) AS order_year,
           o_orderpriority,
           CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderpriority) AS INT) AS grp,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    ORDER BY grp, order_year NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="ROLLUP hierarchy (year -> priority -> grand total) with GROUPING id.",
)
def q21_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn("order_year", F.year("o_orderdate"))
    return (
        o.rollup("order_year", "o_orderpriority")
        .agg(
            (F.grouping("order_year") * 2 + F.grouping("o_orderpriority")).cast("int").alias("grp"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .orderBy("grp", F.col("order_year").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "q22_agg_cube",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS grp,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY grp, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE over flag x status with GROUPING id.",
)
def q22_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int").alias("grp"),
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("grp", F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "q23_agg_having",
    sql="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    ORDER BY o_custkey
    """,
    doc="Aggregate + HAVING (post-agg filter).",
)
def q23_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .filter(F.col("n_orders") >= 3)
        .orderBy("o_custkey")
    )


@register(
    "q24_agg_approx_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++): the 100 TB cardinality path.  The "
    "sketch value itself is not SQL-reproducible (DuckDB's HLL differs), but "
    "it IS deterministic -- register merges are max-commutative, so the "
    "estimate is partition-order-independent.  The oracle therefore checks "
    "the exact column plus the sketch's accuracy invariant (within +/-5% of "
    "exact at rsd=0.01, ~5 sigma) as a boolean the oracle pins to TRUE.  "
    "Plan note (round 13): combining a DISTINCT aggregate with the HLL in "
    "one agg makes Spark's distinct-rewrite carry the ~16 KB rsd=0.01 "
    "sketch buffer through the per-(flag, orderkey) partial phase -- "
    "measured 106 s at sf1 vs 5.6 + 2.4 s separately.  HLL registers are "
    "duplicate-INSENSITIVE (per-bucket max over hashed values), so both "
    "aggregates here run over one shared pre-distinct projection: the "
    "estimate is bit-identical, the exact count is a cheap count(*), and "
    "the plan pays one shuffle (89 -> ~7 s at sf1).  An approx-ONLY query "
    "at 100 TB should of course skip the distinct entirely -- that is the "
    "sketch's whole point; the distinct here feeds the exact column the "
    "accuracy invariant needs anyway.",
)
def q24_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select("l_returnflag", "l_orderkey").distinct()
    approx = F.approx_count_distinct("l_orderkey", rsd=0.01)
    exact = F.count("*")
    return (
        keys.groupBy("l_returnflag")
        .agg(
            exact.alias("exact_orders"),
            (approx.cast("double") / exact.cast("double")).between(0.95, 1.05).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q25_agg_stats",
    sql="""
    SELECT l_returnflag,
           COUNT(l_quantity) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)
                 - (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity))
                 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)), 6) AS var_pop_q
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Moment statistics via exact decimal sums (deterministic variance).",
)
def q25_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.money import dec

    li = load_table(spark, sf_dir, "lineitem")
    s1 = F.sum(dec("l_quantity")).cast("double")
    s2 = F.sum(dec("l_quantity") * dec("l_quantity")).cast("double")
    n = F.count("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            s1.alias("s1"),
            s2.alias("s2"),
            F.round(s2 / n - (s1 / n) * (s1 / n), 6).alias("var_pop_q"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q67_agg_moments",
    sql="""
    WITH mu AS (SELECT l_returnflag, AVG(l_quantity) AS m, COUNT(*) AS cnt
                FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           MAX(mu.cnt) AS n,
           ROUND((SUM(POW(l_quantity - m, 3)) / MAX(mu.cnt))
                 / POW(SUM(POW(l_quantity - m, 2)) / MAX(mu.cnt), 1.5), 6) AS skew_q,
           ROUND((SUM(POW(l_quantity - m, 4)) / MAX(mu.cnt))
                 / POW(SUM(POW(l_quantity - m, 2)) / MAX(mu.cnt), 2) - 3, 6) AS kurt_q,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_q,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_q,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qp,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS covar_pop_qp
    FROM lineitem l JOIN mu USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="Built-in moment aggregates (skewness/kurtosis population form, "
    "stddev/var sample form, covariance both forms); rounded so one-pass "
    "merge-order float noise cannot flip the oracle hash.",
)
def q67_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.skewness("l_quantity"), 6).alias("skew_q"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt_q"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_q"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_q"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covar_pop_qp"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q69_agg_approx_percentile",
    sql="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS price_q1,
           quantile_disc(l_extendedprice, 0.50) AS price_q2,
           quantile_disc(l_extendedprice, 0.75) AS price_q3,
           quantile_disc(l_quantity, 0.5) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="percentile_approx (Greenwald-Khanna sketch) quartiles per group -- "
    "the streaming/100 TB companion to the exact interpolated q36.  Scalar "
    "columns (the array form broke the driver's hash comparator), and "
    "accuracy=1e7 >> group size at test SF, where the GK sketch degenerates "
    "to exact discrete percentiles == DuckDB quantile_disc (probed equal at "
    "sf0.001 and sf0.01); production dials accuracy down to bound state.",
)
def q69_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10_000_000)
    return (
        li.groupBy("l_returnflag")
        .agg(
            q[0].alias("price_q1"),
            q[1].alias("price_q2"),
            q[2].alias("price_q3"),
            F.percentile_approx("l_quantity", 0.5, 10_000_000).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )
