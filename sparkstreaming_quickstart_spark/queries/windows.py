"""Window-function queries: ranking, analytic (lag/lead), frames, top-k per
group, session windows (gaps-and-islands).

Window partitioning shuffles once on the partition key; every function over
the same (partitionBy, orderBy) shares that single shuffle/sort.  Orderings
always include a unique tiebreak column so results are total-ordered and
oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import dec
from ..sources.catalog import load_table
from . import register


@register(
    "q30_window_topk",
    sql="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Top-k per group via row_number (the scalable per-group top-k).",
)
def q30_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q31_window_ranks",
    sql="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK()        OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS drnk,
           NTILE(4)      OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
    FROM customer
    ORDER BY c_mktsegment, rnk, c_custkey
    """,
    doc="Ranking family: rank / dense_rank / ntile over one shared window sort.",
)
def q31_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("c_mktsegment", "rnk", "c_custkey")


@register(
    "q32_window_running",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_order,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_order
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="Analytic functions: running decimal-exact sum + lag/lead.",
)
def q32_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(wf).cast("double").alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "q33_window_frame",
    sql="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt_3,
           CAST(MIN(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS min_3
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="Bounded ROWS frame (trailing window of 3).",
)
def q33_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("cnt_3"),
        F.min("value").over(w).cast("double").alias("min_3"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "q34_session_windows",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                         > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Sessionization (gaps-and-islands, 30-min gap) -- the batch twin of "
    "streaming session_window; one shuffle on user_id.",
)
def q34_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # Evaluate lag(ts) ONCE in its own projection: inlining it into both
    # arms of the gap predicate leaves two identical lag window expressions
    # in the physical Window operator (Catalyst does not dedupe them).
    prev = e.select("user_id", "ts", F.lag("ts").over(w).alias("__prev"))
    flagged = prev.select(
        "user_id",
        "ts",
        # Interval arithmetic (not unix_micros) so the query is agnostic to
        # whether the parquet reader surfaces ts as TIMESTAMP or TIMESTAMP_NTZ.
        F.when(
            F.col("__prev").isNull()
            | (F.col("ts") - F.col("__prev") > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select("user_id", "ts", F.sum("new_session").over(w2).cast("bigint").alias("session_id"))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q66_window_distribution",
    sql="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
    ORDER BY o_orderpriority, o_totalprice, o_orderkey
    """,
    doc="Distribution window functions: percent_rank, cume_dist, "
    "first_value/last_value with an explicit unbounded ROWS frame.",
)
def q66_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(wall).alias("priciest_order"),
    ).orderBy("o_orderpriority", "o_totalprice", "o_orderkey")


@register(
    "q90_window_range_frame",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS spend_30d
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="Value-based RANGE window frame (trailing 30 days per customer; peers "
    "at equal order dates share the frame) -- complements q33's ROWS frames. "
    "Spark side orders by epoch seconds with an equivalent numeric range.",
)
def q90_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.money import dec

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "q106_window_nth_value",
    sql="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           nth_value(c_custkey, 2) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest,
           lag(c_custkey, 2, CAST(-1 AS BIGINT)) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS two_above,
           lead(c_custkey, 2, CAST(-1 AS BIGINT)) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS two_below
    FROM customer
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
    doc="nth_value over a full-partition frame plus lag/lead with offset 2 "
    "and explicit defaults (complements q32's offset-1 lag/lead and q66's "
    "first_value/last_value).",
)
def q106_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.nth_value("c_custkey", 2).over(wfull).alias("second_richest"),
        F.lag("c_custkey", 2, -1).over(w).alias("two_above"),
        F.lead("c_custkey", 2, -1).over(w).alias("two_below"),
    ).orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
