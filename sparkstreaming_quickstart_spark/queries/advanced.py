"""Advanced surface: exact-moment correlation, ordered collect, grouping sets,
pivot, scalar subqueries, built-in session windows, map + higher-order array
functions, and the Python UDF tiers (pandas scalar UDF, grouped-map).

UDF notes: the pandas scalar UDF and applyInPandas grouped-map are the
sanctioned Python escape hatches (Arrow-batched, SURVEY.md section 2.B "UDF
surface").  Their outputs here are integer/exact-double computations so the
DuckDB oracle stays bit-exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.money import dec
from ..sources.catalog import load_table, register_tables
from . import register


@register(
    "q26_agg_corr",
    sql="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           ROUND(
             (COUNT(*) * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE))
             / (sqrt(COUNT(*) * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE))
                * sqrt(COUNT(*) * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE))), 9) AS price_balance_corr
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Pearson correlation from exact decimal moments (deterministic corr).",
)
def q26_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    n = F.count("*")
    sx = F.sum(dec("o_totalprice")).cast("double")
    sy = F.sum(dec("c_acctbal")).cast("double")
    sxx = F.sum(dec("o_totalprice") * dec("o_totalprice")).cast("double")
    syy = F.sum(dec("c_acctbal") * dec("c_acctbal")).cast("double")
    sxy = F.sum(dec("o_totalprice") * dec("c_acctbal")).cast("double")
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return (
        j.groupBy("c_mktsegment")
        .agg(n.alias("n"), F.round(corr, 9).alias("price_balance_corr"))
        .orderBy("c_mktsegment")
    )


@register(
    "q27_agg_collect",
    sql="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="collect_set with canonical ordering (sort_array); serialized to a "
    "pipe-joined string at the output boundary so the driver's value-hash "
    "comparator (which cannot hash ndarray cells) sees a scalar column.",
)
def q27_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias("segments"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q28_agg_minmax_by",
    sql="""
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rmax
        FROM orders)
    SELECT o_orderpriority,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS cheapest_order,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS priciest_order,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="min_by/max_by with composite tie-break (lowest orderkey wins ties).",
)
def q28_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", F.array(F.col("o_totalprice"), F.col("o_orderkey").cast("double"))).alias(
                "cheapest_order"
            ),
            F.max_by("o_orderkey", F.array(F.col("o_totalprice"), (-F.col("o_orderkey")).cast("double"))).alias(
                "priciest_order"
            ),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q29_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (SQL path through spark.sql).",
)
def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# Gaps-and-islands reformulation of a 30-min-gap session window; shared by
# the batch (q35) and streaming (q84) twins so they cannot drift.
SESSION_WINDOW_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC)
                         > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """


@register(
    "q35_session_window_builtin",
    sql=SESSION_WINDOW_ORACLE,
    doc="Built-in session_window (30-min gap) on batch data; oracle is the "
    "gaps-and-islands reformulation (window end = last event + gap).",
)
def q35_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "q37_pivot",
    sql="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_o,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F'), 0) AS DOUBLE) AS qty_f,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pivot (wide aggregation) expressed as filtered aggregates.",
)
def q37_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("status_f"),
            F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("status_o"),
            F.coalesce(F.sum(F.when(F.col("l_linestatus") == "F", dec("l_quantity"))), zero)
            .cast("double")
            .alias("qty_f"),
            F.coalesce(F.sum(F.when(F.col("l_linestatus") == "O", dec("l_quantity"))), zero)
            .cast("double")
            .alias("qty_o"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q38_scalar_subquery",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,8)) / COUNT(*) FROM orders)
    ORDER BY o_orderkey
    """,
    doc="Scalar subquery: orders above the (decimal-exact) average price.",
)
def q38_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,8)) / COUNT(*) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "q46_map_funcs",
    sql="""
    SELECT event_type, 'n' AS k, CAST(COUNT(*) AS DOUBLE) AS v FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'sum_value' AS k, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
    FROM events GROUP BY event_type
    ORDER BY event_type, k
    """,
    doc="Map construction (create_map) + explode back to rows (map_keys/values "
    "surface), oracled as the equivalent long-form union.",
)
def q46_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )
    mapped = agg.select(
        "event_type",
        F.create_map(
            F.lit("n"), F.col("n"),
            F.lit("sum_value"), F.col("sum_value"),
        ).alias("m"),
    )
    return mapped.select("event_type", F.explode("m").alias("k", "v")).orderBy("event_type", "k")


@register(
    "q47_higher_order",
    sql="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           CAST(list_aggregate([abs(CAST(x AS DOUBLE)) FOR x IN embedding], 'max') AS DOUBLE) AS max_abs,
           len([x FOR x IN embedding IF abs(CAST(x AS DOUBLE)) > 1.0]) AS n_large
    FROM embeddings
    ORDER BY vec_id
    """,
    doc="Higher-order array functions: filter / transform / exists-style "
    "predicates, all inside one projection.",
)
def q47_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double")))).cast("double").alias("max_abs"),
        F.size(F.filter(emb, lambda x: F.abs(x.cast("double")) > 1.0)).cast("bigint").alias("n_large"),
    ).orderBy("vec_id")


@register(
    "q48_pandas_udf",
    sql="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens_udf,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
    doc="Vectorized (Arrow) pandas scalar UDF -- token counting in pandas, "
    "bit-identical to the SQL formulation.",
)
def q48_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.count(" ").add(1).astype("int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_tokens_udf"),
        F.length("text").cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "q49_grouped_map",
    sql="""
    SELECT event_id, event_type,
           CASE WHEN MAX(value) OVER (PARTITION BY event_type) = MIN(value) OVER (PARTITION BY event_type)
                THEN 0.0
                ELSE (value - MIN(value) OVER (PARTITION BY event_type))
                     / (MAX(value) OVER (PARTITION BY event_type) - MIN(value) OVER (PARTITION BY event_type))
           END AS value_minmax
    FROM events
    ORDER BY event_id
    """,
    doc="applyInPandas grouped-map: per-group min-max normalization (exact "
    "double arithmetic, window-function oracle).",
)
def q49_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value_minmax": 0.0 if hi == lo else (pdf["value"] - lo) / (hi - lo),
            }
        )
        return out

    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(normalize, schema="event_id long, event_type string, value_minmax double")
        .orderBy("event_id")
    )


@register(
    "q79_grouped_agg_udaf",
    sql="""
    SELECT l_returnflag,
           ROUND(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT))
                 / (100.0 * SUM(CAST(round(l_discount * 100) AS BIGINT))), 6)
               AS disc_weighted_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="UDAF via a grouped-agg pandas UDF (Arrow-batched, one scalar per "
    "group): discount-weighted mean price.  Prices/discounts are cents/"
    "percent quantities stored as doubles, so both engines recover the "
    "exact integers (round(x*100)), sum those exactly, and divide once -- "
    "order-of-summation float drift (which DID flip the 6th decimal at "
    "sf0.1 with 200k-row groups) is impossible by construction.",
)
def q79_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def weighted_mean(price: pd.Series, weight: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        pct = (weight * 100).round().astype("int64")
        return float((cents * pct).sum() / (100.0 * pct.sum()))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg(), so the row count is a second pandas aggregate.
    @pandas_udf("long")
    def n_rows(price: pd.Series) -> int:
        return len(price)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(weighted_mean("l_extendedprice", "l_discount"), 6).alias("disc_weighted_price"),
            n_rows("l_extendedprice").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q92_unpivot",
    sql="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    ORDER BY p_partkey, metric
    """,
    doc="Unpivot (wide -> long, the inverse of q37's pivot): one row per "
    "(part, metric).  Oracle models it with UNION ALL for portability.",
)
def q92_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.col("p_retailprice"), F.col("p_size").cast("double").alias("p_size"))
        .unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


@register(
    "q112_recursive_cte_spine",
    sql="""
    WITH RECURSIVE months(month_start) AS (
        SELECT TIMESTAMP '1995-01-01'
        UNION ALL
        SELECT month_start + INTERVAL 1 MONTH FROM months
        WHERE month_start < TIMESTAMP '2001-07-01')
    SELECT m.month_start, COUNT(o.o_orderkey) AS n_orders
    FROM months m
    LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.month_start
    GROUP BY m.month_start
    ORDER BY m.month_start
    """,
    doc="Recursive CTE (Spark >=4.0): calendar-spine generation + left join "
    "so empty months appear with zero counts — the gaps-preserving time "
    "series pattern.  Identical SQL runs on both engines.",
)
def q112_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(month_start) AS (
            SELECT TIMESTAMP '1995-01-01'
            UNION ALL
            SELECT month_start + INTERVAL 1 MONTH FROM months
            WHERE month_start < TIMESTAMP '2001-07-01')
        SELECT m.month_start, COUNT(o.o_orderkey) AS n_orders
        FROM months m
        LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.month_start
        GROUP BY m.month_start
        ORDER BY m.month_start
        """
    )


@register(
    "q113_lateral_topk",
    sql="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (SELECT o.o_orderkey, o.o_totalprice
                  FROM orders o WHERE o.o_custkey = c.c_custkey
                  ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 1) t
    WHERE c.c_custkey < 300
    ORDER BY c.c_custkey
    """,
    doc="Correlated LATERAL subquery (per-customer top order).  Catalyst "
    "decorrelates this to a ranked window join — same result as the "
    "row_number formulation (q30) through the SQL-standard spelling.",
)
def q113_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (SELECT o.o_orderkey, o.o_totalprice
                      FROM orders o WHERE o.o_custkey = c.c_custkey
                      ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 1) t
        WHERE c.c_custkey < 300
        ORDER BY c.c_custkey
        """
    )
