"""Time-series / history operators (round 2, third wave): calendar gap-fill
with forward fill, rolling z-score anomaly detection, int8-quantized
max-inner-product search, and SCD2 historization.

Reference context: the reference's only time axis is Kafka arrival order
(SURVEY.md 2.A); these are charter-driven batch analytics over the `events` /
`embeddings` / `orders` fixtures.  All carry full DuckDB value oracles.

Determinism notes (see oracle.py normalization): day/effective columns stay
TIMESTAMP on both sides (DATE round-trips differently through pandas); float
aggregates are rounded to 6 digits; the quantized dot products are integer
arithmetic, exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q135_timeseries_gapfill",
    sql="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               COUNT(*) AS n_events, ROUND(SUM(value), 6) AS day_value
        FROM events GROUP BY 1, 2),
    spine AS (
        SELECT user_id, unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS day
        FROM daily GROUP BY user_id)
    SELECT s.user_id, s.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           last_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day ROWS UNBOUNDED PRECEDING)
               AS value_ffill
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day
    """,
    doc="Calendar gap-fill + forward fill: per-user daily rollup, a "
    "sequence()-exploded day spine between each user's first and last "
    "active day, zero-filled counts and last-observation-carried-forward "
    "values.  Scale: the spine is generated per key (rows ~= keys x span, "
    "no cross join against a global calendar), the fill join shuffles on "
    "(user_id, day), and the forward fill is one per-user window -- all "
    "three stages partition on the user key, so AQE coalesces them into "
    "user-partitioned stages with no driver-side calendar.",
)
def q135_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("day_value")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "q136_anomaly_zscore",
    sql="""
    SELECT user_id, event_id, ROUND(value, 6) AS value,
           ROUND((value - AVG(value) OVER w) / NULLIF(STDDEV_SAMP(value) OVER w, 0), 6) AS z,
           COALESCE(ABS((value - AVG(value) OVER w)
                        / NULLIF(STDDEV_SAMP(value) OVER w, 0)) > 2.5, FALSE) AS is_anomaly
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="Rolling z-score anomaly detection: each event scored against the "
    "mean/stddev of its user's trailing 20-event frame (ordered by ts with "
    "event_id as the unique tie-break -- determinism requires a total "
    "order).  One window shuffle on user_id; the frame is bounded so state "
    "per key is O(20) regardless of history length, which is what makes "
    "this safe on an unbounded 100 TB event log.  z rounded to 6 digits so "
    "Welford-vs-naive variance ulps cannot flip the oracle.",
)
def q136_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev_samp("value").over(w), F.lit(0.0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > 2.5, F.lit(False)).alias("is_anomaly"),
    ).orderBy("user_id", "event_id")


@register(
    "q137_similarity_topk_int8",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v),
    q8 AS (SELECT vec_id,
                  list_transform(v, x -> CAST(round(x * (127.0 / amax)) AS BIGINT)) AS q
           FROM s WHERE amax > 0),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
               list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * b.q[i])) AS dot
        FROM q8 a JOIN q8 b ON a.vec_id < 5 AND b.vec_id >= 5),
    ranked AS (
        SELECT query_id, corpus_id, CAST(dot AS BIGINT) AS dot,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY dot DESC, corpus_id) AS INT) AS rk
        FROM scored)
    SELECT query_id, corpus_id, dot, rk FROM ranked WHERE rk <= 10
    ORDER BY query_id, rk
    """,
    doc="Top-k max-inner-product search over int8-quantized embeddings "
    "(q122's symmetric lattice): the bandwidth-scale ANN path -- 4x "
    "smaller vectors, integer dot products (exact, no float-order "
    "hazards), same broadcast-queries x corpus shape as q54.  Ranking by "
    "(dot DESC, corpus_id) is a total order, so the oracle is exact, not "
    "an invariant.  Scale: corpus side never shuffles (queries broadcast), "
    "per-partition top-k via the window after a corpus-partition-local "
    "score.",
)
def q137_similarity_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    ev = e.select("vec_id", v.alias("v")).withColumn(
        "amax", F.array_max(F.transform("v", lambda x: F.abs(x)))
    )
    scale = F.lit(127.0) / F.col("amax")
    q8 = ev.filter(F.col("amax") > 0).select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * scale).cast("long")).alias("q"),
    )
    queries = q8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    corpus = q8.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("corpus_id"), F.col("q").alias("cq")
    )
    dot = F.aggregate(
        F.zip_with("qq", "cq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), "corpus_id")
    return (
        corpus.crossJoin(F.broadcast(queries))
        .select("query_id", "corpus_id", dot.alias("dot"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "corpus_id", "dot", "rk")
        .orderBy("query_id", "rk")
    )


@register(
    "q138_scd2_orders",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
           o_orderdate AS effective_from,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS effective_to,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM orders
    WHERE o_custkey < 150
    ORDER BY o_custkey, effective_from, o_orderkey
    """,
    doc="SCD Type-2 historization: each customer's order stream becomes "
    "effective-dated rows (effective_from = this order, effective_to = "
    "next order's date, open-ended row flagged current) -- the standard "
    "dimension-history build, expressed as one LEAD window per key with "
    "(date, orderkey) as the deterministic tie-break.  One shuffle on the "
    "dimension key; no self-join (the naive formulation) and no driver "
    "state, so it holds at any history depth.",
)
def q138_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
        F.col("o_orderdate").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("o_custkey", "effective_from", "o_orderkey")
