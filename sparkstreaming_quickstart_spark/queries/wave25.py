"""Wave-25 operators (round 8, continued): 1-D optimal transport distance
between event-value distributions, RFM customer segmentation over the
TPC-H orders table, and the cumulative-gains (lift) table for a score
ranking.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B statistics/analytics families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q337: 1-D Wasserstein (earth mover's) distance between two distributions
# ---------------------------------------------------------------------------


@register(
    "q337_wasserstein_1d",
    sql="""
    WITH g AS (
        SELECT value AS v,
               count_if(event_type = 'purchase') AS ca,
               count_if(event_type = 'view') AS cb
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY value),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g),
    c AS (
        SELECT v,
               SUM(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
               SUM(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb,
               LEAD(v) OVER (ORDER BY v) AS v_next
        FROM g)
    SELECT CAST(tot.na AS BIGINT) AS n_a, CAST(tot.nb AS BIGINT) AS n_b,
           ROUND(SUM(abs(c.cca / CAST(tot.na AS DOUBLE)
                         - c.ccb / CAST(tot.nb AS DOUBLE))
                     * (c.v_next - c.v)), 6) AS wasserstein
    FROM c, tot
    WHERE c.v_next IS NOT NULL
    GROUP BY tot.na, tot.nb
    """,
    doc="1-D Wasserstein (earth mover's) distance between the purchase and "
    "view value distributions: W1 = integral |F_a - F_b| dv, computed "
    "exactly as a sum over the sorted distinct-value grid (|CDF gap| x "
    "gap width) -- the metric companion of q250's KS statistic (KS is "
    "the sup of the CDF gap; W1 is its integral, sensitive to WHERE "
    "distributions differ, the standard drift measure for numeric "
    "features).  Counts are exact; the CDF ratios and products are the "
    "only floats, rounded at 6 after the sum.  Plan: q250's "
    "distinct-value spelling -- one hash-agg to the value domain, one "
    "cumulative window over that bounded frame (never per-row ranks), "
    "single-row combine.",
)
def q337_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    g = e.groupBy(F.col("value").alias("v")).agg(
        F.count_if(F.col("event_type") == "purchase").alias("ca"),
        F.count_if(F.col("event_type") == "view").alias("cb"),
    )
    tot = g.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        "v",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        F.lead("v").over(Window.orderBy("v")).alias("v_next"),
    )
    gap = F.abs(
        F.col("cca") / F.col("na").cast("double")
        - F.col("ccb") / F.col("nb").cast("double")
    ) * (F.col("v_next") - F.col("v"))
    return (
        c.filter(F.col("v_next").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(F.round(F.sum(gap), 6).alias("wasserstein"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "wasserstein",
        )
    )


# ---------------------------------------------------------------------------
# q338: RFM customer segmentation (orders table)
# ---------------------------------------------------------------------------


@register(
    "q338_rfm_segmentation",
    sql="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
               COUNT(*) AS frequency,
               SUM(o_totalprice) AS monetary
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT custkey, recency_days, frequency, monetary,
               NTILE(4) OVER (ORDER BY recency_days, custkey) AS r,
               NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f,
               NTILE(4) OVER (ORDER BY ROUND(monetary, 6) DESC, custkey) AS m
        FROM base)
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(recency_days), 6) AS avg_recency_days,
           ROUND(AVG(frequency), 6) AS avg_frequency,
           ROUND(AVG(monetary), 6) AS avg_monetary
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
    doc="RFM customer segmentation over orders: per customer, recency "
    "(days since last order, relative to the corpus max date so the "
    "query is reproducible), frequency (order count), monetary (total "
    "spend), each quartiled with NTILE(4); the rollup reports segment "
    "sizes and centroids -- the classic lifecycle-marketing table, and "
    "the repo's only wave using orders for behavioral (not relational) "
    "analytics.  Rank keys are exact ints except monetary, which ranks "
    "ROUNDED at 6 with a custkey tie-break (rank-before-round "
    "discipline; r and f are integers so only the tie-break matters).  "
    "Plan: one customer hash-agg, three NTILE windows over the "
    "customer-bounded frame (|customers| << |orders|), bounded 4x4x4 "
    "rollup.  At 100 TB the windows run on the aggregated customer "
    "frame, never the order log.",
)
def q338_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("mx"))
    base = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("mx"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    r_w = Window.orderBy("recency_days", "custkey")
    f_w = Window.orderBy(F.col("frequency").desc(), "custkey")
    m_w = Window.orderBy(F.round("monetary", 6).desc(), "custkey")
    scored = base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).alias("r"),
        F.ntile(4).over(f_w).alias("f"),
        F.ntile(4).over(m_w).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.avg("recency_days"), 6).alias("avg_recency_days"),
            F.round(F.avg("frequency"), 6).alias("avg_frequency"),
            F.round(F.avg("monetary"), 6).alias("avg_monetary"),
        )
        .select(
            F.col("r").cast("bigint").alias("r"),
            F.col("f").cast("bigint").alias("f"),
            F.col("m").cast("bigint").alias("m"),
            "n_customers",
            "avg_recency_days",
            "avg_frequency",
            "avg_monetary",
        )
        .orderBy("r", "f", "m")
    )


# ---------------------------------------------------------------------------
# q339: cumulative gains / lift table for a behavioral score
# ---------------------------------------------------------------------------


@register(
    "q339_cumulative_gains",
    sql="""
    WITH u AS (
        SELECT user_id, COUNT(*) AS activity,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id),
    scored AS (
        SELECT activity, converted,
               NTILE(10) OVER (ORDER BY activity DESC, user_id) AS decile
        FROM u),
    d AS (
        SELECT decile, COUNT(*) AS n_users, SUM(converted) AS n_converted
        FROM scored GROUP BY decile),
    t AS (SELECT SUM(n_users) AS nu, SUM(n_converted) AS nc FROM d)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_converted AS BIGINT) AS n_converted,
           ROUND(SUM(n_converted) OVER (ORDER BY decile) / CAST(t.nc AS DOUBLE), 6)
               AS cum_capture,
           ROUND((n_converted / CAST(n_users AS DOUBLE))
                 / (t.nc / CAST(t.nu AS DOUBLE)), 6) AS lift
    FROM d, t
    ORDER BY decile
    """,
    doc="Cumulative-gains / lift table: users ranked into deciles by an "
    "activity score (event count, the behavioral stand-in for a model "
    "score), against purchase conversion -- per decile the conversion "
    "capture and lift vs the base rate, the standard 'is the ranking "
    "worth acting on' readout for any scoring model (q220/q247 evaluate "
    "calibration and confusion; gains evaluates DEPLOYMENT value).  "
    "Decile assignment is NTILE on exact integer activity with a "
    "user_id tie-break; all floats are final rounded ratios.  Plan: one "
    "user hash-agg, one NTILE window over the user-bounded frame, "
    "10-row rollup and cumulative window -- the corpus is scanned "
    "once.",
)
def q339_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count("*").alias("activity"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
    )
    wd = Window.orderBy(F.col("activity").desc(), "user_id")
    scored = u.select("activity", "converted", F.ntile(10).over(wd).alias("decile"))
    d = scored.groupBy("decile").agg(
        F.count("*").alias("n_users"), F.sum("converted").alias("n_converted")
    )
    t = d.agg(F.sum("n_users").alias("nu"), F.sum("n_converted").alias("nc"))
    wc = Window.orderBy("decile")
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("n_converted").cast("bigint").alias("n_converted"),
            F.round(
                F.sum("n_converted").over(wc) / F.col("nc").cast("double"), 6
            ).alias("cum_capture"),
            F.round(
                (F.col("n_converted") / F.col("n_users").cast("double"))
                / (F.col("nc") / F.col("nu").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )
