"""Event-analytics operators: funnel conversion and retention cohorts.

The classic product-analytics shapes every events pipeline ends up running;
both are single-pass aggregations with full DuckDB value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q149_funnel_steps",
    sql="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id),
    flags AS (
        SELECT user_id,
               (t_view IS NOT NULL) AS s1,
               (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view) AS s2,
               (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view
                AND t_purchase IS NOT NULL AND t_purchase >= t_click) AS s3
        FROM per_user)
    SELECT 'view' AS step, CAST(1 AS INT) AS step_order,
           CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_users FROM flags
    UNION ALL
    SELECT 'view>click', 2, CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 'view>click>purchase', 3, CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    ORDER BY step_order
    """,
    doc="Funnel conversion (view -> click -> purchase, ordered by each "
    "user's FIRST occurrence of every step): one hash-agg collapses the "
    "event log to a row per user (min timestamp per step -- conditional "
    "aggregation, no joins, no window), then three counts.  The standard "
    "product-analytics funnel without MATCH_RECOGNIZE: at 100 TB this is "
    "one shuffle on user_id and a constant-size second agg.",
)
def q149_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_view"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") >= F.col("t_click"))
    flags = per_user.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    counts = flags.agg(
        F.sum(F.when(F.col("s1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("s2"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("s3"), 1).otherwise(0)).cast("long").alias("n3"),
    )
    steps = counts.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("step"), F.lit(1).alias("step_order"), F.col("n1").alias("n_users")),
                F.struct(F.lit("view>click").alias("step"), F.lit(2).alias("step_order"), F.col("n2").alias("n_users")),
                F.struct(
                    F.lit("view>click>purchase").alias("step"), F.lit(3).alias("step_order"), F.col("n3").alias("n_users")
                ),
            )
        ).alias("r")
    )
    return steps.select("r.step", "r.step_order", "r.n_users").orderBy("step_order")


@register(
    "q150_retention_cohorts",
    sql="""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
        FROM events e JOIN firsts f USING (user_id))
    SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
    doc="Retention cohorts: users grouped by first-active day, counted "
    "distinct per (cohort, day-offset) for the first week.  Two shuffles "
    "on user_id (first-day agg + the cohort join -- co-partitioned, so "
    "AQE plans them back to back without a third exchange) and a distinct "
    "over (user, cohort, offset) that collapses before the final "
    "cohort-sized aggregation.  The offset cap bounds output to cohorts x "
    "8 rows regardless of corpus size.",
)
def q150_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", F.col("day_offset").cast("int").alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q151_fuzzy_title_join",
    sql="""
    WITH t AS (
        SELECT doc_id,
               array_to_string(string_split(text, ' ')[1:5], ' ') AS title,
               string_split(text, ' ')[1] AS blk
        FROM documents)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(levenshtein(a.title, b.title) AS INT) AS edit_dist
    FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= 10
    ORDER BY d1, d2
    """,
    doc="Fuzzy string-similarity join (record linkage): 5-token document "
    "prefixes matched within edit distance 10, candidates blocked on the "
    "first token so the pair space is per-block, not corpus^2 -- the "
    "standard blocking+verify shape fuzzy joins take at scale.  The "
    "verify uses Spark's thresholded levenshtein (early-exits the DP "
    "once the budget is exceeded -- O(threshold x len) not O(len^2)); "
    "the DuckDB oracle computes the full distance and filters, same "
    "result.  Production blocking would add a length band and a q-gram "
    "bucket; the plan shape (equi-join on block key + cheap verify) is "
    "the part that survives 100x.",
)
def q151_fuzzy_title_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, 1, 5)).alias("title"),
        F.element_at(toks, 1).alias("blk"),
    )
    a = t.select(F.col("doc_id").alias("d1"), F.col("title").alias("t1"), "blk")
    b = t.select(F.col("doc_id").alias("d2"), F.col("title").alias("t2"), "blk")
    # Catalyst broadcasts b, so pair enumeration runs at a's partition count
    # -- the parquet SPLIT count (3 at sf1), and a Zipf-hot block (top first
    # token: 6.4k docs = 20M pairs at sf1) lands in one task.  Hash-spread a
    # on d1 first: under the broadcast each a-row probes its whole block
    # from the map, so spreading a's rows spreads the hot block's pair
    # enumeration evenly -- no salting needed until b outgrows broadcast
    # (then: blocking + salted_join, see docstring).  The partition COUNT
    # must be explicit: an unsized repartition(col) is REPARTITION_BY_COL,
    # which AQE coalesces right back to ~1 partition because the probe
    # side's map output is tiny -- the blowup is post-join, invisible to
    # the coalescer.  Round-11 sf1 finding, both halves.
    a = a.repartition(spark.sparkContext.defaultParallelism, F.col("d1"))
    pairs = a.join(b, "blk").filter(F.col("d1") < F.col("d2"))
    scored = pairs.select(
        "d1", "d2", F.levenshtein(F.col("t1"), F.col("t2"), 10).alias("edit_dist")
    )
    return scored.filter(F.col("edit_dist") >= 0).orderBy("d1", "d2")
