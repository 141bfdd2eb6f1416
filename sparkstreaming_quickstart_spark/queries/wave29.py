"""Wave-29 operator (round 8, final): mergeable moment statistics -- the
Chan/Welford parallel-combine identity made an explicit, value-checked
query.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; this is a charter extension in the SURVEY.md
section-2.B statistics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q348_mergeable_moments",
    sql="""
    WITH per AS (
        SELECT event_type AS grp, COUNT(*) AS n, AVG(value) AS mean,
               SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS m2
        FROM events GROUP BY event_type),
    merged AS (
        SELECT 'MERGED' AS grp, SUM(n) AS n,
               SUM(n * mean) / SUM(n) AS mean,
               SUM(m2) + SUM(n * mean * mean)
                   - (SUM(n * mean) * SUM(n * mean)) / SUM(n) AS m2
        FROM per),
    direct AS (
        SELECT 'DIRECT' AS grp, COUNT(*) AS n, AVG(value) AS mean,
               SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS m2
        FROM events),
    u AS (
        SELECT * FROM per UNION ALL
        SELECT * FROM merged UNION ALL SELECT * FROM direct)
    SELECT grp, CAST(n AS BIGINT) AS n, ROUND(mean, 6) AS mean,
           ROUND(m2 / (n - 1), 6) AS variance
    FROM u ORDER BY grp
    """,
    doc="Mergeable moment statistics: per-group (n, mean, M2) summaries, "
    "their Chan-style parallel combine (the merged row), and the direct "
    "single-pass computation side by side -- the identity that makes "
    "variance a ONE-SCAN distributed statistic (each shard ships three "
    "numbers; the combine is associative), which is how every 100 TB "
    "mean/variance in this repo actually executes inside Spark's partial "
    "aggregation.  The MERGED and DIRECT rows agreeing at round-6 IS the "
    "check -- the query makes the engine's internal merge law an "
    "observable, oracle-verified contract (the same law q328's replicate "
    "reshape and q325's pooled SD rely on).  All inputs are one "
    "conditional hash-agg; the combine is a k-row fold.  Float note: "
    "M2 via sum-of-squares differs from Welford's online update in "
    "rounding, not value class; round-6 absorbs the reduce-order drift "
    "(SCALING float precedent).",
)
def q348_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(F.col("event_type").alias("grp")).agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count("*") * F.avg("value") * F.avg("value")
        ).alias("m2"),
    )
    per = per.localCheckpoint(eager=True)  # consumed by union and the combine
    merged = per.agg(
        F.lit("MERGED").alias("grp"),
        F.sum("n").alias("n"),
        (F.sum(F.col("n") * F.col("mean")) / F.sum("n")).alias("mean"),
        (
            F.sum("m2")
            + F.sum(F.col("n") * F.col("mean") * F.col("mean"))
            - (F.sum(F.col("n") * F.col("mean")) * F.sum(F.col("n") * F.col("mean")))
            / F.sum("n")
        ).alias("m2"),
    ).select("grp", "n", "mean", "m2")
    direct = e.agg(
        F.lit("DIRECT").alias("grp"),
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count("*") * F.avg("value") * F.avg("value")
        ).alias("m2"),
    ).select("grp", "n", "mean", "m2")
    u = per.unionByName(merged).unionByName(direct)
    return u.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.round("mean", 6).alias("mean"),
        F.round(F.col("m2") / (F.col("n") - 1), 6).alias("variance"),
    ).orderBy("grp")
