"""Wave-34 operators (round 9, continued): sequential testing, forecast
calibration decomposition, and distributional treatment effects -- closing
the experimentation-analytics family around q353/q354/q358.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B statistics/experimentation families.

Engine-exactness notes:
- q360's log-likelihood slopes are PYTHON-evaluated double literals
  embedded in both engines' plans, so llr = s*l1 + (n-s)*l0 is the same
  IEEE expression on both sides; the ordered cumulative window adds the
  same doubles in the same order, and the decision thresholds compare
  ROUND(llr_cum, 9) (round-before-threshold discipline).
- q361's per-band forecasts are fixed literals (band midpoints), so every
  decomposition term derives from exact BIGINT counts with one final
  division.
- q362 uses percentile_disc at the deciles -- probed identical index
  conventions (ceil(q*n)-th smallest) in Spark and DuckDB on n=7/10/13
  grids -- over exact integer cents, so every quantile is an exact stored
  value and the QTE differences need no rounding tolerance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q360: SPRT sequential conversion test over daily batches
# ---------------------------------------------------------------------------

_SPRT_P0 = 0.19
_SPRT_P1 = 0.21
_SPRT_ALPHA = 0.05
_SPRT_BETA = 0.05
_SPRT_L1 = math.log(_SPRT_P1 / _SPRT_P0)
_SPRT_L0 = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
_SPRT_A = math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA)  # accept H1 above
_SPRT_B = math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA))  # accept H0 below


@register(
    "q360_sprt_conversion",
    sql=f"""
    WITH daily AS (
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
        FROM events GROUP BY 1),
    llr AS (
        SELECT day, n, s,
               s * {_SPRT_L1!r} + (n - s) * {_SPRT_L0!r} AS llr_day,
               SUM(s * {_SPRT_L1!r} + (n - s) * {_SPRT_L0!r})
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS llr_cum
        FROM daily)
    SELECT day, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS conversions,
           ROUND(llr_day, 6) + 0.0 AS llr_day,
           ROUND(llr_cum, 6) + 0.0 AS llr_cum,
           CASE WHEN ROUND(llr_cum, 9) >= {_SPRT_A!r} THEN 'accept_h1'
                WHEN ROUND(llr_cum, 9) <= {_SPRT_B!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr ORDER BY day
    """,
    doc=f"Wald SPRT over daily conversion batches (H0: p={_SPRT_P0}, H1: "
    f"p={_SPRT_P1}, alpha=beta={_SPRT_ALPHA}): per-day and cumulative "
    "log-likelihood ratios with the accept/continue decision at each "
    "day -- the always-monitoring sequential companion to q229's "
    "fixed-horizon z-test (peeking at a z-test inflates false "
    "positives; the SPRT's boundaries are valid at every look).  The "
    "LLR slopes and boundaries are Python-evaluated double literals "
    "embedded in BOTH engines' plans, counts are exact, the cumulative "
    "window adds identical doubles in day order, and decisions compare "
    "ROUND(llr_cum, 9) -- engine-exact end to end.  Plan: one corpus "
    "scan -> 30-row daily frame -> one ordered window on that bounded "
    "frame; at 100 TB the cost is the daily hash-agg.",
)
def q360_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "day"
            ),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
        .groupBy("day")
        .agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    )
    llr_day = F.col("s") * F.lit(_SPRT_L1) + (F.col("n") - F.col("s")) * F.lit(
        _SPRT_L0
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    out = daily.select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.col("s").cast("bigint").alias("conversions"),
        llr_day.alias("ld"),
        F.sum(llr_day).over(w).alias("lc"),
    )
    gate = F.round(F.col("lc"), 9)
    return out.select(
        "day",
        "n",
        "conversions",
        (F.round("ld", 6) + F.lit(0.0)).alias("llr_day"),
        (F.round("lc", 6) + F.lit(0.0)).alias("llr_cum"),
        F.when(gate >= _SPRT_A, "accept_h1")
        .when(gate <= _SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q361: Murphy decomposition of the Brier score
# ---------------------------------------------------------------------------

_BRIER_BAND = 25.0
_BRIER_MAX_BAND = 19
_BRIER_BANDS = _BRIER_MAX_BAND + 1


@register(
    "q361_brier_decomposition",
    sql=f"""
    WITH e AS (
        SELECT LEAST(CAST(floor(value / {_BRIER_BAND}) AS BIGINT), {_BRIER_MAX_BAND}) AS band,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
        FROM events),
    b AS (SELECT band, COUNT(*) AS n, SUM(o) AS s FROM e GROUP BY band),
    tot AS (SELECT SUM(n) AS nn, SUM(s) AS ss FROM b),
    terms AS (
        SELECT
            SUM(s * POW((band + 0.5) / {_BRIER_BANDS} - 1.0, 2)
                + (n - s) * POW((band + 0.5) / {_BRIER_BANDS}, 2)) AS bsum,
            SUM(n * POW((band + 0.5) / {_BRIER_BANDS}
                        - CAST(s AS DOUBLE) / n, 2)) AS rel,
            SUM(n * POW(CAST(s AS DOUBLE) / n
                        - (SELECT CAST(ss AS DOUBLE) / nn FROM tot), 2)) AS res
        FROM b)
    SELECT CAST(tot.nn AS BIGINT) AS n,
           ROUND(terms.bsum / tot.nn, 6) AS brier,
           ROUND(terms.rel / tot.nn, 6) AS reliability,
           ROUND(terms.res / tot.nn, 6) AS resolution,
           ROUND((CAST(tot.ss AS DOUBLE) / tot.nn)
                 * (1.0 - CAST(tot.ss AS DOUBLE) / tot.nn), 6) AS uncertainty
    FROM terms, tot
    """,
    doc="Murphy decomposition of the Brier score (BS = reliability - "
    "resolution + uncertainty) for a banded forecast (f_k = band "
    "midpoint (k+0.5)/20 predicting is-purchase): reliability is the "
    "calibration gap q353's isotonic fit removes, resolution is the "
    "discrimination the forecast actually has, uncertainty is the "
    "outcome's irreducible variance -- the standard diagnostic that "
    "says WHY a probabilistic quality score is good or bad, not just "
    "how good (complements q247's reliability diagram and q342's "
    "AUC).  Forecast values are fixed literals, every term derives "
    "from exact BIGINT band counts with one division at the end, and "
    "the additive identity is pinned by the reference test.  Plan: one "
    "corpus scan -> 20-row band frame -> single-row combine.",
)
def q361_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = (
        e.select(
            F.least(
                F.floor(F.col("value") / _BRIER_BAND).cast("bigint"),
                F.lit(_BRIER_MAX_BAND),
            ).alias("band"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("o"),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.sum("o").alias("s"))
        .localCheckpoint(eager=True)  # feeds totals and the three terms
    )
    tot = b.agg(F.sum("n").alias("nn"), F.sum("s").alias("ss"))
    fk = (F.col("band") + 0.5) / _BRIER_BANDS
    obar = F.col("ss").cast("double") / F.col("nn")
    terms = (
        b.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("s") * F.pow(fk - 1.0, 2)
                + (F.col("n") - F.col("s")) * F.pow(fk, 2)
            ).alias("bsum"),
            F.sum(
                F.col("n") * F.pow(fk - F.col("s").cast("double") / F.col("n"), 2)
            ).alias("rel"),
            F.sum(
                F.col("n")
                * F.pow(F.col("s").cast("double") / F.col("n") - obar, 2)
            ).alias("res"),
        )
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("nn").cast("bigint").alias("n"),
        F.round(F.col("bsum") / F.col("nn"), 6).alias("brier"),
        F.round(F.col("rel") / F.col("nn"), 6).alias("reliability"),
        F.round(F.col("res") / F.col("nn"), 6).alias("resolution"),
        F.round(obar * (1.0 - obar), 6).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# q362: quantile treatment effects (QTE) at the deciles
# ---------------------------------------------------------------------------

_QTE_SALT = "cuped42|"  # same assignment as q358: QTE is its distributional view


@register(
    "q362_quantile_treatment_effects",
    sql=f"""
    WITH u AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('{_QTE_SALT}' || user_id), 1, 8)
                    AS BIGINT) % 2 AS INT) AS arm,
               SUM(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY user_id),
    q AS (
        SELECT quantile_disc(CASE WHEN arm = 0 THEN cents END,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qc,
               quantile_disc(CASE WHEN arm = 1 THEN cents END,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qt
        FROM u)
    SELECT CAST(d.d AS BIGINT) AS decile,
           CAST(qc[d.d] AS BIGINT) AS q_control_cents,
           CAST(qt[d.d] AS BIGINT) AS q_treat_cents,
           CAST(qt[d.d] - qc[d.d] AS BIGINT) AS qte_cents
    FROM q, (SELECT unnest(generate_series(1, 9)) AS d) d
    ORDER BY decile
    """,
    doc="Quantile treatment effects at the deciles: per-arm "
    "percentile_disc of per-user total cents (the q358 CUPED "
    "assignment's distributional view) -- mean uplift can hide a "
    "heavy-tail-only effect; the QTE profile shows WHERE in the "
    "outcome distribution the arms differ.  percentile_disc returns "
    "exact stored integer cents and both engines use the same "
    "ceil(q*n) index convention (probed on n=7/10/13 grids; the q174 "
    "contract), so every quantile and difference is integer-exact "
    "with no rounding tolerance.  Plan: per-user hash-agg, then one "
    "grouped-aggregate pass per arm over the user frame (conditional "
    "quantiles, no join); at 100 TB the user frame is the only "
    "shuffle.",
)
def q362_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_bucket

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    ).select(
        md5_bucket(F.col("user_id"), _QTE_SALT, 2).cast("int").alias("arm"), "cents"
    )
    u.createOrReplaceTempView("qte_users")
    # ONE aggregate pass computes all 18 conditional quantiles (no
    # per-decile re-scan of the user frame -- rule 9 by construction),
    # then a constant-width stack pivots them to decile rows.
    aggs = ", ".join(
        f"percentile_disc({q / 10.0}) WITHIN GROUP "
        f"(ORDER BY CASE WHEN arm = {arm} THEN cents END) AS p{arm}_{q}"
        for q in range(1, 10)
        for arm in (0, 1)
    )
    wide = spark.sql(f"SELECT {aggs} FROM qte_users")
    stack = ", ".join(f"{q}L, p0_{q}, p1_{q}" for q in range(1, 10))
    out = wide.selectExpr(
        f"stack(9, {stack}) AS (decile, q_control, q_treat)"
    )
    return out.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("q_control").cast("bigint").alias("q_control_cents"),
        F.col("q_treat").cast("bigint").alias("q_treat_cents"),
        (F.col("q_treat") - F.col("q_control")).cast("bigint").alias("qte_cents"),
    ).orderBy("decile")
