"""Wave-14 operators (round 3): experimentation depth and robust statistics
-- difference-in-differences estimation, experiment power / minimum
detectable effect, and median-absolute-deviation robust scale, all from
exact integer sufficient statistics (the round-3 float rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q276: difference-in-differences estimator
# ---------------------------------------------------------------------------

_DID_SPLIT = "2024-01-16"


@register(
    "q276_diff_in_diff",
    sql=f"""
    WITH cells AS (
        SELECT (user_id % 2 = 1) AS treated,
               (ts >= TIMESTAMP '{_DID_SPLIT} 00:00:00') AS post,
               COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT treated, post, n,
               cents / (100.0 * n) AS mean_value
        FROM cells),
    did AS (
        SELECT
            (MAX(CASE WHEN treated AND post THEN mean_value END)
             - MAX(CASE WHEN treated AND NOT post THEN mean_value END))
            - (MAX(CASE WHEN NOT treated AND post THEN mean_value END)
               - MAX(CASE WHEN NOT treated AND NOT post THEN mean_value END)) AS est
        FROM m)
    SELECT m.treated, m.post, CAST(m.n AS BIGINT) AS n,
           ROUND(m.mean_value, 6) AS mean_value,
           ROUND(did.est, 6) AS did_estimate
    FROM m, did
    ORDER BY m.treated, m.post
    """,
    doc="Difference-in-differences: the four (treated x pre/post) cell "
    "means and the DID estimate (treated delta minus control delta) -- "
    "the quasi-experimental effect estimator when randomization is a "
    "deterministic assignment rule (user_id parity here) rather than a "
    "coin flip.  One hash-agg over 4 cells with exact integer cents; "
    "every mean is one float division, so both engines agree to the "
    "last bit.",
)
def q276_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.col("ts") >= F.lit(f"{_DID_SPLIT} 00:00:00").cast("timestamp")).alias("post"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    m = cells.select(
        "treated", "post", "n", (F.col("cents") / (100.0 * F.col("n"))).alias("mean_value")
    )
    def cell(t, p):
        return F.max(F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean_value")))
    did = m.agg(
        ((cell(True, True) - cell(True, False)) - (cell(False, True) - cell(False, False))).alias("est")
    )
    return (
        m.crossJoin(F.broadcast(did))
        .select(
            "treated", "post", F.col("n").cast("bigint").alias("n"),
            F.round("mean_value", 6).alias("mean_value"),
            F.round("est", 6).alias("did_estimate"),
        )
        .orderBy("treated", "post")
    )


# ---------------------------------------------------------------------------
# q277: experiment power / minimum detectable effect
# ---------------------------------------------------------------------------

_Z_ALPHA = 1.959963985  # two-sided alpha = 0.05
_Z_BETA = 0.8416212336  # power = 0.80


@register(
    "q277_experiment_power",
    sql=f"""
    WITH arms AS (
        SELECT (user_id % 2 = 1) AS treated,
               COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS BIGINT)) AS sx,
               SUM(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) AS sxx
        FROM events GROUP BY 1),
    v AS (
        SELECT treated, n,
               (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) / 10000.0 AS var
        FROM arms)
    SELECT CAST(a.n AS BIGINT) AS n_treat, CAST(b.n AS BIGINT) AS n_control,
           ROUND(a.var, 6) AS var_treat,
           ROUND(b.var, 6) AS var_control,
           ROUND(({_Z_ALPHA} + {_Z_BETA})
                 * sqrt(a.var / a.n + b.var / b.n), 6) AS mde
    FROM v a, v b WHERE a.treated AND NOT b.treated
    """,
    doc="Experiment power pre-flight: with the observed per-arm variances "
    "and sample sizes, the minimum detectable effect at alpha=0.05 / "
    "power=0.80 (z constants as shared literals) -- the 'is this "
    "experiment even worth running' number that belongs NEXT TO q229's "
    "z-test, computed before the treatment ships.  Sufficient-statistics "
    "shape: one 2-cell hash-agg with exact integer cents, identical "
    "float derivation both engines.",
)
def q277_experiment_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    arms = e.groupBy((F.col("user_id") % 2 == 1).alias("treated")).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("sx"),
        # Decimal square-sum: cents^2 is ~1e16 for a $1e7 value -- the
        # BIGINT sum ANSI-aborts within a few hundred such rows
        # (round-7 int-overflow audit; q263 accumulator pattern).
        F.sum(cents.cast("decimal(38,0)") * cents).alias("sxx"),
    )
    v = arms.select(
        "treated",
        "n",
        (
            (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
            / 10000.0
        ).alias("var"),
    )
    a = v.filter("treated").select(
        F.col("n").alias("n_treat"), F.col("var").alias("var_treat")
    )
    b = v.filter("NOT treated").select(
        F.col("n").alias("n_control"), F.col("var").alias("var_control")
    )
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n_treat").cast("bigint").alias("n_treat"),
        F.col("n_control").cast("bigint").alias("n_control"),
        F.round("var_treat", 6).alias("var_treat"),
        F.round("var_control", 6).alias("var_control"),
        F.round(
            (_Z_ALPHA + _Z_BETA)
            * F.sqrt(
                F.col("var_treat") / F.col("n_treat")
                + F.col("var_control") / F.col("n_control")
            ),
            6,
        ).alias("mde"),
    )


# ---------------------------------------------------------------------------
# q278: median absolute deviation (robust scale) per event_type
# ---------------------------------------------------------------------------


@register(
    "q278_mad_robust_scale",
    sql="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    h AS (SELECT event_type, cents, COUNT(*) AS m FROM c GROUP BY 1, 2),
    cum AS (
        SELECT event_type, cents, m,
               SUM(m) OVER (PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
               SUM(m) OVER (PARTITION BY event_type) AS n
        FROM h),
    med AS (
        SELECT event_type, n,
               MIN(CASE WHEN cm >= (n + 1) // 2 THEN cents END)
             + MIN(CASE WHEN cm >= n // 2 + 1 THEN cents END) AS med2
        FROM cum GROUP BY event_type, n),
    dev AS (
        SELECT c.event_type, ABS(2 * c.cents - med.med2) AS d2, COUNT(*) AS m
        FROM c JOIN med ON c.event_type = med.event_type
        GROUP BY 1, 2),
    dcum AS (
        SELECT event_type, d2, m,
               SUM(m) OVER (PARTITION BY event_type ORDER BY d2
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
               SUM(m) OVER (PARTITION BY event_type) AS n
        FROM dev),
    mad AS (
        SELECT event_type, n,
               MIN(CASE WHEN cm >= (n + 1) // 2 THEN d2 END)
             + MIN(CASE WHEN cm >= n // 2 + 1 THEN d2 END) AS mad4
        FROM dcum GROUP BY event_type, n)
    SELECT med.event_type,
           CAST(med.n AS BIGINT) AS n,
           ROUND(med.med2 / 200.0, 6) AS median_value,
           ROUND(mad.mad4 / 400.0, 6) AS mad
    FROM med JOIN mad ON med.event_type = mad.event_type
    ORDER BY med.event_type
    """,
    doc="Median absolute deviation per event_type -- the robust scale "
    "estimate outliers cannot poison (unlike stddev), the right "
    "dispersion for q136-style anomaly thresholds.  Both medians "
    "(value, then deviation) come from cumulative sums over the "
    "distinct-cents histogram (bounded domain, the q250 argument) -- "
    "NO per-row sort or window ever touches the event frame -- and all "
    "arithmetic stays integer (doubled cents for the even-count "
    "midpoint, quadrupled for the deviation midpoint) until two final "
    "divisions.",
)
def q278_mad_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )

    def hist_median2(df: DataFrame, val: str) -> DataFrame:
        """Per-type doubled median (lo+hi) from the distinct-value histogram."""
        h = df.groupBy("event_type", val).agg(F.count("*").alias("m"))
        w = (
            Window.partitionBy("event_type")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = h.select(
            "event_type",
            F.col(val).alias("v"),
            F.sum("m").over(w).alias("cm"),
            F.sum("m").over(Window.partitionBy("event_type")).alias("n"),
        )
        # integer midpoints: lo at rank (n+1)//2, hi at rank n//2 + 1
        lo = F.min(
            F.when(F.col("cm") >= F.floor((F.col("n") + 1) / 2), F.col("v"))
        )
        hi = F.min(
            F.when(F.col("cm") >= F.floor(F.col("n") / 2) + 1, F.col("v"))
        )
        return cum.groupBy("event_type", "n").agg((lo + hi).alias("m2"))

    med = hist_median2(c, "cents").select(
        "event_type", F.col("n").alias("n_rows"), F.col("m2").alias("med2")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("cents") - F.col("med2")).alias("d2")
    )
    mad = hist_median2(dev, "d2").select(
        "event_type", F.col("m2").alias("mad4")
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            F.col("n_rows").cast("bigint").alias("n"),
            F.round(F.col("med2") / 200.0, 6).alias("median_value"),
            F.round(F.col("mad4") / 400.0, 6).alias("mad"),
        )
        .orderBy("event_type")
    )
