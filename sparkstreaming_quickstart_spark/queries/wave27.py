"""Wave-27 operators (round 8, continued): threshold-free classifier
evaluation (exact AUC-ROC via tie-corrected rank sums, PR-AUC with best-F1
operating point) and a Simpson's-paradox aggregation-reversal audit.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B statistics/evaluation families (q220 is the single-threshold
confusion matrix, q247 the calibration axis; these add the ranking axis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q342: exact AUC-ROC via average-rank sums (tie-corrected)
# ---------------------------------------------------------------------------


@register(
    "q342_auc_roc",
    sql="""
    WITH g AS (
        SELECT value AS v,
               count_if(event_type = 'purchase') AS cp,
               COUNT(*) AS m
        FROM events GROUP BY value),
    r AS (
        SELECT cp, m,
               SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS before
        FROM g),
    s AS (
        SELECT SUM(cp) AS np, SUM(m - cp) AS nn,
               SUM(cp * (before + (m + 1) / 2.0)) AS rp
        FROM r)
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           -- CAST(np AS DOUBLE) BEFORE the (np+1) product: the bigint
           -- product overflows ANSI engines past ~3e9 positives (q289 class)
           ROUND((rp - CAST(np AS DOUBLE) * (np + 1) / 2.0)
                 / (CAST(np AS DOUBLE) * nn), 6) AS auc
    FROM s
    """,
    doc="Exact AUC-ROC of `value` as a purchase-vs-rest score: AUC is the "
    "normalized Mann-Whitney statistic (R_pos - n_pos(n_pos+1)/2) / "
    "(n_pos * n_neg) with AVERAGE ranks, so ties contribute 1/2 -- the "
    "probabilistic 'random positive outranks random negative' reading, "
    "exact with no threshold grid or trapezoid approximation.  "
    "Discrimination completes the evaluation triptych: q220 = one "
    "operating point, q247 = calibration, this = ranking quality.  "
    "Ranks come from q251's distinct-value spelling (cumulative window "
    "over the value DOMAIN, never per-row ranks); rank sums are exact "
    "rationals and AUC is the single rounded float.  Plan: one hash-agg "
    "to the score domain, one cumulative window over that frame, "
    "single-row combine.",
)
def q342_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(F.col("value").alias("v")).agg(
        F.count_if(F.col("event_type") == "purchase").alias("cp"),
        F.count("*").alias("m"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = g.select("cp", "m", (F.sum("m").over(w) - F.col("m")).alias("before"))
    s = r.agg(
        F.sum("cp").alias("np"),
        F.sum(F.col("m") - F.col("cp")).alias("nn"),
        F.sum(F.col("cp") * (F.col("before") + (F.col("m") + 1) / 2.0)).alias("rp"),
    )
    # np cast to double BEFORE the (np+1) product: the bigint product hits
    # ANSI ARITHMETIC_OVERFLOW past ~3e9 positives (the q289 class).
    return s.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.round(
            (F.col("rp") - F.col("np").cast("double") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * F.col("nn")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# q343: PR-AUC (step integral) + best-F1 operating point
# ---------------------------------------------------------------------------


@register(
    "q343_precision_recall_curve",
    sql="""
    WITH g AS (
        SELECT value AS v,
               count_if(event_type = 'purchase') AS cp,
               COUNT(*) AS m
        FROM events GROUP BY value),
    tot AS (SELECT SUM(cp) AS np FROM g),
    c AS (
        -- predict positive when score >= v: cumulative counts from the top
        SELECT v,
               SUM(cp) OVER (ORDER BY v DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               SUM(m) OVER (ORDER BY v DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        FROM g),
    pr AS (
        SELECT v, tp, pp,
               tp / CAST(pp AS DOUBLE) AS prec,
               tp / CAST(tot.np AS DOUBLE) AS rec,
               LAG(tp, 1, 0) OVER (ORDER BY v DESC) / CAST(tot.np AS DOUBLE)
                   AS rec_prev
        FROM c, tot),
    f1 AS (
        SELECT v, ROUND(2.0 * prec * rec / NULLIF(prec + rec, 0), 9) AS f1
        FROM pr)
    SELECT CAST(tot.np AS BIGINT) AS n_pos,
           ROUND(SUM((pr.rec - pr.rec_prev) * pr.prec), 6) AS pr_auc,
           (SELECT MAX(f1) FROM f1) AS best_f1_r9,
           (SELECT MIN(v) FROM f1 WHERE f1 = (SELECT MAX(f1) FROM f1))
               AS best_f1_threshold
    FROM pr, tot
    GROUP BY tot.np
    """,
    doc="Precision-recall summary for `value` as a purchase score: PR-AUC "
    "by exact step integration (sum of recall increments x precision at "
    "each distinct-score threshold -- no interpolation, matching "
    "sklearn's average_precision definition) plus the best-F1 operating "
    "point (F1 rounded at 9 before the argmax, lowest threshold on "
    "ties).  The PR view is the one that matters under class imbalance, "
    "where ROC (q342) flatters.  Counts are exact; cumulative TP/PP come "
    "from one descending window over the score domain.  Plan: the q251/"
    "q342 distinct-value shape -- one hash-agg, two windows over the "
    "domain frame, single-row combine.",
)
def q343_precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(F.col("value").alias("v")).agg(
        F.count_if(F.col("event_type") == "purchase").alias("cp"),
        F.count("*").alias("m"),
    )
    g = g.localCheckpoint(eager=True)  # domain frame consumed by tot + curve
    tot = g.agg(F.sum("cp").alias("np"))
    wd = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "v",
        F.sum("cp").over(wd).alias("tp"),
        F.sum("m").over(wd).alias("pp"),
    )
    pr = c.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.col("tp") / F.col("pp").cast("double")).alias("prec"),
        (F.col("tp") / F.col("np").cast("double")).alias("rec"),
        (
            F.lag("tp", 1, 0).over(Window.orderBy(F.col("v").desc()))
            / F.col("np").cast("double")
        ).alias("rec_prev"),
        "np",
    )
    pr = pr.localCheckpoint(eager=True)  # consumed by the integral and best-F1
    f1 = pr.select(
        "v",
        F.round(
            2.0 * F.col("prec") * F.col("rec")
            / F.nullif(F.col("prec") + F.col("rec"), F.lit(0.0)),
            9,
        ).alias("f1"),
    )
    best = f1.agg(F.max("f1").alias("best_f1_r9"))
    best_t = (
        f1.join(F.broadcast(best), f1["f1"] == best["best_f1_r9"])
        .agg(F.min("v").alias("best_f1_threshold"))
    )
    return (
        pr.groupBy("np")
        .agg(F.round(F.sum((F.col("rec") - F.col("rec_prev")) * F.col("prec")), 6).alias("pr_auc"))
        .crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(best_t))
        .select(
            F.col("np").cast("bigint").alias("n_pos"),
            "pr_auc",
            "best_f1_r9",
            "best_f1_threshold",
        )
    )


# ---------------------------------------------------------------------------
# q344: Simpson's-paradox aggregation-reversal audit
# ---------------------------------------------------------------------------


@register(
    "q344_aggregation_reversal",
    sql="""
    WITH x AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS x,
               len(list_distinct(string_split(text, ' ')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS y
        FROM documents WHERE length(text) > 0),
    per AS (
        SELECT lang AS grp, COUNT(*) AS n,
               COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS num,
               sqrt((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                    * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))) AS den
        FROM x GROUP BY lang),
    pooled AS (
        SELECT 'ALL' AS grp, COUNT(*) AS n,
               COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS num,
               sqrt((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                    * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))) AS den
        FROM x),
    all_rows AS (SELECT * FROM pooled UNION ALL SELECT * FROM per)
    SELECT a.grp, CAST(a.n AS BIGINT) AS n,
           ROUND(a.num / NULLIF(a.den, 0), 6) + 0.0 AS corr,
           (SIGN(ROUND(a.num / NULLIF(a.den, 0), 6))
            <> SIGN(ROUND(p.num / NULLIF(p.den, 0), 6))) AS sign_reversed
    FROM all_rows a, pooled p
    ORDER BY a.grp
    """,
    doc="Simpson's-paradox audit: Pearson correlation between document "
    "length and lexical diversity (distinct-token ratio) per language vs "
    "pooled, flagging groups whose correlation SIGN disagrees with the "
    "pooled sign -- the aggregation-reversal alarm every cross-source "
    "corpus dashboard needs before anyone acts on a pooled trend "
    "(longer docs mechanically repeat tokens, but the strength differs "
    "by language; a reversal means the pooled number is a composition "
    "artifact).  Correlations come from exact-order-free sufficient "
    "statistics, round at 6 (with -0.0 normalized) BEFORE the sign "
    "comparison so the reversal flag is engine-exact.  Plan: one scan "
    "computing (x, y) scan-locally, one per-lang hash-agg plus one "
    "global agg, bounded combine -- no joins wider than the lang list.",
)
def q344_aggregation_reversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = F.split("text", " ")
    x = d.select(
        "lang",
        token_count("text").cast("double").alias("x"),
        (F.size(F.array_distinct(t)) / F.size(t).cast("double")).alias("y"),
    )
    x = x.localCheckpoint(eager=True)  # consumed by per-group and pooled aggs

    def stats(df, grp_col):
        n = F.count("*")
        num = n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")
        den = F.sqrt(
            (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
            * (n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
        )
        aggs = [n.alias("n"), num.alias("num"), den.alias("den")]
        if grp_col is None:
            return df.agg(*aggs).select(F.lit("ALL").alias("grp"), "n", "num", "den")
        return df.groupBy(F.col(grp_col).alias("grp")).agg(*aggs)

    per = stats(x, "lang")
    pooled = stats(x, None)
    all_rows = pooled.unionByName(per)
    p = pooled.select(F.col("num").alias("pnum"), F.col("den").alias("pden"))
    corr = F.round(F.col("num") / F.nullif(F.col("den"), F.lit(0.0)), 6) + F.lit(0.0)
    pcorr = F.round(F.col("pnum") / F.nullif(F.col("pden"), F.lit(0.0)), 6)
    return (
        all_rows.crossJoin(F.broadcast(p))
        .select(
            "grp",
            F.col("n").cast("bigint").alias("n"),
            corr.alias("corr"),
            (F.signum(corr) != F.signum(pcorr)).alias("sign_reversed"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# q345: naive-forecast error profile (MAE of lag-1 vs lag-7, MASE-style)
# ---------------------------------------------------------------------------


@register(
    "q345_forecast_mase",
    sql="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY 1, 2),
    l AS (
        SELECT event_type, day, c,
               LAG(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS c1,
               LAG(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS c7
        FROM d)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(CASE WHEN c1 IS NOT NULL THEN abs(c - c1) END), 6)
               AS mae_naive1,
           ROUND(AVG(CASE WHEN c7 IS NOT NULL THEN abs(c - c7) END), 6)
               AS mae_naive7,
           ROUND(AVG(CASE WHEN c7 IS NOT NULL THEN abs(c - c7) END)
                 / NULLIF(AVG(CASE WHEN c1 IS NOT NULL THEN abs(c - c1) END), 0), 6)
               AS mase_7v1
    FROM l
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Naive-forecast error profile per event_type: MAE of the lag-1 "
    "(yesterday-predicts-today) and lag-7 (same-weekday) naive forecasts "
    "over daily counts, and their ratio -- the MASE-style scale-free "
    "baseline every forecasting deployment must beat before a model "
    "earns compute (ratio < 1 means weekly seasonality dominates, the "
    "q245 profile made decision-ready).  Daily counts and their "
    "differences are exact integers; only the final averages/ratio are "
    "floats, rounded at 6 (non-negative by construction, no -0 "
    "exposure).  Plan: one corpus scan to the (type, day) hash-agg "
    "(30 x |types| rows), lag windows partitioned by type over that "
    "bounded frame, per-type rollup -- at 100 TB the day grid is the "
    "only windowed object.",
)
def q345_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 7).over(w).alias("c7"),
    )
    mae1 = F.avg(F.when(F.col("c1").isNotNull(), F.abs(F.col("c") - F.col("c1"))))
    mae7 = F.avg(F.when(F.col("c7").isNotNull(), F.abs(F.col("c") - F.col("c7"))))
    return (
        l.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(mae1, 6).alias("mae_naive1"),
            F.round(mae7, 6).alias("mae_naive7"),
            F.round(mae7 / F.nullif(mae1, F.lit(0.0)), 6).alias("mase_7v1"),
        )
        .orderBy("event_type")
    )
