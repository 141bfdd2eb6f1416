"""Wave-28 operators (round 8, final): greedy source-mixture budgeting and
the experimentation sample-ratio-mismatch check.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B curation/experimentation families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q346: greedy source-mixture budget (water-filling by quality rank)
# ---------------------------------------------------------------------------

_MIX_BUDGET_PPM = 600_000  # token budget as ppm of the corpus token mass


@register(
    "q346_greedy_mixture_budget",
    sql=f"""
    WITH s AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
               ROUND(AVG(len(list_distinct(string_split(text, ' ')))
                         / CAST(len(string_split(text, ' ')) AS DOUBLE)), 9)
                   AS quality
        FROM documents WHERE length(text) > 0
        GROUP BY source),
    tot AS (SELECT SUM(tokens) AS total FROM s),
    ranked AS (
        SELECT source, tokens, quality,
               ROW_NUMBER() OVER (ORDER BY quality DESC, source) AS rank,
               SUM(tokens) OVER (ORDER BY quality DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM s),
    -- floor(total*ppm/1e6) via the overflow-safe split
    -- (total div 1e6)*ppm + ((total mod 1e6)*ppm) div 1e6: exact, and no
    -- intermediate exceeds ~1.5e13 even at 100 TB token counts (the raw
    -- product overflows BIGINT past ~1.5e13 tokens -- the q289 class)
    b AS (SELECT (total // 1000000) * {_MIX_BUDGET_PPM}
                 + ((total % 1000000) * {_MIX_BUDGET_PPM}) // 1000000 AS budget
          FROM tot)
    SELECT CAST(rank AS BIGINT) AS rank, source, tokens, quality,
           CAST(cum AS BIGINT) AS cum_tokens,
           CASE WHEN cum <= b.budget THEN 1.0
                WHEN cum - tokens >= b.budget THEN 0.0
                ELSE ROUND((b.budget - (cum - tokens))
                           / CAST(tokens AS DOUBLE), 6) END AS take_fraction
    FROM ranked, b
    ORDER BY rank
    """,
    doc="Greedy source-mixture budgeting: rank sources by a quality score "
    "(lexical diversity here, standing in for the q299 classifier), then "
    "fill a token budget "
    f"({_MIX_BUDGET_PPM / 10000:.0f}% of corpus mass) best-source-first, "
    "reporting each source's take fraction (1.0 = all of it, fractional "
    "= the marginal source, 0.0 = priced out) -- the decision table a "
    "curation run publishes when compute budgets force a sub-corpus, and "
    "the greedy solution is exactly optimal for this knapsack relaxation. "
    " The ranking key is the ROUNDED (9) quality with a source tie-break; "
    "the budget is exact integer ppm arithmetic (integer floor-divide, "
    "never a float product -- the q185/q289 discipline); only the "
    "marginal fraction is a rounded float.  Plan: one corpus scan to the "
    "per-source rollup, then windows over the |sources|-row frame -- "
    "bounded at any scale.",
)
def q346_greedy_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = F.split("text", " ")
    s = d.groupBy("source").agg(
        F.sum(token_count("text")).cast("bigint").alias("tokens"),
        F.round(
            F.avg(F.size(F.array_distinct(t)) / F.size(t).cast("double")), 9
        ).alias("quality"),
    )
    s = s.localCheckpoint(eager=True)  # consumed by total and the ranking
    tot = s.agg(F.sum("tokens").alias("total"))
    w = Window.orderBy(F.col("quality").desc(), "source")
    ranked = s.select(
        "source",
        "tokens",
        "quality",
        F.row_number().over(w).alias("rank"),
        F.sum("tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    # floor(total*ppm/1e6) via the overflow-safe split (a div m)*p +
    # ((a mod m)*p) div m -- exact (a = q*m + r => floor(a*p/m) = q*p +
    # floor(r*p/m)), and no intermediate exceeds ~1.5e13 even at 100 TB
    # token counts; the raw bigint product overflows past ~1.5e13 tokens
    # (the q289 class).
    b = tot.select(
        F.expr(
            f"(total div 1000000) * {_MIX_BUDGET_PPM}"
            f" + ((total % 1000000) * {_MIX_BUDGET_PPM}) div 1000000"
        ).alias("budget")
    )
    take = (
        F.when(F.col("cum") <= F.col("budget"), F.lit(1.0))
        .when(F.col("cum") - F.col("tokens") >= F.col("budget"), F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("budget") - (F.col("cum") - F.col("tokens")))
                / F.col("tokens").cast("double"),
                6,
            )
        )
    )
    return (
        ranked.crossJoin(F.broadcast(b))
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "source",
            "tokens",
            "quality",
            F.col("cum").cast("bigint").alias("cum_tokens"),
            take.alias("take_fraction"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q347: sample-ratio-mismatch (SRM) check for hash-based assignment
# ---------------------------------------------------------------------------

_SRM_SALT = "srm1|"


@register(
    "q347_srm_check",
    sql=f"""
    WITH u AS (
        SELECT DISTINCT user_id,
               CAST(md5_number_lower('{_SRM_SALT}' || user_id) % 2 AS BIGINT) AS arm
        FROM events),
    c AS (
        SELECT count_if(arm = 0) AS na, count_if(arm = 1) AS nb FROM u)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND((na - nb) / sqrt(CAST(na + nb AS DOUBLE)), 6) + 0.0 AS z,
           ROUND(POW(na - CAST(na + nb AS DOUBLE) / 2, 2)
                 / (CAST(na + nb AS DOUBLE) / 2) * 2, 6) AS chi2,
           (abs((na - nb) / sqrt(CAST(na + nb AS DOUBLE))) > 3.0) AS srm_alarm
    FROM c
    """,
    doc="Sample-ratio-mismatch check for the salted-md5 50/50 assignment "
    "(the q208/q229 bucketing contract): per-user arm counts, the "
    "normalized imbalance z = (n_a - n_b)/sqrt(n), the 1-dof chi-square, "
    "and the |z| > 3 alarm -- the first gate every A/B platform runs, "
    "because a skewed split invalidates the experiment before any effect "
    "size (q325) or test (q229/q244) is worth reading.  Assignment uses "
    "the power-of-two md5_mod path (signed pmod == DuckDB's unsigned "
    "residue); counts are exact and z/chi2 round at 6 with z's zero "
    "boundary normalized.  Plan: one distinct-user hash-agg, single-row "
    "combine -- one scan at any scale.",
)
def q347_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_mod

    e = load_table(spark, sf_dir, "events")
    u = e.select("user_id").distinct().select(
        md5_mod(F.concat(F.lit(_SRM_SALT), F.col("user_id")), 2).alias("arm")
    )
    c = u.agg(
        F.count_if(F.col("arm") == 0).alias("na"),
        F.count_if(F.col("arm") == 1).alias("nb"),
    )
    n = (F.col("na") + F.col("nb")).cast("double")
    z = (F.col("na") - F.col("nb")) / F.sqrt(n)
    return c.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        (F.round(z, 6) + F.lit(0.0)).alias("z"),
        F.round(F.pow(F.col("na") - n / 2, 2) / (n / 2) * 2, 6).alias("chi2"),
        (F.abs(z) > 3.0).alias("srm_alarm"),
    )
