"""Wave-36 operators (round 9, final): blocked nonparametric testing and
Kneser-Ney-smoothed language modeling -- the last statistics and LM-quality
gaps around q335 (Kruskal-Wallis) and q126 (bigram LM).

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B statistics/LLM-pipeline families.

Engine-exactness notes:
- q368 ranks via the q251/q335 distinct-value cumulative spelling over
  exact integer cents -- a bounded 30x5 frame, so the rank lattice is
  engine-exact; only the final chi-square is float, rounded 6.
- q369's Kneser-Ney probabilities are rational functions of exact integer
  counts with the discount as a shared literal; per-document log-prob sums
  order by token position (ordered cumulative semantics not needed -- the
  SUM is over a per-document bounded set, rounded at 6 after aggregation
  with the established reduce-order tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q368: Friedman test (blocked ranks: days x event types)
# ---------------------------------------------------------------------------


@register(
    "q368_friedman_test",
    sql="""
    WITH daily AS (
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
               event_type,
               SUM(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
    dv AS (
        SELECT day, cents, COUNT(*) AS cnt FROM daily GROUP BY day, cents),
    dvr AS (
        SELECT day, cents,
               SUM(cnt) OVER (PARTITION BY day ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - cnt AS below,
               cnt
        FROM dv),
    ranked AS (
        SELECT d.day, d.event_type,
               dvr.below + (dvr.cnt + 1) / 2.0 AS avg_rank
        FROM daily d JOIN dvr ON d.day = dvr.day AND d.cents = dvr.cents),
    sums AS (
        SELECT event_type, SUM(avg_rank) AS r, COUNT(*) AS n_blocks
        FROM ranked GROUP BY event_type),
    dims AS (
        SELECT MAX(n_blocks) AS n, COUNT(*) AS k,
               SUM(r * r) AS rr
        FROM sums)
    SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_treatments,
           ROUND(12.0 / (n * k * (k + 1)) * rr - 3.0 * n * (k + 1), 6) + 0.0
               AS friedman_chi2
    FROM dims
    """,
    doc="Friedman test (blocked rank ANOVA): days are blocks, event types "
    "are treatments, the response is daily total cents; chi2_F = "
    "12/(n k (k+1)) * sum_j R_j^2 - 3 n (k+1) over within-block average "
    "ranks -- the repeated-measures companion to q335's Kruskal-Wallis "
    "(KW assumes independent groups; Friedman blocks out the day "
    "effect, which dominates any daily-seasonal metric).  Ranks use the "
    "q251/q335 distinct-value cumulative spelling (avg rank = below + "
    "(cnt+1)/2 from the per-(day, cents) distinct frame -- no window "
    "enumerates within a tie group) over EXACT integer cents, so the "
    "rank lattice is engine-exact; the only float is the final "
    "statistic, rounded 6 with -0.0 normalized.  Plan: one corpus scan "
    "-> 30x5 daily cell frame; every window is partitioned by day over "
    "that bounded frame -- at 100 TB the cost is the first hash-agg.",
)
def q368_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "day"
            ),
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(F.sum("cents").alias("cents"))
    )
    # Distinct-value cumulative-rank spelling (the q251/q335 discipline):
    # ranks come from the per-(day, cents) DISTINCT frame -- no window ever
    # enumerates within a tie group, so tie handling is engine-exact.
    daily = daily.localCheckpoint(eager=True)  # feeds dv and the join back
    dv = daily.groupBy("day", "cents").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("day").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dvr = dv.select(
        "day",
        "cents",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("below"),
        "cnt",
    )
    ranked = daily.join(dvr, ["day", "cents"]).select(
        "event_type",
        (F.col("below") + (F.col("cnt") + 1) / 2.0).alias("avg_rank"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("avg_rank").alias("r"), F.count("*").alias("n_blocks")
    )
    dims = sums.agg(
        F.max("n_blocks").alias("n"),
        F.count("*").alias("k"),
        F.sum(F.col("r") * F.col("r")).alias("rr"),
    )
    return dims.select(
        F.col("n").cast("bigint").alias("n_blocks"),
        F.col("k").cast("bigint").alias("k_treatments"),
        (
            F.round(
                12.0 / (F.col("n") * F.col("k") * (F.col("k") + 1)) * F.col("rr")
                - 3.0 * F.col("n") * (F.col("k") + 1),
                6,
            )
            + F.lit(0.0)
        ).alias("friedman_chi2"),
    )


# ---------------------------------------------------------------------------
# q369: interpolated Kneser-Ney bigram LM, heldout perplexity per source
# ---------------------------------------------------------------------------

_KN_D = 0.75
_KN_FLOOR = 1e-12


@register(
    "q369_kneser_ney_ppl",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents WHERE length(text) > 0),
    train_bg AS (
        SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
        FROM toks WHERE doc_id % 2 = 0),
    bgc AS (SELECT bg, COUNT(*) AS c12 FROM train_bg GROUP BY bg),
    w1c AS (
        SELECT split_part(bg, ' ', 1) AS w1, SUM(c12) AS c1,
               COUNT(*) AS n1plus_fwd
        FROM bgc GROUP BY 1),
    cont AS (
        SELECT split_part(bg, ' ', 2) AS w2, COUNT(*) AS n1plus_bwd
        FROM bgc GROUP BY 1),
    totbg AS (SELECT COUNT(*) AS nt FROM bgc),
    eval_bg AS (
        SELECT source,
               unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
        FROM toks WHERE doc_id % 2 = 1),
    scored AS (
        SELECT e.source,
               GREATEST(
                 CASE WHEN w1c.c1 IS NOT NULL AND w1c.c1 > 0 THEN
                   GREATEST(COALESCE(bgc.c12, 0) - {_KN_D!r}, 0.0) / w1c.c1
                   + {_KN_D!r} * w1c.n1plus_fwd / w1c.c1
                     * COALESCE(cont.n1plus_bwd, 0) / totbg.nt
                 ELSE COALESCE(cont.n1plus_bwd, 0) / CAST(totbg.nt AS DOUBLE)
                 END, {_KN_FLOOR!r}) AS p
        FROM eval_bg e
        LEFT JOIN bgc ON bgc.bg = e.bg
        LEFT JOIN w1c ON w1c.w1 = split_part(e.bg, ' ', 1)
        LEFT JOIN cont ON cont.w2 = split_part(e.bg, ' ', 2)
        CROSS JOIN totbg)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_bigrams,
           ROUND(AVG(ln(p)), 6) + 0.0 AS avg_logprob,
           ROUND(exp(-AVG(ln(p))), 4) AS perplexity
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    doc=f"Interpolated Kneser-Ney bigram LM (discount d={_KN_D}): train on "
    "even doc_ids, score odd doc_ids, report per-source heldout "
    "perplexity -- the proper-smoothing upgrade over q126's add-k "
    "bigram LM and the standard lexical quality score (KN's "
    "continuation probability is what makes low-frequency bigrams "
    "informative instead of noise; per-source heldout PPL is the "
    "corpus-mixing signal q143/q292 weight against).  P_kn(w2|w1) = "
    "max(c12-d,0)/c1 + d*N1+(w1.)/c1 * N1+(.w2)/|bigram types|, backing "
    "off to the continuation probability when w1 is unseen, floored at "
    f"{_KN_FLOOR} (same literal both engines).  Every probability is "
    "rational in exact integer counts with shared literals, so "
    "per-instance log-probs are engine-identical; only the per-source "
    "average carries the reduce-order tolerance, rounded 6 (PPL at 4). "
    "Plan: two corpus scans (train counts, eval instances); the count "
    "tables are vocabulary-bounded (<=900 bigram types on this vocab, "
    "BROADCAST joins at any corpus size) -- the q121/q191 vocab-join "
    "shape.",
)
def q369_kneser_ney_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import ngram_instances, tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    train_bg = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(ngram_instances(tokens("text"), 2)).alias("bg"))
    )
    bgc = train_bg.groupBy("bg").agg(F.count("*").alias("c12"))
    bgc = bgc.localCheckpoint(eager=True)  # feeds w1c, cont, totbg, the join
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    w1c = bgc.groupBy(w1.alias("w1")).agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1plus_fwd")
    )
    cont = bgc.groupBy(w2.alias("w2")).agg(F.count("*").alias("n1plus_bwd"))
    totbg = bgc.agg(F.count("*").alias("nt"))
    eval_bg = (
        d.filter(F.col("doc_id") % 2 == 1)
        .select("source", F.explode(ngram_instances(tokens("text"), 2)).alias("bg"))
    )
    e2 = eval_bg.select(
        "source", "bg", w1.alias("ew1"), w2.alias("ew2")
    )
    j = (
        e2.join(F.broadcast(bgc), "bg", "left")
        .join(F.broadcast(w1c), F.col("ew1") == F.col("w1"), "left")
        .join(F.broadcast(cont), F.col("ew2") == F.col("w2"), "left")
        .crossJoin(F.broadcast(totbg))
    )
    # Association order matches the oracle exactly (the q329 discipline):
    # seen branch multiplies ((d*fwd)/c1)*bwd then divides by nt LAST.
    pcont = F.coalesce(F.col("n1plus_bwd"), F.lit(0)) / F.col("nt").cast("double")
    p = F.greatest(
        F.when(
            F.col("c1").isNotNull() & (F.col("c1") > 0),
            F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - _KN_D, F.lit(0.0))
            / F.col("c1")
            + _KN_D
            * F.col("n1plus_fwd")
            / F.col("c1")
            * F.coalesce(F.col("n1plus_bwd"), F.lit(0))
            / F.col("nt"),
        ).otherwise(pcont),
        F.lit(_KN_FLOOR),
    )
    return (
        j.select("source", F.log(p).alias("lp"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_eval_bigrams"),
            (F.round(F.avg("lp"), 6) + F.lit(0.0)).alias("avg_logprob"),
            F.round(F.exp(-F.avg("lp")), 4).alias("perplexity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q370: McNemar paired test (two quality gates on the same documents)
# ---------------------------------------------------------------------------

_MCN_CHARS = 150
_MCN_TOKENS = 30


@register(
    "q370_mcnemar_test",
    sql=f"""
    WITH flags AS (
        SELECT CASE WHEN n_chars >= {_MCN_CHARS} THEN 1 ELSE 0 END AS a,
               CASE WHEN len(string_split(text, ' ')) >= {_MCN_TOKENS}
                    THEN 1 ELSE 0 END AS b
        FROM documents WHERE length(text) > 0),
    cells AS (
        SELECT CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS both_pass,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS only_chars,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS only_tokens,
               CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS both_fail
        FROM flags)
    SELECT both_pass, only_chars, only_tokens, both_fail,
           ROUND(CASE WHEN only_chars + only_tokens > 0
                      THEN POW(abs(only_chars - only_tokens) - 1.0, 2)
                           / (only_chars + only_tokens)
                      ELSE 0.0 END, 6) AS mcnemar_chi2
    FROM cells
    """,
    doc=f"McNemar test for PAIRED binary gates: do the char-length gate "
    f"(n_chars >= {_MCN_CHARS}) and the token-count gate (>= "
    f"{_MCN_TOKENS} tokens) disagree more than chance on the SAME "
    "documents?  chi2 = (|b - c| - 1)^2/(b + c) over the discordant "
    "cells with continuity correction -- the right test when comparing "
    "two quality filters on one corpus (q229's two-sample z-test is "
    "WRONG there: the samples are the same documents, not independent "
    "arms).  The 2x2 cell counts are exact integers from one "
    "conditional-aggregate pass; the statistic is the only float, with "
    "a CASE guard for zero discordance spelled identically in both "
    "engines.  Plan: one corpus scan, single-row combine -- "
    "shuffle-free at any scale.",
)
def q370_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    a = (F.col("n_chars") >= _MCN_CHARS).cast("int")
    b = (token_count("text") >= _MCN_TOKENS).cast("int")
    cells = d.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("both_pass"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("only_chars"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("only_tokens"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("both_fail"),
    )
    disc = F.col("only_chars") + F.col("only_tokens")
    chi2 = F.when(
        disc > 0,
        F.pow(F.abs(F.col("only_chars") - F.col("only_tokens")) - 1.0, 2) / disc,
    ).otherwise(0.0)
    return cells.select(
        "both_pass",
        "only_chars",
        "only_tokens",
        "both_fail",
        F.round(chi2, 6).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# q371: token-frequency Gini (vocabulary inequality)
# ---------------------------------------------------------------------------


@register(
    "q371_token_gini",
    sql="""
    WITH tf AS (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE length(text) > 0),
    counts AS (SELECT token, COUNT(*) AS c FROM tf GROUP BY token),
    dv AS (SELECT c, COUNT(*) AS cnt FROM counts GROUP BY c),
    dvr AS (
        SELECT c, cnt,
               SUM(cnt) OVER (ORDER BY c
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - cnt AS below
        FROM dv),
    terms AS (
        -- sum over tokens of rank*c with ties at the average rank:
        -- contribution of a tie group = c * cnt * (below + (cnt+1)/2.0)
        SELECT SUM(cnt) AS v, SUM(c * cnt) AS total,
               SUM(c * cnt * (below + (cnt + 1) / 2.0)) AS s_rank
        FROM dvr)
    SELECT CAST(v AS BIGINT) AS vocab_size,
           CAST(total AS BIGINT) AS n_tokens,
           ROUND(2.0 * s_rank / (v * CAST(total AS DOUBLE)) - (v + 1.0) / v, 6)
               + 0.0 AS token_gini
    FROM terms
    """,
    doc="Token-frequency Gini coefficient: the q230 rank formula applied "
    "to the corpus vocabulary (G = 2*sum(rank_i * c_i)/(V * N) - "
    "(V+1)/V over frequency-sorted tokens, ties at the average rank "
    "via the q251 distinct-value spelling) -- the single-number "
    "vocabulary-inequality complement to q238's Zipf slope, q240's "
    "Heaps law and q261's hapax share: near-1 means a few tokens "
    "dominate (template/boilerplate corpus), low values mean a flat, "
    "diverse vocabulary.  Counts are exact; ranks come from the "
    "distinct-frequency frame (vocabulary-bounded, no per-token "
    "window); the statistic is the only float, rounded 6 with -0.0 "
    "normalized.  Plan: one corpus scan -> vocab-sized count table -> "
    "distinct-frequency rollup; at 100 TB the vocab table is the only "
    "shuffle.",
)
def q371_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    counts = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    dv = counts.groupBy("c").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    dvr = dv.select(
        "c", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("below")
    )
    terms = dvr.agg(
        F.sum("cnt").alias("v"),
        F.sum(F.col("c") * F.col("cnt")).alias("total"),
        F.sum(
            F.col("c") * F.col("cnt") * (F.col("below") + (F.col("cnt") + 1) / 2.0)
        ).alias("s_rank"),
    )
    return terms.select(
        F.col("v").cast("bigint").alias("vocab_size"),
        F.col("total").cast("bigint").alias("n_tokens"),
        (
            F.round(
                2.0 * F.col("s_rank") / (F.col("v") * F.col("total").cast("double"))
                - (F.col("v") + 1.0) / F.col("v"),
                6,
            )
            + F.lit(0.0)
        ).alias("token_gini"),
    )
