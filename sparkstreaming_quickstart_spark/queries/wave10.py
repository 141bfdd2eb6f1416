"""Wave-10 operators (round 3): distribution statistics and corpus
diagnostics -- two-sample tests (Kolmogorov-Smirnov, Mann-Whitney U, one-way
ANOVA), agreement (Cohen's kappa), information-theoretic corpus comparisons
(Jensen-Shannon divergence, entropy/KL per source), EWMA smoothing, CUSUM
changepoint detection, tokenizer fertility, and exact quantile normalization
without per-row windows.

Scale notes common to the wave: every test statistic here reduces to
sufficient statistics (counts / integer sums / distinct-value histograms)
computed in ONE map-side-combinable hash-agg over the data; the only windows
run over bounded frames (distinct value domains, per-group constants), never
over the raw rows.  The reference has no statistics surface; these are
charter extensions (SURVEY.md section 2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q250: two-sample Kolmogorov-Smirnov test (en vs non-en doc lengths)
# ---------------------------------------------------------------------------


@register(
    "q250_ks_test",
    sql="""
    WITH g AS (
        SELECT n_chars AS v,
               count_if(lang = 'en') AS ca,
               count_if(lang <> 'en') AS cb
        FROM documents GROUP BY n_chars),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g),
    cum AS (
        SELECT SUM(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
               SUM(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb
        FROM g)
    SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
           ROUND(MAX(ABS(cca / NULLIF(CAST(t.na AS DOUBLE), 0)
                         - ccb / NULLIF(CAST(t.nb AS DOUBLE), 0))), 6) AS d_stat,
           ROUND(1.358 * sqrt((t.na + t.nb)
                 / NULLIF(CAST(t.na AS DOUBLE) * t.nb, 0)), 6) AS d_crit_95,
           (ROUND(MAX(ABS(cca / NULLIF(CAST(t.na AS DOUBLE), 0)
                          - ccb / NULLIF(CAST(t.nb AS DOUBLE), 0))), 6)
            > ROUND(1.358 * sqrt((t.na + t.nb)
                    / NULLIF(CAST(t.na AS DOUBLE) * t.nb, 0)), 6)) AS reject_95
    FROM cum, tot t GROUP BY t.na, t.nb
    """,
    doc="Two-sample Kolmogorov-Smirnov test: D = max |ECDF_en - ECDF_rest| "
    "over document lengths, with the alpha=0.05 critical value -- the "
    "distribution-drift gate between corpus slices.  The ECDFs come from "
    "ONE hash-agg per distinct length (bounded domain: doc lengths, not "
    "doc count) and a cumulative window over that distinct-value frame; "
    "the raw rows are never sorted or windowed, so at 100 TB the cost is "
    "the count itself.",
)
def q250_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count_if(F.col("lang") == "en").alias("ca"),
        F.count_if(F.col("lang") != "en").alias("cb"),
    )
    tot = g.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        F.sum("ca").over(w).alias("cca"), F.sum("cb").over(w).alias("ccb")
    )
    joined = cum.crossJoin(F.broadcast(tot))
    # one-sided corpus (na or nb == 0): the test is undefined, NULL both sides
    gap = F.abs(
        F.col("cca") / F.nullif(F.col("na").cast("double"), F.lit(0.0))
        - F.col("ccb") / F.nullif(F.col("nb").cast("double"), F.lit(0.0))
    )
    crit = F.round(
        1.358
        * F.sqrt(
            (F.col("na") + F.col("nb"))
            / F.nullif(F.col("na").cast("double") * F.col("nb"), F.lit(0.0))
        ),
        6,
    )
    return (
        joined.groupBy("na", "nb")
        .agg(F.round(F.max(gap), 6).alias("d_stat"))
        .select(
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            "d_stat",
            crit.alias("d_crit_95"),
            (F.col("d_stat") > crit).alias("reject_95"),
        )
    )


# ---------------------------------------------------------------------------
# q251: Mann-Whitney U test with tie correction (en vs non-en doc lengths)
# ---------------------------------------------------------------------------


@register(
    "q251_mannwhitney_u",
    sql="""
    WITH g AS (
        SELECT n_chars AS v,
               count_if(lang = 'en') AS ca,
               count_if(lang <> 'en') AS cb,
               COUNT(*) AS m
        FROM documents GROUP BY n_chars),
    r AS (
        SELECT ca, cb, m,
               SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS before
        FROM g),
    s AS (
        SELECT SUM(ca) AS na, SUM(cb) AS nb,
               SUM(ca * (before + (m + 1) / 2.0)) AS ra,
               SUM(CAST(m AS DOUBLE) * m * m - m) AS ties
        FROM r)
    SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           ROUND(ra - na * (na + 1) / 2.0, 2) AS u_a,
           ROUND(CAST(na AS DOUBLE) * nb - (ra - na * (na + 1) / 2.0), 2) AS u_b,
           ROUND((ra - na * (na + 1) / 2.0 - CAST(na AS DOUBLE) * nb / 2.0)
                 / NULLIF(sqrt(CAST(na AS DOUBLE) * nb / 12.0
                        * ((na + nb + 1.0)
                           - ties / ((na + nb) * (na + nb - 1.0)))), 0), 6) AS z
    FROM s
    """,
    doc="Mann-Whitney U rank test (tie-corrected normal approximation) "
    "between en and non-en document lengths -- the nonparametric "
    "complement of q250's KS.  Average ranks come from the distinct-value "
    "histogram (before-count + (m+1)/2), so the U statistic needs NO "
    "per-row ranking at all: one hash-agg plus a cumulative window over "
    "the bounded distinct-length frame.",
)
def q251_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count_if(F.col("lang") == "en").alias("ca"),
        F.count_if(F.col("lang") != "en").alias("cb"),
        F.count("*").alias("m"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = g.select(
        "ca", "cb", "m", (F.sum("m").over(w) - F.col("m")).alias("before")
    )
    s = r.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.col("ca") * (F.col("before") + (F.col("m") + 1) / 2.0)).alias("ra"),
        F.sum(F.col("m").cast("double") * F.col("m") * F.col("m") - F.col("m")).alias("ties"),
    )
    na, nb, ra, ties = (F.col(x) for x in ("na", "nb", "ra", "ties"))
    ua = ra - na * (na + 1) / 2.0
    sigma = F.sqrt(
        na.cast("double") * nb / 12.0
        * ((na + nb + 1.0) - ties / ((na + nb) * (na + nb - 1.0)))
    )
    return s.select(
        na.cast("bigint").alias("na"),
        nb.cast("bigint").alias("nb"),
        F.round(ua, 2).alias("u_a"),
        F.round(na.cast("double") * nb - ua, 2).alias("u_b"),
        # all-tied pooled values make sigma 0: z is undefined, NULL both sides
        F.round((ua - na.cast("double") * nb / 2.0) / F.nullif(sigma, F.lit(0.0)), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# q252: one-way ANOVA F-test (doc length across languages)
# ---------------------------------------------------------------------------


@register(
    "q252_anova_f",
    sql="""
    WITH per AS (
        SELECT lang, COUNT(*) AS n, SUM(n_chars) AS sx,
               SUM(n_chars * n_chars) AS sxx
        FROM documents GROUP BY lang),
    tot AS (
        SELECT SUM(n) AS n, SUM(sx) AS sx, COUNT(*) AS k FROM per),
    parts AS (
        SELECT SUM(p.n * pow(CAST(p.sx AS DOUBLE) / p.n
                             - CAST(t.sx AS DOUBLE) / t.n, 2)) AS ssb,
               SUM(p.sxx - CAST(p.sx AS DOUBLE) * p.sx / p.n) AS ssw,
               t.k AS k, t.n AS n
        FROM per p, tot t GROUP BY t.k, t.n)
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           ROUND(ssb / (k - 1), 6) AS ms_between,
           ROUND(ssw / (n - k), 6) AS ms_within,
           ROUND((ssb / (k - 1)) / NULLIF(ssw / (n - k), 0), 6) AS f_stat
    FROM parts
    """,
    doc="One-way ANOVA F across languages on document length, computed "
    "from per-group sufficient statistics (n, sum x, sum x^2 -- exact "
    "integer sums, so both engines derive identical floats): between/"
    "within mean squares and the F statistic.  One partial-aggregatable "
    "hash-agg over the data; everything after runs on the k-row group "
    "frame.",
)
def q252_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sx"),
        # Square-sum accumulates in DECIMAL(38,0): a BIGINT sum of ~1e12
        # per-doc squares ANSI-aborts around 1e7 docs per group -- the
        # q263 exact-accumulator pattern (round-7 int-overflow audit).
        F.sum((F.col("n_chars") * F.col("n_chars")).cast("decimal(38,0)")).alias("sxx"),
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("sx").alias("tsx"), F.count("*").alias("k")
    )
    joined = per.crossJoin(F.broadcast(tot))
    grand = F.col("tsx").cast("double") / F.col("tn")
    mean_g = F.col("sx").cast("double") / F.col("n")
    parts = joined.groupBy("k", "tn").agg(
        F.sum(F.col("n") * F.pow(mean_g - grand, 2)).alias("ssb"),
        F.sum(F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")).alias("ssw"),
    )
    k, n, ssb, ssw = F.col("k"), F.col("tn"), F.col("ssb"), F.col("ssw")
    return parts.select(
        k.cast("bigint").alias("k"),
        n.cast("bigint").alias("n"),
        F.round(ssb / (k - 1), 6).alias("ms_between"),
        F.round(ssw / (n - k), 6).alias("ms_within"),
        # zero within-group variance: F undefined, NULL both sides
        F.round((ssb / (k - 1)) / F.nullif(ssw / (n - k), F.lit(0.0)), 6).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# q253: Cohen's kappa (value-band predictor vs actual event_type)
# ---------------------------------------------------------------------------


@register(
    "q253_cohens_kappa",
    sql="""
    WITH scored AS (
        SELECT event_type AS actual,
               CASE WHEN value < 50 THEN 'view'
                    WHEN value < 100 THEN 'click'
                    WHEN value < 150 THEN 'scroll'
                    ELSE 'purchase' END AS predicted
        FROM events),
    cells AS (
        SELECT actual, predicted, COUNT(*) AS c FROM scored GROUP BY 1, 2),
    tot AS (SELECT SUM(c) AS n FROM cells),
    po AS (SELECT SUM(CASE WHEN actual = predicted THEN c ELSE 0 END) AS agree
           FROM cells),
    pe AS (
        SELECT SUM(CAST(ra.rc AS DOUBLE) * ca.cc) AS cross_sum
        FROM (SELECT actual AS lbl, SUM(c) AS rc FROM cells GROUP BY 1) ra
        JOIN (SELECT predicted AS lbl, SUM(c) AS cc FROM cells GROUP BY 1) ca
          ON ra.lbl = ca.lbl)
    SELECT CAST(t.n AS BIGINT) AS n,
           ROUND(CAST(po.agree AS DOUBLE) / t.n, 6) AS p_observed,
           ROUND(pe.cross_sum / (CAST(t.n AS DOUBLE) * t.n), 6) AS p_expected,
           ROUND((CAST(po.agree AS DOUBLE) / t.n
                  - pe.cross_sum / (CAST(t.n AS DOUBLE) * t.n))
                 / NULLIF(1.0 - pe.cross_sum / (CAST(t.n AS DOUBLE) * t.n), 0), 6) AS kappa
    FROM tot t, po, pe
    """,
    doc="Cohen's kappa chance-corrected agreement between the q236 "
    "value-band predictor and the actual event_type -- the standard "
    "inter-annotator / model-vs-label agreement score for labeling "
    "pipelines.  One confusion-cell hash-agg; marginals and kappa derive "
    "on the |classes|^2 cell frame.",
)
def q253_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    predicted = (
        F.when(F.col("value") < 50, "view")
        .when(F.col("value") < 100, "click")
        .when(F.col("value") < 150, "scroll")
        .otherwise("purchase")
    )
    cells = (
        e.select(F.col("event_type").alias("actual"), predicted.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("c"))
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("actual") == F.col("predicted"), F.col("c")).otherwise(0)).alias("agree"),
    )
    row_m = cells.groupBy(F.col("actual").alias("lbl")).agg(F.sum("c").alias("rc"))
    col_m = cells.groupBy(F.col("predicted").alias("lbl")).agg(F.sum("c").alias("cc"))
    pe = (
        row_m.join(col_m, "lbl")
        .agg(F.sum(F.col("rc").cast("double") * F.col("cc")).alias("cross_sum"))
    )
    j = tot.crossJoin(F.broadcast(pe))
    n = F.col("n").cast("double")
    p_o = F.col("agree").cast("double") / n
    p_e = F.col("cross_sum") / (n * n)
    return j.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(p_o, 6).alias("p_observed"),
        F.round(p_e, 6).alias("p_expected"),
        # p_e == 1 (single observed class): kappa undefined, NULL both sides
        F.round((p_o - p_e) / F.nullif(1.0 - p_e, F.lit(0.0)), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# q254: Jensen-Shannon divergence of each source's token distribution
# ---------------------------------------------------------------------------


@register(
    "q254_js_divergence",
    sql="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE length(text) > 0),
    sc AS (SELECT source, t, COUNT(*) AS scnt FROM tok GROUP BY 1, 2),
    cc AS (SELECT t, COUNT(*) AS ccnt FROM tok GROUP BY 1),
    ns AS (SELECT source, SUM(scnt) AS nsrc FROM sc GROUP BY 1),
    n AS (SELECT SUM(ccnt) AS ntot FROM cc),
    terms AS (
        SELECT sc.source,
               sc.scnt / CAST(ns.nsrc AS DOUBLE) AS p,
               cc.ccnt / CAST(n.ntot AS DOUBLE) AS c
        FROM sc
        JOIN cc ON sc.t = cc.t
        JOIN ns ON sc.source = ns.source
        CROSS JOIN n)
    SELECT source,
           ROUND(SUM(0.5 * p * log2(p / ((p + c) / 2))
                     + 0.5 * c * log2(c / ((p + c) / 2)))
                 + 0.5 * (1.0 - SUM(c)), 6) AS jsd
    FROM terms GROUP BY source ORDER BY source
    """,
    doc="Jensen-Shannon divergence (log2, in [0,1]) between each source's "
    "token distribution and the whole corpus -- the dataset-mixing "
    "diagnostic for 'which source is most unlike the blend'.  Tokens the "
    "source never emits contribute 0.5*c*log2(c/(c/2)) = 0.5*c, so their "
    "total folds into the closed-form residual 0.5*(1 - sum of covered "
    "corpus mass) and NO source-x-vocabulary cross join is needed: one "
    "vocab hash-join on token, partial-aggregated sums, never all-pairs.",
)
def q254_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tok = d.select("source", F.explode(tokens("text")).alias("t"))
    sc = tok.groupBy("source", "t").agg(F.count("*").alias("scnt"))
    cc = tok.groupBy("t").agg(F.count("*").alias("ccnt"))
    ns = sc.groupBy("source").agg(F.sum("scnt").alias("nsrc"))
    ntot = cc.agg(F.sum("ccnt").alias("ntot"))
    terms = (
        sc.join(cc, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ntot))
        .select(
            "source",
            (F.col("scnt") / F.col("nsrc").cast("double")).alias("p"),
            (F.col("ccnt") / F.col("ntot").cast("double")).alias("c"),
        )
    )
    p, c = F.col("p"), F.col("c")
    m = (p + c) / 2
    return (
        terms.groupBy("source")
        .agg(
            F.round(
                F.sum(0.5 * p * F.log2(p / m) + 0.5 * c * F.log2(c / m))
                + 0.5 * (1.0 - F.sum(c)),
                6,
            ).alias("jsd")
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q255: per-user EWMA smoothing (finite 8-term window, alpha = 0.25)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.25
_EWMA_TERMS = 8


def _ewma_oracle() -> str:
    num, den = [], []
    for j in range(_EWMA_TERMS):
        wj = (1 - _EWMA_ALPHA) ** j
        x = "value" if j == 0 else f"lag(value, {j}) OVER w"
        num.append(f"CASE WHEN {x} IS NOT NULL THEN {wj!r} * ({x}) ELSE 0 END")
        den.append(f"CASE WHEN {x} IS NOT NULL THEN {wj!r} ELSE 0 END")
    return f"""
    SELECT event_id, user_id, ROUND(value, 6) AS value,
           ROUND(({' + '.join(num)}) / ({' + '.join(den)}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """


@register(
    "q255_ewma_smooth",
    sql=_ewma_oracle(),
    doc=f"Per-user EWMA smoothing with a finite {_EWMA_TERMS}-term kernel "
    f"(alpha={_EWMA_ALPHA}), weights renormalized over the lags that "
    "exist near the partition head -- the smoothing pass behind rate "
    "monitoring and q136-style anomaly flags.  The infinite-history "
    "recurrence is deliberately truncated: weights below (1-a)^8 are "
    "sub-0.1, and a bounded kernel means O(1) state per row and ONE "
    "window shuffle on user_id (every lag shares the same window spec).",
)
def q255_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(_EWMA_TERMS):
        wj = (1 - _EWMA_ALPHA) ** j
        x = F.col("value") if j == 0 else F.lag("value", j).over(w)
        num = num + F.when(x.isNotNull(), F.lit(wj) * x).otherwise(0.0)
        den = den + F.when(x.isNotNull(), F.lit(wj)).otherwise(0.0)
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q256: CUSUM changepoint detection per user
# ---------------------------------------------------------------------------


@register(
    "q256_cusum_changepoint",
    sql="""
    WITH mu AS (SELECT ROUND(AVG(value), 6) AS mu FROM events),
    s AS (
        SELECT user_id, event_id,
               SUM(value - mu) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        FROM events, mu),
    per AS (
        SELECT user_id, COUNT(*) AS n,
               MAX(cusum) - MIN(cusum) AS drift,
               MAX(ROUND(ABS(cusum), 9)) AS mxabs
        FROM s GROUP BY user_id)
    SELECT p.user_id, CAST(p.n AS BIGINT) AS n,
           ROUND(p.drift, 6) AS drift,
           MIN(s.event_id) AS changepoint_event
    FROM per p JOIN s ON s.user_id = p.user_id
                      AND ROUND(ABS(s.cusum), 9) = p.mxabs
    GROUP BY p.user_id, p.n, p.drift
    ORDER BY p.user_id
    """,
    doc="CUSUM changepoint detection per user: cumulative sum of "
    "deviations from the (pre-rounded, hence engine-identical) global "
    "mean, the max-minus-min drift, and the earliest event where |CUSUM| "
    "peaks -- the classic level-shift detector.  One window shuffle on "
    "user_id for the running sum; the peak row resolves via a per-user "
    "aggregate joined back (equi-join), never a per-row rank.",
)
def q256_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    mu = e.agg(F.round(F.avg("value"), 6).alias("mu"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = e.crossJoin(F.broadcast(mu)).select(
        "user_id",
        "event_id",
        F.sum(F.col("value") - F.col("mu")).over(w).alias("cusum"),
    )
    per = s.groupBy(F.col("user_id").alias("uid")).agg(
        F.count("*").alias("n"),
        (F.max("cusum") - F.min("cusum")).alias("drift"),
        F.max(F.round(F.abs("cusum"), 9)).alias("mxabs"),
    )
    return (
        s.join(
            per,
            (F.col("user_id") == F.col("uid"))
            & (F.round(F.abs(F.col("cusum")), 9) == F.col("mxabs")),
        )
        .groupBy("uid", "n", "drift")
        .agg(F.min("event_id").alias("changepoint_event"))
        .select(
            F.col("uid").alias("user_id"),
            F.col("n").cast("bigint").alias("n"),
            F.round("drift", 6).alias("drift"),
            "changepoint_event",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q257: tokenizer fertility statistics per language
# ---------------------------------------------------------------------------


@register(
    "q257_tokenizer_fertility",
    sql="""
    WITH per AS (
        SELECT lang,
               len(string_split(text, ' ')) AS toks,
               strlen(text) AS bytes
        FROM documents WHERE length(text) > 0)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(toks), 6) AS avg_tokens,
           ROUND(SUM(CAST(bytes AS DOUBLE)) / SUM(toks), 6) AS bytes_per_token,
           ROUND(SUM(CAST(toks AS DOUBLE)) * 100.0 / SUM(bytes), 6)
               AS tokens_per_100_bytes
    FROM per GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility per language: average tokens per document, "
    "bytes per token, and tokens per 100 bytes (the compression-ratio "
    "fingerprint that decides per-language sampling weights in a "
    "multilingual training mix).  Shuffle-free codegen projections into "
    "one partial-aggregatable hash-agg on lang.",
)
def q257_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    per = d.select(
        "lang",
        F.size(tokens("text")).alias("toks"),
        F.octet_length("text").alias("bytes"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("toks"), 6).alias("avg_tokens"),
            F.round(
                F.sum(F.col("bytes").cast("double")) / F.sum("toks"), 6
            ).alias("bytes_per_token"),
            F.round(
                F.sum(F.col("toks").cast("double")) * 100.0 / F.sum("bytes"), 6
            ).alias("tokens_per_100_bytes"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q258: per-source token entropy and KL divergence vs the corpus
# ---------------------------------------------------------------------------


@register(
    "q258_corpus_entropy",
    sql="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE length(text) > 0),
    sc AS (SELECT source, t, COUNT(*) AS scnt FROM tok GROUP BY 1, 2),
    cc AS (SELECT t, COUNT(*) AS ccnt FROM tok GROUP BY 1),
    ns AS (SELECT source, SUM(scnt) AS nsrc FROM sc GROUP BY 1),
    n AS (SELECT SUM(ccnt) AS ntot FROM cc)
    SELECT sc.source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           ROUND(-SUM((sc.scnt / CAST(ns.nsrc AS DOUBLE))
                      * log2(sc.scnt / CAST(ns.nsrc AS DOUBLE))), 6) AS entropy_bits,
           ROUND(SUM((sc.scnt / CAST(ns.nsrc AS DOUBLE))
                     * log2((sc.scnt / CAST(ns.nsrc AS DOUBLE))
                            / (cc.ccnt / CAST(n.ntot AS DOUBLE)))), 6) AS kl_vs_corpus
    FROM sc
    JOIN cc ON sc.t = cc.t
    JOIN ns ON sc.source = ns.source
    CROSS JOIN n
    GROUP BY sc.source ORDER BY sc.source
    """,
    doc="Per-source Shannon entropy of the token distribution plus KL "
    "divergence against the corpus blend (support of a source is a "
    "subset of the corpus support, so KL is finite and needs no "
    "smoothing) -- entropy collapse is the templated/generated-text "
    "tell, KL ranks sources by distributional distance.  Same bounded "
    "shape as q254: vocab hash-join, partial-aggregated sums.",
)
def q258_corpus_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tok = d.select("source", F.explode(tokens("text")).alias("t"))
    sc = tok.groupBy("source", "t").agg(F.count("*").alias("scnt"))
    cc = tok.groupBy("t").agg(F.count("*").alias("ccnt"))
    ns = sc.groupBy("source").agg(F.sum("scnt").alias("nsrc"))
    ntot = cc.agg(F.sum("ccnt").alias("ntot"))
    p = F.col("scnt") / F.col("nsrc").cast("double")
    c = F.col("ccnt") / F.col("ntot").cast("double")
    return (
        sc.join(cc, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ntot))
        .groupBy("source")
        .agg(
            F.count("*").alias("vocab"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
            F.round(F.sum(p * F.log2(p / c)), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q259: exact per-source quantile normalization without per-row windows
# ---------------------------------------------------------------------------


@register(
    "q259_quantile_normalize",
    sql="""
    SELECT doc_id, source, n_chars,
           ROUND(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
               AS pct
    FROM documents
    ORDER BY doc_id
    """,
    doc="Quantile normalization: each document's length mapped to its "
    "exact within-source percent_rank.  The oracle spells it with the "
    "per-row window; the engine computes the identical value from the "
    "distinct-value histogram -- percent_rank = (min_rank - 1) / (n - 1) "
    "where min_rank - 1 is the count of strictly smaller values, i.e. a "
    "cumulative sum over the per-(source, length) count frame -- so the "
    "raw rows join a small histogram by (source, n_chars) and are never "
    "sorted or windowed.  At 100 TB this is the difference between a "
    "per-source total sort and a broadcast-join lookup.",
)
def q259_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hist = d.groupBy("source", "n_chars").agg(F.count("*").alias("m"))
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source",
        "n_chars",
        (F.sum("m").over(w) - F.col("m")).alias("before"),
        F.sum("m").over(Window.partitionBy("source")).alias("n_src"),
    )
    pct = cum.select(
        "source",
        "n_chars",
        # percent_rank of a single-row partition is 0 by definition; guard
        # the n-1 denominator (ANSI mode raises on divide-by-zero).
        F.when(F.col("n_src") > 1,
               F.round(F.col("before").cast("double") / (F.col("n_src") - 1), 6))
        .otherwise(0.0)
        .alias("pct"),
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .join(F.broadcast(pct), ["source", "n_chars"])
        .select("doc_id", "source", "n_chars", "pct")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q260: frequent itemsets via MLlib FPGrowth (exact-oracle twin of q217)
# ---------------------------------------------------------------------------

# 1/16 is exactly representable in binary, so FPGrowth's internal
# ceil(minSupport * n) equals the oracle's integer ceiling (n + 15) // 16 for
# every n -- a decimal like 0.05 would drift (0.05 * 140 = 7.000...0004,
# whose ceil is 8, while ceil(140/20) = 7).
_FP_MIN_SUPPORT = 0.0625


@register(
    "q260_fpgrowth_itemsets",
    sql=f"""
    WITH bi AS (
        SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    n AS (SELECT COUNT(DISTINCT ok) AS n FROM bi),
    singles AS (
        SELECT item AS itemset, COUNT(*) AS freq FROM bi GROUP BY item),
    pairs AS (
        SELECT a.item || ',' || b.item AS itemset, COUNT(*) AS freq
        FROM bi a JOIN bi b ON a.ok = b.ok AND a.item < b.item
        GROUP BY 1)
    SELECT itemset, CAST(freq AS BIGINT) AS freq
    FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs), n
    WHERE freq >= (n.n + 15) // 16
    ORDER BY itemset
    """,
    doc="Frequent brand itemsets (sizes 1-2) via MLlib FPGrowth over "
    "per-order baskets -- the library twin of q217's hand-rolled market "
    "basket, oracle-checked against the exact relational spelling "
    "(distinct basket-item pairs, self-join for pairs, integer-ceiling "
    "support threshold).  FPGrowth is the scale path: the FP-tree "
    "conditional growth is distributed by item suffix (parallel FP-"
    "Growth, Li et al. 2008), so no candidate-pair shuffle touches the "
    "basket frame; the oracle's self-join is quadratic only within a "
    "basket (q217's argument).",
)
def q260_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("items"))
    )
    model = FPGrowth(
        itemsCol="items", minSupport=_FP_MIN_SUPPORT, minConfidence=0.5
    ).fit(baskets)
    return (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.concat_ws(",", F.array_sort("items")).alias("itemset"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        .orderBy("itemset")
    )
