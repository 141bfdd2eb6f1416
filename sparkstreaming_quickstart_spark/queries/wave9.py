"""Wave-9 operators (round 2): the analytics/science layer -- RAG index
capstone, growth/engagement curves, experimentation statistics (z-test,
Welch t, chi-square, PSI), inequality and survival analysis, corpus
statistics (Zipf, Heaps, burstiness), attribution, weighted quantiles, and
cross-source overlap.

Reference parity note: as with waves 7-8, the reference has no analytics
surface; these are charter extensions (SURVEY.md section 2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q226: RAG retrieval-index build capstone (chunk -> embed -> ANN bucket)
# ---------------------------------------------------------------------------

_RAG_DIMS = 8
_RAG_ORACLE = """
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE length(text) > 0),
    idx AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(ceil(len(toks) / 32.0) AS BIGINT))) AS pos
        FROM docs),
    ct AS (
        SELECT doc_id, CAST(pos AS INT) AS pos,
               unnest(list_slice(toks, pos * 32 + 1, pos * 32 + 32)) AS token
        FROM idx),
    f AS (
        SELECT doc_id, pos,
               CAST(md5_number_lower(token) % 8 AS BIGINT) AS fidx,
               CASE WHEN md5_number_lower('s:' || token) % 2 = 1 THEN 1 ELSE -1 END AS sgn
        FROM ct),
    v AS (
        SELECT doc_id, pos,
               CAST(SUM(CASE WHEN fidx = 0 THEN sgn ELSE 0 END) AS BIGINT) AS v0,
               CAST(SUM(CASE WHEN fidx = 1 THEN sgn ELSE 0 END) AS BIGINT) AS v1,
               CAST(SUM(CASE WHEN fidx = 2 THEN sgn ELSE 0 END) AS BIGINT) AS v2,
               CAST(SUM(CASE WHEN fidx = 3 THEN sgn ELSE 0 END) AS BIGINT) AS v3,
               CAST(SUM(CASE WHEN fidx = 4 THEN sgn ELSE 0 END) AS BIGINT) AS v4,
               CAST(SUM(CASE WHEN fidx = 5 THEN sgn ELSE 0 END) AS BIGINT) AS v5,
               CAST(SUM(CASE WHEN fidx = 6 THEN sgn ELSE 0 END) AS BIGINT) AS v6,
               CAST(SUM(CASE WHEN fidx = 7 THEN sgn ELSE 0 END) AS BIGINT) AS v7
        FROM f GROUP BY doc_id, pos),
    b AS (
        SELECT doc_id, pos,
               CAST((CASE WHEN v0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN v1 > 0 THEN 2 ELSE 0 END) + (CASE WHEN v2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN v3 > 0 THEN 8 ELSE 0 END) + (CASE WHEN v4 > 0 THEN 16 ELSE 0 END) + (CASE WHEN v5 > 0 THEN 32 ELSE 0 END) + (CASE WHEN v6 > 0 THEN 64 ELSE 0 END) + (CASE WHEN v7 > 0 THEN 128 ELSE 0 END) AS INT) AS bucket,
               sqrt(v0 * v0 + v1 * v1 + v2 * v2 + v3 * v3 + v4 * v4 + v5 * v5 + v6 * v6 + v7 * v7) AS nrm
        FROM v)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           ROUND(AVG(nrm), 6) AS avg_norm
    FROM b GROUP BY bucket ORDER BY bucket
"""


@register(
    "q226_rag_index_build",
    sql=_RAG_ORACLE,
    doc="Retrieval-index build capstone (the RAG ingestion pipeline): "
    "documents chunk into 32-token windows (q109/q183 machinery), each "
    "chunk embeds via the vocabulary-free signed-hashing featurizer "
    "(q168, 8-dim -- the deterministic stand-in for a neural encoder, "
    "same honest-stub policy as the multimodal codecs), sign bits of the "
    "embedding assign the ANN bucket (q55's hyperplane-LSH shape on "
    "hashed features), and the output is the bucket occupancy table "
    "(chunks, distinct docs, mean vector norm) an ANN serving layer "
    "loads.  One oracle proves the composed chain.  Plan: chunking and "
    "hashing are one narrow explode chain; the ONLY shuffles are the "
    "per-chunk feature agg and the bucket rollup -- no joins anywhere.",
)
def q226_rag_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_mod

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    # Chunk assignment is pure integer arithmetic on the token position: one
    # posexplode and `pos div 32` replaces the earlier chunk-array transform
    # -> posexplode -> explode chain (which materialized every chunk as an
    # array before re-exploding it -- 2x the token bytes through the narrow
    # stage for the same rows).
    ct = d.select("doc_id", F.posexplode(t).alias("tpos", "token")).select(
        "doc_id", F.floor(F.col("tpos") / F.lit(32)).cast("int").alias("pos"), "token"
    )
    # Power-of-two moduli take the md5_mod low-byte fast path (1 conv
    # instead of 8 per hash; the oracle's md5_number_lower % m is identical).
    fidx = md5_mod(F.col("token"), _RAG_DIMS)
    sgn = F.when(
        md5_mod(F.concat(F.lit("s:"), F.col("token")), 2) == 1, 1
    ).otherwise(-1)
    v = ct.select("doc_id", "pos", fidx.alias("fidx"), sgn.alias("sgn")).groupBy(
        "doc_id", "pos"
    ).agg(
        *[
            F.sum(F.when(F.col("fidx") == i, F.col("sgn")).otherwise(0)).alias(f"v{i}")
            for i in range(_RAG_DIMS)
        ]
    )
    bucket = sum(
        (F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(0) for i in range(_RAG_DIMS)),
        F.lit(0),
    ).cast("int")
    nrm = F.sqrt(sum((F.col(f"v{i}") * F.col(f"v{i}") for i in range(_RAG_DIMS)), F.lit(0)))
    b = v.select("doc_id", "pos", bucket.alias("bucket"), nrm.alias("nrm"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q227: exponential time-decayed engagement score
# ---------------------------------------------------------------------------


@register(
    "q227_decayed_engagement",
    sql="""
    WITH scored AS (
        SELECT user_id,
               value * exp(-(ln(2) / 7.0) *
                   ((epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts)) / 86400000000.0)) AS w
        FROM events)
    SELECT user_id,
           ROUND(SUM(w), 6) AS engagement,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM scored
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Exponential time-decayed engagement score (half-life 7 days, "
    "anchored at a FIXED literal 'now' so the result is reproducible and "
    "oracle-checkable): recent activity dominates, old activity fades -- "
    "the standard recsys/ranking freshness feature.  Decay is a pure "
    "codegen expression folded into one hash-agg; the incremental "
    "maintenance trick (score_new = score_old * decay^dt + increment, "
    "which q177's upsert sink would apply per batch) works because "
    "exponential decay is the unique memoryless weighting.",
)
def q227_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    anchor = F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    age_days = (
        F.unix_micros(anchor) - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / 86400000000.0
    import math

    w = F.col("value") * F.exp(-(math.log(2) / 7.0) * age_days)
    return (
        e.select("user_id", w.alias("w"))
        .groupBy("user_id")
        .agg(
            F.round(F.sum("w"), 6).alias("engagement"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q228: cumulative user-growth curve
# ---------------------------------------------------------------------------


@register(
    "q228_growth_curve",
    sql="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS d0 FROM events GROUP BY 1),
    new_by_day AS (
        SELECT d0 AS day, COUNT(*) AS new_users FROM first_seen GROUP BY 1),
    active_by_day AS (
        SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY 1)
    SELECT a.day,
           CAST(a.dau AS BIGINT) AS dau,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY a.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
    FROM active_by_day a LEFT JOIN new_by_day n ON a.day = n.day
    ORDER BY a.day
    """,
    doc="User-growth curve: daily active users, newly-acquired users "
    "(first-seen day), and the cumulative registered-user count -- the "
    "running DISTINCT problem solved the scalable way: first-seen day "
    "per user (one hash-agg) converts 'distinct users up to day d' into "
    "a plain cumulative SUM over the tiny per-day frame, instead of a "
    "re-scan-per-day or an O(days x users) window.  The final window "
    "runs over ~30 rows; all heavy lifting is two hash-aggs.",
)
def q228_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
    )
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("d0"))
    new_by_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    active = e.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        active.join(new_by_day, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q229: A/B experiment analysis (two-proportion z-test)
# ---------------------------------------------------------------------------


@register(
    "q229_ab_test_ztest",
    sql="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN CAST('0x' || substr(md5('exp1|' || user_id), 1, 8) AS BIGINT) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS variant,
               max(CASE WHEN event_type = 'purchase' AND value >= 150.0 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id),
    arms AS (
        SELECT variant, COUNT(*) AS n, SUM(converted) AS conv
        FROM assigned GROUP BY variant),
    wide AS (
        SELECT MAX(CASE WHEN variant = 'control' THEN n END) AS n_c,
               MAX(CASE WHEN variant = 'control' THEN conv END) AS x_c,
               MAX(CASE WHEN variant = 'treatment' THEN n END) AS n_t,
               MAX(CASE WHEN variant = 'treatment' THEN conv END) AS x_t
        FROM arms)
    SELECT CAST(n_c AS BIGINT) AS n_control, CAST(x_c AS BIGINT) AS conv_control,
           CAST(n_t AS BIGINT) AS n_treatment, CAST(x_t AS BIGINT) AS conv_treatment,
           ROUND(CAST(x_c AS DOUBLE) / n_c, 6) AS rate_control,
           ROUND(CAST(x_t AS DOUBLE) / n_t, 6) AS rate_treatment,
           ROUND((CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c)
                 / sqrt((CAST(x_c + x_t AS DOUBLE) / (n_c + n_t))
                        * (1.0 - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t))
                        * (1.0 / n_c + 1.0 / n_t)), 6) AS z_stat,
           ABS((CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c)
               / sqrt((CAST(x_c + x_t AS DOUBLE) / (n_c + n_t))
                      * (1.0 - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t))
                      * (1.0 / n_c + 1.0 / n_t))) >= 1.96 AS significant_95
    FROM wide
    """,
    doc="A/B experiment analysis: deterministic hash assignment (salted "
    "md5 of user_id -- the same stable-bucketing contract as q208's "
    "split, so a user never changes arms), per-user conversion "
    "(made a high-value purchase -- a non-saturating event), and the pooled two-proportion z-test "
    "with a 95% significance verdict.  Two hash-aggs (user collapse, "
    "arm rollup) and a one-row final computation -- experiment analysis "
    "at 100 TB is exactly this shape because the statistics are "
    "sufficient-statistic aggregates.",
)
def q229_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    from ..operators.dedup import md5_bucket

    variant = F.when(
        md5_bucket(F.col("user_id"), "exp1|", 2) == 0, "control"
    ).otherwise("treatment")
    assigned = (
        e.select("user_id", variant.alias("variant"), ((F.col("event_type") == "purchase") & (F.col("value") >= 150.0)).cast("int").alias("p"))
        .groupBy("user_id", "variant")
        .agg(F.max("p").alias("converted"))
    )
    arms = assigned.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("variant") == "control", F.col("conv"))).alias("x_c"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("variant") == "treatment", F.col("conv"))).alias("x_t"),
    )
    n_c, x_c, n_t, x_t = (F.col(x).cast("double") for x in ("n_c", "x_c", "n_t", "x_t"))
    pooled = (x_c + x_t) / (n_c + n_t)
    z = (x_t / n_t - x_c / n_c) / F.sqrt(
        pooled * (1.0 - pooled) * (1.0 / n_c + 1.0 / n_t)
    )
    return wide.select(
        F.col("n_c").alias("n_control"),
        F.col("x_c").alias("conv_control"),
        F.col("n_t").alias("n_treatment"),
        F.col("x_t").alias("conv_treatment"),
        F.round(x_c / n_c, 6).alias("rate_control"),
        F.round(x_t / n_t, 6).alias("rate_treatment"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) >= 1.96).alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# q230: revenue concentration (Gini coefficient + Lorenz curve)
# ---------------------------------------------------------------------------


@register(
    "q230_gini_concentration",
    sql="""
    WITH per_cust AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
    ranked AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
               COUNT(*) OVER () AS n,
               SUM(rev) OVER () AS total
        FROM per_cust),
    gini AS (
        SELECT ROUND((2.0 * SUM(CAST(i AS DOUBLE) * CAST(rev AS DOUBLE))
                      / (n * CAST(total AS DOUBLE))) - (n + 1.0) / n, 6) AS g
        FROM ranked GROUP BY n, total),
    lorenz AS (
        SELECT CAST(ceil(i * 10.0 / n) AS INT) AS decile,
               SUM(rev) AS decile_rev
        FROM ranked GROUP BY 1)
    SELECT l.decile,
           ROUND(CAST(l.decile_rev AS DOUBLE)
                 / CAST((SELECT SUM(decile_rev) FROM lorenz) AS DOUBLE), 6) AS rev_share,
           g.g AS gini
    FROM lorenz l, gini g
    ORDER BY l.decile
    """,
    doc="Revenue concentration: Gini coefficient (rank formula "
    "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over revenue-sorted "
    "customers) plus the Lorenz decile shares -- the "
    "whale-concentration report behind 'top 10% of customers drive X% "
    "of revenue'.  Per-customer revenue aggregates in DECIMAL (exact), "
    "and the global rank uses the q193 two-phase width_bucket pattern: "
    "per-bucket row_number (partitioned, parallel) plus broadcast "
    "bucket-count offsets, so the per-customer frame never funnels "
    "through a single-partition window; n/total attach as a broadcast "
    "1-row aggregate and deciles are a constant-domain rollup.",
)
def q230_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    # README rule 9: per_cust feeds rng, tot AND bucketed -- materialize the
    # shared aggregate once or the plan re-scans orders per consumer (the
    # audit showed 15 scans / 52 exchanges before this round-9 fix).
    per_cust = per_cust.localCheckpoint(eager=True)
    # Two-phase global rank (the q193 width_bucket pattern): bucket by rev
    # value, per-bucket row_number partitioned by bucket, plus broadcast
    # bucket-count offsets -- the customer frame never funnels through one
    # partition.  double() is order-preserving over decimal, so equal revs
    # share a bucket and the within-bucket (rev, o_custkey) sort keeps the
    # global order exact.  n/total come from a broadcast 1-row aggregate,
    # not a global window.
    n_buckets = 1024
    rng = per_cust.agg(
        F.min(F.col("rev").cast("double")).alias("lo"),
        (F.max(F.col("rev").cast("double")) + 1.0).alias("hi"),
    )
    tot = per_cust.agg(
        F.count("*").alias("n"), F.sum("rev").alias("total")
    )
    bucketed = per_cust.crossJoin(F.broadcast(rng)).select(
        "o_custkey",
        "rev",
        F.width_bucket(F.col("rev").cast("double"), "lo", "hi", F.lit(n_buckets)).alias("b"),
    )
    offsets = (
        bucketed.groupBy("b")
        .agg(F.count("*").alias("m"))
        .select(
            "b",
            F.sum("m")
            .over(Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1))
            .alias("off"),
        )
        .fillna(0, ["off"])
    )
    ranked = (
        bucketed.withColumn(
            "r", F.row_number().over(Window.partitionBy("b").orderBy("rev", "o_custkey"))
        )
        .join(F.broadcast(offsets), "b")
        .crossJoin(F.broadcast(tot))
        .select("rev", (F.col("off") + F.col("r")).alias("i"), "n", "total")
    )
    gini = ranked.groupBy("n", "total").agg(
        F.round(
            (
                2.0
                * F.sum(F.col("i").cast("double") * F.col("rev").cast("double"))
                / (F.col("n") * F.col("total").cast("double"))
            )
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini")
    ).select("gini")
    lorenz = (
        ranked.groupBy(
            F.ceil(F.col("i") * 10.0 / F.col("n")).cast("int").alias("decile")
        )
        .agg(F.sum("rev").alias("decile_rev"))
        .localCheckpoint(eager=True)  # 10-row frame, read by total_rev + output
    )
    total_rev = lorenz.agg(F.sum("decile_rev").alias("tr"))
    return (
        lorenz.crossJoin(F.broadcast(total_rev))
        .crossJoin(F.broadcast(gini))
        .select(
            "decile",
            F.round(
                F.col("decile_rev").cast("double") / F.col("tr").cast("double"), 6
            ).alias("rev_share"),
            "gini",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q231: chi-square test of independence (lang x source)
# ---------------------------------------------------------------------------


@register(
    "q231_chi_square_independence",
    sql="""
    WITH obs AS (
        SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    margins AS (
        SELECT o.lang, o.source, o.o,
               SUM(o.o) OVER (PARTITION BY o.lang) AS row_total,
               SUM(o.o) OVER (PARTITION BY o.source) AS col_total,
               SUM(o.o) OVER () AS grand
        FROM obs o),
    cells AS (
        SELECT lang, source, o,
               CAST(row_total AS DOUBLE) * col_total / grand AS e
        FROM margins)
    SELECT ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS BIGINT) AS dof,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM cells
    """,
    doc="Chi-square test of independence over the (lang, source) "
    "contingency table: observed vs expected-under-independence cell "
    "counts fold into the chi2 statistic with its degrees of freedom -- "
    "the categorical-drift / stratification-bias check a corpus data "
    "card (q144) cites.  One hash-agg builds the contingency table "
    "(|langs| x |sources| cells); margins and the statistic compute on "
    "that TINY frame, so the window functions never touch row-scale "
    "data.  Verdict thresholding (p-value) needs the chi2 CDF -- "
    "reported as the statistic + dof, the sufficient pair.",
)
def q231_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    margins = obs.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_total"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_total"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    cells = margins.withColumn(
        "e", F.col("row_total").cast("double") * F.col("col_total") / F.col("grand")
    )
    return cells.agg(
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
        ((F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)).alias("dof"),
        F.count("*").alias("n_cells"),
    )


# ---------------------------------------------------------------------------
# q232: population stability index (distribution drift per source)
# ---------------------------------------------------------------------------


@register(
    "q232_psi_drift",
    sql="""
    WITH base AS (
        SELECT lang, CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS p
        FROM documents GROUP BY lang),
    per_source AS (
        SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
    totals AS (SELECT source, SUM(n) AS tot FROM per_source GROUP BY source),
    q AS (
        SELECT ps.source, ps.lang, CAST(ps.n AS DOUBLE) / t.tot AS q
        FROM per_source ps JOIN totals t ON ps.source = t.source),
    joined AS (
        SELECT b.lang, q.source,
               COALESCE(q.q, 0.0001) AS q, b.p
        FROM base b LEFT JOIN q ON b.lang = q.lang)
    SELECT source,
           ROUND(SUM((q - p) * ln(q / p)), 6) AS psi,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM joined
    WHERE source IS NOT NULL
    GROUP BY source
    ORDER BY source
    """,
    doc="Population Stability Index per source: each source's language "
    "distribution q compared against the corpus-wide baseline p via "
    "PSI = sum((q-p) * ln(q/p)) -- the standard ML-ops drift metric "
    "(PSI > 0.25 flags a shifted slice); here it scores ingestion "
    "sources for distribution skew before they enter the mix (q143).  "
    "Missing bins floor at 1e-4, the conventional smoothing.  Two "
    "hash-aggs over the (source, lang) domain, baseline broadcast onto "
    "the per-source rows -- all tiny frames after the first agg.",
)
def q232_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # baseline share via a window over the tiny per-lang agg -- no separate
    # count() job, single pass over the table
    base = (
        d.groupBy("lang")
        .agg(F.count("*").alias("nl"))
        .select(
            "lang",
            (
                F.col("nl").cast("double")
                / F.sum("nl").over(Window.partitionBy())
            ).alias("p"),
        )
    )
    per_source = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    totals = per_source.groupBy("source").agg(F.sum("n").alias("tot"))
    q = per_source.join(totals, "source").select(
        "source", "lang", (F.col("n").cast("double") / F.col("tot")).alias("q")
    )
    joined = F.broadcast(base).join(q, "lang", "left").select(
        "source", "p", F.coalesce("q", F.lit(0.0001)).alias("q")
    )
    return (
        joined.filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(
            F.round(
                F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))), 6
            ).alias("psi"),
            F.count("*").alias("n_bins"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q233: dedup provenance report (why was this document dropped?)
# ---------------------------------------------------------------------------


def _q233_oracle() -> str:
    from .llm import _jaccard_oracle

    jaccard = _jaccard_oracle(0.7).strip()
    return f"""
    WITH e AS (
        SELECT doc_id, keeper FROM (
            SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
            FROM documents)
        WHERE doc_id <> keeper),
    jp AS ({jaccard}),
    nd AS (SELECT d2 AS doc_id, MIN(d1) AS keeper FROM jp GROUP BY d2),
    cp AS (
        WITH docs AS (
            SELECT doc_id,
                   list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            WHERE len(toks) >= 3),
        tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
        sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
        pairs AS (
            SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT id1, id2
        FROM pairs JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
        WHERE ROUND(CAST(common AS DOUBLE) / LEAST(s1.n, s2.n), 9) >= 0.8),
    ct AS (SELECT id2 AS doc_id, MIN(id1) AS keeper FROM cp GROUP BY id2)
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
                WHEN ct.doc_id IS NOT NULL THEN 'containment'
                ELSE 'kept' END AS status,
           CASE WHEN e.doc_id IS NOT NULL THEN e.keeper
                WHEN nd.doc_id IS NOT NULL THEN nd.keeper
                ELSE ct.keeper END AS matched_id
    FROM documents d
    LEFT JOIN e ON d.doc_id = e.doc_id
    LEFT JOIN nd ON d.doc_id = nd.doc_id
    LEFT JOIN ct ON d.doc_id = ct.doc_id
    ORDER BY d.doc_id
    """


@register(
    "q233_dedup_provenance",
    sql=_q233_oracle(),
    doc="Dedup provenance report -- the 'why was my document dropped?' "
    "explainability table a corpus pipeline owes its users: every doc "
    "classified as exact (hash match, keeper = cluster min), near_dup "
    "(MinHash-LSH at 0.7, q52's scale path), containment (doc-in-doc at "
    "0.8, q185's prefix filter), or kept, with the lowest matching "
    "keeper id for appeal/audit.  Precedence exact > near_dup > "
    "containment mirrors pipeline stage order (cheapest evidence "
    "first).  Each stage runs its own scale-safe form; the report join "
    "is three LEFT JOINs on doc_id.  One oracle replays all three "
    "stages exactly (the LSH threshold sits above the banding knee, so "
    "the exact-Jaccard formulation is deterministic-equal).",
)
def q233_dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs
    from .wave7 import containment_pairs

    # README rule 9 (round-9 fix): the (doc_id, text) projection feeds FOUR
    # consumers (exact stage, LSH stage, containment stage, report base);
    # checkpoint it once instead of re-scanning documents per stage (the
    # q306 between-stage discipline; audit showed 9 scans / 18 exchanges).
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(F.md5("text"))
    e_dropped = (
        d.select("doc_id", F.min("doc_id").over(w).alias("keeper"))
        .filter(F.col("doc_id") != F.col("keeper"))
        .withColumnRenamed("keeper", "e_keeper")
    )
    nd = (
        minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7)
        .groupBy(F.col("d2").alias("doc_id"))
        .agg(F.min("d1").alias("nd_keeper"))
    )
    ct = (
        containment_pairs(d, 0.8)
        .groupBy(F.col("id2").alias("doc_id"))
        .agg(F.min("id1").alias("ct_keeper"))
    )
    return (
        d.select("doc_id")
        .join(e_dropped, "doc_id", "left")
        .join(nd, "doc_id", "left")
        .join(ct, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("e_keeper").isNotNull(), "exact")
            .when(F.col("nd_keeper").isNotNull(), "near_dup")
            .when(F.col("ct_keeper").isNotNull(), "containment")
            .otherwise("kept")
            .alias("status"),
            F.coalesce("e_keeper", "nd_keeper", "ct_keeper").alias("matched_id"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q234: share-of-parent contribution analysis over ROLLUP
# ---------------------------------------------------------------------------


@register(
    "q234_share_of_parent",
    sql="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2),
    region_tot AS (SELECT region, SUM(rev) AS rtot FROM rev GROUP BY 1),
    grand AS (SELECT SUM(rev) AS g FROM rev)
    SELECT rev.region, rev.nation,
           CAST(rev.rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev.rev AS DOUBLE) / CAST(rt.rtot AS DOUBLE), 6) AS share_of_region,
           ROUND(CAST(rt.rtot AS DOUBLE) / CAST(grand.g AS DOUBLE), 6) AS region_share_of_total
    FROM rev JOIN region_tot rt ON rev.region = rt.region, grand
    ORDER BY rev.region, rev.nation
    """,
    doc="Share-of-parent contribution analysis: every nation's revenue "
    "share WITHIN its region, and each region's share of the grand "
    "total, in one result -- the drill-down contribution report behind "
    "'France is 31% of Europe, Europe is 24% of total'.  Engine path "
    "computes the leaf aggregate once and derives both parent levels "
    "with window sums over the tiny (region, nation) frame -- no second "
    "pass over orders, no rollup re-scan; the star join broadcasts all "
    "three dims (q11's pinned shape).  DECIMAL accumulate, double "
    "publish.",
)
def q234_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_region).cast("double"), 6
        ).alias("share_of_region"),
        F.round(
            F.sum("rev").over(w_region).cast("double")
            / F.sum("rev").over(w_all).cast("double"),
            6,
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")


# ---------------------------------------------------------------------------
# q235: two-stage cluster sampling (sample orders, keep whole baskets)
# ---------------------------------------------------------------------------


@register(
    "q235_cluster_sample",
    sql="""
    WITH sampled AS (
        SELECT o_orderkey FROM orders
        WHERE CAST('0x' || substr(md5('clus|' || o_orderkey), 1, 8) AS BIGINT) % 10 = 0)
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN sampled s ON l.l_orderkey = s.o_orderkey
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="Two-stage CLUSTER sampling: sample ~10% of ORDERS by a salted "
    "key hash, then keep every lineitem of a sampled order -- the "
    "unit-consistent sample (whole baskets survive intact) that row-"
    "level sampling (q87/q123) cannot give, required whenever the "
    "analysis is per-basket (q217's market-basket rules, order-level "
    "funnels).  The deterministic hash makes the same clusters sample "
    "on every run and engine; the membership join is a broadcastable "
    "semi-join shape (10% of order KEYS, not data).",
)
def q235_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sampled = o.filter(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("clus|"), F.col("o_orderkey"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10
        == 0
    ).select("o_orderkey")
    return (
        li.join(F.broadcast(sampled), li.l_orderkey == sampled.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q236: multiclass one-vs-rest evaluation (per-class PR/F1 + macro average)
# ---------------------------------------------------------------------------


@register(
    "q236_multiclass_eval",
    sql="""
    WITH scored AS (
        SELECT event_type AS actual,
               CASE WHEN value < 50 THEN 'view'
                    WHEN value < 100 THEN 'click'
                    WHEN value < 150 THEN 'scroll'
                    ELSE 'purchase' END AS predicted
        FROM events),
    classes AS (SELECT DISTINCT actual AS cls FROM scored),
    per_class AS (
        SELECT c.cls,
               CAST((SELECT count_if(actual = c.cls AND predicted = c.cls) FROM scored) AS BIGINT) AS tp,
               CAST((SELECT count_if(actual <> c.cls AND predicted = c.cls) FROM scored) AS BIGINT) AS fp,
               CAST((SELECT count_if(actual = c.cls AND predicted <> c.cls) FROM scored) AS BIGINT) AS fn
        FROM classes c)
    SELECT cls, tp, fp, fn,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
           ROUND(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 6) AS f1
    FROM per_class
    ORDER BY cls
    """,
    doc="Multiclass one-vs-rest evaluation: per-class TP/FP/FN with "
    "precision/recall/F1 (the macro average is their mean, left to the "
    "reader of the per-class rows) for a deterministic value-band "
    "predictor stand-in.  Engine shape: ONE scan builds the (actual, "
    "predicted) pairs, one hash-agg counts the confusion cells, and the "
    "per-class one-vs-rest counts derive from the |classes|^2 cell "
    "frame -- never a per-class re-scan (the oracle's correlated "
    "subqueries are the readable spelling of the same numbers).",
)
def q236_multiclass_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .agg(F.count("*").alias("n"))
    )
    classes = cells.select(F.col("actual").alias("cls")).distinct()
    per_class = (
        F.broadcast(classes)
        .join(cells, how="cross")
        .groupBy("cls")
        .agg(
            F.sum(
                F.when(
                    (F.col("actual") == F.col("cls"))
                    & (F.col("predicted") == F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(
                    (F.col("actual") != F.col("cls"))
                    & (F.col("predicted") == F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(
                    (F.col("actual") == F.col("cls"))
                    & (F.col("predicted") != F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("fn"),
        )
    )
    tp, fp, fn = (F.col(x) for x in ("tp", "fp", "fn"))
    return per_class.select(
        "cls", "tp", "fp", "fn",
        F.round(tp.cast("double") / F.nullif(tp + fp, F.lit(0)), 6).alias("precision"),
        F.round(tp.cast("double") / F.nullif(tp + fn, F.lit(0)), 6).alias("recall"),
        F.round(2.0 * tp / F.nullif(2.0 * tp + fp + fn, F.lit(0)), 6).alias("f1"),
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# q237: Kaplan-Meier survival curve (time to first purchase, with censoring)
# ---------------------------------------------------------------------------


@register(
    "q237_kaplan_meier",
    sql="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) AS t0,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase,
               MAX(ts) AS t_last
        FROM events GROUP BY user_id),
    durations AS (
        SELECT user_id,
               CASE WHEN t_purchase IS NOT NULL
                    THEN CAST(epoch_us(t_purchase) - epoch_us(t0) AS DOUBLE) / 86400000000.0
                    ELSE CAST(epoch_us(t_last) - epoch_us(t0) AS DOUBLE) / 86400000000.0
               END AS dur_days,
               (t_purchase IS NOT NULL) AS converted
        FROM per_user),
    binned AS (
        SELECT CAST(ceil(dur_days) AS BIGINT) AS t, converted FROM durations),
    at_time AS (
        SELECT t,
               CAST(count_if(converted) AS BIGINT) AS d
        FROM binned GROUP BY t),
    risk AS (
        SELECT a.t, a.d,
               (SELECT COUNT(*) FROM binned b WHERE b.t >= a.t) AS n
        FROM at_time a
        WHERE a.d > 0),
    km AS (
        SELECT t, d, CAST(n AS BIGINT) AS n_at_risk,
               -- a time point where everyone at risk converts drives S to
               -- exactly 0; keep the log term finite and zero the output
               CASE WHEN MAX(CASE WHEN d = n THEN 1 ELSE 0 END)
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                    THEN 0.0
                    ELSE exp(SUM(ln(CASE WHEN d = n THEN 1.0 ELSE 1.0 - CAST(d AS DOUBLE) / n END))
                             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               END AS s
        FROM risk)
    SELECT t, d AS n_events, n_at_risk, ROUND(s, 6) AS survival
    FROM km
    ORDER BY t
    """,
    doc="Kaplan-Meier survival curve for time-to-first-purchase (days, "
    "ceil-binned), with right-censoring: users who never purchase are "
    "censored at their last observed event -- the estimator that makes "
    "'median days to convert' honest when many users haven't converted "
    "yet (a plain average silently drops them).  S(t) = prod(1 - d_i/n_i) "
    "computes distributively as exp(cumsum(ln)) over the per-day event "
    "table -- a few hundred rows after the per-user collapse, so the "
    "ordered window costs nothing; the at-risk counts come from a "
    "suffix-sum over the same tiny frame (spelled as a correlated count "
    "in the oracle).  One user-collapse hash-agg touches row-scale data.",
)
def q237_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = e.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_purchase"),
        F.max(us).alias("t_last"),
    )
    dur = per_user.select(
        F.ceil(
            (
                F.coalesce("t_purchase", "t_last").cast("double") - F.col("t0")
            )
            / 86400000000.0
        ).cast("bigint").alias("t"),
        F.col("t_purchase").isNotNull().alias("converted"),
    )
    at_time = dur.groupBy("t").agg(
        F.count_if(F.col("converted")).alias("d"),
        F.count("*").alias("ended_here"),
    )
    # at-risk = suffix sum of everyone whose duration >= t (tiny frame)
    w_suffix = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        at_time.withColumn("n", F.sum("ended_here").over(w_suffix))
        .filter(F.col("d") > 0)
        .select("t", "d", F.col("n").alias("n_at_risk"))
    )
    w_km = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # terminal point (d == n) drives S to exactly 0: keep the log term
    # finite there and zero the output from that point on
    ratio = F.when(
        F.col("d") == F.col("n_at_risk"), F.lit(1.0)
    ).otherwise(1.0 - F.col("d").cast("double") / F.col("n_at_risk"))
    hit_zero = F.max(
        F.when(F.col("d") == F.col("n_at_risk"), 1).otherwise(0)
    ).over(w_km)
    s = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(ratio)).over(w_km))
    )
    return risk.select(
        "t",
        F.col("d").alias("n_events"),
        "n_at_risk",
        F.round(s, 6).alias("survival"),
    ).orderBy("t")


# ---------------------------------------------------------------------------
# q238: Zipf rank-frequency fit over the corpus vocabulary
# ---------------------------------------------------------------------------


@register(
    "q238_zipf_fit",
    sql="""
    WITH freq AS (
        SELECT token, COUNT(*) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents WHERE length(text) > 0)
        GROUP BY token),
    ranked AS (
        SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token ASC) AS r FROM freq)
    SELECT ROUND(regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6) AS zipf_slope,
           ROUND(regr_intercept(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6) AS log_c,
           ROUND(regr_r2(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6) AS r2,
           CAST(COUNT(*) AS BIGINT) AS vocab_size
    FROM ranked
    """,
    doc="Zipf rank-frequency fit: token frequencies rank-ordered, then OLS "
    "on (ln rank, ln freq) gives the Zipf exponent (natural language "
    "sits near -1; the synthetic fixture's ~flat vocabulary fits near 0, "
    "and the R^2 says how Zipfian the corpus is either way) -- the "
    "corpus-statistics diagnostic that distinguishes organic text from "
    "generated/templated text in a data-quality report.  One vocab-sized "
    "hash-agg; the rank itself is computed WITHOUT sorting the vocabulary "
    "(tied-frequency ranks are aggregate-invariant, so the rank runs are "
    "generated arithmetically from the tiny distinct-frequency frame -- "
    "see the builder comment), and q153's regression aggregates close "
    "the fit.",
)
def q238_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle ranks tokens by (f DESC, token ASC), but every token tied
    # at frequency f contributes the same ln(f) -- so the regression only
    # sees the MULTISET of (rank, ln f) pairs, and which tied token takes
    # which rank is irrelevant.  That lets the vocabulary rank collapse to
    # arithmetic: per distinct frequency f with multiplicity m and offset
    # off (= count of strictly more frequent tokens), the ranks are exactly
    # the run off+1 .. off+m.  We generate those runs with sequence/explode
    # (chunked to 64k and repartitioned so generation parallelizes) -- the
    # full vocabulary is never sorted, and the only global window is over
    # the distinct-frequency frame (bounded by max f, tiny).  The big
    # shuffles are the token count itself and nothing else.
    chunk = 65536
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    freq = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("f"))
    )
    fc = freq.groupBy("f").agg(F.count("*").alias("m"))
    offsets = fc.select(
        "f",
        "m",
        F.sum("m")
        .over(
            Window.orderBy(F.col("f").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("off"),
    ).fillna(0, ["off"])
    chunks = offsets.select(
        "f",
        "m",
        "off",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.floor((F.col("m") - 1) / chunk))
        ).alias("ci"),
    ).repartition("f", "ci")
    ranks = chunks.select(
        "f",
        F.explode(
            F.sequence(
                F.col("off") + F.col("ci") * chunk + 1,
                F.least(
                    F.col("off") + (F.col("ci") + 1) * chunk,
                    F.col("off") + F.col("m"),
                ),
            )
        ).alias("r"),
    )
    lf = F.log(F.col("f").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return ranks.agg(
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("log_c"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
        F.count("*").alias("vocab_size"),
    )


# ---------------------------------------------------------------------------
# q239: inter-arrival burstiness per user
# ---------------------------------------------------------------------------


@register(
    "q239_burstiness",
    sql="""
    WITH gaps AS (
        SELECT user_id,
               CAST(epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
                   / 3600000000.0 AS gap_h
        FROM events),
    stats AS (
        SELECT user_id,
               AVG(gap_h) AS mean_gap,
               stddev_samp(gap_h) AS sd_gap,
               CAST(COUNT(gap_h) AS BIGINT) AS n_gaps
        FROM gaps WHERE gap_h IS NOT NULL GROUP BY user_id)
    SELECT user_id, n_gaps,
           ROUND(mean_gap, 6) AS mean_gap_h,
           ROUND(sd_gap / mean_gap, 6) AS cv,
           ROUND((sd_gap - mean_gap) / (sd_gap + mean_gap), 6) AS burstiness
    FROM stats
    ORDER BY user_id
    """,
    doc="Inter-arrival burstiness per user: gaps between consecutive events "
    "(total order ts, event_id), their coefficient of variation, and the "
    "Goh-Barabasi burstiness B = (sd-mean)/(sd+mean) in [-1, 1] -- B~0 "
    "is Poisson-like, B->1 is bursty, B->-1 is periodic; the temporal "
    "fingerprint that separates humans from schedulers/bots in event "
    "logs.  One lag window per user + one hash-agg; gaps in hours keep "
    "the doubles well-conditioned.",
)
def q239_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        ((us - F.lag(us).over(w)).cast("double") / 3600000000.0).alias("gap_h"),
    ).filter(F.col("gap_h").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.avg("gap_h").alias("mean_gap"),
        F.stddev_samp("gap_h").alias("sd_gap"),
        F.count("gap_h").alias("n_gaps"),
    )
    return stats.select(
        "user_id",
        "n_gaps",
        F.round("mean_gap", 6).alias("mean_gap_h"),
        F.round(F.col("sd_gap") / F.col("mean_gap"), 6).alias("cv"),
        F.round(
            (F.col("sd_gap") - F.col("mean_gap")) / (F.col("sd_gap") + F.col("mean_gap")),
            6,
        ).alias("burstiness"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q240: Heaps' law vocabulary-growth curve
# ---------------------------------------------------------------------------


@register(
    "q240_heaps_law",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE length(text) > 0),
    first_seen AS (
        SELECT token, MIN(doc_id) AS d0 FROM toks GROUP BY token),
    n_docs AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM toks),
    deciles AS (
        SELECT CAST(least(ceil((d0 + 1) * 10.0 / nd), 10) AS INT) AS decile,
               COUNT(*) AS new_types
        FROM first_seen, n_docs GROUP BY 1)
    SELECT decile,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
    FROM deciles
    ORDER BY decile
    """,
    doc="Heaps' law vocabulary-growth curve: distinct token types "
    "accumulated after each decile of the corpus (by doc_id order) -- "
    "organic text grows sublinearly (V ~ k*n^b, b~0.5), a saturating "
    "curve signals a closed/templated vocabulary (this fixture saturates "
    "in the first decile, which is exactly what the diagnostic should "
    "say about synthetic text).  Same scalable shape as q228's growth "
    "curve: first-seen doc per TYPE (one hash-agg) converts running "
    "distinct into a plain cumulative sum over 10 rows.",
)
def q240_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("d0"))
    nd = toks.select(F.countDistinct("doc_id").alias("nd"))
    deciles = (
        first_seen.crossJoin(F.broadcast(nd))
        .groupBy(
            F.least(
                F.ceil((F.col("d0") + 1) * 10.0 / F.col("nd")), F.lit(10)
            ).cast("int").alias("decile")
        )
        .agg(F.count("*").alias("new_types"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return deciles.select(
        "decile",
        "new_types",
        F.sum("new_types").over(w).alias("vocab_size"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# q241: weighted median (cumulative-weight crossing)
# ---------------------------------------------------------------------------


@register(
    "q241_weighted_median",
    sql="""
    WITH w AS (
        SELECT o.o_orderpriority AS grp,
               o.o_totalprice AS price,
               o.o_orderkey,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS wt
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3),
    cum AS (
        SELECT grp, price, wt,
               SUM(wt) OVER (PARTITION BY grp ORDER BY price, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(wt) OVER (PARTITION BY grp) AS tw
        FROM w),
    pick AS (
        SELECT grp, price,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cw) AS rn
        FROM cum WHERE cw >= tw / 2)
    SELECT grp AS o_orderpriority, ROUND(price, 2) AS weighted_median_price
    FROM pick WHERE rn = 1
    ORDER BY o_orderpriority
    """,
    doc="Weighted median: per priority group, the order price at which "
    "cumulative QUANTITY weight first crosses half the total -- the "
    "'median unit shipped' rather than q154's median order, which is the "
    "statistic purchasing actually wants.  Exact DECIMAL weights, one "
    "window pass over the per-order frame with a deterministic (price, "
    "orderkey) total order; the crossing-point pick is the standard "
    "distributed weighted-quantile spelling (any quantile: replace tw/2).",
)
def q241_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.col("o_totalprice").alias("price"),
            "o_orderkey",
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("wt"))
    )
    win = Window.partitionBy("grp").orderBy("price", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = w.select(
        "grp",
        "price",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(Window.partitionBy("grp")).alias("tw"),
    )
    pick = cum.filter(F.col("cw") >= F.col("tw") / 2).withColumn(
        "rn", F.row_number().over(Window.partitionBy("grp").orderBy("cw"))
    )
    return (
        pick.filter(F.col("rn") == 1)
        .select(
            F.col("grp").alias("o_orderpriority"),
            F.round("price", 2).alias("weighted_median_price"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q242: marketing attribution (first-touch vs last-touch)
# ---------------------------------------------------------------------------


@register(
    "q242_touch_attribution",
    sql="""
    WITH purchases AS (
        SELECT user_id, ts AS pts, event_id AS pid FROM events
        WHERE event_type = 'purchase'),
    touches AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE event_type <> 'purchase'),
    windowed AS (
        SELECT p.pid,
               (SELECT (list(t.event_type ORDER BY t.ts, t.event_id))[1]
                  FROM touches t
                 WHERE t.user_id = p.user_id AND t.ts <= p.pts
                   AND t.ts >= p.pts - INTERVAL 1 DAY) AS first_touch,
               (SELECT (list(t.event_type ORDER BY t.ts, t.event_id))[-1]
                  FROM touches t
                 WHERE t.user_id = p.user_id AND t.ts <= p.pts
                   AND t.ts >= p.pts - INTERVAL 1 DAY) AS last_touch
        FROM purchases p)
    SELECT COALESCE(first_touch, '(none)') AS first_touch,
           COALESCE(last_touch, '(none)') AS last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM windowed
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Marketing attribution, first-touch vs last-touch: each purchase "
    "credits the earliest and the latest non-purchase event inside its "
    "1-day lookback window, and the report cross-tabulates the two "
    "models -- the comparison that shows how much credit moves between "
    "channels when the attribution rule changes.  Engine path reuses "
    "q215's BINNED interval-join shape (1-day bins, <=2 per window) so "
    "both touches resolve in ONE hashable join pass + min_by/max_by "
    "aggregation, never a per-purchase subquery; the oracle's correlated "
    "form is the readable spelling of the same rule.",
)
def q242_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day_us = 86_400_000_000
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    p_binned = purchases.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.unix_micros(F.col("pts").cast("timestamp")) - day_us) / day_us),
                F.floor(F.unix_micros(F.col("pts").cast("timestamp")) / day_us),
            )
        ).alias("bin"),
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", "event_type", F.floor(us / day_us).alias("bin")
    )
    # INNER join the binned candidates (a purchase's empty bin must not
    # inject a null group member that would win min_by's ordering), then
    # re-attach the no-touch purchases via a left join on the spine.
    joined = p_binned.join(
        touches,
        (touches.user_id == p_binned.p_user)
        & (touches.bin == p_binned.bin)
        & (touches.ts <= p_binned.pts)
        & (
            F.unix_micros(touches.ts.cast("timestamp"))
            >= F.unix_micros(p_binned.pts.cast("timestamp")) - day_us
        ),
    )
    matched = joined.groupBy("pid").agg(
        F.min_by("event_type", F.struct(us, "event_id")).alias("first_touch"),
        F.max_by("event_type", F.struct(us, "event_id")).alias("last_touch"),
    )
    per_purchase = purchases.select("pid").join(matched, "pid", "left")
    return (
        per_purchase.groupBy(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
        .agg(F.count("*").alias("n_conversions"))
        .orderBy("first_touch", "last_touch")
    )


# ---------------------------------------------------------------------------
# q243: cross-source content-overlap matrix
# ---------------------------------------------------------------------------


@register(
    "q243_source_overlap",
    sql="""
    WITH hashes AS (
        SELECT DISTINCT source, md5(text) AS h FROM documents),
    sizes AS (SELECT source, COUNT(*) AS n FROM hashes GROUP BY source),
    pairs AS (
        SELECT a.source AS s1, b.source AS s2, COUNT(*) AS common
        FROM hashes a JOIN hashes b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2),
    matrix AS (
        SELECT x.source AS s1, y.source AS s2, x.n AS n1, y.n AS n2
        FROM sizes x JOIN sizes y ON x.source < y.source)
    SELECT m.s1, m.s2,
           CAST(COALESCE(p.common, 0) AS BIGINT) AS common,
           ROUND(CAST(COALESCE(p.common, 0) AS DOUBLE) / LEAST(m.n1, m.n2), 6) AS containment,
           ROUND(CAST(COALESCE(p.common, 0) AS DOUBLE) / (m.n1 + m.n2 - COALESCE(p.common, 0)), 6) AS jaccard
    FROM matrix m LEFT JOIN pairs p ON m.s1 = p.s1 AND m.s2 = p.s2
    ORDER BY m.s1, m.s2
    """,
    doc="Cross-source content-overlap matrix: for every pair of ingestion "
    "sources, how many exact documents they share (hash intersection), "
    "as containment (share of the smaller source already present in the "
    "other -- the 'is this new crawl worth buying' number) and Jaccard.  "
    "Inverted-index join on the content hash -- candidate pairs exist "
    "only where content actually collides, never a source x source "
    "cross-join -- then per-source set sizes broadcast into the scoring; "
    "the same shape q51 uses for shingles, lifted to whole-document "
    "granularity and source-level rollup.  Zero-overlap pairs report "
    "explicitly (full pair matrix, tiny) rather than vanishing.",
)
def q243_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hashes = d.select("source", F.md5("text").alias("h")).distinct()
    sizes = hashes.groupBy("source").agg(F.count("*").alias("n"))
    a, b = hashes.alias("a"), hashes.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
        .agg(F.count("*").alias("common"))
    )
    sx = sizes.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    sy = sizes.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    # full pair matrix (tiny: sources^2/2) so zero-overlap pairs REPORT as
    # zero instead of silently vanishing -- the no-silent-truncation rule
    matrix = sx.join(sy, F.col("s1") < F.col("s2"))
    return (
        matrix.join(pairs, ["s1", "s2"], "left")
        .withColumn("common", F.coalesce("common", F.lit(0)))
        .select(
            "s1",
            "s2",
            "common",
            F.round(
                F.col("common").cast("double") / F.least("n1", "n2"), 6
            ).alias("containment"),
            F.round(
                F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("s1", "s2")
    )


# ---------------------------------------------------------------------------
# q244: Welch's t-test for a continuous experiment metric
# ---------------------------------------------------------------------------


@register(
    "q244_welch_ttest",
    sql="""
    WITH assigned AS (
        SELECT CASE WHEN CAST('0x' || substr(md5('exp1|' || user_id), 1, 8) AS BIGINT) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS variant,
               value
        FROM events),
    arms AS (
        SELECT variant, COUNT(*) AS n, AVG(value) AS m,
               var_samp(value) AS v
        FROM assigned GROUP BY variant),
    wide AS (
        SELECT MAX(CASE WHEN variant = 'control' THEN n END) AS n_c,
               MAX(CASE WHEN variant = 'control' THEN m END) AS m_c,
               MAX(CASE WHEN variant = 'control' THEN v END) AS v_c,
               MAX(CASE WHEN variant = 'treatment' THEN n END) AS n_t,
               MAX(CASE WHEN variant = 'treatment' THEN m END) AS m_t,
               MAX(CASE WHEN variant = 'treatment' THEN v END) AS v_t
        FROM arms)
    SELECT CAST(n_c AS BIGINT) AS n_control, CAST(n_t AS BIGINT) AS n_treatment,
           ROUND(m_c, 6) AS mean_control, ROUND(m_t, 6) AS mean_treatment,
           ROUND((m_t - m_c) / sqrt(v_c / n_c + v_t / n_t), 6) AS t_stat,
           ROUND(pow(v_c / n_c + v_t / n_t, 2)
                 / (pow(v_c / n_c, 2) / (n_c - 1) + pow(v_t / n_t, 2) / (n_t - 1)), 2) AS welch_dof
    FROM wide
    """,
    doc="Welch's unequal-variance t-test on a CONTINUOUS experiment metric "
    "(event value), with the Welch-Satterthwaite degrees of freedom -- "
    "the companion to q229's proportion z-test, using the same stable "
    "hash assignment so both analyses describe one experiment.  "
    "Everything derives from five sufficient statistics per arm (n, "
    "mean, sample variance) out of ONE hash-agg -- the reason "
    "experiment analysis parallelizes perfectly at 100 TB.",
)
def q244_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    from ..operators.dedup import md5_bucket

    variant = F.when(
        md5_bucket(F.col("user_id"), "exp1|", 2) == 0, "control"
    ).otherwise("treatment")
    arms = (
        e.select(variant.alias("variant"), "value")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("variant") == "control", F.col("m"))).alias("m_c"),
        F.max(F.when(F.col("variant") == "control", F.col("v"))).alias("v_c"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("variant") == "treatment", F.col("m"))).alias("m_t"),
        F.max(F.when(F.col("variant") == "treatment", F.col("v"))).alias("v_t"),
    )
    n_c, m_c, v_c = (F.col(x) for x in ("n_c", "m_c", "v_c"))
    n_t, m_t, v_t = (F.col(x) for x in ("n_t", "m_t", "v_t"))
    se2 = v_c / n_c + v_t / n_t
    dof = F.pow(se2, 2) / (
        F.pow(v_c / n_c, 2) / (n_c - 1) + F.pow(v_t / n_t, 2) / (n_t - 1)
    )
    return wide.select(
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        F.round(m_c, 6).alias("mean_control"),
        F.round(m_t, 6).alias("mean_treatment"),
        F.round((m_t - m_c) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(dof, 2).alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# q245: day-of-week seasonality profile
# ---------------------------------------------------------------------------


@register(
    "q245_seasonality_profile",
    sql="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(dayofweek(date_trunc('day', ts)) + 1 AS INT) AS dow,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2, 3),
    base AS (
        SELECT event_type, dow, AVG(CAST(n AS DOUBLE)) AS dow_avg
        FROM daily GROUP BY 1, 2),
    overall AS (
        SELECT event_type, AVG(CAST(n AS DOUBLE)) AS all_avg FROM daily GROUP BY 1)
    SELECT b.event_type, b.dow,
           ROUND(b.dow_avg, 6) AS dow_avg,
           ROUND(b.dow_avg / o.all_avg, 6) AS seasonal_index
    FROM base b JOIN overall o ON b.event_type = o.event_type
    ORDER BY b.event_type, b.dow
    """,
    doc="Day-of-week seasonality profile: average daily event volume per "
    "(event_type, weekday) normalized by the type's overall daily "
    "average -- index > 1 marks the hot weekdays, the multiplicative "
    "seasonal factor a forecasting pipeline divides out before trend "
    "fitting.  Two hash-aggs on tiny domains (types x days, then types "
    "x 7); dayofweek reconciles the engines' weekday origins the same "
    "way q201 does.",
)
def q245_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    daily = e.groupBy(
        "event_type", day.alias("day"), F.dayofweek(day).cast("int").alias("dow")
    ).agg(F.count("*").alias("n"))
    base = daily.groupBy("event_type", "dow").agg(
        F.avg(F.col("n").cast("double")).alias("dow_avg")
    )
    overall = daily.groupBy("event_type").agg(
        F.avg(F.col("n").cast("double")).alias("all_avg")
    )
    return (
        base.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            F.round("dow_avg", 6).alias("dow_avg"),
            F.round(F.col("dow_avg") / F.col("all_avg"), 6).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# q246: per-entity linear trend (grouped regression slopes)
# ---------------------------------------------------------------------------


@register(
    "q246_user_trend",
    sql="""
    WITH pts AS (
        SELECT user_id,
               CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0 AS t_days,
               value
        FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, t_days), 6) AS slope_per_day,
           ROUND(regr_r2(value, t_days), 6) AS r2,
           regr_slope(value, t_days) > 0 AS rising
    FROM pts
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Per-entity linear trend: each user's event-value trajectory fit "
    "by OLS (slope per day + R^2 + rising flag) -- the per-key trend "
    "scan behind churn/expansion scoring, q153's regression aggregates "
    "applied PER GROUP so a million users fit in one hash-agg pass "
    "(sufficient statistics again: sums of t, v, tv, t^2, v^2 per key), "
    "with no per-user iteration anywhere.",
)
def q246_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    t_days = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / 86400000000.0
    )
    slope = F.regr_slope(F.col("value"), t_days)
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(slope, 6).alias("slope_per_day"),
            F.round(F.regr_r2(F.col("value"), t_days), 6).alias("r2"),
            (slope > 0).alias("rising"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q247: calibration curve (reliability diagram)
# ---------------------------------------------------------------------------


@register(
    "q247_calibration_curve",
    sql="""
    WITH scored AS (
        SELECT least(greatest(value / 300.0, 0.0), 1.0) AS p_hat,
               (event_type = 'purchase') AS y
        FROM events),
    binned AS (
        SELECT least(CAST(floor(p_hat * 10) AS INT), 9) AS bin, p_hat, y
        FROM scored)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(p_hat), 6) AS mean_predicted,
           ROUND(AVG(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6) AS observed_rate,
           ROUND(ABS(AVG(p_hat) - AVG(CASE WHEN y THEN 1.0 ELSE 0.0 END)), 6) AS calibration_gap
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    doc="Calibration curve (reliability diagram): predicted probabilities "
    "bin into deciles and each bin reports mean prediction vs observed "
    "outcome rate plus the gap -- the evaluation that tells you whether "
    "a quality/conversion scorer's probabilities MEAN anything before "
    "they gate a pipeline (q220/q236 measure discrimination; this "
    "measures calibration, the other axis).  Deterministic value-derived "
    "score stand-in; one conditional hash-agg over a 10-bin domain.  "
    "The weighted average of calibration_gap is Expected Calibration "
    "Error.",
)
def q247_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p_hat = F.least(F.greatest(F.col("value") / 300.0, F.lit(0.0)), F.lit(1.0))
    y = (F.col("event_type") == "purchase").cast("double")
    binned = e.select(
        F.least(F.floor(p_hat * 10).cast("int"), F.lit(9)).alias("bin"),
        p_hat.alias("p_hat"),
        y.alias("y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p_hat"), 6).alias("mean_predicted"),
            F.round(F.avg("y"), 6).alias("observed_rate"),
            F.round(F.abs(F.avg("p_hat") - F.avg("y")), 6).alias("calibration_gap"),
        )
        .orderBy("bin")
    )
