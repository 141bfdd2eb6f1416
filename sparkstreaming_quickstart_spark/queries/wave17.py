"""Wave-17 operators (round 5): evaluation-layer statistics and corpus
curation depth -- multiple-testing control (Benjamini-Hochberg), centroid
cluster quality (simplified silhouette + Davies-Bouldin), dedup-cluster-aware
split leakage audit, quality-ranked token-budget curriculum, autocorrelation
profiles, and the per-source n-gram novelty curve.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md section-2.B
training-data-pipeline family, following the same float discipline as waves
8-16 (integer sufficient statistics, single final division, identical ROUND
spelling in both engines -- see README "Adding a query").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import ngram_instances, tokens
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q286: per-group z-tests with Benjamini-Hochberg FDR correction
# ---------------------------------------------------------------------------

# One-sided normal tail approximation (Lin 1989): P(Z>z) ~ exp(-0.717z-0.416z^2).
# Chosen because neither Spark SQL nor DuckDB ships erf/erfc as a builtin, and
# an identical closed form spelled in both engines is deterministic where a
# library CDF would not be.  Accuracy (~1% relative) is irrelevant to the BH
# ordering, which is monotone in |z|.
_BH_ALPHA = 0.10

_FDR_ORACLE = f"""
    WITH g AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS BIGINT)) AS s,
               SUM(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) AS ss
        FROM events GROUP BY event_type),
    t AS (
        SELECT SUM(n) AS tn, SUM(s) AS ts, SUM(ss) AS tss, COUNT(*) AS m FROM g),
    z AS (
        SELECT g.event_type, g.n, t.m,
               (CAST(g.s AS DOUBLE) / g.n - CAST(t.ts - g.s AS DOUBLE) / (t.tn - g.n))
               / NULLIF(sqrt(((g.ss - CAST(g.s AS DOUBLE) * g.s / g.n) / (g.n - 1)) / g.n
                      + (((t.tss - g.ss) - CAST(t.ts - g.s AS DOUBLE) * (t.ts - g.s)
                          / (t.tn - g.n)) / (t.tn - g.n - 1)) / (t.tn - g.n)), 0) AS z
        FROM g CROSS JOIN t),
    p AS (
        SELECT event_type, n, m, z,
               LEAST(1.0, 2.0 * exp(-0.717 * abs(z) - 0.416 * z * z)) AS p,
               ROUND(LEAST(1.0, 2.0 * exp(-0.717 * abs(z) - 0.416 * z * z)), 9) AS pr
        FROM z),
    r AS (
        SELECT event_type, n, z, p,
               pr * m / (ROW_NUMBER() OVER (ORDER BY pr, event_type)) AS raw,
               ROW_NUMBER() OVER (ORDER BY pr, event_type) AS i
        FROM p),
    adj AS (
        SELECT event_type, n, z, p,
               MIN(raw) OVER (ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS q
        FROM r)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(z, 6) AS z_stat, ROUND(p, 6) AS p_value,
           ROUND(LEAST(1.0, q), 6) AS q_bh,
           LEAST(1.0, q) <= {_BH_ALPHA} AS rejected
    FROM adj ORDER BY event_type
"""


@register(
    "q286_fdr_bh_correction",
    sql=_FDR_ORACLE,
    doc="Multiple-testing control: each event_type's mean value is z-tested "
    "against the complement (group-vs-rest, Welch form from BIGINT cent "
    "sufficient statistics -- the q229/q244 discipline), the normal-tail "
    "p-value uses a closed form both engines can spell identically, and "
    "Benjamini-Hochberg adjusts across the family (step-up running min "
    "over the rank-ordered p frame).  The frame the windows run over is "
    "group-count-sized (|event_types|), never data-sized, so at 100 TB "
    "the whole procedure is one hash-agg plus constant-size arithmetic.",
)
def q286_fdr_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        # Decimal square-sum: the BIGINT sum of ~1e16 squares ANSI-aborts
        # at corpus scale (round-7 int-overflow audit; q263 pattern).
        F.sum(cents.cast("decimal(38,0)") * cents).alias("ss"),
    )
    # Totals via window sums over the |event_types|-sized group frame -- a
    # re-aggregation would scan events a second time; this keeps the whole
    # query one pass (pinned by test_fdr_bh_single_pass_over_events).
    w_all = Window.partitionBy()
    j = g.select(
        "event_type",
        "n",
        "s",
        "ss",
        F.sum("n").over(w_all).alias("tn"),
        F.sum("s").over(w_all).alias("ts"),
        F.sum("ss").over(w_all).alias("tss"),
        F.count("*").over(w_all).alias("m"),
    )
    mean_g = F.col("s").cast("double") / F.col("n")
    rest_n = F.col("tn") - F.col("n")
    mean_r = (F.col("ts") - F.col("s")).cast("double") / rest_n
    var_g = (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    var_r = (
        (F.col("tss") - F.col("ss"))
        - (F.col("ts") - F.col("s")).cast("double") * (F.col("ts") - F.col("s")) / rest_n
    ) / (rest_n - 1)
    # NULLIF on the degenerate all-constant case (README float rule #4):
    # both engines emit NULL, never NaN, when every value in both arms ties.
    z = (mean_g - mean_r) / F.nullif(
        F.sqrt(var_g / F.col("n") + var_r / rest_n), F.lit(0.0)
    )
    p = F.least(
        F.lit(1.0), 2.0 * F.exp(-0.717 * F.abs(z) - 0.416 * z * z)
    )
    # The BH step-up RANKS on p and COMPARES q to alpha -- both float-order
    # exposures (JVM Math.exp vs libm exp differ in the last ulp, so
    # near-tied p values could rank differently across engines and flip the
    # boolean at the alpha boundary).  Rank and adjust on ROUND(p, 9): the
    # rounded value is engine-identical, and every quantity derived from it
    # (raw, q, rejected) is then the same IEEE arithmetic on the same
    # doubles in both engines (README float rule #2 applied to an ordering).
    zp = j.select(
        "event_type", "n", "m", z.alias("z"), p.alias("p"), F.round(p, 9).alias("pr")
    )
    w_rank = Window.orderBy("pr", "event_type")
    ranked = zp.withColumn("i", F.row_number().over(w_rank)).withColumn(
        "raw", F.col("pr") * F.col("m") / F.col("i")
    )
    w_tail = Window.orderBy("i").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    adj = ranked.withColumn("q", F.min("raw").over(w_tail))
    return adj.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("z", 6).alias("z_stat"),
        F.round("p", 6).alias("p_value"),
        F.round(F.least(F.lit(1.0), F.col("q")), 6).alias("q_bh"),
        (F.least(F.lit(1.0), F.col("q")) <= _BH_ALPHA).alias("rejected"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q287: centroid cluster quality -- simplified silhouette + Davies-Bouldin
# ---------------------------------------------------------------------------

_CLUSTER_ORACLE = """
    WITH dims AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    cent AS (
        SELECT label AS clabel, pos, AVG(x) AS c FROM dims GROUP BY label, pos),
    d2 AS (
        SELECT dims.vec_id, dims.label, cent.clabel,
               SUM((dims.x - cent.c) * (dims.x - cent.c)) AS d2
        FROM dims JOIN cent ON dims.pos = cent.pos
        GROUP BY dims.vec_id, dims.label, cent.clabel),
    per_pt AS (
        SELECT vec_id, label,
               MAX(CASE WHEN label = clabel THEN sqrt(d2) END) AS a,
               MIN(CASE WHEN label <> clabel THEN sqrt(d2) END) AS b
        FROM d2 GROUP BY vec_id, label),
    lab AS (
        SELECT label, COUNT(*) AS n_points,
               AVG((b - a) / GREATEST(a, b)) AS sil,
               AVG(a) AS scatter
        FROM per_pt GROUP BY label),
    cdist AS (
        SELECT i.clabel AS li, j.clabel AS lj,
               sqrt(SUM((i.c - j.c) * (i.c - j.c))) AS m
        FROM cent i JOIN cent j ON i.pos = j.pos AND i.clabel <> j.clabel
        GROUP BY i.clabel, j.clabel),
    db AS (
        SELECT li AS label, MAX((si.scatter + sj.scatter) / cdist.m) AS db_component
        FROM cdist
        JOIN lab si ON si.label = cdist.li
        JOIN lab sj ON sj.label = cdist.lj
        GROUP BY li)
    SELECT lab.label, CAST(lab.n_points AS BIGINT) AS n_points,
           ROUND(lab.sil, 6) AS avg_silhouette,
           ROUND(lab.scatter, 6) AS scatter,
           ROUND(db.db_component, 6) AS db_component
    FROM lab JOIN db ON lab.label = db.label
    ORDER BY lab.label
"""


@register(
    "q287_cluster_quality",
    sql=_CLUSTER_ORACLE,
    doc="Cluster-quality report over the embedding labels: simplified "
    "silhouette (distance-to-centroid form: a = own centroid, b = nearest "
    "other centroid -- the O(N*k*d) variant that replaces exact "
    "silhouette's O(N^2) pairwise pass at corpus scale) and the per-label "
    "Davies-Bouldin component max_j (S_i+S_j)/M_ij.  Plan: one (label, "
    "dim) hash-agg trains the k centroids, the N x k distance scan joins "
    "a BROADCAST k-row centroid-array frame with an array-native zip_with "
    "fold (no explode on the hot path, no shuffle), and everything after "
    "the per-point rollup lives on k-sized frames.  Float note: the "
    "64-term fold's reduce order differs from the oracle's grouped sum; "
    "both round at 6 decimals (SCALING.md float reduce-order precedent).",
)
def q287_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
    )
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("label").alias("clabel"), "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    cent_arr = cent.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    # README rule 9 (round-9 fix): cent_arr feeds dist, ci AND cj -- without
    # materialization each broadcast build re-runs the posexplode corpus
    # scan (audit showed 8 scans / 24 exchanges).  Label-count-sized frame.
    cent_arr = cent_arr.localCheckpoint(eager=True)
    d2 = F.aggregate(
        F.zip_with("x", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dist = pts.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "label", "clabel", F.sqrt(d2).alias("d")
    )
    per_pt = dist.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label") == F.col("clabel"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("label") != F.col("clabel"), F.col("d"))).alias("b"),
    )
    lab = per_pt.groupBy("label").agg(
        F.count("*").alias("n_points"),
        F.avg(
            (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
        ).alias("sil"),
        F.avg("a").alias("scatter"),
    ).localCheckpoint(eager=True)  # rule 9: feeds si, sj and the final join
    ci = cent_arr.select(F.col("clabel").alias("li"), F.col("cvec").alias("vi"))
    cj = cent_arr.select(F.col("clabel").alias("lj"), F.col("cvec").alias("vj"))
    cd2 = F.aggregate(
        F.zip_with("vi", "vj", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cdist = (
        ci.crossJoin(F.broadcast(cj))
        .filter(F.col("li") != F.col("lj"))
        .select("li", "lj", F.sqrt(cd2).alias("m"))
    )
    si = lab.select(F.col("label").alias("li"), F.col("scatter").alias("s_i"))
    sj = lab.select(F.col("label").alias("lj"), F.col("scatter").alias("s_j"))
    db = (
        cdist.join(F.broadcast(si), "li")
        .join(F.broadcast(sj), "lj")
        .groupBy(F.col("li").alias("label"))
        .agg(F.max((F.col("s_i") + F.col("s_j")) / F.col("m")).alias("db_component"))
    )
    return (
        lab.join(F.broadcast(db), "label")
        .select(
            "label",
            F.col("n_points").cast("bigint").alias("n_points"),
            F.round("sil", 6).alias("avg_silhouette"),
            F.round("scatter", 6).alias("scatter"),
            F.round("db_component", 6).alias("db_component"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q288: dedup-cluster-aware split leakage audit
# ---------------------------------------------------------------------------

_LEAKAGE_ORACLE = """
    WITH docs AS (
        SELECT doc_id, md5(text) AS gid FROM documents),
    reps AS (
        SELECT gid, MIN(doc_id) AS rep, COUNT(*) AS n_docs
        FROM docs GROUP BY gid),
    assigned AS (
        SELECT d.doc_id, d.gid, r.n_docs,
               CASE WHEN CAST('0x' || substr(md5('lsplit|' || d.doc_id), 1, 8) AS BIGINT)
                         % 100 < 80 THEN 'train' ELSE 'val' END AS naive_split,
               CASE WHEN CAST('0x' || substr(md5('lsplit|' || r.rep), 1, 8) AS BIGINT)
                         % 100 < 80 THEN 'train' ELSE 'val' END AS safe_split
        FROM docs d JOIN reps r ON d.gid = r.gid),
    long AS (
        SELECT 'naive' AS scheme, doc_id, gid, n_docs, naive_split AS split
        FROM assigned
        UNION ALL
        SELECT 'cluster_safe' AS scheme, doc_id, gid, n_docs, safe_split AS split
        FROM assigned),
    per_group AS (
        SELECT scheme, gid, MAX(n_docs) AS n_docs,
               COUNT(DISTINCT split) AS nd_splits,
               SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS g_train,
               SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS g_val
        FROM long GROUP BY scheme, gid)
    SELECT scheme,
           CAST(SUM(g_train) AS BIGINT) AS n_train,
           CAST(SUM(g_val) AS BIGINT) AS n_val,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
           CAST(SUM(CASE WHEN nd_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS leaked_groups
    FROM per_group
    GROUP BY scheme
    ORDER BY scheme
"""


@register(
    "q288_leakage_safe_split",
    sql=_LEAKAGE_ORACLE,
    doc="Split-leakage audit: exact-duplicate clusters (md5 text groups, the "
    "q50 machinery) are assigned to train/val two ways -- hashing each "
    "doc's own id (naive) vs hashing the cluster representative's id "
    "(cluster-safe, the q208 stable-bucket contract applied at group "
    "granularity) -- and the report counts duplicate groups spanning "
    "both splits under each scheme.  cluster_safe is leakage-free by "
    "construction (leaked_groups = 0); the naive row quantifies the "
    "train/val contamination a per-doc split ships.  Plan: one gid "
    "hash-agg for representatives, a gid-keyed join back (both sides "
    "partitioned on gid), then scheme/group-sized rollups.",
)
def q288_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("gid")
    )
    reps = d.groupBy("gid").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_docs")
    )

    from ..operators.dedup import md5_bucket

    def bucket(col):
        return md5_bucket(col, "lsplit|", 100)

    assigned = d.join(reps, "gid").select(
        "doc_id",
        "gid",
        "n_docs",
        F.when(bucket(F.col("doc_id")) < 80, "train").otherwise("val").alias("naive_split"),
        F.when(bucket(F.col("rep")) < 80, "train").otherwise("val").alias("safe_split"),
    )
    long = assigned.select(
        "doc_id",
        "gid",
        "n_docs",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("scheme"), F.col("naive_split").alias("split")
                ),
                F.struct(
                    F.lit("cluster_safe").alias("scheme"),
                    F.col("safe_split").alias("split"),
                ),
            )
        ).alias("sv"),
    ).select("doc_id", "gid", "n_docs", "sv.scheme", "sv.split")
    per_group = long.groupBy("scheme", "gid").agg(
        F.max("n_docs").alias("n_docs"),
        F.countDistinct("split").alias("nd_splits"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("g_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("g_val"),
    )
    return (
        per_group.groupBy("scheme")
        .agg(
            F.sum("g_train").cast("bigint").alias("n_train"),
            F.sum("g_val").cast("bigint").alias("n_val"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_groups"),
            F.sum(F.when(F.col("nd_splits") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("leaked_groups"),
        )
        .orderBy("scheme")
    )


# ---------------------------------------------------------------------------
# q289: quality-ranked token-budget curriculum
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
    WITH per_doc AS (
        SELECT source,
               len(string_split(text, ' ')) AS tok,
               len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS ppm
        FROM documents WHERE length(text) > 0),
    per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(CAST(tok AS BIGINT)) AS tokens,
               SUM(CAST(ppm AS BIGINT)) AS sum_ppm
        FROM per_doc GROUP BY source),
    ranked AS (
        SELECT source, n_docs, tokens, sum_ppm,
               ROW_NUMBER() OVER (ORDER BY sum_ppm * 1.0 / n_docs DESC, source) AS rnk,
               SUM(tokens) OVER (ORDER BY sum_ppm * 1.0 / n_docs DESC, source
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens,
               SUM(tokens) OVER () AS total_tokens
        FROM per_source)
    SELECT source, CAST(rnk AS INT) AS rnk,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(tokens AS BIGINT) AS tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           ROUND(sum_ppm / 1000000.0 / n_docs, 6) AS quality,
           cum_tokens * 10 <= total_tokens * 6 AS selected
    FROM ranked ORDER BY rnk
"""


@register(
    "q289_token_budget_curriculum",
    sql=_CURRICULUM_ORACLE,
    doc="Token-budget curriculum: sources rank by a quality proxy "
    "(mean distinct-token ratio -- repetitive sources score low), and the "
    "highest-quality sources are selected greedily until the cumulative "
    "token count exceeds 60% of the corpus -- the 'which sources fill the "
    "training budget' decision.  Both the selection predicate (cum*10 <= "
    "total*6) and the RANKING statistic (integer PPM sums, one exact-int "
    "division) are engine-exact -- no float threshold or float ordering "
    "can drift between engines.  "
    "Plan: one per-source hash-agg over a narrow projection, then windows "
    "on the |sources|-sized frame.",
)
def q289_token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    # Per-doc quality floors to integer PPM so the ORDER-BEARING statistic
    # (sum_ppm, and sum_ppm/n_docs as one exact-int division) is identical
    # in both engines -- ranking on an unrounded float mean would let
    # summation-order noise flip near-tied sources (README float rule #2
    # applied to an ordering, not just an output).
    # The distinct-count MUST be widened to BIGINT before the x1,000,000:
    # `F.size` is int32 and under ANSI mode (this repo's default session)
    # `int * 1000000` throws ARITHMETIC_OVERFLOW on any document with more
    # than 2,147 distinct tokens -- a guaranteed job abort on real corpora
    # (regression: test_wave17_semantics.py::test_curriculum_ppm_no_overflow).
    # BIGINT `div` (not float `/` + floor) keeps the ranking statistic
    # engine-exact vs the oracle's `//`.
    per_doc = d.select(
        "source",
        F.size(t).alias("tok"),
        F.size(F.array_distinct(t)).cast("bigint").alias("ndis"),
    ).select(
        "source",
        "tok",
        F.expr("ndis * 1000000 div tok").alias("ppm"),
    )
    per_source = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("tok").cast("bigint")).alias("tokens"),
        F.sum(F.col("ppm").cast("bigint")).alias("sum_ppm"),
    )
    qkey = F.col("sum_ppm") * 1.0 / F.col("n_docs")
    w_order = Window.orderBy(qkey.desc(), "source")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = per_source.select(
        "source",
        F.row_number().over(w_order).alias("rnk"),
        "n_docs",
        "tokens",
        F.sum("tokens").over(w_cum).alias("cum_tokens"),
        "sum_ppm",
        F.sum("tokens").over(w_all).alias("total_tokens"),
    )
    return ranked.select(
        "source",
        F.col("rnk").cast("int").alias("rnk"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("tokens").cast("bigint").alias("tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.round(F.col("sum_ppm") / 1000000.0 / F.col("n_docs"), 6).alias("quality"),
        (F.col("cum_tokens") * 10 <= F.col("total_tokens") * 6).alias("selected"),
    ).orderBy("rnk")


# ---------------------------------------------------------------------------
# q290: autocorrelation profile (ACF at lags 1-3 over minute buckets)
# ---------------------------------------------------------------------------

_ACF_ORACLE = """
    WITH b AS (
        SELECT event_type, date_trunc('minute', ts) AS minute,
               AVG(CAST(round(value * 100) AS BIGINT)) AS m
        FROM events GROUP BY event_type, date_trunc('minute', ts)),
    lagged AS (
        SELECT event_type, m,
               LAG(m, 1) OVER w AS l1,
               LAG(m, 2) OVER w AS l2,
               LAG(m, 3) OVER w AS l3
        FROM b WINDOW w AS (PARTITION BY event_type ORDER BY minute)),
    long AS (
        SELECT event_type, 1 AS lag, m AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2 AS lag, m AS x, l2 AS y FROM lagged WHERE l2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3 AS lag, m AS x, l3 AS y FROM lagged WHERE l3 IS NOT NULL)
    SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(corr(x, y), 6) AS acf
    FROM long GROUP BY event_type, lag
    ORDER BY event_type, lag
"""


@register(
    "q290_acf_lags",
    sql=_ACF_ORACLE,
    doc="Autocorrelation profile: per event_type the value series is "
    "minute-bucketed (mean cents -- exact integer sum over count), lagged "
    "1-3 buckets via a key-partitioned window, and Pearson corr is "
    "computed per (event_type, lag).  The 'is this metric self-similar / "
    "how fast does it decorrelate' diagnostic behind q245's seasonality "
    "and q256's changepoints.  Plan: one bucket hash-agg, one "
    "event_type-partitioned window (no global ordering), and a "
    "lag-count-sized corr agg; survives 100 TB because the windowed frame "
    "is the bucket series, not the raw events.",
)
def q290_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    b = e.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.avg(cents).alias("m"))
    w = Window.partitionBy("event_type").orderBy("minute")
    lagged = b.select(
        "event_type",
        "m",
        F.lag("m", 1).over(w).alias("l1"),
        F.lag("m", 2).over(w).alias("l2"),
        F.lag("m", 3).over(w).alias("l3"),
    )
    long = lagged.select(
        "event_type",
        "m",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("lag"), F.col(f"l{k}").alias("y"))
                    for k in (1, 2, 3)
                ]
            )
        ).alias("p"),
    ).filter(F.col("p.y").isNotNull())
    return (
        long.groupBy("event_type", F.col("p.lag").cast("int").alias("lag"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.corr("m", "p.y"), 6).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


# ---------------------------------------------------------------------------
# q291: per-source n-gram novelty curve (marginal novelty by crawl decile)
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
    WITH mx AS (SELECT MAX(doc_id) + 1 AS maxid FROM documents),
    docs AS (
        SELECT source,
               CAST(LEAST(9, doc_id * 10 // mx.maxid) AS INT) AS decile,
               string_split(text, ' ') AS toks
        FROM documents CROSS JOIN mx
        WHERE length(text) > 0),
    grams AS (
        SELECT source, decile,
               array_to_string(list_slice(toks, i, i + 2), ' ') AS ngram
        FROM docs,
             UNNEST(range(1, GREATEST(len(toks) - 1, 1))) AS t(i)),
    inst AS (
        SELECT source, decile, COUNT(*) AS instances
        FROM grams GROUP BY source, decile),
    firsts AS (
        SELECT source, MIN(decile) AS first_decile
        FROM grams GROUP BY source, ngram),
    novel AS (
        SELECT source, first_decile AS decile, COUNT(*) AS novel_ngrams
        FROM firsts GROUP BY source, first_decile)
    SELECT inst.source, inst.decile,
           CAST(inst.instances AS BIGINT) AS instances,
           CAST(COALESCE(novel.novel_ngrams, 0) AS BIGINT) AS novel_ngrams,
           ROUND(CAST(COALESCE(novel.novel_ngrams, 0) AS DOUBLE)
                 / inst.instances, 6) AS novelty_rate
    FROM inst LEFT JOIN novel
      ON inst.source = novel.source AND inst.decile = novel.decile
    ORDER BY inst.source, inst.decile
"""


@register(
    "q291_ngram_novelty",
    sql=_NOVELTY_ORACLE,
    doc="Marginal n-gram novelty by crawl order: documents bucket into "
    "doc_id deciles (crawl order), every 3-gram instance counts toward "
    "its (source, decile), and a 3-gram is NOVEL in the decile where its "
    "first occurrence within the source lands (min over a monotone "
    "bucketing = the first decile).  The declining novelty_rate curve is "
    "the 'is this source exhausted / should we keep crawling it' signal "
    "that q240's global Heaps fit cannot give per source.  Plan: one "
    "guarded posexplode (short docs emit zero rows), then two hash-aggs "
    "from the same gram frame -- instance counts keyed (source, decile), "
    "first-occurrence keyed (source, ngram) -- joined on the tiny "
    "sources x 10 frame.  Exact integer counts; one final division.",
)
def q291_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    full = load_table(spark, sf_dir, "documents")
    d = full.filter(F.length("text") > 0)
    # Decile bounds come from the UNFILTERED table (mirroring the oracle's
    # mx CTE): if the highest doc_id happened to carry empty text, deriving
    # maxid post-filter would shift every decile.
    maxid = full.agg((F.max("doc_id") + 1).alias("maxid"))
    t = tokens("text")
    docs = d.crossJoin(F.broadcast(maxid)).select(
        "source",
        F.least(F.lit(9), F.floor(F.col("doc_id") * 10 / F.col("maxid")))
        .cast("int")
        .alias("decile"),
        t.alias("toks"),
    )
    grams = docs.select(
        "source", "decile", F.explode(ngram_instances("toks", 3)).alias("ngram")
    )
    inst = grams.groupBy("source", "decile").agg(F.count("*").alias("instances"))
    firsts = grams.groupBy("source", "ngram").agg(F.min("decile").alias("first_decile"))
    novel = firsts.groupBy("source", F.col("first_decile").alias("decile")).agg(
        F.count("*").alias("novel_ngrams")
    )
    return (
        inst.join(novel, ["source", "decile"], "left")
        .select(
            "source",
            "decile",
            F.col("instances").cast("bigint").alias("instances"),
            F.coalesce("novel_ngrams", F.lit(0)).cast("bigint").alias("novel_ngrams"),
            F.round(
                F.coalesce("novel_ngrams", F.lit(0)).cast("double")
                / F.col("instances"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# q292: DSIR-style hashed n-gram importance weights
# ---------------------------------------------------------------------------

_DSIR_B = 64
_DSIR_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, lang, source, string_split(text, ' ') AS toks
        FROM documents WHERE length(text) > 0),
    grams AS (
        SELECT doc_id, lang,
               CAST(md5_number_lower(array_to_string(list_slice(toks, i, i + 1), ' '))
                    % {_DSIR_B} AS INT) AS b
        FROM docs, UNNEST(range(1, GREATEST(len(toks), 1))) AS t(i)),
    hist AS (
        SELECT b, COUNT(*) AS cs,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        FROM grams GROUP BY b),
    tot AS (SELECT SUM(cs) AS s_tot, SUM(ct) AS t_tot FROM hist),
    ratio AS (
        SELECT b,
               ln(CAST(ct + 1 AS DOUBLE) / (t.t_tot + {_DSIR_B}))
               - ln(CAST(cs + 1 AS DOUBLE) / (t.s_tot + {_DSIR_B})) AS lr
        FROM hist CROSS JOIN tot t),
    per_doc AS (
        SELECT g.doc_id, COUNT(*) AS n_grams, SUM(r.lr) AS lw
        FROM grams g JOIN ratio r ON g.b = r.b
        GROUP BY g.doc_id)
    SELECT d.lang, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(p.lw / p.n_grams), 6) AS avg_lw_per_gram,
           CAST(SUM(CASE WHEN p.lw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_targetlike
    FROM per_doc p JOIN docs d ON p.doc_id = d.doc_id
    GROUP BY d.lang, d.source
    ORDER BY d.lang, d.source
"""


@register(
    "q292_dsir_importance",
    sql=_DSIR_ORACLE,
    doc="DSIR-style data selection (Xie et al. 2023, 'Data Selection for "
    "Language Models via Importance Resampling'): documents score by the "
    "log importance ratio of hashed-bigram language models -- target = "
    "the 'en' slice, source = the whole corpus, both estimated as "
    f"Laplace-smoothed {_DSIR_B}-bucket hashed-n-gram histograms.  The "
    "report rolls per-doc normalized log-weights up to (lang, source): "
    "'en' rows score highest by construction, quantifying how well the "
    "hashed proxy separates the target domain.  Plan: ONE gram pass "
    "builds both histograms (count + conditional count per bucket), the "
    "bucket ratio table is a broadcast 64-row frame, and the per-doc "
    "rollup is a doc_id hash-agg -- two linear scans total, no "
    "data-sized shuffle beyond them.  All histogram mass is exact "
    "BIGINT; the only floats are the final log ratios (64 fixed "
    "constants) and their per-doc sum.",
)
def q292_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_mod

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    docs = d.select("doc_id", "lang", "source", t.alias("toks"))
    # lang/source ride along the gram rows (a few bytes against the gram
    # string) so the final rollup needs no join back to documents -- the
    # whole query is two scans of the gram subtree, zero non-broadcast joins.
    grams = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(ngram_instances("toks", 2)).alias("gram"),
    ).select(
        "doc_id",
        "lang",
        "source",
        # Power-of-two modulus -> md5_mod low-byte fast path (1 conv
        # instead of 8; measured 2x on this hash-dominated pass).  The
        # oracle keeps the full md5_number_lower % 64 spelling -- identical.
        md5_mod(F.col("gram"), _DSIR_B).cast("int").alias("b"),
    )
    hist = grams.groupBy("b").agg(
        F.count("*").alias("cs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    w_all = Window.partitionBy()
    ratio = hist.select(
        "b",
        (
            F.log((F.col("ct") + 1).cast("double") / (F.sum("ct").over(w_all) + _DSIR_B))
            - F.log(
                (F.col("cs") + 1).cast("double") / (F.sum("cs").over(w_all) + _DSIR_B)
            )
        ).alias("lr"),
    )
    per_doc = (
        grams.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "lang", "source")
        .agg(F.count("*").alias("n_grams"), F.sum("lr").alias("lw"))
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg(F.col("lw") / F.col("n_grams")), 6).alias("avg_lw_per_gram"),
            F.sum(F.when(F.col("lw") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_targetlike"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# q293: greedy k-center coreset (farthest-point diversity selection)
# ---------------------------------------------------------------------------

_KCENTER_K = 6


def _kcenter_oracle(k: int) -> str:
    """Unrolled DuckDB twin of the greedy farthest-point loop: round r picks
    the point maximizing its min squared distance to the selected set
    (tie-break: lowest vec_id), seeded with MIN(vec_id).

    Spelled as per-vector list arithmetic (list_transform over an index
    range) rather than an unnest/position self-join: the join form blew the
    intermediate up to |vecs|^2 x 64 rows whenever the CTE was materialized,
    and with DuckDB's default inlined CTEs the chained sels{r} references
    re-evaluated exponentially in k (135 s at sf=0.1 for 2,000 vectors).
    MATERIALIZED pins each round to one evaluation; the list spelling keeps
    each round at |vecs| x |centers| distance evaluations -- the same shape
    as the Spark kernel's numpy scan.  Sub-second at sf=0.1."""
    parts = [
        """WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x, len(embedding) AS nd
        FROM embeddings),
    sel0 AS (SELECT MIN(vec_id) AS vec_id FROM embeddings),
    sels1 AS MATERIALIZED (SELECT vec_id FROM sel0)"""
    ]
    for r in range(1, k):
        parts.append(
            f""",
    dist{r} AS MATERIALIZED (
        SELECT d.vec_id,
               MIN(list_sum(list_transform(range(1, d.nd + 1),
                   i -> (d.x[i] - c.x[i]) * (d.x[i] - c.x[i])))) AS mind2
        FROM e d CROSS JOIN (
            SELECT x FROM e WHERE vec_id IN (SELECT vec_id FROM sels{r})) c
        GROUP BY d.vec_id),
    sel{r} AS MATERIALIZED (SELECT vec_id FROM dist{r}
               ORDER BY ROUND(mind2, 9) DESC, vec_id LIMIT 1),
    sels{r + 1} AS MATERIALIZED (SELECT vec_id FROM sels{r}
                    UNION ALL SELECT vec_id FROM sel{r})"""
        )
    rounds = "\n    UNION ALL\n    ".join(
        ["SELECT 0 AS step, (SELECT vec_id FROM sel0) AS vec_id, CAST(NULL AS DOUBLE) AS radius"]
        + [
            f"SELECT {r} AS step, (SELECT vec_id FROM sel{r}) AS vec_id,"
            f" (SELECT ROUND(sqrt(mind2), 6) FROM dist{r}"
            f"  WHERE vec_id = (SELECT vec_id FROM sel{r})) AS radius"
            for r in range(1, k)
        ]
    )
    parts.append(
        f"""
    SELECT CAST(step AS INT) AS step, CAST(vec_id AS BIGINT) AS vec_id, radius
    FROM ({rounds}) ORDER BY step"""
    )
    return "".join(parts)


@register(
    "q293_kcenter_coreset",
    sql=_kcenter_oracle(_KCENTER_K),
    doc=f"Greedy k-center coreset selection ({_KCENTER_K} rounds of "
    "farthest-point traversal): each round adds the embedding farthest "
    "from the already-selected set (min-over-centers squared distance, "
    "deterministic lowest-vec_id tie-break) -- the classic 2-approximation "
    "for k-center and the standard diversity-sampling step in coreset- "
    "based data selection.  `radius` at each step is the covering radius "
    "the selection achieves, i.e. the k-center objective's trajectory.  "
    "Plan: per round ONE Arrow mapInPandas scan of the persisted embedding "
    "frame computes numpy min-distance against the <=k-row center matrix "
    "captured in the kernel closure (the q186 SemDeDup kernel pattern), "
    "and a 1-row argmax collects to the driver -- selected ids + k "
    "64-dim vectors are the only driver state (the q270/q124 scripting "
    "pattern).  Rounds are inherently sequential; per-round cost at "
    "100 TB is one scan.  The oracle unrolls the identical loop as "
    "chained CTEs.",
)
def q293_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    # The k rounds each rescan this frame; persist once so lineage (parquet
    # scan + cast) replays from memory/disk, not the source, every round.
    e = e.persist()
    try:
        seed = e.orderBy("vec_id").limit(1).collect()[0]
        sel = [int(seed["vec_id"])]
        centers = [np.asarray(seed["x"], dtype=np.float64)]
        rows = [(0, sel[0], None)]
        for r in range(1, _KCENTER_K):
            # Per-round distance is ONE Arrow mapInPandas scan: numpy
            # min-over-centers squared distance against the <=k-row center
            # matrix captured in the kernel closure (the q186 SemDeDup
            # pattern) -- replaces the interpreted zip_with+aggregate fold
            # x |centers| crossJoin, which never enters codegen (measured
            # 135s -> ~5s for the full query at sf0.1).
            C = np.stack(centers)

            def _mind2(batches, C=C):
                for pdf in batches:
                    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
                    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
                    yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "mind2": d2})

            dmin = e.mapInPandas(_mind2, "vec_id long, mind2 double")
            # Argmax on ROUND(mind2, 9): sub-ulp summation-order differences
            # between the numpy pairwise sum and the oracle's grouped sum
            # could otherwise out-rank the vec_id tie-break on
            # exactly-equidistant points.
            top = (
                dmin.orderBy(F.round("mind2", 9).desc(), F.col("vec_id").asc())
                .limit(1)
                .select("vec_id", F.round(F.sqrt("mind2"), 6).alias("radius"))
                .collect()[0]
            )
            picked = int(top["vec_id"])
            rows.append((r, picked, float(top["radius"])))
            sel.append(picked)
            centers.append(
                np.asarray(
                    e.filter(F.col("vec_id") == picked).collect()[0]["x"], dtype=np.float64
                )
            )
    finally:
        e.unpersist()
    return spark.createDataFrame(
        rows, "step int, vec_id bigint, radius double"
    ).orderBy("step")


# ---------------------------------------------------------------------------
# q294: k-anonymity release audit with minimal generalization + l-diversity
# ---------------------------------------------------------------------------

_KANON_K = 10
_KANON_L = 3
_KANON_WIDTHS = (16, 64, 256)  # n_chars generalization lattice, finest first

_KANON_ORACLE = f"""
    WITH {", ".join(
        f'''g{w} AS (
        SELECT lang, n_chars // {w} AS bucket, COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources
        FROM documents GROUP BY 1, 2),
    v{w} AS (SELECT count_if(n_docs < {_KANON_K}) AS viol FROM g{w})'''
        for w in _KANON_WIDTHS)},
    chosen AS (
        SELECT CASE
            WHEN (SELECT viol FROM v16) = 0 THEN 16
            WHEN (SELECT viol FROM v64) = 0 THEN 64
            ELSE 256 END AS width)
    SELECT c.width AS bucket_width, g.lang,
           CAST(g.bucket AS BIGINT) AS bucket,
           CAST(g.n_docs AS BIGINT) AS n_docs,
           CAST(g.n_sources AS BIGINT) AS n_sources,
           g.n_docs < {_KANON_K} AS at_risk,
           g.n_sources >= {_KANON_L} AS l_diverse
    FROM chosen c
    JOIN (
        SELECT 16 AS width, * FROM g16
        UNION ALL SELECT 64, * FROM g64
        UNION ALL SELECT 256, * FROM g256
    ) g ON g.width = c.width
    ORDER BY g.lang, g.bucket
"""


@register(
    "q294_k_anonymity_generalize",
    sql=_KANON_ORACLE,
    doc=f"Data-release governance: k-anonymity (k={_KANON_K}) over the "
    "quasi-identifiers (lang, doc-length bucket) with full-domain "
    "generalization -- the length bucket widens through the lattice "
    f"{_KANON_WIDTHS} until every equivalence class reaches k (the search "
    "is scale-dependent: sf0.1 satisfies k at width 256, smaller corpora "
    "stop at the coarsest level with residual at_risk classes) -- plus "
    f"l-diversity (>= {_KANON_L} distinct sources per class) on the "
    "sensitive attribute.  The audit a corpus owner runs before "
    "publishing per-slice statistics or samples.  Plan: ONE corpus scan "
    "computes every lattice level's class census (per-doc explode into 3 "
    "bucket rows, one hash-agg); level selection and the report run on "
    "the collected few-hundred-row frames (bounded driver state, the "
    "q270/q124 pattern).  All integers -- no float anywhere.",
)
def q294_k_anonymity_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus scan computes every lattice level's class census at once
    # (explode the doc into its 3 per-level bucket rows, then a single
    # (width, lang, bucket) hash-agg); the level choice and the report then
    # operate on the collected few-hundred-row frames -- bounded driver
    # state, the q293/q270 pattern.  The earlier per-level probe-and-retry
    # spelling scanned documents once per tried level plus once more for
    # the winner's re-execution.
    d = load_table(spark, sf_dir, "documents")
    leveled = d.select(
        "lang",
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("width"),
                        (F.col("n_chars") / w).cast("long").alias("bucket"),
                    )
                    for w in _KANON_WIDTHS
                ]
            )
        ).alias("lv"),
    )
    census = (
        leveled.groupBy("lv.width", "lang", "lv.bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .collect()
    )
    violations = {w: 0 for w in _KANON_WIDTHS}
    for r in census:
        if r["n_docs"] < _KANON_K:
            violations[r["width"]] += 1
    width = next(
        (w for w in _KANON_WIDTHS if violations[w] == 0), _KANON_WIDTHS[-1]
    )
    rows = [
        (
            int(width),
            r["lang"],
            int(r["bucket"]),
            int(r["n_docs"]),
            int(r["n_sources"]),
            r["n_docs"] < _KANON_K,
            r["n_sources"] >= _KANON_L,
        )
        for r in census
        if r["width"] == width
    ]
    return spark.createDataFrame(
        rows,
        "bucket_width int, lang string, bucket bigint, n_docs bigint, "
        "n_sources bigint, at_risk boolean, l_diverse boolean",
    ).orderBy("lang", "bucket")
