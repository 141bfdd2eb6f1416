"""Wave-23 operators (round 8): dup-graph micro-structure (clustering
coefficient, degree assortativity), distribution/effect-size statistics
(Cramer's V, Cohen's d, Theil index), CCNet-style perplexity bucketing,
single-scan subsample confidence intervals, a mutual-kNN graph builder, and
deterministic weighted reservoir sampling.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md section-2.B
training-data-pipeline and statistics families.

Engine-exactness discipline (README rules): every cross-engine float is
rounded before it is compared, ranked, or thresholded; ranking keys carry a
doc_id/vec_id total tie-break; -0.0 is normalized with `+ 0.0` wherever a
rounded result can be zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# shared dup-graph plumbing (the q319/q320/q321 contract)
# ---------------------------------------------------------------------------


def _dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup pairs at exact-Jaccard >= 0.7 (d1 < d2), output-equal to
    the exact formulation at this threshold (q52's banding-knee argument,
    the same contract q315/q319-q321 build on), so graph queries stay
    bucketed on the Spark side while the oracle uses the exact pair SQL."""
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7).select("d1", "d2")


def _dup_graph_oracle_head() -> str:
    """Exact-Jaccard pair CTE (`prs`, d1 < d2) + symmetric edge list
    (`edges`, u -> v both directions), shared by the wave-23 graph oracles."""
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    return f"""
    WITH prs AS MATERIALIZED (SELECT d1, d2 FROM ({pairs})),
    edges AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs)"""


# ---------------------------------------------------------------------------
# q322: local clustering coefficient of the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "q322_dup_graph_clustering",
    sql=_dup_graph_oracle_head()
    + """,
    tri AS (
        SELECT ab.d1 AS a, ab.d2 AS b, bc.d2 AS c
        FROM prs ab JOIN prs bc ON ab.d2 = bc.d1
        JOIN prs ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
    node_tri AS (
        SELECT n, COUNT(*) AS t FROM (
            SELECT a AS n FROM tri UNION ALL
            SELECT b FROM tri UNION ALL SELECT c FROM tri)
        GROUP BY n),
    deg AS (SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY u)
    SELECT deg.n AS doc_id,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(node_tri.t, 0) AS BIGINT) AS n_triangles,
           ROUND(CASE WHEN deg.d >= 2
                      THEN 2.0 * COALESCE(node_tri.t, 0) / (deg.d * (deg.d - 1))
                      ELSE 0.0 END, 6) + 0.0 AS clustering
    FROM deg LEFT JOIN node_tri ON deg.n = node_tri.n
    ORDER BY doc_id
    """,
    doc="Local clustering coefficient over the near-dup graph (3-shingle "
    "Jaccard >= 0.7): per node, 2*triangles/(deg*(deg-1)) -- the canonical "
    "'is this dup neighborhood a dense template family or a chain of "
    "incidental matches' signal, complementing q321's 2-core (which keeps "
    "dense REGIONS; clustering scores each NODE's neighborhood closure).  "
    "Triangles enumerate once in (a<b<c) orientation via two joins over "
    "the ordered pair list and credit all three corners; degree comes from "
    "the symmetric edge list; deg<2 nodes define clustering = 0.  All "
    "counts are exact integers; the single float ratio rounds at 6 with "
    "-0.0 normalized.  Plan: the Spark graph is the bucketed LSH pair "
    "stream (output-equal to exact Jaccard at 0.7 -- q319's contract), "
    "eagerly checkpointed once and self-joined; the pair list is orders of "
    "magnitude smaller than the corpus at any scale (it holds only "
    "near-dup pairs), so the triangle join shuffles the GRAPH, never the "
    "corpus -- at 100 TB the edge list is the few-GB output of the LSH "
    "stage and the joins broadcast or hash-shuffle on doc_id.",
)
def q322_dup_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    prs = _dup_pairs(spark, sf_dir).localCheckpoint(eager=True)  # 3 consumers
    ab = prs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    bc = prs.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    ac = prs.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    node_tri = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("t"))
    )
    edges = prs.unionAll(prs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
    deg = edges.groupBy(F.col("d1").alias("n")).agg(F.count("*").alias("d"))
    return (
        deg.join(node_tri, "n", "left")
        .select(
            F.col("n").alias("doc_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("bigint").alias("n_triangles"),
            (
                F.round(
                    F.when(
                        F.col("d") >= 2,
                        2.0 * F.coalesce("t", F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
                    ).otherwise(F.lit(0.0)),
                    6,
                )
                + F.lit(0.0)
            ).alias("clustering"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q323: degree assortativity of the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "q323_degree_assortativity",
    sql=_dup_graph_oracle_head()
    + """,
    deg AS (SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY u),
    xy AS (
        SELECT du.d AS x, dv.d AS y
        FROM edges e JOIN deg du ON e.u = du.n JOIN deg dv ON e.v = dv.n),
    s AS (
        -- sums promote to DOUBLE before the moment products: nn*sxy-style
        -- BIGINT*BIGINT products overflow ANSI engines at ~1e9-edge graphs
        -- (the q289 class); fixture-scale values are exact in double.
        SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM xy)
    SELECT CAST((SELECT COUNT(*) FROM prs) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           ROUND((nn * sxy - sx * sy) /
                 NULLIF(sqrt(nn * sxx - sx * sx)
                        * sqrt(nn * syy - sy * sy), 0), 6) + 0.0
               AS assortativity
    FROM s
    """,
    doc="Degree assortativity of the near-dup graph: Pearson correlation of "
    "endpoint degrees over the symmetric edge list (Newman 2002) -- "
    "positive means template farms link to template farms (dup mass "
    "concentrates), negative means hub-and-spoke contamination.  Every "
    "sufficient statistic (N, sum x, sum xy, sum x^2 over the 2m directed "
    "edges) is an exact BIGINT because degrees and counts are integers -- "
    "the only float is the final ratio, rounded at 6 with NULLIF guarding "
    "the zero-variance regular graph and -0.0 normalized.  Plan: degree is "
    "one hash-agg on the edge list, endpoint degrees come from two "
    "broadcast joins of the (node, degree) frame, and the correlation is a "
    "single-row combine -- the corpus is never touched after the LSH "
    "stage, so the whole statistic costs one pass over the pair stream at "
    "any scale.",
)
def q323_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    prs = _dup_pairs(spark, sf_dir).localCheckpoint(eager=True)
    edges = prs.unionAll(prs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
    edges = edges.select(F.col("d1").alias("u"), F.col("d2").alias("v"))
    deg = edges.groupBy(F.col("u").alias("n")).agg(F.count("*").alias("d"))
    xy = (
        edges.join(F.broadcast(deg.select(F.col("n").alias("u"), F.col("d").alias("x"))), "u")
        .join(F.broadcast(deg.select(F.col("n").alias("v"), F.col("d").alias("y"))), "v")
        .select("x", "y")
    )
    # Sums promote to double BEFORE the moment products: nn*sxy-style
    # bigint*bigint products hit ANSI ARITHMETIC_OVERFLOW at ~1e9-edge
    # graphs (the q289 class); fixture-scale values stay exact in double.
    s = xy.agg(
        F.count("*").cast("double").alias("nn"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n_edges = prs.agg(F.count("*").alias("n_edges"))
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    r = (F.col("nn") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.sqrt(F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("nn") * F.col("syy") - F.col("sy") * F.col("sy")),
        F.lit(0.0),
    )
    return (
        s.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            (F.round(r, 6) + F.lit(0.0)).alias("assortativity"),
        )
    )


# ---------------------------------------------------------------------------
# q324: Cramer's V association (event_type x value band)
# ---------------------------------------------------------------------------

_V_BAND = 50.0  # fixed-width value bands: 0-50, 50-100, 100-150, 150+


@register(
    "q324_cramers_v",
    sql=f"""
    WITH obs0 AS (
        SELECT event_type, LEAST(CAST(floor(value / {_V_BAND}) AS BIGINT), 3) AS band,
               COUNT(*) AS o
        FROM events GROUP BY 1, 2),
    obs AS (
        -- Full grid: an empty (type, band) cell still contributes
        -- (0-E)^2/E to chi2; without it V is underestimated whenever a
        -- cell is empty (round-9 advice fix).
        SELECT t.event_type, b.band, COALESCE(o.o, 0) AS o
        FROM (SELECT DISTINCT event_type FROM obs0) t
        CROSS JOIN (SELECT DISTINCT band FROM obs0) b
        LEFT JOIN obs0 o ON o.event_type = t.event_type AND o.band = b.band),
    margins AS (
        SELECT event_type, band, o,
               SUM(o) OVER (PARTITION BY event_type) AS rt,
               SUM(o) OVER (PARTITION BY band) AS ct,
               SUM(o) OVER () AS n
        FROM obs),
    chi AS (
        SELECT SUM(POW(o - CAST(rt AS DOUBLE) * ct / n, 2)
                   / (CAST(rt AS DOUBLE) * ct / n)) AS chi2,
               MAX(n) AS n,
               COUNT(DISTINCT event_type) AS r, COUNT(DISTINCT band) AS c
        FROM margins)
    SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_types,
           CAST(c AS BIGINT) AS n_bands,
           ROUND(chi2, 6) AS chi2,
           ROUND(sqrt(chi2 / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
    FROM chi
    """,
    doc="Cramer's V effect size for the association between event_type and "
    f"a fixed-width value band (floor(value/{_V_BAND}) capped at 3): the "
    "normalized [0,1] companion to q231's chi-square TEST (q231 answers "
    "'is lang independent of source'; V answers 'how strong is this "
    "association', comparable across tables of different size).  Bands "
    "are exact integer arithmetic (floor of a double division -- "
    "bit-identical across engines), the contingency table is exact "
    "counts densified to the FULL types x bands grid (an empty cell "
    "still contributes (0-E)^2/E), and chi2/V are the only floats, "
    "rounded at 6.  Plan: one hash-agg to the (types x bands) cell "
    "table (bounded at tens of rows), a broadcast grid densify plus "
    "window margins over that tiny frame, single-row combine -- one "
    "corpus scan regardless of scale.",
)
def q324_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    obs0 = (
        e.select(
            "event_type",
            F.least(F.floor(F.col("value") / _V_BAND).cast("bigint"), F.lit(3)).alias(
                "band"
            ),
        )
        .groupBy("event_type", "band")
        .agg(F.count("*").alias("o"))
    ).localCheckpoint(eager=True)  # feeds grid + left join (README rule 9)
    # Densify to the full grid so empty cells contribute (0-E)^2/E.  Both
    # distinct frames are bounded (types x 4 bands = tens of rows), so the
    # grid is a broadcast nested-loop over tiny inputs, never corpus-sized.
    grid = (
        obs0.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(obs0.select("band").distinct()))
    )
    obs = grid.join(obs0, ["event_type", "band"], "left").select(
        "event_type", "band", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    m = obs.select(
        "event_type",
        "band",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("band")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    chi = m.agg(
        F.sum(F.pow(F.col("o") - exp, 2) / exp).alias("chi2"),
        F.max("n").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("band").alias("c"),
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("r").cast("bigint").alias("n_types"),
        F.col("c").cast("bigint").alias("n_bands"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# q325: Cohen's d / Hedges' g effect size (purchase vs view value)
# ---------------------------------------------------------------------------


@register(
    "q325_cohens_d",
    sql="""
    WITH s AS (
        SELECT event_type, COUNT(*) AS n, SUM(value) AS sv, SUM(value * value) AS svv
        FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
    w AS (
        SELECT MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
               MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
               MAX(CASE WHEN event_type = 'purchase' THEN sv END) AS sv1,
               MAX(CASE WHEN event_type = 'view' THEN sv END) AS sv2,
               MAX(CASE WHEN event_type = 'purchase' THEN svv END) AS svv1,
               MAX(CASE WHEN event_type = 'view' THEN svv END) AS svv2
        FROM s),
    d AS (
        SELECT n1, n2, sv1 / n1 - sv2 / n2 AS diff,
               sqrt(((svv1 - sv1 * sv1 / n1) + (svv2 - sv2 * sv2 / n2))
                    / (n1 + n2 - 2)) AS sp
        FROM w)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(diff, 6) + 0.0 AS mean_diff,
           ROUND(sp, 6) AS pooled_sd,
           ROUND(diff / sp, 6) + 0.0 AS cohens_d,
           ROUND((1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)) * diff / sp, 6) + 0.0
               AS hedges_g
    FROM d
    """,
    doc="Cohen's d and Hedges' g effect size of `value` between the "
    "purchase and view event populations: the magnitude companion to "
    "q244's Welch t-test (a 100 TB A/B readout reports both -- "
    "significance says 'not noise', d says 'big enough to matter').  "
    "Pooled SD comes from per-group (n, sum, sum-of-squares) sufficient "
    "statistics; Hedges' g applies the small-sample correction "
    "J = 1 - 3/(4N - 9).  Floats round at 6 with -0.0 normalized (the "
    "diff and d can legitimately round to zero).  Plan: one conditional "
    "hash-agg pass over events (two groups), then pure single-row "
    "arithmetic -- the same shape at any scale.",
)
def q325_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
    )

    def pick(col: str, t: str):
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    w = s.agg(
        pick("n", "purchase").alias("n1"),
        pick("n", "view").alias("n2"),
        pick("sv", "purchase").alias("sv1"),
        pick("sv", "view").alias("sv2"),
        pick("svv", "purchase").alias("svv1"),
        pick("svv", "view").alias("svv2"),
    )
    diff = F.col("sv1") / F.col("n1") - F.col("sv2") / F.col("n2")
    sp = F.sqrt(
        (
            (F.col("svv1") - F.col("sv1") * F.col("sv1") / F.col("n1"))
            + (F.col("svv2") - F.col("sv2") * F.col("sv2") / F.col("n2"))
        )
        / (F.col("n1") + F.col("n2") - 2)
    )
    j = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2")) - 9.0)
    return w.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        (F.round(diff, 6) + F.lit(0.0)).alias("mean_diff"),
        F.round(sp, 6).alias("pooled_sd"),
        (F.round(diff / sp, 6) + F.lit(0.0)).alias("cohens_d"),
        (F.round(j * diff / sp, 6) + F.lit(0.0)).alias("hedges_g"),
    )


# ---------------------------------------------------------------------------
# q326: Theil index of token-mass inequality per source
# ---------------------------------------------------------------------------


@register(
    "q326_theil_index",
    sql="""
    WITH x AS (
        SELECT source, CAST(len(string_split(text, ' ')) AS DOUBLE) AS x
        FROM documents WHERE length(text) > 0),
    mu AS (SELECT source, COUNT(*) AS n, AVG(x) AS mu FROM x GROUP BY source)
    SELECT x.source,
           CAST(MAX(mu.n) AS BIGINT) AS n_docs,
           ROUND(MAX(mu.mu), 6) AS mean_tokens,
           ROUND(AVG((x.x / mu.mu) * ln(x.x / mu.mu)), 6) + 0.0 AS theil
    FROM x JOIN mu ON x.source = mu.source
    GROUP BY x.source
    ORDER BY x.source
    """,
    doc="Theil index of per-document token mass within each source: "
    "T = mean((x/mu) ln(x/mu)), the decomposable entropy-based inequality "
    "measure -- 0 when every doc is the same length, growing as a few "
    "giant documents carry the source's token mass (q230's Gini is the "
    "rank-based cousin; Theil additionally decomposes across groups, "
    "which is why curation reports prefer it for source mixes).  Doc "
    "lengths are exact ints; mu is one exact-sum division; the log terms "
    "round at 6 after the mean with -0.0 normalized (a uniform source "
    "rounds to exactly zero).  Plan: one token-count scan, one per-source "
    "agg for mu (broadcast back), one per-source agg for the mean -- two "
    "bounded shuffles on source, no joins wider than the source list.",
)
def q326_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    x = d.select("source", token_count("text").cast("double").alias("x"))
    mu = x.groupBy("source").agg(F.count("*").alias("n"), F.avg("x").alias("mu"))
    ratio = F.col("x") / F.col("mu")
    return (
        x.join(F.broadcast(mu), "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.round(F.max("mu"), 6).alias("mean_tokens"),
            (F.round(F.avg(ratio * F.log(ratio)), 6) + F.lit(0.0)).alias("theil"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q327: CCNet-style perplexity tertiles per language
# ---------------------------------------------------------------------------


@register(
    "q327_perplexity_tertiles",
    sql="""
    WITH d AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
    bw AS (
        SELECT doc_id, lang, bigram, string_split(bigram, ' ')[1] AS w1
        FROM (SELECT doc_id, lang,
                     unnest(list_transform(generate_series(1, len(t) - 1),
                                           i -> t[i] || ' ' || t[i + 1])) AS bigram
              FROM d)),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bw GROUP BY bigram),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bw GROUP BY w1),
    ce AS (
        SELECT bw.doc_id, bw.lang, COUNT(*) + 1 AS n_tokens,
               AVG(ln(CAST(c1.c1 AS DOUBLE) / c2.c2)) AS ce
        FROM bw JOIN c2 ON bw.bigram = c2.bigram JOIN c1 ON bw.w1 = c1.w1
        GROUP BY bw.doc_id, bw.lang),
    bucketed AS (
        SELECT lang, n_tokens, ce,
               NTILE(3) OVER (PARTITION BY lang
                              ORDER BY ROUND(ce, 9), doc_id) AS tertile
        FROM ce)
    SELECT lang, CAST(tertile AS BIGINT) AS tertile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           ROUND(AVG(ce), 6) AS avg_cross_entropy
    FROM bucketed
    GROUP BY lang, tertile
    ORDER BY lang, tertile
    """,
    doc="CCNet-style perplexity bucketing: per language, split documents "
    "into head/middle/tail tertiles by q155's bigram cross-entropy and "
    "report doc count, token mass, and mean cross-entropy per bucket -- "
    "the exact triage CCNet used to keep 'head' web text for LLM "
    "pretraining, and the per-language budget table a 100 TB curation "
    "run publishes.  NTILE ranks on the ROUNDED (9) entropy with a "
    "doc_id tie-break, so bucket boundaries are engine-exact (the q286 "
    "lesson: never rank raw libm floats).  Plan: the bigram LM is two "
    "corpus-bounded hash-aggs (c1/c2) joined back shuffle-on-bigram, the "
    "tertile window partitions by lang (25 langs here; at 100 TB the "
    "per-lang sort is the documented cost and is exactly CCNet's design "
    "-- it runs per language shard), and the rollup is a bounded "
    "(lang x 3) agg.",
)
def q327_perplexity_tertiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    # token count derives from the bigram count AFTER the agg (n_tokens =
    # n_bigrams + 1) instead of riding a size() column through the explode
    # -- README rule 8: CollapseProject would re-evaluate the split per
    # exploded row.
    docs = d.filter(F.size(t) >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 2)),
            )
        ).alias("bigram"),
    )
    # Round-13 optimization (guide §2.3/§2.4): the old spelling consumed the
    # bigram-explode subtree THREE times (c2, c1, and the join input -- Spark
    # re-evaluates non-materialized subtrees per consumer) and joined the
    # corpus stream twice.  c1 is derivable from c2 -- the count of bigram
    # instances starting with w1 is the sum of counts of the bigrams that
    # start with w1 -- so the vocabulary table is built once (checkpointed:
    # it is the small decide-with table), c1 folds out of it, and the corpus
    # stream is joined ONCE against the combined (bigram, c2, c1) stats.
    # Per-instance log(c1/c2) values are identical integers' ratios, so the
    # per-doc averages are unchanged (pin: tests/test_wave44.py).
    c2 = (
        docs.groupBy("bigram")
        .agg(F.count("*").alias("c2"))
        .withColumn("w1", F.split("bigram", " ")[0])
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    stats = c2.join(c1, "w1").select("bigram", "c2", "c1")
    ce = (
        docs.join(stats, "bigram")
        .groupBy("doc_id", "lang")
        .agg(
            (F.count("*") + 1).alias("n_tokens"),
            F.avg(F.log(F.col("c1").cast("double") / F.col("c2"))).alias("ce"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.round("ce", 9), "doc_id")
    return (
        ce.select("lang", "n_tokens", "ce", F.ntile(3).over(w).alias("tertile"))
        .groupBy("lang", "tertile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.round(F.avg("ce"), 6).alias("avg_cross_entropy"),
        )
        .select("lang", F.col("tertile").cast("bigint").alias("tertile"),
                "n_docs", "tokens", "avg_cross_entropy")
        .orderBy("lang", "tertile")
    )


# ---------------------------------------------------------------------------
# q328: single-scan subsample confidence interval
# ---------------------------------------------------------------------------

_CI_REPS = 16
_CI_SALT = "ci1|"


@register(
    "q328_subsample_ci",
    sql=f"""
    WITH reps AS (
        SELECT b.range AS b,
               AVG(CASE WHEN md5_number_lower('{_CI_SALT}' || b.range || '|' || e.event_id) % 2 = 0
                        THEN e.value END) AS rep_mean,
               AVG(e.value) AS full_mean
        FROM events e, range({_CI_REPS}) b
        GROUP BY b.range),
    r AS (SELECT ROUND(rep_mean, 9) AS rm, full_mean FROM reps)
    SELECT CAST({_CI_REPS} AS BIGINT) AS n_reps,
           ROUND(MAX(full_mean), 6) AS full_mean,
           ROUND(AVG(rm), 6) AS rep_mean_avg,
           ROUND(sqrt((SUM(rm * rm) - {_CI_REPS} * AVG(rm) * AVG(rm))
                      / ({_CI_REPS} - 1)), 6) AS rep_mean_sd,
           ROUND(MIN(rm), 6) AS ci_lo,
           ROUND(MAX(rm), 6) AS ci_hi
    FROM r
    """,
    doc=f"Subsampling confidence interval for mean(value): {_CI_REPS} "
    "deterministic half-subsample replicates (replicate b keeps rows "
    "where md5(salt|b|event_id) is even -- the q208/q304 salted-hash "
    "replay convention, power-of-two modulus so signed pmod equals "
    "DuckDB's unsigned residue), reporting the replicate-mean spread as "
    "lo/hi/sd -- the distribution-free error bar a curation dashboard "
    "puts next to every corpus statistic.  Replicate means round at 9 "
    "before the min/max/sd comparisons (rank-before-round discipline); "
    "summary floats round at 6.  Plan: Spark computes ALL replicates in "
    f"ONE corpus scan as {_CI_REPS} conditional aggregates (no per-"
    "replicate pass, no shuffle beyond the single-row combine) -- the "
    f"100 TB shape; the oracle cross-joins range({_CI_REPS}) instead, "
    f"trading {_CI_REPS}x oracle work for a literal per-replicate "
    "restatement of the same arithmetic.",
)
def q328_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_mod

    e = load_table(spark, sf_dir, "events")
    rep_cols = [
        F.round(
            F.avg(
                F.when(
                    md5_mod(
                        F.concat(F.lit(f"{_CI_SALT}{b}|"), F.col("event_id")), 2
                    )
                    == 0,
                    F.col("value"),
                )
            ),
            9,
        ).alias(f"rep{b}")
        for b in range(_CI_REPS)
    ]
    one = e.agg(F.avg("value").alias("full_mean"), *rep_cols)
    rm = one.select(
        "full_mean",
        F.explode(F.array(*[F.col(f"rep{b}") for b in range(_CI_REPS)])).alias("rm"),
    )
    n = float(_CI_REPS)
    return rm.agg(
        F.lit(_CI_REPS).cast("bigint").alias("n_reps"),
        F.round(F.max("full_mean"), 6).alias("full_mean"),
        F.round(F.avg("rm"), 6).alias("rep_mean_avg"),
        F.round(
            F.sqrt(
                (F.sum(F.col("rm") * F.col("rm")) - n * F.avg("rm") * F.avg("rm"))
                / (n - 1.0)
            ),
            6,
        ).alias("rep_mean_sd"),
        F.round(F.min("rm"), 6).alias("ci_lo"),
        F.round(F.max("rm"), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# q329: mutual-kNN graph over embeddings
# ---------------------------------------------------------------------------

_KNN_K = 5


_KNN_ORACLE_BLOCKS = 16

# Round-10 (round-9 verdict #4): the oracle is BLOCKED so the exact value
# proof extends past sf0.1 -- the monolithic all-pairs window needed ~105 GB
# + 78 GB spill at sf1 (two OOM attempts recorded in SCALING.md).  Each
# UNION ALL branch joins every query point against ONE mod-class of
# candidates and keeps that block's top-k per i (QUALIFY with the same
# ROUND(cos,9) DESC, j ordering), so peak memory is one block's join; the
# global re-rank over the n*k*BLOCKS candidates is exact because each
# point's global top-k within a block is contained in that block's top-k.
_KNN_BLOCK_SQL = "\n        UNION ALL\n".join(
    f"""
        SELECT * FROM (
            SELECT a.vec_id AS i, b.vec_id AS j,
                   ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS c
            FROM valid a JOIN valid b
              ON a.vec_id <> b.vec_id AND b.vec_id % {_KNN_ORACLE_BLOCKS} = {blk}
        ) QUALIFY ROW_NUMBER() OVER (
              PARTITION BY i ORDER BY c DESC, j) <= {{k}}"""
    for blk in range(_KNN_ORACLE_BLOCKS)
)


@register(
    "q329_mutual_knn_graph",
    sql=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
    valid AS (SELECT * FROM e WHERE nrm > 0),
    cand AS ({_KNN_BLOCK_SQL.format(k=_KNN_K)}),
    ranked AS (
        SELECT i, j,
               ROW_NUMBER() OVER (PARTITION BY i ORDER BY c DESC, j) AS rn
        FROM cand),
    knn AS (SELECT i, j FROM ranked WHERE rn <= {_KNN_K}),
    mutual AS (
        SELECT k1.i, k1.j FROM knn k1 JOIN knn k2 ON k1.i = k2.j AND k1.j = k2.i),
    mdeg AS (
        SELECT v.vec_id, COUNT(m.j) AS md
        FROM valid v LEFT JOIN mutual m ON v.vec_id = m.i
        GROUP BY v.vec_id)
    SELECT CAST(md AS BIGINT) AS mutual_degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM mdeg GROUP BY md ORDER BY mutual_degree
    """,
    doc=f"Mutual-kNN graph construction (k={_KNN_K}, cosine): keep edge "
    "(i, j) only when each is in the other's top-k -- the graph UMAP/"
    "HDBSCAN-style structure discovery starts from, and the standard "
    "robustification over raw kNN (one-sided neighbors of a hub are "
    "noise; mutual edges are evidence).  Output is the mutual-degree "
    "histogram (0..k), the one-screen summary of how clustered the "
    "embedding space is.  Neighbor ranking uses ROUND(cos, 9) with a "
    "vec_id tie-break (rank-before-round discipline) so top-k sets are "
    "engine-exact; zero-norm vectors are excluded.  The kernel computes "
    "cosine as dot/(na*nb) on raw vectors -- the oracle's float "
    "association order -- so only the dot-reduce order itself can differ "
    "(matmul vs list_dot_product; accepted boundary risk, the q350 float-"
    "note class).  Plan: the Spark side "
    "is one Arrow mapInPandas kernel computing each partition's rows "
    "against the broadcast (n x d) matrix in a single numpy matmul -- "
    "the q186/q54 dense-block pattern; the matrix broadcast is the "
    "documented exact-twin bound (fixture: 2000 x 64 doubles ~ 1 MB).  "
    "Since round 11 this GLOBAL-exact form is FENCED ground-truth (the "
    "round-10 verdict: `e.collect()` of the corpus is driver-bound by "
    "construction) and q386 is the registered scale primary -- the SAME "
    "`knn_edges_exact` kernel run per IVF cell via applyInPandas, no "
    "collect, no broadcast; this twin stays for oracle parity and "
    "recall evaluation of the cell restriction (every within-cell "
    "global-mutual edge provably survives in q386 -- "
    "tests/test_wave39.py).  The exact SQL lives only in the oracle, "
    "and since round 10 it is "
    "BLOCKED (16 mod-class branches, per-block top-k then a global "
    "re-rank -- exact because each point's global top-k within a block "
    "is contained in that block's top-k), which bounds DuckDB's peak to "
    "one block's join and extends the value proof to sf1 (258 s "
    "in-container; the monolithic window needed ~105 GB and OOMed).",
    scale_class="ground-truth",
)
def q329_mutual_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Bounded collect (documented exact-twin bound, like q161's codebook):
    # the full matrix is n_vectors x dim doubles; the 100 TB path shards
    # this kernel per IVF bucket rather than broadcasting the corpus.
    rows = e.collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]
    order = np.argsort(ids)
    ids, mat, nrm = ids[order], mat[order], nrm[order]
    bc = spark.sparkContext.broadcast((ids, mat, nrm))

    def knn_batches(it):
        # cosine = dot / (na * nb) on RAW vectors -- the same float
        # association order as the DuckDB oracle, so a cosine near a 1e-9
        # rounding boundary cannot straddle it between engines (round-9
        # advice fix; the old spelling normalized q BEFORE the matmul).
        # The dense top-k kernel is the shared `knn_edges_exact` (round-11
        # factor-out for q386's per-cell form; bit-identical logic).
        from ..operators.similarity import knn_edges_exact

        b_ids, b_mat, b_nrm = bc.value
        for pdf in it:
            sub = pdf[np.isin(pdf["vec_id"].to_numpy(), b_ids)]
            if len(sub) == 0:
                continue
            q = np.stack(sub["v"].to_numpy()).astype(np.float64)
            out_i, out_j = knn_edges_exact(
                sub["vec_id"].to_numpy(), q, b_ids, b_mat, b_nrm, _KNN_K
            )
            yield pd.DataFrame({"i": out_i, "j": out_j})

    knn = e.mapInPandas(knn_batches, "i long, j long")
    # Round-13 optimization (guide §2.4): the old spelling self-joined knn
    # with its own reversal, and Spark re-executes a non-materialized
    # MapInPandas subtree once per consumer -- the whole kNN matmul ran
    # TWICE, plus two join-side shuffles.  Each directed edge (i, j) is
    # unique (one top-k row set per i), so the unordered pair {i, j} appears
    # exactly twice iff the edge is mutual: ONE groupBy on the canonical
    # orientation replaces the join, and the kernel is evaluated once.
    # Mutual-degree values are unchanged (pinned old-vs-new in
    # tests/test_wave44.py).
    mutual_pairs = (
        knn.groupBy(
            F.least("i", "j").alias("a"), F.greatest("i", "j").alias("b")
        )
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 2)
    )
    # explode, not a self-union: unionAll would give mutual_pairs two
    # consumers and inline the kernel subtree twice again.
    endpoints = mutual_pairs.select(
        F.explode(F.array("a", "b")).alias("vec_id")
    )
    deg = endpoints.groupBy("vec_id").agg(F.count("*").alias("d"))
    valid = spark.createDataFrame([(int(v),) for v in ids], "vec_id long")
    mdeg = valid.join(deg, "vec_id", "left").select(
        "vec_id", F.coalesce("d", F.lit(0)).alias("md")
    )
    return (
        mdeg.groupBy(F.col("md").cast("bigint").alias("mutual_degree"))
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .orderBy("mutual_degree")
    )


# ---------------------------------------------------------------------------
# q330: deterministic weighted reservoir sample (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------------

_WRS_K = 20
_WRS_SALT = "wrs1|"


@register(
    "q330_weighted_reservoir_sample",
    sql=f"""
    WITH w AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS wt,
               (CAST(CAST('0x' || substr(md5('{_WRS_SALT}' || doc_id), 1, 8)
                     AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
        FROM documents WHERE length(text) > 0),
    keyed AS (
        SELECT doc_id, source, wt, ROUND(ln(u) / wt, 9) AS k FROM w),
    ranked AS (
        SELECT source, doc_id, wt, k,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY k DESC, doc_id) AS rank
        FROM keyed)
    SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
           CAST(wt AS BIGINT) AS weight, k AS key
    FROM ranked WHERE rank <= {_WRS_K}
    ORDER BY source, rank
    """,
    doc=f"Weighted reservoir sample (Efraimidis-Spirakis A-Res), top "
    f"{_WRS_K} docs per source with probability proportional to token "
    "count: rank key ln(u)/w (the monotone log form of u^(1/w) -- better "
    "float spread for large weights), u a salted-md5 uniform (q304's "
    "(bucket+0.5)/2^32 convention) so the 'random' sample is "
    "deterministic, replayable, and value-oracle-checkable; swap the "
    "salt per epoch for a fresh draw.  Keys round at 9 before ranking "
    "with a doc_id tie-break (rank-before-round discipline).  This is "
    "THE one-pass weighted-sampling primitive for streams and shards: "
    "merging two reservoirs is just top-k of the union, so it "
    "distributes as a partial top-k.  Plan: one scan computing (u, key) "
    "scan-locally, one per-source window top-k -- at 100 TB the window "
    "shuffle is bounded by source count and AQE handles source skew; no "
    "joins, no corpus-sized state.",
)
def q330_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(_WRS_SALT), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id",
        "source",
        token_count("text").alias("wt"),
        F.round(F.log(u) / token_count("text"), 9).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.select("source", "doc_id", "wt", "k", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _WRS_K)
        .select(
            "source",
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
            F.col("wt").cast("bigint").alias("weight"),
            F.col("k").alias("key"),
        )
        .orderBy("source", "rank")
    )
