"""Wave-24 operators (round 8, continued): cross-language near-dup
contamination, source vocabulary overlap, reciprocal-rank fusion of hybrid
retrieval rankings, variance-homogeneity and rank-based group tests
(Brown-Forsythe, Kruskal-Wallis), and MMR diversity re-ranking.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B training-data-pipeline and statistics families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register
from .wave23 import _dup_pairs

# ---------------------------------------------------------------------------
# q331: cross-language near-dup contamination matrix
# ---------------------------------------------------------------------------


def _cross_lang_oracle() -> str:
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    return f"""
    WITH prs AS MATERIALIZED (SELECT d1, d2 FROM ({pairs})),
    lng AS (SELECT doc_id, lang FROM documents),
    tagged AS (
        SELECT LEAST(a.lang, b.lang) AS lang_a,
               GREATEST(a.lang, b.lang) AS lang_b
        FROM prs JOIN lng a ON prs.d1 = a.doc_id JOIN lng b ON prs.d2 = b.doc_id)
    SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (lang_a <> lang_b) AS is_cross_lang
    FROM tagged GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b
    """


@register(
    "q331_cross_lang_neardups",
    sql=_cross_lang_oracle(),
    doc="Cross-language near-dup contamination matrix: near-dup pairs "
    "(3-shingle Jaccard >= 0.7) rolled up by the unordered (lang, lang) "
    "pair of their endpoints -- cross-language rows expose templated or "
    "machine-translated duplication that per-language dedup runs would "
    "never see (the standard argument for deduping BEFORE language "
    "splitting in a multilingual 100 TB corpus).  The lang pair is "
    "canonicalized with LEAST/GREATEST so (en, zh) and (zh, en) are one "
    "row.  Plan: the pair stream is the bucketed LSH pipeline (q319's "
    "output-equal contract); lang attaches via two joins against the "
    "(doc_id, lang) projection, and the rollup is bounded by lang-pair "
    "count -- graph-sized work after the LSH stage, corpus never re-read.",
)
def q331_cross_lang_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    prs = _dup_pairs(spark, sf_dir)
    lng = d.select("doc_id", "lang")
    a = lng.select(F.col("doc_id").alias("d1"), F.col("lang").alias("la"))
    b = lng.select(F.col("doc_id").alias("d2"), F.col("lang").alias("lb"))
    return (
        prs.join(a, "d1")
        .join(b, "d2")
        .select(
            F.least("la", "lb").alias("lang_a"),
            F.greatest("la", "lb").alias("lang_b"),
        )
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .select(
            "lang_a",
            "lang_b",
            "n_pairs",
            (F.col("lang_a") != F.col("lang_b")).alias("is_cross_lang"),
        )
        .orderBy("lang_a", "lang_b")
    )


# ---------------------------------------------------------------------------
# q332: source vocabulary-overlap matrix (top-K token sets)
# ---------------------------------------------------------------------------

_VOCAB_K = 200


@register(
    "q332_vocab_overlap_matrix",
    sql=f"""
    WITH tf AS (
        SELECT source, token, COUNT(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE length(text) > 0)
        GROUP BY 1, 2),
    topk AS MATERIALIZED (
        SELECT source, token FROM (
            SELECT source, token,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY c DESC, token) AS rn
            FROM tf)
        WHERE rn <= {_VOCAB_K}),
    sizes AS (SELECT source, COUNT(*) AS sz FROM topk GROUP BY source),
    common AS (
        SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_common
        FROM topk a JOIN topk b ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2)
    SELECT p.s1, p.s2,
           CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
           ROUND(COALESCE(c.n_common, 0)
                 / CAST(z1.sz + z2.sz - COALESCE(c.n_common, 0) AS DOUBLE), 6)
               AS vocab_jaccard
    FROM (SELECT a.source AS s1, b.source AS s2
          FROM sizes a JOIN sizes b ON a.source < b.source) p
    LEFT JOIN common c ON p.s1 = c.s1 AND p.s2 = c.s2
    JOIN sizes z1 ON p.s1 = z1.source JOIN sizes z2 ON p.s2 = z2.source
    ORDER BY p.s1, p.s2
    """,
    doc=f"Source vocabulary-overlap matrix: each source's top-{_VOCAB_K} "
    "tokens by frequency (count-desc, token tie-break), then pairwise "
    "Jaccard between the top-K sets -- the LEXICAL complement of q314's "
    "semantic-centroid matrix and q315's near-dup matrix; divergent "
    "vocabularies flag register/domain shift that embedding centroids "
    "smooth over.  All-zero overlaps still appear (the pair frame is "
    "built from the source list, not from the join).  Plan: one "
    "vocab-bounded (source, token) hash-agg, a per-source top-K window "
    "(partition-bounded), and a top-K x top-K self-join capped at "
    f"|sources| x {_VOCAB_K} rows -- every frame after the first agg is "
    "tiny at any corpus scale.",
)
def q332_vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "token")
    topk = (
        tf.select("source", "token", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _VOCAB_K)
        .select("source", "token")
        .localCheckpoint(eager=True)  # consumed by sizes and both join sides
    )
    sizes = topk.groupBy("source").agg(F.count("*").alias("sz"))
    a = topk.select(F.col("source").alias("s1"), "token")
    b = topk.select(F.col("source").alias("s2"), "token")
    common = (
        a.join(b, "token")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_common"))
    )
    z1 = sizes.select(F.col("source").alias("s1"), F.col("sz").alias("sz1"))
    z2 = sizes.select(F.col("source").alias("s2"), F.col("sz").alias("sz2"))
    pairs = z1.crossJoin(F.broadcast(z2)).filter(F.col("s1") < F.col("s2"))
    nc = F.coalesce("n_common", F.lit(0))
    return (
        pairs.join(F.broadcast(common), ["s1", "s2"], "left")
        .select(
            "s1",
            "s2",
            nc.cast("bigint").alias("n_common"),
            F.round(
                nc / (F.col("sz1") + F.col("sz2") - nc).cast("double"), 6
            ).alias("vocab_jaccard"),
        )
        .orderBy("s1", "s2")
    )


# ---------------------------------------------------------------------------
# q333: reciprocal-rank fusion of BM25 and term-density rankings
# ---------------------------------------------------------------------------

_RRF_C = 60
_RRF_TOPN = 50
_RRF_TERMS = ("spark", "query", "fast")


def _rrf_oracle() -> str:
    from .wave7 import _BM25_B, _BM25_K1

    terms = ", ".join(f"'{t}'" for t in _RRF_TERMS)
    return f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE length(text) > 0),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM d),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS token FROM d)
        WHERE token IN ({terms})
        GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    dl AS (SELECT doc_id, len(toks) AS dl FROM d),
    bm AS (
        SELECT tf.doc_id,
               SUM(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
               ) AS score
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
        GROUP BY tf.doc_id),
    bm_rank AS (
        SELECT doc_id, rnk FROM (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC,
                                              doc_id) AS rnk
            FROM bm) WHERE rnk <= {_RRF_TOPN}),
    dens AS (
        SELECT tf.doc_id, SUM(tf.tf) / CAST(dl.dl AS DOUBLE) AS score
        FROM tf JOIN dl USING (doc_id) GROUP BY tf.doc_id, dl.dl),
    dens_rank AS (
        SELECT doc_id, rnk FROM (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(score, 9) DESC,
                                              doc_id) AS rnk
            FROM dens) WHERE rnk <= {_RRF_TOPN}),
    fused AS (
        SELECT COALESCE(b.doc_id, t.doc_id) AS doc_id,
               b.rnk AS rank_bm25, t.rnk AS rank_density,
               COALESCE(1.0 / ({_RRF_C} + b.rnk), 0.0)
                   + COALESCE(1.0 / ({_RRF_C} + t.rnk), 0.0) AS rrf
        FROM bm_rank b FULL OUTER JOIN dens_rank t ON b.doc_id = t.doc_id)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(rrf, 9) DESC, doc_id) AS BIGINT)
               AS rank,
           doc_id, ROUND(rrf, 9) AS rrf_score,
           CAST(rank_bm25 AS BIGINT) AS rank_bm25,
           CAST(rank_density AS BIGINT) AS rank_density
    FROM fused
    QUALIFY rank <= 10
    ORDER BY rank
    """


@register(
    "q333_reciprocal_rank_fusion",
    sql=_rrf_oracle(),
    doc=f"Reciprocal-rank fusion (RRF, c={_RRF_C}) of two retrieval "
    "rankings for one query -- BM25 (q191's scorer) and query-term "
    "density (matched-term mass / doc length): the standard hybrid-"
    "search combiner (it needs no score calibration, only ranks, which "
    "is why RAG stacks fuse lexical+dense exactly this way).  Each "
    f"ranking contributes 1/({_RRF_C}+rank) for its top-{_RRF_TOPN}; "
    "docs appearing in only one list still fuse (full outer join, "
    "missing side contributes 0).  Ranks come from round-6/round-9 "
    "scores with doc_id tie-breaks and the fused score re-rounds at 9 "
    "before the final ranking (rank-before-round discipline at every "
    "stage).  Plan: both rankings share the single filtered-postings tf "
    "agg (the explode is predicate-filtered before any shuffle, q191's "
    "shape); the fusion join and final top-10 run on two "
    f"{_RRF_TOPN}-row frames.",
)
def q333_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .wave7 import _BM25_B, _BM25_K1

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    stats = d.agg(F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl"))
    tf = (
        d.select("doc_id", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*_RRF_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    tf = tf.localCheckpoint(eager=True)  # consumed by df, bm25, and density
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    term_score = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    bm = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    wb = Window.orderBy(F.round("score", 6).desc(), "doc_id")
    bm_rank = (
        bm.select("doc_id", F.row_number().over(wb).alias("rnk"))
        .filter(F.col("rnk") <= _RRF_TOPN)
    )
    dens = (
        tf.join(dl, "doc_id")
        .groupBy("doc_id", "dl")
        .agg(F.sum("tf").alias("m"))
        .select("doc_id", (F.col("m") / F.col("dl").cast("double")).alias("score"))
    )
    wd = Window.orderBy(F.round("score", 9).desc(), "doc_id")
    dens_rank = (
        dens.select("doc_id", F.row_number().over(wd).alias("rnk"))
        .filter(F.col("rnk") <= _RRF_TOPN)
    )
    b = bm_rank.select("doc_id", F.col("rnk").alias("rank_bm25"))
    t = dens_rank.select("doc_id", F.col("rnk").alias("rank_density"))
    fused = b.join(t, "doc_id", "full_outer").select(
        "doc_id",
        "rank_bm25",
        "rank_density",
        (
            F.coalesce(1.0 / (_RRF_C + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_C + F.col("rank_density")), F.lit(0.0))
        ).alias("rrf"),
    )
    wf = Window.orderBy(F.round("rrf", 9).desc(), "doc_id")
    return (
        fused.select(
            F.row_number().over(wf).cast("bigint").alias("rank"),
            "doc_id",
            F.round("rrf", 9).alias("rrf_score"),
            F.col("rank_bm25").cast("bigint").alias("rank_bm25"),
            F.col("rank_density").cast("bigint").alias("rank_density"),
        )
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q334: Brown-Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------


@register(
    "q334_brown_forsythe",
    sql="""
    WITH med AS (
        SELECT event_type, quantile_disc(value, 0.5) AS med
        FROM events GROUP BY event_type),
    z AS (
        SELECT e.event_type, abs(e.value - m.med) AS z
        FROM events e JOIN med m ON e.event_type = m.event_type),
    g AS (
        SELECT event_type, COUNT(*) AS n, AVG(z) AS zbar, SUM(z * z) AS zz
        FROM z GROUP BY event_type),
    t AS (
        SELECT SUM(n) AS nn, COUNT(*) AS k,
               SUM(n * zbar) / SUM(n) AS zg,
               SUM(zz - n * zbar * zbar) AS ssw
        FROM g)
    SELECT CAST(t.nn AS BIGINT) AS n, CAST(t.k AS BIGINT) AS k,
           ROUND((SELECT SUM(n * (zbar - t.zg) * (zbar - t.zg)) FROM g)
                 / (t.k - 1) / (t.ssw / (t.nn - t.k)), 6) AS f_stat
    FROM t
    """,
    doc="Brown-Forsythe variance-homogeneity test across event_type "
    "groups: one-way ANOVA F on |value - group MEDIAN| -- the robust "
    "Levene variant, the pre-check q252's ANOVA formally assumes and the "
    "standard guard before pooling variances (q325's pooled SD).  Group "
    "medians are percentile_disc (an actual stored double, engine-exact "
    "per the q174 contract -- no interpolation float to round); the F "
    "combines per-group (n, mean, sum-of-squares) sufficient statistics "
    "and rounds at 6.  Plan: one sort-based median per group (Spark "
    "percentile_disc aggregate), one |z| scan with the 5-row median "
    "frame broadcast, one hash-agg to k rows, single-row combine -- two "
    "scans total, no wide shuffle.",
)
def q334_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    z = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("z").alias("zbar"),
        F.sum(F.col("z") * F.col("z")).alias("zz"),
    )
    t = g.agg(
        F.sum("n").alias("nn"),
        F.count("*").alias("k"),
        (F.sum(F.col("n") * F.col("zbar")) / F.sum("n")).alias("zg"),
        F.sum(F.col("zz") - F.col("n") * F.col("zbar") * F.col("zbar")).alias("ssw"),
    )
    ssb = g.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.col("n") * (F.col("zbar") - F.col("zg")) * (F.col("zbar") - F.col("zg"))
        ).alias("ssb"),
        F.max("nn").alias("nn"),
        F.max("k").alias("k"),
        F.max("ssw").alias("ssw"),
    )
    return ssb.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# q335: Kruskal-Wallis H test (tie-corrected)
# ---------------------------------------------------------------------------


@register(
    "q335_kruskal_wallis",
    sql="""
    WITH g AS (
        SELECT n_chars AS v, lang, COUNT(*) AS c
        FROM documents GROUP BY n_chars, lang),
    m AS (SELECT v, SUM(c) AS m FROM g GROUP BY v),
    r AS (
        SELECT v, m,
               SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS before
        FROM m),
    rl AS (
        SELECT g.lang, SUM(g.c) AS n_l,
               SUM(g.c * (r.before + (r.m + 1) / 2.0)) AS r_l
        FROM g JOIN r ON g.v = r.v GROUP BY g.lang),
    tot AS (
        SELECT SUM(n_l) AS nn, COUNT(*) AS k,
               SUM(r_l * r_l / n_l) AS s
        FROM rl),
    ties AS (
        SELECT SUM(CAST(m AS DOUBLE) * m * m - m) AS tsum FROM m)
    SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           ROUND(12.0 / (nn * (nn + 1.0)) * s - 3.0 * (nn + 1.0), 6) + 0.0 AS h,
           ROUND((12.0 / (nn * (nn + 1.0)) * s - 3.0 * (nn + 1.0))
                 / (1.0 - tsum / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6) + 0.0
               AS h_tie_corrected
    FROM tot, ties
    """,
    doc="Kruskal-Wallis H test of document length (n_chars) across "
    "languages, tie-corrected: the k-group generalization of q251's "
    "Mann-Whitney (same distinct-value average-rank spelling -- ranks "
    "never materialize per row; they come from the cumulative window "
    "over the DISTINCT value frame, which is bounded by the value domain "
    "rather than the corpus).  H = 12/(N(N+1)) * sum R_l^2/n_l - 3(N+1), "
    "divided by the tie factor 1 - sum(t^3-t)/(N^3-N).  Rank sums are "
    "exact rationals (integer counts times k+1/2 halves); the two H "
    "floats round at 6.  Plan: one (value, lang) hash-agg, a window over "
    "the distinct-value frame, two bounded rollups -- one corpus scan.",
)
def q335_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.col("n_chars").alias("v"), "lang").agg(F.count("*").alias("c"))
    g = g.localCheckpoint(eager=True)  # consumed by the value frame and rank join
    m = g.groupBy("v").agg(F.sum("c").alias("m"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = m.select("v", "m", (F.sum("m").over(w) - F.col("m")).alias("before"))
    rl = (
        g.join(r, "v")
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_l"),
            F.sum(F.col("c") * (F.col("before") + (F.col("m") + 1) / 2.0)).alias("r_l"),
        )
    )
    tot = rl.agg(
        F.sum("n_l").alias("nn"),
        F.count("*").alias("k"),
        F.sum(F.col("r_l") * F.col("r_l") / F.col("n_l")).alias("s"),
    )
    ties = m.agg(
        F.sum(F.col("m").cast("double") * F.col("m") * F.col("m") - F.col("m")).alias(
            "tsum"
        )
    )
    h = 12.0 / (F.col("nn") * (F.col("nn") + 1.0)) * F.col("s") - 3.0 * (
        F.col("nn") + 1.0
    )
    # + 0.0: on a degenerate corpus (all values tied) H floats at the zero
    # boundary and could round to -0.0 in one engine only.
    return tot.crossJoin(F.broadcast(ties)).select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        (F.round(h, 6) + F.lit(0.0)).alias("h"),
        (
            F.round(
                h
                / (
                    1.0
                    - F.col("tsum")
                    / (
                        F.col("nn").cast("double") * F.col("nn") * F.col("nn")
                        - F.col("nn")
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("h_tie_corrected"),
    )


# ---------------------------------------------------------------------------
# q336: MMR (maximal marginal relevance) diversity re-ranking
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CANDS = 20
_MMR_K = 5
_MMR_QUERY_ID = 0


def _mmr_oracle() -> str:
    lam, om = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 12)
    sql = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
    valid AS (SELECT * FROM e WHERE nrm > 0),
    qv AS (SELECT v, nrm FROM valid WHERE vec_id = {_MMR_QUERY_ID}),
    rel AS (
        SELECT a.vec_id, ROUND(list_dot_product(a.v, qv.v) / (a.nrm * qv.nrm), 9) AS rel
        FROM valid a, qv WHERE a.vec_id <> {_MMR_QUERY_ID}),
    cand AS MATERIALIZED (
        SELECT c.vec_id, c.rel, v.v, v.nrm FROM (
            SELECT vec_id, rel,
                   ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rn FROM rel) c
        JOIN valid v USING (vec_id) WHERE rn <= {_MMR_CANDS}),
    sims AS MATERIALIZED (
        SELECT a.vec_id AS i, b.vec_id AS j,
               ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS s
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
    pick1 AS (
        SELECT vec_id, rel, ROUND({lam} * rel - {om} * 0.0, 9) AS score
        FROM cand ORDER BY score DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id, rel, score, 1 AS rnk FROM pick1)"""
    prev = "sel1"
    for r in range(2, _MMR_K + 1):
        sql += f""",
    pick{r} AS (
        SELECT c.vec_id, c.rel,
               ROUND({lam} * c.rel - {om} * COALESCE(MAX(s.s), 0.0), 9) AS score
        FROM cand c
        LEFT JOIN sims s ON s.i = c.vec_id
                         AND s.j IN (SELECT vec_id FROM {prev})
        WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1),
    sel{r} AS (SELECT * FROM {prev}
               UNION ALL SELECT vec_id, rel, score, {r} FROM pick{r})"""
        prev = f"sel{r}"
    sql += f"""
    SELECT CAST(rnk AS BIGINT) AS rank, vec_id, rel AS relevance,
           score AS mmr_score
    FROM {prev} ORDER BY rank
    """
    return sql


@register(
    "q336_mmr_rerank",
    sql=_mmr_oracle(),
    doc=f"MMR diversity re-ranking (lambda={_MMR_LAMBDA}): from the top-"
    f"{_MMR_CANDS} cosine candidates for query vector {_MMR_QUERY_ID}, "
    f"greedily select {_MMR_K} maximizing lambda*relevance - (1-lambda)*"
    "max-similarity-to-already-selected -- the standard RAG-context "
    "diversifier (pure top-k feeds the LLM near-duplicate passages; MMR "
    "trades a little relevance for coverage).  Every cosine and every "
    "MMR score rounds at 9 with vec_id tie-breaks before each argmax, "
    "so the greedy trajectory is engine-exact; the oracle unrolls the "
    f"{_MMR_K} rounds as CTEs over the same MATERIALIZED candidate and "
    "pair-similarity frames.  Plan: candidate generation is the q54 "
    "broadcast top-k; after that every frame is <= "
    f"{_MMR_CANDS}x{_MMR_CANDS} rows and each round is one argmax "
    "collect over it (bounded driver state, the q303 argmax discipline) "
    "-- at 100 TB the candidate stage is the ANN pipeline and the "
    "re-rank cost stays constant per query.",
)
def q336_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    ve = e.select("vec_id", "v", nrm.alias("nrm")).filter(F.col("nrm") > 0)
    ve = ve.localCheckpoint(eager=True)
    qv = ve.filter(F.col("vec_id") == _MMR_QUERY_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    rel = (
        ve.filter(F.col("vec_id") != _MMR_QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.round(dot / (F.col("nrm") * F.col("qn")), 9).alias("rel"),
        )
    )
    wc = Window.orderBy(F.col("rel").desc(), "vec_id")
    cand = (
        rel.select("vec_id", "rel", "v", "nrm", F.row_number().over(wc).alias("rn"))
        .filter(F.col("rn") <= _MMR_CANDS)
        .select("vec_id", "rel", "v", "nrm")
        .localCheckpoint(eager=True)  # consumed by sims and every greedy round
    )
    a = cand.select(
        F.col("vec_id").alias("i"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = cand.select(
        F.col("vec_id").alias("j"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    pdot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("i") != F.col("j"))
        .select("i", "j", F.round(pdot / (F.col("na") * F.col("nb")), 9).alias("s"))
        .localCheckpoint(eager=True)
    )
    lam, om = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 12)
    selected: list[tuple[int, float, float, int]] = []
    sel_ids: list[int] = []
    for rnk in range(1, _MMR_K + 1):
        pool = cand.filter(~F.col("vec_id").isin(sel_ids) if sel_ids else F.lit(True))
        if sel_ids:
            ms = (
                sims.filter(F.col("j").isin(sel_ids))
                .groupBy("i")
                .agg(F.max("s").alias("ms"))
                .withColumnRenamed("i", "vec_id")
            )
            scored = pool.join(ms, "vec_id", "left").select(
                "vec_id",
                "rel",
                F.round(
                    lam * F.col("rel") - om * F.coalesce("ms", F.lit(0.0)), 9
                ).alias("score"),
            )
        else:
            scored = pool.select(
                "vec_id", "rel", F.round(lam * F.col("rel") - om * 0.0, 9).alias("score")
            )
        # bounded argmax collect over the <= _MMR_CANDS-row frame (the q303
        # argmax discipline: driver state is one row per greedy round)
        top = scored.orderBy(F.col("score").desc(), "vec_id").limit(1).collect()[0]
        selected.append((rnk, top["vec_id"], top["rel"], top["score"]))
        sel_ids.append(top["vec_id"])
    return spark.createDataFrame(
        [(r, v, rel_, sc) for r, v, rel_, sc in selected],
        "rank long, vec_id long, relevance double, mmr_score double",
    )
