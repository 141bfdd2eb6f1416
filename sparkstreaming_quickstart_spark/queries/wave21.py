"""Wave-21 operators (round 7, continued): the capacity/meta reports a
100 TB corpus org runs around its pipeline -- context-length truncation
loss (how many training tokens each context budget discards), the
inter-source semantic-redundancy matrix (centroid cosines that guide
mixture weights), the near-dup source contamination matrix (WHO copies
from WHOM, the source-granular view of q52's pair stream), and the
embedding-coverage audit (which sources are missing vectors before any
ANN/semantic stage runs).

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..sources.catalog import load_table, spread
from . import register

# ---------------------------------------------------------------------------
# q313: context-length truncation-loss report
# ---------------------------------------------------------------------------

_TRUNCATION_ORACLE = """
    WITH d AS (SELECT len(string_split(text, ' ')) AS tok
               FROM documents WHERE length(text) > 0),
    g AS (SELECT tok, ctx FROM d, unnest([128, 512, 2048]) AS u(ctx))
    SELECT CAST(ctx AS INT) AS ctx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN tok > ctx THEN 1 ELSE 0 END) AS BIGINT)
               AS n_truncated,
           CAST(SUM(LEAST(tok, ctx)) AS BIGINT) AS kept_tokens,
           (CAST(SUM(tok) AS BIGINT) - CAST(SUM(LEAST(tok, ctx)) AS BIGINT))
               * 1000000 // CAST(SUM(tok) AS BIGINT) AS loss_ppm
    FROM g GROUP BY ctx ORDER BY ctx
"""


@register(
    "q313_truncation_loss",
    sql=_TRUNCATION_ORACLE,
    doc="Context-length truncation loss: for each candidate context budget "
    "(128/512/2048 tokens), how many documents overflow it and what share "
    "of corpus tokens a hard truncation discards -- the capacity-planning "
    "twin of q145's packing (packing wastes bin tails; truncation wastes "
    "document tails; this report prices the second).  Loss is exact "
    "integer ppm.  "
    "Plan: one narrow projection, one 3-way literal-array explode (no "
    "join), one 3-group hash-agg -- a single map-side-combinable pass; "
    "at 100 TB this is a pure scan-bound report.",
)
def q313_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # README rule 8: `explode(array(128,512,2048))` NEXT TO token_count would
    # collapse into one projection with the generate and re-tokenize the
    # corpus once per exploded ctx row (verified in the physical plan).  A
    # 3-row broadcast dimension keeps size(split(text)) BELOW the join, so
    # the corpus tokenizes exactly once.
    ctxs = spark.createDataFrame([(128,), (512,), (2048,)], "ctx int")
    g = d.select(token_count("text").alias("tok")).crossJoin(F.broadcast(ctxs))
    kept = F.sum(F.least(F.col("tok"), F.col("ctx"))).cast("bigint")
    return (
        g.groupBy("ctx")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("tok") > F.col("ctx"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_truncated"),
            kept.alias("kept_tokens"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
        )
        .select(
            F.col("ctx").cast("int").alias("ctx"),
            "n_docs",
            "n_truncated",
            "kept_tokens",
            F.expr("(total_tokens - kept_tokens) * 1000000 div total_tokens").alias(
                "loss_ppm"
            ),
        )
        .orderBy("ctx")
    )


# ---------------------------------------------------------------------------
# q314: inter-source semantic-redundancy matrix (centroid cosines)
# ---------------------------------------------------------------------------

_SOURCE_SEMANTIC_ORACLE = """
    WITH e AS (
        SELECT d.source, generate_subscripts(em.embedding, 1) - 1 AS pos,
               CAST(unnest(em.embedding) AS DOUBLE) AS x
        FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
    cent AS MATERIALIZED (
        SELECT source, pos, SUM(x) / COUNT(*) AS m FROM e GROUP BY 1, 2)
    SELECT a.source AS s1, b.source AS s2,
           ROUND(SUM(a.m * b.m)
                 / SQRT(SUM(a.m * a.m) * SUM(b.m * b.m)), 6) + 0.0 AS cosine
    FROM cent a JOIN cent b ON a.pos = b.pos AND a.source <= b.source
    GROUP BY 1, 2 ORDER BY s1, s2
"""


@register(
    "q314_source_semantic_matrix",
    sql=_SOURCE_SEMANTIC_ORACLE,
    doc="Inter-source semantic-redundancy matrix: per-source embedding "
    "centroids, then pairwise centroid cosine (upper triangle incl. "
    "diagonal = 1) -- two sources with near-identical centroids contribute "
    "redundant coverage, the signal that shifts mixture weight toward the "
    "distinct ones (the aggregate-level complement of q186's per-pair "
    "SemDeDup).  ROUND(,6)+0.0 is the established reduce-order tolerance "
    "on float sums (q295 convention).  "
    "Plan: the corpus reduces to |sources| x d centroid rows in ONE "
    "map-side-combinable hash-agg on (source, dim); the pair join runs on "
    "that dimension-sized frame -- at 100 TB nothing but centroids moves.",
)
def q314_source_semantic_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = em.join(d, em["vec_id"] == d["doc_id"]).select(
        "source", F.posexplode(F.col("embedding")).alias("pos", "x")
    )
    cent = (
        e.groupBy("source", "pos")
        .agg((F.sum(F.col("x").cast("double")) / F.count("*")).alias("m"))
    )
    # Rule 9: both self-join sides consume cent; without eager
    # materialization the corpus-sized join+explode+agg runs once per side
    # (plan audit showed scans:4).  The frame is |sources| x d rows.
    cent = cent.localCheckpoint(eager=True)
    a = cent.alias("a")
    b = cent.alias("b")
    cos = F.sum(F.col("a.m") * F.col("b.m")) / F.sqrt(
        F.sum(F.col("a.m") * F.col("a.m")) * F.sum(F.col("b.m") * F.col("b.m"))
    )
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos")) & (F.col("a.source") <= F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
        .agg((F.round(cos, 6) + F.lit(0.0)).alias("cosine"))
        .orderBy("s1", "s2")
    )


# ---------------------------------------------------------------------------
# q315: near-dup source contamination matrix
# ---------------------------------------------------------------------------


def _source_matrix_oracle() -> str:
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    return f"""
    WITH pairs AS MATERIALIZED ({pairs}),
    src AS (SELECT doc_id, source FROM documents)
    SELECT LEAST(a.source, b.source) AS s1,
           GREATEST(a.source, b.source) AS s2,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(MAX(jaccard), 6) AS max_jaccard
    FROM pairs JOIN src a ON pairs.d1 = a.doc_id
               JOIN src b ON pairs.d2 = b.doc_id
    GROUP BY 1, 2 ORDER BY s1, s2
"""


@register(
    "q315_neardup_source_matrix",
    sql=_source_matrix_oracle(),
    doc="Near-dup source contamination matrix: q52's MinHash-LSH pair "
    "stream aggregated to (source, source) cells -- which sources copy "
    "from which, the report that turns per-pair dedup output into a "
    "mixture-level decision (drop the mirrored source, not a million "
    "individual docs).  Source pairs are normalized least/greatest so the "
    "matrix is upper-triangular regardless of pair orientation.  The LSH "
    "candidate set equals the exact formulation at threshold 0.7 (q52's "
    "banding-knee argument), so the exact-Jaccard oracle aggregates "
    "identically.  "
    "Plan: the q52 pipeline (bucketed, capped, verify-on-candidates) plus "
    "two broadcast source lookups and a |sources|^2-bounded hash-agg.",
)
def q315_neardup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7)
    src = d.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("d1"), F.col("source").alias("src1"))
    b = src.select(F.col("doc_id").alias("d2"), F.col("source").alias("src2"))
    return (
        pairs.join(F.broadcast(a), "d1")
        .join(F.broadcast(b), "d2")
        .groupBy(
            F.least("src1", "src2").alias("s1"),
            F.greatest("src1", "src2").alias("s2"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
        .orderBy("s1", "s2")
    )


# ---------------------------------------------------------------------------
# q316: embedding-coverage audit
# ---------------------------------------------------------------------------

_COVERAGE_ORACLE = """
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_embedded,
           CAST(COUNT(e.vec_id) AS BIGINT) * 1000000
               // CAST(COUNT(*) AS BIGINT) AS coverage_ppm
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.source ORDER BY d.source
"""


@register(
    "q316_embedding_coverage",
    sql=_COVERAGE_ORACLE,
    doc="Embedding-coverage audit: per source, how many documents have a "
    "vector -- the data-completeness gate every ANN/semantic stage "
    "(q54/q65/q186/q314) silently depends on; a source at 40% coverage "
    "makes its semantic-dedup results unrepresentative, and this report "
    "is how that's caught BEFORE the downstream stage runs.  Coverage is "
    "exact integer ppm.  "
    "Plan: one left join on the id key (sort-merge or broadcast per AQE "
    "stats) and a |sources|-group hash-agg; the embedding side projects "
    "to the key column only.",
)
def q316_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "source")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return (
        d.join(e, d["doc_id"] == e["vec_id"], "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("vec_id").cast("bigint").alias("n_embedded"),
        )
        .select(
            "source",
            "n_docs",
            "n_embedded",
            F.expr("n_embedded * 1000000 div n_docs").alias("coverage_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q317: Pareto front (skyline) of quality vs length
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
    WITH per_doc AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS tok,
               len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS ppm
        FROM documents WHERE length(text) > 0),
    by_ppm AS (SELECT ppm, MAX(tok) AS max_tok FROM per_doc GROUP BY ppm),
    front_ppm AS (
        SELECT ppm, max_tok,
               COALESCE(MAX(max_tok) OVER (ORDER BY ppm DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) AS better_q_tok
        FROM by_ppm)
    SELECT d.doc_id, CAST(d.ppm AS BIGINT) AS ppm, CAST(d.tok AS BIGINT) AS tok
    FROM per_doc d JOIN front_ppm f ON d.ppm = f.ppm AND d.tok = f.max_tok
    WHERE f.max_tok > f.better_q_tok
    ORDER BY d.doc_id
"""


@register(
    "q317_pareto_front",
    sql=_PARETO_ORACLE,
    doc="Pareto front (skyline) over (quality ppm, token length): the "
    "documents no other document dominates on BOTH axes -- the classic "
    "preference-query operator, here as 'longest document at every "
    "achievable quality level', the set a curation loop inspects when "
    "trading quality against context coverage.  A doc is on the front iff "
    "its tok equals its ppm-group max AND strictly exceeds every max at "
    "higher ppm (running max over the ppm-sorted group frame); ties on "
    "both axes all qualify (none dominates another -- domination requires "
    "one strict axis).  All statistics integer-exact.  "
    "Plan: the corpus reduces to one hash-agg keyed by ppm (domain-bounded "
    "at 1e6+1 values, so the ordered window runs over a vocabulary-sized "
    "frame, NOT the corpus -- no global data window), then one join back "
    "on (ppm, tok).  The naive skyline spelling is an all-pairs anti-join; "
    "this is the 2-D sort-based reduction of it.",
)
def q317_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    from ..functions.text import tokens

    t = tokens("text")
    per_doc = d.select(
        "doc_id",
        F.size(t).cast("bigint").alias("tok"),
        F.size(F.array_distinct(t)).cast("bigint").alias("ndis"),
    ).select("doc_id", "tok", F.expr("ndis * 1000000 div tok").alias("ppm"))
    by_ppm = per_doc.groupBy("ppm").agg(F.max("tok").alias("max_tok"))
    # window over the ppm-aggregated frame only: <= 1e6+1 rows by domain
    w = Window.orderBy(F.col("ppm").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front_ppm = by_ppm.select(
        "ppm",
        "max_tok",
        F.coalesce(F.max("max_tok").over(w), F.lit(-1)).alias("better_q_tok"),
    ).filter(F.col("max_tok") > F.col("better_q_tok"))
    return (
        per_doc.join(
            F.broadcast(front_ppm.select("ppm", F.col("max_tok").alias("tok"))),
            ["ppm", "tok"],
        )
        .select("doc_id", "ppm", "tok")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q318: out-of-vocabulary rate per source (top-K corpus vocabulary)
# ---------------------------------------------------------------------------

_OOV_ORACLE = """
    WITH st AS MATERIALIZED (
        SELECT source, tok, COUNT(*) AS cnt
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE length(text) > 0)
        GROUP BY source, tok),
    vocab AS (
        SELECT tok FROM (SELECT tok, SUM(cnt) AS total FROM st GROUP BY tok)
        ORDER BY total DESC, tok LIMIT 10)
    SELECT st.source,
           CAST(SUM(st.cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN st.cnt ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN st.cnt ELSE 0 END) AS BIGINT)
               * 1000000 // CAST(SUM(st.cnt) AS BIGINT) AS oov_ppm
    FROM st LEFT JOIN vocab v ON st.tok = v.tok
    GROUP BY st.source ORDER BY st.source
"""


@register(
    "q318_oov_rate",
    sql=_OOV_ORACLE,
    doc="Out-of-vocabulary rate per source: token instances falling outside "
    "the corpus-global top-K vocabulary (K=10 against this fixture's "
    "~31-word vocabulary; production uses the tokenizer's actual vocab) -- "
    "the per-source signal that a source's distribution will fragment "
    "into rare tokens under a frequency-trained tokenizer, complementing "
    "q257's chars-per-token fertility.  The vocabulary cut is "
    "deterministic (count desc, token asc) and the rate exact integer "
    "ppm.  "
    "Plan: ONE token explode feeding a (source, token) hash-agg; the "
    "global vocabulary re-aggregates that frame by token (map-side "
    "combinable, vocabulary-bounded) and broadcasts back as a top-K "
    "frame; nothing corpus-sized shuffles twice.",
)
def q318_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = spread(load_table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    st = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    st = st.localCheckpoint(eager=True)  # two consumers: vocab build + oov agg
    vocab = (
        st.groupBy("tok")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.col("total").desc(), "tok")
        .limit(10)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        st.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"),
        )
        .orderBy("source")
    )
