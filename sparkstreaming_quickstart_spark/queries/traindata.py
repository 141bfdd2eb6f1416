"""Third-wave training-data pipeline operators: benchmark decontamination,
within-document repetition scoring, token-budget sharding, co-occurrence PMI.

These are corpus-preparation steps a large-scale LLM data pipeline runs after
dedup/quality filtering (SURVEY.md section 2 charter extensions).  All four
are pure DataFrame compositions with full DuckDB value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens, word_shingles
from ..sources.catalog import load_table
from . import register


@register(
    "q139_decontaminate",
    sql="""
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(toks[i:i+3], ' ')
                    FOR i IN range(1, greatest(len(toks)-3, 1) + 1)])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM g JOIN ev USING (gram)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
    doc="Benchmark decontamination: flag corpus documents sharing any 4-word "
    "shingle with the held-out eval set (doc_id % 97 == 0).  The eval "
    "shingle set is tiny by construction (benchmarks are small), so it "
    "broadcasts and the corpus side never shuffles -- the standard "
    "n-gram-overlap decontamination step run before training.  At 100 TB "
    "the same plan holds: explode corpus shingles, broadcast-join the eval "
    "set, per-doc count; shingles would be xxhash64-ed to 8-byte keys to "
    "shrink the broadcast (see operators/dedup.hashed_shingle_docs).",
)
def q139_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ev_grams = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(word_shingles("text", 4)).alias("gram"))
        .distinct()
    )
    corpus = d.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode(word_shingles("text", 4)).alias("gram")
    )
    # word_shingles is per-doc distinct, so count(*) == distinct shared grams.
    return (
        corpus.join(F.broadcast(ev_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .orderBy("doc_id")
    )


@register(
    "q140_repetition_score",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, toks,
               [array_to_string(toks[i:i+2], ' ')
                FOR i IN range(1, greatest(len(toks)-2, 1) + 1)] AS grams
        FROM t)
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_frac,
           CAST(list_max(list_transform(list_distinct(toks),
                w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
               / len(toks) AS top_tok_frac,
           (1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)) > 0.2
               OR CAST(list_max(list_transform(list_distinct(toks),
                      w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
                  / len(toks) > 0.3 AS repetitive
    FROM g
    ORDER BY doc_id
    """,
    doc="Within-document repetition scoring (Gopher-style quality rule): "
    "duplicate-3-gram fraction and most-frequent-token fraction per doc, "
    "plus the filter flag.  Single projection, no shuffle, no Python -- "
    "the per-doc token loop is a higher-order expression over short arrays "
    "(docs are sentence-scale), so cost is linear in corpus size.",
)
def q140_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Tokens land in their own projection: Spark does no CSE inside lambda
    # bodies, and the gram window + token-mode loop reference them repeatedly.
    t = d.select("doc_id", tokens("text").alias("toks"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("toks") - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
    )
    g = t.select("doc_id", "toks", grams.alias("grams"))
    n_grams = F.size("grams").cast("long")
    n_distinct = F.size(F.array_distinct("grams")).cast("long")
    dup_frac = F.lit(1.0) - n_distinct.cast("double") / n_grams
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda w: F.size(F.filter("toks", lambda x: x == w)),
        )
    )
    top_frac = top_cnt.cast("double") / F.size("toks")
    return g.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        dup_frac.alias("dup_frac"),
        top_frac.alias("top_tok_frac"),
        ((dup_frac > 0.2) | (top_frac > 0.3)).alias("repetitive"),
    ).orderBy("doc_id")


@register(
    "q141_token_shards",
    sql="""
    WITH d AS (
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents),
    c AS (
        SELECT lang, doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM d)
    SELECT lang, CAST(cum // 512 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c
    GROUP BY lang, shard
    ORDER BY lang, shard
    """,
    doc="Token-budget sharding: split each language's corpus (ordered by "
    "doc_id) into contiguous shards of ~512 tokens via an exclusive "
    "running sum -- how corpora are cut into fixed-token-budget training "
    "shards.  Deterministic: shard id is a pure function of the prefix "
    "sum, independent of partitioning.  The per-lang window is the one "
    "scale caveat: a single giant language serializes its prefix sum, so "
    "at 100 TB the partition key becomes (lang, doc_id range bucket) with "
    "per-bucket base offsets computed from bucket totals first (two small "
    "passes); the fixture's lang cardinality makes the direct window the "
    "right local plan.",
)
def q141_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", token_count("text").alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    cum = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    shard = F.floor(cum / F.lit(512)).cast("long")
    return (
        d.withColumn("shard", shard)
        .groupBy("lang", "shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("lang", "shard")
    )


@register(
    "q142_token_pmi",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
    unig AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY w),
    pairs AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c12
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY 1, 2)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           LN(CAST(c12 * n_docs AS DOUBLE) / (u1.cw * u2.cw)) AS pmi
    FROM pairs, n
    JOIN unig u1 ON w1 = u1.w
    JOIN unig u2 ON w2 = u2.w
    ORDER BY c12 DESC, w1, w2
    LIMIT 20
    """,
    doc="Token co-occurrence PMI: document-level pointwise mutual "
    "information over within-doc distinct tokens, top-20 pairs.  The "
    "pair expansion is bounded per doc by its distinct-token count "
    "(sentence-scale here; at corpus scale the standard cap is top-K "
    "tokens per doc before pairing), and the pair aggregation shuffles "
    "vocab^2 keys at most -- vocabulary-sized, not corpus-sized.  "
    "Unigram counts broadcast back onto the pair table.",
)
def q142_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("w"))
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    unig = tok.groupBy("w").agg(F.count("*").alias("cw"))
    a = tok.select("doc_id", F.col("w").alias("w1"))
    b = tok.select("doc_id", F.col("w").alias("w2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    out = (
        pairs.crossJoin(F.broadcast(n))
        .join(F.broadcast(unig.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1")), "w1")
        .join(F.broadcast(unig.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2")), "w2")
        .select(
            "w1",
            "w2",
            "c12",
            F.log((F.col("c12") * F.col("n_docs")).cast("double") / (F.col("c1") * F.col("c2"))).alias(
                "pmi"
            ),
        )
    )
    return out.orderBy(F.desc("c12"), "w1", "w2").limit(20)
