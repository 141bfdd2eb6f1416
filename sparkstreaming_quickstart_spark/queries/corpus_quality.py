"""Corpus-quality operators (round 2, wave 4): bigram-LM cross-entropy
scoring, Count-Min-sketch heavy hitters, and corpus-level duplicate-n-gram
detection.

These are the remaining text-quality components of a training-data pipeline
(SURVEY.md 2.B extensions): q155 is the cheap stand-in for model-based
perplexity filtering, q157 is the bounded-memory frequency sketch for
unbounded vocabularies, and q158 is the corpus-wide boilerplate detector
(documents dominated by n-grams that repeat across documents).  Everything
is JVM expressions + hash aggregation -- no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import md5_mod
from ..sources.catalog import load_table, spread
from . import register


@register(
    "q155_doc_perplexity",
    sql="""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
    bw AS (
        SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(t) - 1),
                                           i -> t[i] || ' ' || t[i + 1])) AS bigram
              FROM d)),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bw GROUP BY 1),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bw GROUP BY 1)
    SELECT bw.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(ln(CAST(c1.c1 AS DOUBLE) / c2.c2)), 6) AS cross_entropy
    FROM bw JOIN c2 USING (bigram) JOIN c1 USING (w1)
    GROUP BY bw.doc_id
    ORDER BY bw.doc_id
    """,
    doc="Per-document bigram-LM cross-entropy (mean -ln P(w2|w1) under the "
    "corpus MLE bigram model) -- the cheap proxy for perplexity-based "
    "quality filtering.  Two vocabulary-bounded hash-aggs build the LM; "
    "scoring is a hash join keyed by bigram, so the corpus side shuffles "
    "once on a key whose cardinality is vocab^2-bounded, never O(corpus). "
    "No smoothing needed: every scored bigram is in the counts by "
    "construction.",
)
def q155_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = F.split("text", " ")
    docs = d.filter(F.size(t) >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 2)),
            )
        ).alias("bigram"),
    )
    bw = docs.withColumn("w1", F.split("bigram", " ")[0])
    c2 = bw.groupBy("bigram").agg(F.count("*").alias("c2"))
    c1 = bw.groupBy("w1").agg(F.count("*").alias("c1"))
    return (
        bw.join(c2, "bigram")
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c1").cast("double") / F.col("c2"))), 6).alias(
                "cross_entropy"
            ),
        )
        .orderBy("doc_id")
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 512


def _cms_bucket(token, d: int):
    """Row d's CMS bucket for a token: lower-64 md5 of 'd:token' mod width.

    Two's-complement note: Spark's md5_lower64 is a signed long and DuckDB's
    md5_number_lower is unsigned, but 2^64 % width == 0 for any power-of-two
    width, so pmod(signed, width) == unsigned % width exactly.
    """
    return md5_mod(F.concat(F.lit(f"{d}:"), token), _CMS_WIDTH)


@register(
    "q157_countmin_heavy_hitters",
    sql=f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    counters AS (
        SELECT d, CAST(md5_number_lower(d || ':' || token) % {_CMS_WIDTH} AS BIGINT) AS bucket,
               COUNT(*) AS cnt
        FROM toks, ds GROUP BY 1, 2),
    exact AS (
        SELECT token, COUNT(*) AS exact_n FROM toks GROUP BY 1
        ORDER BY exact_n DESC, token LIMIT 20)
    SELECT e.token, e.exact_n, MIN(c.cnt) AS cms_est,
           MIN(c.cnt) - e.exact_n AS overcount
    FROM exact e
    JOIN ds ON true
    JOIN counters c
      ON c.d = ds.d
     AND c.bucket = CAST(md5_number_lower(ds.d || ':' || e.token) % {_CMS_WIDTH} AS BIGINT)
    GROUP BY e.token, e.exact_n
    ORDER BY e.exact_n DESC, e.token
    """,
    doc="Count-Min sketch (depth 4 x width 512, md5-derived row hashes) over "
    "the token stream, evaluated against the exact top-20 heavy hitters.  "
    "The sketch is a fixed 4x512 counter grid built in ONE hash-agg whose "
    "key domain is 2048 regardless of vocabulary size -- the "
    "bounded-memory path when per-token exact counts no longer fit; "
    "estimates are provably >= exact (overcount column).  Counter "
    "construction is commutative (bit-order independent), so the sketch "
    "is deterministic under any partitioning.",
)
def q157_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash the VOCABULARY, not the token stream: counting per token first and
    # weighting the counter grid by count produces the identical sketch (the
    # grid is a sum over occurrences either way) but moves the 4x md5 work
    # from O(occurrences) to O(distinct tokens) -- measured 15s -> ~2s at
    # sf0.1, and at 100 TB the difference is the corpus size vs the
    # vocabulary.  This is the map-side-combine discipline applied to a
    # sketch build; the exact top-20 reads the same count table (its shuffle
    # is shared via Spark's exchange reuse).
    d = load_table(spark, sf_dir, "documents")
    toks = spread(d.select(F.explode(F.split("text", " ")).alias("token")))
    # Cached: the count table feeds both the counter grid and the exact
    # top-20, and a non-materialized aggregate is re-evaluated per consumer
    # (the exchange-reuse rule does not survive the differing projections --
    # measured 2x the explode cost without the cache).  Vocabulary-sized.
    tok_counts = toks.groupBy("token").agg(F.count("*").alias("exact_n")).cache()
    pairs = tok_counts.select(
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dd).alias("d"), _cms_bucket(F.col("token"), dd).alias("bucket")
                    )
                    for dd in range(_CMS_DEPTH)
                ]
            )
        ).alias("s"),
    ).select("s.d", "s.bucket", "exact_n")
    counters = pairs.groupBy("d", "bucket").agg(F.sum("exact_n").alias("cnt"))
    exact = tok_counts.orderBy(F.col("exact_n").desc(), F.col("token")).limit(20)
    cand = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dd).alias("d"), _cms_bucket(F.col("token"), dd).alias("bucket")
                    )
                    for dd in range(_CMS_DEPTH)
                ]
            )
        ).alias("s"),
    ).select("token", "exact_n", "s.d", "s.bucket")
    return (
        cand.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), F.col("token"))
    )


@register(
    "q158_corpus_dup_ngrams",
    sql="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
                   list_transform(generate_series(1, greatest(len(t) - 4, 1)),
                                  i -> array_to_string(t[i:i+4], ' ')))) AS shingle
        FROM d),
    freq AS (SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY 1)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN freq.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           ROUND(SUM(CASE WHEN freq.n_docs >= 2 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
    FROM sh JOIN freq USING (shingle)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    doc="Corpus-level duplicate-5-gram detection: the fraction of each "
    "document's distinct 5-grams that also occur in at least one other "
    "document -- the standard boilerplate/template filter (and the "
    "aggregate twin of substring-level dedup).  One shingle-keyed "
    "hash-agg (vocabulary-bounded) plus one join back; at 100 TB the "
    "skew risk is ubiquitous boilerplate shingles, which is exactly what "
    "the n_docs counter caps -- a production run would drop shingles "
    "above a doc-frequency ceiling before the join (same guard as the "
    "LSH bucket_cap).",
)
def q158_corpus_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles

    d = spread(load_table(spark, sf_dir, "documents"))
    sh = d.select("doc_id", F.explode(word_shingles("text", 5)).alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    dup = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(dup).alias("n_dup"),
            F.round(F.sum(dup) / F.count("*").cast("double"), 6).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )
