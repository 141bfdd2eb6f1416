"""Wave-31 operator (round 8, final): mergeable MinHash set sketches with
an exact calibration twin -- the sketch-union story (signatures combine by
elementwise min) plus a measured answer to 'how wrong is the estimate'.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; this is a charter extension in the SURVEY.md
section-2.B dedup/sketch family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

_MH_K = 16
_MH_SALT = "mhu1|"


@register(
    "q351_minhash_union_estimate",
    sql=f"""
    WITH vocab AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE length(text) > 0),
    hashed AS (
        SELECT source, h.i,
               MIN(CAST('0x' || substr(md5('{_MH_SALT}' || h.i || '|' || token), 1, 15)
                   AS BIGINT)) AS mh
        FROM vocab, (SELECT unnest(generate_series(0, {_MH_K - 1})) AS i) h
        GROUP BY source, h.i),
    sz AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
    est AS (
        SELECT a.source AS s1, b.source AS s2,
               ROUND(count_if(a.mh = b.mh) / {_MH_K}.0, 6) AS jaccard_est
        FROM hashed a JOIN hashed b ON a.i = b.i AND a.source < b.source
        GROUP BY a.source, b.source),
    ex AS (
        SELECT a.source AS s1, b.source AS s2, COUNT(*) AS common
        FROM vocab a JOIN vocab b ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source)
    SELECT e.s1, e.s2,
           ROUND(COALESCE(x.common, 0)
                 / CAST(z1.n + z2.n - COALESCE(x.common, 0) AS DOUBLE), 6)
               AS jaccard_exact,
           e.jaccard_est,
           ROUND(abs(e.jaccard_est
                 - COALESCE(x.common, 0)
                   / CAST(z1.n + z2.n - COALESCE(x.common, 0) AS DOUBLE)), 6)
               AS abs_error
    FROM est e
    LEFT JOIN ex x ON e.s1 = x.s1 AND e.s2 = x.s2
    JOIN sz z1 ON e.s1 = z1.source JOIN sz z2 ON e.s2 = z2.source
    ORDER BY e.s1, e.s2
    """,
    doc=f"Mergeable MinHash set sketches with an exact calibration twin: "
    f"each source's vocabulary compresses to a {_MH_K}-component md5-"
    "MinHash signature (component i = min over tokens of a salted 60-bit "
    "md5 prefix -- md5, not xxhash, precisely so the ORACLE replays the "
    "identical hash), pairwise Jaccard is estimated as the fraction of "
    "matching components, and the exact vocabulary Jaccard sits beside "
    "it with the absolute error -- the calibration table that justifies "
    "the q52 LSH machinery's accuracy budget.  The 100 TB property being "
    "demonstrated is MERGEABILITY: a signature is an elementwise MIN, so "
    "shard signatures combine associatively (the same law as q340's "
    "reservoir and q348's moments) and set similarity across a corpus "
    "costs |sources| x k longs of state.  All comparisons are exact "
    "integer equality on hash values; the only floats are the final "
    "ratios, rounded at 6.  Plan: one vocab-bounded distinct, a "
    f"{_MH_K}-way generate over THAT bounded frame (never the corpus), "
    "per-(source, i) min-agg, and k-row-per-source joins.",
)
def q351_minhash_union_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)  # consumed by the hash pass and both twins
    )
    hashed = (
        vocab.select(
            "source",
            "token",
            F.explode(F.sequence(F.lit(0), F.lit(_MH_K - 1))).alias("i"),
        )
        .select(
            "source",
            "i",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(_MH_SALT),
                            F.col("i"),
                            F.lit("|"),
                            F.col("token"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("source", "i")
        .agg(F.min("h").alias("mh"))
    )
    sz = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a = hashed.select(F.col("source").alias("s1"), "i", F.col("mh").alias("m1"))
    b = hashed.select(F.col("source").alias("s2"), "i", F.col("mh").alias("m2"))
    est = (
        a.join(b, "i")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.round(
                F.count_if(F.col("m1") == F.col("m2")) / float(_MH_K), 6
            ).alias("jaccard_est")
        )
    )
    va = vocab.select(F.col("source").alias("s1"), "token")
    vb = vocab.select(F.col("source").alias("s2"), "token")
    ex = (
        va.join(vb, "token")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("common"))
    )
    z1 = sz.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    z2 = sz.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    cm = F.coalesce("common", F.lit(0))
    exact = cm / (F.col("n1") + F.col("n2") - cm).cast("double")
    return (
        est.join(F.broadcast(ex), ["s1", "s2"], "left")
        .join(F.broadcast(z1), "s1")
        .join(F.broadcast(z2), "s2")
        .select(
            "s1",
            "s2",
            F.round(exact, 6).alias("jaccard_exact"),
            "jaccard_est",
            F.round(F.abs(F.col("jaccard_est") - exact), 6).alias("abs_error"),
        )
        .orderBy("s1", "s2")
    )
