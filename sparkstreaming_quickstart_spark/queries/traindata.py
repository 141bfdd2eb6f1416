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
    # Round-13 notes (measured, guide §1):  (a) an O(len) sorted-run fold
    # for the top-token count was tried and REJECTED -- per-step
    # struct+when+get interpretation made it 5x SLOWER than this
    # size(filter(...)) scan (39.9 vs 8.4 s at sf1); the quadratic-looking
    # HOF wins because its inner loop is a tight primitive-array scan.
    # (b) Each HOF is now aliased once in an inner projection and referenced
    # as an attribute downstream (CollapseProject refuses to inline
    # non-cheap expressions referenced more than once), which de-duplicates
    # the PLAN -- the before-plan carried array_distinct(grams) 3x and the
    # top-token scan 2x -- but measured runtime was ~flat (28.4 -> 26 s at
    # sf1): whole-stage codegen's subexpression elimination was already
    # evaluating each duplicate once per row.  Kept for the explicit plan
    # shape; q140's cost is the intrinsic per-doc token scan.
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda w: F.size(F.filter("toks", lambda x: x == w)),
        )
    )
    m = g.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        top_cnt.alias("top_cnt"),
        F.size("toks").alias("n_toks"),
    )
    dup_frac_c = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams")
    top_frac_c = F.col("top_cnt").cast("double") / F.col("n_toks")
    return m.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        dup_frac_c.alias("dup_frac"),
        top_frac_c.alias("top_tok_frac"),
        ((dup_frac_c > 0.2) | (top_frac_c > 0.3)).alias("repetitive"),
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
    # Round-13 optimization (guide §2.3 narrower types, §2.4): the old
    # spelling self-joined the exploded token stream on doc_id and then
    # hash-aggregated ~n_docs x C(distinct_tokens, 2) STRING pairs --
    # measured at sf1: 48M string-struct rows, 96 s in the pair groupBy
    # alone.  Tokens are now dictionary-encoded to dense ids (row_number
    # over the alphabetically-ordered vocabulary -- vocabulary-sized work,
    # checkpointed), each document's sorted distinct-id array expands its
    # pair triangle declaratively (zero shuffles), and each pair is ONE
    # packed long (id1 << 31 | id2) through the aggregation.  Because ids
    # are assigned in ascending string order, (id1 < id2) == (w1 < w2) and
    # packed-long order == (w1, w2) lexicographic order, so the top-20
    # cut (ORDER BY c12 DESC, w1, w2) is taken on codes BEFORE any join
    # and decoded afterwards -- identical rows, exact integer counts, no
    # hashing anywhere.  Old-vs-new pin: tests/test_wave44.py.
    vids = (
        unig.select(
            "w",
            F.row_number().over(Window.orderBy("w")).cast("long").alias("tid"),
            "cw",
        )
        .localCheckpoint(eager=True)
    )
    enc = (
        tok.join(F.broadcast(vids.select("w", "tid")), "w")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("tid")).alias("ids"))
    )
    pair_codes = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.shiftleft(x, 31).bitwiseOR(y),
            ),
        )
    )
    top = (
        enc.select(F.explode(pair_codes).alias("code"))
        .groupBy("code")
        .agg(F.count("*").alias("c12"))
        .orderBy(F.desc("c12"), "code")
        .limit(20)
        .select(
            F.shiftright("code", 31).alias("tid1"),
            F.col("code").bitwiseAND(F.lit((1 << 31) - 1)).alias("tid2"),
            "c12",
        )
    )
    out = (
        top.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(
                vids.select(F.col("tid").alias("tid1"), F.col("w").alias("w1"), F.col("cw").alias("c1"))
            ),
            "tid1",
        )
        .join(
            F.broadcast(
                vids.select(F.col("tid").alias("tid2"), F.col("w").alias("w2"), F.col("cw").alias("c2"))
            ),
            "tid2",
        )
        .select(
            "w1",
            "w2",
            "c12",
            # Both products feed only the log ratio, so cast to double
            # BEFORE multiplying: count x count at 1e11 docs exceeds BIGINT
            # and would ANSI-abort (round-7 int-overflow audit); double is
            # exact below 2^53 and amply precise inside a log beyond it.
            F.log(
                F.col("c12").cast("double")
                * F.col("n_docs")
                / (F.col("c1").cast("double") * F.col("c2"))
            ).alias("pmi"),
        )
    )
    return out.orderBy(F.desc("c12"), "w1", "w2").limit(20)


@register(
    "q145_sequence_packing",
    sql="""
    WITH RECURSIVE d AS MATERIALIZED (
        -- MATERIALIZED is load-bearing (README rule 9, oracle-side): the
        -- recursive step joins d once per iteration, and DuckDB re-tokenizes
        -- the whole corpus each step when d is inlined -- measured 73.7s ->
        -- 2.8s at sf0.1.
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents),
    r AS (
        SELECT lang, doc_id, n_tok, rn, 0 AS bin, n_tok AS fill FROM d WHERE rn = 1
        UNION ALL
        SELECT d.lang, d.doc_id, d.n_tok, d.rn,
               CASE WHEN r.fill + d.n_tok <= 512 THEN r.bin ELSE r.bin + 1 END,
               CASE WHEN r.fill + d.n_tok <= 512 THEN r.fill + d.n_tok ELSE d.n_tok END
        FROM d JOIN r ON d.lang = r.lang AND d.rn = r.rn + 1)
    SELECT lang, CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM r GROUP BY lang, bin ORDER BY lang, bin
    """,
    doc="Greedy sequence packing: whole documents fill 512-token context "
    "bins in doc_id order per language; a bin closes when the next doc "
    "would overflow it.  The bin id depends on a running reset, which no "
    "window function expresses (unlike q141's pure prefix-sum shard), so "
    "the per-group scan runs as an Arrow-batched applyInPandas kernel -- "
    "the custom-stateful-batch-operator tier -- against a recursive-CTE "
    "DuckDB oracle replaying the identical greedy fold.  Parallelism is "
    "per-lang (one group per task); at 100 TB packing runs per (lang, "
    "shard-range) bucket exactly like q141's two-pass note, keeping "
    "groups bounded.",
)
def q145_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", token_count("text").alias("n_tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for t in pdf["n_tok"]:
            if fill and fill + t > 512:
                b, fill = b + 1, 0
            fill += int(t)
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    packed = d.groupBy("lang").applyInPandas(
        pack, "lang string, doc_id long, n_tok long, bin long"
    )
    return (
        packed.groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("lang", "bin")
    )


def _q143_oracle_sql() -> str:
    # Mirror of the Spark plan: per-source counts -> temperature weights ->
    # per-source keep rate -> deterministic md5-keyed Bernoulli.  The keep
    # decision compares 20-bit hex strings (identical md5/hex/lpad semantics
    # in both engines, verified byte-for-byte), so the sampled set is exactly
    # reproducible cross-engine; rates are rounded to 6 decimals so the
    # double arithmetic cannot flip a threshold between engines.
    return """
    WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT SUM(POW(n_docs, 0.5)) AS z, SUM(n_docs) AS n_total FROM counts),
    rates AS (
        SELECT source, n_docs,
               ROUND(LEAST(1.0, 0.5 * n_total * POW(n_docs, 0.5) / z / n_docs), 6) AS rate
        FROM counts, tot),
    keyed AS (
        SELECT source, doc_id,
               upper(substr(md5(CAST(doc_id AS VARCHAR)), 18, 5)) AS hk
        FROM documents)
    SELECT k.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hk < lpad(hex(CAST(FLOOR(rate * 1048576) AS BIGINT)), 5, '0')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           MAX(rate) AS target_rate
    FROM keyed k JOIN rates USING (source)
    GROUP BY k.source
    ORDER BY k.source
    """


@register(
    "q143_dataset_mixing",
    sql=_q143_oracle_sql(),
    doc="Temperature-weighted dataset mixing (alpha=0.5, budget=50% of the "
    "corpus): per-source keep rates proportional to n^alpha / n -- the "
    "standard recipe for up-weighting small sources when composing a "
    "training mix -- applied via a deterministic md5(doc_id) Bernoulli "
    "key, so the mix is exactly reproducible under any partitioning and "
    "re-run.  Rates come from a tiny per-source aggregate that broadcasts "
    "back onto the corpus scan: one shuffle for the source counts, zero "
    "for the sampling pass.  At 100 TB the same plan holds -- the rate "
    "table is source-cardinality-sized (dozens of rows).",
)
def q143_dataset_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(
        F.sum(F.pow("n_docs", F.lit(0.5))).alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.5) * F.col("n_total") * F.pow("n_docs", F.lit(0.5)) / F.col("z") / F.col("n_docs"),
            ),
            6,
        ).alias("rate"),
    )
    thresh = F.lpad(F.hex(F.floor(F.col("rate") * F.lit(1048576)).cast("bigint")), 5, "0")
    keyed = d.select(
        "source",
        F.upper(F.substring(F.md5(F.col("doc_id").cast("string")), 18, 5)).alias("hk"),
    )
    return (
        keyed.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("hk") < thresh, 1).otherwise(0)).cast("long").alias("n_sampled"),
            F.max("rate").alias("target_rate"),
        )
        .orderBy("source")
    )


@register(
    "q144_data_card",
    sql="""
    WITH t AS (
        SELECT source, lang, len(string_split(text, ' ')) AS n_tok, md5(text) AS th
        FROM documents)
    SELECT COALESCE(source, 'ALL') AS card_source,
           COALESCE(lang, 'ALL') AS card_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           ROUND(AVG(n_tok), 4) AS avg_tokens,
           ROUND(1.0 - CAST(COUNT(DISTINCT th) AS DOUBLE) / COUNT(*), 6) AS dup_frac
    FROM t
    GROUP BY ROLLUP (source, lang)
    ORDER BY card_source, card_lang
    """,
    doc="Corpus data card: one-pass ROLLUP over (source, lang) with doc/"
    "token counts, mean length, and the exact duplicate fraction (1 - "
    "distinct text hashes / docs) -- the dataset-composition report "
    "published alongside a training corpus.  The rollup reuses one "
    "shuffle; the distinct-count is per-group exact (at 100 TB swap in "
    "approx_count_distinct or the q128 HLL sketches for the same shape).",
)
def q144_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "lang",
        token_count("text").alias("n_tok"),
        F.md5(F.col("text").cast("binary")).alias("th"),
    )
    return (
        t.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.round(
                F.lit(1.0) - F.countDistinct("th").cast("double") / F.count("*"), 6
            ).alias("dup_frac"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("card_source"),
            F.coalesce("lang", F.lit("ALL")).alias("card_lang"),
            "n_docs",
            "n_tokens",
            "avg_tokens",
            "dup_frac",
        )
        .orderBy("card_source", "card_lang")
    )
