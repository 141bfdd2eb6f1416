"""Wave-20 operators (round 7, continued): corpus-hygiene accounting that
closes the remaining span-level dedup gap and adds the two curation reports
every large-scale ingest loop runs -- WHERE the duplicated text lives inside
each document (maximal span reconstruction, the read-out step of
substring-level dedup that q158's per-doc dup fraction only summarizes), an
adaptive per-source quality gate (quantile thresholds instead of one global
cutoff), and the dedup saturation curve (how fast novelty decays as the
corpus grows -- the "is more crawl worth it" signal).

All three are pure DataFrame compositions -- windows, hash-aggs, one
broadcast -- no Python in the hot path; every ranking/threshold statistic is
integer-exact (README float rules 1-2).

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import ngram_instances, tokens
from ..sources.catalog import load_table, spread
from . import register

# ---------------------------------------------------------------------------
# q308: maximal duplicated-span reconstruction (gaps-and-islands)
# ---------------------------------------------------------------------------

_DUP_SPAN_ORACLE = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
               FROM documents WHERE length(text) > 0),
    inst AS MATERIALIZED (
        SELECT doc_id, len(t) AS n_tokens, i AS pos,
               array_to_string(t[i:i+4], ' ') AS gram
        FROM d, unnest(generate_series(1, len(t) - 4)) AS u(i)
        WHERE len(t) >= 5),
    freq AS (SELECT gram FROM inst GROUP BY gram
             HAVING COUNT(DISTINCT doc_id) >= 2),
    dup AS (SELECT i.doc_id, i.n_tokens, i.pos
            FROM inst i JOIN freq USING (gram)),
    marked AS (
        SELECT doc_id, n_tokens, pos,
               CASE WHEN pos > COALESCE(MAX(pos + 4) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                    THEN 1 ELSE 0 END AS brk
        FROM dup),
    isl AS (
        SELECT doc_id, n_tokens, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                              ) AS island_id
        FROM marked),
    per_island AS (
        SELECT doc_id, n_tokens, island_id,
               MIN(pos) AS s, MAX(pos) + 4 AS e
        FROM isl GROUP BY doc_id, n_tokens, island_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(e - s + 1) AS BIGINT) AS longest_span,
           CAST(SUM(e - s + 1) AS BIGINT) AS covered_tokens,
           CAST(SUM(e - s + 1) AS BIGINT) * 1000000 // n_tokens AS covered_ppm
    FROM per_island GROUP BY doc_id, n_tokens ORDER BY doc_id
"""


@register(
    "q308_dup_span_islands",
    sql=_DUP_SPAN_ORACLE,
    doc="Maximal duplicated-span reconstruction: for every document, merge "
    "the positions of 5-grams shared with at least one OTHER document into "
    "maximal contiguous token islands (gaps-and-islands over the interval "
    "[pos, pos+4] cover set) and report island count, longest span, and "
    "covered-token ppm -- the read-out step of substring-level dedup that "
    "decides WHAT to cut, where q158's dup_frac only decides whether to "
    "look.  All span arithmetic is integer (positions), so the island "
    "boundaries and ppm are engine-exact.  "
    "Plan: one narrow tokenize+posexplode projection, a gram-keyed hash-agg "
    "for the cross-doc frequency (vocabulary-bounded; a production run caps "
    "doc-frequency before the join-back, the q158 guard), one join back on "
    "gram, then doc-partitioned windows -- every shuffle is on gram or "
    "doc_id, never all-pairs, so the shape survives 100 TB.",
)
def q308_dup_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    inst = (
        d.select("doc_id", tokens("text").alias("t"))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.posexplode(ngram_instances(F.col("t"), 5)).alias("pos0", "gram"),
        )
        .select("doc_id", "n_tokens", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    freq = (
        inst.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram")
    )
    dup = inst.join(freq, "gram").select("doc_id", "n_tokens", "pos")
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = dup.select(
        "doc_id",
        "n_tokens",
        "pos",
        F.when(
            F.col("pos") > F.coalesce(F.max(F.col("pos") + 4).over(w_prev), F.lit(-1)) + 1,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    isl = marked.select(
        "doc_id", "n_tokens", "pos", F.sum("brk").over(w_run).alias("island_id")
    )
    per_island = isl.groupBy("doc_id", "n_tokens", "island_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + 4).alias("e")
    )
    span = (F.col("e") - F.col("s") + 1).cast("bigint")
    return (
        per_island.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").cast("bigint").alias("n_islands"),
            F.max(span).alias("longest_span"),
            F.sum(span).alias("covered_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_islands",
            "longest_span",
            "covered_tokens",
            F.expr("covered_tokens * 1000000 div n_tokens").alias("covered_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q309: adaptive per-source quality gate (quantile threshold, not global)
# ---------------------------------------------------------------------------

_ADAPTIVE_GATE_ORACLE = """
    WITH per_doc AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS tok,
               len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS ppm
        FROM documents WHERE length(text) > 0),
    ranked AS (
        SELECT source, tok, ppm,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY ppm, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM per_doc)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn > n * 3 // 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(MIN(CASE WHEN rn > n * 3 // 10 THEN ppm END) AS BIGINT)
               AS threshold_ppm,
           CAST(SUM(CASE WHEN rn > n * 3 // 10 THEN tok ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           CAST(SUM(CASE WHEN rn > n * 3 // 10 THEN tok ELSE 0 END) AS BIGINT)
               * 1000000 // CAST(SUM(tok) AS BIGINT) AS kept_token_ppm
    FROM ranked GROUP BY source ORDER BY source
"""


@register(
    "q309_adaptive_quality_gate",
    sql=_ADAPTIVE_GATE_ORACLE,
    doc="Adaptive per-source quality gate: instead of one global quality "
    "cutoff (which over-filters clean sources and under-filters noisy "
    "ones), each source drops its own lowest-quality 30% by the integer "
    "distinct-token-ppm proxy (q289's statistic) and reports the resulting "
    "per-source threshold and kept-token share.  The cut rank is exact "
    "integer arithmetic (drop = 3n div 10 lowest, total order (ppm, doc_id))"
    " so no float quantile can drift between engines -- the same reason "
    "production pipelines phrase 'P30 per source' as a rank, not a "
    "percentile_approx.  "
    "Plan: one narrow projection, one source-partitioned window (sort "
    "within source), one hash-agg -- a single shuffle on source; at 100 TB "
    "a mega-source's sort is the pressure point and would be replaced by a "
    "two-pass histogram threshold (q182's width_bucket machinery), same "
    "contract.",
)
def q309_adaptive_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    t = tokens("text")
    per_doc = d.select(
        "source",
        "doc_id",
        F.size(t).cast("bigint").alias("tok"),
        F.size(F.array_distinct(t)).cast("bigint").alias("ndis"),
    ).select("source", "doc_id", "tok", F.expr("ndis * 1000000 div tok").alias("ppm"))
    w_rank = Window.partitionBy("source").orderBy("ppm", "doc_id")
    w_all = Window.partitionBy("source")
    ranked = per_doc.select(
        "source",
        "tok",
        "ppm",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    kept = F.col("rn") > F.expr("n * 3 div 10")
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.min(F.when(kept, F.col("ppm"))).cast("bigint").alias("threshold_ppm"),
            F.sum(F.when(kept, F.col("tok")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("kept_tokens"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "threshold_ppm",
            "kept_tokens",
            F.expr("kept_tokens * 1000000 div total_tokens").alias("kept_token_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q310: dedup saturation curve (novelty decay across ingestion order)
# ---------------------------------------------------------------------------

_SATURATION_ORACLE = """
    WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
    f AS (SELECT doc_id,
                 CASE WHEN ROW_NUMBER() OVER (PARTITION BY md5(text)
                                              ORDER BY doc_id) = 1
                      THEN 1 ELSE 0 END AS novel
          FROM documents),
    g AS (SELECT CAST(LEAST(9, (doc_id - lo) * 10 // (hi - lo + 1)) AS INT)
                     AS bucket,
                 novel
          FROM f, b),
    per AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(novel) AS BIGINT) AS n_novel
            FROM g GROUP BY bucket)
    SELECT bucket, n_docs, n_novel,
           n_novel * 1000000 // n_docs AS novel_ppm,
           CAST(SUM(n_novel) OVER (ORDER BY bucket
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum_novel
    FROM per ORDER BY bucket
"""


@register(
    "q310_dedup_saturation",
    sql=_SATURATION_ORACLE,
    doc="Dedup saturation curve: treating doc_id as ingestion order, split "
    "the corpus into 10 id-range buckets and report how the exact-dup "
    "novelty rate (first-occurrence share, md5 identity) decays bucket over "
    "bucket -- the 'is another crawl batch still worth ingesting' signal "
    "that sits in every production dedup loop's dashboard.  Bucketing is "
    "by integer id-range arithmetic against a broadcast min/max scalar -- "
    "NOT a global row_number/ntile, which would serialize 100 TB through "
    "one window task; first-occurrence is a hash-partitioned window on the "
    "md5 key (ROW_NUMBER = 1), the q50 exact-dedup spelling.  "
    "Plan: parquet-stats min/max scan + one md5-partitioned window + one "
    "10-group hash-agg; the final cumulative window runs over 10 rows.",
)
def q310_dedup_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    w_first = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    flagged = d.select(
        "doc_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("novel"),
    )
    per = (
        flagged.crossJoin(F.broadcast(bounds))
        .select(
            F.least(F.lit(9), F.expr("(doc_id - lo) * 10 div (hi - lo + 1)"))
            .cast("int")
            .alias("bucket"),
            "novel",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("novel").cast("bigint").alias("n_novel"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per.select(
        "bucket",
        "n_docs",
        "n_novel",
        F.expr("n_novel * 1000000 div n_docs").alias("novel_ppm"),
        F.sum("n_novel").over(w_cum).cast("bigint").alias("cum_novel"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# q311: stream-static AS-OF enrichment (validity intervals, stateless)
# ---------------------------------------------------------------------------

_STREAM_ASOF_ORACLE = """
    WITH p AS (
        SELECT user_id AS p_user, ts AS v_start,
               event_id AS ref_event_id, value AS ref_value,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS v_end
        FROM events WHERE event_type = 'purchase'),
    e AS (SELECT event_id, event_type, user_id, ts
          FROM events WHERE event_type <> 'purchase')
    SELECT e.event_id, e.event_type, p.ref_event_id, p.ref_value
    FROM e LEFT JOIN p
      ON e.user_id = p.p_user AND e.ts >= p.v_start
         AND (p.v_end IS NULL OR e.ts < p.v_end)
    ORDER BY e.event_id
"""


@register(
    "q311_stream_asof_enrich",
    sql=_STREAM_ASOF_ORACLE,
    doc="Stream-static AS-OF enrichment: every live event is tagged with the "
    "user's most recent purchase at-or-before its timestamp.  A per-event "
    "window (the q18 batch as-of trick) is unavailable in a stream, so the "
    "static side is rewritten into VALIDITY INTERVALS -- each purchase "
    "carries [ts, next_purchase_ts) via a static-side-only lead() window -- "
    "turning the as-of into a point-in-interval broadcast join that is "
    "STATELESS under Structured Streaming (each event matches at most one "
    "interval; no watermark, no state store).  This is the production "
    "spelling for enriching a stream against a slowly-changing dimension; "
    "same-timestamp purchase ties collapse to the highest event_id (the "
    "earlier row's interval is empty), identically in both engines.  "
    "Plan: static side = one small window + broadcast; stream side is one "
    "stateless micro-batch projection-join -- at 100 TB/day the static "
    "interval table is dimension-sized and the join stays broadcast.",
)
def q311_stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import run_to_memory
    from ..streaming.source import events_stream

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("p_user").orderBy("v_start", "ref_event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("v_start"),
            F.col("event_id").alias("ref_event_id"),
            F.col("value").alias("ref_value"),
        )
        .withColumn("v_end", F.lead("v_start").over(w))
    )
    stream = events_stream(spark, sf_dir).filter(F.col("event_type") != "purchase")
    joined = stream.join(
        F.broadcast(purchases),
        (stream["user_id"] == purchases["p_user"])
        & (stream["ts"] >= purchases["v_start"])
        & (purchases["v_end"].isNull() | (stream["ts"] < purchases["v_end"])),
        "left_outer",
    ).select("event_id", "event_type", "ref_event_id", "ref_value")
    table = run_to_memory(joined, output_mode="append")
    return spark.table(table).orderBy("event_id")


# ---------------------------------------------------------------------------
# q312: corpus pipeline v4 (span cut -> adaptive gate -> exact dedup)
# ---------------------------------------------------------------------------

_PIPELINE_V4_ORACLE = """
    WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t, text
               FROM documents WHERE length(text) > 0),
    base AS MATERIALIZED (
        SELECT doc_id, source, len(t) AS tok,
               len(list_distinct(t)) * 1000000 // len(t) AS ppm,
               md5(text) AS h
        FROM d),
    inst AS MATERIALIZED (
        SELECT doc_id, len(t) AS n_tokens, i AS pos,
               array_to_string(t[i:i+4], ' ') AS gram
        FROM d, unnest(generate_series(1, len(t) - 4)) AS u(i)
        WHERE len(t) >= 5),
    freq AS (SELECT gram FROM inst GROUP BY gram
             HAVING COUNT(DISTINCT doc_id) >= 2),
    dup AS (SELECT i.doc_id, i.n_tokens, i.pos
            FROM inst i JOIN freq USING (gram)),
    marked AS (
        SELECT doc_id, n_tokens, pos,
               CASE WHEN pos > COALESCE(MAX(pos + 4) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                    THEN 1 ELSE 0 END AS brk
        FROM dup),
    isl AS (
        SELECT doc_id, n_tokens, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                              ) AS island_id
        FROM marked),
    cov AS (
        SELECT doc_id,
               SUM(e - s + 1) * 1000000 // ANY_VALUE(n_tokens) AS covered_ppm
        FROM (SELECT doc_id, n_tokens, island_id,
                     MIN(pos) AS s, MAX(pos) + 4 AS e
              FROM isl GROUP BY doc_id, n_tokens, island_id)
        GROUP BY doc_id),
    flagged AS MATERIALIZED (
        SELECT base.*,
               CASE WHEN COALESCE(cov.covered_ppm, 0) <= 600000
                    THEN 1 ELSE 0 END AS pass1
        FROM base LEFT JOIN cov USING (doc_id)),
    ranked AS (
        SELECT *,
               SUM(pass1) OVER (PARTITION BY source ORDER BY ppm, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS rk,
               SUM(pass1) OVER (PARTITION BY source) AS n_surv
        FROM flagged),
    gated AS (
        SELECT *,
               CASE WHEN pass1 = 1 AND rk > n_surv * 3 // 10
                    THEN 1 ELSE 0 END AS keep2
        FROM ranked),
    deduped AS (
        SELECT *,
               CASE WHEN keep2 = 1 AND SUM(keep2) OVER (
                        PARTITION BY h ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                    THEN 1 ELSE 0 END AS novel
        FROM gated)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(pass1) AS BIGINT) AS n_span_kept,
           CAST(SUM(keep2) AS BIGINT) AS n_gate_kept,
           CAST(SUM(novel) AS BIGINT) AS n_final,
           CAST(SUM(CASE WHEN novel = 1 THEN tok ELSE 0 END) AS BIGINT)
               AS final_tokens,
           CAST(SUM(CASE WHEN novel = 1 THEN tok ELSE 0 END) AS BIGINT)
               * 1000000 // CAST(SUM(tok) AS BIGINT) AS final_token_ppm
    FROM deduped GROUP BY source ORDER BY source
"""


@register(
    "q312_corpus_pipeline_v4",
    sql=_PIPELINE_V4_ORACLE,
    doc="Corpus pipeline v4: the wave-20 stages composed under ONE oracle -- "
    "(1) cut documents whose cross-doc duplicated-span cover exceeds 60% "
    "(q308 islands), (2) drop each source's lowest-quality 30% of the "
    "SURVIVORS (q309 gate -- the rank threshold shifts with the stage-1 "
    "outcome, which is exactly why the whole chain needs one oracle), "
    "(3) exact-dedup the remainder by first occurrence (q50/q310), with a "
    "per-source funnel report.  The three stages are fused into a single "
    "pass of flag columns and running-sum windows -- no intermediate "
    "filter materializes, so the multi-consumer re-scan trap (README rule "
    "9) never arises: the rank-among-survivors is a running sum of the "
    "stage-1 flag, and first-occurrence-among-gated is a running sum of "
    "the stage-2 flag.  Every stage statistic is integer-exact.  "
    "Plan: the q308 islands subchain feeds one left join, then two "
    "partitioned window passes (source, md5) and one hash-agg -- shuffles "
    "on gram, doc_id, source, h; nothing all-pairs, nothing global.",
)
def q312_corpus_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.length("text") > 0)
    t = tokens("text")
    base = d.select(
        "doc_id",
        "source",
        F.size(t).cast("bigint").alias("tok"),
        F.md5("text").alias("h"),
        F.size(F.array_distinct(t)).cast("bigint").alias("ndis"),
    ).select("doc_id", "source", "tok", "h", F.expr("ndis * 1000000 div tok").alias("ppm"))

    inst = (
        d.select("doc_id", tokens("text").alias("t"))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.posexplode(ngram_instances(F.col("t"), 5)).alias("pos0", "gram"),
        )
        .select("doc_id", "n_tokens", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    freq = (
        inst.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram")
    )
    dup = inst.join(freq, "gram").select("doc_id", "n_tokens", "pos")
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = dup.select(
        "doc_id",
        "n_tokens",
        "pos",
        F.when(
            F.col("pos") > F.coalesce(F.max(F.col("pos") + 4).over(w_prev), F.lit(-1)) + 1,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    isl = marked.select(
        "doc_id", "n_tokens", "pos", F.sum("brk").over(w_run).alias("island_id")
    )
    cov = (
        isl.groupBy("doc_id", "n_tokens", "island_id")
        .agg(F.min("pos").alias("s"), (F.max("pos") + 4).alias("e"))
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("e") - F.col("s") + 1).cast("bigint")).alias("covered"),
            F.first("n_tokens").alias("n_tokens"),
        )
        .select("doc_id", F.expr("covered * 1000000 div n_tokens").alias("covered_ppm"))
    )

    flagged = base.join(cov, "doc_id", "left").select(
        "doc_id",
        "source",
        "tok",
        "h",
        "ppm",
        F.when(F.coalesce(F.col("covered_ppm"), F.lit(0)) <= 600000, 1)
        .otherwise(0)
        .alias("pass1"),
    )
    w_rank = (
        Window.partitionBy("source")
        .orderBy("ppm", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_src = Window.partitionBy("source")
    ranked = flagged.select(
        "*",
        F.sum("pass1").over(w_rank).alias("rk"),
        F.sum("pass1").over(w_src).alias("n_surv"),
    )
    gated = ranked.select(
        "*",
        F.when(
            (F.col("pass1") == 1) & (F.col("rk") > F.expr("n_surv * 3 div 10")), 1
        )
        .otherwise(0)
        .alias("keep2"),
    )
    w_h = (
        Window.partitionBy("h")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    deduped = gated.select(
        "*",
        F.when((F.col("keep2") == 1) & (F.sum("keep2").over(w_h) == 1), 1)
        .otherwise(0)
        .alias("novel"),
    )
    final_tok = F.sum(F.when(F.col("novel") == 1, F.col("tok")).otherwise(F.lit(0))).cast(
        "bigint"
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_raw"),
            F.sum("pass1").cast("bigint").alias("n_span_kept"),
            F.sum("keep2").cast("bigint").alias("n_gate_kept"),
            F.sum("novel").cast("bigint").alias("n_final"),
            final_tok.alias("final_tokens"),
            F.sum("tok").cast("bigint").alias("raw_tokens"),
        )
        .select(
            "source",
            "n_raw",
            "n_span_kept",
            "n_gate_kept",
            "n_final",
            "final_tokens",
            F.expr("final_tokens * 1000000 div raw_tokens").alias("final_token_ppm"),
        )
        .orderBy("source")
    )
