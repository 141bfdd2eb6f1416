"""Wave-8 operators (round 2): calendar/string scalar completion, Spark 4
API surface (table-arg UDTF, transpose, groupingSets, SQL pipes), ingest
hygiene (incremental dedup, train/val/test split, weighted sampling), the
bounded as-of join, exact streaming windowed distinct, and the Deequ-style
data-quality layer.

Reference parity note: as with wave 7, the reference
(`/root/reference/src/main/java/com/github/pilillo/Processor.java`) has no
analytics surface; these are charter extensions (SURVEY.md section 2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q201: calendar scalar extras
# ---------------------------------------------------------------------------


@register(
    "q201_calendar_extras",
    sql="""
    WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
               WHERE o_orderkey % 7 = 0)
    SELECT o_orderkey, strftime(d, '%Y-%m-%d') AS d,
           strftime(last_day(d), '%Y-%m-%d') AS month_end,
           strftime(d + to_days(CAST(((7 - isodow(d)) % 7) + 1 AS INT)), '%Y-%m-%d') AS next_monday,
           strftime(d + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2m,
           CAST(quarter(d) AS INT) AS qtr,
           CAST(weekofyear(d) AS INT) AS iso_week,
           CAST(dayofweek(d) + 1 AS INT) AS dow,
           strftime(date_trunc('week', d), '%Y-%m-%d') AS week_start
    FROM d
    ORDER BY o_orderkey
    """,
    doc="Calendar scalar extras completing the date/time group (SURVEY "
    "2.B): last_day, next_day, add_months (end-of-month clamping), "
    "quarter, ISO weekofyear, dayofweek, and week truncation.  Engine "
    "semantics divergences are reconciled IN THE ORACLE, not fudged: "
    "DuckDB dayofweek is 0=Sunday vs Spark's 1=Sunday (+1), and "
    "next_day('MON') spells out as isodow arithmetic.  Pure codegen "
    "projection; the only exchange is the output sort.",
)
def q201_calendar_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.cast("string").alias("d"),
        F.last_day(d).cast("string").alias("month_end"),
        F.next_day(d, "Mon").cast("string").alias("next_monday"),
        F.add_months(d, 2).cast("string").alias("plus_2m"),
        F.quarter(d).cast("int").alias("qtr"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.date_trunc("week", d).cast("date").cast("string").alias("week_start"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# q202: Python UDTF with a TABLE argument (partitioned, terminate())
# ---------------------------------------------------------------------------


@register(
    "q202_udtf_table_arg",
    sql="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents WHERE length(text) > 0
    GROUP BY lang ORDER BY lang
    """,
    doc="Python UDTF with a TABLE argument (Spark 4: `f(TABLE(v) PARTITION "
    "BY lang)`): the engine routes each partition's rows through eval() "
    "and the per-partition summary emits from terminate() -- the "
    "user-defined aggregation protocol that complements q63's lateral "
    "row-expansion UDTF.  PARTITION BY is a real shuffle on lang, so the "
    "UDTF parallelizes per group like applyInPandas (q49) but with "
    "streaming row delivery instead of a materialized pandas frame.  "
    "Oracle is the plain GROUP BY the protocol must reproduce.",
)
def q202_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs long, n_tokens long")
    class PerLangStats:
        def __init__(self):
            self._lang = None
            self._docs = 0
            self._tokens = 0

        def eval(self, row):
            self._lang = row["lang"]
            self._docs += 1
            self._tokens += len(row["text"].split(" "))

        def terminate(self):
            if self._lang is not None:
                yield self._lang, self._docs, self._tokens

    spark.udtf.register("per_lang_stats", PerLangStats)
    load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT * FROM per_lang_stats(TABLE(docs_for_udtf) PARTITION BY lang) "
        "ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# q203: incremental dedup of an ingest batch against the historical corpus
# ---------------------------------------------------------------------------

_INCR_JACCARD_T = 0.5


@register(
    "q203_incremental_dedup",
    sql=f"""
    WITH hist AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    exact AS (
        SELECT b.doc_id, MIN(h.doc_id) AS matched_id
        FROM batch b JOIN hist h ON md5(b.text) = md5(h.text)
        GROUP BY b.doc_id),
    bsh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM batch)
        WHERE len(toks) >= 3),
    hsh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM hist)
        WHERE len(toks) >= 3),
    btok AS (SELECT doc_id, unnest(sh) AS shingle FROM bsh),
    htok AS (SELECT doc_id, unnest(sh) AS shingle FROM hsh),
    common AS (
        SELECT b.doc_id AS bid, h.doc_id AS hid, COUNT(*) AS common
        FROM btok b JOIN htok h ON b.shingle = h.shingle
        GROUP BY 1, 2),
    near AS (
        SELECT bid AS doc_id, MIN(hid) AS matched_id
        FROM common
        JOIN (SELECT doc_id, len(sh) AS n FROM bsh) sb ON bid = sb.doc_id
        JOIN (SELECT doc_id, len(sh) AS n FROM hsh) sh2 ON hid = sh2.doc_id
        WHERE CAST(common AS DOUBLE) / (sb.n + sh2.n - common) >= {_INCR_JACCARD_T}
        GROUP BY bid)
    SELECT b.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'novel' END AS status,
           CASE WHEN e.doc_id IS NOT NULL THEN e.matched_id
                WHEN n.doc_id IS NOT NULL THEN n.matched_id END AS matched_id
    FROM batch b
    LEFT JOIN exact e ON b.doc_id = e.doc_id
    LEFT JOIN near n ON b.doc_id = n.doc_id
    ORDER BY b.doc_id
    """,
    doc="Incremental ingest dedup: classify each document of a NEW batch "
    "(doc_id%5=0 stands in for today's crawl) against the historical "
    "corpus as exact_dup (hash match), near_dup (3-shingle Jaccard >= "
    f"{_INCR_JACCARD_T} to any historical doc), or novel, with the lowest "
    "matching historical id for provenance.  This is the shape production "
    "pipelines actually run daily -- NEVER re-deduping the 100 TB corpus: "
    "cost is O(batch) probes against the persistent hash/shingle indexes "
    "(the md5 join and the posting join both key on batch-side values, so "
    "with a small batch both build sides broadcast; a bloom filter over "
    "historical hashes is the further cheap pre-filter).  Precedence "
    "exact > near resolves the overlap deterministically.",
)
def q203_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)

    exact = (
        batch.select("doc_id", F.md5("text").alias("h"))
        .join(
            hist.select(F.md5("text").alias("h"), F.col("doc_id").alias("hid")), "h"
        )
        .groupBy("doc_id")
        .agg(F.min("hid").alias("exact_match"))
    )

    def shingled(df):
        return (
            df.select("doc_id", word_shingles("text", 3).alias("sh"))
            .filter(F.size(tokens("text")) >= 3)
        )

    bsh, hsh = shingled(batch), shingled(hist)
    btok = bsh.select("doc_id", F.explode("sh").alias("shingle"))
    htok = hsh.select("doc_id", F.explode("sh").alias("shingle"))
    common = (
        btok.alias("b")
        .join(htok.alias("h"), "shingle")
        .groupBy(
            F.col("b.doc_id").alias("bid"), F.col("h.doc_id").alias("hid")
        )
        .agg(F.count("*").alias("common"))
    )
    near = (
        common.join(bsh.select(F.col("doc_id").alias("bid"), F.size("sh").alias("bn")), "bid")
        .join(hsh.select(F.col("doc_id").alias("hid"), F.size("sh").alias("hn")), "hid")
        .filter(
            F.col("common").cast("double")
            / (F.col("bn") + F.col("hn") - F.col("common"))
            >= _INCR_JACCARD_T
        )
        .groupBy("bid")
        .agg(F.min("hid").alias("near_match"))
        .withColumnRenamed("bid", "doc_id")
    )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), "exact_dup")
            .when(F.col("near_match").isNotNull(), "near_dup")
            .otherwise("novel")
            .alias("status"),
            F.when(F.col("exact_match").isNotNull(), F.col("exact_match"))
            .otherwise(F.col("near_match"))
            .alias("matched_id"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q204: string scalar extras (second batch)
# ---------------------------------------------------------------------------


@register(
    "q204_string_extras",
    sql="""
    SELECT n_nationkey,
           array_to_string(list_transform(string_split(lower(n_name), ' '),
               w -> upper(w[1]) || w[2:]), ' ') AS title_name,
           reverse(n_name) AS rev,
           repeat(substring(n_name, 1, 2), 3) AS rep2,
           printf('%s#%02d', substring(n_name, 1, 3), n_nationkey) AS tag,
           CAST(ascii(n_name) AS INT) AS first_code,
           chr(CAST(65 + n_nationkey % 26 AS INT)) AS letter,
           array_to_string(string_split(n_name, 'A')[1:2], 'A') AS before_2nd_a
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="String scalar extras completing the string group: initcap "
    "(title-case, emulated word-by-word in the oracle -- DuckDB lacks it), "
    "reverse, repeat, format_string/printf, ascii, chr, and "
    "substring_index (emulated as split+rejoin).  Engine divergences live "
    "in the ORACLE emulation, the Spark side is all built-ins in one "
    "codegen projection.",
)
def q204_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.initcap(F.lower("n_name")).alias("title_name"),
        F.reverse("n_name").alias("rev"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("rep2"),
        F.format_string("%s#%02d", F.substring("n_name", 1, 3), "n_nationkey").alias("tag"),
        F.ascii("n_name").cast("int").alias("first_code"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("letter"),
        F.substring_index("n_name", "A", 2).alias("before_2nd_a"),
    ).orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# q205: DataFrame.transpose (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "q205_transpose",
    sql="""
    WITH c AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS n
        FROM orders GROUP BY 1, 2)
    SELECT s AS key,
           MAX(CASE WHEN p = '1-URGENT' THEN n END) AS "1-URGENT",
           MAX(CASE WHEN p = '2-HIGH' THEN n END) AS "2-HIGH",
           MAX(CASE WHEN p = '3-MEDIUM' THEN n END) AS "3-MEDIUM",
           MAX(CASE WHEN p = '4-NOT SPECIFIED' THEN n END) AS "4-NOT SPECIFIED",
           MAX(CASE WHEN p = '5-LOW' THEN n END) AS "5-LOW"
    FROM c GROUP BY s ORDER BY key
    """,
    doc="DataFrame.transpose (Spark 4): the priority x status count table "
    "pivots priorities to columns, then transposes so former columns "
    "become rows keyed by `key` -- the API for flipping a SMALL summary "
    "frame (transpose materializes the header column on the driver, so "
    "it is a driver-scale operation by contract, like q199's matrix).  "
    "Oracle spells the same double pivot as conditional aggregation.",
)
def q205_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    # transpose: first column becomes the header row; flip twice to get
    # (status rows x priority columns) keyed the way the oracle spells it.
    t = wide.transpose().transpose()
    return t.withColumnRenamed("key", "key").orderBy("key")


# ---------------------------------------------------------------------------
# q206: as-of join with a staleness tolerance
# ---------------------------------------------------------------------------


@register(
    "q206_asof_tolerance",
    sql="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT max_by(c.event_id, c.ts)
              FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click'
               AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 2 HOUR
           ) AS asof_click_event_id
    FROM events e
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
    doc="As-of join with a 2-hour tolerance (pandas merge_asof(tolerance=) "
    "semantics): the latest prior click still counts only while fresh; a "
    "stale match resolves to NULL instead of silently attaching hours-old "
    "state.  Same single-shuffle union-and-carry-forward plan as q18 -- "
    "the matched quote's own timestamp rides along and a codegen filter "
    "nulls expired matches, so tolerance costs zero extra shuffles "
    "(operators/asof.py).",
)
def q206_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("asof_click_event_id"),
    )
    joined = asof_join(
        errors,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["asof_click_event_id"],
        tiebreak="asof_click_event_id",
        tolerance="2 hours",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_asof_click_event_id").alias("asof_click_event_id"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q207: session windows with a DYNAMIC per-event gap
# ---------------------------------------------------------------------------


@register(
    "q207_dynamic_session_gap",
    sql="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 7200::BIGINT ELSE 1800::BIGINT END AS gap_s
        FROM events),
    flagged AS (
        SELECT user_id, ts, event_id, gap_s,
               CASE WHEN MAX(epoch_us(ts) + gap_s * 1000000)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         > epoch_us(ts)
                    THEN 0 ELSE 1 END AS new_session
        FROM e),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_id
    """,
    doc="Session windows with a DYNAMIC per-event gap (session_window(ts, "
    "expr), Spark >=3.2): purchases hold a session open for 2h, other "
    "events for 30min -- the per-event-type inactivity policy static gaps "
    "(q34) can't express.  Engine path uses the built-in session_window "
    "with a CASE gap; sessions merge while event intervals [ts, ts+gap) "
    "overlap, which the oracle replays as gaps-and-islands over a running "
    "max of interval ends.  Same single user_id shuffle as q34.",
)
def q207_dynamic_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # session_window's dynamic gap needs CalendarIntervalType string
    # literals, not the ANSI day-time interval INTERVAL syntax produces.
    gap = F.when(F.col("event_type") == "purchase", F.lit("2 hours")).otherwise(
        F.lit("30 minutes")
    )
    grouped = (
        e.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.col("sw.start"))
    return (
        grouped.withColumn("session_id", F.row_number().over(w).cast("bigint"))
        .select("user_id", "session_id", "n_events", "session_start", "session_end")
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# q208: deterministic train/val/test split
# ---------------------------------------------------------------------------


@register(
    "q208_train_val_test_split",
    sql="""
    WITH s AS (
        SELECT doc_id, lang,
               CAST(CAST('0x' || substr(md5('split42|' || doc_id), 1, 8) AS BIGINT) % 100 AS INT) AS bucket
        FROM documents)
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM s
    GROUP BY 1, 2
    ORDER BY lang, split
    """,
    doc="Deterministic train/val/test split (80/10/10): the split is a pure "
    "function of a salted key hash (md5 -> bucket 0..99), so it is stable "
    "under reruns, re-partitioning, AND corpus growth -- a new document "
    "never moves an old one between splits, which a row_number()-based "
    "split cannot guarantee.  This is the canonical leakage-safe split "
    "for training corpora (the salt versions the split).  Zero shuffles "
    "until the reporting agg; the per-row bucket is codegen.  Oracle "
    "replays the identical hash arithmetic.",
)
def q208_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split42|"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    ).cast("int")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"), "doc_id")
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang", "split")
    )


# ---------------------------------------------------------------------------
# q209: weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------


@register(
    "q209_weighted_sample",
    sql="""
    WITH s AS (
        SELECT doc_id, n_chars,
               (CAST(CAST('0x' || substr(md5('wsamp|' || doc_id), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                   / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0),
    keyed AS (
        SELECT doc_id, n_chars,
               ROUND(pow(u, 1.0 / n_chars), 9) AS k
        FROM s)
    SELECT doc_id, n_chars, k,
           CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id ASC) AS INT) AS rank
    FROM keyed
    ORDER BY rank
    LIMIT 20
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES): "
    "each row draws key u^(1/w) from a deterministic per-row uniform "
    "(salted md5 -> (bucket+0.5)/2^32) with weight = n_chars, and the "
    "global top-k by key IS a w-proportional sample without replacement.  "
    "The one-pass reservoir shape: keys compute in codegen with no "
    "shuffle, and top-20-of-n needs only a per-partition partial top-k "
    "before the single-partition final ranking (Spark's sort-limit "
    "already plans exactly that: TakeOrderedAndProject).  The "
    "deterministic uniform makes the sample reproducible AND "
    "oracle-checkable; swap the salt to redraw.",
)
def q209_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("wsamp|"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    k = F.round(F.pow(u, 1.0 / F.col("n_chars")), 9)
    w = Window.orderBy(F.col("k").desc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "n_chars", k.alias("k"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q210: DataFrame.groupingSets API (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "q210_grouping_sets_api",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="DataFrame.groupingSets (Spark 4 API): per-status totals, "
    "per-priority totals, and the grand total in ONE pass -- the "
    "DataFrame-native spelling of q29's SQL GROUPING SETS (one shuffle, "
    "rows expanded per set by the Expand operator, partial aggregation "
    "intact).  DECIMAL accumulate, double publish, as everywhere.",
)
def q210_grouping_sets_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# q211: streaming windowed distinct users
# ---------------------------------------------------------------------------


@register(
    "q211_stream_window_distinct",
    sql="""
    SELECT date_trunc('day', ts) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    doc="Streaming EXACT distinct users per tumbling event-time day, via "
    "the dedup-then-count chained-stateful pattern: plain COUNT(DISTINCT) "
    "is unsupported in streaming aggregations, so stage 1 "
    "dropDuplicates((user_id, window)) keeps one state row per distinct "
    "pair under the watermark, and stage 2 counts survivors per window -- "
    "two stateful operators in one query (the Spark 3.4+ capability q159 "
    "also exercises), state bounded by distincts inside the watermark "
    "horizon.  (An approx_count_distinct spelling holds O(sketch) state "
    "instead, but its HLL leaves exact sparse mode by ~100 distincts -- "
    "measured 135 vs 134 at sf0.01 -- so the exact pattern is also the "
    "only oracle-provable one.)  Oracle: batch COUNT(DISTINCT).",
)
def q211_stream_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import run_to_memory
    from ..streaming.source import events_stream

    stream = events_stream(spark, sf_dir).withWatermark("ts", "1 day")
    deduped = stream.select(
        "user_id", F.window("ts", "1 day").alias("w"), "ts"
    ).dropDuplicates(["user_id", "w"])
    agg = deduped.groupBy("w").agg(F.count("*").alias("n_users"))
    table = run_to_memory(agg, output_mode="complete")
    return (
        spark.table(table)
        .select(F.col("w.start").alias("day"), F.col("n_users"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q212: SQL pipe syntax (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "q212_sql_pipe_syntax",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (Spark 4 |> operators): the flagship Q1 shape "
    "respelled as FROM |> WHERE |> AGGREGATE ... GROUP BY |> ORDER BY -- "
    "same Catalyst plan as q01's classic spelling (pipes are pure "
    "surface syntax), proven by the classic-SQL oracle.",
)
def q212_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table as _lt

    _lt(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(COUNT(*) AS BIGINT) AS n
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, n
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# q213: declarative data-quality gate (Deequ/dbt-test analog)
# ---------------------------------------------------------------------------


@register(
    "q213_dq_checks",
    sql="""
    WITH o AS (SELECT * FROM orders),
    li AS (SELECT * FROM lineitem)
    SELECT 'orders.pk_unique' AS rule,
           CAST((SELECT COUNT(*) FROM (SELECT o_orderkey FROM o GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT) AS violations
    UNION ALL
    SELECT 'orders.key_not_null',
           CAST((SELECT count_if(o_orderkey IS NULL) FROM o) AS BIGINT)
    UNION ALL
    SELECT 'orders.price_positive',
           CAST((SELECT count_if(o_totalprice <= 0) FROM o) AS BIGINT)
    UNION ALL
    SELECT 'orders.status_in_domain',
           CAST((SELECT count_if(o_orderstatus NOT IN ('F','O','P')) FROM o) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.fk_has_order',
           CAST((SELECT COUNT(*) FROM li WHERE NOT EXISTS
                 (SELECT 1 FROM o WHERE o.o_orderkey = li.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.discount_in_range',
           CAST((SELECT count_if(l_discount < 0 OR l_discount > 1) FROM li) AS BIGINT)
    ORDER BY rule
    """,
    doc="Declarative data-quality gate (the Deequ / dbt-test shape): named "
    "rules -- primary-key uniqueness, not-null, value domain, range, and "
    "referential integrity -- each reporting its violation count in one "
    "result frame, the artifact a pipeline gates a publish on.  Engine "
    "shapes per rule class: uniqueness is one hash-agg (count>1 groups), "
    "scalar rules fold into a SINGLE shared scan via conditional "
    "aggregation, and the FK rule is a left-anti join (broadcastable "
    "when the parent fits, shuffle otherwise).  All rules over one table "
    "share one pass -- adding a scalar rule costs zero extra scans.",
)
def q213_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    # scalar rules over orders: one shared scan
    o_scalars = o.agg(
        F.count_if(F.col("o_orderkey").isNull()).alias("orders.key_not_null"),
        F.count_if(F.col("o_totalprice") <= 0).alias("orders.price_positive"),
        F.count_if(~F.col("o_orderstatus").isin("F", "O", "P")).alias(
            "orders.status_in_domain"
        ),
    )
    li_scalars = li.agg(
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).alias("lineitem.discount_in_range")
    )
    pk_dups = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orders.pk_unique").alias("rule"), "violations")
    )
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("violations"))
        .select(F.lit("lineitem.fk_has_order").alias("rule"), "violations")
    )

    def melt(agg_df):
        cols = agg_df.columns
        return agg_df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("rule"), F.col(f"`{c}`").alias("violations")
                        )
                        for c in cols
                    ]
                )
            ).alias("e")
        ).select("e.rule", "e.violations")

    return (
        melt(o_scalars)
        .unionByName(melt(li_scalars))
        .unionByName(pk_dups)
        .unionByName(orphans)
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# q214: per-column profiling (Deequ analyzers analog)
# ---------------------------------------------------------------------------


@register(
    "q214_column_profile",
    sql="""
    WITH o AS (SELECT * FROM orders)
    SELECT 'o_custkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(count_if(o_custkey IS NULL) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_custkey), 2) AS min_val,
           ROUND(MAX(o_custkey), 2) AS max_val,
           ROUND(AVG(o_custkey), 2) AS mean_val
    FROM o
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) AS BIGINT), CAST(count_if(o_totalprice IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2),
           ROUND(AVG(o_totalprice), 2)
    FROM o
    UNION ALL
    SELECT 'o_orderkey',
           CAST(COUNT(*) AS BIGINT), CAST(count_if(o_orderkey IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           ROUND(MIN(o_orderkey), 2), ROUND(MAX(o_orderkey), 2),
           ROUND(AVG(o_orderkey), 2)
    FROM o
    ORDER BY column_name
    """,
    doc="Per-column statistical profile (the Deequ analyzer / pandas-"
    "profiling table): count, null count, exact distinct, min/max/mean "
    "per numeric column in long format.  All columns profile in ONE scan "
    "-- the per-column aggregates compute side by side in a single "
    "hash-agg (no shuffle per column), then melt to rows; exact distinct "
    "is the only per-column shuffle and would swap to approx_count_"
    "distinct or the q173 bitmap spelling at 100 TB (noted, not fudged: "
    "this entry keeps the exact form the oracle can prove).",
)
def q214_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}|n"),
            F.count_if(F.col(c).isNull()).alias(f"{c}|n_null"),
            F.countDistinct(c).alias(f"{c}|n_distinct"),
            F.round(F.min(c), 2).cast("double").alias(f"{c}|min_val"),
            F.round(F.max(c), 2).cast("double").alias(f"{c}|max_val"),
            F.round(F.avg(c), 2).alias(f"{c}|mean_val"),
        ]
    wide = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"`{c}|n`").alias("n"),
                F.col(f"`{c}|n_null`").alias("n_null"),
                F.col(f"`{c}|n_distinct`").alias("n_distinct"),
                F.col(f"`{c}|min_val`").alias("min_val"),
                F.col(f"`{c}|max_val`").alias("max_val"),
                F.col(f"`{c}|mean_val`").alias("mean_val"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("e"))
        .select("e.*")
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# q215: fact-fact interval join via binning (range-join at scale)
# ---------------------------------------------------------------------------


@register(
    "q215_binned_interval_join",
    sql="""
    SELECT p.event_id AS win_id, p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_in_window
    FROM events p
    JOIN events e ON e.user_id = p.user_id
                 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY win_id
    """,
    doc="Fact-fact interval join via BINNING: count each user's events "
    "inside the hour after every purchase.  A naive non-equi join between "
    "two large facts plans as BroadcastNestedLoopJoin -- O(n*m) per key "
    "and the classic 100 TB killer (q16's broadcast trick only works "
    "against a tiny dim).  The binned spelling quantizes time into "
    "interval-length bins, explodes each interval to the <=2 bins it "
    "overlaps (bounded because bin width >= interval length), and "
    "equi-joins on (user_id, bin) + the exact residual predicate -- a "
    "hashable join whose candidate set is only same-bin pairs.  Each "
    "(point, interval) pair shares exactly one bin (the point's), so no "
    "dedup is needed.  This is the manual form of Databricks' RANGE_JOIN "
    "hint, which open-source Spark lacks.  The oracle is the naive "
    "inequality join.",
)
def q215_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_us = 3_600_000_000  # 1 hour in microseconds == bin width

    # load_table surfaces ts as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP.
    # tune() pins the session to UTC, so the cast reinterprets, not shifts.
    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    point_bin = F.floor(us(F.col("ts")) / bin_us)
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("win_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    intervals = purch.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(us(F.col("lo")) / bin_us),
                F.floor((us(F.col("hi")) - 1) / bin_us),
            )
        ).alias("bin"),
    )
    points = e.select("user_id", "ts", point_bin.alias("bin"))
    return (
        points.join(
            intervals,
            (points.user_id == intervals.p_user)
            & (points.bin == intervals.bin)
            & (points.ts >= intervals.lo)
            & (points.ts < intervals.hi),
        )
        .groupBy("win_id", "user_id")
        .agg(F.count("*").alias("n_in_window"))
        .orderBy("win_id")
    )


# ---------------------------------------------------------------------------
# q216: VARIANT object explosion (Spark 4 variant_explode)
# ---------------------------------------------------------------------------


@register(
    "q216_variant_explode",
    sql="""
    SELECT event_id, CAST(0 AS INT) AS pos, 'k' AS key,
           json_extract_string(props, '$.k') AS value
    FROM events
    WHERE event_id % 10 = 0
    ORDER BY event_id
    """,
    doc="VARIANT object explosion (Spark 4 LATERAL variant_explode): each "
    "event's semi-structured props parses once to VARIANT and explodes "
    "into (pos, key, value) rows -- the schema-on-read row expansion "
    "that complements q131's path extraction.  Values publish via "
    "to_json(variant) so typed leaves render identically to the JSON "
    "oracle.  Generator runs inline in the scan projection -- no "
    "shuffle before the output sort.",
)
def q216_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    e.createOrReplaceTempView("events_variant")
    return spark.sql(
        """
        SELECT event_id, CAST(v.pos AS INT) AS pos, v.key,
               to_json(v.value) AS value
        FROM events_variant, LATERAL variant_explode(parse_json(props)) AS v
        ORDER BY event_id
        """
    )


# ---------------------------------------------------------------------------
# q217: market-basket co-occurrence (association rules)
# ---------------------------------------------------------------------------


@register(
    "q217_market_basket",
    sql="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets),
    item_supp AS (
        SELECT l_partkey, COUNT(*) AS supp FROM baskets GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS together
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
    SELECT p1, p2, CAST(together AS BIGINT) AS together,
           ROUND(CAST(together AS DOUBLE) / s1.supp, 6) AS confidence,
           ROUND(CAST(together AS DOUBLE) * n_orders.n / (s1.supp * s2.supp), 6) AS lift
    FROM pairs
    JOIN item_supp s1 ON p1 = s1.l_partkey
    JOIN item_supp s2 ON p2 = s2.l_partkey
    CROSS JOIN n_orders
    WHERE together >= 2
    ORDER BY together DESC, p1, p2
    """,
    doc="Market-basket co-occurrence (association rules): parts bought "
    "together in the same order, with support, confidence(p1->p2), and "
    "lift.  The pair expansion is a SELF-JOIN ON THE BASKET KEY -- "
    "quadratic only in basket size (TPC-H baskets are <=7 items; retail "
    "baskets are O(10-100)), never in catalog or order count, which is "
    "why this shape scales where an item-item cross join cannot.  "
    "Per-item supports and the order count are small aggregates that "
    "broadcast into the scoring join; min-support (together >= 2) prunes "
    "the long tail before scoring, the a-priori trick.",
)
def q217_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.select(F.countDistinct("l_orderkey").alias("n"))
    item_supp = baskets.groupBy("l_partkey").agg(F.count("*").alias("supp"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("together"))
        .filter(F.col("together") >= 2)
    )
    s1 = item_supp.select(F.col("l_partkey").alias("p1"), F.col("supp").alias("supp1"))
    s2 = item_supp.select(F.col("l_partkey").alias("p2"), F.col("supp").alias("supp2"))
    return (
        pairs.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "together",
            F.round(F.col("together").cast("double") / F.col("supp1"), 6).alias("confidence"),
            F.round(
                F.col("together").cast("double") * F.col("n") / (F.col("supp1") * F.col("supp2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("together").desc(), "p1", "p2")
    )


# ---------------------------------------------------------------------------
# q218: event-type transition matrix (session path analysis)
# ---------------------------------------------------------------------------


@register(
    "q218_transition_matrix",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events),
    cnt AS (
        SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6) AS p
    FROM cnt
    ORDER BY src, dst
    """,
    doc="Event-type transition matrix (session path analysis): per-user "
    "event sequences (total order ts, event_id) yield (src -> dst) "
    "bigrams via LEAD, then counts normalize to per-source transition "
    "probabilities -- the Markov-chain view of user behavior that feeds "
    "funnel design (q149) and anomaly detection.  One window shuffle on "
    "user_id, one hash-agg on the (src, dst) domain (|event_types|^2 "
    "cells -- tiny), and the normalizing window runs over that tiny "
    "aggregate, not the events.",
)
def q218_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("src")
    return cnt.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wsrc), 6).alias("p"),
    ).orderBy("src", "dst")


# ---------------------------------------------------------------------------
# q219: pagination -- OFFSET vs keyset, proven equivalent
# ---------------------------------------------------------------------------


@register(
    "q219_keyset_pagination",
    sql="""
    WITH page3_offset AS (
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 50 OFFSET 100),
    last_of_page2 AS (
        SELECT MAX(o_orderkey) AS k FROM (
            SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100)),
    page3_keyset AS (
        SELECT o_orderkey, o_totalprice FROM orders, last_of_page2
        WHERE o_orderkey > last_of_page2.k
        ORDER BY o_orderkey LIMIT 50)
    SELECT a.o_orderkey, ROUND(a.o_totalprice, 2) AS price,
           (b.o_orderkey IS NOT NULL) AS keyset_agrees
    FROM page3_offset a LEFT JOIN page3_keyset b ON a.o_orderkey = b.o_orderkey
    ORDER BY a.o_orderkey
    """,
    doc="Pagination two ways, proven equivalent: page 3 (rows 101-150 by "
    "key) via ORDER BY ... LIMIT/OFFSET and via KEYSET predicate "
    "(o_orderkey > last-key-of-page-2), joined to show they return the "
    "identical page.  The point is the scale asymmetry the query "
    "encodes: OFFSET must sort-and-skip all preceding rows every page "
    "(O(page_number) per request), while the keyset predicate pushes "
    "down to the scan and reads only the page -- the deep-pagination "
    "pattern for 100 TB result sets.  Spark 3.4+ df.offset() covers the "
    "API surface.",
)
def q219_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    page3_offset = o.orderBy("o_orderkey").offset(100).limit(50)
    last_key = (
        o.orderBy("o_orderkey").limit(100).agg(F.max("o_orderkey").alias("k"))
    )
    page3_keyset = (
        o.crossJoin(F.broadcast(last_key))
        .filter(F.col("o_orderkey") > F.col("k"))
        .orderBy("o_orderkey")
        .limit(50)
        .select(F.col("o_orderkey").alias("bk"))
    )
    return (
        page3_offset.join(
            page3_keyset, page3_offset.o_orderkey == page3_keyset.bk, "left"
        )
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.col("bk").isNotNull().alias("keyset_agrees"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q220: binary classifier evaluation metrics
# ---------------------------------------------------------------------------


@register(
    "q220_classifier_eval",
    sql="""
    WITH scored AS (
        SELECT (event_type = 'purchase') AS actual, (value >= 100.0) AS predicted
        FROM events),
    c AS (
        SELECT CAST(count_if(actual AND predicted) AS BIGINT) AS tp,
               CAST(count_if(NOT actual AND predicted) AS BIGINT) AS fp,
               CAST(count_if(actual AND NOT predicted) AS BIGINT) AS fn,
               CAST(count_if(NOT actual AND NOT predicted) AS BIGINT) AS tn
        FROM scored)
    SELECT tp, fp, fn, tn,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
           ROUND(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 6) AS f1,
           ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
    FROM c
    """,
    doc="Binary classifier evaluation (confusion counts + precision/recall/"
    "F1/accuracy) in ONE conditional-aggregation pass -- the evaluation "
    "stage every quality-filter model (q184's rules, a fastText-style "
    "scorer over q168's hashed features) needs before deployment.  The "
    "predictor here is a deterministic threshold stand-in (value >= 100 "
    "predicting 'purchase'); the operator under test is the metric "
    "machinery: a single scan, no shuffle (one-row global agg), "
    "NULLIF-guarded against empty classes.",
)
def q220_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    actual = F.col("event_type") == "purchase"
    predicted = F.col("value") >= 100.0
    c = e.agg(
        F.count_if(actual & predicted).alias("tp"),
        F.count_if(~actual & predicted).alias("fp"),
        F.count_if(actual & ~predicted).alias("fn"),
        F.count_if(~actual & ~predicted).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    return c.select(
        "tp", "fp", "fn", "tn",
        F.round(tp.cast("double") / F.nullif(tp + fp, F.lit(0)), 6).alias("precision"),
        F.round(tp.cast("double") / F.nullif(tp + fn, F.lit(0)), 6).alias("recall"),
        F.round(2.0 * tp / F.nullif(2.0 * tp + fp + fn, F.lit(0)), 6).alias("f1"),
        F.round((tp + tn).cast("double") / (tp + fp + fn + tn), 6).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# q221: Benford first-digit analysis (forensic data quality)
# ---------------------------------------------------------------------------


@register(
    "q221_benford_digits",
    sql="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / t.total, 6) AS observed,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_expected,
           ROUND(ABS(CAST(n AS DOUBLE) / t.total - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
    FROM c, t
    ORDER BY digit
    """,
    doc="Benford first-significant-digit analysis (forensic DQ: fabricated "
    "or constrained numeric columns deviate from log10(1+1/d)).  Digit "
    "extraction goes through CENTS-INTEGER STRING (round(x*100) -> "
    "bigint -> first char), not floor(log10) float arithmetic, so both "
    "engines extract identical digits with no ulp edge at powers of 10.  "
    "One scan + a 9-row aggregate; the total re-broadcasts onto the "
    "digit rows.  (TPC-H prices are range-constrained, so the deviation "
    "column is the interesting output -- the op reports, not asserts.)",
)
def q221_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    expected = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed"),
            expected.alias("benford_expected"),
            F.round(
                F.abs(F.col("n").cast("double") / F.col("total") - F.log10(1.0 + 1.0 / F.col("digit"))),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# q222: TF-IDF cosine near-dup pairs (sparse-vector similarity)
# ---------------------------------------------------------------------------

_TFIDF_COS_T = 0.9


@register(
    "q222_tfidf_cosine_pairs",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE length(text) > 0)
        GROUP BY 1, 2),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
    df AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY 1),
    w AS (SELECT doc_id, token, tf * ln(CAST(n.n AS DOUBLE) / df.df) AS w
          FROM tok JOIN df USING (token), n),
    nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
    dots AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, SUM(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT d1, d2, ROUND(dot / (x.nrm * y.nrm), 6) AS cos_sim
    FROM dots JOIN nrm x ON d1 = x.doc_id JOIN nrm y ON d2 = y.doc_id
    WHERE ROUND(dot / (x.nrm * y.nrm), 6) >= {_TFIDF_COS_T}
    ORDER BY d1, d2
    """,
    doc="TF-IDF-weighted cosine near-dup pairs: sparse lexical similarity "
    "through the INVERTED INDEX -- the dot product sums only over shared "
    "tokens (one equi-join on token + hash-agg), never materializing "
    "vectors, which is how sparse similarity joins scale where dense "
    "all-pairs (q114) cannot.  idf weighting means rare-token overlap "
    "drives the score, separating true near-dups from docs that merely "
    f"share stop-words (measured at sf0.01: threshold {_TFIDF_COS_T} "
    "keeps the 22 planted pairs, 99th percentile of background pairs is "
    "0.833).  Completes the lexical-similarity family: Jaccard (q51), "
    "MinHash (q52), SimHash (q53), containment (q185), BM25 (q191).  "
    "At 100 TB the stop-word postings are the skew risk: the idf weight "
    "makes their contribution negligible, so production would prune "
    "df > 50% tokens from the index outright (the standard trick).",
)
def q222_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tok = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    n = tok.select(F.countDistinct("doc_id").alias("n"))
    df_t = tok.groupBy("token").agg(F.count("*").alias("df"))
    w = (
        tok.join(df_t, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("n").cast("double") / F.col("df"))).alias("w"),
        )
        .persist()
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    dots = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    n1 = nrm.select(F.col("doc_id").alias("d1"), F.col("nrm").alias("nrm1"))
    n2 = nrm.select(F.col("doc_id").alias("d2"), F.col("nrm").alias("nrm2"))
    return (
        dots.join(n1, "d1")
        .join(n2, "d2")
        .select(
            "d1",
            "d2",
            F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _TFIDF_COS_T)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# q223: session entry/exit pages + bounce rate
# ---------------------------------------------------------------------------


@register(
    "q223_session_entry_exit",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    sessions AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
    per_session AS (
        SELECT user_id, sid,
               (list(event_type ORDER BY ts, event_id))[1] AS entry_type,
               (list(event_type ORDER BY ts, event_id))[-1] AS exit_type,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sid)
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(count_if(n_events = 1) AS BIGINT) AS n_bounces,
           ROUND(CAST(count_if(n_events = 1) AS DOUBLE) / COUNT(*), 6) AS bounce_rate
    FROM per_session
    GROUP BY entry_type, exit_type
    ORDER BY entry_type, exit_type
    """,
    doc="Session entry/exit analysis + bounce rate: q34's gaps-and-islands "
    "sessionization, then first/last event type per session via "
    "min_by/max_by over the (ts, event_id) total order -- AGGREGATION, "
    "not a second window pass -- and single-event sessions count as "
    "bounces.  The (entry, exit) matrix is the landing/exit-page report; "
    "one window shuffle on user_id, one hash-agg per session, one over "
    "the tiny type-pair domain.",
)
def q223_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0).alias("new_session"),
    )
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum("new_session").over(w2).alias("sid"),
    )
    per_session = sessions.groupBy("user_id", "sid").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("entry_type"),
        F.max_by("event_type", F.struct("ts", "event_id")).alias("exit_type"),
        F.count("*").alias("n_events"),
    )
    return (
        per_session.groupBy("entry_type", "exit_type")
        .agg(
            F.count("*").alias("n_sessions"),
            F.count_if(F.col("n_events") == 1).alias("n_bounces"),
            F.round(
                F.count_if(F.col("n_events") == 1).cast("double") / F.count("*"), 6
            ).alias("bounce_rate"),
        )
        .orderBy("entry_type", "exit_type")
    )


# ---------------------------------------------------------------------------
# q224: record-linkage scoring (Fellegi-Sunter-style field weights)
# ---------------------------------------------------------------------------


@register(
    "q224_record_linkage",
    sql="""
    WITH c AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               substr(c_name, 1, length(c_name) - 2) AS block
        FROM customer),
    pairs AS (
        SELECT a.c_custkey AS id1, b.c_custkey AS id2,
               CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 2.0 ELSE -1.0 END
             + CASE WHEN a.c_nationkey = b.c_nationkey THEN 1.0 ELSE -0.5 END
             + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 0.5 ELSE -0.25 END AS score
        FROM c a JOIN c b ON a.block = b.block AND a.c_custkey < b.c_custkey)
    SELECT id1, id2, ROUND(score, 2) AS score
    FROM pairs
    WHERE score >= 3.0
    ORDER BY id1, id2
    """,
    doc="Record-linkage scoring (Fellegi-Sunter shape): candidate pairs "
    "from a BLOCKING key (name minus its last two characters -> blocks "
    "of <= 100 candidates; a degenerate whole-column block would go "
    "quadratic), then a weighted agreement score "
    "over fields -- fuzzy name (levenshtein <= 2), exact nation, exact "
    "segment -- each contributing a log-odds-style weight, with a "
    "decision threshold.  Complements q151 (which finds matches) by "
    "producing the calibrated SCORE the clerical-review workflow sorts "
    "by.  Blocking bounds the pair space to within-block (never "
    "all-pairs); the scoring is pure codegen on the joined row.",
)
def q224_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        F.expr("substring(c_name, 1, length(c_name) - 2)").alias("block"),
    )
    a, b = c.alias("a"), c.alias("b")
    score = (
        F.when(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 2, 2.0).otherwise(-1.0)
        + F.when(F.col("a.c_nationkey") == F.col("b.c_nationkey"), 1.0).otherwise(-0.5)
        + F.when(F.col("a.c_mktsegment") == F.col("b.c_mktsegment"), 0.5).otherwise(-0.25)
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id1"),
            F.col("b.c_custkey").alias("id2"),
            F.round(score, 2).alias("score"),
        )
        .filter(F.col("score") >= 3.0)
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------------
# q225: golden-record survivorship (master-data merge)
# ---------------------------------------------------------------------------


@register(
    "q225_golden_record",
    sql="""
    WITH clustered AS (SELECT md5(text) AS cluster_id, * FROM documents),
    langs AS (
        SELECT cluster_id, lang, COUNT(*) AS n FROM clustered GROUP BY 1, 2)
    SELECT c.cluster_id,
           CAST(MIN(c.doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           (SELECT (list(l.lang ORDER BY l.n DESC, l.lang ASC))[1]
              FROM langs l WHERE l.cluster_id = c.cluster_id) AS lang_majority,
           CAST(MAX(c.n_chars) AS BIGINT) AS n_chars_best,
           array_to_string(list_sort(list_distinct(list(c.source))), ',') AS sources
    FROM clustered c
    GROUP BY c.cluster_id
    ORDER BY c.cluster_id
    """,
    doc="Golden-record survivorship (master-data merge): duplicate "
    "clusters (exact-hash here; q89's connected components in the fuzzy "
    "case) collapse to one record per cluster with per-field precedence "
    "rules -- lowest id survives, majority vote for lang (deterministic "
    "tie-break), best-value for n_chars, provenance union for source.  "
    "All rules are ASSOCIATIVE aggregates (min, count, mode-via-"
    "deterministic-pick, max, collect_set), so the merge is one "
    "hash-agg on cluster_id with partial aggregation -- no per-cluster "
    "iteration at 100 TB.",
)
def q225_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "cluster_id", F.md5("text")
    )
    return (
        d.groupBy("cluster_id")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("n_members"),
            F.mode("lang", True).alias("lang_majority"),
            F.max("n_chars").alias("n_chars_best"),
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        )
        .orderBy("cluster_id")
    )


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
    from ..operators.dedup import md5_lower64

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    n_chunks = F.ceil(F.size(t) / F.lit(32.0)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(t, i * 32 + 1, 32),
    )
    ct = d.select(
        "doc_id", F.posexplode(chunk_arr).alias("pos", "ctoks")
    ).select("doc_id", "pos", F.explode("ctoks").alias("token"))
    fidx = F.pmod(md5_lower64(F.col("token")), F.lit(_RAG_DIMS))
    sgn = F.when(
        F.pmod(md5_lower64(F.concat(F.lit("s:"), F.col("token"))), F.lit(2)) == 1, 1
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
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("exp1|"), F.col("user_id"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        "control",
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
    "the global rank is ONE total-order window over the already-"
    "collapsed per-customer frame (n_customers rows, not n_orders), and "
    "deciles are a constant-domain rollup.  At 100 TB the rank window "
    "would move to the q193 two-phase bucket ranking; noted, same "
    "result.",
)
def q230_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    ranked = per_cust.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("rev").over(Window.partitionBy()).alias("total"),
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

    d = load_table(spark, sf_dir, "documents")
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
        containment_pairs(d.select("doc_id", "text"), 0.8)
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
    "hash-agg, a rank window over the vocabulary (not the corpus), and "
    "q153's regression aggregates close the fit in the same pass.",
)
def q238_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    freq = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("f"))
    )
    w = Window.orderBy(F.col("f").desc(), F.col("token").asc())
    ranked = freq.withColumn("r", F.row_number().over(w))
    lf = F.log(F.col("f").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return ranked.agg(
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
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("exp1|"), F.col("user_id"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        "control",
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
