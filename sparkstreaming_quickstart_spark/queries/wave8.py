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

from fractions import Fraction

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
    from ..operators.dedup import hashed_shingle_docs

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

    # Round-13 optimization (guide §2.3): the shingle inverted-index join
    # shuffled ~24-char shingle STRINGS from both sides, and each side's
    # shingling subtree was evaluated twice (once for the posting explode,
    # once for the size join).  Hashed shingles (hashed_shingle_docs --
    # Jaccard over the hashed sets equals Jaccard over the string shingles
    # up to negligible 64-bit collisions, the q51/q52 convention, and the
    # windowing mirrors word_shingles exactly) shuffle as 8-byte longs, and
    # the set SIZE rides each posting row so the size joins disappear:
    # every subtree has exactly one consumer.
    def shingled(df):
        return hashed_shingle_docs(
            df.filter(F.size(tokens("text")) >= 3), "text", "doc_id", 3
        )

    # Prefix filter (PPJoin lemma, the q185 pigeonhole in its Jaccard form):
    # jaccard(A, B) >= t implies |A∩B| >= ceil(t*|A|) and >= ceil(t*|B|), so
    # the SMALLEST shared shingle under any fixed global order sits within
    # the first n - ceil(t*n) + 1 shingles of BOTH docs.  Ordering
    # rarest-first (by union df, then h) pushes the corpus-hot shingles out
    # of every prefix, which is what kills the hot-shingle pair blowup:
    # measured at sf1, the unfiltered posting join emitted 15M candidate
    # (bid, hid) pairs -- nearly all batch x hist -- because Zipf-head
    # shingles pair everything with everything.  ceil is EXACT integer math
    # (threshold as num/den; the q185 float-floor counterexample).  The
    # surviving candidates re-verify against the full hashed sets with
    # array_intersect, so emitted values are identical to the unfiltered
    # join -- pinned old-vs-new in tests/test_wave44.py.
    frac = Fraction(str(_INCR_JACCARD_T))
    num, den = frac.numerator, frac.denominator
    bsh = shingled(batch).localCheckpoint(eager=True)
    hsh = shingled(hist).localCheckpoint(eager=True)
    bt = bsh.select(
        F.col("doc_id").alias("bid"), F.col("n_sh").alias("n"), F.explode("xs").alias("h")
    )
    ht = hsh.select(
        F.col("doc_id").alias("hid"), F.col("n_sh").alias("n"), F.explode("xs").alias("h")
    )
    dfreq = (
        bt.select("h")
        .unionAll(ht.select("h"))
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=True)
    )

    def prefix(tok, idc):
        ranked = tok.join(dfreq, "h").withColumn(
            "r", F.row_number().over(Window.partitionBy(idc).orderBy("df", "h"))
        )
        plen = (
            F.col("n")
            - F.expr(f"(n * CAST({num} AS BIGINT) + {den - 1}) div {den}")
            + F.lit(1)
        )
        return ranked.filter(F.col("r") <= plen).select(idc, "h")

    cand = prefix(bt, "bid").join(prefix(ht, "hid"), "h").select("bid", "hid").distinct()
    a1 = bsh.select(F.col("doc_id").alias("bid"), F.col("xs").alias("xs1"), F.col("n_sh").alias("bn"))
    a2 = hsh.select(F.col("doc_id").alias("hid"), F.col("xs").alias("xs2"), F.col("n_sh").alias("hn"))
    near = (
        cand.join(a1, "bid")
        .join(a2, "hid")
        .withColumn("common", F.size(F.array_intersect("xs1", "xs2")))
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
    from ..operators.dedup import md5_bucket

    bucket = md5_bucket(F.col("doc_id"), "split42|", 100).cast("int")
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
                # supp1 * supp2 as BIGINT ANSI-aborts at ~1e10-order counts;
                # the product only feeds this float ratio, so multiply in
                # double (round-7 int-overflow audit).
                F.col("together").cast("double") * F.col("n") / (F.col("supp1").cast("double") * F.col("supp2")),
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
          FROM tok JOIN df USING (token), n
          WHERE df.df * 2 <= n.n),
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
    "through a DF-PRUNED INVERTED INDEX -- tokens with df > 50% never "
    "enter the index (the standard IR stop-word prune, promised in round "
    "8 and implemented in round 10, mirrored exactly in the oracle via "
    "the integer compare df*2 <= n), so no posting list exceeds n/2 and "
    "the token self-join is bounded by rare-token postings instead of "
    "corpus-sized stop-word lists.  The dot product sums only over shared "
    "kept tokens (one equi-join on token + hash-agg), never materializing "
    "vectors -- how sparse similarity joins scale where dense all-pairs "
    "(q114) cannot.  On a realistic Zipf vocabulary the prune removes "
    "only the few true stop-words and idf-weighted cosine is essentially "
    "unchanged; on the driver fixture's degenerate 31-token vocabulary "
    "30/31 tokens exceed 50% df, so the pruned space collapses to the "
    "planted 'dup' marker postings (measured: 300 pairs at sf0.01, 31,125 "
    "at sf0.1, all cos=1.0 in the one-dimensional kept space; the sf0.1 "
    "sentinel dropped from 58.3 s to single digits).  SCALE CLASS: even "
    "pruned, the exact inverted-index join is Sum over kept tokens of "
    "C(df,2) -- measured on a Zipf(1.05, 10k-type) sf1 fixture the tokens "
    "JUST UNDER the 50% cut (df ~ 25k of 50k docs) alone contribute ~1e9 "
    "join rows (41 GB of shuffle spill before the run was stopped; "
    "SCALING.md round-10 note), so this exact form is the ground-truth "
    "twin of the lexical-similarity family, not the 100 TB path -- "
    "production near-dup at cos >= 0.9 generates candidates with MinHash "
    "LSH (q52) or a prefix filter (q185) and verifies exactly, the same "
    "fence as q51/q54/q114/q178.  Completes the lexical-similarity "
    "family: Jaccard (q51), MinHash (q52), SimHash (q53), containment "
    "(q185), BM25 (q191).",
    scale_class="ground-truth",
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
        # df-prune (the standard inverted-index trick, promised by the
        # round-8 docstring and delivered in round 10): tokens appearing in
        # more than half the corpus never enter the index, so no posting
        # list is longer than n/2 and the token self-join's output is
        # bounded by sum(df_t^2) over RARE tokens instead of stop-words.
        # Integer compare (df*2 <= n) is exact in both engines.  Vectors
        # live in the pruned token space: norms and dots both exclude
        # stop-words, exactly as an IR system that drops stop-words at
        # indexing time.  Docs with only pruned tokens leave the index.
        .filter(F.col("df") * 2 <= F.col("n"))
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
    # Comparator cascade (round 13): the 3.0 decision threshold is reachable
    # ONLY when every field agrees -- a single disagreement caps the score
    # at 2.0 + 1.0 - 0.25 = 2.75 -- so the two cheap exact comparators are
    # part of the EQUI-JOIN KEY (block, nation, segment) and the expensive
    # fuzzy comparator runs only on field-agreeing candidates (~1/125 of
    # the block pairs at sf1: 7.4M -> 59k).  The levenshtein itself is the
    # BANDED form: with threshold k the JVM kernel walks a (2k+1)-wide
    # band and bails at first overflow instead of the full n x m DP.
    # Output is unchanged: every emitted pair has all fields agreeing, so
    # its score is exactly 2.0 + 1.0 + 0.5 (the oracle states the general
    # scoring rule; this plan is the standard Fellegi-Sunter cascade --
    # cheapest comparators first -- not a semantic change).
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 2)
    score = (
        F.when((lev >= 0) & (lev <= 2), 2.0).otherwise(-1.0)
        + F.lit(1.0)  # nation agreement, guaranteed by the join key
        + F.lit(0.5)  # segment agreement, guaranteed by the join key
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
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
