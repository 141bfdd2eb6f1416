"""Wave-7 operators (round 2): corpus-hygiene and reconciliation ops.

The dedup family so far (q50-q53, q65, q85, q89) works at document
granularity with symmetric similarity.  This wave adds the three remaining
shapes a production training-data pipeline runs:

* q183 span-level dedup (C4/RefinedWeb style): duplicated SPANS are removed
  across the corpus while the documents survive, so boilerplate shared by
  thousands of pages disappears without dropping the pages.
* q184 rule-based quality filtering (Gopher style): named boolean rules with
  an all-rules verdict, the filter stage that precedes dedup.
* q185 containment near-dup: asymmetric overlap (|A∩B| / min(|A|,|B|))
  catches a small doc embedded inside a big one, which Jaccard-based LSH
  (q52) misses by design; candidates come from a lossless rarest-first
  prefix filter (PPJoin-family), not an all-pairs join.
* q186 SemDeDup: embedding-space near-dup pruning inside pre-assigned
  clusters (Abbas et al. 2023) -- the semantic sibling of q65's LSH pairs.

Reference parity note: the reference (`/root/reference/src/main/java/com/
github/pilillo/Processor.java`) has no analytics surface; these are charter
extensions (SURVEY.md section 2.B, LLM-data-pipeline rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import avg_token_len, token_count, tokens, word_shingles
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q183: corpus-level span dedup (C4 / RefinedWeb line-dedup analogue)
# ---------------------------------------------------------------------------

_SPAN = 8  # tokens per non-overlapping span ("line" stand-in: fixture text has no newlines)


@register(
    "q183_c4_span_dedup",
    sql=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE length(text) > 0),
    idx AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(ceil(len(toks) / {_SPAN}.0) AS BIGINT))) AS pos
        FROM docs),
    spans AS (
        SELECT doc_id, CAST(pos AS INT) AS pos,
               array_to_string(list_slice(toks, pos * {_SPAN} + 1, pos * {_SPAN} + {_SPAN}), ' ') AS span
        FROM idx),
    ranked AS (
        SELECT doc_id, pos, span,
               ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        FROM spans)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
           COALESCE(string_agg(span, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '') AS clean_text
    FROM ranked
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Corpus-level duplicate-span removal (the C4/RefinedWeb 'remove "
    "duplicated lines across the corpus' step): documents split into "
    f"non-overlapping {_SPAN}-token spans, every span occurrence after the "
    "first (global order: doc_id, position) is dropped, and surviving spans "
    "reassemble in order into the cleaned document.  Scale shape: one "
    "narrow projection builds spans (no explode-shuffle), ONE shuffle "
    "hash-partitions by span text for the keep-first window, one shuffle "
    "back to doc_id for reassembly -- never an all-pairs comparison, so it "
    "is linear in corpus size at 100 TB.  Reassembly uses "
    "sort_array(collect_list(struct(pos, span))) so span order is exact "
    "regardless of shuffle arrival order.",
)
def q183_c4_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    n_spans = F.ceil(F.size(t) / F.lit(float(_SPAN))).cast("int")
    span_arr = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(F.slice(t, i * _SPAN + 1, _SPAN), " "),
    )
    spans = d.select(
        "doc_id", F.posexplode(span_arr).alias("pos", "span")
    )
    w = Window.partitionBy("span").orderBy("doc_id", "pos")
    ranked = spans.withColumn("keep", F.row_number().over(w) == 1)
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "span"))
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q184: Gopher-style rule-based quality filter
# ---------------------------------------------------------------------------


@register(
    "q184_gopher_quality",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_len
        FROM documents WHERE length(text) > 0),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(mean_len, 6) AS mean_token_len,
               CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS BIGINT) AS stop_hits,
               ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_frac
        FROM t)
    SELECT doc_id, n_tokens, mean_token_len, stop_hits, distinct_frac,
           (n_tokens BETWEEN 20 AND 500) AS r_length,
           (mean_token_len BETWEEN 2.5 AND 6.5) AS r_word_len,
           (stop_hits >= 1) AS r_stopwords,
           (distinct_frac >= 0.3) AS r_repetition,
           ((n_tokens BETWEEN 20 AND 500) AND (mean_token_len BETWEEN 2.5 AND 6.5)
            AND stop_hits >= 1 AND distinct_frac >= 0.3) AS passes
    FROM m
    ORDER BY doc_id
    """,
    doc="Gopher-style rule-based quality filter (Rae et al. 2021 heuristics "
    "restated for the fixture vocabulary): token-count bounds, mean-word-"
    "length bounds, minimum stop-word evidence, and a distinct-token "
    "repetition floor, each surfaced as a named boolean rule plus the "
    "conjunction verdict.  Entirely codegen expressions in one narrow "
    "projection -- zero shuffles, zero Python -- so the filter stage is "
    "scan-speed at 100 TB and composes in front of the dedup stages "
    "(compare q86, which chains a simpler gate).",
)
def q184_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = tokens("text")
    m = d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(avg_token_len("text"), 6).alias("mean_token_len"),
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast("long").alias("stop_hits"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("distinct_frac"),
    )
    r_length = F.col("n_tokens").between(20, 500)
    r_word_len = F.col("mean_token_len").between(2.5, 6.5)
    r_stop = F.col("stop_hits") >= 1
    r_rep = F.col("distinct_frac") >= 0.3
    return m.select(
        "*",
        r_length.alias("r_length"),
        r_word_len.alias("r_word_len"),
        r_stop.alias("r_stopwords"),
        r_rep.alias("r_repetition"),
        (r_length & r_word_len & r_stop & r_rep).alias("passes"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q185: containment near-dup with a lossless prefix filter
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.8


@register(
    "q185_containment_neardup",
    sql=f"""
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
    SELECT id1, id2,
           ROUND(CAST(common AS DOUBLE) / LEAST(s1.n, s2.n), 9) AS containment
    FROM pairs JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
    WHERE ROUND(CAST(common AS DOUBLE) / LEAST(s1.n, s2.n), 9) >= {_CONTAIN_T}
    ORDER BY id1, id2
    """,
    doc="Asymmetric containment near-dup: |A∩B| / min(|A|,|B|) >= "
    f"{_CONTAIN_T} over 3-word shingles, catching a short document embedded "
    "in a long one -- a pair class Jaccard LSH (q52) misses because the "
    "union term dilutes the score.  Scale path: candidates come from a "
    "LOSSLESS rarest-first prefix filter (PPJoin family): shingles are "
    "ranked per-doc by ascending global document frequency and only the "
    f"first floor((1-{_CONTAIN_T})*|d|)+1 enter the index probe; by "
    "pigeonhole any pair with overlap >= t*|small| must collide inside the "
    "smaller doc's prefix, so recall is exactly 1.0 while the join touches "
    "~20% of the postings and the rarest (= smallest) buckets.  Exact "
    "verification then counts the true intersection for candidates only.  "
    "The oracle is the unfiltered all-pairs formulation -- identical "
    "results prove the filter lossless.",
)
def q185_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(d, _CONTAIN_T).orderBy("id1", "id2")


def containment_pairs(d: DataFrame, threshold: float) -> DataFrame:
    """(id1, id2, containment) pairs at |A∩B|/min(|A|,|B|) >= threshold over
    3-word shingles, via the lossless rarest-first prefix filter described
    in q185's docstring.  `d` needs (doc_id, text)."""
    # The shingle frame feeds the index build AND both verify sides, and the
    # posting list feeds three consumers (df counts, prefix ranking, the
    # candidate probe); materialize each once instead of re-shingling the
    # corpus per consumer.  At 100 TB this is the "build the inverted index,
    # then join against it" shape (MEMORY_AND_DISK spills instead of
    # recomputing).
    sh = (
        d.select("doc_id", word_shingles("text", 3).alias("sh"))
        .filter(F.size(tokens("text")) >= 3)
        .persist()
    )
    tok = sh.select("doc_id", F.explode("sh").alias("shingle")).persist()

    # Rarest-first prefix: rank each doc's shingles by global df, keep the
    # first floor((1-t)*n)+1.  Lossless for containment at threshold t.
    freq = tok.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = tok.join(freq, "shingle").withColumn(
        "r",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "shingle")),
    ).withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    prefix = ranked.filter(
        F.col("r") <= F.floor((1.0 - threshold) * F.col("n")) + 1
    ).select("doc_id", "shingle")

    cand = (
        prefix.alias("p")
        .join(tok.alias("q"), "shingle")
        .filter(F.col("p.doc_id") != F.col("q.doc_id"))
        .select(
            F.least("p.doc_id", "q.doc_id").alias("id1"),
            F.greatest("p.doc_id", "q.doc_id").alias("id2"),
        )
        .distinct()
    )

    # Exact verify: join each candidate pair to the two shingle ARRAYS and
    # intersect in codegen.  The candidate set is loose (any shared rare
    # shingle qualifies), so expanding candidates back through the posting
    # list (join + groupBy count) multiplies 100x before shrinking; the
    # array_intersect spelling verifies each pair in O(|sh|) right where it
    # sits -- measured 5.7s -> ~2s at sf0.1 on 180k candidates.
    s1 = sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.size(F.array_intersect("sh1", "sh2")).cast("double")
                / F.least(F.size("sh1"), F.size("sh2")),
                9,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# q186: SemDeDup -- within-cluster embedding-cosine pruning
# ---------------------------------------------------------------------------

_SEMDEDUP_T = 0.35


@register(
    "q186_semdedup",
    sql=f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
    dropped AS (
        SELECT DISTINCT y.vec_id
        FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id
        WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) >= {_SEMDEDUP_T})
    SELECT e.vec_id, e.label,
           (e.vec_id IN (SELECT vec_id FROM dropped)) AS is_dup
    FROM e
    ORDER BY e.vec_id
    """,
    doc="SemDeDup (Abbas et al. 2023): semantic dedup by pruning, inside "
    "each pre-assigned embedding cluster, every vector whose cosine to a "
    f"lower-id cluster-mate reaches {_SEMDEDUP_T} (greedy-by-id variant -- "
    "deterministic and SQL-checkable).  Clusters here are the fixture's "
    "`label` column, standing in for the upstream k-means assignment "
    "(q124 computes exactly that); the within-cluster pair join is the "
    "SemDeDup design itself -- quadratic only inside a cluster, so at "
    "100 TB cluster count is sized to keep clusters ~constant (paper uses "
    "k ~ sqrt(n)), and the join shuffles once on label with per-vector "
    "norms precomputed, never recomputed per pair.",
)
def q186_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        # SemDeDup as the paper runs it: the whole cluster's similarity
        # matrix in one dense matmul.  Rounding to 9 digits mirrors the
        # oracle's ROUND(...,9) threshold; matmul-vs-sequential-fold float
        # divergence is far below that.
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        v = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((v * v).sum(axis=1))
        nrm[nrm == 0.0] = np.nan  # zero vectors never match (cos undefined)
        sims = np.round((v @ v.T) / np.outer(nrm, nrm), 9)
        n = len(pdf)
        mask = np.tril(np.ones((n, n), dtype=bool), k=-1)  # i < j pairs (rows j)
        is_dup = np.nansum((sims >= _SEMDEDUP_T) & mask.T, axis=0) > 0
        return pd.DataFrame(
            {"vec_id": pdf["vec_id"], "label": pdf["label"], "is_dup": is_dup}
        )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        e.groupBy("label")
        .applyInPandas(prune, "vec_id long, label int, is_dup boolean")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q187: table checksum / replica reconciliation
# ---------------------------------------------------------------------------


@register(
    "q187_table_checksum",
    sql="""
    WITH h AS (
        SELECT o_orderpriority,
               CAST(CAST('0x' || substr(md5(concat_ws('|',
                   o_orderkey, o_custkey, o_orderstatus,
                   CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR),
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                   o_orderpriority)), 1, 15) AS BIGINT) AS HUGEINT) AS rh
        FROM orders)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rh) AS VARCHAR) AS checksum
    FROM h GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Order-independent table checksum for replica reconciliation: each "
    "row renders to a canonical string (explicit decimal/timestamp "
    "formats, so the fingerprint is engine-portable), hashes to a 60-bit "
    "integer (md5 prefix), and the per-group checksum is the SUM of row "
    "hashes -- commutative/associative, so partial aggregation works and "
    "two copies of a 100 TB table compare by exchanging five (group, "
    "count, checksum) rows instead of any data.  One hash-agg, no joins; "
    "the DuckDB oracle recomputes the identical fingerprint, which is the "
    "reconciliation use-case itself.",
)
def q187_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    payload = F.concat_ws(
        "|",
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).cast("decimal(18,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        "o_orderpriority",
    )
    row_hash = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        o.select("o_orderpriority", row_hash.alias("rh"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("rh").cast("string").alias("checksum"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q188: snapshot diff (CDC-style change detection between table versions)
# ---------------------------------------------------------------------------


@register(
    "q188_snapshot_diff",
    sql="""
    WITH a AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr FROM orders),
    b AS (
        SELECT k, st, CASE WHEN k % 20 = 1 THEN pr + 1.0 ELSE pr END AS pr
        FROM a WHERE k % 20 <> 0
        UNION ALL
        SELECT k + 100000000, st, pr FROM a WHERE k % 20 = 2),
    j AS (
        SELECT COALESCE(a.k, b.k) AS o_orderkey,
               a.st AS ast, b.st AS bst, a.pr AS apr, b.pr AS bpr,
               a.k IS NULL AS ins, b.k IS NULL AS del
        FROM a FULL JOIN b ON a.k = b.k)
    SELECT o_orderkey,
           CASE WHEN ins THEN 'insert' WHEN del THEN 'delete' ELSE 'update' END AS change_type,
           ROUND(apr, 2) AS old_price, ROUND(bpr, 2) AS new_price,
           CASE WHEN ins OR del THEN ''
                ELSE concat_ws(',',
                    CASE WHEN ast IS DISTINCT FROM bst THEN 'o_orderstatus' END,
                    CASE WHEN apr IS DISTINCT FROM bpr THEN 'o_totalprice' END)
           END AS changed_cols
    FROM j
    WHERE ins OR del OR ast IS DISTINCT FROM bst OR apr IS DISTINCT FROM bpr
    ORDER BY o_orderkey, change_type
    """,
    doc="CDC-style snapshot diff: two versions of a table full-outer join on "
    "the primary key and classify every key as insert / delete / update "
    "(with the list of changed columns), dropping unchanged rows via "
    "null-safe comparison.  The second snapshot is synthesized "
    "deterministically from orders (key%20 buckets: deletes, +1.00 price "
    "updates, shifted-key inserts) so both engines derive it identically.  "
    "Scale shape: one shuffle on the join key; AQE handles the skewless "
    "equi-join, and unchanged rows -- the overwhelming majority in a real "
    "diff -- are filtered before any further processing, so output is "
    "proportional to the churn, not the table.",
)
def q188_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("pr"),
    )
    k = F.col("k")
    b = o.filter(k % 20 != 0).withColumn(
        "pr", F.when(k % 20 == 1, F.col("pr") + 1.0).otherwise(F.col("pr"))
    ).unionByName(
        o.filter(k % 20 == 2).select(
            (k + 100000000).alias("k"), "st", "pr"
        )
    )
    j = o.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full")
    ins = F.col("a.k").isNull()
    dele = F.col("b.k").isNull()
    st_diff = ~F.col("a.st").eqNullSafe(F.col("b.st"))
    pr_diff = ~F.col("a.pr").eqNullSafe(F.col("b.pr"))
    return (
        j.select(
            F.coalesce("a.k", "b.k").alias("o_orderkey"),
            F.when(ins, "insert").when(dele, "delete").otherwise("update").alias("change_type"),
            F.round("a.pr", 2).alias("old_price"),
            F.round("b.pr", 2).alias("new_price"),
            F.when(ins | dele, "").otherwise(
                F.concat_ws(
                    ",",
                    F.when(st_diff, "o_orderstatus"),
                    F.when(pr_diff, "o_totalprice"),
                )
            ).alias("changed_cols"),
            (ins | dele | st_diff | pr_diff).alias("_changed"),
        )
        .filter("_changed")
        .drop("_changed")
        .orderBy("o_orderkey", "change_type")
    )


# ---------------------------------------------------------------------------
# q189: deterministic mode / count_if aggregates
# ---------------------------------------------------------------------------


@register(
    "q189_mode_countif",
    sql="""
    WITH c AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS n
        FROM orders GROUP BY 1, 2),
    m AS (
        SELECT s, (list(p ORDER BY n DESC, p ASC))[1] AS mode_priority
        FROM c GROUP BY s),
    b AS (
        SELECT o_orderstatus AS s,
               CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY 1)
    SELECT b.s AS o_orderstatus, m.mode_priority, b.n_big, b.n_rows
    FROM b JOIN m ON b.s = m.s
    ORDER BY o_orderstatus
    """,
    doc="Deterministic mode() (Spark 4 deterministic=true: smallest value "
    "among frequency ties, spelled out as an ordered-list pick in the "
    "oracle) plus count_if -- the last uncovered members of the aggregate "
    "function library (SURVEY section 2.B agg row).  Single hash-agg on a "
    "low-cardinality key; mode's internal state is a per-group value->count "
    "map, bounded here by the priority domain (5), which is the condition "
    "that makes mode() safe at 100 TB.",
)
def q189_mode_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.mode("o_orderpriority", True).alias("mode_priority"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q190: exact median over a sliding window frame
# ---------------------------------------------------------------------------


@register(
    "q190_window_median",
    sql="""
    SELECT user_id, event_id, ROUND(value, 6) AS value,
           ROUND(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Exact running median over a 5-row sliding frame per user (the "
    "robust-statistics sibling of q136's rolling z-score).  Spark has no "
    "inverse-distribution aggregate over window frames (median/percentile_"
    "cont reject ORDER BY frames), so the engine spelling is collect_list "
    "over the bounded frame -> array_sort -> midpoint average, which is "
    "exactly percentile_cont(0.5) for the frame.  State per row is the "
    "5-element frame -- O(frame), not O(history) -- so the window shuffle "
    "on user_id is the only cost at 100 TB; the total order (ts, event_id) "
    "makes the result deterministic.  Oracle uses DuckDB's native frame "
    "median.",
)
def q190_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    lst = F.array_sort(F.collect_list("value").over(w))
    n = F.size(lst)
    lo = F.element_at(lst, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(lst, (F.floor(n / 2) + 1).cast("int"))
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round((lo + hi) / 2.0, 6).alias("med"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# q191: BM25 lexical retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "query", "fast")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "q191_bm25_search",
    sql=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE length(text) > 0),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM d),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS token FROM d)
        WHERE token IN ('spark', 'query', 'fast')
        GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    dl AS (SELECT doc_id, len(toks) AS dl FROM d),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
               ) AS score
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
        GROUP BY tf.doc_id)
    SELECT doc_id, ROUND(score, 6) AS score, rank FROM (
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id ASC) AS INT) AS rank
        FROM scored)
    WHERE rank <= 20
    ORDER BY rank
    """,
    doc="BM25 lexical retrieval (Okapi, Lucene-style +1 idf floor; k1="
    f"{_BM25_K1}, b={_BM25_B}): top-20 documents for a fixed term set -- "
    "the sparse-retrieval twin of the dense ANN path (q54/q55), covering "
    "the other half of a hybrid-search training-data pipeline.  Scale "
    "shape: the token explode is filtered to query terms BEFORE any "
    "shuffle (predicate on the generator output), so the per-(doc,term) "
    "tf agg touches only matching postings; corpus stats (N, avgdl) and "
    "per-term df are tiny aggregates that broadcast into the scoring "
    "join; the only O(corpus) shuffle is the tf hash-agg.",
)
def q191_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", tokens("text").alias("toks"))
    )
    stats = d.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    term_score = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
        .select("doc_id", F.round("score", 6).alias("score"))
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q192: positional inverted index
# ---------------------------------------------------------------------------


@register(
    "q192_inverted_index",
    sql="""
    WITH pos AS (
        SELECT doc_id, unnest(toks) AS token,
               CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
              WHERE length(text) > 0))
    SELECT token,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS cf,
           string_agg(doc_id || ':' || pos, ',' ORDER BY doc_id, pos) AS postings
    FROM pos
    GROUP BY token
    ORDER BY token
    """,
    doc="Positional inverted index (the search-engine build step): token -> "
    "document frequency, collection frequency, and the ordered "
    "'doc:position' posting list.  posexplode keeps token order as 0-based "
    "positions; one shuffle groups by token, and postings reassemble "
    "deterministically via sort_array(collect_list(struct)) exactly like "
    "q183's span reassembly.  At 100 TB posting lists for stop-words are "
    "the skew risk -- the same hot-key territory as q147's salted join; "
    "production would shard postings by (token, doc_id range), noted here "
    "because the fixture vocabulary (~30 terms) keeps lists small.",
)
def q192_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", F.posexplode(tokens("text")).alias("pos", "token"))
    )
    return (
        d.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "pos"))),
                    lambda s: F.concat_ws(":", s["doc_id"], s["pos"]),
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy("token")
    )


# ---------------------------------------------------------------------------
# q193: contiguous global id assignment without a single-partition window
# ---------------------------------------------------------------------------

_ID_BUCKETS = 16


@register(
    "q193_contiguous_ids",
    sql="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS gid
    FROM documents
    ORDER BY doc_id
    """,
    doc="Contiguous global id assignment (0..n-1 by key order) WITHOUT the "
    "naive row_number()-over-everything, whose single-partition window is "
    "the classic 100 TB bottleneck.  Deterministic two-phase plan: rows "
    "bucket by a width_bucket range split on the key (no sampling, unlike "
    "repartitionByRange, so the two passes cannot disagree), per-bucket "
    "counts roll into exclusive prefix offsets (a 16-row window -- "
    "driver-scale metadata, same pattern as q141's shard offsets), and "
    "gid = bucket_offset + intra-bucket rank, where the rank window "
    "parallelizes across buckets.  The oracle is the naive spelling -- "
    "identical output, scalable plan.",
)
def q193_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    rng = d.agg(
        F.min("doc_id").alias("lo"), (F.max("doc_id") + 1).alias("hi")
    )
    bucketed = d.crossJoin(F.broadcast(rng)).select(
        "doc_id",
        F.width_bucket("doc_id", "lo", "hi", F.lit(_ID_BUCKETS)).alias("b"),
    )
    counts = bucketed.groupBy("b").agg(F.count("*").alias("n"))
    offsets = counts.select(
        "b",
        (
            F.sum("n").over(
                Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("off"),
    ).fillna(0, ["off"])
    ranked = bucketed.withColumn(
        "r", F.row_number().over(Window.partitionBy("b").orderBy("doc_id"))
    )
    return (
        ranked.join(F.broadcast(offsets), "b")
        .select("doc_id", (F.col("off") + F.col("r") - 1).cast("bigint").alias("gid"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q194: equal-frequency (quantile) binning via ntile
# ---------------------------------------------------------------------------


@register(
    "q194_ntile_binning",
    sql="""
    WITH b AS (
        SELECT o_orderpriority,
               CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey) AS INT) AS bin,
               o_totalprice
        FROM orders)
    SELECT o_orderpriority, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM b
    GROUP BY o_orderpriority, bin
    ORDER BY o_orderpriority, bin
    """,
    doc="Equal-frequency (quantile) feature binning via ntile(4) per group "
    "-- the complement of q182's equi-width width_bucket: bin edges adapt "
    "to the distribution so each bin holds n/4 rows.  Total order "
    "(o_totalprice, o_orderkey) makes tile assignment deterministic.  One "
    "window shuffle on the group key, then a hash-agg on (group, bin); at "
    "100 TB per-group ntile needs the whole group in one partition, so "
    "grouped binning stays safe while GLOBAL ntile would not -- the "
    "global variant should derive cutpoints from approx_percentile "
    "(q69) and assign via width_bucket instead.",
)
def q194_ntile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    b = o.select(
        "o_orderpriority", F.ntile(4).over(w).cast("int").alias("bin"), "o_totalprice"
    )
    return (
        b.groupBy("o_orderpriority", "bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority", "bin")
    )


# ---------------------------------------------------------------------------
# q195: map higher-order functions
# ---------------------------------------------------------------------------


@register(
    "q195_map_hof",
    sql="""
    WITH e AS (
        SELECT event_id, user_id, value FROM events),
    entries AS (
        SELECT event_id, 'v2x' AS key, ROUND(value * 2, 6) AS val FROM e
        UNION ALL
        SELECT event_id, 'vlog', ROUND(ln(abs(value) + 1.0), 6) FROM e
        UNION ALL
        SELECT event_id, 'uid', CAST(user_id AS DOUBLE) FROM e)
    SELECT event_id, key, val
    FROM entries
    WHERE val > 1.0
    ORDER BY event_id, key
    """,
    doc="Map higher-order functions (the last uncovered scalar group: "
    "transform_values, map_filter, map_entries): each event builds a "
    "string->double map, transform_values derives per-key features, "
    "map_filter prunes entries <= 1.0, and map_entries -> explode yields "
    "the surviving (key, value) rows.  The oracle reconstructs the same "
    "rows from first principles (static keys -> UNION ALL + WHERE), so "
    "the map algebra itself is what's under test.  All codegen, one "
    "narrow projection + generator -- no shuffle until the output sort.",
)
def q195_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("v2x"), F.round(F.col("value") * 2, 6),
        F.lit("vlog"), F.round(F.log(F.abs(F.col("value")) + 1.0), 6),
        F.lit("uid"), F.col("user_id").cast("double"),
    )
    filtered = F.map_filter(m, lambda k, v: v > 1.0)
    return (
        e.select("event_id", F.explode(F.map_entries(filtered)).alias("ent"))
        .select(
            "event_id",
            F.col("ent.key").alias("key"),
            F.col("ent.value").alias("val"),
        )
        .orderBy("event_id", "key")
    )


# ---------------------------------------------------------------------------
# q196: deterministic AES column protection roundtrip
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"


@register(
    "q196_aes_roundtrip",
    sql="""
    SELECT doc_id,
           sha256(text) AS text_digest,
           TRUE AS roundtrip_ok
    FROM documents
    ORDER BY doc_id
    """,
    doc="Column-level encryption roundtrip (aes_encrypt/aes_decrypt, ECB "
    "for determinism -- GCM's random IV would break both reprodicibility "
    "and the equality check): PII columns encrypt at rest, decrypt "
    "in-flight, and the query proves decrypt(encrypt(x)) == x per row "
    "while publishing only the sha2 digest (the PII-safe join key, "
    "complementing q110's masking).  The oracle checks the digest and "
    "the roundtrip flag from first principles; the crypto runs entirely "
    "in codegen (JVM), no Python.",
)
def q196_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dec = F.expr(
        f"cast(aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'), '{_AES_KEY}', 'ECB') as string)"
    )
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("text_digest"),
        (dec == F.col("text")).alias("roundtrip_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q197: Z-order (Morton) interleave for multi-dimensional data layout
# ---------------------------------------------------------------------------

_Z_BITS = 16


def z_interleave(xk, xp):
    """Morton/Z-value: bit-interleave two _Z_BITS-wide non-negative ints.

    Unrolled shift/mask terms, all codegen (shiftleft needs a literal bit
    count, so the fold unrolls in Python at plan time).
    """
    z_val = F.lit(0).cast("bigint")
    for i in range(_Z_BITS):
        z_val = (
            z_val
            + F.shiftleft(F.shiftright(xk, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(xp, i).bitwiseAND(1), 2 * i)
        )
    return z_val


@register(
    "q197_zorder_layout",
    sql=f"""
    WITH rng AS (
        SELECT min(o_custkey) AS klo, max(o_custkey) AS khi,
               min(o_totalprice) AS plo, max(o_totalprice) AS phi
        FROM orders),
    nrm AS (
        SELECT o_orderkey,
               CAST(floor((o_custkey - klo) * ({(1 << _Z_BITS) - 1}.0) / NULLIF(khi - klo, 0)) AS BIGINT) AS xk,
               CAST(floor((o_totalprice - plo) * ({(1 << _Z_BITS) - 1}.0) / NULLIF(phi - plo, 0)) AS BIGINT) AS xp
        FROM orders, rng),
    z AS (
        SELECT o_orderkey,
               list_sum(list_transform(range(0, {_Z_BITS}),
                   i -> (((xk >> i) & 1) << (2 * i + 1)) + (((xp >> i) & 1) << (2 * i)))) AS z_value
        FROM nrm)
    SELECT CAST(z_value // 1073741824 AS INT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(z_value) AS BIGINT) AS z_min,
           CAST(MAX(z_value) AS BIGINT) AS z_max
    FROM z
    GROUP BY 1 ORDER BY 1
    """,
    doc="Z-order (Morton) layout key: bit-interleave two normalized 16-bit "
    "dimensions (o_custkey, o_totalprice) so range-partitioning on z_value "
    "clusters rows that are close in BOTH dimensions -- the data-layout "
    "technique behind multi-dimensional min/max file skipping (Delta "
    "OPTIMIZE ZORDER): after `repartitionByRange(z).sortWithinPartitions(z)`"
    " + parquet write, a predicate on either dimension prunes most files "
    "by footer stats.  The interleave is a pure codegen fold "
    "(aggregate over bit positions, no UDF); output summarizes occupancy "
    "per coarse z-bucket, and the oracle replays the identical bit "
    "arithmetic.",
)
def q197_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_custkey").alias("klo"),
        F.max("o_custkey").alias("khi"),
        F.min("o_totalprice").alias("plo"),
        F.max("o_totalprice").alias("phi"),
    )
    top = float((1 << _Z_BITS) - 1)
    nrm = o.crossJoin(F.broadcast(rng)).select(
        "o_orderkey",
        F.floor(
            (F.col("o_custkey") - F.col("klo")) * top
            / F.nullif(F.col("khi") - F.col("klo"), F.lit(0))
        ).alias("xk"),
        F.floor(
            (F.col("o_totalprice") - F.col("plo")) * top
            / F.nullif(F.col("phi") - F.col("plo"), F.lit(0.0))
        ).alias("xp"),
    )
    z_val = z_interleave(F.col("xk"), F.col("xp"))
    z = nrm.select("o_orderkey", z_val.alias("z_value"))
    return (
        z.groupBy(
            F.floor(F.col("z_value") / F.lit(1073741824)).cast("int").alias("z_bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("z_value").alias("z_min"),
            F.max("z_value").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# q198: distinct count over a sliding window frame
# ---------------------------------------------------------------------------


@register(
    "q198_window_count_distinct",
    sql="""
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS INT) AS n_types
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Distinct count over a sliding frame (Spark rejects DISTINCT "
    "aggregates in windows, so the engine spelling is collect_list over "
    "the bounded frame -> array_distinct -> size -- exact, O(frame) "
    "state like q190's median).  DuckDB supports the native DISTINCT "
    "window, which is the oracle.  Used in feature pipelines as 'variety "
    "in the last N actions' per user; one window shuffle on user_id.",
)
def q198_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    return e.select(
        "user_id",
        "event_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("int")
        .alias("n_types"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# q199: Pearson correlation matrix (MLlib Correlation)
# ---------------------------------------------------------------------------

_CORR_DIMS = 4

_CORR_ORACLE = (
    "WITH v AS (SELECT "
    + ", ".join(
        f"CAST(embedding[{i+1}] AS DOUBLE) AS d{i}" for i in range(_CORR_DIMS)
    )
    + " FROM embeddings) "
    + " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, ROUND(corr(d{i}, d{j}), 6) AS corr FROM v"
        for i in range(_CORR_DIMS)
        for j in range(_CORR_DIMS)
    )
    + " ORDER BY i, j"
)


@register(
    "q199_corr_matrix",
    sql=_CORR_ORACLE,
    doc="Pearson correlation matrix over the first 4 embedding dimensions "
    "via MLlib's Correlation.corr on an array_to_vector column -- the "
    "matrix sibling of q153's per-pair regression aggregates.  The "
    "distributed part is one pass computing the Gramian (same shape as "
    "q148); only the 4x4 result matrix lands on the driver (bounded "
    "model-state collect, like q124's centroids), then re-emits as "
    "(i, j, corr) rows.  Oracle: 16 DuckDB corr() aggregates.",
)
def q199_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Correlation

    e = load_table(spark, sf_dir, "embeddings").select(
        array_to_vector(
            F.slice(F.col("embedding").cast("array<double>"), 1, _CORR_DIMS)
        ).alias("features")
    )
    mat = Correlation.corr(e, "features").head()[0].toArray()
    rows = [
        (i, j, round(float(mat[i][j]), 6))
        for i in range(_CORR_DIMS)
        for j in range(_CORR_DIMS)
    ]
    return spark.createDataFrame(rows, "i int, j int, corr double").orderBy("i", "j")


# ---------------------------------------------------------------------------
# q200: corpus-preparation pipeline v2 (capstone composition)
# ---------------------------------------------------------------------------


@register(
    "q200_corpus_pipeline_v2",
    sql=f"""
    WITH t AS (
        SELECT doc_id, text, lang, string_split(text, ' ') AS toks,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_len
        FROM documents WHERE length(text) > 0),
    gate AS (
        SELECT doc_id, text, lang, len(toks) AS n_tokens FROM t
        WHERE len(toks) BETWEEN 20 AND 500
          AND ROUND(mean_len, 6) BETWEEN 2.5 AND 6.5
          AND len(list_filter(toks, x -> x = 'the' OR x = 'a')) >= 1
          AND ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.3),
    exact AS (
        SELECT doc_id, text, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gate),
    uniq AS (SELECT doc_id, text, lang, n_tokens FROM exact WHERE rn = 1),
    docs AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM uniq)
        WHERE len(toks) >= 3),
    tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    contained AS (
        SELECT DISTINCT id2 AS doc_id
        FROM pairs JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
        WHERE ROUND(CAST(common AS DOUBLE) / LEAST(s1.n, s2.n), 9) >= {_CONTAIN_T}),
    final AS (
        SELECT u.* FROM uniq u LEFT JOIN contained c ON u.doc_id = c.doc_id
        WHERE c.doc_id IS NULL)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM final GROUP BY lang ORDER BY lang
    """,
    doc="Corpus-preparation pipeline v2 (capstone composing the wave-7 "
    "stages in production order): Gopher rule gate (q184) -> exact dedup "
    "keep-first (q50) -> containment near-dup prune dropping the "
    "higher-id member of every doc-in-doc pair (q185's prefix-filtered "
    "candidates) -> per-language corpus stats.  One oracle over the whole "
    "chain proves the stage composition, not just the stages.  Scale: "
    "every stage is the bucketed/prefix-filtered form; the filter gate "
    "runs FIRST so each later stage touches only surviving docs -- stage "
    "order is itself the 100 TB optimization (compare q86, the v1 chain "
    "with the simpler quality gate and Jaccard-LSH dedup).",
)
def q200_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = tokens("text")
    gate = d.select(
        "doc_id", "text", "lang", token_count("text").alias("n_tokens")
    ).filter(
        token_count("text").between(20, 500)
        & F.round(avg_token_len("text"), 6).between(2.5, 6.5)
        & (F.size(F.filter(toks, lambda x: x.isin("the", "a"))) >= 1)
        & (
            F.round(
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
            )
            >= 0.3
        )
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        gate.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    contained = (
        containment_pairs(uniq.select("doc_id", "text"), _CONTAIN_T)
        .select(F.col("id2").alias("doc_id"))
        .distinct()
    )
    final = uniq.join(contained, "doc_id", "left_anti")
    return (
        final.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("lang")
    )


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
