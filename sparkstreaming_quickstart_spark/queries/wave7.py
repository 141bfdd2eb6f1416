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

from fractions import Fraction

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
    "first n - ceil(t*n) + 1 enter the index probe, with ceil(t*n) spelled "
    "in exact integer math as (num*n + den - 1) div den for t = num/den "
    "(the float spelling floor((1-t)*n)+1 loses the boundary slot at every "
    "n divisible by den); by pigeonhole any pair with overlap >= "
    "ceil(t*|small|) must collide inside the smaller doc's prefix, so "
    "recall is exactly 1.0 while the join touches "
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
    in q185's docstring.  `d` needs (doc_id, text).

    Round-14 spelling (guide §2.3 narrower types, the q203/q51 convention):
    shingles post as 8-byte xxhash64 LONGS (hashed_shingle_docs -- the hash
    is injective up to negligible 64-bit collisions, so intersection counts,
    set sizes, and therefore every emitted containment double are identical
    to the string-shingle spelling), the set size rides each posting row
    (no size join-back), and the shingled frame is checkpointed ONCE for its
    five consumers (df counts, prefix ranking, the candidate probe, both
    verify sides) instead of persisting two string-array frames.  The
    rarest-first tie-break is now (df, h) instead of (df, shingle-string):
    the prefix lemma is pure pigeonhole -- ANY fixed per-doc enumeration
    works -- so the candidate set may differ but recall stays exactly 1.0
    and the exact verify emits the identical pair set."""
    from ..operators.dedup import hashed_shingle_docs

    docs = hashed_shingle_docs(
        d.filter(F.size(tokens("text")) >= 3), "text", "doc_id", 3
    ).localCheckpoint(eager=True)
    tok = docs.select("doc_id", F.col("n_sh").alias("n"), F.explode("xs").alias("h"))

    # Rarest-first prefix: rank each doc's shingles by global df, keep the
    # first p = n - ceil(t*n) + 1.  Lossless for containment at threshold t
    # by pigeonhole: the smallest qualifying overlap is ceil(t*n), and any
    # ceil(t*n) shingles out of n must intersect the first n - ceil(t*n) + 1.
    # CRITICAL: the arithmetic must be EXACT INTEGER math.  The float
    # spelling floor((1-t)*n)+1 silently loses a slot whenever (1-t)*n lands
    # just under an integer -- at t=0.8, (1.0-0.8)=0.19999...96 so every n
    # divisible by 5 floors one short and the filter drops boundary pairs
    # (round-5 hypothesis counterexample).  Threshold as a rational num/den:
    # ceil(t*n) = (num*n + den - 1) div den, all in BIGINT.
    frac = Fraction(str(threshold))
    if frac.denominator > 1_000_000:
        # An arbitrary float threshold (e.g. t=1/3) decimal-expands to a
        # ~1e16 denominator, and n*num below would silently exceed BIGINT
        # for multi-thousand-shingle docs.  Round DOWN to the nearest
        # millionth: t' <= t only LENGTHENS the prefix, so the filter stays
        # lossless wrt the final `containment >= threshold` verify, and
        # n*num is bounded by n * 1e6 (round-6 advice).
        frac = Fraction(int(threshold * 1_000_000), 1_000_000)
    num, den = frac.numerator, frac.denominator
    freq = tok.groupBy("h").agg(F.count("*").alias("df"))
    ranked = tok.join(freq, "h").withColumn(
        "r",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "h")),
    )
    prefix_len = (
        F.col("n")
        - F.expr(f"(n * CAST({num} AS BIGINT) + {den - 1}) div {den}")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("r") <= prefix_len).select("doc_id", "h")

    cand = (
        prefix.alias("p")
        .join(tok.select("doc_id", "h").alias("q"), "h")
        .filter(F.col("p.doc_id") != F.col("q.doc_id"))
        .select(
            F.least("p.doc_id", "q.doc_id").alias("id1"),
            F.greatest("p.doc_id", "q.doc_id").alias("id2"),
        )
        .distinct()
    )

    # Exact verify: join each candidate pair to the two hashed-shingle ARRAYS
    # and intersect in codegen.  The candidate set is loose (any shared rare
    # shingle qualifies), so expanding candidates back through the posting
    # list (join + groupBy count) multiplies 100x before shrinking; the
    # array_intersect spelling verifies each pair in O(|sh|) right where it
    # sits -- measured 5.7s -> ~2s at sf0.1 on 180k candidates (r13), now on
    # long arrays instead of ~24-char-string arrays.
    s1 = docs.select(F.col("doc_id").alias("id1"), F.col("xs").alias("xs1"), F.col("n_sh").alias("n1"))
    s2 = docs.select(F.col("doc_id").alias("id2"), F.col("xs").alias("xs2"), F.col("n_sh").alias("n2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.size(F.array_intersect("xs1", "xs2")).cast("double")
                / F.least("n1", "n2"),
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
        WHERE ROUND(list_dot_product(x.v, y.v) / NULLIF(x.nrm * y.nrm, 0), 9) >= {_SEMDEDUP_T})
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
    # collect_list drops NULLs: an all-NULL frame gives n == 0, where
    # element_at(lst, 0) would raise -- guard to return NULL like DuckDB.
    lo = F.when(n > 0, F.element_at(lst, F.floor((n + 1) / 2).cast("int")))
    hi = F.when(n > 0, F.element_at(lst, (F.floor(n / 2) + 1).cast("int")))
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
