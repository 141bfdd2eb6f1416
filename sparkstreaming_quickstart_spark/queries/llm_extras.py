"""Second wave of LLM-data-pipeline operators (round 2): TF-IDF scoring,
embedding quantization, deterministic hash sampling, a k-means refinement
iteration (the production source for q64's IVF centroids), and key-skew
diagnosis.  All carry full DuckDB value oracles.

Reference context: the reference has no analytics surface (SURVEY.md 2.A);
these are charter-driven training-data-pipeline components (SURVEY.md 2.B
extensions), same family as queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q121_tfidf",
    sql="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE doc_id < 40 GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT t.doc_id, t.token, t.tf,
           ROUND(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
    FROM tf t JOIN df d USING (token), n
    ORDER BY doc_id, token
    """,
    doc="TF-IDF document-term scoring: term frequency over a target slice, "
    "document frequency and N over the FULL corpus (the real retrieval/"
    "quality-weighting pattern).  One explode + two hash-aggs; the df side "
    "is a token-keyed shuffle bounded by vocabulary size, not corpus size. "
    "Rounded to 6 digits so ln() ulp differences cannot flip the oracle.",
)
def q121_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = (
        toks.filter(F.col("doc_id") < 40)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
        .orderBy("doc_id", "token")
    )


@register(
    "q122_embedding_quantize",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 100),
    s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v)
    SELECT vec_id,
           ROUND(127.0 / amax, 6) AS scale,
           array_to_string(list_transform(v, x -> CAST(round(x * (127.0 / amax)) AS INT)), '|') AS q8
    FROM s
    WHERE amax > 0
    ORDER BY vec_id
    """,
    doc="Symmetric int8 embedding quantization (the storage/bandwidth scale "
    "path for ANN corpora: 4x smaller than float32, dot products stay "
    "proportional).  Pure per-row higher-order expressions, no shuffle; "
    "both engines round half-away-from-zero so the lattice agrees.",
)
def q122_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.transform("embedding", lambda x: x.cast("double"))
    ev = e.select("vec_id", v.alias("v")).withColumn(
        "amax", F.array_max(F.transform("v", lambda x: F.abs(x)))
    )
    scale = F.lit(127.0) / F.col("amax")
    return (
        ev.filter(F.col("amax") > 0)
        .select(
            "vec_id",
            F.round(scale, 6).alias("scale"),
            F.array_join(
                F.transform("v", lambda x: F.round(x * scale).cast("int")), "|"
            ).alias("q8"),
        )
        .orderBy("vec_id")
    )


@register(
    "q123_hash_sample",
    sql="""
    WITH keyed AS (
        SELECT lang, doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 17, 16) AS hkey
        FROM documents),
    ranked AS (
        SELECT lang, doc_id, hkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS INT) AS rk
        FROM keyed)
    SELECT lang, doc_id, rk FROM ranked WHERE rk <= 5
    ORDER BY lang, rk
    """,
    doc="Deterministic per-group sampling: rank by a content hash of the id "
    "(lower-half md5 hex; lexicographic hex order == unsigned numeric "
    "order in both engines) and keep the first k per stratum.  Unlike "
    "rand()-based sampling this is partition-layout-independent and "
    "replayable anywhere -- the reproducible-subset primitive for building "
    "eval slices from a 100 TB corpus.  One window shuffle on the stratum "
    "key.",
)
def q123_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hkey = F.substring(F.md5(F.col("doc_id").cast("string")), 17, 16)
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        d.select("lang", "doc_id", hkey.alias("hkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


def _q124_oracle_sql() -> str:
    # Literal seeded init (same matrix as q64's quantizer), one unrolled
    # refinement: assign -> per-(cell,dim) mean rounded to 6 -> reassign.
    from ..operators.similarity import ivf_centroids, sql_cell_expr

    cell0 = sql_cell_expr(ivf_centroids(dim=64, n_cells=16))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    a0 AS (SELECT vec_id, v, {cell0} AS cell FROM v),
    means AS (
        SELECT cell, pos, ROUND(AVG(x), 6) AS m
        FROM (SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM a0)
        GROUP BY cell, pos),
    cents AS (SELECT cell, list(m ORDER BY pos) AS c FROM means GROUP BY cell),
    scored AS (
        SELECT a0.vec_id, cents.cell AS new_cell,
               list_dot_product(a0.v, cents.c) AS s
        FROM a0, cents),
    best AS (
        SELECT vec_id, new_cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, new_cell) AS rk
        FROM scored)
    SELECT new_cell AS cell, COUNT(*) AS n_members
    FROM best WHERE rk = 1
    GROUP BY new_cell
    ORDER BY cell
    """


@register(
    "q124_kmeans_refine",
    sql=_q124_oracle_sql(),
    doc="One k-means refinement iteration over the embedding corpus -- the "
    "training step that produces q64's IVF centroids in production: assign "
    "to seeded init cells (argmax dot), recompute centroids as per-(cell,"
    "dim) means (posexplode + hash-agg, the q111 shape), collect the k x dim "
    "model state to the driver (bounded: 16x64 doubles -- model state, not "
    "data), reassign against the updated centroids, output the new cell "
    "occupancy.  Means are rounded to 6 digits on both sides so float "
    "reduce-order ulps cannot flip the (argmax) reassignment.",
)
def q124_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot, ivf_centroids

    planes = ivf_centroids(dim=64, n_cells=16)
    cents0 = [F.array(*[F.lit(float(x)) for x in row]) for row in planes]

    def argmax_cell(vec, cent_cols):
        scores = F.array(*[dot(vec, c) for c in cent_cols])
        return F.array_position(scores, F.array_max(scores)).cast("int")

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a0 = e.withColumn("cell", argmax_cell(F.col("v"), cents0))
    means = (
        a0.select("cell", F.posexplode("v").alias("pos0", "x"))
        .groupBy("cell", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    # Model-state collect: k x dim rounded means (bounded, not data-sized).
    rows = means.collect()
    by_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cell.setdefault(r.cell, {})[r.pos] = r.m
    cells = sorted(by_cell)
    cents1 = [
        F.array(*[F.lit(by_cell[c][p]) for p in sorted(by_cell[c])]) for c in cells
    ]
    # Reassign against updated centroids; map argmax index back to cell id.
    cell_ids = F.array(*[F.lit(c) for c in cells])
    new_cell = cell_ids[argmax_cell(F.col("v"), cents1) - 1]
    return (
        a0.withColumn("new_cell", new_cell)
        .groupBy(F.col("new_cell").alias("cell"))
        .agg(F.count("*").alias("n_members"))
        .orderBy("cell")
    )


@register(
    "q126_bigram_lm",
    sql="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    pairs AS (
        SELECT unnest([{'w1': t[i], 'w2': t[i+1]} FOR i IN range(1, len(t))]) AS p
        FROM toks),
    big AS (SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2)
    SELECT w1, w2, c2, cond_prob FROM (
        SELECT w1, w2, c2,
               ROUND(CAST(c2 AS DOUBLE) / SUM(c2) OVER (PARTITION BY w1), 6) AS cond_prob
        FROM big)
    WHERE c2 >= 5
    ORDER BY w1, w2
    """,
    doc="Bigram language-model counts with conditional probability "
    "p(w2|w1) -- the classic n-gram LM / next-token-statistics pass over a "
    "corpus.  Bigrams come from zipping each token array with its own "
    "shift (arrays_zip of two slices: one projection, no self-join); one "
    "hash-agg on (w1, w2) plus a w1-partitioned window for the denominator. "
    "Both engines divide the same exact integers, rounded to 6.",
)
def q126_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1).alias("w1"), F.slice(t, 2, F.size(t) - 1).alias("w2")
    )
    big = (
        d.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c2"))
    )
    w = Window.partitionBy("w1")
    return (
        big.withColumn("cond_prob", F.round(F.col("c2").cast("double") / F.sum("c2").over(w), 6))
        .filter(F.col("c2") >= 5)
        .orderBy("w1", "w2")
    )


@register(
    "q127_winsorized_stats",
    sql="""
    WITH pct AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
           ROUND(p.p05, 6) AS p05, ROUND(p.p95, 6) AS p95,
           CAST(SUM(CAST(ROUND(LEAST(GREATEST(e.value, p.p05), p.p95), 2) AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_sum
    FROM events e JOIN pct p USING (event_type)
    GROUP BY e.event_type, p.p05, p.p95
    ORDER BY e.event_type
    """,
    doc="Winsorized (outlier-clipped) statistics per group: exact "
    "interpolated p05/p95 per event_type joined back (broadcast: one row "
    "per group), values clamped then summed as exact decimals -- the "
    "robust-statistics pass a quality pipeline runs before thresholding on "
    "noisy metrics.  Clip counts are exact integers; the clamped sum is "
    "rounded to cents before the decimal cast so both engines land on the "
    "identical lattice.",
)
def q127_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    j = e.join(F.broadcast(pct), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        j.groupBy("event_type", "p05", "p95")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias("n_clipped_high"),
            F.sum(F.round(clamped, 2).cast("decimal(18,2)")).cast("double").alias("winsorized_sum"),
        )
        .select(
            "event_type",
            "n",
            "n_clipped_low",
            "n_clipped_high",
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            "winsorized_sum",
        )
        .orderBy("event_type")
    )


@register(
    "q128_hll_sketch_union",
    sql="""
    WITH per AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type),
    overall AS (SELECT COUNT(DISTINCT user_id) AS exact_users FROM events)
    SELECT event_type, exact_users, TRUE AS sketch_within_5pct FROM per
    UNION ALL
    SELECT 'ALL' AS event_type, exact_users, TRUE AS sketch_within_5pct FROM overall
    ORDER BY event_type
    """,
    doc="DataSketches HLL with sketch MERGE (hll_sketch_agg per group -> "
    "hll_union_agg across groups): the re-aggregation pattern that makes "
    "distinct counting composable at 100 TB -- per-partition/per-day "
    "sketches persist and union later without touching raw data, which "
    "approx_count_distinct (q24) cannot do.  Sketch values are "
    "deterministic (register max is order-independent) but not "
    "SQL-reproducible, so the oracle checks exact counts plus the accuracy "
    "invariant pinned TRUE, the q24 pattern.",
)
def q128_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    ratio = F.expr("hll_sketch_estimate(sk)").cast("double") / F.col("exact_users")
    per_out = per.select(
        "event_type", "exact_users", ratio.between(0.95, 1.05).alias("sketch_within_5pct")
    )
    glob_exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    gratio = F.col("gest").cast("double") / F.col("exact_users")
    glob_out = (
        per.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("gest"))
        .crossJoin(F.broadcast(glob_exact))
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            gratio.between(0.95, 1.05).alias("sketch_within_5pct"),
        )
    )
    return per_out.unionByName(glob_out).orderBy("event_type")


def _q129_oracle_sql() -> str:
    # Reuse the exact-Jaccard pair graph at 0.7 (the q52 threshold), unroll
    # three damped iterations.  Every node of this graph has degree >= 1 so
    # no dangling-mass term is needed.
    head = """
    WITH docs AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    prs AS (
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= 0.7),
    edges AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs),
    deg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    nn AS (SELECT CAST(COUNT(DISTINCT u) AS DOUBLE) AS n FROM edges),
    p0 AS (SELECT u AS node, 1.0 / nn.n AS p FROM deg, nn)
    """
    iters = "".join(
        f""",
    p{i} AS (
        SELECT e.v AS node, ROUND(0.15 / nn.n + 0.85 * SUM(p{i-1}.p / deg.d), 9) AS p
        FROM edges e JOIN p{i-1} ON e.u = p{i-1}.node JOIN deg ON e.u = deg.u, nn
        GROUP BY e.v, nn.n)"""
        for i in (1, 2, 3)
    )
    return head + iters + """
    SELECT node AS doc_id, p AS pagerank FROM p3 ORDER BY doc_id
    """


@register(
    "q129_pagerank_neardup",
    sql=_q129_oracle_sql(),
    doc="Three damped PageRank iterations over the near-dup pair graph -- "
    "the iterative-graph-algorithm shape beyond q89's connected components "
    "(canonical-document selection inside dup clusters: highest-rank node "
    "= best-connected representative).  Each iteration is one edge join + "
    "one hash-agg, all distributed; ranks are rounded to 9 digits per "
    "iteration on both sides so neighbor-sum float order cannot drift.  At "
    "100 TB the loop runs with lineage truncation per round exactly like "
    "connected_components; the oracle unrolls the identical three "
    "iterations as CTEs.",
)
def q129_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    prs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7).select("d1", "d2")
    half = prs.localCheckpoint(eager=True)
    edges = half.select(F.col("d1").alias("u"), F.col("d2").alias("v")).union(
        half.select(F.col("d2").alias("u"), F.col("d1").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    n = deg.agg(F.count("*").cast("double").alias("n"))
    p = deg.crossJoin(F.broadcast(n)).select(F.col("u").alias("node"), (F.lit(1.0) / F.col("n")).alias("p"))
    for _ in range(3):
        contrib = (
            edges.join(p, edges.u == p.node)
            .join(deg, "u")
            .select(F.col("v"), (F.col("p") / F.col("d")).alias("c"))
        )
        p = (
            contrib.groupBy(F.col("v").alias("node"))
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(n))
            .select("node", F.round(F.lit(0.15) / F.col("n") + F.lit(0.85) * F.col("s"), 9).alias("p"))
            .localCheckpoint(eager=True)
        )
    return p.select(F.col("node").alias("doc_id"), F.col("p").alias("pagerank")).orderBy("doc_id")


@register(
    "q130_multimodal_resize",
    sql="""
    SELECT doc_id,
           CAST(32 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
           md5(rpad(substr(text, 1, 256), 256, chr(0))) AS resized_md5,
           CAST(256 AS BIGINT) AS n_out
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    doc="Multimodal resize plumbing as a registered query: Arrow-batched "
    "mapInPandas binary-in/binary-out (operators/multimodal.py:resize_media; "
    "the resampler is the honest deterministic stand-in -- truncate/zero-pad "
    "-- since no codec libs ship here, and only that function changes in "
    "production).  The oracle replays the stand-in in the string domain "
    "(documents are ASCII: chars == bytes) and compares md5 digests of the "
    "resized payloads, since the comparator shouldn't ship raw binaries.",
)
def q130_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_media, with_binary_payload

    d = with_binary_payload(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200), "text"
    )
    out = resize_media(d, w=32, h=8)
    return out.select(
        "doc_id",
        "out_w",
        "out_h",
        F.md5("resized").alias("resized_md5"),
        F.length("resized").cast("bigint").alias("n_out"),
    ).orderBy("doc_id")


@register(
    "q131_variant_json",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') IS NOT NULL AS valid,
           '{"k":' || json_extract_string(props, '$.k') || '}' AS canonical
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="Spark 4 VARIANT ingestion: parse_json -> semi-structured VARIANT "
    "column, typed extraction via variant_get, validity via try_parse_json, "
    "canonical re-serialization via to_json.  VARIANT is the 100 TB "
    "semi-structured path: binary-encoded, shreddable, no per-query "
    "re-parsing of JSON text.  The oracle reconstructs the compact "
    "canonical form from the extracted field.",
)
def q131_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = e.withColumn("v", F.expr("parse_json(props)"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("try_parse_json(props)").isNotNull().alias("valid"),
        F.expr("to_json(v)").alias("canonical"),
    ).orderBy("event_id")


@register(
    "q132_approx_top_k",
    sql="""
    WITH ranked AS (
        SELECT event_type, COUNT(*) AS c
        FROM events GROUP BY event_type
        ORDER BY c DESC, event_type LIMIT 3)
    SELECT array_to_string(list(event_type || '=' || c ORDER BY c DESC, event_type), '|') AS top3
    FROM ranked
    """,
    doc="approx_top_k: sketch-based heavy-hitter top-k in one pass (the "
    "streaming-friendly form of ORDER BY count LIMIT k -- no full "
    "aggregation shuffle needed at 100 TB).  At test scale the sketch "
    "capacity exceeds the distinct count, so the result is exact and the "
    "oracle compares against the exact top-3 (count ties absent in the "
    "fixtures; serialized as item=count).",
)
def q132_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.selectExpr("approx_top_k(event_type, 3) AS tk").select(
        F.array_join(
            F.transform("tk", lambda s: F.concat(s["item"], F.lit("="), s["count"].cast("string"))),
            "|",
        ).alias("top3")
    )


@register(
    "q133_collation_group",
    sql="""
    WITH mixed AS (
        SELECT p_brand,
               CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE upper(p_type) END AS t
        FROM part)
    SELECT p_brand,
           COUNT(DISTINCT lower(t)) AS n_types_ci,
           COUNT(DISTINCT t) AS n_types_cs,
           COUNT(*) AS n
    FROM mixed
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="Spark 4 string collations: distinct-count under UTF8_LCASE vs the "
    "default binary collation over a deliberately case-mixed column.  "
    "Collation-aware comparison happens inside codegen (no lower() copies "
    "of the data at rest); the oracle models UTF8_LCASE with lower() -- "
    "equivalent for this ASCII domain.",
)
def q133_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    mixed = F.when(F.col("p_partkey") % 2 == 0, F.lower("p_type")).otherwise(
        F.upper("p_type")
    )
    return (
        p.select("p_brand", mixed.alias("t"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct(F.expr("collate(t, 'UTF8_LCASE')")).alias("n_types_ci"),
            F.countDistinct("t").alias("n_types_cs"),
            F.count("*").alias("n"),
        )
        .orderBy("p_brand")
    )


@register(
    "q134_xml_decode",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type AS t,
           event_type AS t_xpath
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="XML ingestion (Spark 4 from_xml + xpath_string): the query builds a "
    "wire-shaped XML message from existing columns, then decodes it back "
    "through both the schema'd parser and an XPath extraction; the oracle "
    "derives the same fields relationally, so a parser regression (dropped "
    "or misparsed fields) hash-mismatches.",
)
def q134_xml_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k")
    xml = F.concat(
        F.lit("<e><k>"), k, F.lit("</k><t>"), F.col("event_type"), F.lit("</t></e>")
    )
    parsed = e.withColumn("xml", xml).withColumn(
        "x", F.expr("from_xml(xml, 'k BIGINT, t STRING')")
    )
    return parsed.select(
        "event_id",
        F.col("x.k").alias("k"),
        F.col("x.t").alias("t"),
        F.expr("xpath_string(xml, '/e/t')").alias("t_xpath"),
    ).orderBy("event_id")


@register(
    "q125_key_skew_histogram",
    sql="""
    WITH counts AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
    SELECT length(CAST(c AS VARCHAR)) AS magnitude_digits,
           COUNT(*) AS n_keys, MIN(c) AS min_count, MAX(c) AS max_count
    FROM counts
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Key-skew diagnosis: per-key frequency histogram bucketed by decimal "
    "magnitude (digit count -- exact in both engines, unlike float log "
    "buckets at power boundaries).  The 30-second answer to 'will this key "
    "skew the shuffle?' before running a 100 TB join; two hash-aggs, second "
    "one over at most ~20 buckets.",
)
def q125_key_skew_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("c"))
    return (
        counts.groupBy(F.length(F.col("c").cast("string")).alias("magnitude_digits"))
        .agg(
            F.count("*").alias("n_keys"),
            F.min("c").alias("min_count"),
            F.max("c").alias("max_count"),
        )
        .orderBy("magnitude_digits")
    )


@register(
    "q148_embedding_gram",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ei AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM v),
    ej AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS j, unnest(v) AS x FROM v)
    SELECT CAST(ei.i AS INT) AS i, CAST(ej.j AS INT) AS j,
           ROUND(SUM(ei.x * ej.x), 4) AS g
    FROM ei JOIN ej USING (vec_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="One-pass distributed gram matrix G = sum_rows v v^T over the "
    "embedding corpus -- the linear-algebra primitive under PCA/whitening/"
    "covariance for embedding post-processing.  Each partition reduces its "
    "rows to a dim x dim partial with one numpy matmul (Arrow-batched "
    "mapInPandas); the shuffle then carries O(partitions x dim^2) partial "
    "cells, never row data, and the final agg is dim^2-sized.  At 100 TB "
    "the reduction is scan-bound: the Python boundary emits 4096 cells per "
    "partition regardless of row count.  The DuckDB oracle replays the "
    "same sums via a position self-join (quadratic in dim, fine at oracle "
    "scale); results rounded to 4 decimals to absorb float reduce-order.",
)
def q148_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        G = None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            G = M.T @ M if G is None else G + M.T @ M
        if G is None:
            return
        dim = G.shape[0]
        idx = np.arange(dim)
        yield pd.DataFrame(
            {
                "i": np.repeat(idx, dim).astype("int32"),
                "j": np.tile(idx, dim).astype("int32"),
                "partial": G.ravel(),
            }
        )

    partials = e.mapInPandas(gram_partials, "i int, j int, partial double")
    return (
        partials.groupBy("i", "j")
        .agg(F.round(F.sum("partial"), 4).alias("g"))
        .orderBy("i", "j")
    )
