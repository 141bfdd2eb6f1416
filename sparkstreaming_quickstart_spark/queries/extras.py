"""Remaining surface: multiset ops, percentiles, from_json struct decode,
IVF-style ANN."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q09_multiset_ops",
    sql="""
    SELECT 'common' AS tag, x AS flag FROM (
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'F'
        INTERSECT ALL
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'O')
    UNION ALL
    SELECT 'f_surplus' AS tag, x AS flag FROM (
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'F'
        EXCEPT ALL
        SELECT l_returnflag AS x FROM lineitem WHERE l_linestatus = 'O')
    ORDER BY tag, flag
    """,
    doc="Multiset set-ops (intersectAll / exceptAll) preserving duplicates.",
)
def q09_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_linestatus") == "F").select(F.col("l_returnflag").alias("x"))
    o = li.filter(F.col("l_linestatus") == "O").select(F.col("l_returnflag").alias("x"))
    common = f.intersectAll(o).select(F.lit("common").alias("tag"), F.col("x").alias("flag"))
    surplus = f.exceptAll(o).select(F.lit("f_surplus").alias("tag"), F.col("x").alias("flag"))
    return common.unionByName(surplus).orderBy("tag", "flag")


@register(
    "q36_percentiles",
    sql="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont, rounded vs interpolation ulp); the 100 TB variant is "
    "approx_percentile (see q24 pattern).",
)
def q36_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q62_from_json_struct",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    ORDER BY event_id
    """,
    doc="Typed JSON decode: from_json with an explicit schema (vs the "
    "path-extraction in q44), struct field access.",
)
def q62_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("j", F.from_json("props", "k BIGINT"))
    return (
        parsed.filter(F.col("j.k").isNotNull())
        .select(
            "event_id",
            F.col("j.k").alias("k"),
            (F.col("j.k") % 10).alias("k_mod"),
        )
        .orderBy("event_id")
    )


def _q64_oracle_sql() -> str:
    # The centroids are seeded literals, so the oracle can replay the exact
    # cell assignment in DuckDB (bitwise-equal dot products, probed).
    from ..operators.similarity import ivf_centroids, sql_cell_expr

    cell = sql_cell_expr(ivf_centroids(dim=64, n_cells=16))
    return f"""
    WITH cells AS (
        SELECT vec_id, v, {cell} AS cell, sqrt(list_dot_product(v, v)) AS nrm
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
    q AS (SELECT * FROM cells WHERE vec_id % 50 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cos_sim
        FROM q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored)
    WHERE rank <= 5
    ORDER BY query_id, rank
    """


@register(
    "q64_similarity_ivf",
    sql=_q64_oracle_sql(),
    doc="IVF-style ANN: vectors assigned to nearest of 16 seeded random "
    "centroids (coarse quantizer); per-query search restricted to the "
    "query's cell. The k-means-trained variant swaps the centroid source. "
    "Full value oracle: the seeded centroids are embedded as literals in "
    "the DuckDB SQL, which replays the identical cell assignment.",
)
def q64_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(q, e, "vec_id", "embedding", "vec_id", "embedding", dim=64, k=5, n_cells=16)


@register(
    "q87_stratified_sample",
    sql="""
    SELECT lang, COUNT(*) AS n_total, TRUE AS frac_within_5_sigma
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Stratified subsampling (sampleBy, seeded): per-language fractions "
    "over documents -- the training-data downsampling primitive.  No SQL "
    "oracle can replay Spark's per-partition RNG, but the draw is a Bernoulli "
    "with known p, so the oracle checks the exact stratum totals plus a "
    "boolean invariant: |sampled_frac - target| <= 5*sqrt(p(1-p)/n), pinned "
    "TRUE (probed: worst observed deviation is ~2 sigma at both test SFs). "
    "Strata are a bounded driver collect: limit(64)+assert, fine for a "
    "low-cardinality partition-style column, never an unbounded collect.",
)
def q87_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = [r.lang for r in d.select("lang").distinct().limit(64).collect()]
    assert len(langs) < 64, "lang stratum cardinality exceeds the bounded-collect cap"
    # downsample alternate strata hard, keep the rest
    fractions = {lang: (0.1 if i % 2 == 0 else 0.8) for i, lang in enumerate(sorted(langs))}
    sampled_counts = (
        d.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    totals = d.groupBy("lang").agg(F.count("*").alias("n_total"))
    # Target fraction as a literal map column (no UDF).
    target_map = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    frac = F.col("n_sampled").cast("double") / F.col("n_total").cast("double")
    p = target_map[F.col("lang")]
    tol = F.lit(5.0) * F.sqrt(p * (1 - p) / F.col("n_total").cast("double"))
    return (
        totals.join(sampled_counts, "lang", "left")
        .na.fill({"n_sampled": 0})
        .select(
            "lang",
            "n_total",
            (F.abs(frac - p) <= tol).alias("frac_within_5_sigma"),
        )
        .orderBy("lang")
    )


@register(
    "q88_freq_items",
    sql="""
    WITH t AS (SELECT COUNT(*) AS total FROM events),
    et AS (SELECT event_type FROM events, t GROUP BY event_type, total HAVING COUNT(*) > 0.1 * total),
    uid AS (SELECT user_id FROM events, t GROUP BY user_id, total HAVING COUNT(*) > 0.1 * total)
    SELECT COALESCE((SELECT array_to_string(list_sort(list(event_type)), '|') FROM et), '') AS hot_event_types,
           COALESCE((SELECT array_to_string(list_transform(list_sort(list(user_id)), x -> CAST(x AS VARCHAR)), '|') FROM uid), '') AS hot_users,
           TRUE AS sketch_covers_event_types,
           TRUE AS sketch_covers_users
    """,
    doc="Frequent-items sketch (DataFrame.freqItems, single pass): heavy-"
    "hitter event types and users -- the hot-key / hot-token detection "
    "primitive for skew diagnosis at scale.  The sketch admits false "
    "positives but guarantees every item above support is returned (Karp "
    "et al.), so the oracle checks the exact heavy-hitter sets plus the "
    "superset invariant as booleans pinned TRUE; the exact sets come from "
    "one grouped count + broadcast total (all distributed).",
)
def q88_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sk = e.freqItems(["event_type", "user_id"], support=0.1)
    total = e.agg(F.count("*").alias("total"))

    def exact_hot(col: str):
        return (
            e.groupBy(col)
            .agg(F.count("*").alias("n"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("n") > 0.1 * F.col("total"))
            .agg(F.sort_array(F.collect_list(col)).alias(f"exact_{col}"))
        )

    return (
        sk.crossJoin(F.broadcast(exact_hot("event_type")))
        .crossJoin(F.broadcast(exact_hot("user_id")))
        .select(
            F.array_join(F.col("exact_event_type"), "|").alias("hot_event_types"),
            F.array_join(
                F.transform(F.col("exact_user_id"), lambda x: x.cast("string")), "|"
            ).alias("hot_users"),
            (F.size(F.array_except(F.col("exact_event_type"), F.col("event_type_freqItems"))) == 0).alias(
                "sketch_covers_event_types"
            ),
            (F.size(F.array_except(F.col("exact_user_id"), F.col("user_id_freqItems"))) == 0).alias(
                "sketch_covers_users"
            ),
        )
    )
