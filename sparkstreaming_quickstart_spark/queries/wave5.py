"""Wave-5 operators (round 2): the Spark 4 SQL-language surface (SQL UDFs,
SQL scripting, parameterized queries, GROUP/ORDER BY ALL, unionByName with
missing columns) plus the remaining pipeline ops (pyarrow-native batch
transform, hashing-trick features, near-dup-graph triangles).

The SQL-language entries matter for engine completeness: a user migrating a
SQL-first workload needs CREATE FUNCTION, control flow, and safe parameter
binding, not just the DataFrame API.  Everything here carries a full DuckDB
value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import md5_mod
from ..sources.catalog import load_table, spread
from . import register
from .llm import _jaccard_oracle


@register(
    "q165_sql_udf",
    sql="""
    SELECT lang, source,
           CAST((2 * SUM(CASE WHEN n_chars < 20 THEN 0
                              ELSE least(100, len(string_split(text, ' '))) END)
                 * 10000 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               / 1000000.0 AS avg_quality,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY ALL
    ORDER BY ALL
    """,
    doc="SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr) + GROUP BY ALL / "
    "ORDER BY ALL: the declarative UDF path -- the body is inlined into the "
    "plan as an ordinary expression (stays in codegen, fully optimizable), "
    "unlike a Python UDF which is an opaque serialization barrier.  The "
    "right default for any user-defined logic expressible as SQL.  The "
    "UDF returns the INTEGER quality score (0-100), and the 6-decimal "
    "average rounds half-up in exact integer arithmetic (2s+n over 2n in "
    "parts-per-million) before ONE float division -- at sf0.1 the zh/src8 "
    "group averages exactly 0.5146875, a decimal half where Spark's "
    "string-based ROUND and DuckDB's binary-value round disagree, and "
    "float-sum order drift flips the same digit; both are impossible "
    "here by construction.",
)
def q165_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION doc_quality(nc BIGINT, txt STRING)
           RETURNS BIGINT
           RETURN CASE WHEN nc < 20 THEN 0
                       ELSE least(100, size(split(txt, ' '))) END"""
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """SELECT lang, source,
                  CAST((2 * SUM(doc_quality(n_chars, text)) * 10000 + COUNT(*))
                       DIV (2 * COUNT(*)) AS BIGINT) / 1000000e0 AS avg_quality,
                  COUNT(*) AS n_docs
           FROM documents_v
           GROUP BY ALL
           ORDER BY ALL"""
    )


@register(
    "q166_sql_scripting",
    sql="""
    WITH ks AS (SELECT unnest(generate_series(10, 63)) AS k),
    cand AS (
        SELECT k, power(2, k) AS thr,
               (SELECT COUNT(*) FROM orders WHERE o_totalprice > power(2, k)) AS n_above
        FROM ks)
    SELECT CAST(thr AS DOUBLE) AS threshold, CAST(n_above AS BIGINT) AS n_above
    FROM cand WHERE n_above < 10 ORDER BY k LIMIT 1
    """,
    doc="SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): a driver-side control "
    "loop doubling a revenue threshold until fewer than 10 orders exceed it "
    "-- the adaptive-threshold search every data-quality cutoff needs.  "
    "Each loop iteration is a full distributed aggregate; only the scalar "
    "threshold lives in script state.  The oracle unrolls the loop "
    "(smallest power of two >= the 2^10 start with n_above < 10; doubling "
    "produces exact powers of two, so the comparison is float-exact; the "
    "start sits far below any order price so both spellings agree).",
)
def q166_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """BEGIN
             DECLARE thr DOUBLE DEFAULT 1024.0;
             WHILE (SELECT COUNT(*) FROM orders_v WHERE o_totalprice > thr) >= 10 DO
               SET thr = thr * 2;
             END WHILE;
             SELECT CAST(thr AS DOUBLE) AS threshold,
                    CAST((SELECT COUNT(*) FROM orders_v WHERE o_totalprice > thr) AS BIGINT)
                        AS n_above;
           END"""
    )


@register(
    "q167_map_in_arrow",
    sql="""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    ORDER BY doc_id
    """,
    doc="mapInArrow: the zero-copy sibling of mapInPandas -- the UDF "
    "receives raw pyarrow RecordBatches (no pandas conversion, no index "
    "materialization), the right interface when the kernel is itself "
    "Arrow-native (pyarrow.compute, DuckDB, polars).  Byte/token counts "
    "here run entirely in pyarrow.compute vectorized kernels.",
)
def q167_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for b in batches:
            txt = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.binary_length(txt).cast(pa.int32()),
                    pc.list_value_length(pc.split_pattern(txt, " ")).cast(pa.int32()),
                ],
                names=["doc_id", "n_bytes", "n_tokens"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(stats, "doc_id long, n_bytes int, n_tokens int").orderBy("doc_id")


@register(
    "q168_feature_hashing",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    feat AS (
        SELECT doc_id,
               CAST(md5_number_lower(token) % 64 AS BIGINT) AS feature_idx,
               CASE WHEN md5_number_lower('s:' || token) % 2 = 1 THEN 1 ELSE -1 END AS sgn
        FROM toks)
    SELECT doc_id, feature_idx, CAST(SUM(sgn) AS BIGINT) AS feature_val
    FROM feat GROUP BY doc_id, feature_idx
    ORDER BY doc_id, feature_idx
    """,
    doc="Hashing-trick featurization (signed feature hashing, Weinberger et "
    "al. 2009): tokens hash into a fixed 64-bucket feature space with a "
    "second hash supplying the +-1 sign (unbiased collisions) -- the "
    "vocabulary-free text featurizer: no dictionary build, no OOV, fixed "
    "width at any corpus size.  One explode + one hash-agg whose key "
    "domain is docs x 64, never vocabulary-sized.",
)
def q168_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    sgn = F.when(
        md5_mod(F.concat(F.lit("s:"), F.col("token")), 2) == 1, 1
    ).otherwise(-1)
    return (
        toks.select(
            "doc_id",
            md5_mod(F.col("token"), 64).alias("feature_idx"),
            sgn.alias("sgn"),
        )
        .groupBy("doc_id", "feature_idx")
        .agg(F.sum("sgn").alias("feature_val"))
        .orderBy("doc_id", "feature_idx")
    )


@register(
    "q169_neardup_triangles",
    sql=f"""
    WITH pairs AS MATERIALIZED ({_jaccard_oracle(0.7)}),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e2.d1 = e1.d2
        JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2),
    nodes AS (
        SELECT COUNT(DISTINCT d) AS n_nodes
        FROM (SELECT d1 AS d FROM pairs UNION SELECT d2 FROM pairs))
    SELECT (SELECT COUNT(*) FROM pairs) AS n_edges, n_nodes, n_triangles
    FROM tri, nodes
    """,
    doc="Triangle count over the near-dup candidate graph (q52's LSH pairs "
    "at threshold 0.7): triangles vs edges measures how transitive the "
    "near-dup relation is -- high transitivity justifies cluster-level "
    "dedup (q89) over pairwise removal.  Edges are oriented d1<d2, so each "
    "triangle is counted once via the a<b<c double join.  Scale: the join "
    "is edge-keyed and LSH pair sets are sparse by construction (the "
    "bucket cap bounds any hot node), so triangle counting stays "
    "proportional to the candidate set, not the corpus.",
)
def q169_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    # LSH pairs are sparse by construction (bucket-capped candidates), so the
    # edge set broadcasts: the triangle joins become broadcast-hash joins with
    # zero shuffle instead of three full-width exchanges (the cached relation
    # otherwise materializes at spark.sql.shuffle.partitions width and AQE
    # does not re-coalesce through the cache -- measured 42s -> ~2s under a
    # vanilla 200-partition session).
    # localCheckpoint EAGER, not lazy .cache(): the triangle query builds
    # its two broadcast sides in parallel threads, and a lazy cache lets
    # both (plus the nodes/edges branches) race past the unpopulated cache
    # and re-run the whole LSH subtree -- the plan audit showed the pair
    # computation inlined 5x (measured 15s; ~4s once materialized eagerly).
    # NO coalesce(1) before the materialization: coalesce pushes the 1-task
    # width down through the whole LSH pipeline (signature kernel, bucket
    # joins, verify) and serializes it onto one core.  Checkpoint at natural
    # parallelism; the checkpointed edge set is tiny, so the downstream
    # broadcasts and single-partition aggregations stay cheap.
    pairs = (
        minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.d1") == F.col("e1.d2"))
        .join(
            F.broadcast(e3),
            (F.col("e3.d1") == F.col("e1.d1")) & (F.col("e3.d2") == F.col("e2.d2")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        pairs.select(F.col("d1").alias("d"))
        .union(pairs.select("d2"))
        .agg(F.countDistinct("d").alias("n_nodes"))
    )
    edges = pairs.agg(F.count("*").alias("n_edges"))
    return edges.crossJoin(nodes).crossJoin(tri)


@register(
    "q170_union_by_name",
    sql="""
    WITH u AS (
        SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        FROM customer
        UNION ALL BY NAME
        SELECT o_custkey AS c_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total
        FROM orders)
    SELECT COUNT(*) AS n_rows,
           COUNT(c_name) AS n_names,
           COUNT(total) AS n_totals,
           CAST(SUM(c_acctbal) AS DOUBLE) AS sum_acctbal,
           CAST(SUM(total) AS DOUBLE) AS sum_total
    FROM u
    """,
    doc="unionByName(allowMissingColumns=True): schema-evolution-tolerant "
    "union -- columns align by NAME, absent columns null-fill (positional "
    "union silently mismatches after any schema change; by-name is the "
    "only safe spelling in a pipeline whose sources evolve).  Sums ride "
    "DECIMAL so the null-heavy union aggregates exactly.",
)
def q170_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("decimal(18,2)").alias("c_acctbal")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
    )
    u = cust.unionByName(orders, allowMissingColumns=True)
    return u.agg(
        F.count("*").alias("n_rows"),
        F.count("c_name").alias("n_names"),
        F.count("total").alias("n_totals"),
        F.sum("c_acctbal").cast("double").alias("sum_acctbal"),
        F.sum("total").cast("double").alias("sum_total"),
    )


@register(
    "q171_parameterized_sql",
    sql="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Parameterized SQL (spark.sql named args + {df} templating): values "
    "bind as literals AFTER parsing -- injection-safe by construction and "
    "plan-cache friendly, the contract an exposed query endpoint needs "
    "(string interpolation is the anti-pattern).  Bound literals still "
    "participate in predicate pushdown like hand-written constants.",
)
def q171_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """SELECT l_returnflag, COUNT(*) AS n,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           FROM {li}
           WHERE l_quantity BETWEEN :lo AND :hi
           GROUP BY l_returnflag
           ORDER BY l_returnflag""",
        li=li,
        args={"lo": 10, "hi": 20},
    )
