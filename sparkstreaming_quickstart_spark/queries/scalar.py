"""Scalar function surface: string / date-time / math-conditional / array /
JSON expressions (SURVEY.md section 2.B scalar groups).

Everything stays inside whole-stage codegen (no Python UDFs).  Functions are
restricted to the Spark<->DuckDB-portable subset with identical semantics;
e.g. sqrt is IEEE-exact in both engines, while exp/log/pow are libm-dependent
and deliberately avoided in oracle-checked outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q40_string_funcs",
    sql="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           length(p_name) AS name_len,
           substring(p_name, 1, 10) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim(p_name) AS name_trim,
           len(string_split(p_type, ' ')) AS type_words,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           levenshtein(p_brand, 'Brand#11') AS brand_dist
    FROM part
    ORDER BY p_partkey
    """,
    doc="String function family over part.",
)
def q40_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim("p_name").alias("name_trim"),
        F.size(F.split("p_type", " ")).cast("bigint").alias("type_words"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("brand_dist"),
    ).orderBy("p_partkey")


@register(
    "q41_date_funcs",
    sql="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           dayofweek(o_orderdate) AS dow
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Date/time family over orders (extract, trunc, diff, add, epoch).",
)
def q41_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    ).orderBy("o_orderkey")


@register(
    "q42_math_conditional",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0) AS dist_from_50k,
           round(l_extendedprice / 1000.0, 1) AS price_k,
           CAST(floor(l_quantity / 10.0) AS BIGINT) AS qty_decile,
           CAST(ceil(l_discount * 100.0) AS BIGINT) AS disc_pct_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           CASE WHEN l_discount >= 0.05 THEN 'discounted' ELSE 'full_price' END AS disc_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math + conditional family (abs/round/floor/ceil/sqrt, case, coalesce/nullif, greatest/least).",
)
def q42_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_50k"),
        F.round(F.col("l_extendedprice") / 1000.0, 1).alias("price_k"),
        F.floor(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.ceil(F.col("l_discount") * 100.0).alias("disc_pct_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.when(F.col("l_discount") >= 0.05, "discounted").otherwise("full_price").alias("disc_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_or_none"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q43_array_funcs",
    sql="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_component,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_component,
           list_contains([0,1,2,3,4], label) AS low_label,
           CAST(embedding[1] AS DOUBLE) >= 0 AS first_nonneg
    FROM embeddings
    ORDER BY vec_id
    """,
    doc="Array family over embeddings (size, index, element max/min, contains).",
)
def q43_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.array_min("embedding").cast("double").alias("min_component"),
        F.array_contains(F.array(*[F.lit(i) for i in range(5)]), F.col("label")).alias("low_label"),
        (F.col("embedding").getItem(0).cast("double") >= 0).alias("first_nonneg"),
    ).orderBy("vec_id")


@register(
    "q44_json_funcs",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY k
    ORDER BY k
    """,
    doc="JSON extraction from events.props + aggregation on the extracted key.",
)
def q44_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            "user_id",
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("k")
    )


@register(
    "q45_explode_posexplode",
    sql="""
    SELECT doc_id, token, COUNT(*) AS n
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents WHERE doc_id < 20)
    GROUP BY doc_id, token
    ORDER BY doc_id, token
    """,
    doc="explode (UNNEST) of a tokenized column -> per-token counts.",
)
def q45_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_id", "token")
    )


@register(
    "q68_scalar_extras",
    sql="""
    SELECT p_partkey,
           translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
           CAST(instr(p_name, 'o') AS INT) AS first_o,
           array_to_string(string_split(p_name, ' ')[2:4], '|') AS mid_tokens,
           array_to_string(flatten([string_split(p_name, ' '), ['x']]), '|') AS plus_sentinel,
           array_to_string(generate_series(1, least(p_size, 5)), '|') AS seq_small
    FROM part
    ORDER BY p_partkey
    """,
    doc="Scalar coverage extras: translate, instr, array slice, flatten, "
    "sequence -- each with an exact DuckDB twin.  Array results are "
    "pipe-joined at the output boundary (driver comparator needs scalars).",
)
def q68_scalar_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.translate(F.col("p_type"), "aeiou", "AEIOU").alias("type_tr"),
        F.instr(F.col("p_name"), "o").alias("first_o"),
        F.array_join(F.slice(toks, 2, 3), "|").alias("mid_tokens"),
        F.array_join(F.flatten(F.array(toks, F.array(F.lit("x")))), "|").alias("plus_sentinel"),
        F.array_join(F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(5))), "|").alias("seq_small"),
    ).orderBy("p_partkey")


@register(
    "q77_json_roundtrip_zip",
    sql="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type))::VARCHAR AS js,
           json_extract_string(props, '$.k') AS k_str,
           array_to_string([CAST(x AS VARCHAR) || '-' || event_type FOR x IN [event_id, user_id]], '|') AS zipped,
           'STRUCT<k: BIGINT>' AS props_schema
    FROM events
    ORDER BY event_id
    """,
    doc="JSON serialization (to_json over a struct), json_tuple-style "
    "extraction, arrays_zip (two parallel arrays zipped then rendered "
    "as strings so the oracle is engine-neutral), and schema_of_json "
    "(Spark infers the props schema; the oracle pins the expected DDL).",
)
def q77_json_roundtrip_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ids = F.array(F.col("event_id"), F.col("user_id"))
    types = F.array(F.col("event_type"), F.col("event_type"))
    zipped = F.transform(
        F.arrays_zip(ids.alias("x"), types.alias("t")),
        lambda s: F.concat(s["x"].cast("string"), F.lit("-"), s["t"]),
    )
    return e.select(
        "event_id",
        F.to_json(F.struct(F.col("event_id"), F.col("event_type"))).alias("js"),
        F.json_tuple(F.col("props"), "k").alias("k_str"),
        F.array_join(zipped, "|").alias("zipped"),
        F.schema_of_json(F.lit('{"k": 87}')).alias("props_schema"),
    ).orderBy("event_id")


@register(
    "q91_explode_outer",
    sql="""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN n_chars > 300 THEN string_split(text, ' ')[1:3] END AS head_toks
        FROM documents)
    SELECT doc_id, unnest(head_toks) AS tok FROM t WHERE head_toks IS NOT NULL
    UNION ALL
    SELECT doc_id, NULL AS tok FROM t WHERE head_toks IS NULL
    ORDER BY doc_id, tok
    """,
    doc="explode_outer: null-preserving explode -- short documents keep one "
    "row with a NULL token instead of disappearing (the oracle models "
    "Spark's semantics with a UNION, since SQL UNNEST drops null arrays).",
)
def q91_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    head_toks = F.when(F.col("n_chars") > 300, F.slice(F.split("text", " "), 1, 3))
    return (
        d.select("doc_id", head_toks.alias("head_toks"))
        .select("doc_id", F.explode_outer("head_toks").alias("tok"))
        .orderBy("doc_id", "tok")
    )
