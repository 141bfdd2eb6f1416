"""Second scalar-function batch (q101-q104): hashing/encoding, array set
algebra, struct construction/access, date-arithmetic extras.

All JVM-side built-ins (whole-stage codegen; no Python UDFs) — SURVEY.md §2.B
scalar groups. Cross-engine determinism notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


@register(
    "q101_hash_encode",
    sql="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           hex(substr(text, 1, 8)) AS prefix_hex,
           to_base64(CAST(substr(text, 1, 24) AS BLOB)) AS prefix_b64,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_twice
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
    doc="Hash/encoding family: md5, sha2-256, hex, base64 (on a short prefix "
    "— both engines emit unchunked base64 for <57-byte inputs), reverse, "
    "repeat. Content-hash functions are the backbone of exact dedup (q50) and "
    "fingerprinting (q59) at 100 TB: hash once, shuffle the 16-byte digest "
    "instead of the document.",
)
def q101_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.hex(F.substring("text", 1, 8)).alias("prefix_hex"),
        F.base64(F.substring("text", 1, 24).cast("binary")).alias("prefix_b64"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_twice"),
    ).orderBy("doc_id")


@register(
    "q102_array_set_algebra",
    sql="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(toks)), '|') AS uniq_tokens,
           COALESCE(array_to_string(list_sort(list_distinct(list_intersect(toks, ['the','a','of','and','to']))), '|'), '') AS stop_hits,
           array_to_string(list_sort(list_distinct(list_filter(toks, t -> NOT list_contains(['the','a','of','and','to'], t)))), '|') AS content_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_uniq
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 60)
    ORDER BY doc_id
    """,
    doc="Array set algebra over tokenized text: array_distinct / "
    "array_intersect / array_except, canonicalized by sort_array on both "
    "engines (element order of set ops is engine-defined, sorted form is "
    "not).",
)
def q102_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to"]])
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .withColumn("toks", F.split("text", " "))
    )
    return d.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_distinct("toks")), "|").alias("uniq_tokens"),
        F.array_join(F.sort_array(F.array_distinct(F.array_intersect(F.col("toks"), stop))), "|").alias("stop_hits"),
        F.array_join(F.sort_array(F.array_except(F.col("toks"), stop)), "|").alias("content_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
    ).orderBy("doc_id")


@register(
    "q103_struct_ops",
    sql="""
    SELECT o_orderkey,
           struct_pack(price := o_totalprice, status := o_orderstatus).price AS order_price,
           struct_pack(price := o_totalprice, status := o_orderstatus).status AS order_status,
           CASE WHEN o_totalprice >= 100000 THEN struct_pack(tier := 'big', pri := o_orderpriority).tier
                ELSE struct_pack(tier := 'small', pri := o_orderpriority).tier END AS size_tier
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    doc="Struct construction + field access (named_struct / getField): nested "
    "types round-trip through projection; the CASE proves structs flow "
    "through conditionals (the driver compares the extracted scalars).",
)
def q103_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    ps = F.struct(
        F.col("o_totalprice").alias("price"), F.col("o_orderstatus").alias("status")
    )
    big = F.struct(F.lit("big").alias("tier"), F.col("o_orderpriority").alias("pri"))
    small = F.struct(F.lit("small").alias("tier"), F.col("o_orderpriority").alias("pri"))
    return o.select(
        "o_orderkey",
        ps.getField("price").alias("order_price"),
        ps.getField("status").alias("order_status"),
        F.when(F.col("o_totalprice") >= 100000, big.getField("tier"))
        .otherwise(small.getField("tier"))
        .alias("size_tier"),
    ).orderBy("o_orderkey")


@register(
    "q104_date_extras",
    sql="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
           CAST(make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS TIMESTAMP) AS year_start,
           dayofyear(o_orderdate) AS doy,
           weekofyear(o_orderdate) AS woy,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    doc="Date-arithmetic extras: last_day, add_months, make_date, dayofyear, "
    "ISO weekofyear, date_format — Spark built-ins vs DuckDB "
    "last_day/INTERVAL/make_date/strftime.",
)
def q104_date_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).cast("timestamp").alias("year_start"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


@register(
    "q105_math_bitwise",
    sql="""
    SELECT l_orderkey, l_linenumber,
           exp(l_discount) AS disc_exp,
           ln(l_quantity + 1.0) AS qty_ln,
           log10(l_extendedprice) AS price_log10,
           pow(l_tax + 1.0, 2) AS tax_sq,
           sin(l_discount) AS disc_sin,
           cos(l_discount) AS disc_cos,
           atan2(l_tax, l_discount + 0.01) AS rate_angle,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_side,
           (l_linenumber & 3) AS ln_and,
           (l_linenumber | 4) AS ln_or,
           xor(l_linenumber, 5) AS ln_xor,
           (l_linenumber << 2) AS ln_shl,
           (CAST(l_orderkey AS BIGINT) >> 3) AS ok_shr
    FROM lineitem
    WHERE l_orderkey < 400
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Transcendental math (exp/ln/log10/pow/sin/cos/atan2/signum) and "
    "bitwise ops (&, |, xor, shifts). Both engines use IEEE-754 doubles and "
    "libm-equivalent implementations; the oracle's 12-significant-digit "
    "normalization absorbs any last-ulp difference.",
)
def q105_math_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.exp("l_discount").alias("disc_exp"),
        F.log(F.col("l_quantity") + 1.0).alias("qty_ln"),
        F.log10("l_extendedprice").alias("price_log10"),
        F.pow(F.col("l_tax") + 1.0, 2).alias("tax_sq"),
        F.sin("l_discount").alias("disc_sin"),
        F.cos("l_discount").alias("disc_cos"),
        F.atan2(F.col("l_tax"), F.col("l_discount") + 0.01).alias("rate_angle"),
        F.signum(F.col("l_quantity") - 25.0).alias("qty_side"),
        F.col("l_linenumber").bitwiseAND(F.lit(3)).alias("ln_and"),
        F.col("l_linenumber").bitwiseOR(F.lit(4)).alias("ln_or"),
        F.col("l_linenumber").bitwiseXOR(F.lit(5)).alias("ln_xor"),
        F.shiftleft(F.col("l_linenumber"), 2).alias("ln_shl"),
        F.shiftright(F.col("l_orderkey").cast("bigint"), 3).alias("ok_shr"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q107_higher_order_predicates",
    sql="""
    SELECT vec_id,
           list_bool_or([CAST(x AS DOUBLE) > 2.0 FOR x IN embedding]) AS has_large,
           list_bool_and([abs(CAST(x AS DOUBLE)) < 10.0 FOR x IN embedding]) AS all_bounded,
           list_dot_product([CAST(x AS DOUBLE) FOR x IN embedding],
                            list_reverse([CAST(x AS DOUBLE) FOR x IN embedding])) AS palindrome_dot,
           list_reverse([CAST(x AS DOUBLE) FOR x IN embedding])[1] AS last_component
    FROM embeddings
    WHERE vec_id < 200
    ORDER BY vec_id
    """,
    doc="Higher-order predicates and pairwise combination: exists / forall / "
    "zip_with / reverse over the embedding column.  Both engines fold the "
    "zip_with dot product sequentially left-to-right, so the float sum is "
    "order-identical (and 12-sig-digit normalization absorbs ulp noise).",
)
def q107_higher_order_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.exists(emb, lambda x: x > 2.0).alias("has_large"),
        F.forall(emb, lambda x: F.abs(x) < 10.0).alias("all_bounded"),
        F.aggregate(
            F.zip_with(emb, F.reverse(emb), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("palindrome_dot"),
        F.reverse(emb).getItem(0).alias("last_component"),
    ).orderBy("vec_id")


@register(
    "q108_regexp_extras",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
           regexp_matches(text, '\\bthe\\b') AS has_the,
           split_part(text, ' ', 2) AS second_word,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           try_cast(split_part(text, ' ', 1) AS INTEGER) AS leading_int
    FROM documents
    WHERE doc_id < 150
    ORDER BY doc_id
    """,
    doc="Regexp extras + safe casting: regexp_count, rlike, split_part, "
    "regexp_extract, try_cast (NULL on malformed input instead of a task "
    "failure — the posture that keeps a 100 TB job from dying on one bad "
    "record).",
)
def q108_regexp_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[0-9]+")).alias("n_numbers"),
        F.col("text").rlike(r"\bthe\b").alias("has_the"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.regexp_extract("text", "([A-Za-z]+)", 1).alias("first_word"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1))
        .try_cast("integer")
        .alias("leading_int"),
    ).orderBy("doc_id")


@register(
    "q162_try_functions",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25 THEN NULL
                ELSE floor(l_extendedprice / (l_quantity - 25.0) * 10000) / 10000
                END AS safe_ratio,
           CASE WHEN l_linenumber BETWEEN 1 AND 2
                THEN [l_partkey, l_suppkey][l_linenumber] END AS maybe_elem,
           TRY_CAST(l_orderkey ||
                    CASE WHEN l_linenumber > 3 THEN 'x' ELSE '' END AS INTEGER) AS parsed
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="ANSI-mode error-safe scalar family (Spark 4 defaults to ANSI, where "
    "div-by-zero / bad casts / out-of-bounds THROW): try_divide, "
    "try_element_at, try_cast return NULL instead, making row-level data "
    "errors non-fatal without disabling ANSI for the whole job -- the "
    "contract a 100 TB ingest needs (one malformed row must not kill a "
    "6-hour job).  Pure codegen projections; the oracle spells each "
    "try_* as its explicit CASE guard.",
)
def q162_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor-at-4-digits, not ROUND: the quotient is the same double in
        # both engines, but .xxxx5 ties round differently (Spark half-up,
        # DuckDB half-even); floor of the shared double cannot disagree.
        (F.floor(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25.0) * 10000) / 10000).alias(
            "safe_ratio"
        ),
        F.try_element_at(
            F.array("l_partkey", "l_suppkey"), F.col("l_linenumber")
        ).alias("maybe_elem"),
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.when(F.col("l_linenumber") > 3, F.lit("x")).otherwise(F.lit("")),
        )
        .try_cast("integer")
        .alias("parsed"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q180_generators_xml",
    sql="""
    WITH base AS (SELECT * FROM lineitem WHERE l_orderkey < 100),
    unp AS (
        SELECT l_orderkey, l_linenumber, 'qty' AS measure,
               CAST(l_quantity AS DOUBLE) AS val, l_returnflag FROM base
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price',
               CAST(l_extendedprice AS DOUBLE), l_returnflag FROM base)
    SELECT l_orderkey, l_linenumber, measure, val,
           l_returnflag AS flag_roundtrip
    FROM unp
    ORDER BY l_orderkey, l_linenumber, measure
    """,
    doc="Row-generator + XML codec coverage: stack() unpivots two measures "
    "into rows (the generator spelling of q92's unpivot -- both compile to "
    "the same Generate node), and each row's returnflag round-trips "
    "through to_xml -> from_xml (Spark 4's struct<->XML codec pair; q134 "
    "covers decode-only).  All codegen expressions; the oracle spells the "
    "generator as UNION ALL and the XML roundtrip as the identity it must "
    "be.",
)
def q180_generators_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    stacked = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'qty', CAST(l_quantity AS DOUBLE), "
            "'price', CAST(l_extendedprice AS DOUBLE)) AS (measure, val)"
        ),
        F.expr(
            "from_xml(to_xml(struct(l_returnflag AS flag)), 'flag STRING').flag"
        ).alias("flag_roundtrip"),
    )
    return stacked.orderBy("l_orderkey", "l_linenumber", "measure")
